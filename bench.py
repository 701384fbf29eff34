"""Driver benchmark entry point — delegates to the packaged implementation
(soft_contrastive_learning_tpu/benchmark.py) so the installed `scl-tpu bench`
and this root script share one code path."""

from soft_contrastive_learning_tpu.benchmark import main

if __name__ == "__main__":
    main()
