from soft_contrastive_learning_tpu.launch.jobs import (  # noqa: F401
    JobSpec,
    run_one_job,
    local_array_run,
)
from soft_contrastive_learning_tpu.launch.multihost import initialize_multihost  # noqa: F401
