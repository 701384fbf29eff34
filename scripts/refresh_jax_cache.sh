#!/usr/bin/env bash
# Rebuild the committed XLA compile cache (perf/jax_cache) from scratch.
#
# Policy (round-4 verdict #8): the committed cache may only contain blobs the
# CURRENT toolchain fingerprint can hit. Cache keys are opaque hashes of
# (computation, jax/jaxlib version, compiler options, platform fingerprint),
# so stale blobs from an older toolchain can never be identified in place —
# the only sound pruning is a rebuild: compile into a FRESH staging dir by
# running exactly the workloads the cache exists to serve (the two benchmark
# configs), then replace the committed tree with the staging result. Run this
# once after any jax/jaxlib/libtpu bump (or whenever `python bench.py` stops
# reporting warm-cache wall times), then commit the new tree.
#
# Usage (needs the TPU relay):  bash scripts/refresh_jax_cache.sh
set -euo pipefail
cd "$(dirname "$0")/.."

STAGE=$(mktemp -d /tmp/scl_jax_cache_stage.XXXXXX)
trap 'rm -rf "$STAGE"' EXIT
echo "staging cold rebuild into $STAGE ..."

# benchmark.py honors a user-set JAX_COMPILATION_CACHE_DIR over its default
# (see _COMPILE_CACHE_DIR) and passes it to every measuring child.
JAX_COMPILATION_CACHE_DIR="$STAGE" SCL_BENCH_REQUIRE_TPU=1 python bench.py

n=$(find "$STAGE" -type f | wc -l)
if [ "$n" -eq 0 ]; then
  echo "staging dir is empty — bench did not compile anything; aborting" >&2
  exit 1
fi
rm -rf perf/jax_cache
mkdir -p perf/jax_cache
cp -a "$STAGE"/. perf/jax_cache/
echo "perf/jax_cache refreshed: $n blobs, $(du -sh perf/jax_cache | cut -f1)"
echo "review + commit the result."
