#!/usr/bin/env bash
# Rebuild the committed XLA compile cache (perf/jax_cache) from scratch.
#
# Policy (round-4 verdict #8): the committed cache may only contain blobs the
# CURRENT toolchain fingerprint can hit. Cache keys are opaque hashes of
# (computation, jax/jaxlib version, compiler options, platform fingerprint),
# so stale blobs from an older toolchain can never be identified in place —
# the only sound pruning is a rebuild: empty the tree, then compile into it
# by running exactly the workloads the cache exists to serve (the two
# benchmark configs). Run this once after any jax/jaxlib/libtpu bump or
# flagship-artifact swap (the int8 program bakes the quantized weights as
# constants, so new params = new fingerprints), then commit the new tree.
#
# The rebuild happens IN PLACE at perf/jax_cache, not in a staging dir:
# measured round 5, blobs compiled under a different cache path get
# DIFFERENT fingerprints through the axon relay's remote-compile
# sidechannel, so a staged tree is unreachable by normal runs — a bench run
# against a staging-built cache recompiled everything cold (9m40) and
# re-wrote the canonical-path fingerprints (perf/_cache_refresh_r5.log vs
# perf/_bench_r5_warm.log). The previous tree is kept in a backup and
# restored if the rebuild fails.
#
# Usage (needs the TPU relay):  bash scripts/refresh_jax_cache.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CACHE=perf/jax_cache
BACKUP=$(mktemp -d /tmp/scl_jax_cache_backup.XXXXXX)
restore() {
  rm -rf "$CACHE"
  [ -d "$BACKUP/old" ] && mv "$BACKUP/old" "$CACHE"
  rm -rf "$BACKUP"
  echo "rebuild failed — previous cache restored" >&2
}
trap restore EXIT

[ -d "$CACHE" ] && mv "$CACHE" "$BACKUP"/old
mkdir -p "$CACHE"
echo "cold rebuild into $CACHE (previous tree backed up in $BACKUP) ..."

SCL_BENCH_REQUIRE_TPU=1 python bench.py

n=$(find "$CACHE" -type f | wc -l)
if [ "$n" -eq 0 ]; then
  echo "cache dir is empty — bench did not compile anything" >&2
  exit 1
fi
trap - EXIT
rm -rf "$BACKUP"
echo "perf/jax_cache refreshed: $n blobs, $(du -sh "$CACHE" | cut -f1)"
echo "review + commit the result."
