#!/usr/bin/env bash
# One-command, durable record of the FULL-SCALE multi-chip dryrun
# (VERDICT r4 weak #5): jit + execute one real-scale fine-tune step
# (hidden 768 x 12 layers, full vocab, ResNet-152, Megatron mp-sharding)
# over a dp4 x mp2 mesh of 8 virtual CPU devices, and commit the raw
# output as docs/MULTICHIP_FULLSCALE.txt with rev + timestamp.
#
# ~10 min wall on a 1-core CPU host.  The tiny-scale variant of the same
# gate runs automatically every round (driver `dryrun_multichip`).
set -euo pipefail
cd "$(dirname "$0")/.."
out=docs/MULTICHIP_FULLSCALE.txt
{
  echo "# Full-scale multi-chip dryrun record"
  echo "# git_rev: $(git rev-parse HEAD)$(git diff --quiet || echo ' (dirty)')"
  echo "# utc: $(date -u +%Y-%m-%dT%H:%M:%S+00:00)"
  echo "# cmd: MACSA_DRYRUN_SCALE=full JAX_PLATFORMS=cpu dryrun_multichip(8)"
  MACSA_DRYRUN_SCALE=full JAX_PLATFORMS=cpu \
    python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)" 2>&1
} | tee "$out.tmp"
mv "$out.tmp" "$out"
echo "wrote $out"
