#!/usr/bin/env bash
# Re-record the committed e2e loss goldens (tests/goldens/e2e_losses.json)
# through the EXACT test path: the two golden-bearing e2e driver tests run
# under the normal conftest environment (8-device CPU mesh, highest matmul
# precision) with MACSA_RECORD_GOLDENS=1, which makes
# tests/golden_utils.check_golden write the committed file (stamped with
# this host's fingerprint) instead of asserting.
#
# Run this when the training math changes intentionally, then commit the
# regenerated JSON.  See tests/golden_utils.py for the assertion policy.
set -euo pipefail
cd "$(dirname "$0")/.."
MACSA_RECORD_GOLDENS=1 python -m pytest -q \
  "tests/test_e2e_driver.py::test_finetune_driver_end_to_end" \
  "tests/test_e2e_driver.py::test_pretrain_then_transfer"
echo "recorded:"
cat tests/goldens/e2e_losses.json
