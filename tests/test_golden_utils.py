"""The fixed-seed golden policy itself (tests/golden_utils.py): tight
assertion on the recording host, sanity band + self-recorded run-to-run
determinism on foreign hosts, and local-record invalidation when the
committed goldens change."""

import json

import pytest

import golden_utils as gu


@pytest.fixture
def setup(tmp_path, monkeypatch):
    gfile = tmp_path / "goldens.json"
    gfile.write_text(json.dumps(
        {"recorded_fingerprint": "rec-host", "x": [1.0, 2.0], "y": 3.0}))
    monkeypatch.setattr(gu, "GOLDEN_FILE", str(gfile))
    monkeypatch.setattr(gu, "LOCAL_DIR", str(tmp_path / "local"))
    monkeypatch.delenv("MACSA_RECORD_GOLDENS", raising=False)

    def set_fp(fp):
        monkeypatch.setattr(gu, "host_fingerprint", lambda: fp)
    return gfile, set_fp


def test_recording_host_asserts_tight(setup):
    _, set_fp = setup
    set_fp("rec-host")
    gu.check_golden("x", [1.0004, 1.9996])  # within 1e-3
    gu.check_golden("y", 3.0009)
    with pytest.raises(AssertionError, match="drifted from committed"):
        gu.check_golden("x", [1.01, 2.0])  # 0.01 > tol on recording host


def test_foreign_host_band_then_determinism(setup):
    _, set_fp = setup
    set_fp("other-host")
    with pytest.raises(AssertionError, match="sanity band"):
        gu.check_golden("y", 3.5)  # outside +-0.15 band
    gu.check_golden("y", 3.1)     # in band -> self-records 3.1
    gu.check_golden("y", 3.1001)  # tight vs own record
    with pytest.raises(AssertionError, match="this host's recorded"):
        gu.check_golden("y", 3.05)  # in band but drifted vs own record


def test_committed_change_invalidates_local_records(setup):
    gfile, set_fp = setup
    set_fp("other-host")
    gu.check_golden("y", 3.1)  # records locally against committed-hash A
    # intentional math change: committed goldens updated
    gfile.write_text(json.dumps(
        {"recorded_fingerprint": "rec-host", "x": [1.0, 2.0], "y": 3.08}))
    # 3.05 would fail against the stale local 3.1 (drift 0.05 > 1e-3) but
    # must pass: the local record is invalidated by the committed change,
    # and 3.05 is within the band of the new committed 3.08
    gu.check_golden("y", 3.05)
