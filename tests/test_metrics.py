"""Metric tests: our macro P/R/F1 must match sklearn's
precision_recall_fscore_support(average='macro', zero_division=0) — the exact
function the reference uses (run_multimodal_fcmf.py:35-38)."""

import numpy as np
import pytest

from macsa_tpu.config import ASPECTS
from macsa_tpu.train.metrics import aspect_report, macro_prf


def test_macro_prf_vs_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    for trial in range(5):
        y_true = rng.integers(0, 4, size=200)
        y_pred = rng.integers(0, 4, size=200)
        p, r, f = macro_prf(y_true, y_pred)
        ps, rs, fs, _ = sklearn.precision_recall_fscore_support(
            y_true, y_pred, average="macro", zero_division=0.0)
        assert p == pytest.approx(ps, abs=1e-9)
        assert r == pytest.approx(rs, abs=1e-9)
        assert f == pytest.approx(fs, abs=1e-9)


def test_macro_prf_label_union_semantics():
    sklearn = pytest.importorskip("sklearn.metrics")
    # classes absent from both y_true and y_pred are excluded (sklearn default)
    y_true = np.asarray([0, 0, 1, 1])
    y_pred = np.asarray([0, 1, 1, 3])
    p, r, f = macro_prf(y_true, y_pred)
    ps, rs, fs, _ = sklearn.precision_recall_fscore_support(
        y_true, y_pred, average="macro", zero_division=0.0)
    assert (p, r, f) == pytest.approx((ps, rs, fs), abs=1e-9)


def test_aspect_report_shape(rng):
    y_true = rng.integers(0, 4, size=(50, len(ASPECTS)))
    y_pred = rng.integers(0, 4, size=(50, len(ASPECTS)))
    report = aspect_report(y_true, y_pred)
    assert set(report) == set(ASPECTS) | {"average"}
    f1s = [report[a]["f1"] for a in ASPECTS]
    assert report["average"]["f1"] == pytest.approx(np.mean(f1s))


def test_perfect_predictions():
    y = np.asarray([[0, 1, 2, 3, 0, 1]] * 4)
    report = aspect_report(y, y)
    assert report["average"]["f1"] == pytest.approx(1.0)
