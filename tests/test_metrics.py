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


def test_report_files_byte_format(tmp_path):
    """Byte-pins the two L8 artifact files the drivers emit (VERDICT r4
    item 8): `test_results_fcmf.txt` per-aspect P/R/F1 lines + `Average:`
    (reference run_multimodal_fcmf.py:660-675) and the formatted
    predict-vs-label dump (:677-694).  Any format drift — separators,
    rounding, ordering, polarity names — fails here, not in a human diff
    of a real run."""
    from macsa_tpu.train.metrics import write_test_reports

    trues = np.asarray([[0, 1, 2, 3, 0, 1],
                        [3, 3, 0, 0, 1, 2]])
    preds = np.asarray([[0, 1, 1, 3, 0, 2],
                        [3, 0, 0, 0, 1, 2]])
    texts = ["khách sạn rất đẹp", "phòng bẩn quá"]
    report = aspect_report(trues, preds)
    write_test_reports(str(tmp_path), report, texts, trues, preds)

    results = (tmp_path / "test_results_fcmf.txt").read_bytes()
    assert results == (
        b"Location: P=1.0000 R=1.0000 F1=1.0000\n"
        b"Food: P=0.3333 R=0.3333 F1=0.3333\n"
        b"Room: P=0.3333 R=0.3333 F1=0.3333\n"
        b"Facilities: P=1.0000 R=1.0000 F1=1.0000\n"
        b"Service: P=1.0000 R=1.0000 F1=1.0000\n"
        b"Public_area: P=0.2500 R=0.5000 F1=0.3333\n"
        b"Average: P=0.6528 R=0.6944 F1=0.6667\n"), results

    dump = (tmp_path / "test_predictions_formatted.txt").read_text(
        encoding="utf-8")
    assert dump == (
        "Sentence: khách sạn rất đẹp\n"
        "  Location: predict=None label=None\n"
        "  Food: predict=Negative label=Negative\n"
        "  Room: predict=Negative label=Neutral\n"
        "  Facilities: predict=Positive label=Positive\n"
        "  Service: predict=None label=None\n"
        "  Public_area: predict=Neutral label=Negative\n"
        "Sentence: phòng bẩn quá\n"
        "  Location: predict=Positive label=Positive\n"
        "  Food: predict=None label=Positive\n"
        "  Room: predict=None label=None\n"
        "  Facilities: predict=None label=None\n"
        "  Service: predict=Negative label=Negative\n"
        "  Public_area: predict=Neutral label=Neutral\n"), dump
