"""Evaluation metrics: per-aspect macro precision/recall/F1.

Numpy implementation of sklearn `precision_recall_fscore_support(...,
average='macro', zero_division=0)` as used by the reference
(reference: run_multimodal_fcmf.py:35-38,544-552): per aspect, macro-average
P/R/F1 over the 4 polarity classes *present in y_true or y_pred*; the final
score averages the per-aspect macro-F1 over the 6 aspects.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from macsa_tpu.config import ASPECTS


def macro_prf(y_true: np.ndarray, y_pred: np.ndarray,
              labels: Sequence[int] = None) -> Tuple[float, float, float]:
    """Macro precision/recall/F1 with zero_division=0.

    sklearn semantics: with `labels=None` the label set is the sorted union of
    labels appearing in y_true or y_pred."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if labels is None:
        labels = np.union1d(np.unique(y_true), np.unique(y_pred))
    ps, rs, fs = [], [], []
    for c in labels:
        tp = float(np.sum((y_pred == c) & (y_true == c)))
        fp = float(np.sum((y_pred == c) & (y_true != c)))
        fn = float(np.sum((y_pred != c) & (y_true == c)))
        p = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        r = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
        ps.append(p); rs.append(r); fs.append(f)
    return float(np.mean(ps)), float(np.mean(rs)), float(np.mean(fs))


def aspect_report(y_true: np.ndarray, y_pred: np.ndarray,
                  aspects: Sequence[str] = ASPECTS) -> Dict[str, Dict[str, float]]:
    """y_true/y_pred: [N, num_aspects] -> per-aspect macro P/R/F1 + average.

    Mirrors the reference's dev/test report (run_multimodal_fcmf.py:544-552,
    660-675)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    report: Dict[str, Dict[str, float]] = {}
    for i, asp in enumerate(aspects):
        p, r, f = macro_prf(y_true[:, i], y_pred[:, i])
        report[asp] = {"precision": p, "recall": r, "f1": f}
    avg = {k: float(np.mean([report[a][k] for a in aspects]))
           for k in ("precision", "recall", "f1")}
    report["average"] = avg
    return report
