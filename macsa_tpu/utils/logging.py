"""Logging / observability.

Mirrors the reference's logging surface (reference:
run_multimodal_fcmf.py:142-156): per-run file + console handlers, plus a
structured JSONL metric writer (an upgrade over the reference's free-text
logs) and an optional `jax.profiler` trace context for performance work
(SURVEY.md §5: the reference has no profiler hooks)."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def setup_logging(output_dir: Optional[str] = None,
                  name: str = "macsa_tpu",
                  is_main: bool = True) -> logging.Logger:
    """`is_main=False` (non-zero SPMD process) logs warnings only — the
    reference's master-process-only logging (run_pretraining_fcmf.py:98)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO if is_main else logging.WARNING)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(name)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(output_dir, "train.log"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class MetricWriter:
    """Append-only JSONL metrics file."""

    def __init__(self, output_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, filename)

    def write(self, step: int, **metrics: Any) -> None:
        rec: Dict[str, Any] = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """`--profile_dir` flag support: captures a jax.profiler trace."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
