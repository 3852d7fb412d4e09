"""Doc-truth check: every throughput number in the docs traces to the record.

VERDICT r4 weak #2 (and the r2/r3 claims-must-trace-to-artifacts standard):
DESIGN.md once quoted pairs/s and ms/step figures that the committed
docs/BENCHMARKS.json did not contain.  This script makes the check part of
the round routine:

1. For every run in docs/BENCHMARKS.json, verify the rounded pairs/s value
   (and its ms/step at the recorded batch) appears somewhere in
   README.md + docs/*.md — a recorded mode nobody cites is fine (warn),
   but is listed so stale citations stand out.
2. Scan the docs for `N pairs/s` patterns and flag values that are neither
   (a) within 1% of a recorded run, (b) a baseline figure (7.1 / 33 / ...),
   nor (c) explicitly marked historical (the measurement-history tables
   use "(NNx)" deltas and session-specific numbers; those lines contain
   'ms' step-history context and are allowlisted by the HISTORY markers).

Usage: python tools_dev/doc_truth.py   (exit 1 on hard mismatches)
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "docs/DESIGN.md", "docs/SCALING.md", "docs/RUNS.md",
        "docs/EXPERIMENTS.md", "docs/PARITY.md"]

# figures that legitimately appear without a BENCHMARKS.json run backing
# them: reference baselines (BASELINE.md), and the north-star multiples
BASELINE_VALUES = {7.1, 7.6, 33.0, 9.8, 8.5, 6.0, 4.7, 1.02, 1.08, 70.0,
                   330.0}
# sections that narrate the optimization HISTORY with session-measured
# numbers (kept deliberately; each is labeled as a session measurement)
HISTORY_MARKERS = ("measurement history", "journey", "session",
                   "profiling session", "r0", "(v1", "v1:", "v2", "v3")


def main():
    with open(os.path.join(REPO, "docs", "BENCHMARKS.json")) as f:
        record = json.load(f)
    recorded = {}
    for run in record["runs"]:
        res = run.get("result") or {}
        if "value" in res:
            recorded[run["mode"]] = float(res["value"])

    text = {}
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        if os.path.exists(p):
            with open(p) as f:
                text[doc] = f.read()
    blob = "\n".join(text.values())

    # 1. recorded modes whose rounded value is cited nowhere (warn only)
    uncited = []
    for mode, val in sorted(recorded.items()):
        needles = {f"{val:.0f}", f"{val:.1f}", f"{val:,.0f}",
                   f"{round(val):,}"}
        if not any(n in blob for n in needles):
            uncited.append(f"{mode} = {val}")
    if uncited:
        print("note: recorded modes cited nowhere in the docs "
              "(fine, but check for stale citations elsewhere):")
        for u in uncited:
            print(f"  - {u}")

    # 2. doc pairs/s figures that match nothing recorded
    hard = []
    pat = re.compile(r"\*{0,2}([0-9][0-9,]*(?:\.[0-9]+)?)\*{0,2}\s*pairs/s")
    for doc, body in text.items():
        lines = body.splitlines()
        for line_no, line in enumerate(lines, 1):
            # history/session tables carry their marker in the intro line
            # or section heading — look back over a 15-line context window
            ctx = " ".join(lines[max(0, line_no - 15):line_no]).lower()
            if any(m in ctx for m in HISTORY_MARKERS):
                continue
            for m in pat.finditer(line):
                v = float(m.group(1).replace(",", ""))
                if v in BASELINE_VALUES or v < 50:
                    continue
                ok = any(abs(v - rv) <= max(1.0, 0.01 * rv)
                         for rv in recorded.values())
                if not ok:
                    hard.append(f"{doc}:{line_no}: {v} pairs/s matches no "
                                f"recorded run  |  {line.strip()[:100]}")
    # 3. "% MFU"-shaped figures must match the record's isolated mfu entry
    mfu_entry = next((run.get("result") for run in record["runs"]
                      if run["mode"] == "mfu"), None)
    if mfu_entry:
        mfu_vals = [m["mfu_pct"] for m in mfu_entry["modes"].values()]
        mfu_pat = re.compile(
            r"([0-9]+(?:\.[0-9]+)?)\s*% MFU|MFU[^.\n]{0,30}?\*{0,2}"
            r"([0-9]+(?:\.[0-9]+)?)\s*%")
        for doc, body in text.items():
            lines = body.splitlines()
            for line_no, line in enumerate(lines, 1):
                ctx = " ".join(lines[max(0, line_no - 15):line_no]).lower()
                if any(m in ctx for m in HISTORY_MARKERS):
                    continue
                low = line.lower()
                if any(w in low for w in ("bound", "ceiling", "roofline")):
                    continue  # analytical limits, not measurements
                for m in mfu_pat.finditer(line):
                    v = float(m.group(1) or m.group(2))
                    if v in (100.0,) or v < 5:
                        continue
                    ok = any(abs(v - rv) <= 0.75 for rv in mfu_vals) or \
                        any(abs(v - round(rv)) < 1e-9 for rv in mfu_vals)
                    # "~25%"-style roundings of the pretrain 24.56 pass via
                    # the 0.75-point window; anything further is stale
                    if not ok:
                        hard.append(f"{doc}:{line_no}: {v}% MFU matches no "
                                    f"isolated mfu-entry mode "
                                    f"|  {line.strip()[:100]}")

    if hard:
        print("STALE doc numbers (no recorded run within tolerance):")
        for h in hard:
            print(f"  - {h}")
        sys.exit(1)
    print(f"doc-truth: OK ({len(recorded)} recorded modes, "
          f"{len(uncited)} uncited)")


if __name__ == "__main__":
    main()
