"""Run every bench.py mode and write one auditable record.

VERDICT r2 item 4: the README's per-mode throughput claims (pretrain,
inference, breakdown modes) need a committed, reproducible artifact — not
self-reported numbers.  This script runs `bench.py` once per mode in a
fresh subprocess (exactly how the driver runs it), captures the raw
stderr/stdout and wall-clock timestamps, and writes `docs/BENCHMARKS.json`.

Usage (on the TPU host):
    python tools_dev/run_benchmarks.py [--modes full,model,...] [--out PATH]

Each entry records: mode, env overrides, start/end ISO timestamps, wall
seconds, the parsed JSON result line, and the raw stderr (init /
compile+first-step / per-step breakdown lines included).
"""

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_MODES = ("full", "model", "visual", "pretrain", "pretrain_model",
                 "pretrain_model_b64", "pretrain_model_b96",
                 "pretrain_model_chunked", "inference", "inference_b16",
                 "inference_b32", "bundle", "bundle_bf16", "pixels",
                 "pixels_u8", "full_b8",
                 "model_b8", "model_remat", "model_remat_ffn",
                 "full_unfused", "pretrain_unrolled", "mfu")

# pseudo-modes: recorded name -> (real BENCH_MODE, extra env)
MODE_VARIANTS = {
    "pixels_u8": ("pixels", {"BENCH_PIXEL_TRANSFER": "u8"}),
    "full_unfused": ("full", {"BENCH_FUSED": "0"}),
    # batch sweep (VERDICT r3 item 8): per-step costs (AdamW update)
    # amortize at b16, which became the full/model default in r04; the b8
    # rows keep the BENCH_r01-r03 operating point comparable.  b32
    # regresses (ResNet extraction fusions degrade — DESIGN.md).
    "full_b8": ("full", {"BENCH_BATCH": "8"}),
    "model_b8": ("model", {"BENCH_BATCH": "8"}),
    # checkpoint_dots remat on the encoder blocks (config.py remat_blocks)
    "model_remat": ("model", {"BENCH_REMAT": "1"}),
    # unrolled-decoder pretrain (scan_blocks=True is the bench default)
    "pretrain_unrolled": ("pretrain", {"BENCH_SCAN_DECODER": "0"}),
    # r5: fused chunked-vocab CE (seq2seq.chunked_seq2seq_loss — no
    # [B,T,64001] f32 logits) vs the default full-logits pretrain loss.
    # 16384 (4 chunks) measured best; 8192 costs ~1.5% (docs/DESIGN.md)
    "pretrain_model_chunked": ("pretrain_model",
                               {"BENCH_VOCAB_CHUNK": "16384"}),
    # r5: serving batch sweep (VERDICT r4 item 7) — forward-only
    # activations are small, so larger serving batches may amortize
    "inference_b16": ("inference", {"BENCH_BATCH": "16"}),
    "inference_b32": ("inference", {"BENCH_BATCH": "32"}),
    # r5: the bf16 serving bundle (export.py --dtype bfloat16)
    "bundle_bf16": ("bundle", {"BENCH_BUNDLE_DTYPE": "bfloat16"}),
    # r5: FFN-only remat (ModelConfig.remat_ffn) — measured negative like
    # remat_blocks, recorded for the same reason (docs/DESIGN.md)
    "model_remat_ffn": ("model", {"BENCH_REMAT_FFN": "1"}),
    "full_remat_ffn": ("full", {"BENCH_REMAT_FFN": "1"}),
    # r5: Phase-1 steady-state batch sweep — the seq2seq program is
    # intensity-poor at the reference's b16 and keeps scaling: b32 +23%,
    # b64 +55%, b96 +60% over b16 (sweet spot; b128 OOMs — FFN saved activations).
    # b16 stays the recorded default for reference comparability.
    "pretrain_model_b32": ("pretrain_model", {"BENCH_BATCH": "32"}),
    "pretrain_model_b64": ("pretrain_model", {"BENCH_BATCH": "64"}),
    "pretrain_model_b96": ("pretrain_model", {"BENCH_BATCH": "96"}),
}


def run_mode(mode: str, extra_env=None):
    env = dict(os.environ)
    env["BENCH_MODE"] = mode
    env.update(extra_env or {})
    # "mfu" runs tools_dev/mfu.py (self-measuring FLOP/MFU suite) instead
    # of a bench.py throughput mode — VERDICT r3 item 2: the README's MFU
    # percentages must trace to a committed raw record.
    script = "tools_dev/mfu.py" if mode == "mfu" else "bench.py"
    start = datetime.datetime.now(datetime.timezone.utc)
    t0 = time.time()
    proc = subprocess.run([sys.executable, os.path.join(REPO, script)],
                          capture_output=True, text=True, cwd=REPO, env=env)
    wall = time.time() - t0
    end = datetime.datetime.now(datetime.timezone.utc)
    parsed = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
    return {
        "mode": mode,
        "env": {"BENCH_MODE": mode, **(extra_env or {})},
        "start_utc": start.isoformat(timespec="seconds"),
        "end_utc": end.isoformat(timespec="seconds"),
        "wall_s": round(wall, 1),
        "returncode": proc.returncode,
        "result": parsed,
        "stdout": proc.stdout,
        "stderr": proc.stderr,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default=",".join(DEFAULT_MODES))
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "BENCHMARKS.json"))
    ap.add_argument("--also-unfused", action="store_true",
                    help="additionally run full mode with BENCH_FUSED=0")
    ap.add_argument("--append", action="store_true",
                    help="merge into an existing record instead of "
                         "rewriting it: entries for the requested modes "
                         "replace same-named ones, each stamped with its "
                         "own git_rev (the header keeps the original "
                         "full-suite provenance)")
    args = ap.parse_args(argv)

    rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                           capture_output=True, text=True).stdout.strip()
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            record = json.load(f)
    else:
        record = {
            "git_rev": rev,
            "git_dirty": bool(dirty),
            "host_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "runs": [],
        }
    try:
        import jax
        record["jax_version"] = jax.__version__
        record["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # record the failure, keep benching
        record["devices_error"] = str(e)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    if args.also_unfused and "full_unfused" not in modes:
        # legacy spelling of the full_unfused pseudo-mode; no-op when the
        # pseudo-mode is already requested (would double-record otherwise)
        modes.append("full_unfused")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    for mode in modes:
        real, extra = MODE_VARIANTS.get(mode, (mode, None))
        print(f"== {mode} ==", file=sys.stderr)
        entry = run_mode(real, extra)
        entry["mode"] = mode
        if args.append:
            entry["git_rev"] = rev
            entry["git_dirty"] = bool(dirty)
        print(entry["stderr"], file=sys.stderr)
        print(json.dumps(entry["result"]), file=sys.stderr)
        record["runs"] = [r for r in record["runs"] if r["mode"] != mode]
        record["runs"].append(entry)
        # write after every mode: a multi-hour record survives a timeout /
        # kill with the completed modes intact (tunnel uploads can cost
        # 20+ min per new executable on a cold content cache)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
