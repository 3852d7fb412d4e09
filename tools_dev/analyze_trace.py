"""Aggregate a jax.profiler xplane trace into an op-time breakdown.

Companion to tools_dev/trace_step.py (which captures the trace).  Parses the
raw xplane.pb with the protobuf schema that ships inside this image's
tensorflow wheel (`tensorflow.tsl.profiler.protobuf.xplane_pb2`) —
tensorboard_plugin_profile's converter is version-mismatched here, so we
aggregate ourselves.

Buckets device-op time into convolution / matmul / other, prints the top
ops of each bucket, and reports device busy time vs wall span.

Usage: python tools_dev/analyze_trace.py [trace_dir] [-n TOP]
  trace_dir defaults to /tmp/macsa_trace.
"""

import argparse
import collections
import glob
import gzip
import os
import re
import sys


def load_xplane(trace_dir):
    pbs = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                           recursive=True))
    if not pbs:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    path = pbs[-1]
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space, path


def device_planes(space):
    # TPU device planes are named like "/device:TPU:0"; the host plane is
    # "/host:CPU". Fall back to any non-host plane.
    devs = [p for p in space.planes if "TPU" in p.name or "GPU" in p.name]
    if not devs:
        devs = [p for p in space.planes if not p.name.startswith("/host")]
    return devs


BUCKET_PATTERNS = [
    ("copy", re.compile(r"^%?(copy|transpose|bitcast|reshape)", re.I)),
    ("conv", re.compile(r"convolution", re.I)),
    ("matmul", re.compile(r"dot|matmul|einsum", re.I)),
]


def bucket_of(name, expr):
    del expr  # HLO instruction name is the reliable signal
    for bucket, pat in BUCKET_PATTERNS:
        if pat.search(name):
            return bucket
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/macsa_trace")
    ap.add_argument("-n", "--top", type=int, default=25)
    args = ap.parse_args()

    space, path = load_xplane(args.trace_dir)
    print(f"trace: {path}")

    for plane in device_planes(space):
        stat_names = {i: m.name for i, m in plane.stat_metadata.items()}
        events = []  # (name, expr, dur_ps, start_ps)
        # Only the synchronous leaf-op line: "Steps"/"XLA Modules" nest the
        # same time again, and "Async XLA Ops" (copy-start etc.) report
        # wall spans that overlap compute — neither is additive.
        op_lines = [l for l in plane.lines if l.name == "XLA Ops"]
        for line in op_lines or plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                expr = ""
                for st in ev.stats:
                    if stat_names.get(st.metadata_id, "") in (
                            "hlo_op", "tf_op", "equation", "expression"):
                        expr = st.str_value or stat_names[st.metadata_id]
                events.append((md.name, expr, ev.duration_ps,
                               ev.offset_ps))
        if not events:
            continue
        total_busy = sum(e[2] for e in events)
        span = (max(e[3] + e[2] for e in events) -
                min(e[3] for e in events))
        print(f"\n== plane {plane.name}: {len(events)} events, "
              f"busy {total_busy/1e9:.2f} ms over span {span/1e9:.2f} ms "
              f"({100*total_busy/max(span,1):.1f}% busy)")

        by_bucket = collections.Counter()
        by_op = collections.defaultdict(lambda: [0, 0])  # dur, count
        for name, expr, dur, _ in events:
            b = bucket_of(name, expr)
            by_bucket[b] += dur
            key = (b, name)
            by_op[key][0] += dur
            by_op[key][1] += 1

        for b, dur in by_bucket.most_common():
            print(f"  {b:8s} {dur/1e9:9.2f} ms  "
                  f"({100*dur/total_busy:.1f}%)")

        for b in [x for x, _ in by_bucket.most_common()]:
            print(f"\n  -- top {b} ops:")
            ops = sorted(((k, v) for k, v in by_op.items() if k[0] == b),
                         key=lambda kv: -kv[1][0])[:args.top]
            for (_, name), (dur, cnt) in ops:
                print(f"    {dur/1e9:8.3f} ms  x{cnt:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
