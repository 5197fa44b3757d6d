"""Summarize a jax.profiler TPU trace (xplane.pb) by op, source line and
HLO category.

Usage: python scripts/trace_summary.py <trace_dir> [--steps K] [--top N]

``trace_dir`` is the directory passed to ``jax.profiler.trace`` (the script
finds ``plugins/profile/*/*.xplane.pb`` under it).  ``--steps`` divides every
total by K (e.g. the K scanned optimizer steps inside one dispatch) so the
table reads per-optimizer-step.  Produces the tables behind docs/PERF.md.
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_planes(trace_dir):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # tf >= 2.21 moved the proto
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        sys.exit(f"no xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def device_events(spaces):
    """Yield (name, dur_ps, stats_dict) for every event on TPU device planes
    (XLA op lines), skipping host/python planes."""
    for xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
            ev_md = {k: v for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                # Only the synchronous op timeline: 'XLA Modules' (the whole
                # dispatch), 'Steps' and 'Async XLA Ops' (copy-start/done
                # spans that OVERLAP compute) would double-count device time.
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    md = ev_md.get(ev.metadata_id)
                    name = md.name if md else "?"
                    stats = {}
                    for st in list(ev.stats) + (list(md.stats) if md else []):
                        key = stat_md.get(st.metadata_id, str(st.metadata_id))
                        # XStat is a flat oneof in the tsl proto (value.* in
                        # the legacy tensorflow.core one)
                        v = getattr(st, "value", st)
                        val = v.int64_value or v.uint64_value or v.double_value
                        if v.str_value:
                            val = v.str_value
                        if v.ref_value:
                            val = stat_md.get(v.ref_value, val)
                        stats[key] = val
                    yield name, ev.duration_ps, stats


_CAT_RULES = [
    ("fusion", "fusion"),
    ("custom-call", "custom-call (pallas)"),
    ("copy", "copy/format"),
    ("convolution", "convolution"),
    ("dot", "dot"),
    ("dynamic-update-slice", "dus"),
    ("all-reduce", "collective"),
    ("scatter", "scatter"),
]


def categorize(name):
    base = name.split(".")[0].lower()
    for pat, cat in _CAT_RULES:
        if pat in base:
            return cat
    return base[:24]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    spaces = load_planes(args.trace_dir)
    by_op = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    by_cat = collections.defaultdict(lambda: [0.0, 0.0])
    by_src = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
    total_ms = 0.0
    for name, dur_ps, stats in device_events(spaces):
        ms = dur_ps / 1e9
        total_ms += ms
        gb = float(stats.get("bytes_accessed", 0) or 0) / 1e9
        gflop = float(stats.get("model_flops", stats.get("flops", 0)) or 0) / 1e9
        rec = by_op[name]
        rec[0] += ms
        rec[1] += gb
        rec[2] += gflop
        rec[3] += 1
        cat = categorize(name)
        by_cat[cat][0] += ms
        by_cat[cat][1] += gb
        src = stats.get("source", "") or stats.get("source_info", "")
        if isinstance(src, str) and src:
            src = re.sub(r".*/(site-packages|repo)/", "", src)
            by_src[src][0] += ms
            by_src[src][1] += gb
            by_src[src][2] += gflop

    k = args.steps
    print(f"== total device time: {total_ms:.1f} ms "
          f"({total_ms / k:.1f} ms/step over {k} steps)\n")
    print(f"== by HLO category (ms/step | GB/step)")
    for cat, (ms, gb) in sorted(by_cat.items(), key=lambda x: -x[1][0])[:15]:
        print(f"  {ms/k:8.2f}  {gb/k:8.2f}   {cat}")
    print(f"\n== top ops (ms/step | GB/step | GFLOP/step | count)")
    for name, (ms, gb, gf, n) in sorted(
        by_op.items(), key=lambda x: -x[1][0]
    )[: args.top]:
        print(f"  {ms/k:8.2f}  {gb/k:7.2f}  {gf/k:8.1f}  {n:5d}   {name[:80]}")
    if by_src:
        print(f"\n== by source line (ms/step | GB/step | GFLOP/step)")
        for src, (ms, gb, gf) in sorted(
            by_src.items(), key=lambda x: -x[1][0]
        )[: args.top]:
            print(f"  {ms/k:8.2f}  {gb/k:7.2f}  {gf/k:8.1f}   {src[:90]}")


if __name__ == "__main__":
    main()
