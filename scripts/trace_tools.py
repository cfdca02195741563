"""Parse a jax.profiler trace.json.gz: top device ops with shapes/bytes and
achieved bandwidth. Used for the r5 BA-iteration decomposition (VERDICT r4
item 2).

Usage: python scripts/trace_tools.py /tmp/jaxtrace [--iters 27] [--top 40]
(iters divides the per-op totals for while-loop bodies executed N times).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_latest(trace_dir: str):
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(files[-1]) as f:
        return json.load(f)["traceEvents"]


def device_events(ev):
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    out = []
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" in names.get(e.get("pid"), ""):
                out.append(e)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--contains", default=None,
                    help="only ops whose source contains this substring")
    args = ap.parse_args()

    ev = device_events(load_latest(args.trace_dir))
    rows = {}
    cat_time = collections.Counter()
    for e in ev:
        name = e["name"]
        a = e.get("args", {})
        cat = a.get("hlo_category", "?")
        if name.startswith(("jit_", "while")):
            continue  # containers double-count their children
        src = a.get("source", "")
        if args.contains and args.contains not in src + name:
            continue
        r = rows.setdefault(name, dict(
            dur=0.0, n=0, cat=cat,
            bytes=int(a.get("bytes_accessed", 0) or 0),
            flops=int(a.get("model_flops", 0) or 0),
            shape=a.get("shape_with_layout", "")[:60],
            src=src.split("/")[-1][:28],
        ))
        r["dur"] += e["dur"]
        r["n"] += 1
        cat_time[cat] += e["dur"]

    total = sum(r["dur"] for r in rows.values())
    print(f"total device op time: {total/1e3:.2f} ms "
          f"({total/1e3/args.iters:.3f} ms/iter at {args.iters} iters)")
    print("\nby category (ms/iter):")
    for c, d in cat_time.most_common():
        print(f"  {c:28s} {d/1e3/args.iters:8.3f}")
    print(f"\ntop {args.top} ops (us/iter; GB/s = achieved bandwidth):")
    print(f"{'us/it':>8s} {'x':>3s} {'GB/s':>6s} {'GF/s':>7s}  "
          f"{'cat':16s} {'src':28s} shape")
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["dur"])[: args.top]:
        per = r["dur"] / args.iters
        per_exec = r["dur"] / max(r["n"], 1) * 1e-6  # s
        bw = r["bytes"] / max(per_exec, 1e-12) / 1e9
        fl = r["flops"] / max(per_exec, 1e-12) / 1e9
        print(f"{per:8.1f} {r['n']:3d} {bw:6.0f} {fl:7.0f}  "
              f"{r['cat'][:16]:16s} {r['src']:28s} {r['shape']}"
              f"  [{name}]")


if __name__ == "__main__":
    main()
