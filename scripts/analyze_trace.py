"""Aggregate a jax.profiler perfetto trace into a per-op time breakdown.

Usage:
    BENCH_TRAIN_PROFILE_DIR=/tmp/ttrace BENCH_SKIP_TRAIN= python bench.py
    python scripts/analyze_trace.py /tmp/ttrace [--top 40] [--steps N]

Reads the newest perfetto_trace.json.gz under the directory, keeps events
on device (TPU/accelerator) tracks, groups by op name (fusion names are
collapsed to their leading hlo-op stem), and prints total device ms and %
per group. --steps divides totals to per-step ms. This is the committed
accounting tool behind ROUND5.md's train-step breakdown (VERDICT r4: the
step's non-MXU time must be attributed, not guessed).
"""
from __future__ import annotations

import argparse
import gzip
import json
import re
from collections import defaultdict
from pathlib import Path


def load_events(root: Path):
    traces = sorted(root.rglob("*perfetto_trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        raise SystemExit(f"no perfetto_trace.json.gz under {root}")
    path = traces[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    return path, events


def device_track_ids(events):
    """(pid, tid) pairs of per-op device lanes ('XLA Ops' / async ops) —
    NOT the 'Steps'/'XLA Modules' umbrella tracks, which span the op
    events and would double-count."""
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|GPU|Device|/device", n, re.I)}
    op_tracks = {(p, t) for (p, t), n in tid_names.items()
                 if p in dev_pids and re.search(r"XLA Ops|Async", n)}
    return op_tracks, pid_names, tid_names


GROUP_RULES = [
    (r"fused_warp|warp_volume|warp_train|pallas_warp", "pallas warp kernels"),
    (r"costreg|lanes_conv|pallas_conv", "pallas costreg/conv kernels"),
    (r"^fusion", "XLA fusions"),
    (r"convolution|conv_general", "XLA convolutions"),
    (r"^gather", "gathers"),
    (r"^scatter", "scatters (gather VJPs)"),
    (r"^sort", "sorts"),
    (r"^dot|dot_general", "matmuls"),
    (r"all-reduce|all-gather|reduce-scatter", "collectives"),
    (r"^copy|^bitcast|^transpose|^reshape", "copies/layout"),
    (r"^dynamic-slice|^dynamic-update-slice", "dynamic slices"),
    (r"^reduce", "reductions"),
    (r"infeed|outfeed|transfer", "host transfer"),
]


def group_name(name: str) -> str:
    for pat, g in GROUP_RULES:
        if re.search(pat, name, re.I):
            return g
    return name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals to per-step ms")
    ap.add_argument("--raw", action="store_true",
                    help="also print the top raw (ungrouped) op names")
    args = ap.parse_args()

    path, events = load_events(Path(args.trace_dir))
    op_tracks, pid_names, _ = device_track_ids(events)
    print(f"trace: {path}")
    print("processes:", {p: n for p, n in pid_names.items()})

    per_group = defaultdict(float)
    per_raw = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        name = e.get("name", "?")
        # skip module-level umbrella events that span child op events
        if re.match(r"^jit_|^pjit", name):
            continue
        per_group[group_name(name)] += dur
        per_raw[name] += dur
        total += dur

    div = args.steps or 1
    unit = "ms/step" if args.steps else "ms total"
    print(f"\ndevice op time: {total/div:.2f} {unit}\n")
    for g, ms in sorted(per_group.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{ms/div:10.2f} {unit}  {100*ms/total:5.1f}%  {g}")
    if args.raw:
        print("\n--- top raw ops ---")
        for n, ms in sorted(per_raw.items(), key=lambda kv: -kv[1])[:args.top]:
            print(f"{ms/div:10.2f} {unit}  {100*ms/total:5.1f}%  {n[:110]}")


if __name__ == "__main__":
    main()
