#!/usr/bin/env python
"""Aggregate a profile op_summary_full.txt (tools/profile_tpu.py output)
into a per-frame ledger by op category.

Usage: python tools/ledger.py /tmp/jax_trace_r5/op_summary_full.txt [--frames 96] [--top 40]
"""
import argparse
import re
import sys
from collections import defaultdict

LINE_RE = re.compile(r"^\s*([\d.]+) ms x\s*(\d+)\s+(%\S+) = (.*)$")


def categorize(name, rest):
    if name.startswith("%copy.") or name.startswith("%copy "):
        return "relayout copies"
    if "custom-call" in rest and "tpu_custom_call" in rest:
        return "pallas custom-calls"
    if "custom-call" in rest:
        return "LAPACK custom-calls"
    if name.startswith("%while"):
        return "while loops"
    if name.startswith("%dynamic-update-slice") or name.startswith("%dynamic-slice"):
        return "dynamic slice/update"
    if "kind=kCustom" in rest and re.search(r"s32\[\d+\]", rest):
        return "gathers"
    if name.startswith("%compare_select_fusion") or name.startswith("%pad_maximum_fusion") \
            or name.startswith("%add_maximum_fusion"):
        return "convs (fused act)"
    if name.startswith("%broadcast_clamp_fusion"):
        return "index/table builds"
    if name.startswith("%fusion"):
        # distinguish conv-weight-operand fusions from generic
        if re.search(r"bf16\[\d,\d,\d+,\d+\]\{[\d,]+:", rest) and "kind=kOutput" in rest:
            return "convs (fusion w/ weights)"
        return "misc fusions"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    cats = defaultdict(float)
    items = []
    in_ops = False
    for line in open(args.path):
        if line.startswith("=="):
            in_ops = line.rstrip().endswith("/ XLA Ops")
            continue
        if not in_ops:
            continue
        m = LINE_RE.match(line)
        if not m:
            continue
        total_ms, _count, name, rest = m.groups()
        total_ms = float(total_ms)
        cat = categorize(name, rest)
        cats[cat] += total_ms
        items.append((total_ms, name, cat, rest[:110]))

    grand = sum(cats.values())
    print(f"total XLA-op ms: {grand:.1f}  -> {grand/args.frames:.3f} ms/frame ({args.frames} frames)")
    print()
    print(f"{'category':<28}{'ms/frame':>10}{'% of total':>12}")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<28}{ms/args.frames:>10.3f}{100*ms/grand:>11.1f}%")
    print()
    print(f"top {args.top} ops (ms/frame):")
    for total_ms, name, cat, rest in sorted(items, reverse=True)[:args.top]:
        print(f"  {total_ms/args.frames:7.3f}  [{cat:>24}] {name} = {rest}")


if __name__ == "__main__":
    main()
