#!/usr/bin/env python3
"""Generate SCALING.md rows for queries measured at sf0.1 and the 10x
replica: merges two graft.Bench outputs (min-of-reps per query) into a
markdown table for the given keys.

Usage: scaling_rows.py BENCH_SF01.json BENCH_SF1.json key1,key2,...
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    keys = sys.argv[3].split(",")
    for k in sorted(keys):
        t0, t1 = a.get(k), b.get(k)
        if t0 is None or t1 is None:
            print(f"| {k} | MISSING | | | |")
            continue
        # The absolute-noise floor (sub-150ms delta ≈ JVM jitter) applies
        # only when BOTH times are themselves noise-sized — a 0.05→0.14s
        # query genuinely tripled and must not be labeled flat. The raw
        # ratio always prints alongside the label so the floor can never
        # hide a real slope.
        ratio = t1 / t0 if t0 > 0 else float("inf")
        noise_floor = t0 < 0.3 and t1 < 0.3 and abs(t1 - t0) < 0.15
        growth = "~1×" if t1 <= t0 * 1.15 or noise_floor else f"{ratio:.1f}×"
        print(f"| {k} (r10) | {t0:.1f} s | {t1:.1f} s | {growth} (raw {ratio:.2f}×) | |")


if __name__ == "__main__":
    main()
