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
        growth = "~1×" if t1 <= t0 * 1.15 or t1 - t0 < 0.15 else f"{t1 / t0:.1f}×"
        print(f"| {k} (r9) | {t0:.1f} s | {t1:.1f} s | {growth} | |")


if __name__ == "__main__":
    main()
