#!/usr/bin/env python
"""Diff two bench JSON heads (bench.py output): totals over the shared
query set, per-query regressions/improvements past a threshold, and
added/removed queries.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]
Exit code 1 if any shared query regressed past the threshold AND exceeds
the absolute floor (0.5 s) — wire into a round gate if desired.
"""

from __future__ import annotations

import argparse
import json
import sys

ABS_FLOOR_SEC = 0.5  # ignore ratio noise on sub-half-second queries


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    old_doc = json.load(open(args.old))
    new_doc = json.load(open(args.new))
    old, new = old_doc["queries"], new_doc["queries"]
    shared = sorted(set(old) & set(new))
    tot_o = sum(old[q] for q in shared)
    tot_n = sum(new[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
        f"({tot_n / tot_o:.2f}x)"
    )
    # hardware-normalized ratio when both heads carry the round-11 verdict's
    # calibration constants (bench.py conf.calib_spark_s: a fixed tiny Spark
    # plan timed on the same machine right before the run) — this is the
    # mechanical replacement for prose drift estimates in SCALE_NOTES
    c_o = (old_doc.get("conf") or {}).get("calib_spark_s")
    c_n = (new_doc.get("conf") or {}).get("calib_spark_s")
    if c_o is not None and c_n is not None:
        # presence-tested (not truthiness): a recorded 0.0 is a corrupt
        # calibration, which should be loud rather than silently skipped
        if c_o <= 0 or c_n <= 0:
            print(
                f"WARNING: corrupt calib_spark_s ({c_o!r} -> {c_n!r}); "
                "normalized ratio unavailable"
            )
        else:
            drift = c_n / c_o
            print(
                f"calib_spark_s {c_o:.3f} -> {c_n:.3f} (env drift {drift:.2f}x); "
                f"normalized ratio {(tot_n / tot_o) / drift:.2f}x"
            )
    regressed = []
    for q in shared:
        r = new[q] / max(old[q], 0.01)
        if r >= args.threshold and new[q] >= ABS_FLOOR_SEC:
            regressed.append((r, q))
        elif r <= 1 / args.threshold and old[q] >= ABS_FLOOR_SEC:
            print(f"  IMP {q}: {old[q]:.2f} -> {new[q]:.2f} ({r:.2f}x)")
    for r, q in sorted(regressed, reverse=True):
        print(f"  REG {q}: {old[q]:.2f} -> {new[q]:.2f} ({r:.2f}x)")
    for q in sorted(set(new) - set(old)):
        print(f"  NEW {q}: {new[q]:.2f}")
    for q in sorted(set(old) - set(new)):
        print(f"  GONE {q}")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
