"""Calibration-normalized cross-round bench comparison (round 10,
VERDICT r9 #3).

Usage: python tools/bench_normalize.py BENCH_rOLD.json BENCH_rNEW.json
       [--threshold 0.15]

Every BENCH file since round 9 carries a fixed-work host yardstick
(bench.calibration_run: xxhash64 fold over 3.2B rows at the bench CPU
count), measured at the start AND end of the suite. The host-speed
factor of a run is the GEOMETRIC MEAN of the two (a run whose load
decayed mid-suite is best described by the middle of its own window;
for a <=5%-drift run accepted by the round-10 gate the choice is
immaterial). For each query timed in both files:

    raw_ratio  = t_new / t_old
    norm_ratio = raw_ratio / (cal_new / cal_old)

norm_ratio is the CODE-attributable ratio: what the query's cost did
after dividing out how much slower/faster the new host window was on
identical fixed work. Queries outside [1-threshold, 1+threshold] after
normalization are flagged; everything else is host band by measurement,
not prose.

Output: a markdown table (worst normalized regressions first) plus the
raw drift numbers of both runs — paste-ready for SCALING.md.
"""

from __future__ import annotations

import json
import math
import sys


def _host_factor(bench: dict) -> float | None:
    start = bench.get("calibration_s")
    end = bench.get("calibration_end_s")
    if start is None:
        return None
    if end is None:
        return float(start)
    return math.sqrt(float(start) * float(end))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="bench_normalize", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("old_file")
    ap.add_argument("new_file")
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="flag normalized ratios outside 1±threshold")
    ns = ap.parse_args()
    args = [ns.old_file, ns.new_file]
    threshold = ns.threshold
    # the driver's BENCH_r{N}.json wraps bench.py's JSON line in
    # {"n":…, "rc":…, "parsed": {...}}; the repo's BENCH.json is bare
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    old = old.get("parsed", old)
    new = new.get("parsed", new)
    cal_old, cal_new = _host_factor(old), _host_factor(new)
    if cal_old is None or cal_new is None:
        print("one of the files lacks calibration_s — normalization "
              "needs two calibrated runs (round 9+)")
        return 2
    host_ratio = cal_new / cal_old
    common = sorted(set(old["queries"]) & set(new["queries"]))
    # round 11: median-of-windows BENCH files carry per-query cross-window
    # spreads — shown as ± columns so a delta reads against the
    # instrument's own error bar, and a normalized ratio whose deviation
    # is inside the combined spread is not flagged
    sp_old = old.get("queries_spread", {})
    sp_new = new.get("queries_spread", {})
    rows = []
    for q in common:
        t_old, t_new = float(old["queries"][q]), float(new["queries"][q])
        if t_old <= 0:
            continue
        raw = t_new / t_old
        err = float(sp_old.get(q, 0.0)) + float(sp_new.get(q, 0.0))
        rows.append((q, t_old, t_new, raw, raw / host_ratio, err))
    rows.sort(key=lambda r: -r[4])
    flagged = [
        r for r in rows if abs(r[4] - 1.0) > max(threshold, r[5] / 2)
    ]

    def _drift(b: dict) -> str:
        d = b.get("calibration_drift")
        if d is None and b.get("calibration_end_s"):
            d = abs(b["calibration_end_s"] - b["calibration_s"]) / b[
                "calibration_s"]
        return f"{d:.1%}" if d is not None else "n/a"

    print(f"calibration: old {old.get('calibration_s')}→"
          f"{old.get('calibration_end_s')} (drift {_drift(old)}), "
          f"new {new.get('calibration_s')}→{new.get('calibration_end_s')} "
          f"(drift {_drift(new)}); host factor new/old = {host_ratio:.3f}")
    tot_old = sum(r[1] for r in rows)
    tot_new = sum(r[2] for r in rows)
    print(f"{len(rows)} common queries: raw total {tot_old:.2f}→"
          f"{tot_new:.2f} s ({tot_new / tot_old:.3f}x raw, "
          f"{tot_new / tot_old / host_ratio:.3f}x normalized); "
          f"{len(flagged)} outside ±{threshold:.0%} normalized "
          "(and outside the windows' own spread)")
    have_spread = bool(sp_old or sp_new)
    print()
    if have_spread:
        print("| query | old (s) | new (s) | raw ratio "
              "| normalized ratio | window spread (old+new) |")
        print("|---|---|---|---|---|---|")
    else:
        print("| query | old (s) | new (s) | raw ratio | normalized ratio |")
        print("|---|---|---|---|---|")
    for q, t_old, t_new, raw, norm, err in rows:
        mark = (
            " **" if abs(norm - 1.0) > max(threshold, err / 2) else " "
        )
        tail = f" ±{err:.0%} |" if have_spread else ""
        print(f"| {q}{mark.rstrip()} | {t_old:.2f} | {t_new:.2f} "
              f"| {raw:.2f} | {norm:.2f} |{tail}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
