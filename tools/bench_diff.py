#!/usr/bin/env python3
"""Round-over-round bench differ (r10 VERDICT task 5).

Compares two bench.json artifacts (the per-query min-of-3 + calibration
format Bench.scala writes via SPARK_GRAFT_BENCH_OUT), normalizes the new
run by the calibration ratio — the box swings +/-40% under co-tenant
load, and the calibration probe measures the box, not the code — and
flags movers beyond a threshold AFTER normalization. Replaces the manual
per-round ABProbe-noise adjudication ritual: flagged movers get probed,
unflagged ones don't.

Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [--threshold 1.5] [--md]

The previous round's artifact comes from git:
    git show <round-tag-or-rev>:bench.json > /tmp/bench_old.json
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    cal = d.get("summary", {}).get("calibration_s") or []
    # MIN, not median: per-query numbers are min-of-N (the box swings under
    # co-tenant load and pass 1 additionally pays JIT warmup — a median over
    # 3 passes inherits both), so the comparable box-speed companion is the
    # fastest calibration the run observed.
    return d.get("queries", {}), (min(cal) if cal else None), d.get("summary", {})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag movers whose normalized ratio exceeds this (or its inverse)")
    ap.add_argument("--md", action="store_true", help="emit a markdown table")
    args = ap.parse_args()

    oldq, oldcal, olds = load(args.old)
    newq, newcal, news = load(args.new)

    # Box-speed normalization: if both runs carry a calibration value,
    # scale the new timings into the old run's box. A noisy window shows
    # up as a calibration ratio far from 1 and is reported, not hidden.
    ratio = (newcal / oldcal) if (oldcal and newcal) else 1.0

    rows = []
    for name in sorted(set(oldq) & set(newq)):
        o, n = oldq[name], newq[name]
        if o <= 0 or n <= 0:
            continue  # failed entries carry sec = -1
        norm = n / ratio
        r = norm / o
        rows.append((name, o, n, norm, r, r >= args.threshold or r <= 1 / args.threshold))
    rows.sort(key=lambda t: -abs(__import__("math").log(t[4])))

    added = sorted(set(newq) - set(oldq))
    removed = sorted(set(oldq) - set(newq))
    flagged = [r for r in rows if r[5]]

    hdr = {
        "old_total": olds.get("value"), "new_total": news.get("value"),
        "old_cal_min": oldcal, "new_cal_min": newcal,
        "cal_ratio": round(ratio, 3), "threshold": args.threshold,
        "n_compared": len(rows), "n_flagged": len(flagged),
        "added": added, "removed": removed,
    }

    if args.md:
        print(f"# Bench diff\n")
        print(f"- totals: {hdr['old_total']} -> {hdr['new_total']} s; "
              f"calibration ratio {hdr['cal_ratio']} "
              f"(fastest calibration: old {oldcal}, new {newcal})")
        print(f"- {len(rows)} entries compared, {len(flagged)} flagged at "
              f"{args.threshold}x (calibration-normalized); "
              f"added: {', '.join(added) or '-'}; removed: {', '.join(removed) or '-'}\n")
        print("| query | old s | new s | new norm s | ratio | flag |")
        print("|---|---|---|---|---|---|")
        for name, o, n, norm, r, fl in rows:
            if fl or abs(r - 1) >= 0.25:  # keep the table readable
                print(f"| {name} | {o:.2f} | {n:.2f} | {norm:.2f} | {r:.2f}x | "
                      f"{'**FLAG**' if fl else ''} |")
    else:
        print(json.dumps({"summary": hdr,
                          "flagged": [{"query": n, "old_s": o, "new_s": s,
                                       "norm_new_s": round(norm, 3),
                                       "ratio": round(r, 3)}
                                      for n, o, s, norm, r, _ in flagged]},
                         indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
