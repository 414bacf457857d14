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
    # sf1 addendum (r12 VERDICT task 4): the 10x-tier column, when present.
    # Its calibration was a scalar in r12 (min-of-1) and a list from r13 on
    # (min-of-2) — normalize to a min either way.
    sf1cal = d.get("summary", {}).get("sf1", {}).get("calibration_s")
    if isinstance(sf1cal, list):
        sf1cal = min(sf1cal) if sf1cal else None
    return (d.get("queries", {}), (min(cal) if cal else None),
            d.get("summary", {}), d.get("sf1_queries", {}), sf1cal)


def diff_rows(oldq, newq, oldcal, newcal, threshold):
    """Calibration-normalized per-entry ratios, biggest movers first."""
    ratio = (newcal / oldcal) if (oldcal and newcal) else 1.0
    rows = []
    for name in sorted(set(oldq) & set(newq)):
        o, n = oldq[name], newq[name]
        if o <= 0 or n <= 0:
            continue  # failed entries carry sec = -1
        norm = n / ratio
        r = norm / o
        # Upward flags additionally require the RAW ratio to clear a
        # 0.9-clamped threshold (same rule as Bench.sf1Flagged, r17): a
        # lucky calibration sample on the new side deflates the threshold
        # and manufactures flags out of raw ratios near 1.2x. Displayed
        # norm/ratio stay unclamped — only the flag decision is damped.
        up = r >= threshold and (n / o) >= threshold * 0.9
        rows.append((name, o, n, norm, r, up or r <= 1 / threshold))
    rows.sort(key=lambda t: -abs(__import__("math").log(t[4])))
    return rows, ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag movers whose normalized ratio exceeds this (or its inverse)")
    ap.add_argument("--md", action="store_true", help="emit a markdown table")
    args = ap.parse_args()

    oldq, oldcal, olds, oldsf1, oldsf1cal = load(args.old)
    newq, newcal, news, newsf1, newsf1cal = load(args.new)

    # Box-speed normalization: if both runs carry a calibration value,
    # scale the new timings into the old run's box. A noisy window shows
    # up as a calibration ratio far from 1 and is reported, not hidden.
    rows, ratio = diff_rows(oldq, newq, oldcal, newcal, args.threshold)

    added = sorted(set(newq) - set(oldq))
    removed = sorted(set(oldq) - set(newq))
    flagged = [r for r in rows if r[5]]

    # sf1-tier diff, only when BOTH artifacts carry the addendum column
    sf1_rows, sf1_ratio = ((None, None) if not (oldsf1 and newsf1) else
                           diff_rows(oldsf1, newsf1, oldsf1cal, newsf1cal,
                                     args.threshold))
    sf1_flagged = [r for r in (sf1_rows or []) if r[5]]

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
              f"added: {', '.join(added) or '-'}; removed: {', '.join(removed) or '-'}")
        # r17: the bench's own load-robustness moves, read from the artifact
        reprobed = news.get("reprobed") or []
        deferred = news.get("deferred") or []
        if reprobed:
            print(f"- re-probed (inflated min replaced by a tagged standalone "
                  f"sample): {', '.join(reprobed)}")
        if deferred:
            print(f"- deadline deferrals: {'; '.join(deferred)}")
        print()
        print("| query | old s | new s | new norm s | ratio | flag |")
        print("|---|---|---|---|---|---|")
        for name, o, n, norm, r, fl in rows:
            if fl or abs(r - 1) >= 0.25:  # keep the table readable
                print(f"| {name} | {o:.2f} | {n:.2f} | {norm:.2f} | {r:.2f}x | "
                      f"{'**FLAG**' if fl else ''} |")
        if sf1_rows is not None:
            # In-artifact adjudication probes (r17, VERDICT r16 task 4):
            # Bench re-runs every calibration-normalized flag min-of-2
            # same-JVM on one freshly calibrated window and records the
            # result under summary.sf1.probes — so the flag table below
            # adjudicates from the artifact alone, no manual ABProbe
            # session. A probe is an upper bound (standalone billing
            # rebuilds shared pipeline inputs), so "probe in-band" is
            # conclusive and "probe high" means look closer, not regress.
            probes = news.get("sf1", {}).get("probes") or {}
            pcal = news.get("sf1", {}).get("probe_cal")
            print(f"\n## sf1 tier (10x)\n")
            print(f"- calibration ratio {round(sf1_ratio, 3)} "
                  f"(fastest sf1 calibration: old {oldsf1cal}, new {newsf1cal}); "
                  f"{len(sf1_rows)} entries compared, {len(sf1_flagged)} flagged"
                  + (f"; {len(probes)} in-artifact probes at probe_cal {pcal}"
                     if probes else "") + "\n")
            print("| query | old s | new s | new norm s | ratio | flag | probe s | probe norm | verdict |")
            print("|---|---|---|---|---|---|---|---|---|")
            for name, o, n, norm, r, fl in sf1_rows:
                if fl or abs(r - 1) >= 0.25:
                    pv = probes.get(name)
                    if pv is not None and pv > 0 and pcal and oldsf1cal:
                        # Same 0.9 deflation clamp as the flag rule (and
                        # Bench.sf1Flagged): probe_cal is one sample, and a
                        # lucky fast one inflates every probe norm into a
                        # spurious "still high" even when the RAW probe
                        # ratio is well under threshold (observed: probe
                        # 1.14-1.36x raw rendered as 1.5-1.8x normalized).
                        pn = pv / max(pcal / oldsf1cal, 0.9)
                        verdict = ("in-band" if pn / o < args.threshold
                                   else "still high")
                        pcell, pncell = f"{pv:.2f}", f"{pn:.2f}"
                    else:
                        pcell, pncell = "", ""
                        # downward movers need no defense; only an upward
                        # flag without a probe is a gap
                        verdict = ("" if not fl else
                                   ("speedup" if r < 1 else "unprobed"))
                    print(f"| {name} | {o:.2f} | {n:.2f} | {norm:.2f} | {r:.2f}x | "
                          f"{'**FLAG**' if fl else ''} | {pcell} | {pncell} | {verdict} |")
        elif oldsf1 or newsf1:
            print(f"\n## sf1 tier (10x)\n")
            print(f"- only {'new' if newsf1 else 'old'} artifact carries "
                  f"sf1_queries — no sf1 diff this round")
    else:
        out = {"summary": hdr,
               "flagged": [{"query": n, "old_s": o, "new_s": s,
                            "norm_new_s": round(norm, 3), "ratio": round(r, 3)}
                           for n, o, s, norm, r, _ in flagged]}
        if sf1_rows is not None:
            out["sf1"] = {"cal_ratio": round(sf1_ratio, 3),
                          "n_compared": len(sf1_rows),
                          "flagged": [{"query": n, "old_s": o, "new_s": s,
                                       "norm_new_s": round(norm, 3),
                                       "ratio": round(r, 3)}
                                      for n, o, s, norm, r, _ in sf1_flagged]}
        print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
