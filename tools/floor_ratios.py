#!/usr/bin/env python3
"""Raw vs canary-normalized floor-ratio report (VERDICT r15 #1).

Usage: python3 tools/floor_ratios.py <this_round_archive> <base_archive>

Reads two composite floor archives (BENCH_LOCAL_r*.json), computes the
per-query ratio this/base over the common non-failed queries, and prints
three medians:
  - raw            — the weather-hostage number PROFILE used to report
  - norm_cons      — raw / canary_scale_cons: credit only the machine
                     slowdown EVERY canary leg agrees on (lower bound)
  - norm_par       — raw / canary_scale_par: credit the full parallel-leg
                     (aggregate-bandwidth) slowdown (upper bound)
The canary scales come from the archive's own stamped fields when present
(rendered by graft.Bench.renderFloors); for an archive that predates them
(r15 and older) the scales are recomputed here from its canary triple vs
the same reference the bench uses, and an archive with no canary at all
(r12 and older) gets scale 1 — that is exactly the anchor role the
reference plays.
"""
import json
import statistics
import sys

CANARY_REF = (0.248, 0.161, 0.021)  # graft.Bench.CanaryRefDefault


def scales(d):
    cons = d.get("canary_scale_cons")
    par = d.get("canary_scale_par")
    if cons is not None and par is not None:
        return cons, par
    c = (d.get("canary_cpu", -1.0), d.get("canary_mem", -1.0),
         d.get("canary_par", -1.0))
    legs = []
    for t, r in zip(c, CANARY_REF):
        legs.append(max(1.0, t / r) if t > 0 and r > 0 else None)
    cons = 1.0 if any(l is None for l in legs) else min(legs)
    par = legs[2] if legs[2] is not None else 1.0
    return cons, par


def seg_scale(d, q):
    """Per-floor machine scale from the providing sample's own parallel-
    leg probe (canary_par_q, r16+): temporally aligned with the sample.
    Absent/unreadable stamps get no credit (scale 1)."""
    p = d.get("canary_par_q", {}).get(q, -1.0)
    return max(1.0, p / CANARY_REF[2]) if p > 0 else 1.0


def main():
    this = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    tq, bq = this["queries"], base["queries"]
    common = sorted(q for q in tq if q in bq and tq[q] > 0 and bq[q] > 0)
    raw = {q: tq[q] / bq[q] for q in common}
    t_cons, t_par = scales(this)
    b_cons, b_par = scales(base)
    # normalize BOTH sides: each archive's floors are divided by its own
    # machine-slowdown scale before the ratio
    norm_cons = {q: (tq[q] / t_cons) / (bq[q] / b_cons) for q in common}
    norm_par = {q: (tq[q] / t_par) / (bq[q] / b_par) for q in common}
    # the sharp instrument: each floor divided by ITS providing sample's
    # probed slowdown (per-segment, not per-run)
    norm_parq = {q: (tq[q] / seg_scale(this, q)) / (bq[q] / seg_scale(base, q))
                 for q in common}
    med = statistics.median
    print(f"common queries: {len(common)}")
    print(f"this scales: cons={t_cons:.3f} par={t_par:.3f}   "
          f"base scales: cons={b_cons:.3f} par={b_par:.3f}")
    stamped = sum(1 for q in common
                  if this.get("canary_par_q", {}).get(q, -1.0) > 0)
    print(f"per-segment par stamps on this side: {stamped}/{len(common)}")
    print(f"median raw       : {med(raw.values()):.3f}")
    print(f"median norm_cons : {med(norm_cons.values()):.3f}")
    print(f"median norm_par  : {med(norm_par.values()):.3f}")
    print(f"median norm_parq : {med(norm_parq.values()):.3f}")
    worst = sorted(raw.items(), key=lambda kv: -kv[1])[:8]
    print("worst raw ratios:")
    for q, r in worst:
        print(f"  {q:32s} {r:5.2f}  ({tq[q]:.2f}s vs {bq[q]:.2f}s, "
              f"norm_parq {norm_parq[q]:.2f})")
    missing_this = sorted(q for q in bq if q not in tq)
    missing_base = sorted(q for q in tq if q not in bq)
    if missing_this:
        print(f"queries only in base ({len(missing_this)}): "
              + ", ".join(missing_this[:10]))
    if missing_base:
        print(f"queries only in this ({len(missing_base)}): "
              + ", ".join(missing_base[:10]))


if __name__ == "__main__":
    main()
