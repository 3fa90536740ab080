#!/usr/bin/env python3
"""Raw vs canary-normalized floor-ratio report (VERDICT r15 #1).

Usage: python3 tools/floor_ratios.py [--ref cpu,mem,par] <this_archive> <base_archive>

Reads two composite floor archives (BENCH_LOCAL_r*.json), computes the
per-query ratio this/base over the common non-failed queries, and prints
four medians:
  - raw            — the weather-hostage number PROFILE used to report
  - norm_cons      — raw / canary_scale_cons: credit only the machine
                     slowdown EVERY canary leg agrees on (lower bound)
  - norm_par       — raw / canary_scale_par: credit the full parallel-leg
                     (aggregate-bandwidth) slowdown (upper bound)
  - norm_parq      — each floor divided by ITS providing sample's probed
                     slowdown (per-segment, the sharpest instrument)

Canary-reference single-sourcing (VERDICT r16 #3 / ADVICE r16 #4): the
run-level scales come from the archive's own stamped fields
(canary_scale_cons/par, rendered by graft.Bench.renderFloors) whenever
present — those were computed by the bench itself under whatever
reference it ran with, so they can never disagree with the bench's own
normalization. Only for archives that predate the stamps (r15 and
older) are scales recomputed here, and the reference for that — and for
the per-segment seg_scale, which the bench does not stamp as a scale —
is resolved exactly like graft.Bench.canaryRef(): `--ref cpu,mem,par`
if given, else SPARK_GRAFT_CANARY_REF, else the committed default. A
malformed override fails LOUDLY instead of silently falling back.

Plan-change exclusions (VERDICT r16 #4): a query whose PLAN was
deliberately changed between the two archives' rounds has floors that
are not comparable — the ratio measures the plan decision, not the
weather or the code quality. PLAN_CHANGED carries those queries with
their citations; they are annotated in the per-query output and the
medians are printed both with and without them.
"""
import json
import os
import statistics
import sys

CANARY_REF_DEFAULT = (0.248, 0.161, 0.021)  # graft.Bench.CanaryRefDefault

# query -> (excluded-when-base-round <= N, citation)
PLAN_CHANGED = {
    "q_ngram_jaccard": (
        12,
        "r12's 1.50 s floor bought the hot-key-quadratic ngram join that "
        "r13 deliberately killed (VERDICT r12 finding #1 / r13 fix); the "
        "post-r13 plan's own quiet floor is ~2.9 s (LADDER r15 rung-2 "
        "2.895 s @ steal 0.05, re-certified r17) — ratios vs r12 price "
        "the scale-safety fix, not a regression"),
}


def canary_ref(argv):
    """Resolve the reference triple exactly like graft.Bench.canaryRef:
    --ref beats SPARK_GRAFT_CANARY_REF beats the committed default.
    Malformed values are a hard error, not a silent fallback."""
    spec, src = None, None
    if "--ref" in argv:
        i = argv.index("--ref")
        if i + 1 >= len(argv):
            sys.exit("--ref needs a value: cpu,mem,par")
        spec, src = argv[i + 1], "--ref"
        del argv[i:i + 2]
    elif os.environ.get("SPARK_GRAFT_CANARY_REF"):
        spec, src = os.environ["SPARK_GRAFT_CANARY_REF"], \
            "SPARK_GRAFT_CANARY_REF"
    if spec is None:
        return CANARY_REF_DEFAULT, "default"
    parts = spec.split(",")
    if len(parts) != 3:
        sys.exit(f"malformed canary reference from {src}: {spec!r} "
                 "(want cpu,mem,par)")
    try:
        trip = tuple(float(p.strip()) for p in parts)
    except ValueError:
        sys.exit(f"malformed canary reference from {src}: {spec!r}")
    return trip, src


def scales(d, ref):
    """Run-level scales: the archive's OWN stamps win unconditionally
    (they are the bench's normalization, rendered at archive time); a
    pre-stamp archive gets a recompute under the resolved reference,
    and an archive with no canary at all (r12 and older) gets scale 1 —
    exactly the anchor role the reference plays."""
    cons = d.get("canary_scale_cons")
    par = d.get("canary_scale_par")
    if cons is not None and par is not None:
        return cons, par, "stamped"
    c = (d.get("canary_cpu", -1.0), d.get("canary_mem", -1.0),
         d.get("canary_par", -1.0))
    legs = []
    for t, r in zip(c, ref):
        legs.append(max(1.0, t / r) if t > 0 and r > 0 else None)
    cons = 1.0 if any(l is None for l in legs) else min(legs)
    par = legs[2] if legs[2] is not None else 1.0
    return cons, par, "recomputed"


def seg_scale(d, q, ref_par):
    """Per-floor machine scale from the providing sample's own parallel-
    leg probe (canary_par_q, r16+): temporally aligned with the sample.
    Absent/unreadable stamps get no credit (scale 1). An archive that
    RECORDS the reference it was rendered under (canary_ref, r17+) is
    normalized under its own recorded anchor — a later re-anchor can
    then never silently split this tool from the bench's own fields."""
    rec = d.get("canary_ref")
    if isinstance(rec, list) and len(rec) == 3 and rec[2] > 0:
        ref_par = rec[2]
    p = d.get("canary_par_q", {}).get(q, -1.0)
    return max(1.0, p / ref_par) if p > 0 and ref_par > 0 else 1.0


def base_round(path):
    """Round number from a BENCH_LOCAL_r<N>*.json name, 0 if unparsable
    (then no plan-change exclusion applies — unknown stays inclusive)."""
    import re
    m = re.search(r"BENCH_LOCAL_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def main():
    argv = sys.argv[1:]
    ref, ref_src = canary_ref(argv)
    # --base-round N: explicit base round for the plan-change exclusions
    # when the base archive's name does not carry one (ADVICE r17 —
    # e.g. a copied/renamed archive); the filename inference stays the
    # default
    forced_round = None
    if "--base-round" in argv:
        i = argv.index("--base-round")
        if i + 1 >= len(argv):
            sys.exit("--base-round needs a round number")
        try:
            forced_round = int(argv[i + 1])
        except ValueError:
            sys.exit(f"--base-round must be an int, got {argv[i + 1]!r}")
        del argv[i:i + 2]
    if len(argv) != 2:
        sys.exit("usage: floor_ratios.py [--ref cpu,mem,par] "
                 "[--base-round N] <this_archive> <base_archive>")
    this = json.load(open(argv[0]))
    base = json.load(open(argv[1]))
    tq, bq = this["queries"], base["queries"]
    common = sorted(q for q in tq if q in bq and tq[q] > 0 and bq[q] > 0)
    b_round = forced_round if forced_round is not None \
        else base_round(argv[1])
    excluded = {q: cite for q, (upto, cite) in PLAN_CHANGED.items()
                if q in common and 0 < b_round <= upto}
    raw = {q: tq[q] / bq[q] for q in common}
    t_cons, t_par, t_src = scales(this, ref)
    b_cons, b_par, b_src = scales(base, ref)
    # normalize BOTH sides: each archive's floors are divided by its own
    # machine-slowdown scale before the ratio
    norm_cons = {q: (tq[q] / t_cons) / (bq[q] / b_cons) for q in common}
    norm_par = {q: (tq[q] / t_par) / (bq[q] / b_par) for q in common}
    # the sharp instrument: each floor divided by ITS providing sample's
    # probed slowdown (per-segment, not per-run)
    norm_parq = {q: (tq[q] / seg_scale(this, q, ref[2]))
                 / (bq[q] / seg_scale(base, q, ref[2])) for q in common}
    med = statistics.median
    print(f"canary reference: {ref} (from {ref_src})")
    print(f"common queries: {len(common)}"
          + (f"  [{len(excluded)} plan-change-excluded from the "
             f"ex-medians: {', '.join(sorted(excluded))}]"
             if excluded else ""))
    print(f"this scales: cons={t_cons:.3f} par={t_par:.3f} ({t_src})   "
          f"base scales: cons={b_cons:.3f} par={b_par:.3f} ({b_src})")
    stamped = sum(1 for q in common
                  if this.get("canary_par_q", {}).get(q, -1.0) > 0)
    print(f"per-segment par stamps on this side: {stamped}/{len(common)}")
    inc = [q for q in common if q not in excluded]
    for label, m in (("raw", raw), ("norm_cons", norm_cons),
                     ("norm_par", norm_par), ("norm_parq", norm_parq)):
        line = f"median {label:10s}: {med(m.values()):.3f}"
        if excluded:
            line += f"   ex-plan-change: {med(m[q] for q in inc):.3f}"
        print(line)
    worst = sorted(raw.items(), key=lambda kv: -kv[1])[:8]
    print("worst raw ratios:")
    for q, r in worst:
        mark = "  [PLAN CHANGED — see note]" if q in excluded else ""
        print(f"  {q:32s} {r:5.2f}  ({tq[q]:.2f}s vs {bq[q]:.2f}s, "
              f"norm_parq {norm_parq[q]:.2f}){mark}")
    for q, cite in sorted(excluded.items()):
        print(f"note [{q}]: {cite}")
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
