#!/usr/bin/env python3
"""Min-merge ladder artifacts across invocations (r17).

Usage: python3 tools/ladder_merge.py <out.json> <ladder_log_or_json>...

Each input is either a bare ladder JSON line ({"metric":"ladder",...})
or a log file containing one; rungs are matched per (query, rows) and
the MINIMUM sec wins, keeping its own steal/par stamps (the same
estimator the bench's composite floors use: contention only ever
inflates a rung, so the min across invocations in different weather is
the best floor evidence). Exponents are REFIT from the merged rungs —
per-invocation fits describe that invocation's weather, not the merged
floor curve. The merged artifact carries merged_invocations so a
reader can see how much weather diversity backs each rung.
"""
import json
import sys


def lines(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric":"ladder"'):
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    pass


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: ladder_merge.py <out.json> <inputs...>")
    out, inputs = sys.argv[1], sys.argv[2:]
    merged = {}   # q -> {rows -> rung dict}
    mult, n_inv = None, 0
    for path in inputs:
        for art in lines(path):
            n_inv += 1
            mult = art.get("mult", mult)
            for q, d in art.get("queries", {}).items():
                tgt = merged.setdefault(q, {})
                for rung in d.get("rungs", []):
                    r = rung["rows"]
                    if r not in tgt or rung["sec"] < tgt[r]["sec"]:
                        tgt[r] = dict(rung)
    if not merged:
        sys.exit("no ladder artifacts found in inputs")
    import math
    qjson = {}
    worst = None
    for q, tgt in merged.items():
        rungs = [tgt[r] for r in sorted(tgt)]
        exps = []
        for a, b in zip(rungs, rungs[1:]):
            if b["rows"] > a["rows"] and a["sec"] > 0:
                exps.append(round(
                    math.log(b["sec"] / a["sec"])
                    / math.log(b["rows"] / a["rows"]), 3))
        qjson[q] = {"rungs": rungs, "exponents": exps}
        if exps and (worst is None or exps[-1] > worst[1]):
            worst = (q, exps[-1])
    art = {"metric": "ladder", "mult": mult,
           "merged_invocations": n_inv, "queries": qjson,
           "worst_top_leg": ({"q": worst[0], "exponent": worst[1]}
                             if worst else None)}
    with open(out, "w") as f:
        json.dump(art, f)
        f.write("\n")
    for q, d in qjson.items():
        print(q, " ".join(
            f"{r['rows']}:{r['sec']:.2f}s(st {r['steal']:.2f}"
            + (f",par {r['par']:.3f}" if "par" in r else "") + ")"
            for r in d["rungs"]), "exp", d["exponents"])


if __name__ == "__main__":
    main()
