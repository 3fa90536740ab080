#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir> [--strict]

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB against the sf_dir parquet
tables, sorts columns by name, sorts rows, and compares values cell-by-cell
(floats to 6 significant decimals). Exit 0 iff all match.

--strict mimics the driver's hash gate: cells compare EXACTLY (floats by
their IEEE bit pattern, decimals by full string), and any query whose
output contains a float/decimal/hugeint column on either side is flagged
NONINT — those are the columns that historically hash-mismatch across
engines even when values agree.
"""
import decimal
import json
import math
import struct
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

STRICT = False


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if STRICT:
            return struct.pack("<d", v).hex()
        return f"{v:.6g}"
    if isinstance(v, decimal.Decimal) and STRICT:
        return "dec:" + str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def nonint_cols(cols, rows):
    """Columns whose values are float or Decimal (hash-fragile types)."""
    bad = set()
    for r in rows[:200]:
        for c, v in zip(cols, r):
            if isinstance(v, (float, decimal.Decimal)):
                bad.add(c)
    return sorted(bad)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main(out_dir, sf_dir):
    out_dir, sf_dir = Path(out_dir), Path(sf_dir)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures, passed, rows_only, nonint = [], 0, 0, []
    names = sorted(d.name for d in out_dir.iterdir() if d.is_dir())
    # every oracle key must have an output dir: a query that threw inside
    # Verify leaves none, and iterating only existing dirs would skip it
    # silently — the vacuously-green failure mode this gate exists to stop
    for missing in sorted(set(oracle) - set(names)):
        failures.append((missing, "no output dir — the Spark query failed "
                                  "or was never run"))
    for name in names:
        files = list((out_dir / name).glob("*.parquet"))
        if not files:
            failures.append((name, "no spark output parquet"))
            continue
        tbl = pq.read_table(files[0])
        s_cols = tbl.column_names
        s_rows = [tuple(row[c] for c in s_cols) for row in tbl.to_pylist()]
        if name not in oracle:
            rows_only += 1
            status = "ROWS-ONLY"
            print(f"  {name}: {status} rows={len(s_rows)}")
            if len(s_rows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            res = con.execute(oracle[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            continue
        if STRICT:
            frag = sorted(set(nonint_cols(s_cols, s_rows)) |
                          set(nonint_cols(d_cols, d_rows)))
            if frag:
                nonint.append((name, frag))
        sc, sr = normalize(s_cols, s_rows)
        dc, dr = normalize(d_cols, d_rows)
        if sc != dc:
            failures.append((name, f"schema mismatch spark={sc} duckdb={dc}"))
            continue
        if len(sr) != len(dr):
            failures.append((name, f"rowcount spark={len(sr)} duckdb={len(dr)}"))
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append(
                (name, f"{len(bad)}/{len(sr)} rows differ; first at {i}:\n"
                       f"    spark : {a}\n    duckdb: {b}\n    cols: {sc}"))
            continue
        passed += 1
        print(f"  {name}: OK rows={len(sr)}")

    print(f"\n{passed} oracle-matched, {rows_only} rows-only, {len(failures)} failed")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    for name, cols in nonint:
        print(f"NONINT {name}: hash-fragile output columns {cols}")
    return 1 if failures or nonint else 0


if __name__ == "__main__":
    STRICT = "--strict" in sys.argv[3:]
    sys.exit(main(sys.argv[1], sys.argv[2]))
