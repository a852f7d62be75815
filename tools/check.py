#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracles and diff (row counts, schemas, sorted values).
Dev tool only — NOT part of the Spark library. Usage:
  python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    # EXACT float compare (shortest round-trip repr).
                    # The r8 gate rounded to 9 decimals here, which let
                    # round(,6) finals pass locally while the driver's
                    # exact hash failed them — never weaken this again.
                    rr.append(repr(v))
            else:
                rr.append(str(v) if v is not None else None)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(f"select * from read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got_rel.columns)
            got = canon(con.sql(
                f"select {', '.join(got_cols)} from got_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            # Driver-faithfulness gate (the r8/r9 five-query mechanism):
            # DuckDB sum(BIGINT) returns HUGEINT, which the driver's
            # pandas/arrow conversion turns into float64/decimal128 —
            # hash-incompatible with Spark's int64 even on identical
            # values. fetchall() below is lossless, so without this
            # check the local gate passes where the driver fails.
            huge = [f"{c}:{t}" for c, t in zip(exp_rel.columns, exp_rel.types)
                    if str(t) in ("HUGEINT", "UHUGEINT")
                    or str(t).startswith("DECIMAL")]
            if huge:
                print(f"FAIL {name}: oracle emits non-portable types "
                      f"{huge} — cast to BIGINT/DOUBLE in the SQL")
                n_bad += 1
                continue
            exp = canon(con.sql(
                f"select {', '.join(exp_cols)} from exp_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        def family(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                     "USMALLINT", "UINTEGER", "UBIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t
        got_fams = {c: family(t) for c, t in zip(got_rel.columns, got_rel.types)}
        exp_fams = {c: family(t) for c, t in zip(exp_rel.columns, exp_rel.types)}
        fam_bad = [(c, got_fams[c], exp_fams[c]) for c in got_fams
                   if c in exp_fams and got_fams[c] != exp_fams[c]]
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
        elif fam_bad:
            print(f"FAIL {name}: type-family mismatch spark vs oracle: {fam_bad}")
            n_bad += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
        elif got != exp:
            diffs = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
