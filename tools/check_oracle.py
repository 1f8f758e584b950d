#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf tables, and compares: schema (column
names, sorted), row count, and exact values (rows sorted by all columns).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: cols {gc} != {ec}"); n_fail += 1; continue
        got, exp = got[gc], exp[ec]
        # the driver's hash is TYPE-sensitive: a DuckDB HUGEINT (object dtype
        # in pandas) where Spark emits int64 fails the gate even when values
        # match. Reproduce that here: any integer-family dtype divergence is
        # a FAIL (the oracle SQL needs a ::BIGINT cast).
        dtype_bad = [
            (c, str(got[c].dtype), str(exp[c].dtype)) for c in gc
            if str(got[c].dtype) != str(exp[c].dtype)
            and not (got[c].dtype.kind == "f" and exp[c].dtype.kind == "f")
        ]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad} "
                  f"(uncast HUGEINT/oracle-type drift?)"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        g = got.sort_values(by=gc, ignore_index=True)
        e = exp.sort_values(by=ec, ignore_index=True)
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as err:
            print(f"FAIL {name}: value mismatch: {str(err).splitlines()[-1][:200]}")
            # show first differing cell
            for c in gc:
                neq = (g[c].astype(str) != e[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col={c} row={i} spark={g[c][i]!r} duck={e[c][i]!r}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
