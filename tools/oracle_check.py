#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and diff.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result and
the DuckDB result of oracle_sql.json[name] (views named after the testdata
tables), sort columns by name, sort rows, compare values.
"""
import sys, os, json, math
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
                    rr.append(repr(v))
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            want_rel = con.execute(sql)
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_bad += 1
            continue
        # sort columns by name (driver semantics)
        gperm = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        wperm = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        if sorted(got_cols) != sorted(want_cols):
            print(f"SCHEMA   {name}: spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_bad += 1
            continue
        g = canon([[r[i] for i in gperm] for r in got])
        w = canon([[r[i] for i in wperm] for r in want])
        if len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} oracle={len(w)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(g, w) if a != b]
        if diffs:
            print(f"VALUES   {name}: {len(diffs)}/{len(g)} rows differ; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
