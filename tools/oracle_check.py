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

# Intended (spark_type, oracle_type) pairs the type lint accepts. The
# str()-value compare below stringifies DECIMAL(38,0) 11904 and BIGINT
# 11904 identically, so it can NEVER catch a result-type skew — but the
# driver's hasher types its values and does. Integer-width pairs hash
# alike driver-side (both fetch as plain ints; every rank()/row_number()
# query — Spark INTEGER vs DuckDB BIGINT — is driver-green), so they are
# allowlisted up to 64 bits; HUGEINT/DECIMAL-vs-integer is exactly the
# skew that failed the driver (q_mv_distinct_rollup, round 14: DuckDB
# types an uncast SUM(DISTINCT bigint) as a 128-bit value) and stays
# flagged.
_INTS = ["TINYINT", "SMALLINT", "INTEGER", "BIGINT"]
TYPE_OK = {(a, b) for a in _INTS for b in _INTS if a != b}


def col_types(con, query):
    """column name -> DuckDB type string for an arbitrary SELECT."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {query}").fetchall()}


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
        # type lint: same-named columns must carry the same DuckDB type in
        # the Spark parquet result and the oracle relation (modulo TYPE_OK)
        try:
            gt = col_types(con, f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            wt = col_types(con, f"({sql})")
            skew = [(c, gt[c], wt[c]) for c in sorted(gt)
                    if c in wt and gt[c] != wt[c] and (gt[c], wt[c]) not in TYPE_OK]
        except Exception as e:
            print(f"ERROR    {name}: type lint: {e}")
            n_bad += 1
            continue
        if skew:
            for c, g_ty, w_ty in skew:
                print(f"TYPESKEW {name}.{c}: spark={g_ty} oracle={w_ty} "
                      f"(driver hashes typed values — cast the oracle)")
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
