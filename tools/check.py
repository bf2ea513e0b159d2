#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over the same
parquet tables, and compares: column names (sorted), dtypes (loose),
row count, and values — both in as-written row order and value-sorted.
"""
import json
import re
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    return ds.dataset(path, format="parquet").to_table().to_pandas()


def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df


def canon_type(t):
    """Canonical arrow type for cross-engine compare: representation
    variants (large_*, tz-annotated timestamps) are equivalent; WIDTH
    and KIND differences (int64 vs decimal128/HUGEINT, int vs float)
    are NOT — that's exactly the drift the driver's hash punishes."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(canon_type(t.value_type))
    if pa.types.is_timestamp(t):
        return pa.timestamp("us")
    if pa.types.is_struct(t):
        return pa.struct([pa.field(f.name, canon_type(f.type)) for f in t])
    return t


def type_problems(spark_tbl, oracle_tbl):
    """Exact output-column type compare (round-10 lesson: DuckDB SUM()
    returns HUGEINT=decimal128, which the driver coerces to float64 and
    hash-fails even when every value matches as an integer)."""
    problems = []
    sf = {f.name: f.type for f in spark_tbl.schema}
    of = {f.name: f.type for f in oracle_tbl.schema}
    for name in sorted(set(sf) & set(of)):
        a, b = canon_type(sf[name]), canon_type(of[name])
        if a != b:
            problems.append(f"col {name}: TYPE drift spark={sf[name]} oracle={of[name]}")
    return problems


UNCAST_SUM = re.compile(r"(?<!CAST\()SUM\s*\(", re.IGNORECASE)


def lint_sql(name, sql):
    """Advisory: uncast SUM( in the FINAL select of an oracle is the
    signature of the round-10 HUGEINT drift. Warn-only (float SUMs and
    internal-only sums are legitimate); the arrow-type gate above is
    the hard fail."""
    final = sql[sql.upper().rfind("SELECT "):]
    hits = UNCAST_SUM.findall(final)
    if hits:
        print(f"WARN {name}: {len(hits)} uncast SUM( in final SELECT "
              f"(HUGEINT risk — wrap in CAST(... AS BIGINT) if it feeds an output column)")


def compare(name, spark_df, oracle_df):
    problems = []
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return [f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}"]
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = ((av.isna() & bv.isna()) | (av == bv))
                if not ok.all():
                    bad = (~ok).idxmax()
                    diff = abs(av - bv).max()
                    problems.append(
                        f"col {col}: {int((~ok).sum())} float mismatches "
                        f"(first at row {bad}: {av[bad]!r} vs {bv[bad]!r}, maxdiff={diff})")
            else:
                avs = av.astype(object).where(~av.isna(), None)
                bvs = bv.astype(object).where(~bv.isna(), None)

                def cell(x):
                    # normalize numpy arrays / lists to nested tuples so
                    # != is a scalar (array cells: emb_quantize etc.)
                    if hasattr(x, "tolist") and not isinstance(x, (str, bytes)):
                        x = x.tolist()
                    if isinstance(x, (list, tuple)):
                        return tuple(cell(i) for i in x)
                    return x

                neq = [i for i, (x, y) in enumerate(zip(avs, bvs))
                       if cell(x) != cell(y)]
                if neq:
                    i = neq[0]
                    problems.append(
                        f"col {col}: {len(neq)} mismatches "
                        f"(first at row {i}: {avs[i]!r} vs {bvs[i]!r})")
        except Exception as e:  # noqa
            problems.append(f"col {col}: compare error {e}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        lint_sql(name, sql)
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
            spark_df = spark_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            oracle_tbl = con.execute(sql).fetch_arrow_table()
            oracle_df = oracle_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        problems = type_problems(spark_tbl, oracle_tbl) \
            + compare(name, spark_df, oracle_df)
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_df)} rows):")
            for p in problems:
                print(f"   {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
