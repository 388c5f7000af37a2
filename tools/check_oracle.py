"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, compare row count, schema and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(pd.util.hash_pandas_object(df[c], index=False)
                 .to_numpy().tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from lucene_spark.session import get_session
    spark = get_session(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                        app_name="check_oracle", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    json_out = os.environ.get("CHECK_ORACLE_JSON")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"spark: {e}"}
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            results[name] = {"spark_rows": len(sdf), "err": None,
                             "rows_only": True}
            continue
        try:
            odf = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": f"oracle: {e}"}
            continue
        ok_rows = len(sdf) == len(odf)
        ok_cols = list(sdf.columns) == list(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status}  {name}: spark={len(sdf)} oracle={len(odf)} "
              f"cols={'=' if ok_cols else f'{list(sdf.columns)}!={list(odf.columns)}'} "
              f"hash={'=' if ok_hash else '!'} [{time.time()-t0:.1f}s]")
        results[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(sdf),
                         "oracle_rows": len(odf), "err": None}
        if not (ok_rows and ok_cols and ok_hash):
            failures.append(name)
            if ok_cols and len(sdf) and len(odf):
                merged = sdf.merge(odf, how="outer", indicator=True,
                                   on=list(sdf.columns))
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(12).to_string())
    if json_out:
        import json
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} entries)")
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nall queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
