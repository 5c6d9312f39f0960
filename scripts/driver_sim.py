"""Local simulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row counts + order-insensitive values.  Usage:
    python scripts/driver_sim.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from rs_trafilatura_spark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm(v):
    # Deliberately strict about numeric dtype: a DuckDB HUGEINT aggregate
    # lands in pandas as float64 and must NOT hash-equal an integer-typed
    # Spark column (the real driver distinguishes 3968.0 from 3968 —
    # write_shards went red on exactly this in r5).  Floats keep a ".0"
    # marker; ints stringify plainly.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 2**53:
            return f"{v:.1f}"
        return f"{v:.9g}"
    return str(v)


def main(sf_dir: str, only: tuple[str, ...] = ()) -> int:
    spark = get_spark(parallelism=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        except duckdb.Error:
            pass

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spdf)} rows (rows-only check)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            failures += 1
            continue
        if len(spdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(spdf)} duckdb={len(odf)}")
            failures += 1
            continue
        scols = sorted(spdf.columns)
        ocols = sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            failures += 1
            continue
        svals = sorted(
            tuple(norm(v) for v in row)
            for row in spdf[scols].itertuples(index=False, name=None)
        )
        ovals = sorted(
            tuple(norm(v) for v in row)
            for row in odf[ocols].itertuples(index=False, name=None)
        )
        if svals != ovals:
            bad = next(
                (i for i, (a, b) in enumerate(zip(svals, ovals)) if a != b), -1
            )
            print(f"FAIL  {name}: value mismatch at sorted row {bad}")
            print("  spark :", svals[bad] if bad >= 0 else "-")
            print("  duckdb:", ovals[bad] if bad >= 0 else "-")
            failures += 1
        else:
            print(f"OK    {name}: {len(spdf)} rows match")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(min(main(sf, tuple(sys.argv[2:])), 1))
