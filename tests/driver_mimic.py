"""Quick per-query oracle compare for iterating on new queries.

Usage: python tests/driver_mimic.py <query> [query ...]
Runs each Spark query and its DuckDB oracle at sf0.01, compares
row count / schema / sorted-value hash, prints one line per query.

CAVEAT: this compare coerces through pandas (Decimal becomes float64),
so it can false-pass type mismatches the real harness normalizer
catches — /tmp/drive_driver.py (see .claude/skills/verify/SKILL.md) is
the authoritative check.
"""
import hashlib
import json
import sys
import time

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]



def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str).tolist()
        else:
            vals = [repr(v) for v in s.tolist()]
        h.update(("\x00".join(vals)).encode())
    return h.hexdigest()


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: driver_mimic.py <query> [query ...]")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("driver-mimic")
        .getOrCreate()
    )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    out = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            spark_err = None
        except Exception as e:  # noqa: BLE001
            sdf, spark_err = None, f"{type(e).__name__}: {e}"
        t1 = time.time()
        odf, oracle_err = None, None
        if name in oracles:
            try:
                odf = con.execute(oracles[name]).df()
            except Exception as e:  # noqa: BLE001
                oracle_err = f"{type(e).__name__}: {e}"
        rec = {
            "spark_s": round(t1 - t0, 2),
            "spark_err": spark_err,
            "oracle_err": oracle_err,
        }
        if sdf is not None:
            rec["spark_rows"] = len(sdf)
            rec["spark_schema"] = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
        if odf is not None:
            rec["oracle_rows"] = len(odf)
            rec["oracle_schema"] = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
        if sdf is not None and odf is not None:
            ns, no = norm(sdf), norm(odf)
            rec["rows_match"] = len(ns) == len(no)
            rec["cols_match"] = list(ns.columns) == list(no.columns)
            rec["hash_match"] = (
                rec["rows_match"]
                and rec["cols_match"]
                and value_hash(ns) == value_hash(no)
            )
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
