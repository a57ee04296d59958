"""Driver-simulation at sf0.01 (the driver's gate SF): every queries()
entry vs oracle_sql() via DuckDB — row count, columns, order-insensitive
multiset equality. Plus engine-API probes from the verify recipe."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if name not in sqls:
            print(f"{name}: NO-ORACLE", flush=True)
            continue
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        res = con.execute(sqls[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()

        def canon(rows, cols):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            return sorted(tuple(r[i] for i in order) for r in rows)

        ok = (
            sorted(scols) == sorted(dcols)
            and len(srows) == len(drows)
            and canon(srows, scols) == canon(drows, dcols)
        )
        if not ok:
            n_fail += 1
        print(
            f"{name}: {'ok' if ok else 'FAIL'} rows={len(srows)}/{len(drows)}"
            f" {time.time() - t0:.1f}s",
            flush=True,
        )
    # engine-API probes (verify recipe)
    df = entry.entry(spark)
    rows = df.collect()
    assert df.columns == ["doc_id", "score_e6", "n_common"]
    print(f"entry smoke: ok ({len(rows)} rows)", flush=True)
    print("FAILURES:", n_fail, flush=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
