"""Driver-style full catalog sweep: run EVERY queries() entry through
Spark and its DuckDB oracle at the given sf dir (default sf0.01) and
compare rows + schema + values exactly (column-name-sorted, row-sorted)
— the same comparison the driver's CORRECTNESS gate performs, runnable
locally between rounds.

    python scripts/full_sweep.py [sf_dir] [only_prefix ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

import duckdb
import pandas as pd

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    names = [
        n for n in sorted(qs)
        if not only or any(n.startswith(p) for p in only)
    ]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got = _norm(qs[name](spark, sf_dir).toPandas())
            want = _norm(con.sql(oracles[name]).df())
            assert list(got.columns) == list(want.columns), "schema"
            assert len(got) == len(want), f"rows {len(got)}!={len(want)}"
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False,
                rtol=0, atol=1e-9,
            )
            status = f"OK    rows={len(got)}"
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            status = f"FAIL  {type(exc).__name__}: {str(exc)[:120]}"
        print(f"{name:35s} {status}  ({time.time() - t0:.1f}s)", flush=True)
    print(
        f"\n{len(names) - len(failures)}/{len(names)} green"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
