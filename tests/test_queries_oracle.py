"""Local mirror of the driver's correctness gate: every catalog query is
run through Spark AND its DuckDB oracle SQL at sf0.001, then compared
column-name-sorted, row-sorted, value-for-value (driver semantics:
row-count + schema + order-insensitive value hash)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdf_extractor_spark.queries import CATALOG

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(name, spark, duck):
    spec = CATALOG[name]
    got = spec.fn(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(got) > 0, f"{name}: oracle-less query returned no rows"
        return
    want = duck.sql(spec.oracle).df()
    gn, wn = _norm(got), _norm(want)
    assert list(gn.columns) == list(wn.columns), f"{name}: column mismatch"
    assert len(gn) == len(wn), f"{name}: row count {len(gn)} != {len(wn)}"
    pd.testing.assert_frame_equal(
        gn, wn, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
