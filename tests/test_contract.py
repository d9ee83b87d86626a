"""Local replica of the driver's correctness gate: every contract query with
an oracle is executed in Spark AND DuckDB at sf0.001 and compared on
row count + column names + order-insensitive values."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        if hasattr(v, "item"):  # numpy scalars
            return norm(v.item())
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())


def test_every_query_has_callable():
    qs = entry_mod.queries()
    for name in ORACLE_NAMES:
        assert name in qs, f"oracle without query: {name}"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, duck, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: rows {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(ORACLE_NAMES)):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"c", "n"}
