"""Pre-flight for the driver contract: runs every ``queries()`` entry at
sf0.01 and compares against its ``oracle_sql()`` through DuckDB the same way
the driver does (row count + schema-aligned, order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            ts = pd.to_datetime(s)
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_localize(None)
            pdf[c] = ts.astype("datetime64[ns]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.round(9)
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("int64")
        elif s.dtype == object:
            pdf[c] = s.astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            both_nan = pd.isna(av) & pd.isna(bv)
            ok = both_nan | np.isclose(
                av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
            assert ok.all(), f"{name}.{c}: {av[~ok][:5]} != {bv[~ok][:5]}"
        else:
            eq = av == bv
            assert eq.all(), f"{name}.{c}: {av[~eq][:5]} != {bv[~eq][:5]}"


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


def test_oracle_coverage():
    missing = set(ORACLES) - set(ALL_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, duck, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(ORACLES[name]).fetchdf()
    compare(sdf, ddf, name)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    df.limit(5).collect()  # schema materializes without error


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert {"event_type", "bucket_start", "n_tok_sum", "gap_filled"} <= set(out.columns)
