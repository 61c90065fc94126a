"""Local replica of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare against ``oracle_sql()`` via
DuckDB — row count, column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

# the SAME canonicalization the full-suite artifact CLI applies — one
# implementation, so the test gate and CORRECTNESS_FULL.json can never
# silently diverge on tolerance/typing rules
from jobs.correctness import TABLES, _canon  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _assert_equal(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert list(got.columns) != [], name
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]):
            assert np.allclose(g[c].fillna(math.nan), w[c].fillna(math.nan),
                               atol=1e-9, equal_nan=True), f"{name}.{c}"
        else:
            assert (g[c].fillna("∅").astype(str) == w[c].fillna("∅").astype(str)).all(), (
                f"{name}.{c}: first diff\n"
                + str(pd.concat([g[c], w[c]], axis=1)[g[c].astype(str) != w[c].astype(str)].head())
            )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.sql(ORACLES[name]).df()
    _assert_equal(got, want, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "domain" in df.columns


def test_every_query_has_an_oracle():
    """The round-3 invariant the verify recipe references: zero
    rows-only queries — queries() and oracle_sql() carry identical key
    sets, so every registered operator is value-checked against an
    independent engine."""
    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES)
    )
