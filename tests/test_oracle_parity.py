"""Replicates the driver's t2 correctness gate locally: every registry query's
Spark result must match its DuckDB oracle — same columns, same row count, same
values (order-insensitive, columns compared by sorted name).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark_cdc_engine.operators import REGISTRY
from tests.conftest import SF_DIR

ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(sp: pd.DataFrame, du: pd.DataFrame, name: str) -> None:
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch {sorted(sp.columns)} vs {sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count {len(sp)} vs {len(du)}"
    sp_n, du_n = normalize(sp), normalize(du)
    for c in sp_n.columns:
        a, b = sp_n[c].tolist(), du_n[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, rel=1e-12, abs=1e-12), (
                    f"{name}.{c}[{i}]: {x!r} != {y!r}"
                )
            else:
                assert str(x) == str(y), f"{name}.{c}[{i}]: {x!r} != {y!r}"


@pytest.mark.oracle
@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, ddb, name):
    q = REGISTRY[name]
    sp = q.spark(spark, SF_DIR).toPandas()
    du = ddb.sql(q.oracle).df()
    assert_frames_match(sp, du, name)


@pytest.mark.oracle
@pytest.mark.heavy
def test_all_queries_return_rows(spark):
    for name, q in REGISTRY.items():
        n = q.spark(spark, SF_DIR).count()
        assert n >= 0, name
