"""Salted two-phase top-k must equal the direct window byte-for-byte,
including on pathologically skewed groups (the case it exists for)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xgeo_spark.operators.topk import direct_topk, salted_topk


@pytest.fixture(scope="module")
def skewed_df(spark):
    rng = np.random.default_rng(5)
    n = 20_000
    # Zipf-ish: one mega group holds ~half the rows
    groups = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 200, size=n))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "g": groups.astype(np.int64),
                "score": rng.random(n),
                "row_id": np.arange(n, dtype=np.int64),  # unique tie-break
            }
        )
    )


@pytest.mark.parametrize("k", [1, 3, 10])
def test_salted_equals_direct(skewed_df, k):
    order = [F.col("score").desc(), F.col("row_id")]
    a = (
        direct_topk(skewed_df, ["g"], order, k)
        .orderBy("g", "rn")
        .collect()
    )
    b = (
        salted_topk(skewed_df, ["g"], order, k, n_salts=8, salt_src="row_id")
        .orderBy("g", "rn")
        .collect()
    )
    assert a == b
    # every group with >= k rows produced exactly k
    import collections

    per_group = collections.Counter(r["g"] for r in a)
    assert per_group[0] == k  # the mega group


def test_salted_default_salt_source(skewed_df):
    order = [F.col("score").desc(), F.col("row_id")]
    a = direct_topk(skewed_df, ["g"], order, 2).orderBy("g", "rn").collect()
    b = salted_topk(skewed_df, ["g"], order, 2).orderBy("g", "rn").collect()
    assert a == b
