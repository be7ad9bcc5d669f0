"""Property test: the engine's expression-based patch fold
(operators/patch.py, table-less single-batch mode) must agree with the
sequential pandas fold oracle on ARBITRARY op sequences — including no-op
patches (every column null), patch-before-insert, delete-then-patch
chains, and full images that legitimately set columns back to null.

Hypothesis drives small sequences through real Spark jobs, so examples are
capped low; the generator-based tests (test_patch.py) cover volume and
cross-batch interaction."""

import pandas as pd
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xgeo_spark.fixtures.generator import fold_oracle
from xgeo_spark.operators.patch import resolve_patches

KEYS = [("c0", 0), ("c0", 1), ("c1", 0)]
TEXTS = [None, "a", "b"]
TOOLS = [None, "search", "code"]

event_st = st.fixed_dictionaries(
    {
        "key": st.sampled_from(range(len(KEYS))),
        "op": st.sampled_from(["I", "U", "P", "D"]),
        "text": st.sampled_from(TEXTS),
        "tool": st.sampled_from(TOOLS),
        "role": st.sampled_from([None, "user", "assistant"]),
    }
)


def _events_frame(raw: list[dict]) -> pd.DataFrame:
    rows = []
    for i, e in enumerate(raw):
        conv, turn = KEYS[e["key"]]
        full = e["op"] in ("I", "U")
        rows.append(
            {
                "lsn": i,
                "offset": i,
                "op": e["op"],
                "conv_id": conv,
                "turn_idx": turn,
                "role": e["role"],
                "text": e["text"],
                "tool": e["tool"],
                # deletes carry no payload on the wire; ts set on full
                # images only, so patches also exercise "ts unchanged"
                "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=i)
                if full
                else None,
                "schema_version": 1,
                "tool_meta": None,
            }
        )
        if e["op"] == "D":
            r = rows[-1]
            r["role"] = r["text"] = r["tool"] = None
    return pd.DataFrame(rows)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(raw=st.lists(event_st, min_size=1, max_size=12))
def test_fold_matches_oracle_on_arbitrary_sequences(spark, raw):
    spark_session = spark  # session-scoped fixture, safe under @given
    events = _events_frame(raw)
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("schema_version", T.IntegerType()),
            T.StructField("tool_meta", T.StringType()),
        ]
    )
    batch = spark_session.createDataFrame(
        events.astype(object).where(pd.notna(events), None), schema
    )
    resolved = resolve_patches(batch, None, ["conv_id", "turn_idx"])
    final = (
        resolved.groupBy("conv_id", "turn_idx")
        .agg(
            F.max_by(
                F.struct("op", "role", "text", "tool"), F.col("lsn")
            ).alias("_w")
        )
        .filter(F.col("_w.op") != "D")
        .select(
            "conv_id",
            "turn_idx",
            F.col("_w.role").alias("role"),
            F.col("_w.text").alias("text"),
            F.col("_w.tool").alias("tool"),
        )
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    expected = fold_oracle(events)[
        ["conv_id", "turn_idx", "role", "text", "tool"]
    ].reset_index(drop=True)
    got = final.reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype(np.int64)
    assert got.fillna("∅").to_dict("records") == expected.fillna(
        "∅"
    ).to_dict("records"), f"\nevents:\n{events}\ngot:\n{got}\nexp:\n{expected}"
