"""Unit tests for the Arrow/Spark schema diff (SURVEY.md §5.2 item 4)."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from xgeo_spark.plans.schema_evolution import (
    SchemaEvolutionError,
    diff_schemas,
    evolve_schema,
)


def S(*fields):
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


def test_add_column():
    table = S(("a", T.StringType()), ("b", T.IntegerType()))
    batch = S(("a", T.StringType()), ("b", T.IntegerType()), ("c", T.DoubleType()))
    d = diff_schemas(table, batch)
    assert [f.name for f in d.added] == ["c"]
    assert not d.widened and not d.incompatible
    out = evolve_schema(table, batch)
    assert [f.name for f in out.fields] == ["a", "b", "c"]


def test_widen_int32_to_int64():
    table = S(("k", T.IntegerType()))
    batch = S(("k", T.LongType()))
    d = diff_schemas(table, batch)
    assert d.widened == [("k", T.IntegerType(), T.LongType())]
    assert evolve_schema(table, batch)["k"].dataType == T.LongType()


def test_narrower_batch_is_fine_but_table_keeps_wide():
    table = S(("k", T.LongType()))
    batch = S(("k", T.IntegerType()))
    d = diff_schemas(table, batch)
    assert not d.widened and not d.incompatible
    assert evolve_schema(table, batch)["k"].dataType == T.LongType()


def test_incompatible_rejected():
    table = S(("k", T.StringType()))
    batch = S(("k", T.LongType()))
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(table, batch)


def test_missing_column_in_batch_ok():
    table = S(("a", T.StringType()), ("b", T.IntegerType()))
    batch = S(("a", T.StringType()))
    d = diff_schemas(table, batch)
    assert d.missing_in_batch == ["b"]
    assert not d.changes_table


def test_arrow_schema_input():
    table = S(("a", T.StringType()))
    batch = pa.schema([("a", pa.string()), ("n", pa.int64())])
    out = evolve_schema(table, batch)
    assert out["n"].dataType == T.LongType()


def test_float_widening_and_date_to_timestamp():
    table = S(("f", T.FloatType()), ("d", T.DateType()))
    batch = S(("f", T.DoubleType()), ("d", T.TimestampType()))
    out = evolve_schema(table, batch)
    assert out["f"].dataType == T.DoubleType()
    assert out["d"].dataType == T.TimestampType()
