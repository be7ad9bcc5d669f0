"""Per-micro-batch schema evolution: diff -> widen/add -> align.

The reference's schema system is fully dynamic — every record is a
``map[string]interface{}`` and two consecutive records may disagree on
their property sets (/root/reference/io/interface.go:3-5, SURVEY.md §1.4).
A lake table cannot be schemaless, so the target re-expresses that
capability as controlled evolution: each micro-batch's schema is diffed
against the table schema; **additive** changes (new columns) and **widening
type promotions** are applied automatically before the merge; anything
lossy (dropped columns stay, narrowing is rejected) raises.

Works on Spark ``StructType``; ``pyarrow.Schema`` inputs are converted, so
the same diff drives both the Arrow-side batch inspection and the lake
table's DDL (Iceberg ``ALTER TABLE ADD COLUMN`` / ``ALTER COLUMN TYPE``
when the Iceberg sink is active, manifest-schema update for the parquet
fallback sink).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widening lattice: a type may be promoted to any type later in its chain
_WIDENING_CHAINS: list[list[T.DataType]] = [
    [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()],
    [T.FloatType(), T.DoubleType()],
    # session timezone is pinned UTC engine-wide, so NTZ -> TZ is lossless
    [T.DateType(), T.TimestampNTZType(), T.TimestampType()],
]


class SchemaEvolutionError(ValueError):
    pass


@dataclass
class SchemaDiff:
    added: list[T.StructField] = field(default_factory=list)
    widened: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)
    missing_in_batch: list[str] = field(default_factory=list)  # fine: filled w/ null
    incompatible: list[tuple[str, T.DataType, T.DataType]] = field(default_factory=list)

    @property
    def changes_table(self) -> bool:
        return bool(self.added or self.widened)


def _as_struct(schema) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    try:  # pyarrow.Schema
        import pyarrow as pa

        if isinstance(schema, pa.Schema):
            from pyspark.sql.pandas.types import from_arrow_type

            return T.StructType(
                [T.StructField(f.name, from_arrow_type(f.type), True) for f in schema]
            )
    except ImportError:
        pass
    raise TypeError(f"unsupported schema object: {type(schema)}")


def _widens_to(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    # an all-null (void) column carries no type information: it can be
    # poured into any column, and a void table column adopts the batch type
    if isinstance(src, T.NullType):
        return True
    for chain in _WIDENING_CHAINS:
        if src in chain and dst in chain:
            return chain.index(src) < chain.index(dst)
    return False


def diff_schemas(table_schema, batch_schema) -> SchemaDiff:
    """Diff batch vs table. Additions and widenings land in the diff;
    narrowing or type conflicts are recorded as incompatible (caller raises).
    """
    table, batch = _as_struct(table_schema), _as_struct(batch_schema)
    t_fields = {f.name: f for f in table.fields}
    b_fields = {f.name: f for f in batch.fields}
    d = SchemaDiff()
    for name, bf in b_fields.items():
        tf = t_fields.get(name)
        if tf is None:
            d.added.append(T.StructField(name, bf.dataType, True))
        elif tf.dataType == bf.dataType:
            continue
        elif _widens_to(tf.dataType, bf.dataType):
            d.widened.append((name, tf.dataType, bf.dataType))
        elif _widens_to(bf.dataType, tf.dataType):
            continue  # batch is narrower than table: upcast at align time
        else:
            d.incompatible.append((name, tf.dataType, bf.dataType))
    d.missing_in_batch = [n for n in t_fields if n not in b_fields]
    return d


def evolve_schema(table_schema, batch_schema) -> T.StructType:
    """Return the union (evolved) table schema; raise on incompatibility."""
    table = _as_struct(table_schema)
    d = diff_schemas(table, batch_schema)
    if d.incompatible:
        msg = ", ".join(f"{n}: {a.simpleString()} vs {b.simpleString()}"
                        for n, a, b in d.incompatible)
        raise SchemaEvolutionError(f"incompatible column types: {msg}")
    widened = dict((n, dst) for n, _, dst in d.widened)
    fields = [
        T.StructField(f.name, widened.get(f.name, f.dataType), True)
        for f in table.fields
    ]
    # an all-null NEW column carries no type info yet — defer adding it
    # until a typed value arrives
    fields.extend(f for f in d.added if not isinstance(f.dataType, T.NullType))
    return T.StructType(fields)


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto target schema: cast widenable columns, add missing
    columns as typed nulls, keep target column order. Extra df columns are
    an error (run evolve_schema first)."""
    have = {f.name: f for f in df.schema.fields}
    extra = [n for n in have if n not in {f.name for f in target.fields}]
    if extra:
        raise SchemaEvolutionError(f"batch columns not in target schema: {extra}")
    cols = []
    for f in target.fields:
        if f.name in have:
            src = have[f.name].dataType
            if src == f.dataType:
                cols.append(F.col(f.name))
            elif _widens_to(src, f.dataType):
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                raise SchemaEvolutionError(
                    f"cannot narrow {f.name}: {src.simpleString()} -> "
                    f"{f.dataType.simpleString()}"
                )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
