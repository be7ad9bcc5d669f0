from xgeo_spark.sinks.base import LakeTable, MergeStats  # noqa: F401
from xgeo_spark.sinks.parquet_lake import ParquetLakeTable  # noqa: F401
from xgeo_spark.sinks.iceberg_lake import IcebergLakeTable, iceberg_available  # noqa: F401


def open_lake_table(spark, location: str, **kwargs) -> LakeTable:
    """Open the best available lake-table implementation.

    Mirrors the reference's single-dispatch source selection
    (/root/reference/cmd/xgeo/main.go:25-40) on the sink side: real Iceberg
    when its runtime jars are on the classpath, else the built-in
    parquet+manifest table with the same MERGE/commit semantics.
    """
    if iceberg_available(spark):
        return IcebergLakeTable(spark, location, **kwargs)
    return ParquetLakeTable(spark, location, **kwargs)
