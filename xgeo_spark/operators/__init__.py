from xgeo_spark.operators.dedup import (  # noqa: F401
    lww_dedup,
    lww_dedup_agg,
    lww_dedup_window,
)
