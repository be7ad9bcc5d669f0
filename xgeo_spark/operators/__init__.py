from xgeo_spark.operators.dedup import (  # noqa: F401
    lww_dedup,
    lww_dedup_agg,
    lww_dedup_window,
)
from xgeo_spark.operators.components import (  # noqa: F401
    connected_components,
    dup_clusters,
)
from xgeo_spark.operators.patch import resolve_patches  # noqa: F401
