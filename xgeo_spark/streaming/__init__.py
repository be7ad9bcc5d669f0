from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig  # noqa: F401
from xgeo_spark.streaming.lineage import LineageLog  # noqa: F401
