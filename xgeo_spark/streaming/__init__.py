from xgeo_spark.streaming.pipeline import CDCIngestPipeline, IngestConfig  # noqa: F401
from xgeo_spark.streaming.lineage import LineageLog  # noqa: F401
from xgeo_spark.streaming.consumer import ChangeFeedConsumer  # noqa: F401
from xgeo_spark.streaming.router import MultiTableRouter  # noqa: F401
