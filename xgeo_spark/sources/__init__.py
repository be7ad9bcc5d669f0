from xgeo_spark.sources.change_feed import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    ChangeFeedSource,
)
