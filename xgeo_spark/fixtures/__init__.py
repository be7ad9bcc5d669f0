from xgeo_spark.fixtures.generator import (  # noqa: F401
    ChangeStreamConfig,
    generate_change_events,
    write_change_stream,
)
