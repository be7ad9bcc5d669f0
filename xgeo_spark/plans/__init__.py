from xgeo_spark.plans.schema_evolution import (  # noqa: F401
    SchemaDiff,
    SchemaEvolutionError,
    align_to_schema,
    diff_schemas,
    evolve_schema,
)
