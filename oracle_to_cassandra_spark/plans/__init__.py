from oracle_to_cassandra_spark.plans.explain import (  # noqa: F401
    cartesian_attach_violations,
    exchange_count,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
