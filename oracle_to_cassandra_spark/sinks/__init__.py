from oracle_to_cassandra_spark.sinks.cassandra_style import (  # noqa: F401
    CaseMismatchError,
    read_partition,
    validate_sink_columns,
    write_query_table,
    write_to_cassandra,
)
