from oracle_to_cassandra_spark.sinks.cassandra_style import (  # noqa: F401
    CONNECTOR_FORMAT,
    CONNECTOR_PACKAGE,
    CONNECTOR_PROBE_CLASS,
    CaseMismatchError,
    connector_available,
    connector_write_spec,
    read_partition,
    validate_sink_columns,
    write_query_table,
    write_to_cassandra,
)
