from oracle_to_cassandra_spark.sources.parquet import (  # noqa: F401
    DIM_TABLES,
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from oracle_to_cassandra_spark.sources.jdbc import read_jdbc_table  # noqa: F401
