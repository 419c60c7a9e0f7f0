"""oracle_to_cassandra_spark — a PySpark-native analytics engine.

Rebuilds the query and data-processing surface of the reference
pipeline (simonambridge/Oracle_to_Cassandra, surveyed in SURVEY.md):
relational source → DataFrame transform (project / rename / filter /
join / denormalize) → partition-oriented query-first sink — plus the
north-star extensions a large-scale training-data pipeline needs
(dedup, similarity search, multimodal columns, text analysis,
event-time windowing).

Design stance (100 TB posture):
  * DataFrame/SQL only — every operator is a declarative logical plan
    handed to Catalyst; no RDDs, no driver-side row loops.
  * Dimension tables are broadcast; fact-fact joins shuffle on their
    keys with AQE (skew-join + partition coalescing) left on.
  * Python touches data only through Arrow-vectorized pandas UDFs,
    and only where built-in functions cannot express the semantics.
  * Sinks are partitioned + sorted (the Cassandra partition-key /
    clustering-column model re-expressed as parquet layout).
"""

__version__ = "0.1.0"

from oracle_to_cassandra_spark.session import get_spark  # noqa: F401
