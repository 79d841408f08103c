"""bifrost_spark — a PySpark-native analytics engine with the capability
surface of uswitch/bifrost (Kafka→cloud archival) plus a batch-relational
query layer and LLM-data-pipeline operators, designed for 100 TB scale.

Reference (read-only, studied for semantics only): /root/reference
(uswitch/bifrost, Clojure).  Architecture here is Spark-first: DataFrame /
Spark SQL / Catalyst for every relational operator, Structured Streaming for
the archival pipeline, Pandas UDFs only where built-ins cannot express the
semantics (MinHash banding, embedding top-k at scale).
"""

__version__ = "0.1.0"

from bifrost_spark.session import get_spark, tune_for_oracle  # noqa: F401
from bifrost_spark.tables import load_table, TABLES  # noqa: F401
