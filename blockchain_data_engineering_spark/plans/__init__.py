"""Query registry backing ``__spark_entry__.py``.

Importing this package registers every implemented query. Each query is
a (spark, sf_dir) → DataFrame callable paired (where SQL-expressible)
with a DuckDB oracle SQL string over the same parquet tables.
"""

from blockchain_data_engineering_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)

# Import for side effect: populates the registry.
from blockchain_data_engineering_spark.plans import core_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import domain_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import analytics_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import graph_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import text_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import dedup_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import similarity_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import streaming_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import multimodal_queries  # noqa: F401,E402
