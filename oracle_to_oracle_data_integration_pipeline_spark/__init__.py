"""PySpark-native analytics & CDC replication engine.

A brand-new engine with the query and data-processing capabilities of the
reference Oracle-to-Oracle CDC integration pipeline
(`/root/reference/scripts/03_cdc_etl.py` et al.), re-expressed Spark-first:

- the relational work the reference pushes to Oracle as SQL strings
  (MERGE with soft-delete semantics, CTAS clones, counts) is DataFrame
  algebra here, so it runs against any Spark-readable source;
- the control plane the reference runs driver-side against Oracle
  dictionary views (catalog discovery, PK/FK metadata, topo ordering,
  watermark state) is a typed registry with parquet-backed state;
- beyond parity, the engine ships the relational operator breadth and the
  large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) a 100 TB pipeline needs.

Designed for a real multi-executor cluster (partition-aware joins,
broadcast of dims, AQE, pushdown-friendly predicates) even though tests
run on local[N].
"""

__version__ = "0.1.0"

from oracle_to_oracle_data_integration_pipeline_spark.session import get_spark  # noqa: F401
from oracle_to_oracle_data_integration_pipeline_spark.catalog import Catalog, TableMeta  # noqa: F401
