"""Pluggable sources & sinks.

The reference reads via ``spark.read.jdbc`` and writes via batched JDBC
appends (`/root/reference/scripts/03_cdc_etl.py:281-282,309-319`). The
engine abstracts both behind one interface so correctness work runs on
parquet fixtures and production parity keeps a JDBC path.
"""

from oracle_to_oracle_data_integration_pipeline_spark.sources.parquet import ParquetSource, ParquetSink  # noqa: F401
from oracle_to_oracle_data_integration_pipeline_spark.sources.jdbc import JdbcSource, JdbcSink  # noqa: F401
