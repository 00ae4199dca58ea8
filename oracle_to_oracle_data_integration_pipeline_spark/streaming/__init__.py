from oracle_to_oracle_data_integration_pipeline_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from oracle_to_oracle_data_integration_pipeline_spark.streaming.cdc_stream import run_cdc_stream  # noqa: F401
