"""Engine operators — DataFrame-composition library.

Everything here is plain DataFrame algebra (no custom Catalyst rules):
Catalyst/AQE remain free to pick physical strategies (broadcast vs
sort-merge, skew splitting, partition coalescing) for every operator.
"""

from oracle_to_oracle_data_integration_pipeline_spark.operators.cdc import (  # noqa: F401
    change_ts_col,
    delta_predicate,
    latest_per_key,
    merge_soft_delete,
    MergeResult,
)
from oracle_to_oracle_data_integration_pipeline_spark.operators.watermark import WatermarkStore  # noqa: F401
