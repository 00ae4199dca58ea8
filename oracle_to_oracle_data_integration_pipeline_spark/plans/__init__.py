from oracle_to_oracle_data_integration_pipeline_spark.plans.topo import topo_sort_tables  # noqa: F401
