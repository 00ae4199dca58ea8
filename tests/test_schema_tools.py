"""Schema clone + CDC column evolution
(`/root/reference/scripts/01_prepare_cdc_columns:20-38`,
`/root/reference/scripts/02_clone_schema_structure.py`)."""

import datetime

import pytest
from pyspark.sql import functions as F

from oracle_to_oracle_data_integration_pipeline_spark.plans.schema_tools import (
    add_missing_cdc_columns,
    empty_clone,
    has_cdc_columns,
    schema_ddl,
    validate_cdc_columns,
)


@pytest.fixture()
def bare(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")


def test_empty_clone_schema_only(bare):
    c = empty_clone(bare)
    assert c.count() == 0
    assert c.schema == bare.schema


def test_add_missing_cdc_columns(bare):
    ts = datetime.datetime(2024, 1, 1)
    out = add_missing_cdc_columns(bare, created_default=F.lit(ts))
    assert has_cdc_columns(out)
    rows = out.collect()
    assert all(r["created_at"] == ts and r["updated_at"] is None and r["is_deleted"] == "N" for r in rows)


def test_add_missing_is_idempotent(bare):
    once = add_missing_cdc_columns(bare, created_default=F.lit(datetime.datetime(2024, 1, 1)))
    twice = add_missing_cdc_columns(once)
    assert twice.columns == once.columns  # no duplicates, nothing re-added


def test_validate_raises_on_missing(bare):
    with pytest.raises(ValueError, match="missing CDC columns"):
        validate_cdc_columns(bare, "bare")


def test_schema_ddl(bare):
    assert schema_ddl(bare, "bare") == "CREATE TABLE bare (id BIGINT, val STRING)"
