"""Source lifecycle: typed failures -> empty relation (R35, R21) and
schema-drift validation (R32 analog: fail fast on a bad source)."""

import os

import pytest

from tests.conftest import SF_DIR

from social_media_big_data_analyzer_spark import schemas
from social_media_big_data_analyzer_spark.sources.catalog import (
    load_table,
    load_table_or_empty,
)


def test_missing_source_degrades_to_empty_with_schema(spark, tmp_path):
    df = load_table_or_empty(spark, str(tmp_path / "nope"), "customer")
    assert df.isEmpty()
    assert [f.name for f in df.schema.fields] == [
        f.name for f in schemas.CUSTOMER.fields
    ]


def test_present_source_loads_normally(spark):
    df = load_table_or_empty(spark, SF_DIR, "region")
    assert df.count() == load_table(spark, SF_DIR, "region").count() > 0


def test_schema_drift_still_raises(spark, tmp_path):
    bad_dir = tmp_path / "bad"
    os.makedirs(bad_dir)
    spark.range(3).selectExpr("id AS wrong_col").write.parquet(
        str(bad_dir / "region.parquet")
    )
    with pytest.raises(ValueError, match="schema drift"):
        load_table_or_empty(spark, str(bad_dir), "region")
