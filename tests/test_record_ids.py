"""with_record_id + prefix-offset guardrails (S1 id assignment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.functions.maps import prefix_offset_expr
from entity_resolution_spark.sources.tables import with_record_id


def test_record_ids_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [(x,) for x in [30, 10, 20, 50, 40]], ["val"]
    ).repartition(4)
    out = with_record_id(df, order_col="val")
    rows = {r["val"]: r["record_id"] for r in out.collect()}
    assert sorted(rows.values()) == [0, 1, 2, 3, 4]
    assert rows[10] == 0 and rows[50] == 4  # ids follow the ordering basis


def test_record_ids_dense_without_order_col(spark):
    df = spark.range(0, 97).repartition(5).select(F.col("id").alias("val"))
    out = with_record_id(df)
    ids = [r["record_id"] for r in out.collect()]
    assert sorted(ids) == list(range(97))


def test_record_ids_refuse_many_partitions(spark):
    df = spark.range(0, 5000, 1, numPartitions=4200)
    with pytest.raises(ValueError, match="xxhash64"):
        with_record_id(df)


def test_prefix_offset_expr_rejects_null_keys():
    with pytest.raises(ValueError, match="None key"):
        prefix_offset_expr({None: 3, 0: 2}, F.col("k"))
