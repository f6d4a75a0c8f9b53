"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a too-coarsely-partitioned input so CPU-heavy
    expression pipelines (md5 shingling, bit-voting, dot products) use
    every core.

    Fires only in local mode, where the driver test files are single
    row-group parquet (unsplittable → the whole pipeline would run on
    one core). On a real cluster a 100 TB scan already arrives in
    thousands of partitions, and master != local makes this a no-op —
    no gratuitous shuffle of the big table. (Deliberately NOT
    implemented via df.rdd.getNumPartitions(): materialising the RDD
    lineage defeats whole-stage codegen and costs more than it saves.)"""
    spark = df.sparkSession
    if not spark.sparkContext.master.startswith("local"):
        return df
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
