from __future__ import annotations

from conftest import SMOKE_SF_DIR

from trino_adaptive_partitioning_tool_spark.operators import compaction
from trino_adaptive_partitioning_tool_spark.sources import tables


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    orders = tables.load_table(spark, SMOKE_SF_DIR, "orders")
    fragmented = str(tmp_path / "fragmented")
    orders.repartition(50).write.parquet(fragmented)
    assert compaction.dataset_file_stats(fragmented)["n_files"] == 50

    dest = str(tmp_path / "compacted")
    stats = compaction.compact_parquet(spark, fragmented, dest)
    assert stats["before_files"] == 50
    assert stats["after_files"] < 5
    assert spark.read.parquet(dest).count() == orders.count()


def test_partition_aware_compaction(spark, tmp_path):
    orders = tables.load_table(spark, SMOKE_SF_DIR, "orders")
    fragmented = str(tmp_path / "frag_part")
    (
        orders.withColumn("status", orders.o_orderstatus)
        .repartition(20)
        .write.partitionBy("status")
        .parquet(fragmented)
    )
    before = compaction.dataset_file_stats(fragmented)["n_files"]
    dest = str(tmp_path / "compact_part")
    stats = compaction.compact_parquet(
        spark, fragmented, dest, partition_cols=["status"]
    )
    assert stats["after_files"] < before
    out = spark.read.parquet(dest)
    assert out.count() == orders.count()
    # layout preserved: one dir per status value
    assert set(tables.partition_layout(dest)) == {"status"}
