"""Z-order layout mechanics (operators/zorder.py).

The bit-exact z assignment is oracle-checked by ``zorder_layout_stats``;
this pins the layout claim: compacting with ``sort_cols=[zv]`` yields
files whose per-file (user, hour) bounding boxes cover a small fraction
of the full plane — BOTH dimensions' zone maps stay selective — whereas
a single-key sort leaves the second dimension's span at ~full width per
file.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oracle_vector_search_spark.io import load_table
from oracle_vector_search_spark.operators import compaction
from oracle_vector_search_spark.operators.zorder import z_value


def _dims(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").bitwiseAND(F.lit(65535)).alias("ux"),
        F.greatest(
            F.expr("ts_ns div 1000 div 3600000000") - F.lit(473352),
            F.lit(0),
        )
        .bitwiseAND(F.lit(65535))
        .alias("tx"),
    ).withColumn("zv", z_value(F.col("ux"), F.col("tx")))


def _file_boxes(spark, path):
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("ux").alias("ux_lo"),
            F.max("ux").alias("ux_hi"),
            F.min("tx").alias("tx_lo"),
            F.max("tx").alias("tx_hi"),
        )
        .collect()
    )


def test_zorder_files_bound_both_dimensions(spark, sf_dir, tmp_path):
    d = _dims(spark, sf_dir)
    frag = str(tmp_path / "frag")
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    d.repartition(16).write.parquet(frag)
    target = max(1, compaction.parquet_bytes(frag) // 8)
    compaction.compact_parquet(spark, frag, zpath, target, ["zv"])
    compaction.compact_parquet(spark, frag, xpath, target, ["ux"])

    full = d.agg(
        (F.max("ux") - F.min("ux")).alias("uxs"),
        (F.max("tx") - F.min("tx")).alias("txs"),
    ).collect()[0]
    full_area = float((full["uxs"] + 1) * (full["txs"] + 1))

    def mean_area(boxes):
        return sum(
            float(
                (b["ux_hi"] - b["ux_lo"] + 1) * (b["tx_hi"] - b["tx_lo"] + 1)
            )
            for b in boxes
        ) / len(boxes)

    zboxes = _file_boxes(spark, zpath)
    xboxes = _file_boxes(spark, xpath)
    assert len(zboxes) > 2 and len(xboxes) > 2

    # z-ordered files cover a small fraction of the plane
    assert mean_area(zboxes) < 0.5 * full_area
    # the discriminating claim: under a single-key (ux) sort the OTHER
    # dimension's per-file span stays near the full width — useless
    # zone maps for tx — while z-order bounds it
    full_tx = float(full["txs"])
    z_tx = sum(b["tx_hi"] - b["tx_lo"] for b in zboxes) / len(zboxes)
    x_tx = sum(b["tx_hi"] - b["tx_lo"] for b in xboxes) / len(xboxes)
    assert x_tx > 0.8 * full_tx
    assert z_tx < 0.5 * x_tx
