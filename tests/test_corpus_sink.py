"""Partitioned corpus layout: write, account (layout_report), compact.

The table-maintenance leg of the sink family: small-file accounting from
the scan's _metadata columns and plan-driven compaction to target file
sizes, with content equality pinned across the rewrite."""

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.catalog import load_table
from deepcell_data_engineering_spark.sources.corpus import (
    compact_corpus,
    layout_report,
    write_corpus_partitioned,
)

from conftest import SF_SMOKE


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_layout_report_counts_files_and_rows(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark)
    write_corpus_partitioned(docs.repartition(8), path)
    rep = {
        r["lang"]: r
        for r in layout_report(spark, path, ("lang",)).collect()
    }
    truth = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(rep) == set(truth)
    for lang, r in rep.items():
        assert r["n_rows"] == truth[lang]
        # 8 input tasks -> up to 8 files per partition dir, all tiny
        assert 1 <= r["n_files"] <= 8
        assert r["n_small_files"] == r["n_files"]
        assert r["total_bytes"] > 0


def test_compact_merges_small_files_preserving_content(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    docs = _docs(spark)
    write_corpus_partitioned(docs.repartition(16), src)
    before = layout_report(spark, src, ("lang",)).collect()
    assert all(r["n_files"] > 1 for r in before)
    plan = compact_corpus(
        spark, src, dst, ("lang",), target_file_bytes=1 << 30
    )
    # a 1 GiB target collapses every partition to its planned 1 file
    assert all(r["n_files"] == 1 for r in plan.collect())
    after = layout_report(spark, dst, ("lang",)).collect()
    assert all(r["n_files"] == 1 for r in after)
    a = sorted(
        tuple(r) for r in spark.read.parquet(src).select(
            "doc_id", "text", "lang", "source", "n_chars").collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(dst).select(
            "doc_id", "text", "lang", "source", "n_chars").collect()
    )
    assert a == b


def test_compact_plans_multiple_files_for_big_partitions(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = _docs(spark)
    write_corpus_partitioned(docs.repartition(4), src)
    # a tiny target forces several files per partition; the rewrite may
    # only MERGE planned slots (collisions), never fragment beyond plan
    plan = {
        r["lang"]: r["n_files"]
        for r in compact_corpus(
            spark, src, dst, ("lang",), target_file_bytes=4 << 10
        ).collect()
    }
    assert any(n > 1 for n in plan.values())
    got = {
        r["lang"]: r["n_files"]
        for r in layout_report(spark, dst, ("lang",)).collect()
    }
    for lang, n in got.items():
        assert 1 <= n <= plan[lang]


def test_compact_preserves_null_partition_rows(spark, tmp_path):
    """NULL partition values round-trip the hive layout as
    __HIVE_DEFAULT_PARTITION__ -> NULL; the compaction's plan attach is
    null-safe, so those rows must survive the rewrite."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = _docs(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("lang"))
    )
    write_corpus_partitioned(docs.repartition(4), src)
    compact_corpus(spark, src, dst, ("lang",), target_file_bytes=1 << 30)
    back = spark.read.parquet(dst)
    assert back.count() == docs.count()
    assert (
        back.where(F.col("lang").isNull()).count()
        == docs.where(F.col("lang").isNull()).count()
    )
