"""Profile the physical file layout each lakehouse write verb produces.

Runs a representative commit/merge/delete/update/replace_where sequence
against a tempdir (mirroring x151/x162/x200's shapes at the given SF) and
reports, per written directory: file count, total bytes, bytes/file —
the guide §6 "sensible output file sizing" evidence for the write paths.

Usage: python tools/profile_commit_files.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from deepcell_data_engineering_spark.catalog import load_table  # noqa: E402
from deepcell_data_engineering_spark.session import get_spark  # noqa: E402
from deepcell_data_engineering_spark.sources import snapshots as snap  # noqa: E402


def _dir_report(root: str) -> list[tuple[str, int, int]]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        parts = [f for f in filenames if f.endswith(".parquet")]
        if not parts:
            continue
        nbytes = sum(os.path.getsize(os.path.join(dirpath, f)) for f in parts)
        out.append((os.path.relpath(dirpath, root), len(parts), nbytes))
    return sorted(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-commit-files")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    t = tempfile.mkdtemp(prefix="dde_profile_files_")
    try:
        print("== commit(append) x2 (x162's setup) ==")
        snap.commit(spark, base.where(F.col("k") % 2 == 0), t)
        snap.commit(spark, base.where(F.col("k") % 2 == 1), t, mode="append")
        for rel, n, b in _dir_report(t):
            print(f"  {rel}: {n} files, {b} bytes, {b // max(n,1)} B/file")

        print("== delete_where (x162's step) ==")
        before = {r[0] for r in _dir_report(t)}
        snap.delete_where(spark, t, "k % 13 = 4")
        for rel, n, b in _dir_report(t):
            tag = " NEW" if rel not in before else ""
            print(f"  {rel}: {n} files, {b} bytes{tag}")

        print("== merge_upsert (x151's shape: 2% delta) ==")
        before = {r[0] for r in _dir_report(t)}
        delta = base.where(F.col("k") % 50 == 3).withColumn(
            "cents", F.col("cents") + 1
        )
        snap.merge_upsert(spark, delta, t, keys=["k"])
        for rel, n, b in _dir_report(t):
            tag = " NEW" if rel not in before else ""
            print(f"  {rel}: {n} files, {b} bytes{tag}")

        print("== update_where ==")
        before = {r[0] for r in _dir_report(t)}
        snap.update_where(
            spark, t, "k % 31 = 5", {"cents": F.col("cents") + 7}
        )
        for rel, n, b in _dir_report(t):
            tag = " NEW" if rel not in before else ""
            print(f"  {rel}: {n} files, {b} bytes{tag}")

        print("== replace_where ==")
        before = {r[0] for r in _dir_report(t)}
        repl = base.where(F.col("p") == "5-LOW").withColumn(
            "cents", F.col("cents") + 11
        )
        snap.replace_where(spark, repl, t, "p = '5-LOW'")
        for rel, n, b in _dir_report(t):
            tag = " NEW" if rel not in before else ""
            print(f"  {rel}: {n} files, {b} bytes{tag}")
    finally:
        shutil.rmtree(t, ignore_errors=True)


if __name__ == "__main__":
    main()
