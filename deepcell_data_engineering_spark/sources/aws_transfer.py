"""S3 data-plane transfers (SURVEY §2.1 S18–S20), boto3-backed.

Semantics source: caliban_toolbox/aws_functions.py —
``connect_aws`` (:54-63, client from ambient credentials),
``aws_upload_files`` (:66-82, upload with public-read ACL),
``aws_copy_files`` (:85-103, stage-to-stage copy within the bucket),
``aws_download_files`` (:106-144, download with missing-file tracking).

The reference loops on the driver; here the per-file data plane runs on
EXECUTORS (``foreachPartition`` / ``mapPartitions``) with one boto3
client per partition — at 100 TB the transfer bandwidth is the cluster's
aggregate NIC, not one machine's. Clients are created inside the
partition via an injected ``client_factory`` because boto3 clients are
not picklable; the default factory reads ambient credentials exactly
like the reference's ``connect_aws``.

Testing posture: the per-partition bodies are pure functions taking the
client as an argument, validated against the REAL botocore S3 service
model with ``botocore.stub.Stubber`` (parameter shapes, error paths);
the Spark wiring is exercised end-to-end with a filesystem-backed fake
client. No live bucket is touched in either case.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


def connect_aws(region: str | None = None):
    """boto3 S3 client from ambient credentials (aws_functions.py:54-63).
    Import is deferred so the module loads where boto3 is absent."""
    import boto3

    return boto3.client("s3", region_name=region)


def _upload_rows(
    rows: Iterable, client: Any, bucket: str, acl: str | None
) -> list[dict]:
    """Upload each (local_path, key) row via put_object; returns one
    status dict per file. Pure w.r.t. the client — Stubber-testable."""
    out = []
    for r in rows:
        local_path, key = r["local_path"], r["key"]
        kwargs = {"Bucket": bucket, "Key": key}
        if acl:
            kwargs["ACL"] = acl
        with open(local_path, "rb") as fh:
            client.put_object(Body=fh.read(), **kwargs)
        out.append({"key": key, "n_bytes": os.path.getsize(local_path)})
    return out


def _download_rows(
    rows: Iterable, client: Any, bucket: str, out_dir: str
) -> list[dict]:
    """Download each key; a missing object is REPORTED, not fatal —
    the reference tolerates unannotated files the same way
    (aws_functions.py:125-139). The key's full path is preserved under
    ``out_dir`` (stage1/img.tif and stage2/img.tif must not clobber
    each other — basename-only layout also races across partitions)."""
    out = []
    for r in rows:
        key = r["key"]
        rel = key.lstrip("/")
        if os.path.isabs(rel) or ".." in rel.split("/"):
            raise ValueError(f"refusing non-relative S3 key path: {key!r}")
        local = os.path.join(out_dir, *rel.split("/"))
        os.makedirs(os.path.dirname(local), exist_ok=True)
        try:
            resp = client.get_object(Bucket=bucket, Key=key)
            body = resp["Body"].read()
            with open(local, "wb") as fh:
                fh.write(body)
            out.append({"key": key, "missing": False, "n_bytes": len(body)})
        except Exception as exc:  # ClientError NoSuchKey / 404
            code = getattr(exc, "response", {}).get("Error", {}).get("Code", "")
            if code in ("NoSuchKey", "404"):
                out.append({"key": key, "missing": True, "n_bytes": 0})
            else:
                raise
    return out


def upload_files(
    files: DataFrame,
    bucket: str,
    client_factory: Callable[[], Any] = connect_aws,
    acl: str | None = "public-read",
) -> DataFrame:
    """Distributed upload: ``files`` is (local_path, key); each partition
    opens ONE client and streams its files (aws_upload_files semantics —
    incl. the public-read ACL the crowdsourcing flow needs). Returns the
    per-file (key, n_bytes) receipt as a DataFrame."""
    spark = files.sparkSession

    def part(rows):
        rows = list(rows)
        if not rows:
            return iter([])
        client = client_factory()
        return iter(_upload_rows(rows, client, bucket, acl))

    rdd = files.select("local_path", "key").rdd.mapPartitions(part)
    return spark.createDataFrame(rdd, schema="key STRING, n_bytes BIGINT")


def download_files(
    keys: DataFrame,
    bucket: str,
    out_dir: str,
    client_factory: Callable[[], Any] = connect_aws,
) -> DataFrame:
    """Distributed download of ``keys`` (column ``key``) into ``out_dir``
    (a shared filesystem path on a real cluster). Missing objects come
    back flagged — feed the result to ``missing_downloads`` /
    ``manifests.missing_report`` for the anti-join report the reference
    prints (aws_functions.py:140-144)."""
    spark = keys.sparkSession

    def part(rows):
        rows = list(rows)
        if not rows:
            return iter([])
        client = client_factory()
        return iter(_download_rows(rows, client, bucket, out_dir))

    rdd = keys.select("key").rdd.mapPartitions(part)
    return spark.createDataFrame(
        rdd, schema="key STRING, missing BOOLEAN, n_bytes BIGINT"
    )


def copy_files(
    client: Any,
    bucket: str,
    current_folder: str,
    next_folder: str,
    filenames: list[str],
) -> list[str]:
    """Stage-to-stage copy within the bucket (aws_copy_files:85-103):
    server-side copy_object per file — no data leaves S3, so the
    driver-side loop the reference uses is actually the right shape
    (it's a control-plane call per object, not a transfer)."""
    copied = []
    for name in filenames:
        src = f"{current_folder}/{name}"
        dst = f"{next_folder}/{name}"
        client.copy_object(
            Bucket=bucket,
            CopySource={"Bucket": bucket, "Key": src},
            Key=dst,
        )
        copied.append(dst)
    return copied


def missing_downloads(spark: SparkSession, receipts: DataFrame) -> DataFrame:
    """The reference's missing-file report (aws_functions.py:140-144):
    the flagged subset of a download receipt."""
    return receipts.where("missing").select("key")
