"""S3 transfer ops (sources/aws_transfer.py): partition bodies validated
against the real botocore service model with Stubber; Spark wiring
exercised end-to-end with a filesystem-backed fake client."""

import io
import os

import pytest

from deepcell_data_engineering_spark.sources.aws_transfer import (
    _download_rows,
    _upload_rows,
    copy_files,
    download_files,
    missing_downloads,
    upload_files,
)

boto3 = pytest.importorskip("boto3")
from botocore.stub import ANY, Stubber  # noqa: E402


def _stubbed_client():
    client = boto3.client(
        "s3",
        region_name="us-east-1",
        aws_access_key_id="test",
        aws_secret_access_key="test",
    )
    return client, Stubber(client)


def test_upload_rows_against_service_model(tmp_path):
    """put_object parameter shapes (Bucket/Key/ACL/Body) are validated by
    botocore against the genuine S3 model — a wrong kwarg fails here."""
    f = tmp_path / "a.npz"
    f.write_bytes(b"payload-bytes")
    client, stub = _stubbed_client()
    stub.add_response(
        "put_object",
        {"ETag": '"abc"'},
        {"Bucket": "caliban-input", "Key": "fov/a.npz", "ACL": "public-read", "Body": ANY},
    )
    with stub:
        out = _upload_rows(
            [{"local_path": str(f), "key": "fov/a.npz"}],
            client,
            "caliban-input",
            "public-read",
        )
    assert out == [{"key": "fov/a.npz", "n_bytes": 13}]


def test_download_rows_missing_is_reported_not_fatal(tmp_path):
    client, stub = _stubbed_client()
    stub.add_response(
        "get_object",
        {"Body": io.BytesIO(b"annotated")},
        {"Bucket": "caliban-output", "Key": "fov/ok.npz"},
    )
    stub.add_client_error(
        "get_object",
        service_error_code="NoSuchKey",
        expected_params={"Bucket": "caliban-output", "Key": "fov/gone.npz"},
    )
    with stub:
        out = _download_rows(
            [{"key": "fov/ok.npz"}, {"key": "fov/gone.npz"}],
            client,
            "caliban-output",
            str(tmp_path),
        )
    assert out[0] == {"key": "fov/ok.npz", "missing": False, "n_bytes": 9}
    assert out[1] == {"key": "fov/gone.npz", "missing": True, "n_bytes": 0}
    assert (tmp_path / "fov" / "ok.npz").read_bytes() == b"annotated"
    assert not (tmp_path / "fov" / "gone.npz").exists()


def test_download_rows_preserves_key_paths_no_basename_collision(tmp_path):
    client, stub = _stubbed_client()
    for stage, body in [("stage1", b"one"), ("stage2", b"two!")]:
        stub.add_response(
            "get_object",
            {"Body": io.BytesIO(body)},
            expected_params={"Bucket": "b", "Key": f"{stage}/img.tif"},
        )
    with stub:
        out = _download_rows(
            [{"key": "stage1/img.tif"}, {"key": "stage2/img.tif"}],
            client,
            "b",
            str(tmp_path),
        )
    assert [r["missing"] for r in out] == [False, False]
    assert (tmp_path / "stage1" / "img.tif").read_bytes() == b"one"
    assert (tmp_path / "stage2" / "img.tif").read_bytes() == b"two!"


def test_download_rows_rejects_traversal_keys(tmp_path):
    client, _ = _stubbed_client()
    with pytest.raises(ValueError, match="non-relative"):
        _download_rows(
            [{"key": "../escape.bin"}], client, "b", str(tmp_path)
        )


def test_copy_files_stage_transition():
    client, stub = _stubbed_client()
    for name in ["a.npz", "b.npz"]:
        stub.add_response(
            "copy_object",
            {"CopyObjectResult": {"ETag": '"x"'}},
            {
                "Bucket": "caliban-input",
                "CopySource": {"Bucket": "caliban-input", "Key": f"stage1/{name}"},
                "Key": f"stage2/{name}",
            },
        )
    with stub:
        copied = copy_files(client, "caliban-input", "stage1", "stage2", ["a.npz", "b.npz"])
    assert copied == ["stage2/a.npz", "stage2/b.npz"]


def _fake_s3_factory(root):
    """Factory building a filesystem-backed fake client; the class is
    defined INSIDE the closure so cloudpickle ships it by value to
    executor workers (the test module itself is not importable there).
    'The bucket' is a shared directory, so uploads from any worker
    process are visible to the driver."""

    def factory():
        class FakeS3:
            def put_object(self, Bucket, Key, Body, **kw):
                p = os.path.join(root, Bucket, Key)
                os.makedirs(os.path.dirname(p), exist_ok=True)
                data = Body if isinstance(Body, bytes) else Body.read()
                with open(p, "wb") as fh:
                    fh.write(data)
                return {"ETag": '"fake"'}

            def get_object(self, Bucket, Key):
                p = os.path.join(root, Bucket, Key)
                if not os.path.exists(p):
                    from botocore.exceptions import ClientError

                    raise ClientError(
                        {"Error": {"Code": "NoSuchKey", "Message": Key}},
                        "GetObject",
                    )
                return {"Body": open(p, "rb")}

        return FakeS3()

    return factory


def test_distributed_upload_download_roundtrip(spark, tmp_path):
    bucket_root = str(tmp_path / "s3")
    os.makedirs(os.path.join(bucket_root, "caliban-input"), exist_ok=True)
    local = tmp_path / "local"
    local.mkdir()
    names = [f"fov{i}.npz" for i in range(6)]
    for i, n in enumerate(names):
        (local / n).write_bytes(bytes([i]) * (i + 1))

    files = spark.createDataFrame(
        [(str(local / n), f"job/{n}") for n in names],
        "local_path STRING, key STRING",
    )
    factory = _fake_s3_factory(bucket_root)
    receipts = upload_files(files, "caliban-input", client_factory=factory)
    got = {r["key"]: r["n_bytes"] for r in receipts.collect()}
    assert got == {f"job/{n}": i + 1 for i, n in enumerate(names)}

    out_dir = tmp_path / "downloads"
    out_dir.mkdir()
    keys = spark.createDataFrame(
        [(f"job/{n}",) for n in names] + [("job/never-annotated.npz",)],
        "key STRING",
    )
    dl = download_files(
        keys, "caliban-input", str(out_dir), client_factory=factory
    )
    rows = {r["key"]: r for r in dl.collect()}
    assert rows["job/never-annotated.npz"]["missing"]
    for i, n in enumerate(names):
        assert not rows[f"job/{n}"]["missing"]
        assert (out_dir / "job" / n).read_bytes() == bytes([i]) * (i + 1)
    missing = missing_downloads(spark, dl).collect()
    assert [r["key"] for r in missing] == ["job/never-annotated.npz"]
