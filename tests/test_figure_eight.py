"""S24-S27 figure-eight control plane with a stubbed transport (mirrors the
reference's requests_mock strategy, figure_eight_functions_test.py:114-175)."""

import json
import os

import pytest

from deepcell_data_engineering_spark.sources import figure_eight as f8
from deepcell_data_engineering_spark.sources import manifests


class FakeResponse:
    def __init__(self, status_code=200, payload=None, content=b""):
        self.status_code = status_code
        self._payload = payload or {}
        self.content = content

    def json(self):
        return self._payload


class FakeTransport:
    """requests-compatible stub recording every call."""

    def __init__(self, copy_id=667, fail_copy=False, fail_upload=False, report_zip=b""):
        self.calls = []
        self.copy_id = copy_id
        self.fail_copy = fail_copy
        self.fail_upload = fail_upload
        self.report_zip = report_zip

    def get(self, url, params=None, allow_redirects=False):
        self.calls.append(("GET", url, params))
        if "copy.json" in url:
            if self.fail_copy:
                return FakeResponse(status_code=500)
            return FakeResponse(payload={"id": self.copy_id})
        if url.endswith(".csv?"):
            return FakeResponse(content=self.report_zip)
        return FakeResponse()

    def put(self, url, json=None, data=None, headers=None):
        self.calls.append(("PUT", url, json if json is not None else data))
        if "upload.json" in url and self.fail_upload:
            return FakeResponse(status_code=422)
        return FakeResponse()


def test_copy_and_rename_and_upload():
    t = FakeTransport(copy_id=123)
    client = f8.FigureEightClient(key="k", transport=t)
    assert client.copy_job(666) == 123
    client.rename_job(123, "new name")
    assert client.upload_manifest_csv("a,b\n1,2\n", 123) == 200
    methods = [c[0] for c in t.calls]
    assert methods == ["GET", "PUT", "PUT"]
    assert "key=k" in t.calls[2][1]  # upload URL carries the API key


def test_copy_job_failure_raises():
    client = f8.FigureEightClient(key="k", transport=FakeTransport(fail_copy=True))
    with pytest.raises(ValueError, match="copy_job not successful"):
        client.copy_job(666)


def test_upload_failure_raises():
    client = f8.FigureEightClient(key="k", transport=FakeTransport(fail_upload=True))
    with pytest.raises(ValueError, match="not successful"):
        client.upload_manifest_csv("x", 1)


def test_download_and_unzip_report(tmp_path):
    zip_bytes = f8.make_report_zip("id,annotation\n1,done\n")
    t = FakeTransport(report_zip=zip_bytes)
    client = f8.FigureEightClient(key="k", transport=t)
    log_dir = str(tmp_path / "logs")
    client.download_report(42, log_dir)
    out = f8.unzip_report(log_dir)
    assert out.endswith("job_report.csv")
    assert "done" in open(out).read()


def test_create_job_end_to_end(spark, tmp_path):
    t = FakeTransport(copy_id=900)
    client = f8.FigureEightClient(key="k", transport=t)
    log_dir = str(tmp_path / "logs")
    job_id, manifest = f8.create_figure_eight_job(
        spark, client, job_id_to_copy=1, aws_folder="proj/a", stage="stage_0",
        filenames=["f1.npz", "f2.npz"], log_dir=log_dir, job_name="jobby",
        rgb_mode=True,
    )
    assert job_id == 900
    rows = manifest.orderBy("filename").collect()
    assert [r["filename"] for r in rows] == ["f1.npz", "f2.npz"]
    assert rows[0]["project_url"].startswith(
        "https://caliban.deepcell.org/caliban-input__caliban-output__proj__a__stage_0__f1.npz?"
    )
    assert rows[0]["job_id"] == 900 and rows[0]["rgb_mode"] is True
    # manifest persisted + uploaded
    assert os.path.isdir(os.path.join(log_dir, "stage_0_stage_0_upload_log.csv"))
    put_bodies = [c[2] for c in t.calls if c[0] == "PUT" and isinstance(c[2], str)]
    assert any("f2.npz" in b for b in put_bodies)


def test_transfer_job_bumps_stage(spark, tmp_path):
    t = FakeTransport(copy_id=901)
    client = f8.FigureEightClient(key="k", transport=t)
    prev = manifests.create_upload_log(
        spark, stage="annotate", aws_folder="proj/a",
        filenames=["f1.npz"], job_id=900,
    )
    job_id, manifest, log_name = f8.transfer_figure_eight_job(
        spark, client, prev, "stage_0_annotate_upload_log.csv",
        job_id_to_copy=900, new_stage="review", log_dir=str(tmp_path),
    )
    assert job_id == 901
    assert log_name == "stage_1_annotate_upload_log.csv"
    r = manifest.first()
    assert r["stage"] == "review" and "__review__" in r["project_url"]


def test_download_output_missing_report(spark, tmp_path):
    zip_bytes = f8.make_report_zip("id\n1\n")
    t = FakeTransport(report_zip=zip_bytes)
    client = f8.FigureEightClient(key="k", transport=t)
    manifest = manifests.create_upload_log(
        spark, stage="s", aws_folder="a", filenames=["f1.npz", "f2.npz", "f3.npz"],
        job_id=7,
    )
    listing = spark.createDataFrame([("f2.npz",)], "filename string")
    missing = f8.download_figure_eight_output(
        spark, client, manifest, str(tmp_path), listing
    )
    assert sorted(r["filename"] for r in missing.collect()) == ["f1.npz", "f3.npz"]


def test_default_transport_gated():
    # with requests absent this raises NotImplementedError; with it present
    # the client constructs — either way no network call happens here
    try:
        f8.FigureEightClient(key="k")
    except NotImplementedError:
        pass


def test_download_report_failure_raises(tmp_path):
    class FailingTransport(FakeTransport):
        def get(self, url, params=None, allow_redirects=False):
            if url.endswith(".csv?"):
                return FakeResponse(status_code=500)
            return super().get(url, params, allow_redirects)

    client = f8.FigureEightClient(key="k", transport=FailingTransport())
    with pytest.raises(ValueError, match="download_report not successful"):
        client.download_report(42, str(tmp_path))
