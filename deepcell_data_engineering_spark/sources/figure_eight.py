"""Figure-Eight (Appen) crowdsourcing control plane — S24-S27 (SURVEY §2.1).

Semantics source: caliban_toolbox/figure_eight_functions.py:116-177
(copy/rename/upload), :311-359 (report download/unzip), :180-308
(create/transfer job orchestration), :362-389 (output download).

This is driver-side connector code, exactly as in the reference — the
REST calls are not a Spark operator. What IS Spark-native here: the
manifests the orchestration reads/writes are DataFrames (sources/
manifests.py), and the missing-annotation report is a left-anti join.

The HTTP transport is injected (any object with requests-style
``get``/``put``), so the client is testable with a stub and usable with
``requests`` where installed — mirroring the reference's requests_mock
test strategy (figure_eight_functions_test.py:114-175).
"""

from __future__ import annotations

import io
import os
import zipfile
from dataclasses import dataclass
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

from deepcell_data_engineering_spark.sources import manifests

API_BASE = "https://api.appen.com/v1/jobs"


def _default_transport():
    try:  # pragma: no cover - requests exists in most envs but is optional
        import requests

        return requests
    except ImportError as exc:
        raise NotImplementedError(
            "no HTTP transport available; inject one (requests-style get/put)"
        ) from exc


@dataclass
class FigureEightClient:
    """Thin REST client (S24). ``transport`` is requests-compatible."""

    key: str
    transport: object = None

    def __post_init__(self) -> None:
        if self.transport is None:
            self.transport = _default_transport()

    def copy_job(self, job_id: int) -> int:
        """Clone an existing job's settings; returns the new job id
        (figure_eight_functions.py:116-137)."""
        resp = self.transport.get(
            f"{API_BASE}/{job_id}/copy.json?", params={"key": self.key}
        )
        if resp.status_code != 200:
            raise ValueError(f"copy_job not successful. Status code: {resp.status_code}")
        return resp.json()["id"]

    def rename_job(self, job_id: int, name: str) -> None:
        """(figure_eight_functions.py:139-152)"""
        self.transport.put(
            f"{API_BASE}/{job_id}.json",
            json={"key": self.key, "job": {"title": name}},
        )

    def upload_manifest_csv(self, csv_text: str, job_id: int) -> int:
        """PUT the manifest CSV to populate the job's rows
        (figure_eight_functions.py:155-177)."""
        qs = urlencode({"key": self.key, "force": True})
        resp = self.transport.put(
            f"{API_BASE}/{job_id}/upload.json?{qs}",
            data=csv_text,
            headers={"Content-Type": "text/csv"},
        )
        if resp.status_code != 200:
            raise ValueError(f"Upload_data not successful. Status code: {resp.status_code}")
        return resp.status_code

    def download_report(self, job_id: int, log_dir: str) -> str:
        """GET the full job report zip; save to log_dir
        (figure_eight_functions.py:311-340)."""
        os.makedirs(log_dir, exist_ok=True)
        resp = self.transport.get(
            f"{API_BASE}/{job_id}.csv?",
            params={"type": "full", "key": self.key},
            allow_redirects=True,
        )
        if getattr(resp, "status_code", 200) != 200:
            raise ValueError(
                f"download_report not successful. Status code: {resp.status_code}"
            )
        save_path = os.path.join(log_dir, "job_report.zip")
        with open(save_path, "wb") as fh:
            fh.write(resp.content)
        return save_path


def unzip_report(log_dir: str) -> str:
    """Extract job_report.zip and rename its single member to
    job_report.csv (figure_eight_functions.py:343-359)."""
    zip_path = os.path.join(log_dir, "job_report.zip")
    with zipfile.ZipFile(zip_path, "r") as zf:
        default_name = zf.namelist()[0]
        zf.extractall(log_dir)
    out = os.path.join(log_dir, "job_report.csv")
    os.rename(os.path.join(log_dir, default_name), out)
    return out


def make_report_zip(csv_text: str, inner_name: str = "f123456.csv") -> bytes:
    """Build a report zip in memory (test/mock helper)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(inner_name, csv_text)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Orchestrations (S25/S26/S27): manifest DataFrames + REST control plane
# ---------------------------------------------------------------------------


def create_figure_eight_job(
    spark: SparkSession,
    client: FigureEightClient,
    job_id_to_copy: int,
    aws_folder: str,
    stage: str,
    filenames: list[str],
    log_dir: str,
    job_name: str | None = None,
    pixel_only: bool = False,
    label_only: bool = False,
    rgb_mode: bool = False,
) -> tuple[int, DataFrame]:
    """S25 (figure_eight_functions.py:180-247): copy the template job,
    optionally rename, build the manifest (S21+S23 projections), persist
    it, and upload its CSV to the new job. Returns (new_job_id, manifest).

    The S18 upload step (unit files -> object store) is the caller's
    ``df.write`` against s3a:// — not re-orchestrated here."""
    new_job_id = client.copy_job(job_id_to_copy)
    if job_name:
        client.rename_job(new_job_id, job_name)
    manifest = manifests.create_upload_log(
        spark, stage=stage, aws_folder=aws_folder, filenames=filenames,
        job_id=new_job_id, pixel_only=pixel_only, label_only=label_only,
        rgb_mode=rgb_mode,
    )
    log_name = f"stage_0_{stage}_upload_log.csv"
    manifests.write_manifest(manifest, os.path.join(log_dir, log_name))
    client.upload_manifest_csv(_manifest_csv_text(manifest), new_job_id)
    return new_job_id, manifest


def transfer_figure_eight_job(
    spark: SparkSession,
    client: FigureEightClient,
    previous_manifest: DataFrame,
    previous_log_name: str,
    job_id_to_copy: int,
    new_stage: str,
    log_dir: str,
    job_name: str | None = None,
) -> tuple[int, DataFrame, str]:
    """S26 (figure_eight_functions.py:250-308): stage N -> N+1 hand-off.
    Reads the previous manifest (a DataFrame), re-projects URLs for the
    new stage, bumps the log name, and uploads to a fresh copied job.
    The object-store copy between stage prefixes (S19) is a rename on
    the caller's filesystem/committer."""
    new_job_id = client.copy_job(job_id_to_copy)
    if job_name:
        client.rename_job(new_job_id, job_name)
    head = previous_manifest.select("aws_folder", "pixel_only", "label_only", "rgb_mode").first()
    filenames = [r["filename"] for r in previous_manifest.select("filename").collect()]
    manifest = manifests.create_upload_log(
        spark, stage=new_stage, aws_folder=head["aws_folder"], filenames=filenames,
        job_id=new_job_id, pixel_only=bool(head["pixel_only"]),
        label_only=bool(head["label_only"]), rgb_mode=bool(head["rgb_mode"]),
    )
    new_log_name = manifests.next_log_name(previous_log_name)
    manifests.write_manifest(manifest, os.path.join(log_dir, new_log_name))
    client.upload_manifest_csv(_manifest_csv_text(manifest), new_job_id)
    return new_job_id, manifest, new_log_name


def download_figure_eight_output(
    spark: SparkSession,
    client: FigureEightClient,
    manifest: DataFrame,
    log_dir: str,
    output_listing: DataFrame,
) -> DataFrame:
    """S27 (figure_eight_functions.py:362-389): download + unzip the job
    report, then report expected-but-missing annotation files as a
    left-anti join (J3) of the manifest against the store listing."""
    job_id = int(manifest.select("job_id").first()["job_id"])
    client.download_report(job_id, log_dir)
    unzip_report(log_dir)
    return manifests.missing_files_report(manifest, output_listing)


def _manifest_csv_text(manifest: DataFrame) -> str:
    """Render a (tiny) manifest DataFrame as CSV text for the REST PUT."""
    pdf = manifest.toPandas()
    return pdf.to_csv(index=False)
