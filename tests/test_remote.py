"""S9 — GEO/URL downloader (sources/remote.py): archive handling runs
offline with an injected local-file fetcher (the sandbox has no network);
reference semantics from utils.py:380-479."""

from __future__ import annotations

import shutil
import tarfile
import zipfile
from pathlib import Path

import numpy as np
import pytest

from pylluminator_spark.sources.idat import parse_idat_bytes, write_idat
from pylluminator_spark.sources.remote import (
    download_from_geo,
    download_from_link,
    extract_archive,
    geo_download_url,
)


@pytest.fixture()
def gsm_tar(tmp_path) -> Path:
    """A GEO-style tar holding one idat pair."""
    src = tmp_path / "src"
    src.mkdir()
    ids = np.arange(100, 130, dtype="int32")
    for suffix in ("Grn", "Red"):
        write_idat(
            str(src / f"GSM12345_R01C01_{suffix}.idat"),
            ids,
            (ids % 7 + 10).astype("uint16"),
            np.full(len(ids), 3, dtype="uint16"),
            np.full(len(ids), 9, dtype="uint8"),
        )
    tar_path = tmp_path / "GSM12345.tar"
    with tarfile.open(tar_path, "w") as tf:
        for f in sorted(src.iterdir()):
            tf.add(f, arcname=f.name)
    return tar_path


def _local_fetcher(archive: Path):
    def fetch(url: str, dest: str) -> None:
        shutil.copy(archive, dest)

    return fetch


def test_download_from_geo_fetch_extract_and_parse(tmp_path, gsm_tar):
    out = tmp_path / "out"
    done = download_from_geo("GSM12345", out, fetcher=_local_fetcher(gsm_tar))
    assert done == ["GSM12345"]
    idats = sorted(out.glob("*idat*"))
    assert len(idats) >= 2
    # the extracted files are real parseable idats (feeds the S1 scan)
    parsed = parse_idat_bytes(idats[0].read_bytes())
    assert set(parsed) >= {"illumina_id", "mean_value"}
    assert len(parsed["illumina_id"]) == 30


def test_download_from_geo_idempotent_skip(tmp_path, gsm_tar):
    out = tmp_path / "out"
    download_from_geo("GSM12345", out, fetcher=_local_fetcher(gsm_tar))

    calls = []

    def counting_fetcher(url, dest):
        calls.append(url)

    done = download_from_geo("GSM12345", out, fetcher=counting_fetcher)
    assert done == ["GSM12345"] and calls == []  # idat pair present -> skip


def test_download_from_geo_untars_existing_archive(tmp_path, gsm_tar):
    out = tmp_path / "out"
    out.mkdir()
    shutil.copy(gsm_tar, out / "GSM12345.tar")

    def failing_fetcher(url, dest):
        raise AssertionError("must not fetch when the archive exists")

    done = download_from_geo("GSM12345", out, fetcher=failing_fetcher)
    assert done == ["GSM12345"]
    assert len(list(out.glob("*idat*"))) >= 2


def test_download_from_link_zip_and_failure(tmp_path):
    zip_path = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("a.csv", "x,y\n1,2\n")
    out = tmp_path / "out"
    rc = download_from_link(
        "http://example.invalid/bundle.zip",
        out,
        decompress=True,
        delete_archive=True,
        fetcher=_local_fetcher(zip_path),
    )
    assert rc == 1
    assert (out / "a.csv").read_text().startswith("x,y")
    assert not (out / "bundle.zip").exists()  # delete_archive

    def broken(url, dest):
        raise OSError("no network")

    rc = download_from_link("http://example.invalid/x.tar", tmp_path / "o2", fetcher=broken)
    assert rc == -1


def test_geo_url_and_bad_archive(tmp_path):
    assert "GSM999" in geo_download_url("GSM999")
    bad = tmp_path / "weird.rar"
    bad.write_bytes(b"xx")
    with pytest.raises(ValueError, match="unsupported archive"):
        extract_archive(bad, tmp_path)
