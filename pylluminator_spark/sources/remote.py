"""S9 — GEO / URL downloader (reference utils.py:380-479:
``download_from_geo`` / ``download_from_link``).

The archive handling (idempotent skip, .zip / .tar decompression, archive
cleanup) is the real logic and runs offline; the network fetch itself is an
injectable ``fetcher`` callable so the sandbox (and unit tests) can supply a
local-file fetcher while production uses the stdlib urllib default. Driver
utility by design: downloads feed the IDAT *scan* (sources/idat.py), which
is where the distributed work starts — a 1000-executor cluster pulls raw
files onto shared storage once, not per executor.
"""

from __future__ import annotations

import logging
import os
import tarfile
import zipfile
from pathlib import Path
from typing import Callable

LOGGER = logging.getLogger(__name__)

# fetcher(url, dest_path) -> saves the url's bytes at dest_path
Fetcher = Callable[[str, str], None]


def _default_fetcher(url: str, dest: str) -> None:
    import urllib.request

    urllib.request.urlretrieve(url, dest)


def geo_download_url(gsm_id: str) -> str:
    """Supplementary-file archive URL for a GEO sample accession
    (reference utils.py:416)."""
    return f"https://www.ncbi.nlm.nih.gov/geo/download/?acc={gsm_id}&format=file"


def extract_archive(
    archive: str | os.PathLike, output_folder: str | os.PathLike,
    delete_archive: bool = False,
) -> list[str]:
    """Decompress a .zip or .tar archive into ``output_folder`` and return
    the extracted member names (reference utils.py:466-479). The tar path
    uses the 'data' filter — no absolute paths / traversal / special files.
    """
    archive = Path(archive)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    name = archive.name
    if name.endswith(".zip"):
        with zipfile.ZipFile(archive, "r") as zf:
            members = zf.namelist()
            zf.extractall(output_folder)
    elif name.endswith(".tar"):
        with tarfile.TarFile(archive, "r") as tf:
            members = tf.getnames()
            tf.extractall(output_folder, filter="data")
    else:
        raise ValueError(f"unsupported archive type: {name} (.zip/.tar)")
    if delete_archive:
        archive.unlink()
    return members


def download_from_link(
    dl_link: str,
    output_folder: str | os.PathLike,
    filename: str | None = None,
    decompress: bool = False,
    delete_archive: bool = False,
    fetcher: Fetcher | None = None,
) -> int:
    """Fetch a file if absent, optionally decompress; returns 1 on success,
    -1 on a failed fetch (reference utils.py:420-479 semantics, including
    the skip-when-present idempotency)."""
    output_folder = Path(output_folder)
    if filename is None:
        filename = dl_link.rsplit("/", 1)[-1]
    target = output_folder / filename
    if not target.exists():
        LOGGER.info("%s not found, downloading", filename)
        output_folder.mkdir(parents=True, exist_ok=True)
        try:
            (fetcher or _default_fetcher)(dl_link, str(target))
        except Exception:
            # remove any partial file: the exists() idempotency checks
            # would otherwise treat it as a complete download forever
            target.unlink(missing_ok=True)
            LOGGER.exception(
                "download from %s failed; fetch it manually into %s",
                dl_link,
                output_folder,
            )
            return -1
    if decompress and (filename.endswith(".zip") or filename.endswith(".tar")):
        extract_archive(target, output_folder, delete_archive=delete_archive)
    return 1


def download_from_geo(
    gsm_ids: str | list[str],
    target_directory: str | os.PathLike,
    fetcher: Fetcher | None = None,
) -> list[str]:
    """Fetch + un-tar GEO idat archives for one or more GSM accessions
    (reference utils.py:380-417). Skips accessions whose idat pair already
    exists; un-tars a pre-existing archive without re-fetching. Returns the
    accessions that are present (already or newly) after the call."""
    if isinstance(gsm_ids, str):
        gsm_ids = [gsm_ids]
    target = Path(target_directory)
    target.mkdir(parents=True, exist_ok=True)
    done = []
    for gsm_id in gsm_ids:
        existing = list(target.glob(f"*{gsm_id}*idat*"))
        if len(existing) >= 2:
            LOGGER.info("idat files already present for %s, skipping", gsm_id)
            done.append(gsm_id)
            continue
        tar_file = target / f"{gsm_id}.tar"
        if tar_file.exists():
            extract_archive(tar_file, target)
            done.append(gsm_id)
            continue
        status = download_from_link(
            geo_download_url(gsm_id),
            target,
            f"{gsm_id}.tar",
            decompress=True,
            fetcher=fetcher,
        )
        if status == 1:
            done.append(gsm_id)
    return done
