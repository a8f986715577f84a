"""Dataset download lifecycle — fetch, verify, extract, place.

TPU-native rebuild of the reference's download plumbing
(cogdl/utils/utils.py:66 ``download_url``, :46 ``untar``;
cogdl/data/dataset.py:60 ``download`` hook), hardened:

* atomic writes (a crashed download never leaves a plausible raw file),
* optional md5 verification,
* ``file://`` URLs so the full lifecycle is testable in this offline
  environment (tests/test_datasets.py),
* no ``exit(1)`` — failures raise with the manual-placement instructions
  the loaders already print.

``fetch_dataset(name)`` drives the per-dataset URL registry below and drops
files exactly where the loaders look for them (``DATA_ROOT/<dir>/...``);
``scripts/download.py --fetch`` is the CLI face.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tarfile
import zipfile
from dataclasses import dataclass, field
from typing import Dict, List, Optional
from urllib import request

__all__ = ["download_url", "check_md5", "extract_archive", "fetch_dataset",
           "RawFile", "DATASET_URLS"]


@dataclass
class RawFile:
    url: str
    filename: Optional[str] = None   # default: URL basename
    md5: Optional[str] = None
    extract: bool = False            # unpack archives after download


@dataclass
class DatasetFiles:
    subdir: str                      # under DATA_ROOT
    files: List[RawFile] = field(default_factory=list)


# URL registry for the reference's primary real datasets. The kimiyoung/
# planetoid raw pickles are the canonical source the parsers here round-trip
# (reference planetoid_data.py:115 mirrors the same files).
_PLANETOID_BASE = ("https://github.com/kimiyoung/planetoid/raw/master/data/"
                   "ind.{name}.{part}")
_PLANETOID_PARTS = ("x", "y", "tx", "ty", "allx", "ally", "graph",
                    "test.index")


def _planetoid(name: str) -> DatasetFiles:
    # the loader reads <DATA_ROOT>/<name>/raw/ind.<name>.* (planetoid.py:33)
    return DatasetFiles(
        subdir=os.path.join(name, "raw"),
        files=[RawFile(url=_PLANETOID_BASE.format(name=name, part=p))
               for p in _PLANETOID_PARTS])


# GraphSAINT-format node-classification sets (reference saint_data.py:133-230)
_SAINT_SHARES = {
    "yelp": "03d65f79f231445b9f42",
    "amazon-s": "6246372398f24c549419",
    "flickr": "7ee4296bf71e4059972d",
    "reddit": "4de907d0006e4c61ba22",
    "ppi": "1c8bd1d5a481402aa938",
    "ppi-large": "436011ecea614a51baea",
}
_SAINT_FILES = ("adj_full.npz", "adj_train.npz", "class_map.json",
                "feats.npy", "role.json")


def _saint(name: str) -> DatasetFiles:
    share = _SAINT_SHARES[name]
    base = f"https://cloud.tsinghua.edu.cn/d/{share}/files/?p=%2F{{}}&dl=1"
    return DatasetFiles(
        subdir=os.path.join(name, "raw"),
        files=[RawFile(url=base.format(f), filename=f)
               for f in _SAINT_FILES])


def _grb(name: str) -> DatasetFiles:
    # one zip per set (reference grb_data.py:18-24); extracts adj/features/
    # labels/index .npz next to itself (grb.py reads <root>/raw/*.npz)
    return DatasetFiles(
        subdir=os.path.join(name, "raw"),
        files=[RawFile(
            url=f"https://cogdl-data.oss-cn-beijing.aliyuncs.com/data/{name}.zip",
            extract=True)])


def _tu(name: str) -> DatasetFiles:
    # TU Dortmund graph-kernel archive (reference tu_data.py:211); the zip
    # unpacks a <CANON>/ directory, one of the layouts tu.py searches
    from .tu import CANONICAL

    canon = CANONICAL.get(name, name.upper())
    return DatasetFiles(
        subdir=os.path.join(name, "raw"),
        files=[RawFile(
            url=f"https://www.chrsmrrs.com/graphkerneldatasets/{canon}.zip",
            extract=True)])


DATASET_URLS: Dict[str, DatasetFiles] = {
    "cora": _planetoid("cora"),
    "citeseer": _planetoid("citeseer"),
    "pubmed": _planetoid("pubmed"),
    **{n: _saint(n) for n in _SAINT_SHARES},
    **{n: _grb(n) for n in ("grb-cora", "grb-citeseer", "grb-reddit",
                            "grb-aminer", "grb-flickr")},
    **{n: _tu(n) for n in ("mutag", "ptc-mr", "nci1", "proteins", "collab",
                           "imdb-b", "imdb-m", "reddit-b")},
}


def check_md5(path: str, md5: str) -> bool:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == md5


def download_url(url: str, folder: str, name: Optional[str] = None,
                 md5: Optional[str] = None, log: bool = True) -> str:
    """Fetch ``url`` into ``folder`` atomically; verify ``md5`` if given.
    Returns the final path. An existing file with a matching md5 (or any
    existing file when no md5 is given) is kept — downloads resume cheaply."""
    filename = name or url.rpartition("/")[2].split("?")[0] or "download"
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, filename)
    if os.path.exists(path) and (md5 is None or check_md5(path, md5)):
        return path
    if log:
        print(f"downloading {url} -> {path}")
    tmp = path + ".part"
    try:
        with request.urlopen(url) as resp, open(tmp, "wb") as f:
            shutil.copyfileobj(resp, f)
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise OSError(
            f"download failed for {url}: {e}\n"
            f"Fetch the file manually and place it at {path}") from e
    if md5 is not None and not check_md5(tmp, md5):
        os.remove(tmp)
        raise OSError(f"md5 mismatch for {url} (expected {md5})")
    os.replace(tmp, path)            # atomic: no partial raw files
    return path


def extract_archive(path: str, folder: Optional[str] = None,
                    delete: bool = False) -> None:
    """Unpack .zip/.tar(.gz|.bz2)/.gz next to the archive (or into
    ``folder``)."""
    folder = folder or os.path.dirname(path)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(folder)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            if hasattr(tarfile, "data_filter"):
                t.extractall(folder, filter="data")
            else:  # filter= is a late backport (< 3.10.12 / 3.11.4)
                t.extractall(folder)
    elif path.endswith(".gz"):
        with gzip.open(path, "rb") as src, \
                open(path[: -len(".gz")], "wb") as dst:
            shutil.copyfileobj(src, dst)
    else:
        raise ValueError(f"unknown archive format: {path}")
    if delete:
        os.remove(path)


def fetch_dataset(name: str, root: Optional[str] = None,
                  log: bool = True) -> str:
    """Download every raw file of a registered dataset into
    ``root/<subdir>`` (root defaults to the loaders' DATA_ROOT). Returns the
    dataset directory. Unregistered names raise KeyError with the list."""
    from . import DATA_ROOT

    spec = DATASET_URLS.get(name)
    if spec is None:
        raise KeyError(
            f"no download registry entry for {name!r}; registered: "
            f"{sorted(DATASET_URLS)}. Other datasets need manual placement "
            f"(see the loader's FileNotFoundError message).")
    folder = os.path.join(root or DATA_ROOT, spec.subdir)
    for rf in spec.files:
        path = download_url(rf.url, folder, name=rf.filename, md5=rf.md5,
                            log=log)
        if rf.extract:
            extract_archive(path)
    return folder
