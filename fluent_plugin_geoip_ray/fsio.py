"""Filesystem indirection for sinks / manifests / lineage (round-2 VERDICT
item #8): every sink, aggregate side-output and manifest path may be a plain
local path OR a ``scheme://`` URI (``file://``, ``s3://``, ``gs://``, ...)
resolved through ``pyarrow.fs.FileSystem.from_uri`` -- so FanoutWrite and
partitioned resume work on a real cluster where workers don't share a local
filesystem.

Atomicity contract: on a local filesystem, writes keep the tmp + rename
pattern (a retried task overwrites only its own identical file).  On object
stores there is no cheap rename; a single PUT is already all-or-nothing, so
writes go direct -- combined with content-deterministic file names this
preserves retry idempotence (the retry PUTs identical bytes to the same
key).

``pyarrow.fs`` filesystems pickle, so a resolved (fs, path) pair can live in
an actor-pool callable's state.
"""

from __future__ import annotations

import os
import posixpath

import pyarrow.parquet as pq
from pyarrow import fs as pafs


def resolve(path: str):
    """path-or-URI -> (FileSystem, fs-internal path)."""
    if "://" in str(path):
        return pafs.FileSystem.from_uri(str(path))
    return pafs.LocalFileSystem(), str(path)


def join(base: str, *parts: str) -> str:
    """URI-safe path join (object-store paths are always '/'-separated)."""
    return posixpath.join(base, *parts)


def is_local(f) -> bool:
    return isinstance(f, pafs.LocalFileSystem)


def makedirs(f, path: str) -> None:
    f.create_dir(path, recursive=True)


def exists(f, path: str) -> bool:
    return f.get_file_info(path).type != pafs.FileType.NotFound


def is_dir(f, path: str) -> bool:
    return f.get_file_info(path).type == pafs.FileType.Directory


def listdir(f, path: str) -> list[str]:
    """Base names of a directory's direct children ([] when absent)."""
    try:
        infos = f.get_file_info(pafs.FileSelector(path, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(posixpath.basename(i.path.rstrip("/")) for i in infos)


def file_size(f, path: str) -> int:
    return f.get_file_info(path).size or 0


def delete_dir(f, path: str, attempts: int = 3) -> None:
    """Recursive delete tolerating a straggler write landing mid-removal
    (the crashed-attempt garbage partition cleanup exists for)."""
    import time

    for i in range(attempts):
        try:
            if is_dir(f, path):
                f.delete_dir(path)
            return
        except (OSError, FileNotFoundError):
            if i == attempts - 1:
                return
            time.sleep(0.2)


def write_parquet_atomic(f, table, path: str) -> None:
    if is_local(f):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(table, tmp)
        f.move(tmp, path)
    else:
        pq.write_table(table, path, filesystem=f)


def read_parquet(f, path: str):
    return pq.read_table(path, filesystem=f)


def write_bytes_atomic(f, data: bytes, path: str) -> None:
    if is_local(f):
        tmp = path + f".tmp{os.getpid()}"
        with f.open_output_stream(tmp) as s:
            s.write(data)
        f.move(tmp, path)
    else:
        with f.open_output_stream(path) as s:
            s.write(data)


def read_bytes(f, path: str) -> bytes:
    with f.open_input_stream(path) as s:
        return s.read()
