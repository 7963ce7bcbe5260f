"""Per-partition lineage manifests + resume (north_rule requirement).

The reference has no checkpointing (Fluentd buffers live outside the plugin,
SURVEY §4); at 10^12-turn scale a run must be resumable.  Design:

* a **partition** is a deterministic chunk of input parquet files (input
  layout is the unit of work -- at 100 TB the table is many files; here one
  file still yields one partition).
* each partition writes its sink files under ``<sink>/part=<pid>/`` and its
  aggregate partials under ``<out>/_partials/<pid>/``, then commits ONE
  manifest JSON atomically (tmp + rename locally; single-PUT on object
  stores).  A partition is complete iff its manifest exists -- sink files
  without a manifest are ignorable garbage from a crashed attempt (and are
  deleted on retry), giving partition-level exactly-once.
* resume = skip partitions whose manifest validates; the final aggregate
  merge reads only committed partials.
* every path may be a ``scheme://`` URI (fsio.py) -- manifests and sinks
  live on shared/object storage on a real cluster, never a worker-local
  disk.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from . import fsio


@dataclass(frozen=True)
class Partition:
    pid: int
    files: tuple


def plan_partitions(input_files: list[str], files_per_partition: int = 1) -> list[Partition]:
    files = sorted(input_files)
    return [
        Partition(pid=i, files=tuple(files[i * files_per_partition:(i + 1) * files_per_partition]))
        for i in range((len(files) + files_per_partition - 1) // files_per_partition)
    ]


def manifest_dir(out_dir: str) -> str:
    return fsio.join(out_dir, "_manifests")


def manifest_path(out_dir: str, pid: int) -> str:
    return fsio.join(manifest_dir(out_dir), f"part-{pid:06d}.json")


def load_manifest(out_dir: str, pid: int) -> dict | None:
    f, path = fsio.resolve(manifest_path(out_dir, pid))
    if not fsio.exists(f, path):
        return None
    try:
        m = json.loads(fsio.read_bytes(f, path))
        return m if m.get("complete") else None
    except (json.JSONDecodeError, OSError):
        return None


def completed_pids(out_dir: str) -> set[int]:
    f, d = fsio.resolve(manifest_dir(out_dir))
    out = set()
    for name in fsio.listdir(f, d):
        if name.startswith("part-") and name.endswith(".json"):
            pid = int(name[5:-5])
            if load_manifest(out_dir, pid) is not None:
                out.add(pid)
    return out


def write_manifest(out_dir: str, pid: int, payload: dict) -> str:
    f, d = fsio.resolve(manifest_dir(out_dir))
    fsio.makedirs(f, d)
    uri_path = manifest_path(out_dir, pid)
    _, path = fsio.resolve(uri_path)
    data = json.dumps({**payload, "pid": pid, "complete": True}, indent=1)
    fsio.write_bytes_atomic(f, data.encode(), path)
    return uri_path


def clean_partition_outputs(out_dir: str, sinks: dict[str, str], pid: int) -> None:
    """Remove leftovers of a crashed attempt before re-running a partition."""
    for sink_dir in sinks.values():
        f, base = fsio.resolve(sink_dir)
        fsio.delete_dir(f, fsio.join(base, f"part={pid:06d}"))
    f, base = fsio.resolve(out_dir)
    fsio.delete_dir(f, fsio.join(base, "_partials", f"{pid:06d}"))
