"""Per-partition lineage manifests + resume (north_rule requirement).

The reference has no checkpointing (Fluentd buffers live outside the plugin,
SURVEY §4); at 10^12-turn scale a run must be resumable.  Design:

* a **partition** is a deterministic chunk of input parquet files (input
  layout is the unit of work -- at 100 TB the table is many files; here one
  file still yields one partition).
* each partition writes its sink files under ``<sink>/part=<pid>/`` and its
  aggregate partials under ``<out>/_partials/<pid>/``, then commits ONE
  manifest JSON atomically (tmp + rename).  A partition is complete iff its
  manifest exists -- sink files without a manifest are ignorable garbage from
  a crashed attempt (and are deleted on retry), giving partition-level
  exactly-once.
* resume = skip partitions whose manifest validates; the final aggregate
  merge reads only committed partials.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass


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
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{pid:06d}.json")


def load_manifest(out_dir: str, pid: int) -> dict | None:
    path = manifest_path(out_dir, pid)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            m = json.load(f)
        return m if m.get("complete") else None
    except (json.JSONDecodeError, OSError):
        return None


def completed_pids(out_dir: str) -> set[int]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("part-") and name.endswith(".json"):
            pid = int(name[5:-5])
            if load_manifest(out_dir, pid) is not None:
                out.add(pid)
    return out


def write_manifest(out_dir: str, pid: int, payload: dict) -> str:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = manifest_path(out_dir, pid)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({**payload, "pid": pid, "complete": True}, f, indent=1)
    os.replace(tmp, path)
    return path


def _rmtree_robust(path: str, attempts: int = 3) -> None:
    """rmtree that tolerates a straggler write landing mid-removal (exactly
    the crashed-attempt garbage this cleaner exists for)."""
    import time

    for _ in range(attempts):
        try:
            shutil.rmtree(path)
            return
        except OSError:
            time.sleep(0.2)
    shutil.rmtree(path, ignore_errors=True)


def clean_partition_outputs(out_dir: str, sinks: dict[str, str], pid: int) -> None:
    """Remove leftovers of a crashed attempt before re-running a partition."""
    for sink_dir in sinks.values():
        part_dir = os.path.join(sink_dir, f"part={pid:06d}")
        if os.path.isdir(part_dir):
            _rmtree_robust(part_dir)
    partial = os.path.join(out_dir, "_partials", f"{pid:06d}")
    if os.path.isdir(partial):
        _rmtree_robust(partial)
