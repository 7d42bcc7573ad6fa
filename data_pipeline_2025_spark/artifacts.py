"""Process-shared materialized artifacts (silver products, trigram
index, continuous aggregates) under a hardened scratch root.

Three hazards of the naive ``/tmp/dp2025_gold/{mangled_sf_dir}``
layout, each fixed here:

- **key collisions** — ``strip('/')+replace('/','_')`` maps distinct
  directories (``a/b_c`` vs ``a_b/c``) to one key; the key is now
  the md5 of the absolute path, collision-free for any two dirs;
- **world-shared root** — a predictable ``/tmp`` path is
  pre-creatable/poisonable by another user on multi-user hosts; the
  root is now per-uid and created with mode 0700;
- **overwrite-under-reader races** — ``mode('overwrite')`` deletes
  files first, so a concurrent process mid-read sees missing files.
  :func:`publish` writes to a fresh versioned directory and then
  atomically swaps a symlink (``os.replace`` of a symlink is atomic
  on POSIX): readers that resolved the old version keep reading it
  untouched, new readers see the new one. Inputs are immutable per
  sf_dir and builds deterministic, so concurrent publishers write
  identical content and either winner is correct. Superseded
  version directories are left for the OS tmp reaper (bounded: one
  per publisher process).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame


def artifact_root() -> str:
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    root = os.path.join(tempfile.gettempdir(), f"dp2025_gold_{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    return root


def artifact_path(sf_dir: str, name: str) -> str:
    """Stable per-(sf_dir, artifact) path under the hardened root."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    return os.path.join(artifact_root(), key, name)


def publish(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> str:
    """Atomically (re)publish a deterministic parquet artifact at
    ``path``: write a fresh versioned directory, then swap ``path``
    as a symlink onto it. Safe against concurrent readers (they keep
    the version they resolved) and concurrent publishers (last
    symlink swap wins; content is identical by determinism)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    version = f"{path}.v-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(version)
    tmp_link = f"{version}.lnk"
    os.symlink(version, tmp_link)
    os.replace(tmp_link, path)  # atomic symlink swap
    return path
