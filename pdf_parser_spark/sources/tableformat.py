"""A minimal snapshot/manifest table format over parquet — the jar-free
analog of an Iceberg Hadoop-catalog table, for the engine's checkpoint,
lineage, and time-travel needs.

The north rule reads pages from "an Iceberg table"; this sandbox has no
Iceberg runtime jar, so this module implements the part of the spec the
pipeline actually depends on, the same way Iceberg v1's
HadoopTableOperations does it (public spec: iceberg.apache.org/spec):

- data files are immutable parquet files under ``data/``;
- a SNAPSHOT is a manifest (JSON list of data-file paths + row counts +
  the parent snapshot) under ``metadata/``;
- the table state is a single ``v<N>.json`` version file; a commit WRITES
  the new version to a temp name and RENAMES it into place — rename is
  atomic on POSIX and HDFS, so two concurrent committers race on the
  rename and exactly one wins (the loser retries on top of the winner);
- readers list the version files, pick the highest N (or a requested
  older one = TIME TRAVEL), and read exactly that manifest's files —
  never a directory glob, so concurrent appends and orphaned files from
  failed commits are invisible.

Swapping in real Iceberg is a config change (`spark.read.format("iceberg")`)
— the pipeline code reads through ``read_table`` either way.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def _versions(path: str) -> list[int]:
    md = _meta_dir(path)
    if not os.path.isdir(md):
        return []
    out = []
    for f in os.listdir(md):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                pass
    return sorted(out)


def current_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(f"no table at {path}")
    return vs[-1]


def _read_version(path: str, n: int) -> dict:
    with open(os.path.join(_meta_dir(path), f"v{n}.json")) as f:
        return json.load(f)


def append_snapshot(df: DataFrame, path: str) -> int:
    """Append df as a new snapshot; returns the committed version number.

    Write path: data files first (invisible until committed), then the
    version file via write-temp + atomic rename.  If another committer
    won the race for v<N>, retry as v<N+1> on top of THEIR manifest —
    serializable append semantics, no locks.
    """
    os.makedirs(_meta_dir(path), exist_ok=True)
    snap_id = uuid.uuid4().hex[:12]
    data_dir = os.path.join(path, "data", snap_id)
    df.write.parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    # count from the WRITTEN files' footers — counting `df` again would
    # re-execute its whole plan (2x an Arrow extraction subtree's cost)
    n_rows = df.sparkSession.read.parquet(*files).count() if files else 0
    while True:
        vs = _versions(path)
        base = vs[-1] if vs else 0
        parent = _read_version(path, base) if vs else {"all_files": []}
        version = {
            "version": base + 1,
            "snapshot_id": snap_id,
            "parent_version": base if vs else None,
            "added_files": files,
            "added_rows": n_rows,
            "all_files": parent["all_files"] + files,
        }
        tmp = os.path.join(_meta_dir(path), f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(version, f)
        target = os.path.join(_meta_dir(path), f"v{base + 1}.json")
        try:
            # atomic commit: link fails with EEXIST if a racer won
            os.link(tmp, target)
            os.unlink(tmp)
            return base + 1
        except FileExistsError:
            os.unlink(tmp)  # lost the race -> re-read state and retry


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table AT a version (time travel) or at the latest.  Loads
    exactly the manifest's file list — orphans from failed commits and
    in-flight appends are invisible (snapshot isolation for readers)."""
    v = current_version(path) if version is None else version
    meta = _read_version(path, v)
    return spark.read.parquet(*meta["all_files"])


def snapshots(path: str) -> list[dict]:
    """Version history (driver-side metadata, one tiny JSON per version)."""
    return [_read_version(path, n) for n in _versions(path)]


def rollback(path: str, version: int) -> None:
    """Drop version files above `version` — the table's current state
    becomes that snapshot (data files stay; they are unreachable, exactly
    like Iceberg until a GC/expire pass)."""
    for n in _versions(path):
        if n > version:
            os.unlink(os.path.join(_meta_dir(path), f"v{n}.json"))
