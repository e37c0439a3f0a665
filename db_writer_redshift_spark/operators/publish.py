"""Atomic multi-table publish: versioned snapshot directories + a CURRENT
pointer file.

The writer's per-table overwrite (operators/writer.py) is atomic for ONE
table; a pipeline that refreshes several tables (facts + their rollups +
dimension snapshots) needs readers to see either the old set or the new
set — never a mix. The reference has no such facility (it issues
independent per-table loads with no transaction wrapper — SURVEY.md §3
entry point 2 notes the half-merged-state hazard); this operator is the
lakehouse-shaped fix:

    base/
      v=1/<table>.parquet/...
      v=2/<table>.parquet/...
      CURRENT          <- one line: the committed version number

Writers materialize the ENTIRE new version directory first, then commit
by swapping the pointer (write CURRENT.tmp, atomic rename over CURRENT —
a single-object operation on a POSIX filesystem; on object stores, swap
through a small metastore row or a conditional PUT instead). A crash
mid-publish leaves a dangling v=N+1 directory and an untouched pointer:
readers never observe the partial version, and the next publish retries
into a fresh version number. Uncommitted directories are reclaimed by
``vacuum_versions`` (the orphan-cleanup sweep).

Scale: the pointer is metadata (bytes); version directories are plain
parquet written with whatever partitioning each table already uses —
publish adds zero data-plane cost beyond the writes themselves, and old
versions provide time-travel reads until vacuumed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

CURRENT = "CURRENT"


def _version_dir(base_dir: str, version: int) -> str:
    return os.path.join(base_dir, f"v={version}")


def current_version(base_dir: str) -> int | None:
    """Committed version, or None before the first publish."""
    path = os.path.join(base_dir, CURRENT)
    if not os.path.exists(path):
        return None
    with open(path, encoding="ascii") as f:
        return int(f.read().strip())


def _latest_dir_version(base_dir: str) -> int:
    if not os.path.isdir(base_dir):
        return 0
    vs = [
        int(name[2:])
        for name in os.listdir(base_dir)
        if name.startswith("v=") and name[2:].isdigit()
    ]
    return max(vs, default=0)


def publish_tables(tables: dict[str, DataFrame], base_dir: str) -> int:
    """Write every table of the new snapshot, then commit atomically.

    Returns the committed version number. The version directory is chosen
    past BOTH the committed pointer and any dangling (crashed) directory,
    so a retry never writes into a partially-written tree, and it is
    CLAIMED with an exclusive ``os.mkdir`` — two concurrent publishers
    race to distinct version numbers instead of interleaving writes into
    the same directory. The pointer swap itself is last-writer-wins: with
    concurrent publishers both snapshots are complete and internally
    consistent, but which one readers see is unordered — serialize
    publishers externally when commit ORDER matters (on object stores,
    the conditional-PUT pointer swap provides that ordering)."""
    if not tables:
        raise ValueError("publish_tables: no tables given")
    os.makedirs(base_dir, exist_ok=True)
    version = max(current_version(base_dir) or 0, _latest_dir_version(base_dir))
    while True:
        version += 1
        vdir = _version_dir(base_dir, version)
        try:
            os.mkdir(vdir)  # exclusive claim of this version number
            break
        except FileExistsError:
            continue  # another publisher claimed it — take the next
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(vdir, f"{name}.parquet"))
    tmp = os.path.join(base_dir, CURRENT + ".tmp")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(str(version))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(base_dir, CURRENT))  # the commit point
    return version


def read_table(
    spark: SparkSession, base_dir: str, name: str, version: int | None = None
) -> DataFrame:
    """Read a table at the committed version (or a pinned older one —
    time travel). Raises FileNotFoundError before the first commit."""
    v = version if version is not None else current_version(base_dir)
    if v is None:
        raise FileNotFoundError(f"no committed version under {base_dir}")
    return spark.read.parquet(os.path.join(_version_dir(base_dir, v), f"{name}.parquet"))


def vacuum_versions(
    base_dir: str, keep: int = 1, include_dangling: bool = False
) -> list[int]:
    """Remove version directories older than the newest ``keep`` committed
    ones. Never touches the committed version. Returns removed versions.

    ``include_dangling=True`` additionally removes directories NEWER than
    the pointer (crashed publishes) — enable it ONLY when no publisher
    can be running: a directory above the pointer is indistinguishable
    from a publish currently materializing its tables, and deleting it
    mid-write would commit a version missing the tables written before
    the sweep. Default sweeps are always safe to run concurrently."""
    import shutil

    committed = current_version(base_dir)
    if committed is None:
        return []
    removed = []
    for name in sorted(os.listdir(base_dir)):
        if not (name.startswith("v=") and name[2:].isdigit()):
            continue
        v = int(name[2:])
        dangling = v > committed and include_dangling
        expired = v <= committed - keep
        if dangling or expired:
            shutil.rmtree(os.path.join(base_dir, name))
            removed.append(v)
    return removed


def diff_versions(
    spark: SparkSession,
    base_dir: str,
    name: str,
    pk_cols: list[str],
    from_version: int | None = None,
    to_version: int | None = None,
):
    """Net changes of ``name`` between two published versions (defaults:
    previous committed -> current committed) — time-travel CDC: because
    publish keeps whole versions, any consumer can recover the exact
    insert/delete/update feed between ANY two snapshots it missed,
    without the producer maintaining a change log. One full-outer PK
    join; output ∝ change volume (operators/diff.snapshot_diff)."""
    from db_writer_redshift_spark.operators.diff import snapshot_diff

    to_v = to_version if to_version is not None else current_version(base_dir)
    if to_v is None:
        raise FileNotFoundError(f"no committed version under {base_dir}")
    from_v = from_version if from_version is not None else to_v - 1
    return snapshot_diff(
        read_table(spark, base_dir, name, version=from_v),
        read_table(spark, base_dir, name, version=to_v),
        pk_cols,
    )
