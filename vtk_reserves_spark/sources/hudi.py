"""Apache Hudi COPY_ON_WRITE table reader/writer — timeline replay
without the hudi-spark bundle.

The third lakehouse format next to Delta (`sources/delta.py`) and
Iceberg (`sources/iceberg.py`); its on-disk contract is public
(hudi.apache.org/docs + the hudi spec pages).  A CoW table is:

- ``.hoodie/hoodie.properties`` — table name/type/version;
- the TIMELINE: ``.hoodie/<instant>.commit`` JSON files (completed
  commits; ``.inflight``/``.requested`` markers are in-progress and
  ignored), each carrying ``partitionToWriteStats`` — per partition,
  the base files written (``fileId``, ``path``, counts);
- ``.hoodie/<instant>.replacecommit`` — insert_overwrite /
  clustering: adds new base files AND lists
  ``partitionToReplaceFileIds`` whose file groups stop being live;
- data files ``<partition>/<fileId>_<writeToken>_<instant>.parquet``
  — a FILE GROUP is one ``fileId``; the snapshot reads, per live
  file group, the base file with the LATEST committed instant
  (copy-on-write: an update rewrites the whole group under a new
  instant).

Snapshot resolution is therefore a timeline fold: replay completed
instants in order, keep the newest base file per (partition, fileId),
drop groups a replacecommit replaced.  Time travel = stop the fold at
``as_of``.  MERGE_ON_READ tables (log files to merge) gate with a
clear error — never silently misread.

Scale posture: identical to the other two readers — the timeline is
driver-side KBs (exactly where hudi-spark plans), the data path is
ONE distributed Catalyst parquet scan over the live base files with
``basePath`` so hive-style partition directories reconstruct, keeping
pushdown/pruning.  Hudi's ``_hoodie_*`` meta columns are dropped by
default (pass ``drop_meta=False`` to keep them).

The writer mirrors ``write_iceberg``'s split: the DATA write is one
distributed Catalyst parquet job staged inside the table and promoted
by rename, each part file becoming its own new file group named
``<fileId>_<writeToken>_<instant>.parquet``; the driver then writes
the one commit JSON.  ``mode="overwrite"`` emits a REPLACECOMMIT that
replaces every previously-live file group — the insert_overwrite
verb.  Fixture instants are zero-padded counters (the format only
requires lexically-sortable instant strings; real tables use
``yyyyMMddHHmmssSSS``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "hudi_snapshot", "hudi_timeline", "merge_hudi", "read_hudi",
    "write_hudi",
]

_HOODIE = ".hoodie"


def _table_type(table: str) -> str:
    props = os.path.join(table, _HOODIE, "hoodie.properties")
    if not os.path.exists(props):
        raise ValueError(f"hudi: no {_HOODIE}/hoodie.properties in {table}")
    out = {}
    with open(props) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip()
    return out.get("hoodie.table.type", "COPY_ON_WRITE")


def hudi_timeline(table: str) -> list[tuple[str, str, dict]]:
    """Completed instants, oldest first: (instant, action, commit
    metadata).  ``.inflight``/``.requested`` markers are skipped —
    only completed commits are visible, which is Hudi's own snapshot
    isolation."""
    hdir = os.path.join(table, _HOODIE)
    if not os.path.isdir(hdir):
        raise ValueError(f"hudi: no {_HOODIE} directory in {table}")
    out = []
    for name in sorted(os.listdir(hdir)):
        for suffix, action in (
            (".replacecommit", "replacecommit"),
            (".commit", "commit"),
        ):
            if not name.endswith(suffix):
                continue
            instant = name[: -len(suffix)]
            if not instant or "." in instant:
                break  # .commit.requested / .inflight markers
            with open(os.path.join(hdir, name)) as fh:
                meta = json.load(fh)
            out.append((instant, action, meta))
            break
    return sorted(out, key=lambda t: t[0])


def hudi_snapshot(table: str, as_of: str | None = None) -> dict:
    """Timeline fold -> ``{"files": [abs paths], "instant": last}``:
    newest base file per live (partition, fileId) group at or before
    ``as_of``."""
    tt = _table_type(table)
    if tt != "COPY_ON_WRITE":
        raise ValueError(
            f"hudi: table type {tt} not supported (MERGE_ON_READ "
            "needs log-file merging)"
        )
    groups: dict[tuple[str, str], tuple[str, str]] = {}
    last = None
    for instant, action, meta in hudi_timeline(table):
        if as_of is not None and instant > str(as_of):
            break
        last = instant
        if action == "replacecommit":
            for part, fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    groups.pop((part, fid), None)
        for part, stats in (
            meta.get("partitionToWriteStats") or {}
        ).items():
            for st in stats:
                key = (part, st["fileId"])
                prev = groups.get(key)
                # CoW: the newest instant's base file wins the group
                if prev is None or instant >= prev[0]:
                    groups[key] = (instant, st["path"])
    if last is None:
        raise ValueError(
            f"hudi: no completed commits in {table}"
            + (f" at or before {as_of}" if as_of is not None else "")
        )
    base = os.path.abspath(table)
    return {
        "files": sorted(
            os.path.join(base, p) for _, p in groups.values()
        ),
        # abs path -> (partition, fileId): the live file-group map
        # merge_hudi uses to name what a replacecommit replaces
        "groups": {
            os.path.join(base, p): key
            for key, (_, p) in groups.items()
        },
        "instant": last,
    }


def read_hudi(
    spark: SparkSession, table: str, as_of: str | None = None,
    drop_meta: bool = True,
) -> DataFrame:
    """Hudi CoW snapshot -> DataFrame: one distributed parquet scan
    of the live base files (``basePath`` recovers hive-style
    partition columns; Catalyst keeps pushdown/pruning).  Time
    travel = ``as_of`` instant."""
    snap = hudi_snapshot(table, as_of)
    df = spark.read.option(
        "basePath", os.path.abspath(table)
    ).parquet(*snap["files"])
    if drop_meta:
        meta_cols = [c for c in df.columns if c.startswith("_hoodie_")]
        if meta_cols:
            df = df.drop(*meta_cols)
    return df


def _next_instant(table: str) -> str:
    try:
        tl = hudi_timeline(table)
    except ValueError:
        tl = []
    n = 1 + max((int(i) for i, _, _ in tl if i.isdigit()), default=0)
    return f"{n:014d}"


def write_hudi(
    df: DataFrame, table: str, mode: str = "append",
    partition_by: list[str] | None = None,
) -> str:
    """DataFrame -> one Hudi CoW commit; returns the instant.

    Data is one distributed staged parquet write promoted by rename
    (each part file = a fresh file group
    ``<fileId>_<writeToken>_<instant>.parquet`` under its hive
    partition dir); the driver writes hoodie.properties (first
    commit) + the commit JSON.  ``mode="overwrite"`` emits a
    REPLACECOMMIT whose ``partitionToReplaceFileIds`` covers every
    previously-live group (insert_overwrite) — old snapshots stay
    time-travelable."""
    import shutil
    import uuid as _uuid

    import pyarrow.parquet as pq

    if mode not in ("append", "overwrite"):
        raise ValueError(f"hudi: write mode {mode!r} (append/overwrite)")
    part_cols = list(partition_by or [])
    bad = [c for c in part_cols if c not in df.columns]
    if bad:
        raise ValueError(f"hudi: partition columns {bad} missing")
    hdir = os.path.join(table, _HOODIE)
    exists = os.path.exists(os.path.join(hdir, "hoodie.properties"))
    if not exists:
        os.makedirs(hdir, exist_ok=True)
        with open(os.path.join(hdir, "hoodie.properties"), "w") as fh:
            fh.write(
                "hoodie.table.name="
                + os.path.basename(table.rstrip("/"))
                + "\nhoodie.table.type=COPY_ON_WRITE\n"
                "hoodie.table.version=6\n"
                + (
                    "hoodie.table.partition.fields="
                    + ",".join(part_cols) + "\n"
                    if part_cols else ""
                )
            )
    replaced: dict[str, list[str]] = {}
    if mode == "overwrite" and exists:
        try:
            # live groups at head = what this commit replaces
            groups: dict[tuple[str, str], str] = {}
            for instant, action, meta in hudi_timeline(table):
                for part, fids in (
                    meta.get("partitionToReplaceFileIds") or {}
                ).items():
                    for fid in fids:
                        groups.pop((part, fid), None)
                for part, stats in (
                    meta.get("partitionToWriteStats") or {}
                ).items():
                    for st in stats:
                        groups[(part, st["fileId"])] = instant
            for part, fid in groups:
                replaced.setdefault(part, []).append(fid)
        except ValueError:
            pass
    instant = _next_instant(table)
    _stage_and_commit_hudi(
        df, table, instant, part_cols,
        replaced=replaced if mode == "overwrite" else None,
        operation=(
            "INSERT_OVERWRITE" if mode == "overwrite" else "UPSERT"
        ),
    )
    return instant


def _stage_and_commit_hudi(
    df: DataFrame, table: str, instant: str, part_cols: list[str],
    replaced: dict[str, list[str]] | None, operation: str,
) -> None:
    """One distributed staged parquet write promoted as fresh file
    groups + the timeline JSON (a ``.replacecommit`` when
    ``replaced`` names file groups this commit supersedes)."""
    import shutil
    import uuid as _uuid

    import pyarrow.parquet as pq

    hdir = os.path.join(table, _HOODIE)
    stage = os.path.join(table, f".stage-{_uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(stage)
    stats: dict[str, list[dict]] = {}
    try:
        for root, _dirs, names in os.walk(stage):
            rel_dir = os.path.relpath(root, stage)
            part = "" if rel_dir == "." else rel_dir.replace(os.sep, "/")
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                fid = str(_uuid.uuid4())
                fname = f"{fid}_0-0-0_{instant}.parquet"
                rel = fname if not part else f"{part}/{fname}"
                dst = os.path.join(table, *rel.split("/"))
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(root, name), dst)
                stats.setdefault(part, []).append({
                    "fileId": fid,
                    "path": rel,
                    "numWrites":
                        pq.ParquetFile(dst).metadata.num_rows,
                    "fileSizeInBytes": os.path.getsize(dst),
                })
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    meta = {
        "partitionToWriteStats": stats,
        "operationType": operation,
    }
    suffix = ".commit"
    if replaced is not None:
        meta["partitionToReplaceFileIds"] = replaced
        suffix = ".replacecommit"
    tmp = os.path.join(hdir, f".{instant}{suffix}.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(hdir, f"{instant}{suffix}"))


def merge_hudi(
    spark: SparkSession,
    source: DataFrame,
    table: str,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
    partition_by: list[str] | None = None,
) -> str:
    """Record-key UPSERT/DELETE — Hudi's defining verb, expressed as
    the same copy-on-write plan as ``merge_delta``/``merge_iceberg``:
    one broadcast LEFT-SEMI pass finds the FILE GROUPS holding a
    matched key (via ``_metadata.file_path``; the driver sees a file
    list, never rows), only those groups' survivors rewrite together
    with the source rows, and ONE ``.replacecommit`` supersedes the
    touched groups (``partitionToReplaceFileIds``) while adding the
    fresh ones — untouched groups carry forward unread, and the
    pre-merge snapshot stays time-travelable.  Returns the commit
    instant."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.sources.delta import decoded_file_path

    if when_matched not in ("update", "delete"):
        raise ValueError(f"hudi: when_matched {when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"hudi: when_not_matched {when_not_matched!r}")
    snap = hudi_snapshot(table)
    if partition_by is None:
        # the table records its partition fields (hoodie convention)
        props = os.path.join(table, _HOODIE, "hoodie.properties")
        fields = ""
        with open(props) as fh:
            for line in fh:
                if line.startswith("hoodie.table.partition.fields="):
                    fields = line.partition("=")[2].strip()
        partition_by = [f for f in fields.split(",") if f]
    part_cols = list(partition_by)
    base = os.path.abspath(table)
    data = spark.read.option("basePath", base).parquet(
        *snap["files"]
    ).withColumn("_hudi_file", decoded_file_path(F))
    table_cols = [
        c for c in data.columns
        if c != "_hudi_file" and not c.startswith("_hoodie_")
    ]
    missing = [k for k in on if k not in table_cols]
    if missing:
        raise ValueError(f"hudi: merge keys {missing} not in table")
    keys = source.select(*on).distinct()
    touched = [
        r["_hudi_file"]
        for r in data.join(F.broadcast(keys), on, "left_semi")
        .select("_hudi_file").distinct().collect()
    ]
    pieces: list[DataFrame] = []
    touched_rows = (
        data.filter(F.col("_hudi_file").isin(touched))
        if touched else None
    )
    if touched_rows is not None:
        pieces.append(
            touched_rows.join(F.broadcast(keys), on, "left_anti")
            .select(*table_cols)
        )
    if when_matched == "update" and when_not_matched == "insert":
        pieces.append(source.select(*table_cols))
    elif when_not_matched == "insert":
        ins = source
        if touched_rows is not None:
            matched_keys = touched_rows.select(*on).distinct()
            ins = ins.join(F.broadcast(matched_keys), on, "left_anti")
        pieces.append(ins.select(*table_cols))
    elif when_matched == "update":
        if touched_rows is not None:
            matched_keys = touched_rows.select(*on).distinct()
            pieces.append(
                source.join(F.broadcast(matched_keys), on, "left_semi")
                .select(*table_cols)
            )
    if not pieces and not touched:
        return snap["instant"]  # no-op merge
    replaced: dict[str, list[str]] = {}
    for p in touched:
        part, fid = snap["groups"][p]
        replaced.setdefault(part, []).append(fid)
    new_df = pieces[0] if pieces else None
    for p in pieces[1:]:
        new_df = new_df.unionByName(p)
    instant = _next_instant(table)
    if new_df is None:
        import json as _json

        hdir = os.path.join(table, _HOODIE)
        tmp = os.path.join(hdir, f".{instant}.replacecommit.tmp")
        with open(tmp, "w") as fh:
            _json.dump({
                "partitionToWriteStats": {},
                "partitionToReplaceFileIds": replaced,
                "operationType": "DELETE",
            }, fh)
        os.replace(
            tmp, os.path.join(hdir, f"{instant}.replacecommit")
        )
        return instant
    _stage_and_commit_hudi(
        new_df, table, instant, part_cols, replaced=replaced,
        operation="UPSERT",
    )
    return instant
