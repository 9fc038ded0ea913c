"""Manifest-committed JSONL sink — a Spark 4 Python DataSource WRITER,
completing the DataSource surface next to the distributed reader
(sources/weather_datasource.py).

The reference lands raw payloads as individual object-store keys with no
commit protocol (README.md raw-zone sink): a consumer listing the bucket
mid-batch sees a torn write. This sink adds the minimal atomic-commit
layer every table format builds on:

- executors write task files with UNIQUE names (no renames, safe on
  object stores where rename is copy+delete) and return a commit message
  (file, row count, byte count) per task;
- `commit(messages)` runs on the DRIVER only after every task succeeded
  and writes `_MANIFEST.json` listing exactly the committed files —
  the manifest IS the table state;
- `abort(messages)` deletes whatever partial task files reported in;
- readers go through `read_manifest_jsonl`, which reads ONLY files named
  by the manifest — orphans from failed/aborted/concurrent jobs are
  invisible. Appends replace the manifest last, so a reader sees either
  the old or the new file list, never a mix.

This is the same files+manifest contract Iceberg/Delta formalize,
expressed in ~100 lines on plain storage. At 100 TB the manifest stays
tiny (one entry per task file) and the commit is one driver-side write.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

try:
    from pyspark.sql.datasource import (DataSource, DataSourceWriter,
                                        WriterCommitMessage)
    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    @dataclass
    class WriterCommitMessage:  # type: ignore[no-redef]
        pass


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int
    n_bytes: int


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl requires a path "
                             "(df.write.format('manifest_jsonl').save(path))")
        self.overwrite = overwrite

    # executor side — one call per task
    def write(self, iterator) -> _FileCommit:
        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, name)
        n = 0
        with open(full, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(recursive=True), default=str,
                                   ensure_ascii=False) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n,
                           n_bytes=os.path.getsize(full))

    # driver side — only after all tasks succeeded
    def commit(self, messages) -> None:
        files = [{"file": m.filename, "rows": m.n_rows, "bytes": m.n_bytes}
                 for m in messages if m is not None and m.n_rows > 0]
        # drop empty task files eagerly — they carry no data
        for m in messages:
            if m is not None and m.n_rows == 0:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                files = json.load(f)["files"] + files
        tmp = manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"files": files,
                       "total_rows": sum(e["rows"] for e in files)}, f)
        os.replace(tmp, manifest_path)  # atomic: old list or new, never mix

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class ManifestJsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema, overwrite: bool):
        return ManifestJsonlWriter(dict(self.options), overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return ManifestJsonlStreamWriter(dict(self.options))


def read_manifest_jsonl(spark: SparkSession, path: str,
                        schema: str | None = None) -> DataFrame:
    """Read ONLY the manifest-listed files: orphan part files from failed
    or in-flight jobs are invisible, which is the whole point."""
    with open(os.path.join(path, "_MANIFEST.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    files = [os.path.join(path, e["file"]) for e in manifest["files"]]
    if not files:
        raise ValueError(f"empty manifest at {path}")
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(files)


try:
    from pyspark.sql.datasource import DataSourceStreamWriter
    HAS_STREAM_WRITER_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    HAS_STREAM_WRITER_API = False

    class DataSourceStreamWriter:  # type: ignore[no-redef]
        pass


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch writer: per micro-batch, executors
    write unique task files and the driver appends a batch entry to the
    manifest in commit(messages, batchId). Exactly-once composes from two
    pieces: the engine replays a failed batch (abort() removed its
    partial files, so no orphans poison the dir), and the manifest append
    is IDEMPOTENT per batchId — a replayed commit of an already-recorded
    batch replaces that batch's entry instead of double-counting it (the
    same sink-side dedup contract foreachBatch sinks implement by key)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_jsonl stream sink requires a path")

    def write(self, iterator) -> _FileCommit:
        return ManifestJsonlWriter({"path": self.path}, False).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        files = [{"file": m.filename, "rows": m.n_rows, "bytes": m.n_bytes}
                 for m in messages if m is not None and m.n_rows > 0]
        for m in messages:  # zero-row task files carry nothing — remove
            if m is not None and m.n_rows == 0:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        state = {"batches": {}}
        if os.path.exists(manifest_path):
            with open(manifest_path, encoding="utf-8") as f:
                state = json.load(f)
                state.setdefault("batches", {})
        prev = state["batches"].get(str(batchId))
        if prev:  # replayed batch: drop the superseded files, keep newest
            for e in prev:
                try:
                    os.remove(os.path.join(self.path, e["file"]))
                except OSError:
                    pass
        state["batches"][str(batchId)] = files
        flat = [e for entries in state["batches"].values() for e in entries]
        state["files"] = flat
        state["total_rows"] = sum(e["rows"] for e in flat)
        tmp = manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(state, f)
        os.replace(tmp, manifest_path)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def vacuum_manifest_dir(path: str) -> list[str]:
    """Delete part files NOT referenced by the manifest — the VACUUM
    complement to manifest isolation: orphans from crashed jobs are
    already invisible to readers, this reclaims their storage. Safe by
    construction: the manifest is the table state, so anything outside it
    is garbage by definition (a concurrent in-flight job's files are
    protected only once committed — run vacuum in a maintenance window,
    exactly like table-format VACUUM retention rules). Returns the
    deleted file names."""
    manifest_path = os.path.join(path, "_MANIFEST.json")
    with open(manifest_path, encoding="utf-8") as f:
        live = {e["file"] for e in json.load(f)["files"]}
    deleted = []
    for name in os.listdir(path):
        if (name.startswith("part-") and name.endswith(".jsonl")
                and name not in live):
            os.remove(os.path.join(path, name))
            deleted.append(name)
    return sorted(deleted)
