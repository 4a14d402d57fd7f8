"""Snapshot manifest: atomic commits over immutable generation directories.

The reference gets transactional visibility from SQLite WAL (reference
src/rifflux/db/sqlite_store.py:17-20 — readers never see a half-written
index); SURVEY.md maps that to Iceberg snapshot isolation on a cluster.
This module is the parquet-seam shape of that commit protocol:

- every mutation writes NEW files under a fresh generation directory
  (``<table>/g-<hex>/``) — existing files are never modified or deleted
  by a commit;
- the index's current state is a single small JSON pointer file
  (``_manifest.json``) mapping each table to the generation dirs (or,
  for bucket-partitioned tables, the per-partition leaf dirs) that
  compose it;
- publishing is one atomic swap of that pointer (`os.replace`; on an
  object store this becomes a conditional PUT / CAS of the same pointer
  object — exactly an Iceberg snapshot commit, so the Iceberg writer is
  a drop-in at this seam; the equivalence is PINNED, not asserted:
  tests/test_manifest_commits.py::
  test_manifest_history_replays_as_iceberg_snapshot_log replays the
  on-disk snapshot log across append / overwrite / partition-overwrite /
  gc and checks each Iceberg semantic);
- readers resolve the pointer once and then read immutable files: a
  reader racing a commit sees either the old snapshot or the new one,
  never a mix — no rename windows, no half-swapped tables;
- a multi-table mutation (incremental apply: chunks + postings +
  tombstones + stats + catalog) stages all its generation dirs first and
  publishes ONE pointer swap, so the whole apply is atomic: a killed
  apply leaves only unreferenced generation dirs (invisible to readers,
  reclaimed by :meth:`IndexStore.gc`), and re-running it is idempotent;
- old generations are garbage-collected LATER (:meth:`IndexStore.gc`),
  never inline with a commit, so in-flight readers of the previous
  snapshot keep valid files (snapshot-retention semantics).

Table entry shapes::

    {"dirs": ["chunks/g-ab12...", "chunks/g-cd34..."]}          # union
    {"partition_col": "term_bucket",
     "partitions": {"3": ["postings/g-ab12/term_bucket=3"]}}    # per-bucket

Entries are kept (possibly empty) once a table is manifest-tracked; an
absent entry means the table pre-dates the manifest and is resolved from
the legacy flat layout (migration path for round-2 indexes).
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import uuid
from pathlib import Path

try:  # POSIX; absent on Windows — commit falls back to in-process locking
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]

MANIFEST_NAME = "_manifest.json"
HISTORY_DIR = "_manifests"
LOCK_NAME = "_manifest.lock"


# One commit lock per store root (realpath), process-wide: two
# IndexStore instances over the same root must serialize their
# load→mutate→replace cycles or a concurrent commit's mutation is lost.
# CROSS-process safety comes from the fcntl.flock on the root's lockfile
# held around the whole load→mutate→replace cycle (os.replace alone only
# prevents torn reads — two unsynchronized committers would silently
# drop one side's table mutations and reuse a version number). On an
# object store this whole cycle becomes a conditional PUT / CAS of the
# pointer object, which subsumes both locks.
_ROOT_LOCKS: dict[str, threading.Lock] = {}
_ROOT_LOCKS_GUARD = threading.Lock()


def _root_lock(root: Path) -> threading.Lock:
    # absolute(), not resolve(): the root may not exist yet, and the key
    # must be identical before and after it is created
    key = str(root.absolute())
    with _ROOT_LOCKS_GUARD:
        return _ROOT_LOCKS.setdefault(key, threading.Lock())


class Manifest:
    """Atomic pointer file over a store root. Thread-safe in-process
    (per-root lock shared across Manifest instances); committers re-read
    state under the lock before publishing."""

    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self._lock = _root_lock(self.root)

    @property
    def file(self) -> Path:
        return self.root / MANIFEST_NAME

    def exists(self) -> bool:
        return self.file.exists()

    def load(self) -> dict:
        if not self.file.exists():
            return {"version": 0, "tables": {}}
        return json.loads(self.file.read_text(encoding="utf-8"))

    def version(self) -> int:
        return int(self.load().get("version", 0))

    def entry(self, name: str) -> dict | None:
        return self.load()["tables"].get(name)

    def commit(self, mutations: dict[str, dict]) -> dict:
        """Publish a new snapshot applying ``mutations`` (table → entry).
        Empty entries are KEPT (an explicitly-empty table must not fall
        back to the legacy layout). Returns the new state."""
        return self.commit_with(lambda _state: mutations)

    def commit_with(self, fn) -> dict:
        """Like :meth:`commit`, but ``fn(state) -> mutations`` runs INSIDE
        the critical section, seeing the state it will mutate — the CAS
        shape a read-modify-write commit (e.g. a dynamic partition merge)
        needs so two threads or processes committing disjoint partitions
        of the same table never lose each other's update."""
        with self._lock, self._flock():
            state = self.load()
            tables = dict(state.get("tables", {}))
            tables.update(fn(state))
            out = {"version": int(state.get("version", 0)) + 1, "tables": tables}
            payload = json.dumps(out, sort_keys=True)
            tmp = self.root / f"{MANIFEST_NAME}.tmp-{uuid.uuid4().hex}"
            tmp.write_text(payload, encoding="utf-8")
            os.replace(tmp, self.file)
            # history copy: debuggability + the raw material for snapshot
            # time-travel; gc() trims old versions. Same tmp+replace
            # discipline as the pointer: a crash mid-write must not leave
            # a truncated version file that poisons every later
            # load_version / mirror replay of this version
            hist = self.root / HISTORY_DIR
            hist.mkdir(exist_ok=True)
            htmp = hist / f".v{out['version']:08d}.tmp-{uuid.uuid4().hex}"
            htmp.write_text(payload, encoding="utf-8")
            os.replace(htmp, hist / f"v{out['version']:08d}.json")
            return out

    @contextlib.contextmanager
    def _flock(self):
        """Advisory cross-PROCESS lock on the root's lockfile, held for
        the whole load→mutate→replace cycle (a second driver process —
        e.g. a maintenance script racing a streaming apply — blocks here
        instead of silently losing a commit)."""
        self.root.mkdir(parents=True, exist_ok=True)
        if fcntl is None:  # pragma: no cover
            yield
            return
        fd = os.open(self.root / LOCK_NAME, os.O_RDWR | os.O_CREAT, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def load_version(self, version: int) -> dict:
        """Load a PAST snapshot from the history dir (time travel — the
        Iceberg snapshot-id read). Raises FileNotFoundError if that
        version's history file was gc'd."""
        f = self.root / HISTORY_DIR / f"v{int(version):08d}.json"
        if not f.exists():
            raise FileNotFoundError(
                f"snapshot v{version} not found (gc'd or never committed) at {f}"
            )
        return json.loads(f.read_text(encoding="utf-8"))

    def referenced_dirs(self) -> set[str]:
        """Every store-relative data dir the CURRENT snapshot references."""
        out: set[str] = set()
        for entry in self.load()["tables"].values():
            out.update(entry.get("dirs", []))
            for dirs in entry.get("partitions", {}).values():
                out.update(dirs)
        return out
