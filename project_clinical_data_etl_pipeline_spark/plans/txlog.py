"""Minimal atomic commit manifest for multi-file parquet targets — the
local stand-in for a Delta/Iceberg transaction log, closing the
crash windows the round-11 lifecycle documented as open (ann_index:
"the data-then-meta write order means a crash between the two can
still double-append on replay").

Model: a target directory owns a ``_commits.json`` manifest listing
the data files that EXIST (relative paths) and the stream batch ids
already applied. Readers load only manifest-listed files; writers
land new files first (crash ⇒ orphans that no reader sees), then
publish them with ONE atomic manifest replace (``os.replace`` — POSIX
rename atomicity) that carries the file list AND the batch id in the
same commit. Idempotence and visibility therefore switch together:
either a batch's files are visible and its id is recorded, or neither.

Deliberate simplifications vs a real table format, stated:
- the manifest is rewritten whole per commit (fine at ≤ thousands of
  files; a real log appends segments + checkpoints);
- single writer assumed (no optimistic concurrency / CAS);
- ``vacuum`` deletes unreferenced data files — run it OUTSIDE any
  reader's lifetime, as with Delta's VACUUM retention caveat.
"""

from __future__ import annotations

import glob
import json
import os

_MANIFEST = "_commits.json"


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def read_manifest(root: str) -> dict:
    """Current committed state: ``{"version", "files", "batch_ids"}``.
    A missing manifest is version -1 with nothing visible."""
    try:
        with open(_manifest_path(root)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"version": -1, "files": [], "batch_ids": []}


def commit(
    root: str,
    add_files: list[str] = (),
    remove_files: list[str] = (),
    batch_id: int | None = None,
    batch_ids: list[int] = (),
    reset: bool = False,
) -> dict:
    """Publish a new version: files in ``add_files`` become visible,
    ``remove_files`` stop being visible, ``batch_id`` /``batch_ids``
    (if given) are recorded — all in ONE atomic rename. ``reset=True``
    starts the file list from empty (a full rebuild replacing every
    prior file) while still bumping the version and, unless new ids
    are passed, CLEARING the batch history too — rebuilds that must
    keep replay protection pass the old ids via ``batch_ids``.
    Returns the new state. Paths are relative to ``root``."""
    state = read_manifest(root)
    prev_files = [] if reset else state["files"]
    prev_ids = set() if reset else set(state["batch_ids"])
    files = [f for f in prev_files if f not in set(remove_files)]
    files += [f for f in add_files if f not in set(files)]
    ids = prev_ids | set(batch_ids)
    if batch_id is not None:
        ids.add(batch_id)
    new = {
        "version": state["version"] + 1,
        "files": sorted(files),
        "batch_ids": sorted(ids)[-1000:],
    }
    os.makedirs(root, exist_ok=True)
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(new, fh)
    os.replace(tmp, _manifest_path(root))  # the atomic publish
    return new


def has_batch(root: str, batch_id: int) -> bool:
    return batch_id in read_manifest(root)["batch_ids"]


def committed_files(root: str) -> list[str]:
    """Absolute paths of the currently visible data files."""
    return [os.path.join(root, f) for f in read_manifest(root)["files"]]


def list_data_files(root: str, pattern: str = "**/part-*") -> list[str]:
    """Every physical data file under ``root`` (committed or orphan),
    relative paths."""
    out = []
    for f in glob.glob(os.path.join(root, pattern), recursive=True):
        if os.path.isfile(f) and not f.endswith(".crc"):
            out.append(os.path.relpath(f, root))
    return sorted(out)


def vacuum(root: str) -> list[str]:
    """Delete physical data files not referenced by the manifest — the
    leftovers of crashed (uncommitted) writes and of compactions'
    superseded inputs. Returns the removed relative paths."""
    visible = set(read_manifest(root)["files"])
    removed = []
    for rel in list_data_files(root):
        if rel not in visible:
            os.remove(os.path.join(root, rel))
            removed.append(rel)
    return removed
