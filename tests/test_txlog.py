"""plans/txlog.py unit contract — the minimal commit manifest under
the index lifecycle: atomic publish, add/remove semantics, batch-id
idempotence keys, reset-with-carryover, vacuum."""

from __future__ import annotations

import json
import os

from project_clinical_data_etl_pipeline_spark.plans import txlog


def _touch(root, rel):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as fh:
        fh.write("x")


def test_empty_manifest_state(tmp_path):
    state = txlog.read_manifest(str(tmp_path))
    assert state == {"version": -1, "files": [], "batch_ids": []}
    assert txlog.committed_files(str(tmp_path)) == []


def test_commit_versions_add_remove(tmp_path):
    root = str(tmp_path)
    s1 = txlog.commit(root, add_files=["cell=0/a", "cell=1/b"])
    assert s1["version"] == 0 and s1["files"] == ["cell=0/a", "cell=1/b"]
    s2 = txlog.commit(root, add_files=["cell=0/c"], remove_files=["cell=0/a"])
    assert s2["version"] == 1 and s2["files"] == ["cell=0/c", "cell=1/b"]
    # idempotent re-add doesn't duplicate
    s3 = txlog.commit(root, add_files=["cell=0/c"])
    assert s3["files"] == s2["files"]


def test_batch_ids_publish_with_files(tmp_path):
    root = str(tmp_path)
    txlog.commit(root, add_files=["f1"], batch_id=7)
    assert txlog.has_batch(root, 7) and not txlog.has_batch(root, 8)
    # reset clears ids unless carried over explicitly
    txlog.commit(root, add_files=["f2"], reset=True)
    assert not txlog.has_batch(root, 7)
    txlog.commit(root, batch_ids=[7, 9])
    assert txlog.has_batch(root, 7) and txlog.has_batch(root, 9)


def test_commit_is_atomic_rename(tmp_path):
    """No torn manifests: the published file is always complete JSON
    (written to .tmp then os.replace'd)."""
    root = str(tmp_path)
    txlog.commit(root, add_files=["f1"])
    with open(os.path.join(root, "_commits.json")) as fh:
        json.load(fh)  # parses — never half-written
    assert not os.path.exists(os.path.join(root, "_commits.json.tmp"))


def test_vacuum_removes_only_unreferenced(tmp_path):
    root = str(tmp_path)
    _touch(root, "cell=0/part-keep.parquet")
    _touch(root, "cell=0/part-orphan.parquet")
    txlog.commit(root, add_files=["cell=0/part-keep.parquet"])
    removed = txlog.vacuum(root)
    assert removed == ["cell=0/part-orphan.parquet"]
    assert os.path.exists(os.path.join(root, "cell=0/part-keep.parquet"))


def test_list_data_files_skips_non_part(tmp_path):
    root = str(tmp_path)
    _touch(root, "cell=0/part-a.parquet")
    _touch(root, "cell=0/part-a.parquet.crc")
    assert txlog.list_data_files(root) == ["cell=0/part-a.parquet"]
