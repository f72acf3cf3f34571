"""scratch.scratch_dir: created now, removed at interpreter exit."""

from __future__ import annotations

import os
import subprocess
import sys

from project_clinical_data_etl_pipeline_spark.scratch import scratch_dir


def test_scratch_dir_exists_and_is_writable():
    d = scratch_dir("scratch_unit_")
    assert os.path.isdir(d)
    with open(os.path.join(d, "probe"), "w") as f:
        f.write("x")


def test_scratch_dir_removed_at_process_exit(tmp_path):
    """Run a child interpreter that makes a scratch dir and prints its
    path; after the child exits the dir must be gone."""
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from project_clinical_data_etl_pipeline_spark.scratch import scratch_dir\n"
        "print(scratch_dir('scratch_exit_'))\n"
    ).format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    path = out.stdout.strip()
    assert path.startswith("/") and "scratch_exit_" in path
    assert not os.path.exists(path)
