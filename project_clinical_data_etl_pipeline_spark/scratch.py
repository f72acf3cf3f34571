"""Session-scoped scratch directories for queries that round-trip
through real files (serde write→read, incremental-stream corpora).

Cleanup is registered with ``atexit`` rather than done eagerly: the
DataFrames these queries return read the scratch paths LAZILY, so the
directory must outlive the caller's collect — but must not outlive the
process (grading/bench/pytest invocations were accumulating
``etl_serde_*`` / ``spark_graft_incdedup_*`` junk in /tmp before this
existed).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


def scratch_dir(prefix: str) -> str:
    """A fresh temp directory removed automatically at interpreter
    exit. Use for any query-internal write→read round-trip."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
