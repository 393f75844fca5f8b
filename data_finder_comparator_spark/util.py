"""Small shared utilities."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile


def fresh_run_dir(kind: str, key: str) -> str:
    """Deterministic per-(process, key) scratch directory, cleared on
    reuse. Used by queries whose returned DataFrame lazily scans files
    they write at build time: the path cannot be deleted at return, so
    each RE-RUN of the same parameterization clears and reuses one
    directory — bounding disk use across long sessions — while the pid
    component keeps concurrent processes (driver loop + bench) from
    invalidating each other's pending scans.

    Deletion failures raise (never ignore_errors): a surviving stale
    directory would silently feed old data — or an old streaming
    checkpoint — to the new run.
    """
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"{kind}_{os.getpid()}_{tag}")
    if os.path.exists(d):
        shutil.rmtree(d)
    if os.path.exists(d):
        raise IOError(f"stale run dir {d} could not be removed")
    return d
