"""Race-free, staleness-free scratch materialization.

Several queries exercise alternate physical layouts (JSON-lines / CSV
sources, Hive-partitioned directories) derived from the read-only parquet
fixtures.  They materialize the derived layout once per scale factor and
reuse it.  Two hazards with a naive "write if no _SUCCESS" check:

- **Races**: two concurrent sessions (driver harness + pytest) can both
  see the marker missing and write into the same directory, one reading
  the other's half-written files.
- **Staleness**: if the fixtures are regenerated in place, a marker from
  the previous generation silently serves old data.

Both are fixed the standard way distributed writers commit output: write
to a unique staging directory, then atomically ``rename`` into the final
path (POSIX rename is atomic; the loser of a race just discards its
staging copy), and key the final path by a **fingerprint of the source
fixture files** (paths + sizes + mtimes) so regenerated fixtures get a
fresh scratch directory.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable


def fixture_fingerprint(sf_dir: str) -> str:
    """Cheap content-version fingerprint of a fixture directory: hash of
    every parquet file's relative path, size, and mtime.  Regenerating
    fixtures changes mtimes, which changes the fingerprint."""
    h = hashlib.sha256()
    for p in sorted(glob.glob(os.path.join(sf_dir, "**", "*.parquet"), recursive=True)):
        st = os.stat(p)
        h.update(f"{os.path.relpath(p, sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]


def materialize_once(sf_dir: str, kind: str, write_fn: Callable[[str], None]) -> str:
    """Return a scratch directory holding ``write_fn``'s output for
    (``sf_dir``, ``kind``), writing it at most once per fixture version.

    ``write_fn(path)`` must produce a Spark-style output directory
    (with a ``_SUCCESS`` marker) at ``path``.
    """
    tag = sf_dir.rstrip("/").replace("/", "_")
    final = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{kind}{tag}_{fixture_fingerprint(sf_dir)}",
    )
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    staging = f"{final}.staging-{uuid.uuid4().hex}"
    write_fn(staging)
    try:
        os.rename(staging, final)
    except OSError:
        # Lost the race: another writer committed first; serve theirs.
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(os.path.join(final, "_SUCCESS")):
            raise
    return final
