"""Distributed bucket-partitioned parquet layouts (the persisted-index form).

Both persisted indexes in the engine — the id-bucketed embedding self-join
layout (pipelines/dedup.py) and the hyperplane-LSH ANN index
(pipelines/similarity.py) — are built through here with the engine's own
distributed machinery: a Ray Data read -> ``map_batches`` bucket
assignment -> ``write_parquet(partition_cols=["bucket"])`` pass.  Nothing
reads the corpus on the driver; each write task ships only its own
blocks, so the build scales with the cluster like any other stage and the
layout lands directly in its hive-partitioned probe form
(``bucket=<v>/<task files>.parquet``).

Layout root: ``$ANOMRAY_INDEX_DIR`` (default the system temp dir).  On a
multi-node cluster point it at storage every node can reach (NFS mount /
object-store URI); the probe side hands the same paths to pyarrow / Ray
Data readers unchanged.

Cache keys include a content fingerprint of the source parquet (file
sizes + mtimes, stat-only), so regenerating an input table in place
invalidates the persisted layout instead of silently reusing stale data.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def index_base_dir() -> str:
    return os.environ.get("ANOMRAY_INDEX_DIR", tempfile.gettempdir())


def source_fingerprint(path: str) -> str:
    """Content fingerprint of a parquet file/dir: path + size + mtime_ns of
    every data file.  Stat-only — no data is read."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, n)
            for root, _, names in os.walk(path)
            for n in names
            if n.endswith(".parquet")
        )
    else:
        files = [path]
    h = hashlib.md5()
    for f in files:
        st = os.stat(f)
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def persist_bucketed(tag: str, source_path: str, params: str,
                     build: Callable[[str], None]) -> str:
    """Idempotent persisted layout: returns the layout dir, running
    ``build(tmp_dir)`` once if absent (atomic tmp+rename + ``_DONE``
    marker, same protocol as the S5 manifest sink).  The key is
    md5(source abspath : params : content fingerprint), so a changed
    source or parameter set rebuilds instead of reusing stale bytes."""
    key = hashlib.md5(
        f"{os.path.abspath(source_path)}:{params}:{source_fingerprint(source_path)}".encode()
    ).hexdigest()[:12]
    out = os.path.join(index_base_dir(), f"anomray_{tag}_{key}")
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build(tmp)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    if not os.path.exists(os.path.join(out, "_DONE")):
        try:
            os.replace(tmp, out)
        except OSError:  # concurrent builder won the rename race
            shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bucket_files(layout_dir: str, bucket: int) -> list[str]:
    """Data files of one bucket partition (empty list if the bucket has no
    rows — hive layouts only materialize non-empty partitions)."""
    bdir = os.path.join(layout_dir, f"bucket={bucket}")
    if not os.path.isdir(bdir):
        return []
    return sorted(
        os.path.join(bdir, n) for n in os.listdir(bdir) if n.endswith(".parquet")
    )
