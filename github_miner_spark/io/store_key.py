"""Shared content-address for the materialized stores.

Six stores (graph, text/shingle, IVF, PQ, int8, walks) key their
on-disk materialization by the identity of the source files they
derive from. One helper owns the byte format so the copies can never
drift apart — the walk store in particular derives FROM the graph
store, so the two must invalidate on the same base-table identities
(round-8 review finding: a 6th hand-rolled copy of the stat-hash
loop)."""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterable


def content_key(
    sf_dir: str,
    files: Iterable[tuple[str, str]],
    extra: Iterable[str] = (),
) -> str:
    """16-hex content address: abs source path + extra version tokens
    + (tag, size, mtime_ns) per source file — `tag:missing` when a
    file is absent, so a regenerated or partial source dir never
    serves a stale store. ``files`` is (tag, filename) pairs; the tag
    keeps distinct stores over the same file distinguishable (e.g.
    the PQ store tags embeddings.parquet as 'embeddings-pq')."""
    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for tok in extra:
        h.update(str(tok).encode())
    for tag, name in files:
        p = os.path.join(sf_dir, name)
        try:
            st = os.stat(p)
            h.update(f"{tag}:{st.st_size}:{st.st_mtime_ns}".encode())
        except FileNotFoundError:
            h.update(f"{tag}:missing".encode())
    return h.hexdigest()[:16]


# The base tables the module graph (and everything derived from it,
# e.g. the walk corpus) is built from — graph/store.py and
# functions/walk_store.py MUST share this list.
GRAPH_BASE_TABLES = (
    "customer.parquet",
    "orders.parquet",
    "part.parquet",
    "lineitem.parquet",
)
