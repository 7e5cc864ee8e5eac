"""Motif matching: GraphFrames-style pattern queries compiled to joins.

The reference's analytic surface is Cypher pattern matches
(``(repo:GitRepo)-[:DEPENDS_ON]->(m)``, documentation/queries.md
throughout). Instead of porting each query shape by hand, this module
gives the engine a small pattern language — the GraphFrames ``find``
motif grammar, extended with rel-type constraints — compiled directly
to Catalyst joins, so any fixed-shape pattern match is one declarative
call:

    find(g, "(a)-[e:DEPENDS_ON]->(b); (b)-[:DEPENDS_ON|DEV_DEPENDS_ON]->(c)")
    find(g, "(r)-[:DEPENDS_ON]->(m); !(m)-[:HOSTED_ON]->()")   # negation

Semantics:
- Each positive term is an equi-join against the edges table on the
  shared vertex variables (Catalyst picks broadcast vs sort-merge and
  reorders; nothing is hand-scheduled).
- ``!(...)`` terms are anti-joins on their bound variables — Cypher's
  ``WHERE NOT exists(...)``, set-at-a-time.
- Output is FLAT: ``<v>_id`` per named vertex, plus ``<e>_src /
  <e>_dst / <e>_rel_type / <e>_version`` per named edge — flat columns
  hash-compare cleanly against SQL oracles (structs would not).
- Variable-length paths are out of scope here by design: unbounded
  expansion is the iterative closure operator (graph/paths.py), not a
  join pattern.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from github_miner_spark.graph.model import PropertyGraph

_TERM_RE = re.compile(
    r"^\s*(?P<neg>!)?\s*\(\s*(?P<src>\w*)\s*\)\s*-\s*\[\s*(?P<edge>\w*)"
    r"(?:\s*:\s*(?P<rels>\w+(?:\s*\|\s*\w+)*))?\s*\]\s*->\s*\(\s*(?P<dst>\w*)\s*\)\s*$"
)


@dataclass(frozen=True)
class MotifTerm:
    negated: bool
    src: str  # "" = anonymous
    edge: str  # "" = anonymous
    rel_types: tuple[str, ...] | None
    dst: str


def parse_motif(pattern: str) -> list[MotifTerm]:
    terms = []
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        rels = m.group("rels")
        term = MotifTerm(
            negated=bool(m.group("neg")),
            src=m.group("src"),
            edge=m.group("edge"),
            rel_types=tuple(r.strip() for r in rels.split("|")) if rels else None,
            dst=m.group("dst"),
        )
        if term.negated and term.edge:
            raise ValueError(f"negated term cannot bind an edge variable: {raw!r}")
        if not term.src and not term.dst:
            raise ValueError(f"term needs at least one named vertex: {raw!r}")
        terms.append(term)
    if not terms or all(t.negated for t in terms):
        raise ValueError("pattern needs at least one positive term")
    return terms


def _term_frame(edges: DataFrame, term: MotifTerm) -> DataFrame:
    e = edges
    if term.rel_types:
        e = e.filter(F.col("rel_type").isin(*term.rel_types))
    cols = []
    if term.src:
        cols.append(F.col("src").alias(f"{term.src}_id"))
    if term.dst:
        cols.append(F.col("dst").alias(f"{term.dst}_id"))
    if term.edge:
        cols += [
            F.col("src").alias(f"{term.edge}_src"),
            F.col("dst").alias(f"{term.edge}_dst"),
            F.col("rel_type").alias(f"{term.edge}_rel_type"),
            F.col("version").alias(f"{term.edge}_version"),
        ]
    return e.select(*cols)


def find(graph: PropertyGraph, pattern: str) -> DataFrame:
    """Match ``pattern`` against the property graph; one row per
    binding of the named variables (path multiplicity preserved, as in
    Cypher/GraphFrames)."""
    terms = parse_motif(pattern)
    edges = graph.edges
    bound: DataFrame | None = None
    for term in (t for t in terms if not t.negated):
        t = _term_frame(edges, term)
        if bound is None:
            bound = t
        else:
            shared = [c for c in t.columns if c in bound.columns]
            bound = bound.join(t, shared) if shared else bound.crossJoin(t)
    assert bound is not None
    for term in (t for t in terms if t.negated):
        t = _term_frame(edges, term)
        shared = [c for c in t.columns if c in bound.columns]
        if not shared:
            raise ValueError(
                f"negated term binds no variable from the positive pattern: {term}"
            )
        bound = bound.join(t.select(*shared).distinct(), shared, "left_anti")
    return bound
