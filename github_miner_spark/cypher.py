"""cypher_lite: a Cypher front-end for the subset the reference's users
actually write (documentation/queries.md), compiled onto the motif/join
engine.

The reference's entire analytic surface is Cypher typed into the Neo4j
browser (SURVEY.md §3 E4). ``run_cypher(graph, query)`` lets those
queries run verbatim on this engine for the fixed-shape subset:

    MATCH (r:GitRepo)-[:DEPENDS_ON]->(m:NodeModule)
    WHERE r.id = 421
    RETURN m.name AS module_name
    ORDER BY module_name LIMIT 10

Supported: comma-separated MATCH path patterns (chained hops expand to
multiple motif terms), node labels and ``{prop: literal}`` maps, edge
rel-type alternation ``[:A|B]``, WHERE with AND-ed comparisons over
``var.prop`` / ``id(var)`` plus ``NOT (pattern)`` existence negation,
RETURN with aliases, DISTINCT, and the aggregates the reference uses
(count(*), count(x), count(DISTINCT x), sum/min/max/avg, collect),
ORDER BY and LIMIT.

Out of scope by design (each has a dedicated engine operator):
variable-length paths ``[*..]`` -> graph/paths.py closure + BFS;
shortestPath/allShortestPaths -> all_shortest_paths_multi; graph-algo
procedure calls (algo.pageRank etc.) -> graph/algorithms.py. Requests
for those raise with a pointer, they do not silently misparse.

Everything compiles to the same Catalyst plans the hand-written queries
use: motif terms become equi-joins, vertex property access becomes a
broadcast join against the vertices table, aggregation is a plain
groupBy — no interpretation happens per row.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from github_miner_spark.graph.model import PropertyGraph
from github_miner_spark.graph.motif import find

_UNSUPPORTED = {
    "shortestpath": "shortest paths: use graph.paths.all_shortest_paths_multi",
    "algo.": "graph-algorithm procedures: use graph.algorithms",
    "apoc.": "apoc procedures: see io.sinks (gephi) / graph.store",
    "optional match": "OPTIONAL MATCH: use DataFrame left joins directly",
}
# a star inside a relationship bracket = variable-length pattern
_VARLEN_RE = re.compile(r"\[[^\]]*\*")

_NODE_RE = re.compile(r"\(\s*(?P<var>\w*)\s*(?::\s*(?P<label>\w+))?\s*(?P<props>\{[^}]*\})?\s*\)")
_EDGE_RE = re.compile(r"^-\s*\[\s*(?P<var>\w*)\s*(?::\s*(?P<rels>\w+(?:\s*\|\s*\w+)*))?\s*\]\s*->")
_LIT_RE = re.compile(r"^(?:'(?P<str>[^']*)'|(?P<num>-?\d+(?:\.\d+)?))$")


@dataclass
class _Pattern:
    terms: list[str] = field(default_factory=list)  # motif term strings
    labels: dict[str, str] = field(default_factory=dict)  # var -> label
    prop_eq: list[tuple[str, str, object]] = field(default_factory=list)  # var, prop, lit
    edge_vars: set[str] = field(default_factory=set)  # named [e:..] variables
    bare_vars: list[str] = field(default_factory=list)  # edge-less MATCH (n) paths


def _literal(tok: str):
    m = _LIT_RE.match(tok.strip())
    if not m:
        raise ValueError(f"unsupported literal: {tok!r}")
    if m.group("str") is not None:
        return m.group("str")
    n = m.group("num")
    return float(n) if "." in n else int(n)


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on ``sep`` outside quotes/braces/brackets."""
    parts, depth, quote, cur = [], 0, False, []
    i = 0
    while i < len(text):
        ch = text[i]
        if quote:
            cur.append(ch)
            if ch == "'":
                quote = False
        elif ch == "'":
            quote = True
            cur.append(ch)
        elif ch in "{[(":
            depth += 1
            cur.append(ch)
        elif ch in "}])":
            depth -= 1
            cur.append(ch)
        elif depth == 0 and text[i : i + len(sep)].upper() == sep.upper():
            parts.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_path(path: str, pat: _Pattern, anon: list[int], negated: bool = False) -> None:
    """Parse one path pattern like (a:L)-[:R]->(b)-[e:R2]->(c {x: 1})
    into chained motif terms, collecting label/prop constraints."""
    rest = path.strip()
    m = _NODE_RE.match(rest)
    if not m:
        raise ValueError(f"expected node pattern at: {rest!r}")

    def node_var(nm: re.Match) -> str:
        var = nm.group("var")
        if not var:
            anon[0] += 1
            var = f"_anon{anon[0]}"
        if nm.group("label"):
            pat.labels[var] = nm.group("label")
        if nm.group("props"):
            body = nm.group("props")[1:-1]
            for kv in _split_top_level(body, ","):
                k, _, v = kv.partition(":")
                if not _:
                    raise ValueError(f"bad property map entry: {kv!r}")
                pat.prop_eq.append((var, k.strip(), _literal(v)))
        return var

    prev = node_var(m)
    rest = rest[m.end() :].strip()
    if not rest and not negated:
        # edge-less path: MATCH (n:Label) — a labeled vertex scan; two
        # such paths give Cypher's cartesian match (reference
        # documentation/queries.md:194, the link-prediction setup)
        pat.bare_vars.append(prev)
        return
    while rest:
        em = _EDGE_RE.match(rest)
        if not em:
            raise ValueError(f"expected -[..]-> at: {rest!r}")
        evar, rels = em.group("var"), em.group("rels")
        if evar and not negated:
            pat.edge_vars.add(evar)
        rest = rest[em.end() :].strip()
        nm = _NODE_RE.match(rest)
        if not nm:
            raise ValueError(f"expected node pattern at: {rest!r}")
        nxt = node_var(nm)
        rest = rest[nm.end() :].strip()
        # same-var loops ((a)-[:R]->(a)) need distinct motif vars; the
        # equality is enforced with a filter by the caller
        rel = f":{rels.replace(' ', '')}" if rels else ""
        neg = "!" if negated else ""
        if negated:
            pat.terms.append(f"{neg}({prev})-[{rel}]->({nxt if nxt != prev else ''})")
        else:
            pat.terms.append(f"({prev})-[{evar}{rel}]->({nxt})")
        prev = nxt


_AGG_RE = re.compile(
    r"^(?P<fn>count|sum|min|max|avg|collect)\s*\(\s*(?P<distinct>DISTINCT\s+)?(?P<arg>\*|[\w.()]+)\s*\)$",
    re.IGNORECASE,
)
# RETURN EXISTS((a)-[:R]-(b)) — single hop, '-' = undirected, '->' directed
_EXISTS_RE = re.compile(r"^EXISTS\s*\(\s*(?P<pat>\(.+\))\s*\)$", re.IGNORECASE)
_EX_HOP_RE = re.compile(
    r"^\(\s*(?P<x>\w+)\s*\)\s*-\s*\[\s*:?\s*(?P<rels>\w+(?:\s*\|\s*\w+)*)?\s*\]\s*"
    r"(?P<arrow>->|-)\s*\(\s*(?P<y>\w+)\s*\)$"
)


def _col_ref(expr: str, pat: _Pattern, needed_props: set[tuple[str, str]]) -> tuple[Column, str]:
    """Resolve ``var.prop`` / ``id(var)`` / ``var`` to a column and a
    default alias; records vertex props that must be joined in."""
    expr = expr.strip()
    idm = re.match(r"^id\(\s*(\w+)\s*\)$", expr)
    if idm:
        v = idm.group(1)
        return F.col(f"{v}_id"), f"{v}_id"
    if "." in expr:
        var, _, prop = expr.partition(".")
        if prop == "id":
            return F.col(f"{var}_id"), f"{var}_id"
        if pat is not None and var in pat.edge_vars:
            # edge attributes are already flat motif output columns
            return F.col(f"{var}_{prop}"), f"{var}_{prop}"
        needed_props.add((var, prop))
        return F.col(f"{var}_{prop}"), f"{var}_{prop}"
    return F.col(f"{expr}_id"), f"{expr}_id"


def run_cypher(graph: PropertyGraph, query: str) -> DataFrame:
    """Execute a cypher_lite query against the property graph."""
    q = re.sub(r"\s+", " ", query.strip())
    low = q.lower()
    for marker, hint in _UNSUPPORTED.items():
        if marker in low:
            raise NotImplementedError(f"cypher_lite does not cover {marker!r} — {hint}")
    if _VARLEN_RE.search(q):
        raise NotImplementedError(
            "cypher_lite does not cover variable-length patterns ([*..]) — "
            "use graph.paths closure_path_counts / k_hop / bfs_depths"
        )

    m = re.match(
        r"^MATCH (?P<match>.+?) (?:WHERE (?P<where>.+?) )?RETURN (?P<distinct>DISTINCT )?"
        r"(?P<ret>.+?)(?: ORDER BY (?P<order>.+?))?(?: LIMIT (?P<limit>\d+))?$",
        q,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError("query must be MATCH ... [WHERE ...] RETURN ... [ORDER BY ...] [LIMIT n]")

    pat = _Pattern()
    anon = [0]
    loops: list[tuple[str, str]] = []
    for path in _split_top_level(m.group("match"), ","):
        before = len(pat.terms)
        _parse_path(path, pat, anon)
        # detect same-var loop rewrites: (a)->(a) came through verbatim;
        # motif would collapse the join, so rewrite dst to a twin var
        for i in range(before, len(pat.terms)):
            t = pat.terms[i]
            tm = re.match(r"^\((\w+)\)-\[(.*)\]->\(\1\)$", t)
            if tm:
                v = tm.group(1)
                anon[0] += 1
                twin = f"_loop{anon[0]}"
                pat.terms[i] = f"({v})-[{tm.group(2)}]->({twin})"
                loops.append((v, twin))

    filters: list[tuple[str, str, str]] = []  # (colexpr, op, literal-token)
    if m.group("where"):
        for cond in _split_top_level(m.group("where"), " AND "):
            nm = re.match(r"^NOT \s*(?P<pat>\(.+\))$", cond, re.IGNORECASE)
            if nm:
                before_neg = len(pat.terms)
                _parse_path(nm.group("pat"), pat, anon, negated=True)
                if len(pat.terms) - before_neg > 1:
                    # each negated motif term anti-joins independently,
                    # which would compute per-hop non-existence instead
                    # of "no such path" — raise, don't misparse
                    raise NotImplementedError(
                        "cypher_lite does not cover multi-hop NOT patterns — "
                        "anti-join a closure from graph.paths (k_hop / "
                        "closure_path_counts) instead"
                    )
                continue
            cm = re.match(r"^(?P<l>[\w.()]+) \s*(?P<op><>|<=|>=|=|<|>)\s* (?P<r>.+)$", cond, re.VERBOSE)
            if not cm:
                raise ValueError(f"unsupported WHERE condition: {cond!r}")
            filters.append((cm.group("l"), cm.group("op"), cm.group("r")))

    needed: set[tuple[str, str]] = set()
    aggs: list[tuple[Column, str]] = []
    keys: list[tuple[Column, str]] = []
    exists_items: list[tuple[str, str, tuple[str, ...], bool, str]] = []
    for item in _split_top_level(m.group("ret"), ","):
        raw, _, alias = item.partition(" AS ")
        if not _:
            raw, _, alias = item.partition(" as ")
        raw = raw.strip()
        em = _EXISTS_RE.match(raw)
        if em:
            hm = _EX_HOP_RE.match(em.group("pat").strip())
            if not hm:
                raise ValueError(f"unsupported EXISTS pattern: {em.group('pat')!r}")
            i = len(exists_items)
            flag = f"__exists_{i}"
            exists_items.append(
                (hm.group("x"), hm.group("y"),
                 tuple(r.strip() for r in (hm.group("rels") or "").split("|") if r.strip()),
                 hm.group("arrow") == "->", flag)
            )
            keys.append((F.coalesce(F.col(flag), F.lit(False)), alias.strip() or "exists"))
            continue
        am = _AGG_RE.match(raw)
        if am:
            fn = am.group("fn").lower()
            arg = am.group("arg")
            distinct = bool(am.group("distinct"))
            if fn == "count" and arg == "*":
                col = F.count("*")
            else:
                c, _a = _col_ref(arg, pat, needed)
                if fn == "count":
                    col = F.countDistinct(c) if distinct else F.count(c)
                elif fn == "collect":
                    col = F.sort_array(F.collect_list(c))
                else:
                    col = getattr(F, fn)(c)
            aggs.append((col, alias.strip() or fn))
        else:
            c, dft = _col_ref(raw, pat, needed)
            keys.append((c, alias.strip() or dft))

    # WHERE column refs may also need vertex props
    parsed_filters: list[tuple[Column, str, object]] = []
    for l, op, r in filters:
        c, _a = _col_ref(l, pat, needed)
        parsed_filters.append((c, op, _literal(r)))
    for var, prop, lit in pat.prop_eq:
        if prop != "id":
            needed.add((var, prop))

    # ORDER BY on a var.prop outside the RETURN list still needs the
    # vertex property joined into the plan (Spark's missing-reference
    # resolution pulls it through the final projection); parse the
    # order tokens now so their prop refs land in ``needed``
    order_tokens: list[tuple[str, bool]] = []
    if m.group("order"):
        aliases = {a for _, a in keys} | {a for _, a in aggs}
        for ob in _split_top_level(m.group("order"), ","):
            token = ob.strip()
            desc = token.upper().endswith(" DESC")
            token = re.sub(r"\s+(DESC|ASC)$", "", token, flags=re.IGNORECASE).strip()
            if token not in aliases:
                _col_ref(token, pat, needed)
            order_tokens.append((token, desc))

    if pat.terms:
        bound = find(graph, "; ".join(pat.terms))
        for v, twin in loops:
            bound = bound.filter(F.col(f"{v}_id") == F.col(f"{twin}_id")).drop(f"{twin}_id")
        for var in pat.bare_vars:
            if f"{var}_id" not in bound.columns:
                v = graph.vertices
                if var in pat.labels:
                    v = v.filter(F.col("label") == pat.labels[var])
                bound = bound.crossJoin(v.select(F.col("id").alias(f"{var}_id")))
    else:
        # edge-less MATCH: cartesian of labeled vertex scans (Cypher
        # semantics; with {prop: lit} maps each side is a point lookup)
        bound = None
        for var in pat.bare_vars:
            v = graph.vertices
            if var in pat.labels:
                v = v.filter(F.col("label") == pat.labels[var])
            frame = v.select(F.col("id").alias(f"{var}_id"))
            bound = frame if bound is None else bound.crossJoin(frame)
        if bound is None:
            raise ValueError("MATCH clause binds no variables")

    # join vertex attributes (label filter and/or property access)
    verts = graph.vertices
    for var in sorted({v for v, _ in needed} | set(pat.labels)):
        props = sorted(p for v, p in needed if v == var)
        cols = [F.col("id").alias(f"{var}_id")] + [
            F.col(p).alias(f"{var}_{p}") for p in props
        ]
        v = verts
        if var in pat.labels:
            v = v.filter(F.col("label") == pat.labels[var])
        bound = bound.join(F.broadcast(v.select(*cols)), f"{var}_id")

    for var, prop, lit in pat.prop_eq:
        col = F.col(f"{var}_id") if prop == "id" else F.col(f"{var}_{prop}")
        bound = bound.filter(col == F.lit(lit))
    _OPS = {
        "=": lambda c, v: c == v,
        "<>": lambda c, v: c != v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
    }
    for c, op, lit in parsed_filters:
        bound = bound.filter(_OPS[op](c, F.lit(lit)))

    # EXISTS((x)-[:R]-(y)) flags: distinct qualifying (x, y) pairs
    # left-joined in with a True marker; '-' matches either direction
    for x, y, rels, directed, flag in exists_items:
        e = graph.edges
        if rels:
            e = e.filter(F.col("rel_type").isin(*rels))
        pairs = e.select(F.col("src").alias(f"{x}_id"), F.col("dst").alias(f"{y}_id"))
        if not directed:
            pairs = pairs.unionByName(
                e.select(F.col("dst").alias(f"{x}_id"), F.col("src").alias(f"{y}_id"))
            )
        pairs = pairs.distinct().withColumn(flag, F.lit(True))
        bound = bound.join(pairs, [f"{x}_id", f"{y}_id"], "left_outer")

    if aggs:
        out = (
            bound.groupBy(*[c.alias(a) for c, a in keys]).agg(
                *[c.alias(a) for c, a in aggs]
            )
            if keys
            else bound.agg(*[c.alias(a) for c, a in aggs])
        )
    else:
        out = bound.select(*[c.alias(a) for c, a in keys])
        if m.group("distinct"):
            out = out.distinct()

    if order_tokens:
        aliases = {a for _, a in keys} | {a for _, a in aggs}
        order_cols = []
        for token, desc in order_tokens:
            col = F.col(token) if token in aliases else _col_ref(token, pat, set())[0]
            order_cols.append(col.desc() if desc else col.asc())
        out = out.orderBy(*order_cols)
    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out
