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
multiple motif terms, both ``-[]->`` and ``<-[]-`` arrows), node labels
and ``{prop: literal}`` maps, edge rel-type alternation ``[:A|B]``,
BOUNDED variable-length edges ``[:A|B*..k]`` / ``[*k]`` / ``[*m..k]``
(compiled onto graph.paths.k_hop, reference src/insertData.ts:60),
UNBOUNDED variable-length edges ``[:R*]`` / ``[*1..]`` (compiled onto
graph.paths.closure_path_counts — the reference's flagship
sub-dependency counts, documentation/queries.md:284-303, run verbatim:
``count(x)`` folds path multiplicity, ``count(DISTINCT x)`` and
``RETURN DISTINCT`` dedup), OPTIONAL MATCH clauses (left-outer motif
joins, reference documentation/queries.md:373-378), aggregate-only
WITH chaining, WHERE with AND-ed comparisons over ``var.prop`` /
``id(var)`` plus ``NOT (pattern)`` existence negation, RETURN with
aliases, DISTINCT, and the aggregates the reference uses (count(*),
count(x), count(DISTINCT x), sum/min/max/avg, collect), ORDER BY and
LIMIT.

Out of scope by design (each has a dedicated engine operator):
per-path rows / path variables under unbounded ``[*]`` (the closure
emits reachable pairs + multiplicity, not materialized paths — use
graph/paths.py dependency_chains for node lists);
shortestPath/allShortestPaths -> all_shortest_paths_multi;
graph-algo procedure calls (algo.pageRank etc.) -> graph/algorithms.py.
Requests for those raise with a pointer, they do not silently misparse.
Row-carrying WITH (bare node vars carried by id, projections, a
trailing WHERE over the projected rows, and continued MATCH joining on
the carried variables) compiles to ordinary equi-joins — see
_exec_segment's carried/carried_nodes plumbing.
Documented deviations: bounded var-length multiplicity counts WALKS
(k_hop's unrolled-join semantics) rather than relationship-unique
paths — identical on DAG patterns and under RETURN DISTINCT; a graph
with self-loops can differ at depth >= 2. Unbounded [*] requires the
matched subgraph to be a DAG (the closure raises on cycles rather than
looping; Neo4j's relationship-unique walk counts differ on cyclic
inputs anyway).

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
    # only forms the dedicated pre-pass below does NOT compile
    # (undirected / bounded variants); the directed-unbounded Cypher
    # form MATCH p = allShortestPaths((a)-[:R*]->(b)) RETURN p runs
    "shortestpath": "this shortest-path form: use "
    "graph.paths.all_shortest_paths_multi directly",
    "algo.": "graph-algorithm procedures: use graph.algorithms",
    "apoc.": "apoc procedures: see io.sinks (gephi) / graph.store",
}

# MATCH p = allShortestPaths((a ...)-[:R*]->(b ...)) RETURN ... — the
# reference's shortest-path query shape (documentation/queries.md:74-79),
# compiled onto graph.paths.all_shortest_paths (the shortest-path-DAG
# enumerator) instead of the motif engine.
_SHORTEST_RE = re.compile(
    r"^MATCH\s+(?P<pv>\w+)\s*=\s*(?P<fn>allShortestPaths|shortestPath)\s*\(\s*"
    r"(?P<a>\([^)]*\))\s*-\s*\[\s*:(?P<rel>\w+)\s*\*\s*\]\s*->\s*"
    r"(?P<b>\([^)]*\))\s*\)\s*RETURN\s+(?P<ret>.+)$"
)

# MATCH p = (a)-[:REL*0|*]->(b) [WHERE ...] [WITH p LIMIT n]
# WITH collect(p) AS paths CALL apoc.gephi.add(host, ws, paths)
# YIELD nodes, relationships, time RETURN nodes, relationships, time —
# the reference's Gephi streaming shape (documentation/queries.md:
# 200-210, 350-358), compiled onto io/sinks gephi event lines instead
# of the apoc HTTP POST. apoc collects the paths on the server before
# posting; this engine streams the DEDUPED node/edge event set straight
# from the distributed frames (what Gephi renders anyway), so there is
# no driver-side path collect at any scale.
_GEPHI_RE = re.compile(
    r"^MATCH\s+(?P<pv>\w+)\s*=\s*(?P<a>\([^)]*\))\s*-\s*\[\s*:(?P<rel>\w+)\s*"
    r"\*\s*(?P<lo>\d+)?\s*\]\s*->\s*(?P<b>\([^)]*\))\s*"
    r"(?:WHERE\s+(?P<where>.+?)\s+)?"
    r"(?:WITH\s+(?P=pv)\s+LIMIT\s+(?P<cap>\d+)\s+)?"
    r"WITH\s+collect\s*\(\s*(?P=pv)\s*\)\s+AS\s+(?P<pathsvar>\w+)\s+"
    r"CALL\s+apoc\.gephi\.add\s*\(\s*'(?P<host>[^']*)'\s*,\s*'(?P<ws>[^']*)'\s*,"
    r"\s*(?P=pathsvar)\s*\)\s+"
    r"YIELD\s+nodes\s*,\s*relationships\s*,\s*time\s+"
    r"RETURN\s+nodes\s*,\s*relationships\s*,\s*time$",
    re.IGNORECASE,
)

_NODE_RE = re.compile(r"\(\s*(?P<var>\w*)\s*(?::\s*(?P<label>\w+))?\s*(?P<props>\{[^}]*\})?\s*\)")
_EDGE_BODY = r"\[\s*(?P<var>\w*)\s*(?::\s*(?P<rels>\w+(?:\s*\|\s*\w+)*))?\s*(?P<star>\*[\d\s.]*)?\]"
_EDGE_RIGHT_RE = re.compile(r"^-\s*" + _EDGE_BODY + r"\s*->")
_EDGE_LEFT_RE = re.compile(r"^<-\s*" + _EDGE_BODY + r"\s*-(?!>)")
_EDGE_UND_RE = re.compile(r"^-\s*" + _EDGE_BODY + r"\s*-(?!>)")
_STAR_RE = re.compile(r"^\*\s*(?P<lo>\d+)?\s*(?:(?P<dots>\.\.)\s*(?P<hi>\d+)?)?$")
_LIT_RE = re.compile(
    r"^(?:'(?P<str>(?:[^'\\]|\\.)*)'|\"(?P<dstr>(?:[^\"\\]|\\.)*)\""
    r"|(?P<num>-?\d+(?:\.\d+)?))$"
)


@dataclass
class _Pattern:
    terms: list[str] = field(default_factory=list)  # motif term strings
    labels: dict[str, str] = field(default_factory=dict)  # var -> label
    prop_eq: list[tuple[str, str, object]] = field(default_factory=list)  # var, prop, lit
    edge_vars: set[str] = field(default_factory=set)  # named [e:..] variables
    bare_vars: list[str] = field(default_factory=list)  # edge-less MATCH (n) paths
    path_vars: set[str] = field(default_factory=set)  # p = (...)-[..]->(..) bindings
    und_terms: list[int] = field(default_factory=list)  # indices of -[..]-  terms
    varlen: list[tuple[str, str, tuple[str, ...] | None, int, int | None, str | None]] = field(
        default_factory=list
    )  # (src, dst, rel_types, k_min, k_max, mult_col); k_max None =
    # unbounded [*] (closure compilation), mult_col names its
    # path-multiplicity column

    def bound_vars(self) -> set[str]:
        vs: set[str] = set(self.bare_vars)
        for t in self.terms:
            if t.startswith("!"):
                continue
            vs.update(v for v in re.findall(r"\((\w+)\)", t))
        for s, d, *_ in self.varlen:
            vs.update((s, d))
        return vs


def _literal(tok: str):
    m = _LIT_RE.match(tok.strip())
    if not m:
        raise ValueError(f"unsupported literal: {tok!r}")
    # quote/backslash escapes only (Neo4j's \' \" \\); other backslash
    # pairs pass through verbatim — matching _split_top_level's escape
    # tracking so a literal like 'it\'s; fine' survives the ';' script
    # split AND parses to the intended value (ADVICE r11)
    if m.group("str") is not None:
        return re.sub(r"\\(['\"\\])", r"\1", m.group("str"))
    if m.group("dstr") is not None:
        return re.sub(r"\\(['\"\\])", r"\1", m.group("dstr"))
    n = m.group("num")
    return float(n) if "." in n else int(n)


def _split_top_level(text: str, sep: str) -> list[str]:
    """Split on ``sep`` outside quotes/braces/brackets."""
    parts, depth, quote, cur = [], 0, "", []
    i = 0
    while i < len(text):
        ch = text[i]
        if quote:
            cur.append(ch)
            if ch == "\\" and i + 1 < len(text):
                # backslash escape inside a string literal: consume the
                # escaped character too, so 'it\'s; fine' neither closes
                # the quote early nor splits on the embedded ';'
                # (ADVICE r11 — run_cypher splits every query on ';')
                cur.append(text[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
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
    into chained motif terms, collecting label/prop constraints. A
    ``p = (...)`` prefix binds a path variable: the binding itself is
    legal (Neo4j users write MATCH p=... purely for structure), but any
    REFERENCE to ``p`` in a projection raises — the engine emits
    bindings/pairs, not materialized path values (graph.paths
    dependency_chains is the node-list operator)."""
    rest = path.strip()
    pv = re.match(r"^(\w+)\s*=\s*(?=\()", rest)
    if pv:
        if negated:
            raise ValueError(f"path variable in NOT pattern: {pv.group(1)!r}")
        pat.path_vars.add(pv.group(1))
        rest = rest[pv.end() :].strip()
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
        em = _EDGE_RIGHT_RE.match(rest)
        leftward = undirected = False
        if not em:
            em = _EDGE_LEFT_RE.match(rest)
            leftward = True
        if not em:
            # -[..]- with no arrowhead: undirected match (Neo4j matches
            # the relationship in either direction; reference
            # documentation/queries.md:13,19)
            em = _EDGE_UND_RE.match(rest)
            leftward, undirected = False, True
        if not em:
            raise ValueError(f"expected -[..]->, <-[..]- or -[..]- at: {rest!r}")
        evar, rels, star = em.group("var"), em.group("rels"), em.group("star")
        if undirected and (star or negated):
            raise NotImplementedError(
                "cypher_lite covers undirected -[..]- only as a plain "
                "single hop — direct the pattern or compose graph.paths "
                "over symmetrized edges"
            )
        rest = rest[em.end() :].strip()
        nm = _NODE_RE.match(rest)
        if not nm:
            raise ValueError(f"expected node pattern at: {rest!r}")
        nxt = node_var(nm)
        rest = rest[nm.end() :].strip()
        # a leftward edge (a)<-[..]-(b) is the rightward edge (b)->(a)
        e_src, e_dst = (nxt, prev) if leftward else (prev, nxt)
        if star:
            # bounded variable-length edge -> k_hop compilation
            sm = _STAR_RE.match(star.replace(" ", ""))
            if not sm:
                raise ValueError(f"unparseable variable-length spec: {star!r}")
            lo, dots, hi = sm.group("lo"), sm.group("dots"), sm.group("hi")
            if negated:
                raise NotImplementedError(
                    "cypher_lite does not cover negated variable-length "
                    "patterns — anti-join a k_hop / closure from graph.paths"
                )
            if evar:
                raise ValueError(
                    f"variable-length edge cannot bind an edge variable: [{evar}{star}]"
                )
            k_min = int(lo) if lo is not None else 1
            if hi is not None:
                k_max = int(hi)  # [*..k] / [*m..k]
            elif dots or lo is None:
                k_max = None  # [*] / [*..] / [*n..]
            else:
                k_max = int(lo)  # [*k] exact length
            rel_types = (
                tuple(r.strip() for r in rels.split("|")) if rels else None
            )
            if k_max is None and (lo is None or (dots and k_min == 1)):
                # bare [*] / [*..] / [*1..]: unbounded expansion ->
                # iterative closure (graph/paths.closure_path_counts),
                # path multiplicity carried in a weight column that the
                # projection folds into count aggregates
                anon[0] += 1
                pat.varlen.append(
                    (e_src, e_dst, rel_types, 1, None, f"__pathmult{anon[0]}")
                )
                prev = nxt
                continue
            if k_max is None:
                raise NotImplementedError(
                    "cypher_lite does not cover unbounded variable-length "
                    "patterns with a lower bound other than 1 ([*0..], "
                    "[*n..] with n > 1) — compose graph.paths k_hop + "
                    "closure_path_counts directly"
                )
            if not 1 <= k_min <= k_max:
                raise ValueError(f"bad variable-length bounds: {star!r}")
            pat.varlen.append((e_src, e_dst, rel_types, k_min, k_max, None))
            prev = nxt
            continue
        if evar and not negated:
            pat.edge_vars.add(evar)
        # same-var loops ((a)-[:R]->(a)) need distinct motif vars; the
        # equality is enforced with a filter by the caller
        rel = f":{rels.replace(' ', '')}" if rels else ""
        neg = "!" if negated else ""
        if negated:
            pat.terms.append(
                f"{neg}({e_src})-[{rel}]->({e_dst if e_dst != e_src else ''})"
            )
        else:
            if undirected:
                pat.und_terms.append(len(pat.terms))
            pat.terms.append(f"({e_src})-[{evar}{rel}]->({e_dst})")
        prev = nxt


_AGG_RE = re.compile(
    r"^(?P<fn>count|sum|min|max|avg|collect)\s*\(\s*(?P<distinct>DISTINCT\s+)?(?P<arg>\*|[\w.()]+)\s*\)$",
    re.IGNORECASE,
)
# SIZE((n)-[:R]->()) / SIZE((n)<-[:R]-(:Label)) / SIZE((n)-[:R]-()) —
# Cypher's per-row pattern-count expression (degree), reference
# documentation/queries.md:59-64,68-71,254-278
_SIZE_RE = re.compile(
    r"^SIZE\s*\(\s*\(\s*(?P<var>\w+)\s*\)\s*(?:(?P<in><-)|-)\s*"
    r"\[\s*:?\s*(?P<rels>\w+(?:\s*\|\s*\w+)*)?\s*\]\s*(?:(?P<out>->)|-)\s*"
    r"\(\s*(?::\s*(?P<olabel>\w+))?\s*\)\s*\)$",
    re.IGNORECASE,
)
_FLOOR_RE = re.compile(r"^FLOOR\s*\((?P<inner>.+)\)$", re.IGNORECASE)
_LABELS_RE = re.compile(r"^LABELS\s*\(\s*(?P<var>\w+)\s*\)$", re.IGNORECASE)
_PROPS_RE = re.compile(r"^PROPERTIES\s*\(\s*(?P<var>\w+)\s*\)$", re.IGNORECASE)
# RETURN EXISTS((a)-[:R]-(b)) — single hop, '-' = undirected, '->' directed
_EXISTS_RE = re.compile(r"^EXISTS\s*\(\s*(?P<pat>\(.+\))\s*\)$", re.IGNORECASE)
_EX_HOP_RE = re.compile(
    r"^\(\s*(?P<x>\w+)\s*\)\s*-\s*\[\s*:?\s*(?P<rels>\w+(?:\s*\|\s*\w+)*)?\s*\]\s*"
    r"(?P<arrow>->|-)\s*\(\s*(?P<y>\w+)\s*\)$"
)


def _col_ref(
    expr: str,
    edge_vars: set[str],
    needed_props: set[tuple[str, str]],
    carried: set[str] = frozenset(),
) -> tuple[Column, str]:
    """Resolve ``var.prop`` / ``id(var)`` / ``var`` / a carried WITH
    alias to a column and a default alias; records vertex props that
    must be joined in."""
    expr = expr.strip()
    idm = re.match(r"^id\(\s*(\w+)\s*\)$", expr)
    if idm:
        v = idm.group(1)
        return F.col(f"{v}_id"), f"{v}_id"
    lm = _LABELS_RE.match(expr)
    if lm:
        # LABELS(n) -> single-label array (this store keys one label
        # per vertex; Neo4j returns the label list)
        v = lm.group("var")
        needed_props.add((v, "label"))
        return F.array(F.col(f"{v}_label")), f"labels_{v}"
    if "." in expr:
        var, _, prop = expr.partition(".")
        if prop == "id":
            return F.col(f"{var}_id"), f"{var}_id"
        if var in edge_vars:
            # edge attributes are already flat motif output columns
            return F.col(f"{var}_{prop}"), f"{var}_{prop}"
        needed_props.add((var, prop))
        return F.col(f"{var}_{prop}"), f"{var}_{prop}"
    if expr in carried:
        # a 1-row aggregate carried through WITH keeps its alias
        return F.col(expr), expr
    return F.col(f"{expr}_id"), f"{expr}_id"


_KW_RE = re.compile(r"(OPTIONAL\s+MATCH|MATCH|WHERE|WITH|UNWIND|RETURN)\b", re.IGNORECASE)

_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def _scan_clauses(q: str) -> list[tuple[str, str]]:
    """Split the query into (KEYWORD, text) clauses at top level
    (outside quotes/braces), preserving order."""
    marks: list[tuple[int, int, str]] = []
    depth, quote, i = 0, "", 0
    while i < len(q):
        ch = q[i]
        if quote:
            if ch == "\\":
                # skip the escaped character — same escape tracking as
                # _split_top_level (ADVICE r11)
                i += 2
                continue
            if ch == quote:
                quote = ""
            i += 1
            continue
        if ch in "'\"":
            quote = ch
            i += 1
            continue
        if ch in "{[(":
            depth += 1
            i += 1
            continue
        if ch in "}])":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (i == 0 or not (q[i - 1].isalnum() or q[i - 1] == "_")):
            m = _KW_RE.match(q, i)
            if m:
                kw = re.sub(r"\s+", " ", m.group(1).upper())
                marks.append((i, m.end(), kw))
                i = m.end()
                continue
        i += 1
    if not marks or marks[0][0] != 0:
        raise ValueError("query must start with MATCH / OPTIONAL MATCH")
    clauses = []
    for j, (start, end, kw) in enumerate(marks):
        text_end = marks[j + 1][0] if j + 1 < len(marks) else len(q)
        clauses.append((kw, q[end:text_end].strip()))
    return clauses


@dataclass
class _Block:
    kind: str  # "MATCH" | "OPTIONAL MATCH"
    match_text: str
    where_text: str | None = None
    pat: _Pattern = field(default_factory=_Pattern)
    loops: list[tuple[str, str]] = field(default_factory=list)
    filters: list[tuple[str, str, str]] = field(default_factory=list)


def _parse_block_patterns(block: _Block, anon: list[int]) -> None:
    pat = block.pat
    for path in _split_top_level(block.match_text, ","):
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
                block.loops.append((v, twin))
    if block.where_text:
        for cond in _split_top_level(block.where_text, " AND "):
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
            cm = re.match(
                r"^(?P<l>[\w.()]+) \s*(?P<op><>|<=|>=|=|<|>)\s* (?P<r>.+)$", cond, re.VERBOSE
            )
            if not cm:
                raise ValueError(f"unsupported WHERE condition: {cond!r}")
            block.filters.append((cm.group("l"), cm.group("op"), cm.group("r")))


def _varlen_frame(
    graph: PropertyGraph,
    src: str,
    dst: str,
    rel_types: tuple[str, ...] | None,
    k_min: int,
    k_max: int | None,
    roots: DataFrame | None = None,
    mult_col: str | None = None,
) -> DataFrame:
    """Variable-length edge as a (src_id, dst_id) binding frame.

    Bounded (``k_max`` int): graph.paths.k_hop, one row per walk (path
    multiplicity preserved as row multiplicity).

    Unbounded (``k_max`` None, bare ``[*]``): the iterative closure
    operator (graph.paths.closure_path_counts) — one row per reachable
    (src, dst) pair with the path count in ``mult_col``, which the
    projection layer folds into count aggregates. This is the
    compilation of the reference's flagship sub-dependency counts
    (documentation/queries.md:284-303: 321,265 paths / 347 distinct).
    Cyclic inputs raise (closure counts simple-path multiplicity only
    on DAGs); Neo4j's relationship-unique walks differ there anyway.

    ``roots`` anchors the expansion to the given source ids; None
    expands from every source vertex."""
    from github_miner_spark.graph.paths import closure_path_counts, k_hop

    e = graph.edges
    if rel_types:
        e = e.filter(F.col("rel_type").isin(*rel_types))
    if k_max is None:
        cl = closure_path_counts(e.select("src", "dst"), roots)
        if src == dst:
            return cl.filter(F.col("root") == F.col("node")).select(
                F.col("root").alias(f"{src}_id"), F.col("paths").alias(mult_col)
            )
        return cl.select(
            F.col("root").alias(f"{src}_id"),
            F.col("node").alias(f"{dst}_id"),
            F.col("paths").alias(mult_col),
        )
    kh = k_hop(e.select("src", "dst"), roots, k_max, distinct_nodes=False)
    if k_min > 1:
        kh = kh.filter(F.col("depth") >= k_min)
    if src == dst:
        return kh.filter(F.col("root") == F.col("node")).select(
            F.col("root").alias(f"{src}_id")
        )
    return kh.select(F.col("root").alias(f"{src}_id"), F.col("node").alias(f"{dst}_id"))


def _compile_block(
    graph: PropertyGraph,
    block: _Block,
    needed: set[tuple[str, str]],
    prop_owner: dict[str, "_Block"],
    edge_vars: set[str],
) -> DataFrame:
    """Build the bound frame for one (OPTIONAL) MATCH clause: motif
    joins + var-length frames + bare scans, then THIS block's vertex
    attribute joins, property-map filters and WHERE conditions — so an
    OPTIONAL MATCH is fully filtered before its left-outer join, per
    Cypher scoping."""
    pat = block.pat
    bound: DataFrame | None = None
    if pat.terms:
        # an undirected -[..]- term matches either orientation: compile
        # every flip combination and union (capped at 2 undirected hops
        # per clause — the reference never chains more than one)
        if len(pat.und_terms) > 2:
            raise NotImplementedError(
                "cypher_lite covers at most 2 undirected hops per MATCH "
                "clause — direct the pattern or compose motifs directly"
            )
        variants: list[list[str]] = [list(pat.terms)]
        for idx in pat.und_terms:
            flipped: list[list[str]] = []
            for v in variants:
                tm = re.match(r"^\((\w+)\)-\[(.*)\]->\((\w+)\)$", v[idx])
                fv = list(v)
                fv[idx] = f"({tm.group(3)})-[{tm.group(2)}]->({tm.group(1)})"
                flipped.append(fv)
            variants += flipped
        bound = find(graph, "; ".join(variants[0]))
        for v in variants[1:]:
            bound = bound.unionByName(find(graph, "; ".join(v)))
        for v, twin in block.loops:
            bound = bound.filter(F.col(f"{v}_id") == F.col(f"{twin}_id")).drop(f"{twin}_id")
    for src, dst, rel_types, k_min, k_max, mult_col in pat.varlen:
        # anchor the expansion when the source var is already bound or
        # constrained (label / prop map): k_hop over every vertex's
        # walk table just to filter afterwards is wasted shuffle volume
        # growing with k and |E|
        roots: DataFrame | None = None
        if bound is not None and f"{src}_id" in bound.columns:
            roots = bound.select(f"{src}_id")
        else:
            v = graph.vertices
            constrained = False
            if src in pat.labels:
                v = v.filter(F.col("label") == pat.labels[src])
                constrained = True
            for pvar, prop, lit in pat.prop_eq:
                if pvar == src:
                    if prop == "id":
                        col = F.col("id")
                    elif prop in v.columns:
                        col = F.col(prop)
                    else:
                        # missing property is NULL (Neo4j): never equal
                        col = F.lit(None).cast("string")
                    v = v.filter(col == F.lit(lit))
                    constrained = True
            if constrained:
                roots = v.select("id")
        vf = _varlen_frame(graph, src, dst, rel_types, k_min, k_max, roots, mult_col)
        if bound is None:
            bound = vf
        else:
            shared = [c for c in vf.columns if c in bound.columns]
            bound = bound.join(vf, shared) if shared else bound.crossJoin(vf)
    for var in pat.bare_vars:
        if bound is not None and f"{var}_id" in bound.columns:
            continue
        v = graph.vertices
        if var in pat.labels:
            v = v.filter(F.col("label") == pat.labels[var])
        frame = v.select(F.col("id").alias(f"{var}_id"))
        bound = frame if bound is None else bound.crossJoin(frame)
    if bound is None:
        raise ValueError(f"MATCH clause binds no variables: {block.match_text!r}")

    # properties THIS block's own WHERE / {prop: lit} maps consume —
    # including refs to vars first bound in an EARLIER block (valid
    # Cypher: the filter still applies inside this block, pre-join, so
    # the property is joined in here and dropped again afterwards
    # rather than inherited from the owner block's frame)
    local_needs: set[tuple[str, str]] = set()
    for l, _op, _r in block.filters:
        _col_ref(l, edge_vars, local_needs)
    for var, prop, _lit in pat.prop_eq:
        if prop != "id":
            local_needs.add((var, prop))
    for var, prop in local_needs:
        if f"{var}_id" not in bound.columns:
            raise NotImplementedError(
                f"cypher_lite cannot filter on {var}.{prop} in a clause that "
                f"does not bind {var!r} — move the condition to the clause "
                "that matches it"
            )

    # join vertex attributes (label filter and/or property access) for
    # the vars this block owns, plus borrowed filter props
    verts = graph.vertices
    own = {v for v, b in prop_owner.items() if b is block}
    borrowed: list[str] = []
    for var in sorted(own | set(pat.labels) | {v for v, _ in local_needs}):
        if f"{var}_id" not in bound.columns:
            continue
        props = sorted(
            {p for v, p in needed if v == var and prop_owner.get(v) is block}
            | {p for v, p in local_needs if v == var}
        )
        if var not in own:
            borrowed += [f"{var}_{p}" for v, p in local_needs if v == var]
        # a property absent from the vertex schema is NULL, Neo4j's
        # missing-property semantics (the reference reads back
        # plugin-written props like n.community / n.pagerank that this
        # store never materializes — those queries must run, not error)
        cols = [F.col("id").alias(f"{var}_id")] + [
            (
                F.col(p) if p in verts.columns else F.lit(None).cast("string")
            ).alias(f"{var}_{p}")
            for p in props
        ]
        v = verts
        if var in pat.labels:
            v = v.filter(F.col("label") == pat.labels[var])
        bound = bound.join(F.broadcast(v.select(*cols)), f"{var}_id")

    for var, prop, lit in pat.prop_eq:
        col = F.col(f"{var}_id") if prop == "id" else F.col(f"{var}_{prop}")
        bound = bound.filter(col == F.lit(lit))
    for l, op, r in block.filters:
        c, _a = _col_ref(l, edge_vars, set())
        bound = bound.filter(_OPS[op](c, F.lit(_literal(r))))
    # borrowed props were only for the filters above; the owner block's
    # frame provides them to the projection, so drop to avoid duplicate
    # columns after the join
    return bound.drop(*borrowed) if borrowed else bound


def _resolve_anchor(graph: PropertyGraph, node_text: str) -> list[int]:
    """Resolve a node pattern like (a:GitRepo {name: 'x'}) to vertex
    ids: label filter + property-map equality, with Neo4j's
    missing-property-is-NULL semantics (a property the store does not
    carry never matches)."""
    nm = _NODE_RE.match(node_text)
    if not nm:
        raise ValueError(f"expected node pattern at: {node_text!r}")
    v = graph.vertices
    if nm.group("label"):
        v = v.filter(F.col("label") == nm.group("label"))
    if nm.group("props"):
        body = nm.group("props")[1:-1]
        for kv in _split_top_level(body, ","):
            k, _, val = kv.partition(":")
            if not _:
                raise ValueError(f"bad property map entry: {kv!r}")
            k, lit = k.strip(), _literal(val.strip())
            col = F.col(k) if (k == "id" or k in v.columns) else F.lit(None).cast("string")
            v = v.filter(col == F.lit(lit))
    return [r["id"] for r in v.select("id").collect()]


def _run_shortest_paths(graph: PropertyGraph, m: re.Match) -> DataFrame:
    from github_miner_spark.graph.paths import all_shortest_paths

    from github_miner_spark.graph.paths import all_shortest_paths_multi

    pv, ret = m.group("pv"), m.group("ret").strip()
    a_ids = _resolve_anchor(graph, m.group("a"))
    b_ids = _resolve_anchor(graph, m.group("b"))
    if len(a_ids) > 64:
        raise NotImplementedError(
            "shortest-path source anchor resolves to >64 vertices — "
            "constrain it further, or call "
            "graph.paths.all_shortest_paths_multi per source directly"
        )
    spark = graph.vertices.sparkSession
    if not a_ids or not b_ids:
        paths = spark.createDataFrame([], "path array<bigint>, length int")
    else:
        edges = graph.edges.filter(F.col("rel_type") == m.group("rel")).select("src", "dst")
        if len(a_ids) == 1 and len(b_ids) == 1:
            paths = all_shortest_paths(edges, a_ids[0], b_ids[0])
        else:
            # anchor SETS: one batched multi-target pass per source
            # (2 BFS sweeps each), unioned
            parts = [
                all_shortest_paths_multi(edges, a, b_ids).select("path", "length")
                for a in a_ids
            ]
            paths = parts[0]
            for p in parts[1:]:
                paths = paths.unionByName(p)
    if m.group("fn") == "shortestPath":
        paths = paths.orderBy("length", "path").limit(1)
    cm = re.match(rf"^count\s*\(\s*{re.escape(pv)}\s*\)(?:\s+AS\s+(?P<al>\w+))?$", ret, re.IGNORECASE)
    if cm:
        return paths.agg(F.count("*").alias(cm.group("al") or f"count({pv})"))
    if ret == pv:
        return paths.orderBy("length", "path").select(F.col("path").alias(pv), "length")
    raise NotImplementedError(
        f"shortest-path RETURN supports the path variable or count() over "
        f"it, got: {ret!r}"
    )


# MATCH p = (a ...)-[:R*]->(b ...) RETURN <p-as-value> — the unbounded
# path-ENUMERATION forms of the reference corpus (RETURN dependencyGraph,
# documentation/queries.md:25-28; the nodes(p) name-chain, :363-365).
# count(p) over the same pattern stays with the main compiler's
# closure-multiplicity fold; only VALUE references of the path variable
# route here.
_PATH_ENUM_RE = re.compile(
    r"^MATCH\s+(?P<pv>\w+)\s*=\s*(?P<a>\([^)]*\))\s*-\s*\[\s*:(?P<rel>\w+)\s*\*\s*\]"
    r"\s*->\s*(?P<b>\([^)]*\))\s*RETURN\s+(?P<ret>.+)$"
)


def _anchor_frame(graph: PropertyGraph, node_text: str) -> DataFrame:
    """Vertices matching a node pattern, as a DataFrame (id) — the
    non-collecting twin of _resolve_anchor for terminal-node filters."""
    nm = _NODE_RE.match(node_text)
    if not nm:
        raise ValueError(f"expected node pattern at: {node_text!r}")
    v = graph.vertices
    if nm.group("label"):
        v = v.filter(F.col("label") == nm.group("label"))
    if nm.group("props"):
        body = nm.group("props")[1:-1]
        for kv in _split_top_level(body, ","):
            k, _, val = kv.partition(":")
            k, lit = k.strip(), _literal(val.strip())
            col = F.col(k) if (k == "id" or k in v.columns) else F.lit(None).cast("string")
            v = v.filter(col == F.lit(lit))
    return v.select("id")


def _run_path_enumeration(graph: PropertyGraph, m: re.Match) -> DataFrame:
    from github_miner_spark.graph.paths import enumerate_simple_paths

    pv, ret = m.group("pv"), m.group("ret").strip()
    a_ids = _resolve_anchor(graph, m.group("a"))
    if not a_ids:
        paths = graph.vertices.sparkSession.createDataFrame(
            [], "path array<bigint>, length int"
        )
    elif len(a_ids) > 64:
        raise NotImplementedError(
            "path-enumeration source anchor resolves to >64 vertices — "
            "constrain it, or call graph.paths.enumerate_simple_paths per root"
        )
    else:
        edges = graph.edges.filter(F.col("rel_type") == m.group("rel")).select("src", "dst")
        end = _anchor_frame(graph, m.group("b"))
        parts = [enumerate_simple_paths(edges, a, end_nodes=end) for a in a_ids]
        paths = parts[0]
        for p in parts[1:]:
            paths = paths.unionByName(p)
    if ret == pv:
        return paths.orderBy("length", "path").select(F.col("path").alias(pv), "length")
    # the depsChain form: <avar>.<prop>, [node in nodes(<pv>) | node.<prop>] AS <alias>
    nm_a = _NODE_RE.match(m.group("a"))
    avar = nm_a.group("var") if nm_a else ""
    cm = re.match(
        rf"^{re.escape(avar)}\.(?P<aprop>\w+)\s*,\s*\[\s*(?P<it>\w+)\s+in\s+nodes\s*\(\s*"
        rf"{re.escape(pv)}\s*\)\s*\|\s*(?P=it)\.(?P<nprop>\w+)\s*\]"
        rf"(?:\s+AS\s+(?P<al>\w+))?$",
        ret,
        re.IGNORECASE,
    )
    if not cm:
        raise NotImplementedError(
            f"path-value RETURN supports the path variable itself or "
            f"'<a>.<prop>, [n in nodes({pv}) | n.<prop>] AS alias', got: {ret!r}"
        )
    nprop, alias = cm.group("nprop"), cm.group("al") or "depsChain"
    names = graph.vertices.select(
        "id",
        (F.col(nprop) if nprop in graph.vertices.columns else F.lit(None).cast("string")).alias(
            "_nprop"
        ),
    )
    exploded = paths.select("path", F.posexplode("path").alias("pos", "id")).join(
        names, "id", "left_outer"
    )
    chains = (
        exploded.groupBy("path")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "_nprop"))).alias("ps"))
        .select(
            "path", F.transform(F.col("ps"), lambda s: s["_nprop"]).alias(alias)
        )
    )
    # the anchor property is constant over a unique anchor; resolve per
    # path from its first node so multi-anchor unions stay correct
    aprop = cm.group("aprop")
    first = graph.vertices.select(
        F.col("id").alias("_fid"),
        (F.col(aprop) if aprop in graph.vertices.columns else F.lit(None).cast("string")).alias(
            f"{avar}_{aprop}"
        ),
    )
    return (
        chains.join(first, chains["path"][0] == F.col("_fid"))
        .select(f"{avar}_{aprop}", alias, "path")
        .orderBy("path")
        .drop("path")
    )


# MATCH (p1 ...) MATCH (p2 ...) RETURN algo.linkprediction.<fn>(p1, p2)
# — the Neo4j link-prediction function calls of the reference corpus
# (documentation/queries.md:100-118), compiled onto the same degree /
# common-neighbor aggregates as the link_prediction_scores operator
# (queries/algorithms_queries.py). Neo4j's default: UNDIRECTED degree
# over ALL relationship types.
_LINKPRED_RE = re.compile(
    r"^MATCH\s+(?P<n1>\([^)]*\))\s+MATCH\s+(?P<n2>\([^)]*\))\s+RETURN\s+"
    r"algo\.linkprediction\.(?P<fn>\w+)\s*\(\s*(?P<v1>\w+)\s*,\s*(?P<v2>\w+)\s*\)"
    r"(?:\s+AS\s+(?P<al>\w+))?$"
)


def _run_linkprediction(graph: PropertyGraph, m: re.Match) -> DataFrame:
    fn, alias = m.group("fn"), m.group("al") or "score"
    a_ids = _resolve_anchor(graph, m.group("n1"))
    b_ids = _resolve_anchor(graph, m.group("n2"))
    spark = graph.vertices.sparkSession
    if len(a_ids) != 1 or len(b_ids) != 1:
        if not a_ids or not b_ids:
            return spark.createDataFrame([], f"{alias} double")
        raise NotImplementedError(
            "algo.linkprediction anchors must resolve uniquely — use the "
            "pairwise link_prediction_scores operator for candidate sets"
        )
    a, b = a_ids[0], b_ids[0]
    und = (
        graph.edges.select("src", "dst")
        .unionByName(
            graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if fn not in ("preferentialAttachment", "commonNeighbors", "adamicAdar"):
        raise NotImplementedError(
            f"algo.linkprediction.{fn} — supported: preferentialAttachment, "
            "commonNeighbors, adamicAdar (see link_prediction_scores)"
        )
    # One groupBy + one scalar aggregate = a single Spark action for the
    # whole CALL (the old shape did a per-anchor filter().collect() of
    # neighbor sets, two driver collects bounded only by max degree —
    # ADVICE/VERDICT r4 item 6). Per neighbor z: adjacency flags to each
    # anchor plus its undirected degree (und is symmetric, so rows with
    # dst == z count z's degree) carry everything all three Neo4j
    # functions need.
    stats = und.groupBy(F.col("dst").alias("z")).agg(
        F.max((F.col("src") == F.lit(a)).cast("int")).alias("adj_a"),
        F.max((F.col("src") == F.lit(b)).cast("int")).alias("adj_b"),
        F.count("*").alias("deg"),
    )
    row = stats.agg(
        F.sum("adj_a").alias("deg_a"),
        F.sum("adj_b").alias("deg_b"),
        F.sum(F.col("adj_a") * F.col("adj_b")).alias("common"),
        F.sum(
            F.when(
                (F.col("adj_a") == 1) & (F.col("adj_b") == 1) & (F.col("deg") > 1),
                F.lit(1.0) / F.log(F.col("deg").cast("double")),
            ).otherwise(F.lit(0.0))
        ).alias("aa"),
    ).collect()[0]
    if fn == "preferentialAttachment":
        score = float((row["deg_a"] or 0) * (row["deg_b"] or 0))
    elif fn == "commonNeighbors":
        score = float(row["common"] or 0)
    else:
        score = float(row["aa"] or 0.0)
    return spark.createDataFrame([(score,)], f"{alias} double")


def _run_gephi_stream(graph: PropertyGraph, m: re.Match) -> DataFrame:
    """Compile the apoc.gephi.add path-streaming CALL onto the Gephi
    event sink (io/sinks.py): the matched sub-graph's DEDUPED add-node /
    add-edge event lines are written to
    ``$SPARK_GRAFT_GEPHI_DIR/<workspace>/`` (the on-disk stand-in for
    the live POST, like every other network edge in this sandbox), and
    the query returns apoc's YIELD row (nodes, relationships, time).

    apoc collects every path on the server first (``collect(p)``); this
    engine never materializes paths — the streamed set is the reachable
    edge frontier, computed distributed and deduped, which is exactly
    the graph Gephi ends up rendering. The WITH p LIMIT cap therefore
    bounds apoc's server-side collect, not this sink's event set.
    """
    import os as _os
    import time as _time

    from github_miner_spark.io.sinks import gephi_events, gephi_node_events

    t0 = _time.perf_counter()
    a_m = _NODE_RE.match(m.group("a").strip())
    b_m = _NODE_RE.match(m.group("b").strip())
    if not a_m or not b_m:
        raise ValueError(f"expected node patterns: {m.group('a')!r} {m.group('b')!r}")
    if b_m.group("props"):
        raise NotImplementedError(
            "cypher_lite gephi stream: property maps on the terminal "
            "node are not covered — anchor the pattern on the left node"
        )
    avar = a_m.group("var")
    v = graph.vertices
    if a_m.group("label"):
        v = v.filter(F.col("label") == a_m.group("label"))
    if a_m.group("props"):
        body = a_m.group("props")[1:-1]
        for kv in _split_top_level(body, ","):
            k, _, val = kv.partition(":")
            k, lit = k.strip(), _literal(val.strip())
            col = F.col(k) if (k == "id" or k in v.columns) else F.lit(None).cast("string")
            v = v.filter(col == F.lit(lit))
    if m.group("where"):
        disj: Column | None = None
        for term in re.split(r"\s+OR\s+", m.group("where"), flags=re.IGNORECASE):
            tm = re.match(r"^(\w+)\.(\w+)\s*=\s*(\S+)$", term.strip())
            if not tm or tm.group(1) != avar:
                raise NotImplementedError(
                    "cypher_lite gephi stream WHERE covers OR-joined "
                    "<anchor>.<prop> = <literal> terms only"
                )
            # missing property (e.g. plugin-written n.community) is
            # NULL: never equal, Neo4j semantics
            col = (
                F.col(tm.group(2))
                if tm.group(2) in graph.vertices.columns
                else F.lit(None).cast("string")
            )
            cond = col == F.lit(_literal(tm.group(3)))
            disj = cond if disj is None else (disj | cond)
        v = v.filter(disj)
    anchors = v.select("id")

    out_dir = _os.path.join(
        _os.environ.get("SPARK_GRAFT_GEPHI_DIR", "/tmp/spark_graft_gephi"),
        m.group("ws"),
    )
    lo = m.group("lo")
    if lo == "0":
        # zero-length paths: each path IS one matched node; the terminal
        # pattern must hold on the same node
        if b_m.group("label"):
            anchors = v.filter(F.col("label") == b_m.group("label")).select("id")
        if m.group("cap"):
            anchors = anchors.limit(int(m.group("cap")))
        n_nodes = anchors.distinct().count()
        n_rels = 0
        gephi_node_events(anchors).write.mode("overwrite").text(out_dir)
    elif lo is None:
        from github_miner_spark.graph.paths import reachable_set

        # Neo4j semantics for (a)-[:REL*]->(b:Label): only the FINAL
        # node of each path carries the label — intermediates are
        # unconstrained (ADVICE r4: the old dst_label filter on every
        # hop constrained them). Reachability runs over rel-type-
        # filtered edges only; the terminal label then prunes the
        # streamed graph to edges on some anchor->terminal path: src
        # forward-reachable from an anchor AND dst backward-reaching a
        # (>=1-hop-reachable, label-matching) terminal.
        e = graph.edges.filter(F.col("rel_type") == m.group("rel"))
        ee = e.select("src", "dst")
        reach = reachable_set(ee, anchors).select(F.col("node").alias("id")).distinct()
        fwd = anchors.unionByName(reach).distinct().withColumnRenamed("id", "src")
        sub = e.select("src", "dst", "rel_type").join(fwd, "src", "left_semi").distinct()
        if b_m.group("label"):
            terminals = reach.join(
                graph.vertices.filter(
                    F.col("label") == b_m.group("label")
                ).select("id"),
                "id",
                "left_semi",
            )
            rev = ee.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            bwd = (
                terminals.unionByName(
                    reachable_set(rev, terminals).select(F.col("node").alias("id"))
                )
                .distinct()
                .withColumnRenamed("id", "dst")
            )
            sub = sub.join(bwd, "dst", "left_semi").select("src", "dst", "rel_type")
        n_rels = sub.count()
        n_nodes = (
            sub.select(F.col("src").alias("id"))
            .unionByName(sub.select(F.col("dst").alias("id")))
            .distinct()
            .count()
        )
        gephi_events(sub).write.mode("overwrite").text(out_dir)
    else:
        raise NotImplementedError(
            "cypher_lite gephi stream covers [*0] and unbounded [*] — "
            "fixed-k sub-graphs come from graph.paths.k_hop"
        )
    elapsed_ms = int((_time.perf_counter() - t0) * 1000)
    spark = graph.vertices.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_rels, elapsed_ms)],
        "nodes bigint, relationships bigint, time bigint",
    )


# CALL algo.<proc>('Label', 'REL', {opts}) YIELD a, b, ... — the
# reference's procedure invocations (documentation/queries.md:88-90,
# 124-127, 180-182), compiled onto graph/procedures.py. The written
# graph is returned to callers via apply_cypher_call; run_cypher
# returns the YIELD row and commits write:true property write-backs
# to the passed graph in place (Neo4j database-write semantics).
_ALGO_CALL_RE = re.compile(
    r"^CALL\s+(?P<proc>algo\.[\w.]+)\s*\(\s*"
    r"'(?P<label>\w+)'\s*,\s*'(?P<rel>\w+)'\s*"
    r"(?:,\s*\{(?P<opts>[^}]*)\}\s*)?\)\s*"
    r"(?:YIELD\s+(?P<yield>[\w\s,]+?))?\s*;?$",
    re.IGNORECASE,
)

_META_CALL_RE = re.compile(r"^CALL\s+apoc\.meta\.graph\s*\(\s*\)\s*;?$", re.IGNORECASE)

_OPT_RE = re.compile(r"(\w+)\s*:\s*(?:'([^']*)'|([\w.]+))")


def apply_cypher_call(graph: PropertyGraph, query: str) -> tuple[PropertyGraph, DataFrame]:
    """Execute a ``CALL algo.*`` statement; returns (graph after the
    write-back, YIELD row as a one-row DataFrame). The reference's
    two-step workflows chain this graph into the MATCH read-back."""
    from github_miner_spark.graph.procedures import call_procedure

    q = re.sub(r"\s+", " ", query.strip())
    m = _ALGO_CALL_RE.match(q)
    if not m:
        raise ValueError(f"not a CALL algo.* statement: {query!r}")
    opts: dict = {}
    for om in _OPT_RE.finditer(m.group("opts") or ""):
        key = om.group(1)
        if om.group(2) is not None:
            opts[key] = om.group(2)
        else:
            raw = om.group(3)
            low = raw.lower()
            if low in ("true", "false"):
                opts[key] = low == "true"
            elif re.fullmatch(r"-?\d+", raw):
                opts[key] = int(raw)
            elif re.fullmatch(r"-?\d*\.\d+", raw):
                opts[key] = float(raw)
            else:
                opts[key] = raw
    wanted_raw = (
        [c.strip() for c in m.group("yield").split(",")] if m.group("yield") else None
    )
    # true .stream semantics: YIELD nodeId, community returns the
    # per-node assignment rows, not the summary (Neo4j's actual
    # algo.*.stream contract; the reference's own text YIELDs summary
    # fields, which the summary branch below serves)
    if (
        m.group("proc").endswith(".stream")
        and wanted_raw
        and set(wanted_raw) <= {"nodeId", "community", "score"}
    ):
        from github_miner_spark.graph.procedures import stream_rows

        return graph, stream_rows(
            graph, m.group("proc"), m.group("label"), m.group("rel"), opts
        ).select(*wanted_raw)
    out, row = call_procedure(graph, m.group("proc"), m.group("label"), m.group("rel"), opts)
    wanted = wanted_raw if wanted_raw else sorted(row)
    missing = [c for c in wanted if c not in row]
    if missing:
        raise ValueError(
            f"{m.group('proc')} cannot YIELD {missing}; available: {sorted(row)}"
        )
    spark = graph.vertices.sparkSession
    types = {bool: "boolean", int: "bigint", float: "double", str: "string"}
    schema = ", ".join(f"{c} {types[type(row[c])]}" for c in wanted)
    return out, spark.createDataFrame([tuple(row[c] for c in wanted)], schema)


def _run_statement(
    graph: PropertyGraph, query: str
) -> tuple[PropertyGraph, DataFrame, bool]:
    """Execute ONE cypher_lite statement. Returns (graph as left by
    the statement, result frame, destructive) — the threaded graph
    carries CALL write:true property write-backs and DELETE removals
    so a script's later statements see them (Neo4j session semantics);
    ``destructive`` marks deletes, which never commit back to the
    caller's graph object (see run_cypher)."""
    q = re.sub(r"\s+", " ", query.strip())
    if _META_CALL_RE.match(q):
        # CALL apoc.meta.graph() (documentation/queries.md:1-4): the
        # schema meta-graph — label nodes, (src_label, rel_type,
        # dst_label) edges with counts (the G9 operator)
        return (
            graph,
            graph.edges.groupBy("src_label", "rel_type", "dst_label")
            .agg(F.count("*").alias("edge_count"))
            .orderBy("src_label", "rel_type", "dst_label"),
            False,
        )
    am = _ALGO_CALL_RE.match(q)
    if am:
        # write:true threads the written graph to the caller — the
        # follow-up MATCH read-back (the reference's two-step
        # workflows, documentation/queries.md:122-125,177-190) sees
        # the property through the plain API (VERDICT r10 item 1; the
        # r4 interim warned-and-discarded here).
        out, frame = apply_cypher_call(graph, q)
        return out, frame, False
    gm = _GEPHI_RE.match(q)
    if gm:
        return graph, _run_gephi_stream(graph, gm), False
    sp = _SHORTEST_RE.match(q)
    if sp:
        return graph, _run_shortest_paths(graph, sp), False
    lp = _LINKPRED_RE.match(q)
    if lp:
        return graph, _run_linkprediction(graph, lp), False
    pe = _PATH_ENUM_RE.match(q)
    if pe and not re.match(
        r"^count\s*\(", pe.group("ret").strip(), re.IGNORECASE
    ) and (
        pe.group("ret").strip() == pe.group("pv")
        or re.search(rf"nodes\s*\(\s*{re.escape(pe.group('pv'))}\s*\)", pe.group("ret"))
    ):
        return graph, _run_path_enumeration(graph, pe), False
    low = q.lower()
    for marker, hint in _UNSUPPORTED.items():
        if marker in low:
            raise NotImplementedError(f"cypher_lite does not cover {marker!r} — {hint}")
    if re.search(r"\b(detach\s+)?delete\b", low):
        # Writes return Neo4j-style update counters (one row); the
        # mutated graph threads to later script statements and stays
        # available via graph.mutations.apply_cypher_deletes.
        from github_miner_spark.graph.mutations import (
            apply_cypher_deletes,
            delete_counters_df,
        )

        result = apply_cypher_deletes(graph, q)
        return (
            result.graph,
            delete_counters_df(graph.vertices.sparkSession, result),
            True,
        )

    # group clauses into WITH-terminated segments + the final RETURN;
    # a WHERE directly after a WITH filters the WITH rows (Cypher's
    # post-projection filter, incl. the HAVING-like form over aggs)
    clauses = _scan_clauses(q)
    segments: list[list] = []  # [blocks, kw, text, post_where, unwinds]
    blocks: list[_Block] = []
    unwinds: list[tuple[str, str]] = []
    for kw, text in clauses:
        if kw in ("MATCH", "OPTIONAL MATCH"):
            blocks.append(_Block(kind=kw, match_text=text))
        elif kw == "UNWIND":
            um = re.match(r"^(?P<expr>.+?)\s+AS\s+(?P<var>\w+)$", text, re.IGNORECASE)
            if not um:
                raise ValueError(f"unparseable UNWIND clause: {text!r}")
            unwinds.append((um.group("expr").strip(), um.group("var")))
        elif kw == "WHERE":
            if blocks:
                if blocks[-1].where_text is not None:
                    raise ValueError(
                        "WHERE must follow a MATCH / OPTIONAL MATCH / WITH clause"
                    )
                blocks[-1].where_text = text
            elif segments and segments[-1][1] == "WITH" and segments[-1][3] is None:
                segments[-1][3] = text
            else:
                raise ValueError(
                    "WHERE must follow a MATCH / OPTIONAL MATCH / WITH clause"
                )
        else:  # WITH / RETURN
            segments.append([blocks, kw, text, None, unwinds])
            blocks = []
            unwinds = []
    if blocks or unwinds or not segments or segments[-1][1] != "RETURN":
        raise ValueError(
            "query must be (MATCH|OPTIONAL MATCH) ... [WHERE ...] "
            "[WITH ... [WHERE ...]]* RETURN ... [ORDER BY ...] [LIMIT n]"
        )
    if any(kw != "WITH" for _b, kw, _t, _w, _u in segments[:-1]):
        raise ValueError("RETURN must be the final clause")

    anon = [0]
    carried: DataFrame | None = None
    carried_names: set[str] = set()
    carried_single = True
    carried_nodes: set[str] = set()
    for seg_blocks, kw, proj_text, post_where, seg_unwinds in segments:
        out, out_names, single_row, node_vars = _exec_segment(
            graph,
            seg_blocks,
            kw,
            proj_text,
            carried,
            carried_names,
            anon,
            carried_single=carried_single,
            carried_nodes=carried_nodes,
            post_where=post_where,
            unwinds=seg_unwinds,
        )
        if kw == "RETURN":
            return graph, out, False
        # Cypher WITH scoping: only the listed items survive
        carried, carried_names = out, out_names
        carried_single = single_row
        carried_nodes = node_vars
    raise AssertionError("unreachable")


def _commit_write_back(graph: PropertyGraph, written: PropertyGraph) -> None:
    """Adopt a procedure property write-back in place — the engine's
    analog of a Neo4j plugin committing ``writeProperty`` to the
    database (reference documentation/queries.md:122-125, 177-182:
    ``CALL algo.* {write:true, writeProperty:...}`` followed by a
    plain MATCH that reads the property). After ``run_cypher``
    executes a write:true CALL, subsequent queries against the SAME
    graph object see the written column, exactly as a follow-up Neo4j
    query would. Only additive property write-backs commit this way
    (the vertex id set and the edge table are unchanged — readers
    holding the pre-write frames are unaffected); destructive writes
    (DELETE) never mutate the caller's graph and chain via
    graph.mutations or a multi-statement script instead. PropertyGraph
    is a frozen dataclass, so the commit goes through
    object.__setattr__ — this helper is the ONE sanctioned mutation
    site, scoped to the Cypher front-end where the Neo4j database
    semantics live."""
    object.__setattr__(graph, "vertices", written.vertices)
    object.__setattr__(graph, "edges", written.edges)


def run_cypher_script(
    graph: PropertyGraph, script: str
) -> tuple[PropertyGraph, DataFrame]:
    """Execute a ``;``-separated Cypher script with Neo4j session
    semantics: each statement sees the graph as left by the previous
    one — CALL write:true property write-backs AND deletes both thread
    (the reference's multi-step workflows run as one script, e.g.
    documentation/queries.md:122-143 step 1 + step 2). Returns (graph
    after all writes, last statement's result frame). The caller's
    graph object is NOT mutated — chain the returned graph, or go
    through :func:`run_cypher` for the in-place write-back commit."""
    stmts = _split_top_level(script, ";")
    if not stmts:
        raise ValueError("empty Cypher script")
    frame: DataFrame | None = None
    for s in stmts:
        graph, frame, _destructive = _run_statement(graph, s)
    return graph, frame


def run_cypher(graph: PropertyGraph, query: str) -> DataFrame:
    """Execute a cypher_lite query (or ``;``-separated script) against
    the property graph; returns the last statement's result frame.

    Write semantics mirror Neo4j's stateful database where that is
    safe for an engine over immutable DataFrames: a ``CALL algo.*
    {write:true, writeProperty:...}`` statement commits the property
    write-back to the PASSED graph object in place
    (:func:`_commit_write_back` — additive: new vertex column,
    same ids/edges), so the reference's two-step workflows
    (documentation/queries.md:122-125 scc → :137-143 read-back,
    :177-182 pageRank → :185-190 read-back) mutate-then-read through
    this one entry point, as separate calls or as one script. DELETE
    statements return Neo4j-style update counters and thread within
    the script they appear in, but never mutate the caller's graph —
    destructive writes stay explicit (graph.mutations /
    run_cypher_script); a script mixing deletes with write-backs is
    treated as delete-bearing and commits nothing."""
    stmts = _split_top_level(query, ";")
    if not stmts:
        raise ValueError("empty Cypher query")
    g = graph
    frame: DataFrame | None = None
    wrote_props = False
    has_delete = False
    for s in stmts:
        g2, frame, destructive = _run_statement(g, s)
        if g2 is not g:
            if destructive:
                has_delete = True
            else:
                wrote_props = True
        g = g2
    if wrote_props and not has_delete and g is not graph:
        _commit_write_back(graph, g)
    return frame


def _exec_segment(
    graph: PropertyGraph,
    seg_blocks: list[_Block],
    kw: str,
    proj_text: str,
    carried: DataFrame | None,
    carried_names: set[str],
    anon: list[int],
    carried_single: bool = True,
    carried_nodes: set[str] = frozenset(),
    post_where: str | None = None,
    unwinds: list[tuple[str, str]] | None = None,
) -> tuple[DataFrame, set[str], bool, set[str]]:
    # unwound vars resolve as plain columns (carried-alias style) in
    # items / WHERE / ORDER BY; they are excluded from the single-row
    # key test below (an unwind multiplies rows)
    orig_carried = set(carried_names)
    carried_names = orig_carried | {v for _e, v in (unwinds or [])}

    # WITH and RETURN share the projection grammar: [DISTINCT] items
    # [ORDER BY ...] [SKIP n] [LIMIT n]. Cypher's WITH subclauses apply
    # in exactly that order, with a trailing WHERE (post_where) last —
    # which is where this function applies it.
    is_final = kw == "RETURN"
    pm = re.match(
        r"^(?P<distinct>DISTINCT )?(?P<ret>.+?)"
        r"(?: ORDER BY (?P<order>.+?))?"
        r"(?: SKIP (?P<skip>\d+))?(?: LIMIT (?P<limit>\d+))?$",
        proj_text,
        re.IGNORECASE,
    )
    if not pm:
        raise ValueError(f"unparseable {kw} clause: {proj_text!r}")
    items_text, distinct = pm.group("ret"), pm.group("distinct")
    order_text, limit_text = pm.group("order"), pm.group("limit")
    skip_text = pm.group("skip")

    for b in seg_blocks:
        _parse_block_patterns(b, anon)
    edge_vars: set[str] = set()
    for b in seg_blocks:
        edge_vars |= b.pat.edge_vars
    # unbounded [*] edges carry path multiplicity in weight columns
    # rather than rows (the closure emits one row per reachable pair);
    # count/sum aggregates fold the weight back in, so
    # `count(n2)` = number of paths, exactly Neo4j's semantics
    mult_names = [v[5] for b in seg_blocks for v in b.pat.varlen if v[5]]
    weight: Column | None = None
    if mult_names:
        weight = F.lit(1).cast("long")
        for mn in mult_names:
            weight = weight * F.coalesce(F.col(mn), F.lit(1))
    # assign each var's property joins to the first block binding it.
    # Exception: a LEADING OPTIONAL MATCH after a row-carrying WITH
    # must not own a CARRIED var's props — its frame has no row for
    # zero-match carried rows, so the property would read NULL after
    # the left-outer merge; those props rejoin on the carried id below
    leading_opt_carried = (
        bool(seg_blocks)
        and seg_blocks[0].kind == "OPTIONAL MATCH"
        and carried is not None
        and not carried_single
    )
    prop_owner: dict[str, _Block] = {}
    for bi, b in enumerate(seg_blocks):
        for v in b.pat.bound_vars():
            if leading_opt_carried and bi == 0 and v in carried_nodes:
                continue
            prop_owner.setdefault(v, b)

    all_node_vars: set[str] = set()
    all_path_vars: set[str] = set()
    for b in seg_blocks:
        all_node_vars |= b.pat.bound_vars()
        all_path_vars |= b.pat.path_vars
    # vars bound by THIS segment's patterns (their props come from the
    # owning block); carried node vars rejoin the vertices table below
    block_bound = set(all_node_vars)
    all_node_vars |= carried_nodes
    # node "properties" for whole-node projections: every vertex column
    # except the internal id/label bookkeeping
    vert_props = [c for c in graph.vertices.columns if c not in ("id", "label")]

    needed: set[tuple[str, str]] = set()
    aggs: list[tuple[Column, str]] = []
    keys: list[tuple[Column, str]] = []
    node_vars_out: set[str] = set()
    exists_items: list[tuple[str, str, tuple[str, ...], bool, str]] = []
    size_items: list[tuple[str, tuple[str, ...], str, str | None, str]] = []
    for item in _split_top_level(items_text, ","):
        raw, _, alias = item.partition(" AS ")
        if not _:
            raw, _, alias = item.partition(" as ")
        raw = raw.strip()
        alias = alias.strip()
        # count(p) over a path variable counts matched paths — exactly
        # count(*) with multiplicity folding; rewrite before the
        # path-value check so only VALUE references of p raise
        cp = re.match(r"^count\s*\(\s*(\w+)\s*\)$", raw, re.IGNORECASE)
        if cp and cp.group(1) in all_path_vars:
            raw = "count(*)"
        if raw in all_path_vars or re.search(r"\bnodes\s*\(", raw, re.IGNORECASE):
            raise NotImplementedError(
                "cypher_lite does not return path values (RETURN p / "
                "nodes(p)) — the engine emits bindings and counts; use "
                "graph.paths.dependency_chains for node-list paths"
            )
        # FLOOR(x) wrapper (reference queries.md:257,265,273-274 apply
        # it to SIZE, where it is the identity on the integer count)
        fm = _FLOOR_RE.match(raw)
        wrap_floor = False
        if fm:
            raw, wrap_floor = fm.group("inner").strip(), True
        sm = _SIZE_RE.match(raw)
        if sm:
            i = len(size_items)
            flag = f"__size_{i}"
            direction = "in" if sm.group("in") else ("out" if sm.group("out") else "both")
            size_items.append(
                (sm.group("var"),
                 tuple(r.strip() for r in (sm.group("rels") or "").split("|") if r.strip()),
                 direction, sm.group("olabel"), flag)
            )
            col = F.coalesce(F.col(flag), F.lit(0)).cast("long")
            if wrap_floor:
                col = F.floor(col)
            keys.append((col, alias or f"size_{i}"))
            continue
        if raw.upper().startswith("SIZE"):
            raise ValueError(f"unsupported SIZE pattern: {raw!r}")
        if wrap_floor:
            c, dft = _col_ref(raw, edge_vars, needed, carried_names)
            keys.append((F.floor(c.cast("double")).cast("long"), alias or dft))
            continue
        pm2 = _PROPS_RE.match(raw)
        if pm2:
            v = pm2.group("var")
            for p in vert_props:
                needed.add((v, p))
            col = F.struct(*[F.col(f"{v}_{p}").alias(p) for p in vert_props])
            keys.append((col, alias or f"properties_{v}"))
            continue
        if (
            raw in all_node_vars
            and raw not in carried_names
            and raw not in edge_vars
        ):
            if not is_final:
                # row-carrying WITH: a bare node var is carried by id
                # ({name}_id column) — later segments re-join it into
                # their MATCH frames on that id and rejoin vertex
                # properties on demand, exactly Neo4j's node scoping
                name = alias or raw
                keys.append((F.col(f"{raw}_id"), f"{name}_id"))
                node_vars_out.add(name)
                continue
            # bare node variable in RETURN: Neo4j returns the node —
            # project a struct of (id, label, properties)
            for p in vert_props:
                needed.add((raw, p))
            needed.add((raw, "label"))
            col = F.struct(
                F.col(f"{raw}_id").alias("id"),
                F.col(f"{raw}_label").alias("label"),
                *[F.col(f"{raw}_{p}").alias(p) for p in vert_props],
            )
            keys.append((col, alias or raw))
            continue
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
            is_distinct = bool(am.group("distinct"))
            if fn == "count" and arg == "*":
                col = (
                    F.coalesce(F.sum(weight), F.lit(0)) if weight is not None else F.count("*")
                )
            else:
                c, _a = _col_ref(arg, edge_vars, needed, carried_names)
                if fn == "count":
                    if is_distinct:
                        col = F.countDistinct(c)
                    elif weight is not None:
                        col = F.coalesce(
                            F.sum(F.when(c.isNotNull(), weight).otherwise(F.lit(0))),
                            F.lit(0),
                        )
                    else:
                        col = F.count(c)
                elif fn == "collect":
                    if weight is not None:
                        raise NotImplementedError(
                            "cypher_lite does not cover collect() over an "
                            "unbounded [*] pattern — use collect(DISTINCT ..) "
                            "or graph.paths closure_path_counts directly"
                        )
                    col = F.sort_array(F.collect_list(c))
                elif fn == "sum":
                    # Cypher: sum over no (non-null) values is 0, not null
                    if weight is not None and not is_distinct:
                        col = F.coalesce(F.sum(c * weight), F.lit(0))
                    else:
                        col = F.coalesce(F.sum(c), F.lit(0))
                elif fn == "avg" and weight is not None and not is_distinct:
                    col = F.sum(c * weight) / F.sum(F.when(c.isNotNull(), weight))
                else:
                    # min/max (and DISTINCT forms) are multiplicity-invariant
                    col = getattr(F, fn)(c)
            aggs.append((col, alias.strip() or fn))
        else:
            c, dft = _col_ref(raw, edge_vars, needed, carried_names)
            keys.append((c, alias.strip() or dft))

    # an aggregate-only WITH carries a single 1-row scope (safe to
    # broadcast-cross-join under later MATCH clauses); any other WITH
    # carries full rows, which later segments join on shared variables
    single_row = bool(aggs) and (
        not keys
        or (carried_single and all(a in orig_carried for _c, a in keys))
    )
    if weight is not None and not aggs and not distinct:
        # checked BEFORE block compilation: the closure operator runs
        # eagerly, so a doomed per-path projection must not execute it
        raise NotImplementedError(
            "cypher_lite returns unbounded [*] matches as reachable "
            "pairs, not per-path rows — add DISTINCT (or count(..) for "
            "path multiplicity), or use graph.paths closure_path_counts"
        )

    # WHERE refs + property-map literals may also need vertex props
    for b in seg_blocks:
        for l, _op, _r in b.filters:
            _col_ref(l, edge_vars, needed, carried_names)
        for var, prop, _lit in b.pat.prop_eq:
            if prop != "id":
                needed.add((var, prop))

    # ORDER BY on a var.prop outside the RETURN list still needs the
    # vertex property joined into the plan (Spark's missing-reference
    # resolution pulls it through the final projection); parse the
    # order tokens now so their prop refs land in ``needed``
    order_tokens: list[tuple[str, bool]] = []
    if order_text:
        aliases = {a for _, a in keys} | {a for _, a in aggs}
        for ob in _split_top_level(order_text, ","):
            token = ob.strip()
            desc = token.upper().endswith(" DESC")
            token = re.sub(r"\s+(DESC|ASC)$", "", token, flags=re.IGNORECASE).strip()
            if token not in aliases:
                _col_ref(token, edge_vars, needed, carried_names)
            order_tokens.append((token, desc))

    # compile blocks: first is the mandatory anchor (a leading OPTIONAL
    # MATCH after a row-carrying WITH left-joins onto the carried rows —
    # Cypher's actual semantics, carried rows drive; with nothing
    # carried it is safe only under aggregate projections, where zero
    # matches and Cypher's single-null-row agree on every aggregate);
    # later OPTIONAL MATCH blocks left-outer join on their shared vars
    bound: DataFrame | None = None
    carried_merged = False
    for b in seg_blocks:
        frame = _compile_block(graph, b, needed, prop_owner, edge_vars)
        if bound is None:
            if b.kind == "OPTIONAL MATCH":
                if carried is not None and not carried_single:
                    # code-review r5: an inner merge here silently
                    # DROPPED carried rows with zero matches; the
                    # carried rows must drive a left-outer join
                    shared = [c for c in carried.columns if c in frame.columns]
                    if not shared:
                        raise NotImplementedError(
                            "OPTIONAL MATCH sharing no variables with the "
                            "carried WITH rows is not supported — compose "
                            "DataFrames directly"
                        )
                    bound = carried.join(frame, shared, "left_outer")
                    carried_merged = True
                    continue
                if not aggs:
                    raise NotImplementedError(
                        "cypher_lite supports a leading OPTIONAL MATCH only "
                        "under aggregate projections (count/sum/...), whose "
                        "zero-match semantics it reproduces exactly"
                    )
                # Cypher: a zero-match OPTIONAL MATCH binds one all-null
                # row, so count(*) = 1 and count(v) = 0 — an empty frame
                # would make count(*) = 0
                if frame.isEmpty():
                    frame = frame.sparkSession.range(1).select(
                        *[
                            F.lit(None).cast(f.dataType).alias(f.name)
                            for f in frame.schema.fields
                        ]
                    )
            bound = frame
            continue
        shared = [c for c in frame.columns if c in bound.columns]
        if b.kind == "OPTIONAL MATCH":
            if not shared:
                raise NotImplementedError(
                    "OPTIONAL MATCH sharing no variables with the preceding "
                    "pattern is not supported — compose DataFrames directly"
                )
            bound = bound.join(frame, shared, "left_outer")
        else:
            bound = bound.join(frame, shared) if shared else bound.crossJoin(frame)
    if bound is None:
        if carried is None and not unwinds:
            raise ValueError("segment has no MATCH clause and nothing carried")
        bound = carried  # None stays None for a pure-UNWIND segment
    elif carried is not None and not carried_merged:
        if carried_single:
            # 1-row aggregate scope from previous WITH segments
            bound = bound.crossJoin(F.broadcast(carried))
        else:
            # row-carrying WITH: equi-join the carried rows into this
            # segment's MATCH frame on the shared variable ids (the
            # Cypher pipeline's re-scoping); no shared vars = the
            # cartesian Cypher itself prescribes
            shared = [c for c in carried.columns if c in bound.columns]
            bound = bound.join(carried, shared) if shared else bound.crossJoin(carried)

    # vertex properties of carried node vars not re-bound by this
    # segment's own patterns (e.g. WITH a ... RETURN a.name): rejoin
    # the vertices table on the carried id — the same broadcast-join
    # shape _compile_block uses for block-owned vars
    carried_prop_needs: dict[str, set[str]] = {}
    for var, prop in needed:
        if var in carried_nodes and var not in prop_owner:
            carried_prop_needs.setdefault(var, set()).add(prop)
    for var in sorted(carried_prop_needs):
        props = sorted(p for p in carried_prop_needs[var] if p != "id")
        cols = [F.col("id").alias(f"{var}_id")] + [
            (
                F.col(p) if p in graph.vertices.columns else F.lit(None).cast("string")
            ).alias(f"{var}_{p}")
            for p in props
        ]
        bound = bound.join(
            F.broadcast(graph.vertices.select(*cols)), f"{var}_id", "left_outer"
        )

    # UNWIND: explode a literal list or a carried/collected list column
    # into rows bound to the given variable (applied after this
    # segment's pattern joins — list elements are VALUES, not nodes)
    for expr, var in unwinds or []:
        if re.match(r"^\[.*\]$", expr):
            body = expr[1:-1].strip()
            if not body:
                # Neo4j: UNWIND [] produces zero rows (element type is
                # unobservable on an empty list; bigint placeholder)
                arr = F.array().cast("array<bigint>")
            else:
                arr = F.array(
                    *[F.lit(_literal(t.strip())) for t in _split_top_level(body, ",")]
                )
        elif bound is not None and expr in bound.columns:
            arr = F.col(expr)
        else:
            raise ValueError(
                f"UNWIND references {expr!r}, which is not a carried list "
                "in scope — carry it through WITH (e.g. collect(..) AS xs)"
            )
        if bound is None:
            bound = graph.vertices.sparkSession.range(1).select(
                F.explode(arr).alias(var)
            )
        else:
            bound = bound.withColumn(var, F.explode(arr))

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

    # SIZE((n)-[:R]->(:L)) degree expressions: one groupBy-count per
    # distinct pattern, left-joined on the anchor var (missing -> 0 via
    # the projection's coalesce) — the same degree-view plan the
    # dedicated operators use (queries/graph_queries.py A1/A7)
    for var, rels, direction, olabel, flag in size_items:
        if f"{var}_id" not in bound.columns:
            raise ValueError(f"SIZE pattern references unbound variable {var!r}")
        e = graph.edges
        if rels:
            e = e.filter(F.col("rel_type").isin(*rels))
        ends = []
        if direction in ("out", "both"):
            ends.append(("src", "dst"))
        if direction in ("in", "both"):
            ends.append(("dst", "src"))
        frames = []
        for anchor, other in ends:
            f_ = e
            if olabel:
                lab = graph.vertices.filter(F.col("label") == olabel).select(
                    F.col("id").alias(other)
                )
                f_ = f_.join(F.broadcast(lab), other)
            frames.append(f_.select(F.col(anchor).alias(f"{var}_id")))
        allf = frames[0] if len(frames) == 1 else frames[0].unionByName(frames[1])
        deg = allf.groupBy(f"{var}_id").agg(F.count("*").alias(flag))
        bound = bound.join(deg, f"{var}_id", "left_outer")

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
        if distinct:
            out = out.distinct()

    if order_tokens:
        aliases = {a for _, a in keys} | {a for _, a in aggs}
        order_cols = []
        ob_tmp: list[str] = []
        for token, desc in order_tokens:
            if token in aliases:
                col = F.col(token)
            else:
                vp = re.match(r"^(\w+)\.(\w+)$", token)
                cname = (
                    (f"{vp.group(1)}_id" if vp.group(2) == "id" else f"{vp.group(1)}_{vp.group(2)}")
                    if vp
                    else None
                )
                if cname and cname in out.columns:
                    col = F.col(cname)
                elif vp and f"{vp.group(1)}_id" in out.columns:
                    # ORDER BY on a node var's property that did not
                    # survive the projection/aggregate (e.g. WITH m,
                    # count(r) AS deg ORDER BY m.name): rejoin it from
                    # the vertices table on the carried id, order, and
                    # drop the helper column after SKIP/LIMIT
                    var, prop = vp.group(1), vp.group(2)
                    tmp = f"__ob_{var}_{prop}"
                    vcol = (
                        F.col(prop)
                        if prop in graph.vertices.columns
                        else F.lit(None).cast("string")
                    )
                    out = out.join(
                        F.broadcast(
                            graph.vertices.select(
                                F.col("id").alias(f"{var}_id"), vcol.alias(tmp)
                            )
                        ),
                        f"{var}_id",
                        "left_outer",
                    )
                    ob_tmp.append(tmp)
                    col = F.col(tmp)
                else:
                    col = _col_ref(token, edge_vars, set(), carried_names)[0]
            order_cols.append(col.desc() if desc else col.asc())
        out = out.orderBy(*order_cols)
    if skip_text:
        out = out.offset(int(skip_text))
    if limit_text:
        out = out.limit(int(limit_text))
    if order_tokens and ob_tmp:
        out = out.drop(*ob_tmp)

    new_names = {a for _, a in keys} | {a for _, a in aggs}

    if post_where:
        # WITH ... WHERE: filter the projected rows. References resolve
        # against the WITH output — an alias (incl. aggregate aliases,
        # Cypher's HAVING form), a carried column, or a node var's
        # vertex property rejoined on demand and dropped after the
        # filter.
        for cond in _split_top_level(post_where, " AND "):
            cm = re.match(
                r"^(?P<l>[\w.()]+) \s*(?P<op><>|<=|>=|=|<|>)\s* (?P<r>.+)$",
                cond.strip(),
                re.VERBOSE,
            )
            if not cm:
                raise ValueError(f"unsupported WITH..WHERE condition: {cond!r}")
            l, op, r = cm.group("l"), cm.group("op"), cm.group("r")
            lit = F.lit(_literal(r))
            if l in new_names:
                out = out.filter(_OPS[op](F.col(l), lit))
                continue
            var, dot, prop = l.partition(".")
            idm = re.match(r"^id\(\s*(\w+)\s*\)$", l)
            if idm:
                var, dot, prop = idm.group(1), ".", "id"
            if not dot:
                raise ValueError(
                    f"WITH..WHERE references {l!r}, which the WITH did not carry"
                )
            cname = f"{var}_id" if prop == "id" else f"{var}_{prop}"
            if cname in out.columns:
                out = out.filter(_OPS[op](F.col(cname), lit))
            elif var in node_vars_out:
                vcol = (
                    F.col(prop)
                    if prop in graph.vertices.columns
                    else F.lit(None).cast("string")
                )
                tmp = f"__pw_{var}_{prop}"
                pv = graph.vertices.select(
                    F.col("id").alias(f"{var}_id"), vcol.alias(tmp)
                )
                out = (
                    out.join(F.broadcast(pv), f"{var}_id", "left_outer")
                    .filter(_OPS[op](F.col(tmp), lit))
                    .drop(tmp)
                )
            else:
                raise ValueError(
                    f"WITH..WHERE references {l!r}, which the WITH did not carry"
                )

    return out, new_names, single_row, node_vars_out
