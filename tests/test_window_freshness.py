"""Tests for tools/check_window_freshness.py — the window rotation
guard (VERDICT r7 item 1 ordering; r8 "What's wrong" #1 coverage).

The coverage check must make the round-8 slip mechanically impossible:
commit c557c50 rewrote the shared helper ``_hll_estimates`` while the
same-commit window rotation added no slots for its two consumer
queries, so they shipped without a post-change driver witness. These
tests pin (a) the diff→symbol→query mapping on synthetic diffs against
the real repo AST, and (b) the end-to-end failure on the actual r8
commit range.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "check_window_freshness.py")

spec = importlib.util.spec_from_file_location("check_window_freshness", TOOL)
cwf = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cwf)


def _working_tree_sources() -> dict[str, str]:
    out: dict[str, str] = {}
    pkg_dir = os.path.join(REPO, "github_miner_spark")
    for root, _, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                with open(full) as fh:
                    out[rel] = fh.read()
    return out


@pytest.fixture(scope="module")
def sources():
    return _working_tree_sources()


@pytest.fixture(scope="module")
def graph(sources):
    return cwf.SymbolGraph(sources)


def _span_of(graph, module: str, symbol: str) -> tuple[int, int]:
    spans = graph.mods[module].spans[symbol]
    assert spans, f"{module}.{symbol} not found"
    return spans[0]


def _touched(graph, sources, path: str, line: int) -> set[str]:
    changes = {path: (set(), {line})}
    seeds = cwf.touched_symbols(changes, graph, {}, sources)
    return graph.reach_queries(seeds)


def test_parse_diff_hunks():
    diff = (
        "diff --git a/github_miner_spark/x.py b/github_miner_spark/x.py\n"
        "--- a/github_miner_spark/x.py\n"
        "+++ b/github_miner_spark/x.py\n"
        "@@ -10,2 +11,3 @@ def f():\n"
        "-a\n-b\n+c\n+d\n+e\n"
        "@@ -20 +22,0 @@ def g():\n"
        "-z\n"
    )
    got = cwf.parse_diff(diff)
    old, new = got["github_miner_spark/x.py"]
    assert old == {10, 11, 20}
    assert new == {11, 12, 13}


def test_intra_module_helper_maps_to_consumers(graph, sources):
    """The r8 slip, synthetically: a change INSIDE _hll_estimates (a
    helper no oracle names) must flag both registered HLL queries."""
    lo, hi = _span_of(
        graph, "github_miner_spark.queries.text_queries", "_hll_estimates"
    )
    touched = _touched(
        graph, sources, "github_miner_spark/queries/text_queries.py", lo + 2
    )
    assert {"hll_vocab_estimates", "hll_shingle_estimates"} <= touched


def test_cross_module_shared_algebra_maps_transitively(graph, sources):
    """functions/text.py hll_estimate_expr is the shared HLL algebra:
    touching it must flag the token/shingle consumers AND HyperANF."""
    lo, hi = _span_of(
        graph, "github_miner_spark.functions.text", "hll_estimate_expr"
    )
    touched = _touched(
        graph, sources, "github_miner_spark/functions/text.py", lo + 1
    )
    assert {
        "hll_vocab_estimates",
        "hll_shingle_estimates",
        "anf_neighborhood_function",
    } <= touched


def test_registered_query_maps_to_itself(graph, sources):
    lo, hi = _span_of(
        graph, "github_miner_spark.queries.relational", "pricing_summary"
    )
    touched = _touched(
        graph, sources, "github_miner_spark/queries/relational.py", lo + 1
    )
    assert "pricing_summary" in touched


def test_blank_and_comment_lines_are_inert(graph, sources):
    """Inserted blank/comment lines between top-level defs must not
    escalate to whole-module touches (the first cut flagged 70 queries
    for a 4-query commit exactly this way)."""
    path = "github_miner_spark/queries/text_queries.py"
    lines = sources[path].splitlines()
    info = graph.mods["github_miner_spark.queries.text_queries"]
    inert_line = next(
        i + 1
        for i, txt in enumerate(lines)
        if txt.strip() == ""
        and info.symbol_at(i + 1) is None
        and info.import_names_at(i + 1) is None
    )
    changes = {path: (set(), {inert_line})}
    seeds = cwf.touched_symbols(changes, graph, {}, sources)
    assert seeds == set()


def test_window_tuple_edits_are_exempt(graph, sources):
    """Rotating CORRECTNESS_WINDOW itself must not flag every query."""
    path = "github_miner_spark/registry.py"
    lo, hi = _span_of(
        graph, "github_miner_spark.registry", "CORRECTNESS_WINDOW"
    )
    changes = {path: (set(), {lo + 1})}
    seeds = cwf.touched_symbols(changes, graph, {}, sources)
    assert (
        "github_miner_spark.registry",
        "CORRECTNESS_WINDOW",
    ) not in seeds
    assert not graph.reach_queries(seeds)


def test_r8_slip_fails_end_to_end():
    """The actual round-8 commit range: starting the round just before
    c557c50 (the _hll_estimates rewrite), the r8-shipped window lacks
    the two HLL queries — the tool must exit 1 and name them. Skipped
    if the historical SHA is absent (e.g. a shallow clone)."""
    probe = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--quiet", "--verify", "c557c50^"],
        capture_output=True,
        text=True,
    )
    if probe.returncode != 0:
        pytest.skip("historical commit c557c50 not in this clone")
    env = dict(os.environ, SPARK_GRAFT_ROUND_START="c557c50^")
    proc = subprocess.run(
        [sys.executable, TOOL], env=env, capture_output=True, text=True
    )
    # Ordering may be fresh or stale depending on when this runs within
    # a round; the COVERAGE verdict is what this test pins. If the
    # current window has rotated to include the HLL pair, the touched
    # set may legitimately be covered — then assert the positive path
    # against the r8-era window instead.
    window = cwf.window_names("HEAD")[:50]
    if "hll_vocab_estimates" in window and "hll_shingle_estimates" in window:
        pytest.skip("current window already covers the r8 pair")
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "hll_vocab_estimates" in proc.stdout
    assert "hll_shingle_estimates" in proc.stdout


def test_parse_diff_deleted_file():
    """Old-side lines of a DELETED file must be attributed under its
    old path — the first cut keyed off '+++ b/' and dropped deletions
    entirely (r9 review finding), so a removed helper module could
    ship with no coverage seeds."""
    diff = (
        "diff --git a/github_miner_spark/keep.py b/github_miner_spark/keep.py\n"
        "--- a/github_miner_spark/keep.py\n"
        "+++ b/github_miner_spark/keep.py\n"
        "@@ -5 +5 @@ def f():\n-x\n+y\n"
        "diff --git a/github_miner_spark/gone.py b/github_miner_spark/gone.py\n"
        "--- a/github_miner_spark/gone.py\n"
        "+++ /dev/null\n"
        "@@ -1,3 +0,0 @@\n-a\n-b\n-c\n"
        "diff --git a/github_miner_spark/new.py b/github_miner_spark/new.py\n"
        "--- /dev/null\n"
        "+++ b/github_miner_spark/new.py\n"
        "@@ -0,0 +1,2 @@\n+p\n+q\n"
    )
    got = cwf.parse_diff(diff)
    assert got["github_miner_spark/keep.py"] == ({5}, {5})
    assert got["github_miner_spark/gone.py"] == ({1, 2, 3}, set())
    assert got["github_miner_spark/new.py"] == (set(), {1, 2})


def test_local_import_does_not_shadow_module_alias(graph):
    """A function-local import must not rewrite the module-wide alias
    table (it would misroute resolution for every symbol scanned
    afterwards)."""
    info = graph.mods["github_miner_spark.queries.text_queries"]
    before = dict(info.aliases)
    for sym in list(info.spans):
        info.references(sym)
    assert info.aliases == before
