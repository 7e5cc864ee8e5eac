#!/usr/bin/env python
"""Window-freshness guard (VERDICT r7 item 1; coverage check added r9).

The driver records CORRECTNESS_r{N}.json from the FIRST 50 entries of
``registry.CORRECTNESS_WINDOW`` at round end. Two failure classes are
guarded, both of which actually happened:

1. ORDERING (round 7): the rotation commit raced later engine commits,
   so windowed "re-greens" witnessed code that was then changed. The
   guard FAILS if any commit after the last ``registry.py`` commit
   touched engine/query source.

2. COVERAGE (round 8): the rotation was correctly LAST, but the same
   commit also rewrote a shared helper (``_hll_estimates``) whose two
   consumer queries were not given window slots — the ordering check
   passed while touched queries went unwitnessed. The guard now derives
   the TOUCHED-QUERY SET from the round's net diff (changed lines →
   enclosing top-level symbols → reverse reachability over a repo-wide
   AST reference graph → registered queries) and FAILS if any touched
   query lacks a slot in the first 50 window entries.

The reference graph is static-AST based: it resolves same-module
top-level names, ``from github_miner_spark.x import y`` (module-level
and function-local), and ``module_alias.attr`` accesses. Dynamic
dispatch (getattr, string table lookups) is invisible to it — the
guard is a tripwire for the observed failure classes, not a proof.
Changed module-level lines that are not inside any top-level def /
class / assignment conservatively touch the whole module (except
import statements, which touch only the symbols referencing the
imported names).

Round start = the most recent driver commit (subject ``round N: ...``),
overridable via SPARK_GRAFT_ROUND_START=<rev>.

Exit 0 = window fresh AND covering; exit 1 = stale or uncovered (the
offending commits / queries are listed).
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE_PATHS = ("github_miner_spark/", "bench.py", "__spark_entry__.py")
PKG = "github_miner_spark"
MODULE_SYM = "<module>"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout


# ---------------------------------------------------------------------------
# symbol graph
# ---------------------------------------------------------------------------


def _path_to_module(path: str) -> str | None:
    if not path.startswith(PKG + "/") or not path.endswith(".py"):
        return None
    mod = path[: -len(".py")].replace("/", ".")
    if mod.endswith(".__init__"):
        mod = mod[: -len(".__init__")]
    return mod


class ModuleInfo:
    """Per-module symbol table: top-level symbol spans, import aliases,
    per-symbol referenced names, and register() decorator bindings."""

    def __init__(self, module: str, tree: ast.Module):
        self.module = module
        # symbol -> list of (start_line, end_line) spans
        self.spans: dict[str, list[tuple[int, int]]] = defaultdict(list)
        # local name -> ("from", source_module, orig_name) |
        #               ("module", module_path)
        self.aliases: dict[str, tuple] = {}
        # symbol -> AST nodes to scan for references
        self._bodies: dict[str, list[ast.AST]] = defaultdict(list)
        # import statement line spans -> local names bound there
        self.import_lines: list[tuple[int, int, list[str]]] = []
        # query name -> symbol (from @register("name", ...) decorators)
        self.queries: dict[str, str] = {}
        self._scan_toplevel(tree)

    def _record_import(
        self, node: ast.AST, into: dict[str, tuple] | None = None
    ) -> list[str]:
        """Record import bindings into ``into`` (default: the module's
        shared alias table — only correct for TOP-LEVEL imports; scans
        of function bodies must pass a scoped overlay, or a local
        import shadowing a module-level alias would misroute every
        symbol scanned afterwards — r9 review finding)."""
        aliases = self.aliases if into is None else into
        names: list[str] = []
        if isinstance(node, ast.ImportFrom) and node.module:
            for a in node.names:
                local = a.asname or a.name
                aliases[local] = ("from", node.module, a.name)
                names.append(local)
        elif isinstance(node, ast.Import):
            for a in node.names:
                local = a.asname or a.name.split(".")[0]
                if a.asname:
                    aliases[local] = ("module", a.name)
                else:
                    # `import pkg.sub.mod` binds `pkg`; attribute chains
                    # on it are resolved textually in _resolve
                    aliases[local] = ("module", a.name.split(".")[0])
                names.append(local)
        return names

    def _scan_toplevel(self, tree: ast.Module) -> None:
        for node in tree.body:
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                locals_ = self._record_import(node)
                self.import_lines.append(
                    (node.lineno, node.end_lineno or node.lineno, locals_)
                )
            elif isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                start = min(
                    [node.lineno] + [d.lineno for d in node.decorator_list]
                )
                self.spans[node.name].append((start, node.end_lineno or start))
                self._bodies[node.name].append(node)
                for dec in node.decorator_list:
                    q = _register_query_name(dec)
                    if q is not None:
                        self.queries[q] = node.name
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets
                    if isinstance(node, ast.Assign)
                    else [node.target]
                )
                for t in targets:
                    for n in ast.walk(t):
                        if isinstance(n, ast.Name):
                            self.spans[n.id].append(
                                (node.lineno, node.end_lineno or node.lineno)
                            )
                            self._bodies[n.id].append(node)

    def symbol_at(self, line: int) -> str | None:
        for name, spans in self.spans.items():
            for lo, hi in spans:
                if lo <= line <= hi:
                    return name
        return None

    def import_names_at(self, line: int) -> list[str] | None:
        for lo, hi, names in self.import_lines:
            if lo <= line <= hi:
                return names
        return None

    def references(
        self, symbol: str
    ) -> tuple[set[str], set[tuple[str, str]], dict[str, tuple]]:
        """(bare names referenced, (alias, attr) attribute accesses,
        function-local import aliases) in the symbol's body,
        decorators included. Local aliases come back as a SCOPED
        overlay rather than being written into the module table, so a
        local import that shadows a module-level alias only affects
        this symbol's resolution."""
        names: set[str] = set()
        attrs: set[tuple[str, str]] = set()
        local_aliases: dict[str, tuple] = {}
        for body in self._bodies.get(symbol, []):
            for n in ast.walk(body):
                if isinstance(n, ast.Name):
                    names.add(n.id)
                elif isinstance(n, ast.Attribute) and isinstance(
                    n.value, ast.Name
                ):
                    attrs.add((n.value.id, n.attr))
                elif isinstance(n, (ast.Import, ast.ImportFrom)):
                    names.update(self._record_import(n, into=local_aliases))
        return names, attrs, local_aliases


def _register_query_name(dec: ast.expr) -> str | None:
    """'name' from a ``@register("name", ...)`` decorator, else None."""
    if (
        isinstance(dec, ast.Call)
        and (
            (isinstance(dec.func, ast.Name) and dec.func.id == "register")
            or (
                isinstance(dec.func, ast.Attribute)
                and dec.func.attr == "register"
            )
        )
        and dec.args
        and isinstance(dec.args[0], ast.Constant)
        and isinstance(dec.args[0].value, str)
    ):
        return dec.args[0].value
    return None


class SymbolGraph:
    """Repo-wide reverse-reference graph over top-level symbols."""

    def __init__(self, sources: dict[str, str]):
        """sources: repo-relative path -> file text (HEAD state)."""
        self.mods: dict[str, ModuleInfo] = {}
        for path, text in sources.items():
            mod = _path_to_module(path)
            if mod is None:
                continue
            try:
                tree = ast.parse(text)
            except SyntaxError:
                continue
            self.mods[mod] = ModuleInfo(mod, tree)
        # dependents[(mod, sym)] = set of (mod, sym) that reference it
        self.dependents: dict[tuple[str, str], set[tuple[str, str]]] = (
            defaultdict(set)
        )
        self._build_edges()

    def _resolve(
        self,
        info: ModuleInfo,
        name: str,
        attr: str | None = None,
        overlay: dict[str, tuple] | None = None,
    ) -> list[tuple[str, str]]:
        """Resolve a referenced name (optionally ``name.attr``) to
        (module, symbol) targets inside the package. ``overlay``
        carries the symbol's function-local import aliases, which
        shadow the module-level table for this resolution only."""
        out: list[tuple[str, str]] = []
        alias = (overlay or {}).get(name) or info.aliases.get(name)
        if alias is None:
            if attr is None and name in info.spans:
                out.append((info.module, name))
            return out
        if alias[0] == "from":
            _, src_mod, orig = alias
            if not src_mod.startswith(PKG):
                return out
            if src_mod in self.mods and orig in self.mods[src_mod].spans:
                # `from mod import symbol` (+ optional .attr on it)
                out.append((src_mod, orig))
            elif f"{src_mod}.{orig}" in self.mods:
                # `from pkg import submodule` — attr picks the symbol
                sub = f"{src_mod}.{orig}"
                if attr and attr in self.mods[sub].spans:
                    out.append((sub, attr))
                else:
                    out.append((sub, MODULE_SYM))
            return out
        # plain `import pkg[.sub] [as m]`
        target_mod = alias[1]
        if not target_mod.startswith(PKG):
            return out
        if attr:
            if target_mod in self.mods and attr in self.mods[target_mod].spans:
                out.append((target_mod, attr))
            elif f"{target_mod}.{attr}" in self.mods:
                out.append((f"{target_mod}.{attr}", MODULE_SYM))
            elif target_mod in self.mods:
                out.append((target_mod, MODULE_SYM))
        elif target_mod in self.mods:
            out.append((target_mod, MODULE_SYM))
        return out

    def _build_edges(self) -> None:
        for mod, info in self.mods.items():
            for sym in list(info.spans):
                src = (mod, sym)
                names, attrs, local_aliases = info.references(sym)
                for n in names:
                    for tgt in self._resolve(info, n, overlay=local_aliases):
                        if tgt != src:
                            self.dependents[tgt].add(src)
                for base, attr in attrs:
                    for tgt in self._resolve(
                        info, base, attr, overlay=local_aliases
                    ):
                        if tgt != src:
                            self.dependents[tgt].add(src)
            # every symbol depends on its module's loose top-level code
            for sym in info.spans:
                self.dependents[(mod, MODULE_SYM)].add((mod, sym))

    def reach_queries(self, seeds: set[tuple[str, str]]) -> set[str]:
        """All registered query names whose symbol can reach a seed."""
        seen = set(seeds)
        stack = list(seeds)
        while stack:
            cur = stack.pop()
            for dep in self.dependents.get(cur, ()):
                if dep not in seen:
                    seen.add(dep)
                    stack.append(dep)
        out: set[str] = set()
        for mod, sym in seen:
            info = self.mods.get(mod)
            if info is None:
                continue
            for qname, qsym in info.queries.items():
                if qsym == sym:
                    out.add(qname)
        return out


# ---------------------------------------------------------------------------
# diff -> touched symbols
# ---------------------------------------------------------------------------


def parse_diff(diff_text: str) -> dict[str, tuple[set[int], set[int]]]:
    """path -> (old-file changed lines, new-file changed lines) from a
    ``git diff -U0 --no-renames`` body. Old-side lines of a DELETED
    file are attributed under its old path (the ``--- a/`` header) —
    the first cut keyed everything off ``+++ b/`` and silently dropped
    deletions, so a removed helper module could ship with no coverage
    seeds at all (r9 review finding)."""
    out: dict[str, tuple[set[int], set[int]]] = {}
    old_path = None
    path = None
    for line in diff_text.splitlines():
        if line.startswith("diff --git"):
            old_path = None
            path = None
        elif line.startswith("--- a/"):
            old_path = line[6:]
        elif line.startswith("--- /dev/null"):
            old_path = None  # file added: no old side
        elif line.startswith("+++ b/"):
            path = line[6:]
            out.setdefault(path, (set(), set()))
        elif line.startswith("+++ /dev/null"):
            # file deleted at HEAD: track under its old path
            path = old_path
            if path is not None:
                out.setdefault(path, (set(), set()))
        elif line.startswith("@@ ") and path is not None:
            m = re.match(r"@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@", line)
            if not m:
                continue
            a, b = int(m.group(1)), int(m.group(2) or "1")
            c, d = int(m.group(3)), int(m.group(4) or "1")
            old, new = out[path]
            old.update(range(a, a + b))
            new.update(range(c, c + d))
    return out


def touched_symbols(
    changes: dict[str, tuple[set[int], set[int]]],
    head_graph: SymbolGraph,
    old_sources: dict[str, str],
    head_sources: dict[str, str] | None = None,
) -> set[tuple[str, str]]:
    """Map changed lines to (module, symbol) seeds. New-side lines map
    through the HEAD AST; old-side (deleted) lines map through the
    round-start AST by symbol NAME (names are stable across edits).
    Lines inside import statements touch only the names they bind;
    blank/comment-only lines outside any symbol are inert (an inserted
    function's surrounding blank lines must not escalate to the whole
    module); other out-of-symbol lines conservatively touch the whole
    module."""
    seeds: set[tuple[str, str]] = set()
    old_infos: dict[str, ModuleInfo] = {}
    for path, text in old_sources.items():
        mod = _path_to_module(path)
        if mod is None:
            continue
        try:
            old_infos[mod] = ModuleInfo(mod, ast.parse(text))
        except SyntaxError:
            pass
    line_texts: dict[tuple[str, int], list[str]] = {}
    for side, srcs in (("old", old_sources), ("new", head_sources or {})):
        for path, text in srcs.items():
            line_texts[(path, 0 if side == "old" else 1)] = text.splitlines()

    def _inert(path: str, side: int, line: int) -> bool:
        lines = line_texts.get((path, side))
        if lines is None or not (1 <= line <= len(lines)):
            return False
        s = lines[line - 1].strip()
        return s == "" or s.startswith("#")

    def _map(
        info: ModuleInfo | None, mod: str, path: str, side: int,
        lines: set[int],
    ) -> None:
        if info is None:
            if any(not _inert(path, side, ln) for ln in lines):
                seeds.add((mod, MODULE_SYM))
            return
        for line in lines:
            sym = info.symbol_at(line)
            if sym is not None:
                seeds.add((mod, sym))
                continue
            if _inert(path, side, line):
                continue
            imported = info.import_names_at(line)
            if imported is not None:
                # changed import: touch exactly the symbols referencing
                # the imported names (resolved on the HEAD graph)
                for local in imported:
                    for s in info.spans:
                        names, attrs, _locals = info.references(s)
                        if local in names or any(
                            b == local for b, _ in attrs
                        ):
                            seeds.add((mod, s))
                continue
            seeds.add((mod, MODULE_SYM))

    for path, (old_lines, new_lines) in changes.items():
        mod = _path_to_module(path)
        if mod is None:
            continue
        if mod == f"{PKG}.registry":
            # the rotation itself edits CORRECTNESS_WINDOW; symbol-map
            # normally so edits to register()/QuerySpec still flag, but
            # the window tuple maps to a symbol nothing references
            pass
        _map(head_graph.mods.get(mod), mod, path, 1, new_lines)
        _map(old_infos.get(mod), mod, path, 0, old_lines)
    seeds.discard((f"{PKG}.registry", "CORRECTNESS_WINDOW"))
    return seeds


def _sources_at(rev: str) -> dict[str, str]:
    paths = [
        p
        for p in _git("ls-tree", "-r", "--name-only", rev, PKG).splitlines()
        if p.endswith(".py")
    ]
    return {p: _git("show", f"{rev}:{p}") for p in paths}


def window_names(rev: str = "HEAD") -> list[str]:
    """CORRECTNESS_WINDOW parsed straight from registry.py source at
    ``rev`` (no package import — works at any git state)."""
    src = _git("show", f"{rev}:{PKG}/registry.py")
    tree = ast.parse(src)
    for node in tree.body:
        targets = (
            node.targets
            if isinstance(node, ast.Assign)
            else [node.target]
            if isinstance(node, ast.AnnAssign)
            else []
        )
        if (
            any(
                isinstance(t, ast.Name) and t.id == "CORRECTNESS_WINDOW"
                for t in targets
            )
            and node.value is not None
        ):
            return list(ast.literal_eval(node.value))
    raise RuntimeError("CORRECTNESS_WINDOW not found in registry.py")


def round_start_rev() -> str | None:
    env = os.environ.get("SPARK_GRAFT_ROUND_START")
    if env:
        return env
    out = _git(
        "log", "--format=%H %s", "--extended-regexp",
        "--grep", r"^round [0-9]+", "-1",
    ).strip()
    return out.split(" ", 1)[0] if out else None


def coverage_check() -> list[str]:
    """Messages describing touched-but-unwindowed queries (empty = ok)."""
    start = round_start_rev()
    if start is None:
        return ["coverage: no driver 'round N:' commit found and no "
                "SPARK_GRAFT_ROUND_START set — coverage unchecked"]
    diff = _git(
        "diff", "-U0", "--no-renames", f"{start}..HEAD", "--", PKG + "/"
    )
    changes = parse_diff(diff)
    if not changes:
        return []
    head_sources = _sources_at("HEAD")
    head_graph = SymbolGraph(head_sources)
    old_sources = _sources_at(start)
    seeds = touched_symbols(changes, head_graph, old_sources, head_sources)
    touched = head_graph.reach_queries(seeds)
    window = set(window_names()[:50])
    uncovered = sorted(touched - window)
    if not uncovered:
        return []
    if len(touched) > 50:
        # More touched queries than window slots — full coverage is
        # mechanically impossible, so the satisfiable rule becomes:
        # every one of the 50 slots must go to a TOUCHED query; the
        # remainder is explicit witness debt carried to the next round.
        wasted = sorted(window - touched)
        if not wasted:
            print(
                f"coverage note: {len(touched)} touched queries exceed the "
                f"50 window slots; all 50 slots go to touched queries, "
                f"{len(uncovered)} carried as witness debt: "
                + ", ".join(uncovered)
            )
            return []
        return [
            f"coverage: {len(touched)} touched queries exceed the 50 "
            f"window slots, yet {len(wasted)} slots are spent on "
            "UNTOUCHED queries — reassign them to touched ones:",
            "  wasted slots: " + ", ".join(wasted),
            "  uncovered touched: " + ", ".join(uncovered),
        ]
    return [
        f"coverage: {len(touched)} registered queries are affected by the "
        f"net diff {start[:9]}..HEAD; these {len(uncovered)} lack a slot "
        "in the first 50 CORRECTNESS_WINDOW entries (they would ship "
        "without a post-change driver witness):",
        "  " + ", ".join(uncovered),
    ]


# ---------------------------------------------------------------------------
# ordering check (r8 behavior, root-commit-safe per ADVICE r8)
# ---------------------------------------------------------------------------


def ordering_check() -> list[str]:
    window_commit = _git(
        "log", "-1", "--format=%H", "--", f"{PKG}/registry.py"
    ).strip()
    if not window_commit:
        return []
    net = _git(
        "diff", "--name-only", f"{window_commit}..HEAD", "--", *CODE_PATHS
    ).splitlines()
    if not net:
        return []
    stale = [f"net diff {window_commit[:9]}..HEAD: {', '.join(net)}"]
    later = _git("log", "--format=%H %s", f"{window_commit}..HEAD")
    for line in later.strip().splitlines():
        sha, _, subject = line.partition(" ")
        try:
            # -m --root: merge commits diff vs each parent, the root
            # commit vs the empty tree — no parentless crash (ADVICE r8)
            files = _git(
                "diff-tree", "-r", "-m", "--root", "--name-only",
                "--no-commit-id", sha,
            ).splitlines()
        except subprocess.CalledProcessError:
            stale.append(f"  {sha[:9]} {subject}: (attribution failed)")
            continue
        touched = [
            f
            for f in files
            if any(f == p or f.startswith(p) for p in CODE_PATHS)
        ]
        if touched:
            stale.append(f"  {sha[:9]} {subject}: {', '.join(touched)}")
    return stale


def main() -> int:
    problems: list[str] = []
    stale = ordering_check()
    if stale:
        problems.append(
            "STALE WINDOW: later commits touched engine/query code after "
            "the registry.py rotation — re-rotate (or re-commit) the "
            "window as the round's final code-touching commit:"
        )
        problems.extend("  " + s for s in stale)
    problems.extend(coverage_check())
    if problems:
        for p in problems:
            print(p)
        return 1
    print(
        "window fresh: rotation is the last code-touching commit, and "
        "every query affected by the round's net diff holds a slot in "
        "the first 50 CORRECTNESS_WINDOW entries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
