#!/usr/bin/env python
"""Window-freshness guard (VERDICT r7 item 1 / "What's wrong" #1).

The driver records CORRECTNESS_r{N}.json from the FIRST 50 entries of
``registry.CORRECTNESS_WINDOW`` at round end. Round 7's window
rotation raced the round's biggest engine commit: the rotation claimed
"re-greens for every implementation round 7 touched", which was true
at rotation time but false by round close — a later commit touched
the engine files behind ~9 windowed queries, leaving them with no
post-change driver witness.

This guard makes that race impossible to miss: it FAILS if any commit
AFTER the last commit that touched ``registry.py`` also touched
engine/query source (``github_miner_spark/**``, ``bench.py``,
``__spark_entry__.py``). Run it as the final act of a round — a clean
exit proves the window rotation was the round's last code-touching
commit, so every windowed re-green really witnesses the shipped
implementation.

Exit 0 = window fresh; exit 1 = stale (the offending commits and
files are listed).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE_PATHS = ("github_miner_spark/", "bench.py", "__spark_entry__.py")


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout.strip()


def main() -> int:
    window_commit = _git(
        "log", "-1", "--format=%H", "--", "github_miner_spark/registry.py"
    )
    if not window_commit:
        print("no commit touches registry.py — nothing to check")
        return 0
    # AUTHORITATIVE check: the NET tree diff from the rotation commit
    # to HEAD. Per-commit file listings miss merge commits entirely
    # (`git show --name-only` prints nothing for them), so a merged
    # branch could smuggle engine changes past a commit-walk; the net
    # diff sees every change regardless of how it landed.
    net = _git(
        "diff", "--name-only", f"{window_commit}..HEAD", "--", *CODE_PATHS
    ).splitlines()
    stale: list[str] = []
    if net:
        stale.append(f"net diff {window_commit[:9]}..HEAD: {', '.join(net)}")
        # best-effort per-commit attribution (first-parent walk; merge
        # commits attribute via their own diff against first parent)
        later = _git("log", "--format=%H %s", f"{window_commit}..HEAD")
        for line in later.splitlines():
            sha, _, subject = line.partition(" ")
            files = _git(
                "diff-tree", "-r", "--name-only", "--no-commit-id",
                f"{sha}^", sha,
            ).splitlines()
            touched = [
                f
                for f in files
                if any(f == p or f.startswith(p) for p in CODE_PATHS)
            ]
            if touched:
                stale.append(f"  {sha[:9]} {subject}: {', '.join(touched)}")
    short = window_commit[:9]
    if stale:
        print(
            f"STALE WINDOW: registry.py last rotated at {short}, but these "
            "later commits touched engine/query code — the windowed "
            "re-greens no longer witness the shipped implementation. "
            "Re-rotate (or re-commit) the window as the round's final "
            "code-touching commit:"
        )
        for s in stale:
            print(" ", s)
        return 1
    print(
        f"window fresh: no engine/query code commit after the registry.py "
        f"rotation commit {short}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
