"""Regenerate the witness-count sentence in README.md from the
CORRECTNESS_r*.json artifacts and the live registry — counts are
computed, never hand-written (VERDICT r6 "What's wrong" #4a).

Usage: python tools/sync_readme_counts.py   (from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- witness-counts:begin"
END = "<!-- witness-counts:end -->"


def main() -> int:
    sys.path.insert(0, REPO)
    from github_miner_spark.registry import all_specs

    registered = set(all_specs())
    artifacts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    union: set[str] = set()
    for path in artifacts:
        union |= set(json.load(open(path)).keys())
    witnessed = union & registered
    rounds = [re.search(r"CORRECTNESS_(r\d+)", p).group(1) for p in artifacts]
    span = f"{rounds[0]}–{rounds[-1]}" if len(rounds) > 1 else rounds[0]
    every = (
        " (every query green at least once)."
        if len(witnessed) == len(registered)
        else f" ({len(registered) - len(witnessed)} not yet witnessed)."
    )
    sentence = (
        f"  the CORRECTNESS_{span} artifact union witnesses "
        f"{len(witnessed)} of the {len(registered)}\n"
        f"  registered queries{every}"
    )

    readme = os.path.join(REPO, "README.md")
    text = open(readme).read()
    pattern = re.compile(
        re.escape(BEGIN) + r".*?-->\n(.*?)\n  " + re.escape(END), re.DOTALL
    )
    m = pattern.search(text)
    if not m:
        print("witness-counts markers not found in README.md", file=sys.stderr)
        return 1
    new = text[: m.start(1)] + sentence + text[m.end(1) :]
    if new != text:
        open(readme, "w").write(new)
        print(f"README.md witness counts updated: {len(witnessed)}/{len(registered)} ({span})")
    else:
        print(f"README.md witness counts already current: {len(witnessed)}/{len(registered)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
