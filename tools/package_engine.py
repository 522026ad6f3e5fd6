"""Build + drift-check the spark-submit artifact (engine.zip).

    python tools/package_engine.py           # rebuild engine.zip
    python tools/package_engine.py --check   # fail if zip drifted from tree

engine.zip is the ``spark-submit --py-files`` payload (north rule: jobs
launch via spark-submit on a multi-executor cluster). The round-3 ADVICE
flagged a stale artifact — the zip had an operator file from an older
commit — so the build is now a deterministic function of the source tree
and ``--check`` diffs every member byte-for-byte (wired into the test
suite so the artifact cannot drift silently again).
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "webgraph_ans_rs_spark"
ZIP_PATH = os.path.join(REPO, "engine.zip")


def _members() -> list[str]:
    out = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                out.append(os.path.relpath(os.path.join(root, f), REPO))
    return out


def build(path: str = ZIP_PATH) -> int:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in _members():
            z.write(os.path.join(REPO, rel), rel)
    return len(_members())


def check(path: str = ZIP_PATH) -> list[str]:
    """Returns a list of drift complaints (empty = in sync)."""
    problems = []
    if not os.path.exists(path):
        return [f"{path} missing"]
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        tree = set(_members())
        for extra in sorted(names - tree):
            problems.append(f"zip-only member: {extra}")
        for missing in sorted(tree - names):
            problems.append(f"missing from zip: {missing}")
        for rel in sorted(tree & names):
            with open(os.path.join(REPO, rel), "rb") as f:
                if f.read() != z.read(rel):
                    problems.append(f"content drift: {rel}")
    return problems


def main() -> int:
    if "--check" in sys.argv:
        problems = check()
        for p in problems:
            print(f"DRIFT: {p}")
        print("engine.zip in sync" if not problems else f"{len(problems)} drift(s)")
        return 1 if problems else 0
    n = build()
    print(f"engine.zip rebuilt: {n} members")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
