"""Build engine.zip for spark-submit --py-files.

Usage:
  python tools/package_engine.py [out.zip]
  spark-submit --py-files engine.zip jobs/build_adjacency.py ...
  spark-submit --py-files engine.zip jobs/run_pagerank.py ...

Zips the ``webgraph_ans_rs_spark`` package (source only, no caches) so the
jobs/ entry points resolve their imports on every executor of a real
cluster — the deployment shape the north rule specifies.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "webgraph_ans_rs_spark"


def build(out: str) -> int:
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
                n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "engine.zip")
    n = build(out)
    print(f"{out}: {n} files")
