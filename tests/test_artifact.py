"""engine.zip (the spark-submit --py-files payload) must match the source
tree byte-for-byte — the round-3 ADVICE caught it shipping a pre-fix
operator file. Rebuild with tools/package_engine.py after source changes."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from package_engine import check  # noqa: E402


def test_engine_zip_in_sync_with_tree():
    assert check() == []
