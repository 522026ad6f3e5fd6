"""Reference-copy codec (BV copy-block lever above parquet): losslessness,
window/chain contracts, determinism, parquet cycle.

The driver gate re-proves losslessness against the DuckDB successors
oracle (`successors_refs`); the storage win is measured in bench.py
(cnr-2000: 4.03 bits/link refs vs 6.86 gaps) — these tests pin the codec
contracts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from webgraph_ans_rs_spark.operators.graph_build import build_csr_adjacency
from webgraph_ans_rs_spark.operators.refcodec import (
    _apply_blocks,
    _mask_runs,
    decode_refs,
    encode_refs,
    successors_from_refs,
)


def _weblike_edges(spark, n=1500, seed=3):
    rng = random.Random(seed)
    rows = []
    for x in range(n):
        base = set(range(x + 1, min(x + 1 + rng.randrange(0, 6), n)))
        if rng.random() < 0.6 and rows:
            base.update(rng.sample(rows[-1][1], min(len(rows[-1][1]), 5)))
        base.update(
            max(0, min(n - 1, x + rng.randrange(-100, 100)))
            for _ in range(rng.randrange(0, 4))
        )
        base.discard(x)
        if base:
            rows.append((x, sorted(base)))
    return spark.createDataFrame(
        [(s, d) for s, l in rows for d in l], "src long, dst long"
    )


def test_mask_runs_blocks_inverse():
    import numpy as np

    rng = random.Random(11)
    for _ in range(200):
        n = rng.randrange(1, 12)
        mask = np.array([rng.random() < 0.5 for _ in range(n)], dtype=bool)
        rl = np.arange(100, 100 + n, dtype=np.int64)
        blocks = _mask_runs(mask)
        assert _apply_blocks(rl, blocks).tolist() == rl[mask].tolist()


def test_roundtrip_dense_weblike(spark):
    edges = _weblike_edges(spark)
    adj = build_csr_adjacency(edges)
    orig = {r.src: r.dsts for r in adj.collect()}
    enc = encode_refs(adj, num_buckets=4).persist()
    got = {r.src: r.dsts for r in decode_refs(enc).collect()}
    assert got == orig
    # the fixture's copy structure must actually exercise the ref path
    assert enc.where(F.col("ref") != 0).count() > 0.15 * len(orig)
    enc.unpersist()


def test_roundtrip_hashed_full_range_ids(spark):
    """Arbitrary int64 ids: gaps wrap mod 2^64 (numpy two's-complement),
    still exactly invertible — the same contract as encode_gaps."""
    edges = _weblike_edges(spark, n=800)
    hashed = edges.select(
        F.xxhash64(F.col("src").cast("string")).alias("src"),
        F.xxhash64(F.col("dst").cast("string")).alias("dst"),
    )
    adj = build_csr_adjacency(hashed)
    orig = {r.src: r.dsts for r in adj.collect()}
    got = {
        r.src: r.dsts
        for r in decode_refs(encode_refs(adj, num_buckets=4)).collect()
    }
    assert got == orig


def test_roundtrip_through_parquet(spark, tmp_path):
    """Encoded table survives a parquet v2 + zstd write/read cycle."""
    edges = _weblike_edges(spark, n=600)
    adj = build_csr_adjacency(edges)
    orig = {r.src: r.dsts for r in adj.collect()}
    p = str(tmp_path / "refs.parquet")
    (
        encode_refs(adj, num_buckets=4)
        .repartition(4, "bucket")
        .sortWithinPartitions("bucket", "src")
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("parquet.writer.version", "v2")
        .parquet(p)
    )
    got = {r.src: r.dsts for r in decode_refs(spark.read.parquet(p)).collect()}
    assert got == orig


def test_ref_chain_depth_bounded(spark):
    """No decode requires following more than max_ref references: replay
    the encoder's chain-depth bookkeeping from the encoded output."""
    max_ref = 3
    edges = _weblike_edges(spark)
    enc = encode_refs(build_csr_adjacency(edges), num_buckets=2, max_ref=max_ref)
    rows = sorted(
        ((r.bucket, r.src, r.ref) for r in enc.collect()),
    )
    depth: dict[int, int] = {}
    for _, src, ref in rows:
        depth[src] = 0 if ref == 0 else depth[src - ref] + 1
        assert depth[src] <= max_ref


def test_references_stay_within_window_rows(spark):
    """Each reference resolves within the previous `window` ROWS of its
    bucket — the retention contract decode_refs relies on."""
    window = 7
    edges = _weblike_edges(spark)
    enc = encode_refs(build_csr_adjacency(edges), num_buckets=2, window=window)
    by_bucket: dict[int, list] = {}
    for r in sorted(enc.collect(), key=lambda r: (r.bucket, r.src)):
        lst = by_bucket.setdefault(r.bucket, [])
        if r.ref != 0:
            recent = [s for s, in lst[-window:]]
            assert r.src - r.ref in recent, (r.src, r.ref)
        lst.append((r.src,))


def test_encode_deterministic(spark):
    edges = _weblike_edges(spark, n=500)
    adj = build_csr_adjacency(edges)
    a = sorted(map(tuple, encode_refs(adj, num_buckets=4).collect()))
    b = sorted(map(tuple, encode_refs(adj, num_buckets=4).collect()))
    assert a == b


def test_point_lookup_on_ref_coded_table(spark):
    """successors_from_refs reads only the [root_src, u] chain slice (one
    pruned job) and matches the full decode — including a u whose list is
    ref-coded (the chain walk actually exercised)."""
    edges = _weblike_edges(spark, n=600)
    adj = build_csr_adjacency(edges)
    orig = {r.src: r.dsts for r in adj.collect()}
    enc = encode_refs(adj, num_buckets=3).persist()
    ref_coded = [r.src for r in enc.where(F.col("ref") != 0).limit(1).collect()]
    probes = [min(orig), max(orig), *ref_coded]
    for u in probes:
        got = successors_from_refs(enc, u).collect()
        assert len(got) == 1 and got[0].dsts == orig[u], u
    absent = max(orig) + 12345
    assert successors_from_refs(enc, absent).collect() == []
    enc.unpersist()


@pytest.mark.parametrize("num_buckets", [1, 3])
def test_bucket_count_only_changes_layout_not_values(spark, num_buckets):
    """Decode result is bucket-count-independent (bucket boundaries only
    reset the window — losslessness never depends on them)."""
    edges = _weblike_edges(spark, n=400)
    adj = build_csr_adjacency(edges)
    orig = {r.src: r.dsts for r in adj.collect()}
    got = {
        r.src: r.dsts
        for r in decode_refs(encode_refs(adj, num_buckets=num_buckets)).collect()
    }
    assert got == orig


def test_batch_point_lookup_on_ref_coded_table(spark):
    """successors_from_refs_batch: one distributed job resolves many
    probes via chain slices; equals per-probe lookups and the full
    decode, including ref-coded rows and a missing probe."""
    from webgraph_ans_rs_spark.operators.refcodec import (
        successors_from_refs_batch,
    )

    edges = _weblike_edges(spark, n=600)
    adj = build_csr_adjacency(edges)
    orig = {r.src: list(r.dsts) for r in adj.collect()}
    enc = encode_refs(adj, num_buckets=3).persist()
    keys = sorted(orig)
    probe_ids = keys[::37] + [max(orig) + 999]
    probes = spark.createDataFrame([(u,) for u in probe_ids], "vertex long")
    got = {
        r.src: list(r.dsts)
        for r in successors_from_refs_batch(enc, probes).collect()
    }
    assert got == {u: orig[u] for u in probe_ids if u in orig}
    enc.unpersist()
