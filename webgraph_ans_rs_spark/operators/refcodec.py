"""Reference-copy coding for CSR successor lists — the LAST BV lever.

BVGraph's dominant storage win on real web graphs is reference copying:
a node's successor list is coded as a diff against a predecessor's list
within a bounded window — copy-block runs select shared successors, only
the leftovers are gap-coded residuals (reference semantics:
/root/reference/src/bvgraph/mod.rs:13-23 ReferenceOffset/BlockCount/
Blocks; window/ref-chain params /root/reference/src/ans/mod.rs:46-50).
On cnr-2000, 68% of all arcs are copied arcs
(/root/reference/tests/data/cnr-2000/cnr-2000.properties: copiedarcs=
2195145 of arcs=3216152) — the engine's gap codec (graph_build.encode_
gaps) captured the residual lever and the interval codec was measured
and rejected (subsumed by parquet v2 delta pages); this module measures
the copy lever.

Layout above parquet, mirroring rounds 1-3's discipline (no bit fiddling
below the column layer — parquet v2 page encodings + zstd ARE the
entropy coder):

  (bucket, src,
   ref       long        0 = standalone; else src − referenced_src,
   blocks    array<int>  alternating copy/skip run lengths over the
                         referenced list, first run is a copy run (may
                         be 0), trailing run implicit via parity — the
                         exact BVGraph block convention,
   res_gaps  array<long> residual successors gap-coded exactly like
                         encode_gaps: [first − src, gap, gap, …],
   root_src  long        src of the reference-chain BASE (standalone
                         row) — the columnar .pointers/.states analogue
                         that bounds a point read to the ≤ w·r+1 rows in
                         [root_src, src] instead of the bucket prefix)

outdegree is NOT stored — unlike the bit-packed BVGraph stream, the
column layout knows both array lengths, and copied-count follows from
the blocks + referenced list length.

Encode/decode are per-BUCKET sequential passes (applyInPandas with
vectorized numpy inside): window-referenced compression is inherently a
sequential scan — the same shape as the reference's own encoder, which
runs node-by-node with a window of previous lists — so Python here is
the sanctioned "built-ins genuinely can't express it" case, OFF the
query hot path (an ingest-time storage transform; queries decode once
into the plain CSR). Buckets are independent ⇒ encode/decode
parallelize across buckets; the first rows of each bucket simply start
with an empty window (ref=0), the same boundary BVGraph has at node 0.
At 100 TB, choose num_buckets so each bucket is ~128-256 MB — same
sizing rule as the adjacency table's write path.

A referenced list must sit within the previous ``window`` ROWS of the
same bucket and have chain depth < ``max_ref`` (BVGraph maxrefcount;
cnr-2000 uses 3) — decode retains only a window-sized deque.

All arithmetic — residual gaps AND the ref delta — is int64 with
two's-complement wraparound (numpy's native behavior, the same mod-2⁶⁴
contract as graph_build._wrap_sub64), so the codec is lossless on
arbitrary hashed ids spanning the full int64 range, not just dense ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENC_SCHEMA = (
    "bucket int, src long, ref long, blocks array<int>, res_gaps array<long>,"
    " root_src long"
)


def _mask_runs(mask) -> list[int]:
    """Alternating run lengths of a boolean mask with the copy-first
    convention: prepend a 0-length copy run when the mask starts False;
    the trailing run is DROPPED (implicit — decode extends by parity)."""
    import numpy as np

    changes = np.flatnonzero(np.diff(mask.astype(np.int8))) + 1
    bounds = [0, *changes.tolist(), len(mask)]
    runs = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
    if not mask[0]:
        runs = [0, *runs]
    return runs[:-1]


def _apply_blocks(ref_list, blocks: list[int]):
    """Inverse of ``_mask_runs``: the copied elements of ``ref_list``."""
    import numpy as np

    pieces = []
    pos = 0
    copy = True
    for b in blocks:
        if copy:
            pieces.append(ref_list[pos : pos + b])
        pos += b
        copy = not copy
    if copy:  # even #blocks → implicit trailing copy run
        pieces.append(ref_list[pos:])
    if not pieces:
        return ref_list[:0]
    return np.concatenate(pieces)


def _encode_rows(srcs, dsts_seq, window: int, max_ref: int, reset_every=None):
    """Shared encode loop: for each (src, dsts) in src order, pick the
    cheapest window reference (or standalone) and yield

        (src, off, ref_src, blocks, gaps, cur, root_src)

    where ``off`` is the WINDOW OFFSET (0 = standalone, k = the list k
    rows back — what a bit stream codes, BVGraph's ReferenceOffset),
    ``ref_src`` the referenced src (== src when standalone), ``gaps`` the
    residual successors gap-coded mod 2⁶⁴, ``cur`` the full decoded list
    and ``root_src`` the src of the chain BASE (the standalone row a
    point read must start decoding from — the columnar analogue of the
    reference's .pointers/.states O(1) entry,
    /root/reference/src/bvgraph/random_access.rs:84-221).
    ``reset_every``: forget the window every N rows (bit-packed chunks
    decode independently)."""
    import numpy as np

    win: list = []  # (src, list, chain depth, root_src)
    for i, (src, dsts) in enumerate(zip(srcs, dsts_seq)):
        if reset_every is not None and i % reset_every == 0:
            win = []
        cur = np.asarray(dsts, dtype=np.int64)
        # enforce the sorted+distinct precondition LOUDLY: the copy search
        # uses assume_unique set math and the bit packer writes gap-1 (a
        # zero gap underflows to 2^64-2), so one duplicate edge row from a
        # caller would silently decode to a DIFFERENT graph. Direct
        # element comparison — np.diff could wrap on full-range int64s.
        if len(cur) > 1 and bool((cur[1:] <= cur[:-1]).any()):
            raise ValueError(
                f"encode_refs: dsts of src={src} are not strictly "
                "increasing (sorted, duplicate-free) — feed distinct "
                "(src, dst) edges or array_distinct the lists first"
            )
        d = len(cur)
        best_cost = d  # standalone cost: d residual gaps
        best = None  # (off, ref_src, ref_list, mask, blocks, depth, root)
        for k, (rs, rl, dep, rroot) in enumerate(reversed(win)):
            if dep >= max_ref or len(rl) == 0:
                continue
            mask = np.isin(rl, cur, assume_unique=True)
            common = int(mask.sum())
            if common == 0:
                continue
            blocks = _mask_runs(mask)
            cost = 1 + len(blocks) + (d - common)
            # strict < : prefer standalone on ties (cheaper decode);
            # candidates scan most-recent-first, so equal-cost refs tie-
            # break to the SMALLEST delta deterministically
            if cost < best_cost:
                best_cost = cost
                best = (k + 1, rs, rl, mask, blocks, dep, rroot)
        if best is None:
            off, ref_src, depth, blocks, res, root = 0, src, 0, [], cur, src
        else:
            off, rs, rl, mask, blocks, dep, rroot = best
            ref_src = rs
            depth = dep + 1
            root = rroot
            # copied values keep the referenced list's (sorted) order
            res = np.setdiff1d(cur, rl[mask], assume_unique=True)
        gaps = np.empty(len(res), dtype=np.int64)
        if len(res):
            # int64 wraparound is the CONTRACT (mod-2^64 gaps, invertible
            # by wrapping cumsum) — silence numpy's overflow warning
            with np.errstate(over="ignore"):
                gaps[0] = res[0] - src
                gaps[1:] = np.diff(res)
        yield src, off, ref_src, blocks, gaps, cur, root
        win.append((src, cur, depth, root))
        if len(win) > window:
            win.pop(0)


def _encode_pdf(pdf, window: int, max_ref: int):
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("src")
    bkt = int(pdf["_bkt"].iloc[0]) if len(pdf) else 0
    o_src, o_ref, o_blocks, o_res, o_root = [], [], [], [], []
    for src, off, ref_src, blocks, gaps, _cur, root in _encode_rows(
        pdf["src"].tolist(), pdf["dsts"].to_numpy(), window, max_ref
    ):
        with np.errstate(over="ignore"):
            ref = 0 if off == 0 else np.int64(src) - np.int64(ref_src)
        o_src.append(src)
        o_ref.append(int(ref))
        o_blocks.append([int(b) for b in blocks])
        o_res.append(gaps.tolist())
        o_root.append(int(root))
    return pd.DataFrame(
        {
            "bucket": [bkt] * len(o_src),
            "src": o_src,
            "ref": o_ref,
            "blocks": o_blocks,
            "res_gaps": o_res,
            "root_src": o_root,
        }
    )


def _decode_pdf(pdf, window: int):
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("src")
    win: list[tuple[int, "np.ndarray"]] = []
    o_src, o_dsts = [], []
    for src, ref, blocks, res_gaps in zip(
        pdf["src"].tolist(),
        pdf["ref"].tolist(),
        pdf["blocks"].to_numpy(),
        pdf["res_gaps"].to_numpy(),
    ):
        gaps = np.asarray(res_gaps, dtype=np.int64)
        if len(gaps):
            with np.errstate(over="ignore"):
                res = np.cumsum(gaps) + src  # int64 wraparound == encode's
        else:
            res = gaps
        if ref == 0:
            cur = res
        else:
            # mod-2^64 inverse of encode's wrapped ref = src − ref_src
            with np.errstate(over="ignore"):
                rs = int(np.int64(src) - np.int64(ref))
            rl = None
            for ws, wl in win:
                if ws == rs:
                    rl = wl
                    break
            if rl is None:
                raise ValueError(
                    f"decode_refs: referenced list {rs} for {src} "
                    f"not within the {window}-row window"
                )
            copied = _apply_blocks(rl, list(blocks))
            cur = np.sort(np.concatenate([copied, res]))
        o_src.append(src)
        o_dsts.append(cur.tolist())
        win.append((src, cur))
        if len(win) > window:
            win.pop(0)
    return pd.DataFrame({"src": o_src, "dsts": o_dsts})


def encode_refs(
    adj: DataFrame,
    num_buckets: int = 8,
    window: int = 7,
    max_ref: int = 3,
) -> DataFrame:
    """CSR (src, dsts sorted) → reference-coded layout (see module doc).
    Deterministic: fixed range-bucketing over [min(src), max(src)], fixed
    candidate scan order, ties broken to standalone/smallest delta.

    PRECONDITION (ENFORCED): ``dsts`` arrays must be sorted AND
    duplicate-free (the copy-search uses assume_unique set math).
    build_csr_adjacency collects raw edge rows without dedup — feed it
    distinct (src, dst) edges (every engine query path does; graphs are
    edge SETS), or array_distinct the lists first. _encode_rows raises
    ValueError on the first non-strictly-increasing list, so a violation
    fails the encode job loudly instead of decoding to a different
    graph."""
    mn, mx = adj.agg(F.min("src"), F.max("src")).first()
    if mn is None:
        mn, mx = 0, 0
    span = max(1, (int(mx) - int(mn)) // num_buckets + 1)
    # decimal(38,0) offset arithmetic: full-range hashed ids overflow ANSI
    # long subtraction (span-division of the unsigned offset is exact in
    # decimal — the same wrap-safety contract as graph_build._wrap_sub64)
    off = F.col("src").cast("decimal(38,0)") - F.lit(int(mn)).cast(
        "decimal(38,0)"
    )
    with_bkt = adj.select(
        F.floor(off / F.lit(span).cast("decimal(38,0)")).cast("int").alias("_bkt"),
        "src",
        "dsts",
    )
    return with_bkt.groupBy("_bkt").applyInPandas(
        lambda pdf: _encode_pdf(pdf, window, max_ref), ENC_SCHEMA
    )


def decode_refs(enc: DataFrame, window: int = 7) -> DataFrame:
    """Exact inverse of ``encode_refs`` → (src, dsts array<long> sorted)."""
    return enc.groupBy("bucket").applyInPandas(
        lambda pdf: _decode_pdf(pdf, window), "src long, dsts array<long>"
    )


def _decode_chain(rows: dict, u: int):
    """Decode u's successor list from the src→(ref, blocks, res_gaps) map
    by walking ONLY its reference chain (≤ max_ref hops) — every chain
    member lies in [root_src, u] by construction."""
    import numpy as np

    ref, blocks, res_gaps = rows[u]
    gaps = np.asarray(res_gaps, dtype=np.int64)
    if len(gaps):
        with np.errstate(over="ignore"):
            res = np.cumsum(gaps) + u
    else:
        res = gaps
    if ref == 0:
        return res
    with np.errstate(over="ignore"):
        rs = int(np.int64(u) - np.int64(ref))
    copied = _apply_blocks(_decode_chain(rows, rs), list(blocks))
    return np.sort(np.concatenate([copied, res]))


def successors_from_refs_batch(
    enc: DataFrame, probes: DataFrame, window: int = 7
) -> DataFrame:
    """Batch random access: (vertex) probe frame → (src, dsts) for every
    probe present, in ONE distributed job — the reference's random-access
    protocol shape (examples/bench_random_access.rs:15,28-41 enumerates
    millions of nodes; per-probe driver jobs amortize nothing).

    Plan: resolve each probe's (bucket, root_src) by a broadcast semi
    join, then ONE range join pulls every [root_src, u] chain slice
    (≤ window·max_ref+1 rows per probe), and a per-probe applyInPandas
    walks the chain. Work scales with |probes| × chain size, never with
    bucket size."""
    anchors = enc.join(
        F.broadcast(probes.select(F.col("vertex").alias("_u"))),
        F.col("src") == F.col("_u"),
    ).select("_u", F.col("bucket").alias("_b"), F.col("root_src").alias("_r"))
    slices = enc.join(
        F.broadcast(anchors),
        (F.col("bucket") == F.col("_b"))
        & (F.col("src") >= F.col("_r"))
        & (F.col("src") <= F.col("_u")),
    ).select("_u", "src", "ref", "blocks", "res_gaps")

    def decode_one(pdf):
        import pandas as pd

        u = int(pdf["_u"].iloc[0])
        rows = {
            int(s): (int(r), list(b), list(g))
            for s, r, b, g in zip(
                pdf["src"], pdf["ref"], pdf["blocks"], pdf["res_gaps"]
            )
        }
        dsts = [int(x) for x in _decode_chain(rows, u)]
        return pd.DataFrame({"src": [u], "dsts": [dsts]})

    return slices.groupBy("_u").applyInPandas(
        decode_one, "src long, dsts array<long>"
    )


def successors_from_refs(enc: DataFrame, u: int, window: int = 7) -> DataFrame:
    """Random-access successors(u) on the ref-coded table via the stored
    chain root: ONE job reads only the rows in [u's root_src, u] of u's
    bucket (≤ window·max_ref+1 rows — the chain hops are each ≤ window
    rows back and the chain is ≤ max_ref deep), then walks the reference
    chain driver-side. This is the columnar analogue of the reference's
    .pointers/.states O(1) random-access entry
    (/root/reference/src/bvgraph/random_access.rs:84-221,
    factories/bvgraph_decoder_factory.rs:46-58): the point-read cost is
    the same bucket-pruned scan as the plain-CSR ``successors`` path
    plus a bounded (≤ w·r+1 row) decode, NOT a bucket-prefix decode."""
    spark = enc.sparkSession
    anchor = enc.where(F.col("src") == F.lit(u)).select(
        "bucket", F.col("root_src").alias("_root")
    )
    slice_rows = (
        enc.join(F.broadcast(anchor), "bucket")
        .where((F.col("src") >= F.col("_root")) & (F.col("src") <= F.lit(u)))
        .select("src", "ref", "blocks", "res_gaps")
        .collect()
    )
    if not slice_rows:
        return spark.createDataFrame([], "src long, dsts array<long>")
    rows = {r.src: (r.ref, r.blocks, r.res_gaps) for r in slice_rows}
    dsts = [int(x) for x in _decode_chain(rows, u)]
    return spark.createDataFrame([(u, dsts)], "src long, dsts array<long>")
