"""Neighbourhood function: exact BFS-ball counting and HyperBall (HLL).

The neighbourhood function NF(t) = #{(v,u) : dist(v,u) ≤ t} is THE
companion statistic of the WebGraph toolchain (Boldi–Vigna HyperBall runs
over exactly the BVGraph successor lists the reference compresses; the
reference's graphs ship with .properties recording it). Two forms:

* ``neighborhood_function_exact`` — materializes the reachability pairs
  per round (distinct-join loop). Exact, but pair-set size is O(sum of
  ball sizes): fine for calibration and small graphs, quadratic blowup on
  well-connected ones — that blowup is the entire reason HyperBall
  exists.

* ``hyperball`` — per-vertex HyperLogLog registers, max-merged along OUT
  edges each superstep. m = 2^p registers are laid out as m COLUMNS, so
  a superstep is one edges⋈regs join + groupBy(src).agg(max per column):
  all-JVM, map-side partial max (hub fan-in collapses before the
  shuffle), two bounded exchanges per superstep (gather by dst, regroup
  by src; pre-partitioning a transposed CSR by dst would drop it to one,
  the PageRank-loop discipline — left as the scale optimization knob).
  Estimates use the standard HLL harmonic mean with
  the linear-counting small-range correction (dominant here: at small t
  most balls hold a handful of vertices). Column layout is comfortable to
  p≈8 (256 agg expressions); beyond that the ARRAY-PACKED layout
  (``hyperball_packed``) stores all m registers in one array<tinyint>
  column with an explicit map-side combine + zip_with(greatest) final
  merge — frame width constant in p, precision unbounded (p=10+
  web-scale runs), and int8 is what crosses the Arrow boundary.

  The register hash is a double multiplicative hash in pure int64
  arithmetic and rho comes from ``length(bin(w))`` (exact integer bit
  length, never float log2) — DETERMINISTIC and engine-portable, so
  despite being an approximation the whole computation is reproducible in
  DuckDB and the driver gate hash-compares it (the same trick as
  ``lsh_topk``). The harmonic sums are sums of ≤ m exact powers of two
  (all partial sums fit the 53-bit mantissa — exact in ANY order); the
  only float freedom left is libm ``ln``/division ulps and the NF sum
  order, ~1e-15 relative, far below the 4dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 32-bit xor-shift/multiply mix (lowbias32-style finalizer). Domain: ANY
# int64 vertex id — the id is first reduced mod 2^32 (pmod, negative-safe)
# and every multiplier is < 2^31, so every product stays < 2^63 in both
# ANSI Spark and DuckDB. Pure multiplicative hashing alone left registers
# of near-consecutive ids correlated and HyperBall 29% off at t=3 — the
# mix brings it back inside the HLL envelope, pytest-calibrated.
HB_A1, HB_B1 = 0x61C88647, 7  # 1640531527 (32-bit golden ratio, public)
HB_C1 = 0x7FEB352D  # 2146121005: (2^32−1)·C1 < 2^63−1
HB_C2 = 0x735A2D97  # 1935289751
HB_M32 = 1 << 32
HB_LIN_FACTOR = 2.5  # linear-counting regime threshold: raw ≤ 2.5·m


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant — single source for engine
    and oracle."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def neighborhood_function_exact(
    edges: DataFrame, verts: DataFrame, max_t: int
) -> DataFrame:
    """(t, nf) for t = 0..max_t, nf = exact # ordered pairs (v, u) with a
    directed path v→u of length ≤ t (pairs include (v, v))."""
    reach = verts.select(
        F.col("vertex").alias("v"), F.col("vertex").alias("u")
    ).localCheckpoint(eager=True)
    rows = [(0, reach.count())]
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("nu"))
    for t in range(1, max_t + 1):
        reach = (
            reach.join(e, "u")
            .select("v", F.col("nu").alias("u"))
            .unionByName(reach)
            .dropDuplicates(["v", "u"])
            .localCheckpoint(eager=True)
        )
        rows.append((t, reach.count()))
    spark = edges.sparkSession
    return spark.createDataFrame(rows, "t int, nf bigint")


def _rho_and_idx(vcol, p: int):
    """HLL mapping of a vertex id: h = 32-bit double multiplicative hash;
    register index = h mod 2^p, rho = 1 + #leading zeros of the remaining
    32−p bits, computed EXACTLY as (33−p) − length(bin(w)) — integer bit
    length, no float log anywhere."""
    x0 = F.pmod(vcol.cast("long"), F.lit(HB_M32))  # negative-safe reduce
    x = F.pmod(x0 * F.lit(HB_A1) + F.lit(HB_B1), F.lit(HB_M32))
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = F.pmod(x * F.lit(HB_C1), F.lit(HB_M32))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    x = F.pmod(x * F.lit(HB_C2), F.lit(HB_M32))
    h = x.bitwiseXOR(F.shiftright(x, 16))
    idx = F.pmod(h, F.lit(1 << p)).cast("int")
    w = F.shiftright(h, p)  # h ≥ 0 → plain shift is the unsigned one
    maxr = 32 - p + 1
    rho = F.when(w == 0, F.lit(maxr)).otherwise(
        (F.lit(33 - p) - F.length(F.bin(w))).cast("int")
    )
    return idx, rho


def _estimate(m: int, reg_cols: list[str]):
    """Standard HLL estimate from register COLUMNS: harmonic mean with the
    linear-counting small-range correction. Exact powers of two in the
    harmonic sum keep cross-engine float drift at rounding level."""
    harm = None
    zeros = None
    for c in reg_cols:
        term = F.pow(F.lit(2.0), -F.col(c).cast("double"))
        harm = term if harm is None else harm + term
        z = F.when(F.col(c) == 0, 1).otherwise(0)
        zeros = z if zeros is None else zeros + z
    raw = F.lit(hll_alpha(m) * m * m) / harm
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= F.lit(HB_LIN_FACTOR * m)) & (zeros > 0), lin).otherwise(raw)


def _init_regs(
    verts: DataFrame, p: int, reg_cols: list[str], eager: bool = True
) -> DataFrame:
    idx, rho = _rho_and_idx(F.col("vertex"), p)
    out = verts.select(
        "vertex",
        *[
            F.when(idx == j, rho).otherwise(0).cast("int").alias(c)
            for j, c in enumerate(reg_cols)
        ],
    )
    # eager=False: plan-only (tools/plan_audit.py inspects the superstep
    # shape without paying a vertices×m materialization)
    return out.localCheckpoint(eager=True) if eager else out


def _superstep_plan(
    e: DataFrame, regs: DataFrame, reg_cols: list[str]
) -> DataFrame:
    """v's ball(t) = v's ball(t-1) ∪ successors' balls(t-1): successor
    registers keyed by the edge's src UNIONed with each vertex's own
    registers as a self-contribution, then ONE groupBy(vertex).max per
    column — the self-merge rides the same aggregation (no separate left
    join), map-side partial max collapses a hub's fan-in inside each task,
    and sinks keep their own registers via the self row. Pure plan —
    tools/plan_audit.py asserts the shape; ``_superstep`` adds the
    lineage barrier."""
    # shuffle_hash: the planner's default sort-merge costs an E-sized sort
    # of the cached edge side EVERY superstep plus a V×m sort of the
    # register side (guide §3.1); the hash build of the V-sized register
    # frame removes both, and both sides are already hash-partitioned on
    # the join key (e cached by dst, regs out of the previous gather), so
    # the steady-state join is exchange-free too.
    gathered = e.join(
        regs.withColumnRenamed("vertex", "dst").hint("shuffle_hash"), "dst"
    ).select(
        F.col("src").alias("vertex"), *reg_cols
    )
    return (
        gathered.unionByName(regs.select("vertex", *reg_cols))
        .groupBy("vertex")
        .agg(*[F.max(c).alias(c) for c in reg_cols])
    )


def _superstep(e: DataFrame, regs: DataFrame, reg_cols: list[str]) -> DataFrame:
    return _superstep_plan(e, regs, reg_cols).localCheckpoint(eager=True)


def hyperball(
    edges: DataFrame, verts: DataFrame, max_t: int, p: int = 6
) -> DataFrame:
    """(t, nf_est) for t = 0..max_t — HyperBall estimate of the
    neighbourhood function, rounded 4dp."""
    m = 1 << p
    reg_cols = [f"r{j}" for j in range(m)]
    regs = _init_regs(verts, p, reg_cols)
    spark = edges.sparkSession
    rows = [(0, _nf_of(regs, m, reg_cols))]
    # loop-invariant gather side, hash-partitioned by dst ONCE and cached:
    # without it the first superstep inherits the raw scan's partitioning
    # (few fat tasks; the packed path measured a 272 s straggler from
    # exactly this) and every superstep re-shuffles the edge side
    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").repartition(p_shuffle, "dst").persist()
    e.count()
    try:
        for t in range(1, max_t + 1):
            regs = _superstep(e, regs, reg_cols)
            rows.append((t, _nf_of(regs, m, reg_cols)))
    finally:
        e.unpersist()
    return spark.createDataFrame(rows, "t int, nf_est double")


def harmonic_centrality(
    edges: DataFrame, verts: DataFrame, max_t: int, p: int = 6
) -> DataFrame:
    """(vertex, hc) — HyperBall's flagship application (Boldi–Vigna built
    it to compute centralities no exact algorithm reaches at web scale):
    harmonic centrality truncated at max_t,

        hc(v) = Σ_{t=1..max_t} (|ball(v,t)| − |ball(v,t−1)|) / t

    estimated from the same registers, accumulated left-to-right per
    superstep (fixed association order, so the DuckDB oracle can replay
    the identical IEEE additions from exact reachability sets; 4dp
    rounding covers libm ulps). Truncation at max_t is standard for
    HyperBall runs bounded by iteration count; at convergence
    (max_t ≥ diameter) it IS the (outbound) harmonic centrality."""
    m = 1 << p
    reg_cols = [f"r{j}" for j in range(m)]
    regs = _init_regs(verts, p, reg_cols)
    state = regs.select(
        "vertex",
        _estimate(m, reg_cols).alias("prev"),
        F.lit(0.0).alias("hc"),
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").repartition(p_shuffle, "dst").persist()
    e.count()
    try:
        for t in range(1, max_t + 1):
            regs = _superstep(e, regs, reg_cols)
            cur = regs.select("vertex", _estimate(m, reg_cols).alias("cur"))
            state = (
                state.join(cur, "vertex")
                .select(
                    "vertex",
                    F.col("cur").alias("prev"),
                    (F.col("hc") + (F.col("cur") - F.col("prev")) / F.lit(float(t)))
                    .alias("hc"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        e.unpersist()
    return state.select("vertex", F.round("hc", 4).alias("hc"))


def harmonic_centrality_packed(
    edges: DataFrame, verts: DataFrame, max_t: int, p: int = 10
) -> DataFrame:
    """(vertex, hc) — harmonic centrality from the array-packed registers:
    same per-superstep left-to-right accumulation as
    ``harmonic_centrality``, same estimate arithmetic (the packed fold's
    association order matches the column sum bit-for-bit), so at equal p
    it is hash-identical and runs under the SAME oracle; at p=10+ it is
    the web-scale-precision path the column layout cannot reach."""
    m = 1 << p
    spark = edges.sparkSession
    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    regs = _init_regs_packed(verts, p, num_partitions=p_shuffle)
    est = _estimate_packed(m)
    state = regs.select(
        "vertex", est.alias("prev"), F.lit(0.0).alias("hc")
    ).localCheckpoint(eager=True)
    csr_t = build_transposed_csr(edges, verts, p_shuffle).persist()
    csr_t.count()
    try:
        for t in range(1, max_t + 1):
            regs = _superstep_packed(csr_t, regs, m)
            cur = regs.select("vertex", est.alias("cur"))
            state = (
                state.join(cur, "vertex")
                .select(
                    "vertex",
                    F.col("cur").alias("prev"),
                    (
                        F.col("hc")
                        + (F.col("cur") - F.col("prev")) / F.lit(float(t))
                    ).alias("hc"),
                )
                .localCheckpoint(eager=True)
            )
    finally:
        csr_t.unpersist()
    return state.select("vertex", F.round("hc", 4).alias("hc"))


def _nf_of(regs: DataFrame, m: int, reg_cols: list[str]) -> float:
    return _nf_of_expr(regs, _estimate(m, reg_cols))


def _nf_of_expr(regs: DataFrame, est) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    # coalesce: SUM over an empty register frame (empty graph) is NULL
    row = regs.agg(F.coalesce(F.sum(est), F.lit(0.0)).alias("nf")).collect()[0]
    # HALF_UP to match DuckDB's ROUND (python round() is banker's)
    return float(
        Decimal(repr(float(row.nf))).quantize(Decimal("0.0001"), ROUND_HALF_UP)
    )


# --------------------- array-packed register layout ---------------------
# The column layout above caps p≈8 (m aggregate expressions stress
# codegen); web-scale HyperBall runs p=11+ for tight statistics
# (Boldi–Vigna run p up to 14). The packed layout stores all m registers
# in ONE array<int> column, so the frame width is constant in p:
#
#   superstep = gather (edges ⋈ regs, the one shuffle-feeding join)
#             → PARTITION-LOCAL combine (mapInArrow _scatter_combiner:
#               per-partition register table folded with vectorized
#               np.maximum.reduceat — the explicit map-side partial max,
#               exactly what Catalyst's partial_max does for the column
#               layout; a hub's fan-in collapses to ≤ 1 row per
#               (partition, vertex) BEFORE the shuffle, and the Python
#               cost is Arrow-batched numpy, not per-row eval)
#             → final merge: repartition(vertex) (the V-sized partial
#               shuffle) + a second mapInArrow fold (_packed_combiner)
#               that collapses the ≤ P partial rows per vertex inside
#               each hash partition — Arrow/numpy, exact elementwise max.
#
# Python appears here because Spark has no built-in elementwise-array-max
# AGGREGATE (max on arrays is lexicographic; exploding m registers per
# row would multiply the shuffle by m) — this is the sanctioned
# "built-ins genuinely can't express it" case, and the kernel is
# vectorized np.maximum.reduceat over Arrow batches.
# Estimates are IDENTICAL to the column layout: same hash, same
# registers, same left-to-right harmonic fold (all terms exact powers of
# two), so the packed path runs under the SAME DuckDB oracle.


def _init_regs_packed(
    verts: DataFrame, p: int, num_partitions: int | None = None
) -> DataFrame:
    m = 1 << p
    idx, rho = _rho_and_idx(F.col("vertex"), p)
    # tinyint registers: rho ≤ 33−p < 128, and int8 is what crosses the
    # Arrow boundary in the partial combine — 8× less transfer than int64.
    # Built as zeros ++ [rho] ++ zeros: the earlier transform(sequence(m))
    # evaluated a branchy lambda per REGISTER (V·m evals — 11.7 s for
    # 100k vertices at p=10, the dominant init cost); array_repeat writes
    # the same array without per-element conditionals (~10× faster).
    zero = F.lit(0).cast("tinyint")
    regs = F.concat(
        F.array_repeat(zero, idx),
        F.array(rho.cast("tinyint")),
        F.array_repeat(zero, F.lit(m - 1) - idx),
    )
    out = verts.select("vertex", regs.alias("regs"))
    if num_partitions:
        out = out.repartition(num_partitions, "vertex")
    return out.localCheckpoint(eager=True)


def _acc_fold(acc_v, acc_m, vs, mat):
    """Fold (vs, mat) rows into the (acc_v, acc_m) register table via
    sort + np.maximum.reduceat — one row per distinct vertex."""
    import numpy as np

    if acc_v is not None:
        vs = np.concatenate([acc_v, vs])
        mat = np.concatenate([acc_m, mat])
    order = np.argsort(vs, kind="stable")
    vs = vs[order]
    mat = mat[order]
    uq, starts = np.unique(vs, return_index=True)
    return uq, np.maximum.reduceat(mat, starts, axis=0)


def _emit_regs(acc_v, acc_m, m: int):
    import numpy as np
    import pyarrow as pa

    n = len(acc_v)
    offsets = pa.array(
        np.arange(0, (n + 1) * m, m, dtype=np.int32), type=pa.int32()
    )
    regs_arr = pa.ListArray.from_arrays(
        offsets, pa.array(acc_m.reshape(-1), type=pa.int8())
    )
    return pa.RecordBatch.from_arrays(
        [pa.array(acc_v, type=pa.int64()), regs_arr], ["vertex", "regs"]
    )


def _flat_regs(b, col: str, m: int):
    import numpy as np

    flat = (
        b.column(col)
        .flatten()
        .to_numpy(zero_copy_only=False)
        .astype(np.int8, copy=False)
    )
    return flat.reshape(-1, m)


def _packed_combiner(m: int):
    """mapInArrow partial-combine: fold each partition's (vertex, regs)
    rows into one row per distinct vertex via vectorized elementwise max
    over the FLAT int8 value buffer (every list has exactly m entries, so
    the Arrow child array reshapes to (n, m) with zero per-row Python
    objects). State is the partition-local register table
    (distinct-vertices × m bytes — the same bound as a per-thread
    HyperBall register file)."""

    def gen(batches):
        acc_v = None
        acc_m = None
        for b in batches:
            if b.num_rows == 0:
                continue
            vs = b.column("vertex").to_numpy(zero_copy_only=False)
            acc_v, acc_m = _acc_fold(acc_v, acc_m, vs, _flat_regs(b, "regs", m))
        if acc_v is not None:
            yield _emit_regs(acc_v, acc_m, m)

    return gen


# Peak bytes one scatter fold step may materialize for the gathered
# register matrix (mat[rep] below). Bounds task memory INDEPENDENTLY of
# row sizes and Arrow batch shapes: even if an unsegmented hub row or a
# fat batch arrives, the fan-out is sliced flat-wise into ≤ this many
# bytes per np.maximum.reduceat fold. 128 MiB ≈ 128 Ki flat srcs at p=10.
SCATTER_FANOUT_BYTES = 128 << 20


def _scatter_combiner(m: int):
    """mapInArrow scatter+combine over the TRANSPOSED CSR: input rows are
    (srcs array<long>, regs array<tinyint>) — one per destination-vertex
    SEGMENT (build_transposed_csr splits hub in-neighbor lists), carrying
    a chunk of its in-neighbor list and its registers. The E-sized
    fan-out (each src receives its successor's registers) happens INSIDE
    numpy (np.repeat row-gather) in flat slices of ≤ SCATTER_FANOUT_BYTES,
    each immediately folded to ≤1 partial row per (partition, src) — so
    the JVM plan stays V-sized end to end, the join never materializes
    per-edge register rows (measured 4.5× faster than the edge-join form
    on cnr-2000), and peak task memory is bounded regardless of hub
    fan-in (a 1e7-in-degree hub at p=10 would otherwise gather ~10 GB in
    one allocation)."""

    def gen(batches):
        import numpy as np

        max_flat = max(1, SCATTER_FANOUT_BYTES // m)
        acc_v = None
        acc_m = None
        for b in batches:
            if b.num_rows == 0:
                continue
            srcs = b.column("srcs")
            counts = np.asarray(
                srcs.value_lengths().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            flat_src = srcs.flatten().to_numpy(zero_copy_only=False)
            mat = _flat_regs(b, "regs", m)
            # rep is FLAT-indexed (one entry per src), so any flat slice
            # is a valid fold unit — no row alignment needed to chunk
            rep = np.repeat(np.arange(len(counts)), counts)
            for a in range(0, len(flat_src), max_flat):
                sl = slice(a, min(a + max_flat, len(flat_src)))
                acc_v, acc_m = _acc_fold(acc_v, acc_m, flat_src[sl], mat[rep[sl]])
        if acc_v is not None:
            yield _emit_regs(acc_v, acc_m, m)

    return gen


def _superstep_packed_plan(csr_t: DataFrame, regs: DataFrame, m: int) -> DataFrame:
    """One packed superstep on the PageRank-loop discipline: the cached
    self-looped transposed CSR (dst, srcs) and the register state are
    co-partitioned (hash(key, P)), the scatter join is a shuffle-hash
    join of two V-sized frames, the fan-out + map-side partial max run
    inside Arrow/numpy, and the only other exchange per superstep is the
    V-sized partial shuffle back to hash(vertex, P) for the final
    partition-local fold. The self-contribution (v's own ball) rides the
    CSR's self-loop rows — NOT a union branch: a union whose self branch
    shares the regs frame's LogicalRDD with the join input trips a
    Catalyst mapInArrow binding bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND),
    and the self-loop form is one fewer scan anyway."""
    r2 = regs.select(F.col("vertex").alias("_rv"), F.col("regs").alias("_rr"))
    t2 = csr_t.select(F.col("dst").alias("_td"), F.col("srcs").alias("srcs"))
    joined = t2.join(
        r2.hint("shuffle_hash"), F.col("_td") == F.col("_rv")
    ).select("srcs", F.col("_rr").alias("regs"))
    schema = "vertex long, regs array<tinyint>"
    partials = joined.mapInArrow(_scatter_combiner(m), schema)
    return partials.repartition("vertex").mapInArrow(_packed_combiner(m), schema)


def _superstep_packed(csr_t: DataFrame, regs: DataFrame, m: int) -> DataFrame:
    return _superstep_packed_plan(csr_t, regs, m).localCheckpoint(eager=True)


def build_transposed_csr(
    edges: DataFrame,
    verts: DataFrame,
    num_partitions: int,
    max_segment: int = 4096,
) -> DataFrame:
    """(dst, srcs array<long>) hash-partitioned by dst, WITH a self-loop
    per vertex (so every vertex appears and its own registers contribute
    to its ball — the superstep's self-merge, folded into the data) — the
    loop-invariant gather side of the packed HyperBall superstep.

    Hub DESTINATIONS are SEGMENTED (build_csr_segments' discipline on the
    transpose, graph_build.py:111): each in-edge gets a deterministic
    segment ``pmod(xxhash64(src), ceil(indeg/max_segment))`` BEFORE the
    collect, so no collect_list buffer, no parquet/Arrow row, and no
    scatter gather ever holds a 1e7-in-degree hub's full list — a hub
    becomes ceil(indeg/max_segment) rows of ~max_segment srcs each. The
    superstep join key stays ``dst`` (the regs row joins once per
    segment, duplicating m bytes per extra segment — ~1 KiB at p=10) and
    _acc_fold's partial max merges duplicate-vertex partials, so
    segmentation composes with zero semantic change. The one-time build
    pays an extra E-sized indeg join; the loop is unchanged."""
    with_self = edges.select("src", "dst").unionByName(
        verts.select(F.col("vertex").alias("src"), F.col("vertex").alias("dst"))
    )
    indeg = with_self.groupBy("dst").agg(F.count("*").cast("long").alias("_indeg"))
    nseg = F.greatest(
        F.lit(1), F.ceil(F.col("_indeg") / F.lit(max_segment)).cast("int")
    )
    return (
        with_self.join(indeg, "dst")
        .withColumn("_seg", F.pmod(F.xxhash64("src"), nseg))
        .groupBy("dst", "_seg")
        .agg(F.collect_list("src").alias("srcs"))
        .select("dst", "srcs")
        .repartition(num_partitions, "dst")
    )


def _estimate_packed(m: int):
    """Same HLL estimate as ``_estimate`` from the packed register array —
    left-to-right fold over registers 0..m-1, so the harmonic sum's
    association order matches the column layout bit-for-bit (all terms
    exact powers of two — order-free anyway)."""
    harm = F.aggregate(
        "regs",
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double")),
    )
    zeros = F.size(F.filter("regs", lambda r: r == F.lit(0)))
    raw = F.lit(hll_alpha(m) * m * m) / harm
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when(
        (raw <= F.lit(HB_LIN_FACTOR * m)) & (zeros > 0), lin
    ).otherwise(raw)


def hyperball_packed(
    edges: DataFrame, verts: DataFrame, max_t: int, p: int = 10
) -> DataFrame:
    """(t, nf_est) — HyperBall on the array-packed register layout: the
    precision-unbounded path (p=10+ where the column layout's m-aggregate
    frame stops being sensible). Estimates are identical to ``hyperball``
    at equal p (same hash, same registers, same fold order), so the gate
    runs it under the SAME oracle."""
    m = 1 << p
    spark = edges.sparkSession
    p_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    regs = _init_regs_packed(verts, p, num_partitions=p_shuffle)
    rows = [(0, _nf_of_expr(regs, _estimate_packed(m)))]
    # loop-invariant transposed CSR, hash-partitioned by dst ONCE and
    # cached — the scatter join is V-sized on both sides every superstep
    csr_t = build_transposed_csr(edges, verts, p_shuffle).persist()
    csr_t.count()
    try:
        for t in range(1, max_t + 1):
            regs = _superstep_packed(csr_t, regs, m)
            rows.append((t, _nf_of_expr(regs, _estimate_packed(m))))
    finally:
        csr_t.unpersist()
    return spark.createDataFrame(rows, "t int, nf_est double")


def effective_diameter(
    edges: DataFrame,
    verts: DataFrame,
    max_t: int,
    p: int = 6,
    q: float = 0.9,
) -> DataFrame:
    """1-row (q, d_eff): the effective diameter at quantile ``q`` — the
    (interpolated) hop count within which a fraction q of all reachable
    pairs connect. THE headline statistic HyperANF/HyperBall was built to
    measure at web scale (Boldi–Vigna's "four degrees of separation"
    result is exactly this number on the Facebook graph).

    Convention: smallest t with NF(t) ≥ q·NF(max_t), linearly interpolated
    between t−1 and t. Computed from the 4dp-ROUNDED NF estimates that
    ``hyperball`` returns, so engine and oracle interpolate from
    bit-identical inputs and the result is deterministic."""
    spark = edges.sparkSession
    rows = sorted((r.t, r.nf_est) for r in hyperball(edges, verts, max_t, p).collect())
    target = q * rows[-1][1]
    d = float(max_t)
    for t, nf in rows:
        if nf >= target:
            if t == 0:
                d = 0.0
            else:
                prev = rows[t - 1][1]
                d = (t - 1) + (target - prev) / (nf - prev)
            break
    from decimal import ROUND_HALF_UP, Decimal

    d6 = float(Decimal(repr(d)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
    return spark.createDataFrame([(q, d6)], "q double, d_eff double")


def harmonic_centrality_exact(
    edges: DataFrame, verts: DataFrame, max_t: int
) -> DataFrame:
    """(vertex, hc) — EXACT bounded harmonic centrality: HC(x) =
    Σ_{v≠x, d(v→x) ≤ max_t} 1/d(v→x), the same statistic the packed-HLL
    harmonic gate estimates (harmonic_centrality_packed) computed exactly
    — viable when the reachable ball is bounded (clustered graphs,
    per-community subgraphs), the exact/approx pairing the NF family
    already has (neighborhood_function_exact vs hyperball).

    Same level-synchronous pair expansion as neighborhood_function_exact
    but carrying the level at which a (v, u) pair FIRST appears — the
    exact directed distance (an anti join per level instead of the pair-
    set dropDuplicates). The 1/d terms are small-denominator rationals
    (1, 1/2, 1/3 … — sums land exactly on decimal half-grids), so the
    per-vertex sum folds in sorted source order from 0.0 on both engines
    (the betweenness discipline) and rounds bit-stably."""
    dist = verts.select(
        F.col("vertex").alias("v"), F.col("vertex").alias("u"), F.lit(0).alias("d")
    ).localCheckpoint(eager=True)
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("nu"))
    for t in range(1, max_t + 1):
        frontier = dist.where(F.col("d") == t - 1)
        new = (
            frontier.join(e, "u")
            .select("v", F.col("nu").alias("u"))
            .dropDuplicates(["v", "u"])
            .join(dist.select("v", "u"), ["v", "u"], "left_anti")
            .select("v", "u", F.lit(t).alias("d"))
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        dist = dist.unionByName(new).localCheckpoint(eager=True)
    hc = (
        dist.where(F.col("d") >= 1)
        .select(
            "u",
            F.struct(
                F.col("v"), (F.lit(1.0) / F.col("d").cast("double")).alias("t")
            ).alias("vt"),
        )
        .groupBy("u")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("vt")),
                    F.lit(0.0),
                    lambda acc, s: acc + s["t"],
                ),
                6,
            ).alias("hc")
        )
    )
    return (
        verts.join(hc, verts["vertex"] == hc["u"], "left")
        .select("vertex", F.coalesce("hc", F.lit(0.0)).alias("hc"))
    )
