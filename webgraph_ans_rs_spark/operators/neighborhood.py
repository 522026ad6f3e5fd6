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
  (``hyperball_packed``) stores all m registers in one array<int> column
  with an explicit map-side combine + zip_with(greatest) final merge —
  frame width constant in p, precision unbounded (p=10+ web-scale runs).

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
    gathered = e.join(regs.withColumnRenamed("vertex", "dst"), "dst").select(
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
    e = edges.select("src", "dst")
    for t in range(1, max_t + 1):
        regs = _superstep(e, regs, reg_cols)
        rows.append((t, _nf_of(regs, m, reg_cols)))
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
    e = edges.select("src", "dst")
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
#             → PARTITION-LOCAL combine (mapInPandas: per-partition
#               register table folded with vectorized np.maximum — the
#               explicit map-side partial max, exactly what Catalyst's
#               partial_max does for the column layout; a hub's fan-in
#               collapses to ≤ 1 row per (partition, vertex) BEFORE the
#               shuffle, and the Python cost is Arrow-batched numpy, not
#               per-row eval)
#             → groupBy(vertex) final merge: collect_list of ≤ P partial
#               arrays folded with zip_with(greatest) — JVM-side, exact.
#
# Python appears here because Spark has no built-in elementwise-array-max
# AGGREGATE (max on arrays is lexicographic; exploding m registers per
# row would multiply the shuffle by m) — this is the sanctioned
# "built-ins genuinely can't express it" case, and the kernel is
# vectorized np.maximum.reduceat over Arrow batches.
# Estimates are IDENTICAL to the column layout: same hash, same
# registers, same left-to-right harmonic fold (all terms exact powers of
# two), so the packed path runs under the SAME DuckDB oracle.


def _init_regs_packed(verts: DataFrame, p: int, eager: bool = True) -> DataFrame:
    m = 1 << p
    idx, rho = _rho_and_idx(F.col("vertex"), p)
    regs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.when(j == idx, rho).otherwise(F.lit(0)).cast("int"),
    )
    out = verts.select("vertex", regs.alias("regs"))
    return out.localCheckpoint(eager=True) if eager else out


def _packed_combiner(m: int):
    """mapInPandas partial-combine: fold each partition's (vertex, regs)
    rows into one row per distinct vertex via vectorized elementwise max.
    State is the partition-local register table (distinct-vertices × m
    ints — the same bound as a per-thread HyperBall register file)."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        acc: dict[int, "np.ndarray"] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vs = pdf["vertex"].to_numpy()
            mat = np.stack(pdf["regs"].to_numpy()).astype(np.int32, copy=False)
            order = np.argsort(vs, kind="stable")
            vs = vs[order]
            mat = mat[order]
            uq, starts = np.unique(vs, return_index=True)
            red = np.maximum.reduceat(mat, starts, axis=0)
            for v, row in zip(uq.tolist(), red):
                prev = acc.get(v)
                if prev is None:
                    acc[v] = row.copy()
                else:
                    np.maximum(prev, row, out=prev)
        if acc:
            yield pd.DataFrame(
                {
                    "vertex": list(acc.keys()),
                    "regs": [r.tolist() for r in acc.values()],
                }
            )

    return gen


def _superstep_packed_plan(e: DataFrame, regs: DataFrame, m: int) -> DataFrame:
    gathered = e.join(regs.withColumnRenamed("vertex", "dst"), "dst").select(
        F.col("src").alias("vertex"), "regs"
    )
    allrows = gathered.unionByName(regs.select("vertex", "regs"))
    partials = allrows.mapInPandas(
        _packed_combiner(m), "vertex long, regs array<int>"
    )
    zero = F.array_repeat(F.lit(0), m)
    return partials.groupBy("vertex").agg(
        F.aggregate(
            F.collect_list("regs"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: F.greatest(a, b)),
        ).alias("regs")
    )


def _superstep_packed(e: DataFrame, regs: DataFrame, m: int) -> DataFrame:
    return _superstep_packed_plan(e, regs, m).localCheckpoint(eager=True)


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
    regs = _init_regs_packed(verts, p)
    spark = edges.sparkSession
    rows = [(0, _nf_of_expr(regs, _estimate_packed(m)))]
    e = edges.select("src", "dst")
    for t in range(1, max_t + 1):
        regs = _superstep_packed(e, regs, m)
        rows.append((t, _nf_of_expr(regs, _estimate_packed(m))))
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
