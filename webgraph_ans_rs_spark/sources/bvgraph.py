"""Pure-Python BVGraph (Boldi–Vigna) sequential codec — the golden-graph
ingest path.

The reference's test corpus ships a REAL web graph in BVGraph format
(`/root/reference/tests/data/cnr-2000/cnr-2000.graph` + `.properties`:
325,557 nodes, 3,216,152 arcs, 2.897 bits/link) and every storage claim
the engine makes should be anchored on it, not only on synthetic
fixtures. The BVGraph format is public (Boldi & Vigna, "The WebGraph
Framework I: Compression Techniques", WWW 2004); this module implements
the version-0 default coding so the engine can decode that artifact into
an ordinary (src, dst) edge table:

  per node x (MSB-first bit stream):
    outdegree d                       γ
    if d > 0 and window_size > 0:
      reference r (0 = none)          unary
      if r > 0: block count + blocks  γ  (alternating copy/skip run
                                          lengths over successors(x−r);
                                          first block may be length 0;
                                          trailing block implicit)
      if min_interval_length ≠ 0:
        interval count                γ
        left extremes / lengths       γ  (first left is nat2int, relative
                                          to x; lengths − min_interval)
      residuals                       ζ_k (first is nat2int relative to
                                          x, then +1 gap-coded)

  successors(x) = copied(ref blocks) ∪ intervals ∪ residuals (disjoint,
  merged sorted).

The decoder is sequential (exactly the reference's ANSBVGraphSeq shape);
a matching encoder exists for round-trip testing the bit layer — both
are driver-side ingest utilities, NOT hot-path operators (the decoded
edge table is cached to parquet once and every Spark job reads that).

Default codings (compressionflags empty in the .properties): outdegrees
γ, references unary, block counts γ, blocks γ, intervals γ, residuals
ζ_k with k = `zetak`.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

# -------------------------- bit I/O (MSB-first) --------------------------


class BitReader:
    __slots__ = ("data", "pos", "buf", "bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.bits = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        buf, bits, pos, data = self.buf, self.bits, self.pos, self.data
        while bits < n:
            buf = (buf << 8) | data[pos]
            pos += 1
            bits += 8
        bits -= n
        v = (buf >> bits) & ((1 << n) - 1)
        self.buf = buf & ((1 << bits) - 1)
        self.bits = bits
        self.pos = pos
        return v

    def read_unary(self) -> int:
        c = 0
        buf, bits, pos, data = self.buf, self.bits, self.pos, self.data
        while True:
            if bits == 0:
                buf = data[pos]
                pos += 1
                bits = 8
            if buf == 0:
                c += bits
                bits = 0
                continue
            top = buf.bit_length()
            c += bits - top
            bits = top - 1
            self.buf = buf & ((1 << bits) - 1)
            self.bits = bits
            self.pos = pos
            return c

    def read_gamma(self) -> int:
        msb = self.read_unary()
        return ((1 << msb) | self.read(msb)) - 1

    def read_zeta(self, k: int) -> int:
        h = self.read_unary()
        left = 1 << (h * k)
        m = self.read(h * k + k - 1)
        if m < left:
            return m + left - 1
        return (m << 1) + self.read(1) - 1


class BitWriter:
    __slots__ = ("out", "buf", "bits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.bits = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.buf = (self.buf << n) | (v & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.bits -= 8
            self.out.append((self.buf >> self.bits) & 0xFF)
        self.buf &= (1 << self.bits) - 1

    def write_unary(self, v: int) -> None:
        while v >= 32:
            self.write(0, 32)
            v -= 32
        self.write(1, v + 1)

    def write_gamma(self, v: int) -> None:
        w = v + 1
        n = w.bit_length()
        self.write_unary(n - 1)
        self.write(w & ((1 << (n - 1)) - 1), n - 1)

    def write_zeta(self, v: int, k: int) -> None:
        w = v + 1
        h = (w.bit_length() - 1) // k
        self.write_unary(h)
        left = 1 << (h * k)
        offset = w - left
        # minimal binary over the shell [left, left<<k): offsets < left
        # use h*k+k-1 bits, the rest write w itself in h*k+k bits (the
        # dsiutils writeZeta layout, mirror of read_zeta's two branches)
        if offset < left:
            self.write(offset, h * k + k - 1)
        else:
            self.write(w, h * k + k)

    def getvalue(self) -> bytes:
        if self.bits:
            pad = 8 - self.bits
            self.write(0, pad)
        return bytes(self.out)


def nat2int(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def int2nat(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


# ----------------------------- properties -----------------------------


@dataclass
class BVGraphProperties:
    nodes: int
    arcs: int
    window_size: int
    min_interval_length: int
    zeta_k: int
    version: int = 0
    raw: dict | None = None


def load_properties(path: str) -> BVGraphProperties:
    props: dict[str, str] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            props[k] = v
    if props.get("compressionflags", ""):
        raise NotImplementedError(
            "non-default compressionflags not supported: "
            + props["compressionflags"]
        )
    return BVGraphProperties(
        nodes=int(props["nodes"]),
        arcs=int(props["arcs"]),
        window_size=int(props["windowsize"]),
        min_interval_length=int(props["minintervallength"]),
        zeta_k=int(props.get("zetak", 3)),
        version=int(props.get("version", 0)),
        raw=props,
    )


# ------------------------------ decoder -------------------------------


def decode_bvgraph(data: bytes, props: BVGraphProperties) -> list[list[int]]:
    """Sequential decode of the whole graph → successor list per node.
    The window of previously decoded lists IS the full result list (the
    format only references back ≤ window_size nodes, but keeping all
    lists is what the edge-table ingest needs anyway)."""
    br = BitReader(data)
    k = props.zeta_k
    minlen = props.min_interval_length
    ws = props.window_size
    lists: list[list[int]] = []
    for x in range(props.nodes):
        d = br.read_gamma()
        if d == 0:
            lists.append([])
            continue
        copied: list[int] = []
        if ws > 0:
            ref = br.read_unary()
            if ref > 0:
                ref_list = lists[x - ref]
                block_count = br.read_gamma()
                pos = 0
                copy = True
                for i in range(block_count):
                    b = br.read_gamma() + (0 if i == 0 else 1)
                    if copy:
                        copied.extend(ref_list[pos : pos + b])
                    pos += b
                    copy = not copy
                if copy:  # even block count → implicit trailing copy run
                    copied.extend(ref_list[pos:])
        extra = d - len(copied)
        intervals: list[int] = []
        if extra > 0 and minlen != 0:
            icount = br.read_gamma()
            if icount:
                left = x + nat2int(br.read_gamma())
                ln = br.read_gamma() + minlen
                intervals.extend(range(left, left + ln))
                prev = left + ln
                extra -= ln
                for _ in range(icount - 1):
                    left = prev + br.read_gamma() + 1
                    ln = br.read_gamma() + minlen
                    intervals.extend(range(left, left + ln))
                    prev = left + ln
                    extra -= ln
        residuals: list[int] = []
        if extra > 0:
            r = x + nat2int(br.read_zeta(k))
            residuals.append(r)
            for _ in range(extra - 1):
                r = r + br.read_zeta(k) + 1
                residuals.append(r)
        if copied or intervals:
            succ = sorted(copied + intervals + residuals)
        else:
            succ = residuals
        lists.append(succ)
    return lists


# ------------------------------ encoder -------------------------------
# Round-trip companion for testing the bit layer (and a faithful model of
# the copy/interval/residual split the parquet-level ref codec mirrors).


def encode_bvgraph(
    lists: list[list[int]],
    window_size: int = 7,
    min_interval_length: int = 4,
    zeta_k: int = 3,
    max_ref_count: int = 3,
) -> bytes:
    """Greedy BVGraph encoder (reference selection = largest intersection
    within the window subject to the ref-chain bound, the WebGraph
    default heuristic). Used for round-trip tests of the decoder."""
    bw = BitWriter()
    depth = [0] * len(lists)
    for x, succ in enumerate(lists):
        d = len(succ)
        bw.write_gamma(d)
        if d == 0:
            continue
        target = set(succ)
        best_ref, best_common = 0, 0
        if window_size > 0:
            for r in range(1, min(window_size, x) + 1):
                if depth[x - r] >= max_ref_count:
                    continue
                common = len(target.intersection(lists[x - r]))
                if common > best_common:
                    best_common, best_ref = common, r
        copied: list[int] = []
        if window_size > 0:
            bw.write_unary(best_ref)
            if best_ref > 0:
                depth[x] = depth[x - best_ref] + 1
                ref_list = lists[x - best_ref]
                mask = [v in target for v in ref_list]
                runs: list[int] = []
                cur = True
                n = 0
                for m in mask:
                    if m == cur:
                        n += 1
                    else:
                        runs.append(n)
                        cur = m
                        n = 1
                runs.append(n)
                runs.pop()  # trailing block is implicit
                bw.write_gamma(len(runs))
                for i, b in enumerate(runs):
                    bw.write_gamma(b - (0 if i == 0 else 1))
                copied = [v for v, m in zip(ref_list, mask) if m]
        rest = sorted(target.difference(copied))
        intervals: list[tuple[int, int]] = []
        residuals: list[int] = []
        if min_interval_length != 0:
            i = 0
            while i < len(rest):
                j = i
                while j + 1 < len(rest) and rest[j + 1] == rest[j] + 1:
                    j += 1
                ln = j - i + 1
                if ln >= min_interval_length:
                    intervals.append((rest[i], ln))
                else:
                    residuals.extend(rest[i : j + 1])
                i = j + 1
            if rest:
                bw.write_gamma(len(intervals))
                prev = 0
                for idx, (left, ln) in enumerate(intervals):
                    if idx == 0:
                        bw.write_gamma(int2nat(left - x))
                    else:
                        bw.write_gamma(left - prev - 1)
                    bw.write_gamma(ln - min_interval_length)
                    prev = left + ln
        else:
            residuals = rest
        if residuals:
            bw.write_zeta(int2nat(residuals[0] - x), zeta_k)
            for i in range(1, len(residuals)):
                bw.write_zeta(residuals[i] - residuals[i - 1] - 1, zeta_k)
    return bw.getvalue()


# --------------------------- ingest helpers ---------------------------

CNR_BASENAME = "/root/reference/tests/data/cnr-2000/cnr-2000"
CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".cache")


def bvgraph_to_parquet(basename: str, out_path: str) -> dict:
    """Decode `<basename>.graph` and write the (src, dst) edge table as a
    single parquet file (pyarrow, driver-side — a one-time ingest, like
    the reference's own conversion tools). Returns {'nodes', 'arcs'},
    VERIFIED against the .properties file before writing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    props = load_properties(basename + ".properties")
    with open(basename + ".graph", "rb") as f:
        data = f.read()
    lists = decode_bvgraph(data, props)
    n_arcs = sum(len(s) for s in lists)
    if len(lists) != props.nodes or n_arcs != props.arcs:
        raise ValueError(
            f"decode mismatch: got nodes={len(lists)} arcs={n_arcs}, "
            f"properties say nodes={props.nodes} arcs={props.arcs}"
        )
    src = np.repeat(
        np.arange(len(lists), dtype=np.int64),
        np.fromiter((len(s) for s in lists), dtype=np.int64, count=len(lists)),
    )
    dst = np.fromiter(
        (v for s in lists for v in s), dtype=np.int64, count=n_arcs
    )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(
        pa.table({"src": src, "dst": dst}),
        out_path,
        compression="zstd",
    )
    meta = {"nodes": props.nodes, "arcs": n_arcs, "basename": basename}
    with open(out_path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return meta


def parquet_to_bvgraph(
    edge_path: str,
    out_basename: str,
    window_size: int = 7,
    min_interval_length: int = 4,
    zeta_k: int = 3,
    max_ref_count: int = 3,
    num_nodes: int | None = None,
) -> dict:
    """EXPORT: (src, dst) edge parquet → `<out_basename>.graph` +
    `.properties` in the public BVGraph v0 format (the reference
    toolchain's native input). The egress mirror of
    ``bvgraph_to_parquet`` — together they make the engine
    round-trip-compatible with the reference's own artifacts.

    Node ids must be dense 0..n-1 (the BVGraph node universe —
    operators/graph_build.dense_ids produces exactly this; n defaults to
    max(id)+1). Driver-side one-time tool, like the ingest. The written
    graph is VERIFIED by re-decoding before returning."""
    import pyarrow.parquet as pq

    t = pq.read_table(edge_path, columns=["src", "dst"])
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    n = int(num_nodes) if num_nodes is not None else (
        int(max(src.max(), dst.max())) + 1 if len(src) else 0
    )
    if len(src) and (src.min() < 0 or dst.min() < 0):
        raise ValueError("BVGraph export needs dense non-negative ids")
    lists: list[list[int]] = [[] for _ in range(n)]
    import numpy as np

    order = np.lexsort((dst, src))
    for s, d in zip(src[order].tolist(), dst[order].tolist()):
        lists[s].append(d)
    n_arcs = len(src)
    data = encode_bvgraph(
        lists,
        window_size=window_size,
        min_interval_length=min_interval_length,
        zeta_k=zeta_k,
        max_ref_count=max_ref_count,
    )
    os.makedirs(os.path.dirname(out_basename) or ".", exist_ok=True)
    with open(out_basename + ".graph", "wb") as f:
        f.write(data)
    props_text = (
        "#BVGraph properties\n"
        f"version=0\n"
        f"graphclass=it.unimi.dsi.webgraph.BVGraph\n"
        f"nodes={n}\n"
        f"arcs={n_arcs}\n"
        f"windowsize={window_size}\n"
        f"maxrefcount={max_ref_count}\n"
        f"minintervallength={min_interval_length}\n"
        f"zetak={zeta_k}\n"
        f"compressionflags=\n"
    )
    with open(out_basename + ".properties", "w") as f:
        f.write(props_text)
    # verify: the file we just wrote must decode back to the same graph
    props = load_properties(out_basename + ".properties")
    back = decode_bvgraph(data, props)
    if back != lists:
        raise ValueError("export verification failed: decode != input")
    return {
        "nodes": n,
        "arcs": n_arcs,
        "bytes": len(data),
        "bits_per_link": round(8.0 * len(data) / n_arcs, 3) if n_arcs else 0.0,
    }


def ensure_cnr2000(basename: str = CNR_BASENAME) -> tuple[str, dict]:
    """Decode-once cache of the cnr-2000 edge table (repo-local .cache/,
    gitignored). Returns (parquet_path, {'nodes','arcs'})."""
    out = os.path.abspath(os.path.join(CACHE_DIR, "cnr-2000.parquet"))
    meta_path = out + ".meta.json"
    if os.path.exists(out) and os.path.exists(meta_path):
        with open(meta_path) as f:
            return out, json.load(f)
    meta = bvgraph_to_parquet(basename, out)
    return out, meta
