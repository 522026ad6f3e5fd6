"""Storage-size accounting — the engine's analogue of the reference's
bit/link tables.

The reference's entire point is compression: it reports bits-per-link for
every graph it stores (e.g. cnr-2000 = 2.897 bit/link BVGraph baseline,
/root/reference/tests/data/cnr-2000/cnr-2000.properties:16; its ANS
recompression wins another ~10%, README.md:99-150). The Spark engine
delegates entropy coding to Parquet (SURVEY.md §1.6), so the honest
comparison is: bytes on disk of the CSR adjacency table (sorted successor
arrays, which parquet delta/dictionary + a general-purpose codec compress
well) versus the raw (src, dst) edge table, per edge, per codec.

``adjacency_storage_metrics`` writes both layouts at the given codecs and
measures actual on-disk bytes through the Hadoop FS layer (works on any
scheme). The CSR is written sorted-within-partitions by src — sortedness is
the format invariant the reference's gap coding depends on, and is equally
what makes parquet's encodings bite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..operators.graph_build import build_csr_adjacency, dense_ids, encode_gaps


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive on-disk size via Hadoop FS (any scheme)."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(jpath).getLength())


def adjacency_storage_metrics(
    spark: SparkSession,
    edges: DataFrame,
    base_dir: str,
    codecs: tuple[str, ...] = ("snappy", "zstd"),
    num_buckets: int = 8,
) -> dict:
    """Write raw-edge, CSR, and dense-id-relabeled-CSR layouts at each
    codec; return per-layout bytes, bytes/edge and bits/link (8·bytes/edge
    — comparable to the reference's bit/link tables).

    The dense layout is the honest analogue of the reference's node
    universe: WebGraph ids are dense 0..N-1 (src/ans/mod.rs:44) and all its
    gap/interval coding leverage comes from that. 64-bit hashed ids destroy
    delta-encoding locality; relabeling through ``dense_ids`` recovers it.
    """
    n_edges = edges.count()
    out: dict = {"num_edges": n_edges, "layouts": {}}
    csr = build_csr_adjacency(edges, num_buckets).repartition(
        num_buckets, "src"
    ).sortWithinPartitions("src")
    raw = edges.repartition(num_buckets, "src").sortWithinPartitions("src", "dst")
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .union(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    ids = dense_ids(verts).persist()
    ids.count()
    dedges = (
        edges.join(ids.withColumnRenamed("vertex", "src"), "src")
        .select(F.col("dense_id").alias("s"), "dst")
        .join(ids.withColumnRenamed("vertex", "dst"), "dst")
        .select(F.col("s").alias("src"), F.col("dense_id").alias("dst"))
    )
    csr_dense = build_csr_adjacency(dedges, num_buckets).repartition(
        num_buckets, "src"
    ).sortWithinPartitions("src")
    # gap-coded dense CSR: [first, gap, gap…] int32 arrays — the BV-residual
    # analogue (reference src/bvgraph/mod.rs:13-23); written with parquet v2
    # page encodings so small gaps hit DELTA_BINARY_PACKED before the codec
    csr_gaps = encode_gaps(csr_dense, int_gaps=True).repartition(
        num_buckets, "src"
    ).sortWithinPartitions("src")
    layouts = (
        ("raw_edges", raw),
        ("csr_adjacency", csr),
        ("csr_dense_ids", csr_dense),
        ("csr_dense_gaps", csr_gaps),
    )
    for codec in codecs:
        for name, df in layouts:
            path = f"{base_dir}/{name}-{codec}"
            writer = df.write.mode("overwrite").option("compression", codec)
            if name == "csr_dense_gaps":
                writer = writer.option("parquet.writer.version", "v2")
            writer.parquet(path)
            b = dir_bytes(spark, path)
            out["layouts"][f"{name}-{codec}"] = {
                "bytes": b,
                "bytes_per_edge": round(b / n_edges, 3),
                "bits_per_link": round(8.0 * b / n_edges, 3),
            }
    ids.unpersist()
    return out
