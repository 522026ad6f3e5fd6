"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
  (url string, warc_ts timestamp, html binary, text string, lang string)

Every row is a pure function of (seed, doc_id) via counter-based hashing —
generation runs distributed with ``mapInPandas`` over ``spark.range`` and
produces identical bytes at any parallelism (required for the byte-identical
extraction contract and for bench runs comparing local[8] vs local[32]).

Graph shape: Zipf-like outdegree (exponent ~1.2, cf. the reference's seeded
Zipf streams, tests/utils/mod.rs:17-26), forced high-degree hubs (every page
links to hub ``h(doc) % n_hubs``), dangling pages (no outlinks), and
duplicate links (dedup exercise).
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.hashing import h64, uniform01

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

VOCAB = (
    "web graph page link rank crawl index spark shuffle join partition "
    "vertex edge hub node data scan batch query table row column value "
    "hash sort merge count text token corpus dedup sample filter"
).split()

LANGS = ("en", "de", "fr", "it")
N_SITES = 64
N_HUBS = 16
ZIPF_EXP = 1.2
MAX_OUTDEG = 64
DANGLING_MOD = 97  # doc_id % 97 == 0 → dangling page
EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def url_of(doc_id: int) -> str:
    return f"https://site{doc_id % N_SITES}.example/p/{doc_id}"


def outlink_ids(doc_id: int, n_pages: int, seed: int = 42) -> list[int]:
    """Deterministic target list; may contain duplicates (by design)."""
    if doc_id % DANGLING_MOD == 0:
        return []
    u = max(uniform01(seed, "deg", doc_id), 1e-9)
    deg = min(MAX_OUTDEG, max(1, int(u ** (-1.0 / ZIPF_EXP))))
    targets = [h64(seed, "dst", doc_id, j) % n_pages for j in range(deg)]
    targets.append(h64(seed, "hub", doc_id) % N_HUBS)  # hub link
    if deg >= 2:
        targets.append(targets[0])  # deliberate duplicate link
    return [t for t in targets if t != doc_id]


def paragraphs_of(doc_id: int, seed: int = 42) -> list[str]:
    n_par = 1 + h64(seed, "npar", doc_id) % 4
    out = []
    for p in range(n_par):
        n_words = 8 + h64(seed, "nw", doc_id, p) % 25
        words = [
            VOCAB[h64(seed, "w", doc_id, p, i) % len(VOCAB)] for i in range(n_words)
        ]
        out.append(" ".join(words))
    return out


def page_text(doc_id: int, seed: int = 42) -> str:
    """The canonical extracted text — paragraphs joined by newline."""
    return "\n".join(paragraphs_of(doc_id, seed))


def page_html(doc_id: int, n_pages: int, seed: int = 42) -> bytes:
    """Canonical HTML realizing text + outlinks. The extractor must invert
    this byte-identically (anchor text is NOT part of extracted text)."""
    pars = paragraphs_of(doc_id, seed)
    links = outlink_ids(doc_id, n_pages, seed)
    buf = [
        "<html><head><title>page ",
        str(doc_id),
        "</title></head><body>",
    ]
    for p in pars:
        buf.append("<p>")
        buf.append(p)
        buf.append("</p>")
    for t in links:
        buf.append(f'<a href="{url_of(t)}">to {t}</a>')
    buf.append("</body></html>")
    return "".join(buf).encode("utf-8")


def page_row(doc_id: int, n_pages: int, seed: int = 42) -> dict:
    return {
        "url": url_of(doc_id),
        "warc_ts": EPOCH + datetime.timedelta(seconds=doc_id),
        "html": page_html(doc_id, n_pages, seed),
        "text": page_text(doc_id, seed),
        "lang": LANGS[doc_id % len(LANGS)],
    }


def synthetic_pages(
    spark: SparkSession, n_pages: int, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas, no driver loop."""
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n_pages, 1, num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [page_row(int(i), n_pages, seed) for i in b["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return rng.mapInPandas(gen, PAGES_SCHEMA)
