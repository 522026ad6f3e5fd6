"""HTML → (text, outlinks) extraction — the engine's parse stage.

Contract (BASELINE.json input_hint): byte-identical extracted text per url,
vectorized pandas/Arrow UDFs only — no per-row Python UDFs in the hot path.

The parser is dependency-free (stdlib ``html.parser``), versioned by
EXTRACTOR_VERSION, and locale-independent, so the same bytes come out on
every executor, Python build, and cluster size (SURVEY.md §7 hard part (a)).

Semantics:
  * text      = text content of every <p> element, paragraphs joined "\n"
                (anchor text inside <p> is excluded — links are navigation)
  * outlinks  = href of every <a> tag, in document order, duplicates kept
                (dedup happens at edge-build, like the reference's distinct
                successor sets)

Plan shape: one ``pandas_udf`` returning a struct column — Arrow batches
both directions, Catalyst keeps projection pruning around it; at 100 TB the
parse is embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

EXTRACTOR_VERSION = 1
EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("outlinks", ArrayType(StringType())),
    ]
)


class _PageParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.paragraphs: list[str] = []
        self.outlinks: list[str] = []
        self._p_depth = 0
        self._a_depth = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "p":
            if self._p_depth == 0:
                self._buf = []
            self._p_depth += 1
        elif tag == "a":
            self._a_depth += 1
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.outlinks.append(v)

    def handle_endtag(self, tag: str) -> None:
        if tag == "p" and self._p_depth > 0:
            self._p_depth -= 1
            if self._p_depth == 0:
                self.paragraphs.append("".join(self._buf))
                self._buf = []
        elif tag == "a" and self._a_depth > 0:
            self._a_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._p_depth > 0 and self._a_depth == 0:
            self._buf.append(data)


def parse_html(html: bytes) -> tuple[str, list[str]]:
    """Pure function: html bytes → (text, outlinks). Malformed input never
    raises — html.parser is tolerant; undecodable bytes are replaced."""
    parser = _PageParser()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    return "\n".join(parser.paragraphs), parser.outlinks


@pandas_udf(EXTRACT_SCHEMA)
def _extract_udf(html: pd.Series) -> pd.DataFrame:
    texts: list[str] = []
    links: list[list[str]] = []
    for h in html:
        t, l = parse_html(bytes(h) if h is not None else b"")
        texts.append(t)
        links.append(l)
    return pd.DataFrame({"text": texts, "outlinks": links})


def extract_text_and_links(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) → (url, warc_ts, lang, text, outlinks).

    Reads only (url, warc_ts, lang, html) — column pruning keeps any other
    page payload out of the scan.
    """
    cols = [c for c in ("url", "warc_ts", "lang") if c in pages.columns]
    ext = pages.select(*cols, _extract_udf(F.col("html")).alias("_e"))
    return ext.select(*cols, F.col("_e.text").alias("text"), F.col("_e.outlinks").alias("outlinks"))
