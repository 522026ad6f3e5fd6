"""Text analysis operators over a document corpus — all JVM-side built-ins.

Training-data pipeline staples (language-ID heuristic, quality scoring,
token counting, fingerprinting) expressed with pyspark.sql.functions only:
no Python UDFs, so they run inside whole-stage codegen and scale linearly
with the scan. Every expression is mirrored 1:1 in DuckDB oracle SQL
(plans/oracles_pipeline.py) — which forces the discipline that all
arithmetic is deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht", "das"),
    "en": ("the", "and", "of", "is", "not", "to"),
    "fr": ("le", "la", "et", "est", "pas", "les"),
    "it": ("il", "la", "e", "non", "che", "per"),
}
STOPWORDS = LANG_MARKERS["en"]
WORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"  # BPE-ish: letter runs, digit runs, single symbols


def tokens(col: str | Column = "text") -> Column:
    return F.split(col, " ")


def token_count(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_bpeish) — whitespace tokens + regex token count."""
    return docs.select(
        id_col,
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(WORD_RE), 0)).cast("long").alias(
            "n_bpeish"
        ),
    )


def _marker_hits(lang: str) -> Column:
    """Number of marker words of ``lang`` present in the token set."""
    toks = F.array_distinct(tokens(F.lower("text")))
    hits = [
        F.when(F.array_contains(toks, m), F.lit(1)).otherwise(F.lit(0))
        for m in LANG_MARKERS[lang]
    ]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def lang_id(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — argmax of marker-word hits, ties
    broken by language code order (deterministic)."""
    scored = docs.select(
        id_col, *[_marker_hits(lang).alias(f"s_{lang}") for lang in sorted(LANG_MARKERS)]
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.lit(None).cast("string")
    for l in reversed(langs):  # earlier langs win ties → build from last to first
        pred = F.when(F.col(f"s_{l}") == best, F.lit(l)).otherwise(pred)
    return scored.select(id_col, pred.alias("lang_pred"), best.cast("long").alias("lang_score"))


def quality_score(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
    symbol_ratio, quality) — classic web-text quality heuristics.

    quality = 0.4·min(1, n_tokens/100) + 0.3·(1 − symbol_ratio)
            + 0.3·min(1, stopword_ratio·10), rounded to 6 dp."""
    toks = tokens("text")
    n_chars = F.length("text").cast("long")
    n_tokens = F.size(toks).cast("long")
    mean_tok = F.round(n_chars.cast("double") / n_tokens, 6)
    sw = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(*[F.lit(s) for s in STOPWORDS]))
    )
    stop_ratio = F.round(sw.cast("double") / n_tokens, 6)
    n_sym = F.length(F.regexp_replace(F.lower("text"), "[a-z0-9 ]", ""))
    sym_ratio = F.round(n_sym.cast("double") / n_chars, 6)
    quality = F.round(
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - sym_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), stop_ratio * F.lit(10.0)),
        6,
    )
    return docs.select(
        id_col,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        sym_ratio.alias("symbol_ratio"),
        quality.alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp, fp_norm) — md5 of raw text and of whitespace-normalized
    lowercased text (the cheap canonical-form document fingerprint)."""
    norm = F.regexp_replace(F.trim(F.lower("text")), " +", " ")
    return docs.select(
        id_col,
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.md5(norm.cast("binary")).alias("fp_norm"),
    )


def vocab_stats(docs: DataFrame, top_n: int = 500) -> DataFrame:
    """(term, df, tf) — the corpus vocabulary table: document frequency
    and total term frequency of every whitespace token, top ``top_n`` by
    (tf desc, term asc). This is the tokenizer-training primitive — BPE /
    WordPiece vocab builders and df-based stopword/idf tables consume
    exactly this aggregate — and it is integer-exact end to end, so the
    cross-engine hash needs no float discipline.

    Plan shape (100 TB): explode is narrow; the per-(doc, term) count and
    the per-term (df, tf) rollup are both map-side-combinable hash aggs
    (two exchanges keyed (doc_id, term) then term); the top-N is
    TakeOrderedAndProject — per-partition heads then one driver merge,
    never a global sort."""
    per_doc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    vocab = per_doc.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
    )
    return vocab.orderBy(F.desc("tf"), F.asc("term")).limit(top_n)
