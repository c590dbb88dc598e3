"""Gopher-style rule-based document quality filtering — the standard
pre-training corpus gate (Rae et al. 2021 "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A1.1;
reused by MassiveText / RefinedWeb / Dolma pipelines).

Each rule is a closed-form per-document statistic, so the whole gate
is MAP-SIDE column math in the scan stage — at 100 TB this op costs
one corpus read and filters before anything downstream (dedup,
tokenization) pays for the rejected bytes. No shuffle; the returned
frame here aggregates the keep/reject census per language (bounded
cardinality) to give the driver a hash-checkable surface.

Rules implemented (thresholds from the paper, adapted to the test
corpus' word-soup shape):
- word count within [min, max]
- mean word length within [3, 10]
- symbol-to-word ratio (# and ellipsis) below 0.1
- stopword hit: >= 2 occurrences of common function words
- max single-token dominance (the most frequent token may not
  exceed a fraction of the doc) — the repetition gate's cheap twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register

_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_SYMBOL_MAX = 0.1
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to")
GOPHER_STOP_MIN = 2
GOPHER_DOM_MAX = 0.20  # most frequent token <= 20% of the doc


@register("gopher_quality_rules", oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_TOK} AS toks,
         length(text) - length(replace(text, '#', ''))
         + length(text) - length(replace(text, '...', '')) AS n_sym
  FROM documents),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / len(toks) AS mwl,
         CAST(n_sym AS DOUBLE) / len(toks) AS sym_ratio,
         len(list_filter(toks, x -> x IN {GOPHER_STOPWORDS!r})) AS n_stop,
         CAST(list_max(list_transform(list_distinct(toks),
              d -> len(list_filter(toks, x -> x = d))))
           AS DOUBLE) / len(toks) AS dom
  FROM t WHERE len(toks) > 0),
f AS (
  SELECT lang,
         (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (mwl BETWEEN {GOPHER_MWL_LO!r} AND {GOPHER_MWL_HI!r})
         AND (sym_ratio <= {GOPHER_SYMBOL_MAX!r})
         AND (n_stop >= {GOPHER_STOP_MIN})
         AND (dom <= {GOPHER_DOM_MAX!r}) AS keep,
         n_words
  FROM m)
SELECT lang, keep, count(*) AS n_docs,
       CAST(sum(CAST(n_words AS BIGINT)) AS BIGINT) AS total_words
FROM f GROUP BY 1, 2 ORDER BY 1, 2
""")
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule gate census: per (lang, keep) — how many documents
    pass all five rules and how many words they carry. Every rule is
    map-side array math; the token-dominance rule uses
    aggregate-over-distinct-tokens INSIDE the row (no explode). The
    production form returns the per-doc keep column; the census shape
    is the driver-checkable rollup of exactly that column."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    n_sym = (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
             + F.length("text")
             - F.length(F.replace(F.col("text"), F.lit("..."))))
    # Most-frequent-token count without exploding: for each distinct
    # token, count its occurrences via filter(), take the max.
    dom_cnt = F.array_max(F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda x: x == d))))
    m = docs.select(
        "doc_id", "lang",
        F.size(toks).alias("n_words"),
        (F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
         .cast("double") / F.size(toks)).alias("mwl"),
        (n_sym.cast("double") / F.size(toks)).alias("sym_ratio"),
        F.size(F.filter(toks, lambda x: x.isin(*GOPHER_STOPWORDS)))
         .alias("n_stop"),
        (dom_cnt.cast("double") / F.size(toks)).alias("dom"),
    ).where(F.col("n_words") > 0)
    keep = (F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & F.col("mwl").between(GOPHER_MWL_LO, GOPHER_MWL_HI)
            & (F.col("sym_ratio") <= GOPHER_SYMBOL_MAX)
            & (F.col("n_stop") >= GOPHER_STOP_MIN)
            & (F.col("dom") <= GOPHER_DOM_MAX))
    return (m.select("lang", keep.alias("keep"), "n_words")
             .groupBy("lang", "keep")
             .agg(F.count("*").alias("n_docs"),
                  F.sum(F.col("n_words").cast("bigint")).cast("bigint")
                   .alias("total_words"))
             .orderBy("lang", "keep"))
