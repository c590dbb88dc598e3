"""Text-analysis operators (SURVEY §2.6): language-ID, quality
scoring, token counting, document fingerprinting — the per-document
map-only stage of an LLM data pipeline. Everything here is pure
`F.*` column math over the tokenizer in functions/text.py: no UDFs,
no shuffle except the final small aggregations, so the stage streams
at parquet-scan speed regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .. import tables
from ..constants import FP_LEN, FP_MOD, FP_POW
from ..functions.hashing import rolling_fingerprint
from ..functions.text import tokens
from ..registry import register

# Marker lexicons for the language-ID heuristic: the most frequent
# tokens per language in the corpus generator's per-language word
# distribution. The heuristic is a deterministic argmax vote — the
# point is the operator shape (lexicon broadcast, vectorized count),
# not linguistic accuracy on synthetic text.
LANG_MARKERS = {
    "en": ("column", "sort", "agg"),
    "de": ("small", "data", "table"),
    "es": ("part", "hash", "line"),
    "fr": ("order", "query", "stream"),
    "zh": ("merge", "vector", "group"),
}
_LANG_ORDER = ["en", "de", "es", "fr", "zh"]


def _marker_count(toks: Column, lang: str) -> Column:
    m = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*m)))


def _tok_sql(col: str = "text") -> str:
    return f"list_filter(string_split(trim({col}), ' '), t -> t <> '')"


@register("term_tf", oracle=f"""
WITH tok AS (SELECT unnest({_tok_sql()}) AS term FROM documents)
SELECT term, count(*) AS cnt FROM tok
GROUP BY term ORDER BY cnt DESC, term LIMIT 30
""")
def term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies (the TF side of every keyword index the
    reference backends build)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return (docs.select(F.explode(tokens("text")).alias("term"))
                .groupBy("term").agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), "term").limit(30))


@register("tfidf_topterms", oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_tok_sql()}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, term, round(tf * ln(n / df), 6) AS tfidf
FROM tf JOIN df USING (term), n
ORDER BY tfidf DESC, doc_id, term LIMIT 50
""")
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF scoring; the idf table is tiny (vocabulary-sized) and
    broadcast onto the tf table, so the only real shuffle is the tf
    groupBy on (doc, term) — uniform keys.

    Corpus size N stays IN the plan as a 1-row broadcast crossJoin
    (same pattern as q15_top_supplier) — r1 ran a separate
    driver-side docs.count() action, an extra corpus pass per call."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    n = docs.agg(F.count("*").alias("n"))
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (tf.join(F.broadcast(df), "term")
              .crossJoin(F.broadcast(n))
              .select("doc_id", "term",
                      F.round(F.col("tf") * F.log(F.col("n") / F.col("df")),
                              6).alias("tfidf"))
              .orderBy(F.desc("tfidf"), "doc_id", "term").limit(50))


@register("token_stats", oracle=f"""
SELECT doc_id,
       CAST(len({_tok_sql()}) AS INT)                          AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS re_tokens,
       CAST(length(text) AS INT)                               AS n_chars_actual,
       CAST(ceil(length(text) / 4.0) AS BIGINT)                AS bpe_est
FROM documents ORDER BY doc_id
""")
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, regex word tokens, and the
    chars/4 BPE estimate used for LLM token budgeting."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return token_stats_t(docs).orderBy("doc_id")


def token_stats_t(docs: DataFrame) -> DataFrame:
    """Unordered operator form (compose without inheriting a sort —
    the registered query adds ORDER BY only for the oracle compare)."""
    return docs.select(
        "doc_id",
        F.size(tokens("text")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z0-9]+")).alias("re_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.ceil(F.length("text") / 4.0).alias("bpe_est"))


def _lang_oracle() -> str:
    counts = ",\n       ".join(
        f"len(list_filter({_tok_sql()}, t -> t IN "
        f"{tuple(LANG_MARKERS[lang])})) AS c_{lang}"
        for lang in _LANG_ORDER)
    # argmax with fixed priority order (en > de > es > fr > zh on ties)
    pred = "CASE WHEN total = 0 THEN 'und' "
    for lang in _LANG_ORDER:
        others = [o for o in _LANG_ORDER if o != lang]
        cond = " AND ".join(f"c_{lang} >= c_{o}" for o in others)
        pred += f"WHEN {cond} THEN '{lang}' "
    pred += "ELSE 'und' END"
    return f"""
WITH c AS (SELECT doc_id, lang AS true_lang,
       {counts}
FROM documents),
t AS (SELECT *, c_en + c_de + c_es + c_fr + c_zh AS total FROM c)
SELECT doc_id, true_lang, {pred} AS pred_lang,
       round(greatest(c_en, c_de, c_es, c_fr, c_zh) * 1.0
             / greatest(total, 1), 6) AS confidence
FROM t ORDER BY doc_id
"""


@register("lang_id", oracle=_lang_oracle())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-lexicon vote (n-gram-free heuristic; the
    lexicon is a broadcast literal, the vote is a map-only pass)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return lang_id_t(docs).orderBy("doc_id")


def lang_id_t(docs: DataFrame) -> DataFrame:
    """Unordered operator form of lang_id."""
    toks = tokens("text")
    c = docs.select(
        "doc_id", F.col("lang").alias("true_lang"),
        *[_marker_count(toks, lang).alias(f"c_{lang}") for lang in _LANG_ORDER])
    total = sum(F.col(f"c_{lang}") for lang in _LANG_ORDER)
    t = c.withColumn("total", total)
    pred = F.when(F.col("total") == 0, F.lit("und"))
    for lang in _LANG_ORDER:
        others = [o for o in _LANG_ORDER if o != lang]
        cond = F.lit(True)
        for o in others:
            cond = cond & (F.col(f"c_{lang}") >= F.col(f"c_{o}"))
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    conf = F.round(
        F.greatest(*[F.col(f"c_{lang}") for lang in _LANG_ORDER]) * 1.0
        / F.greatest(F.col("total"), F.lit(1)), 6)
    return t.select("doc_id", "true_lang", pred.alias("pred_lang"),
                    conf.alias("confidence"))


# Shared oracle fragment: the exact quality formula as one scalar
# select (imported by operators/sampling.py's quality_weighted_sample,
# whose Spark side runs quality_score_t — keep all three in lockstep;
# the quality_score oracle below spells the same math over its
# intermediate columns).
QUALITY_ORACLE_SELECT = f"""
SELECT doc_id,
       0.4 * least(len({_tok_sql()}) / 100.0, 1.0)
         + 0.3 * (1.0 - len(list_filter({_tok_sql()}, t -> t IN ('the', 'a')))
                        / len({_tok_sql()}))
         + 0.3 * least((list_sum(list_transform({_tok_sql()}, t -> length(t)))
                        / len({_tok_sql()})) / 8.0, 1.0) AS quality
FROM documents
"""


@register("quality_score", oracle=f"""
WITH s AS (
  SELECT doc_id,
         len({_tok_sql()}) AS n_tokens,
         list_sum(list_transform({_tok_sql()}, t -> length(t))) AS tok_chars,
         len(list_filter({_tok_sql()}, t -> t IN ('the', 'a'))) AS n_stop
  FROM documents)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       tok_chars / n_tokens AS avg_token_len,
       n_stop / n_tokens AS stopword_ratio,
       0.4 * least(n_tokens / 100.0, 1.0)
         + 0.3 * (1.0 - n_stop / n_tokens)
         + 0.3 * least((tok_chars / n_tokens) / 8.0, 1.0) AS quality
FROM s ORDER BY doc_id
""")
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristic: length, word-shape, and stopword
    ratios combined into one [0,1] score — the standard pre-training
    filter signal, computed entirely JVM-side."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return quality_score_t(docs).orderBy("doc_id")


def quality_col() -> Column:
    """The quality formula as ONE column expression over a frame with
    `text` — for fusing the score into another operator's projection
    (quality_pr_curve computes it inside gopher_keep's single scan).
    Same math as quality_score_t / QUALITY_ORACLE_SELECT; keep all
    three in lockstep."""
    toks = tokens("text")
    n = F.size(toks)
    tok_chars = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                            F.lit(0), lambda acc, x: acc + x)
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a"))) / n
    avg_len = tok_chars / n
    return (0.4 * F.least(n / 100.0, F.lit(1.0))
            + 0.3 * (1.0 - stop)
            + 0.3 * F.least(avg_len / 8.0, F.lit(1.0)))


def quality_score_t(docs: DataFrame) -> DataFrame:
    """Unordered operator form of quality_score."""
    toks = tokens("text")
    s = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(F.transform(toks, lambda t: F.length(t)),
                    F.lit(0), lambda acc, x: acc + x).alias("tok_chars"),
        F.size(F.filter(toks, lambda t: t.isin("the", "a"))).alias("n_stop"))
    avg_len = F.col("tok_chars") / F.col("n_tokens")
    stop = F.col("n_stop") / F.col("n_tokens")
    # No rounding: every term is per-row exact arithmetic (identical
    # in both engines); rounding at a decimal half-boundary is what
    # would break parity (Spark HALF_UP vs DuckDB binary round).
    return s.select(
        "doc_id", "n_tokens",
        avg_len.alias("avg_token_len"),
        stop.alias("stopword_ratio"),
        (0.4 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
         + 0.3 * (1.0 - stop)
         + 0.3 * F.least(avg_len / 8.0, F.lit(1.0))).alias("quality"))


@register("doc_fingerprint", oracle=f"""
SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(
                range(1, least(length(text), {FP_LEN}) + 1),
                i -> ascii(substr(text, i, 1))::BIGINT * ({FP_POW})[i])), 0)
            % {FP_MOD} AS BIGINT) AS fp
FROM documents ORDER BY doc_id
""")
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial fingerprint of the document head — the cheap
    content-identity key for incremental ingest (constants.py)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return doc_fingerprint_t(docs).orderBy("doc_id")


def doc_fingerprint_t(docs: DataFrame) -> DataFrame:
    """Unordered operator form of doc_fingerprint."""
    return docs.select("doc_id", rolling_fingerprint("text").alias("fp"))


CHUNK_SIZE, CHUNK_STRIDE = 200, 150


@register("chunk_sliding", oracle=f"""
WITH s AS (
  SELECT doc_id, text,
         GREATEST(1, CAST(ceil((length(text) - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0)
                          AS BIGINT) + 1) AS k
  FROM documents),
e AS (SELECT doc_id, text, unnest(range(0, k)) AS ci FROM s)
SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
       substr(text, CAST(ci * {CHUNK_STRIDE} + 1 AS INT), {CHUNK_SIZE}) AS chunk,
       CAST(length(substr(text, CAST(ci * {CHUNK_STRIDE} + 1 AS INT),
                          {CHUNK_SIZE})) AS INT) AS chunk_len
FROM e ORDER BY doc_id, chunk_idx
""")
def chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (size 200, stride 150 chars) —
    the ingest step every vector-DB pipeline runs before embedding
    (reference: collections store chunk-level records, e.g. the
    add/upsert batch APIs of all five backends).

    Pure JVM: sequence+explode fans each doc into its chunk offsets,
    substr materializes the window. Map-side only — no shuffle, no
    UDF; at 100 TB this is a single pass whose output partitioning
    inherits the scan's. The final ORDER BY exists for the oracle's
    deterministic compare, not the pipeline (compose with
    chunk_sliding_t to avoid it)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return chunk_sliding_t(docs).orderBy("doc_id", "chunk_idx")


def chunk_sliding_t(docs: DataFrame) -> DataFrame:
    """Unordered operator form of chunk_sliding."""
    n = F.length("text")
    k = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((n - CHUNK_SIZE) / F.lit(float(CHUNK_STRIDE))) + 1)
    chunk = F.col("text").substr(
        (F.col("ci") * CHUNK_STRIDE + 1).cast("int"), F.lit(CHUNK_SIZE))
    return (docs.select(
                "doc_id", "text",
                F.explode(F.sequence(F.lit(0).cast("long"), k - 1)).alias("ci"))
            .select("doc_id",
                    F.col("ci").cast("int").alias("chunk_idx"),
                    chunk.alias("chunk"),
                    F.length(chunk).alias("chunk_len")))


def _bucket_sql() -> str:
    return "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"


@register("hash_sample", oracle=f"""
SELECT doc_id, source, CAST({_bucket_sql()} AS BIGINT) AS bucket
FROM documents
WHERE {_bucket_sql()} < 20
ORDER BY doc_id
""")
def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% sample by md5 bucket of the stable id — the
    reproducible alternative to rand()-based sampling for training
    pipelines: same rows on every run, every engine, any partitioning,
    and membership is decidable per-row (map-side, no state)."""
    from ..functions.hashing import md5_int32
    docs = tables.load(spark, sf_dir, "documents")
    bucket = md5_int32(F.col("doc_id").cast("string")) % 100
    return (docs.select("doc_id", "source", bucket.alias("bucket"))
                .where(F.col("bucket") < 20)
                .orderBy("doc_id"))


@register("hash_split_counts", oracle=f"""
SELECT CASE WHEN {_bucket_sql()} < 80 THEN 'train'
            WHEN {_bucket_sql()} < 90 THEN 'val'
            ELSE 'test' END AS split,
       source, count(*) AS n
FROM documents
GROUP BY 1, 2 ORDER BY 1, 2
""")
def hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment (80/10/10) from the same md5 bucket:
    the split is a pure function of the id, so it is stable under
    re-partitioning, re-ingest, and incremental appends — documents
    never migrate between splits. One partial-agg groupBy."""
    from ..functions.hashing import md5_int32
    docs = tables.load(spark, sf_dir, "documents")
    bucket = md5_int32(F.col("doc_id").cast("string")) % 100
    split = (F.when(bucket < 80, "train")
              .when(bucket < 90, "val")
              .otherwise("test"))
    return (docs.groupBy(split.alias("split"), "source")
                .agg(F.count("*").alias("n"))
                .orderBy("split", "source"))


@register("stratified_sample", oracle=f"""
WITH r AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                    doc_id) AS rk
  FROM documents)
SELECT doc_id, lang, source, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5 ORDER BY lang, rk
""")
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: a fixed quota per stratum
    (5 docs per language), chosen by md5-of-id order — a reproducible
    'random' draw that is stable across runs, engines, partitionings
    and (unlike rand()-based sampleBy) re-selects the SAME documents
    when the corpus is re-read. One window shuffle on the stratum key;
    at scale prefer pre-aggregated per-stratum counts + hash-threshold
    when quotas are proportional rather than fixed."""
    from ..functions.hashing import md5_int32
    docs = tables.load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W
    w = (W.partitionBy("lang")
          .orderBy(md5_int32(F.col("doc_id").cast("string")), "doc_id"))
    return (docs.select("doc_id", "lang", "source",
                        F.row_number().over(w).alias("rk"))
                .where(F.col("rk") <= 5)
                .orderBy("lang", "rk"))


# ------------------------------------------------------ vocab coverage

VOCAB_TOP = 50


@register("vocab_coverage", oracle=f"""
WITH tok AS (SELECT unnest({_tok_sql()}) AS term FROM documents),
cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
tot AS (SELECT sum(n) AS total FROM cnt),
top AS (SELECT term, n FROM cnt ORDER BY n DESC, term LIMIT {VOCAB_TOP}),
r AS (SELECT term, n,
             row_number() OVER (ORDER BY n DESC, term) AS rank,
             sum(n) OVER (ORDER BY n DESC, term
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM top)
SELECT CAST(rank AS INT) AS rank, term, n AS n_tokens,
       round(cum * 1.0 / total, 6) AS cum_share
FROM r, tot ORDER BY rank
""")
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage curve: the top-N corpus terms
    with the cumulative share of all tokens they cover — the standard
    diagnostic for sizing a vocab / stopword list (what fraction of
    the stream the first N entries absorb).

    Scale shape: ONE token pass + one partial-agg'd groupBy(term);
    the curve itself is computed on the TakeOrdered top-N ONLY, and
    the running sum uses the window-free bounded-array shape (a
    slice-aggregate over <= N elements), so nothing rank-shaped ever
    sees corpus-sized input. The scalar total joins in as a 1-row
    broadcast."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    cnt = (docs.select(F.explode(tokens("text")).alias("term"))
               .groupBy("term").agg(F.count("*").alias("n")))
    tot = cnt.agg(F.sum("n").alias("total"))
    top = cnt.orderBy(F.desc("n"), "term").limit(VOCAB_TOP)
    arr = top.agg(F.array_sort(F.collect_list(F.struct(
        (-F.col("n")).alias("_neg"), F.col("term").alias("term"),
        F.col("n").alias("n")))).alias("a"))
    return (arr.select(F.posexplode("a").alias("_pos", "_s"), "a")
               .crossJoin(F.broadcast(tot))
               .select((F.col("_pos") + 1).cast("int").alias("rank"),
                       F.col("_s.term").alias("term"),
                       F.col("_s.n").alias("n_tokens"),
                       F.round(F.expr(
                           "aggregate(slice(a, 1, _pos + 1), 0L, "
                           "(acc, s) -> acc + s.n)") * 1.0
                           / F.col("total"), 6).alias("cum_share"))
               .orderBy("rank"))


# ------------------------------------------------------ BPE-ish token count

# A GPT-2-class pre-tokenizer split (letter runs | digit runs |
# punctuation singletons) — the regex family every BPE tokenizer
# applies before merges. Token COUNTS from this split are the
# standard cheap estimator for LLM training-data budgeting ("how many
# tokens is this corpus?") without shipping a tokenizer model.
BPE_SPLIT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register("token_count_bpe", oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         len(regexp_extract_all(lower(text), '{BPE_SPLIT}')) AS n_tok
  FROM documents)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(sum(n_tok) * 1.0 / count(*), 6) AS avg_tokens,
       round(sum(n_chars) * 1.0 / sum(n_tok), 6) AS chars_per_token
FROM t GROUP BY lang ORDER BY lang
""")
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-pre-tokenizer token counting (the brief's 'whitespace + a
    BPE-ish regex' pair with X2's whitespace stats): per-doc token
    count = |regexp_extract_all| of the letter/digit/punct split, no
    explode — the array materializes and collapses INSIDE the scan
    stage projection; the only shuffle is the |langs|-row rollup.
    chars_per_token is the budgeting ratio (≈4 for English prose)."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    n_tok = F.size(F.expr(
        f"regexp_extract_all(lower(text), '{BPE_SPLIT}', 0)"))
    t = docs.select("lang", "n_chars", n_tok.alias("n_tok"))
    return (t.groupBy("lang")
             .agg(F.count("*").alias("n_docs"),
                  F.sum("n_tok").cast("long").alias("total_tokens"),
                  F.round(F.sum("n_tok") / F.count("*"), 6)
                   .alias("avg_tokens"),
                  F.round(F.sum("n_chars") / F.sum("n_tok"), 6)
                   .alias("chars_per_token"))
             .orderBy("lang"))
