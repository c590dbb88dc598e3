"""Suggesters and highlighting (ES term/completion suggester and
highlight APIs — reference README.md:93-96 implies the ES client
surface via `elasticsearch-py`).

Both are scan-stage operators: the prefix predicate and the snippet
arithmetic run map-side inside the corpus scan; the only shuffle is
the vocabulary-sized partial-agg count. At 100 TB a suggester would
read a materialized term-dictionary table (one groupBy, maintained
incrementally) instead of re-tokenizing — the query below IS that
builder plus the lookup fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..functions.text import exploded_tokens
from ..registry import register

_PREFIX = "s"
_HL_TERM = "vector"
_HL_PAD = 30


@register("suggest_prefix", oracle=f"""
SELECT token AS suggestion, count(*) AS freq,
       count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id,
             unnest(list_filter(string_split(trim(text), ' '), t -> t <> '')) AS token
      FROM documents)
WHERE token LIKE '{_PREFIX}%'
GROUP BY token
ORDER BY freq DESC, suggestion
LIMIT 10
""")
def suggest_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocompletion: corpus terms starting with the prefix,
    ranked by occurrence count. The prefix filter lands BEFORE the
    aggregation, so only matching tokens shuffle."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = exploded_tokens(docs, "doc_id", "text")
    return (tok.where(F.col("token").startswith(_PREFIX))
               .groupBy(F.col("token").alias("suggestion"))
               .agg(F.count("*").alias("freq"),
                    F.countDistinct("doc_id").alias("n_docs"))
               .orderBy(F.desc("freq"), "suggestion")
               .limit(10))


@register("search_highlight", oracle=f"""
SELECT doc_id, instr(text, '{_HL_TERM}') AS hit_pos,
       substr(text,
              greatest(instr(text, '{_HL_TERM}') - {_HL_PAD}, 1),
              {_HL_PAD} * 2 + length('{_HL_TERM}')) AS snippet
FROM documents
WHERE instr(text, '{_HL_TERM}') > 0
ORDER BY doc_id
LIMIT 25
""")
def search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet extraction around the first match of the query term —
    pure string arithmetic in the scan stage (map-side), the batch
    analog of ES highlight fragments."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    pos = F.instr(F.col("text"), _HL_TERM)
    start = F.greatest(pos - _HL_PAD, F.lit(1))
    return (docs.where(pos > 0)
                .select("doc_id", pos.alias("hit_pos"),
                        F.substring(F.col("text"), start,
                                    _HL_PAD * 2 + len(_HL_TERM)).alias("snippet"))
                .orderBy("doc_id")
                .limit(25))


# ------------------------------------------------------- phrase suggester

# ES phrase suggester ("did you mean"): per-term candidate corrections
# from the corpus vocabulary (bounded edit distance — T8's fuzzy
# expansion), then candidate PHRASES reranked by a corpus bigram
# confusion model (stupid-backoff-style add-one bigram logprob) minus
# an edit-cost penalty. VERDICT r4 "What's missing" #1.
_SP_TERMS = ("tble", "jine", "smal")   # user typed: "tble jine smal"
_SP_MAXD = 2
_SP_CAND = 3
_SP_EDIT_PENALTY = 0.5
_SP_TOP = 5


def _sp_oracle() -> str:
    from .lm import _TOK_CTE
    vals = ", ".join(f"({i + 1}, '{t}')" for i, t in enumerate(_SP_TERMS))
    return f"""
WITH {_TOK_CTE},
vocab AS (SELECT token, count(*) AS freq FROM tok GROUP BY token),
nv AS (SELECT count(*) AS nvocab FROM vocab),
terms(pos, term) AS (VALUES {vals}),
cand AS (
  SELECT pos, token, levenshtein(token, term) AS dist, freq,
         row_number() OVER (PARTITION BY pos
             ORDER BY levenshtein(token, term), freq DESC, token) AS rnk
  FROM vocab, terms WHERE levenshtein(token, term) <= {_SP_MAXD}),
c1 AS (SELECT token AS w1, dist AS d1 FROM cand WHERE pos = 1 AND rnk <= {_SP_CAND}),
c2 AS (SELECT token AS w2, dist AS d2 FROM cand WHERE pos = 2 AND rnk <= {_SP_CAND}),
c3 AS (SELECT token AS w3, dist AS d3 FROM cand WHERE pos = 3 AND rnk <= {_SP_CAND}),
combos AS (SELECT w1, w2, w3, d1 + d2 + d3 AS td FROM c1, c2, c3),
bc AS (SELECT w1 AS a, w2 AS b, count(*) AS c12 FROM b GROUP BY 1, 2),
uc AS (SELECT w1 AS a, count(*) AS c1 FROM b GROUP BY 1)
SELECT concat(w1, ' ', w2, ' ', w3) AS suggestion,
       CAST(td AS INT) AS total_dist,
       round(ln((coalesce(b1.c12, 0) + 1.0) / (coalesce(u1.c1, 0) + nvocab))
           + ln((coalesce(b2.c12, 0) + 1.0) / (coalesce(u2.c1, 0) + nvocab))
           - {_SP_EDIT_PENALTY} * td, 6) AS score
FROM combos CROSS JOIN nv
LEFT JOIN bc b1 ON b1.a = w1 AND b1.b = w2
LEFT JOIN bc b2 ON b2.a = w2 AND b2.b = w3
LEFT JOIN uc u1 ON u1.a = w1
LEFT JOIN uc u2 ON u2.a = w2
ORDER BY score DESC, suggestion LIMIT {_SP_TOP}
"""


@register("suggest_phrase", oracle=_sp_oracle)
def suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester ("did you mean"): each query term expands
    to its top edit-distance-{_SP_MAXD} vocabulary corrections (ranked
    dist asc, corpus freq desc — one vocab pass with the 3-term frame
    broadcast, T8's fuzzy shape); the ≤{_SP_CAND}^3 candidate phrases
    are then scored by an add-one corpus bigram model minus an
    edit-cost penalty. Scale shape: the corpus touches only two
    vocabulary-sized aggs (bigram + unigram counts) and ONE vocab scan
    for candidates; the bigram/unigram tables are pruned by a
    broadcast semi-join on the ≤2·{_SP_CAND}² candidate pairs before
    the (tiny × tiny) scoring joins — no corpus-sized shuffle carries
    phrase state. Reference surface: ES suggesters via the
    elasticsearch client (reference README.md:93-96)."""
    from .lm import doc_bigrams
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    tok = exploded_tokens(docs, "doc_id", "text")
    # Checkpoint the two vocabulary-sized model tables (lazily — dsir
    # precedent): WITHOUT this, every broadcast subtree below re-runs
    # its own corpus token explode (~6 full passes; the 64x probe
    # measured 13.7 s at sf0.1 for what is one explode of work). At
    # 100 TB these tables are computed once at ingest and stored.
    vocab = (tok.groupBy("token").agg(F.count("*").alias("freq"))
                .localCheckpoint(eager=False))
    nv = vocab.agg(F.count("*").alias("nvocab"))
    terms = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(_SP_TERMS)], "pos int, term string")
    dist = F.levenshtein("token", "term")
    cand = (vocab.crossJoin(F.broadcast(terms))
                 .where(dist <= _SP_MAXD)
                 .select("pos", "token", dist.alias("dist"), "freq"))
    rnk = F.row_number().over(
        W.partitionBy("pos").orderBy("dist", F.desc("freq"), "token"))
    cand = (cand.withColumn("rnk", rnk).where(F.col("rnk") <= _SP_CAND)
                .localCheckpoint(eager=False))  # ≤3·CAND rows, read 3x
    c1 = cand.where(F.col("pos") == 1).select(
        F.col("token").alias("w1"), F.col("dist").alias("d1"))
    c2 = cand.where(F.col("pos") == 2).select(
        F.col("token").alias("w2"), F.col("dist").alias("d2"))
    c3 = cand.where(F.col("pos") == 3).select(
        F.col("token").alias("w3"), F.col("dist").alias("d3"))
    combos = (c1.crossJoin(F.broadcast(c2)).crossJoin(F.broadcast(c3))
                .select("w1", "w2", "w3",
                        (F.col("d1") + F.col("d2") + F.col("d3")).alias("td")))

    b = doc_bigrams(docs)
    bc = (b.groupBy(F.col("w1").alias("a"), F.col("w2").alias("b"))
           .agg(F.count("*").alias("c12"))
           .localCheckpoint(eager=False))  # ONE bigram pass, read twice
    # prune the vocabulary-sized count tables down to the candidate
    # pairs/tokens BEFORE the scoring joins (broadcast semi-joins) —
    # the scoring joins then run tiny x tiny. Unigram counts derive
    # FROM the checkpointed bigram table (c1(a) = Σ_b c12(a,b) — same
    # w1-occurrence count), not from a second corpus pass.
    pairs = (combos.select(F.col("w1").alias("a"), F.col("w2").alias("b"))
             .union(combos.select(F.col("w2").alias("a"),
                                  F.col("w3").alias("b"))).distinct())
    toks = (combos.select(F.col("w1").alias("a"))
            .union(combos.select(F.col("w2").alias("a"))).distinct())
    bcf = bc.join(F.broadcast(pairs), ["a", "b"])
    ucf = (bc.join(F.broadcast(toks), ["a"])
             .groupBy("a").agg(F.sum("c12").alias("c1")))

    def lp(c12, c1):
        return F.log((F.coalesce(c12, F.lit(0)) + 1.0)
                     / (F.coalesce(c1, F.lit(0)) + F.col("nvocab")))

    b1 = bcf.select(F.col("a").alias("w1"), F.col("b").alias("w2"),
                    F.col("c12").alias("c12_1"))
    b2 = bcf.select(F.col("a").alias("w2"), F.col("b").alias("w3"),
                    F.col("c12").alias("c12_2"))
    u1 = ucf.select(F.col("a").alias("w1"), F.col("c1").alias("c1_1"))
    u2 = ucf.select(F.col("a").alias("w2"), F.col("c1").alias("c1_2"))
    scored = (combos.crossJoin(F.broadcast(nv))
              .join(F.broadcast(b1), ["w1", "w2"], "left")
              .join(F.broadcast(b2), ["w2", "w3"], "left")
              .join(F.broadcast(u1), ["w1"], "left")
              .join(F.broadcast(u2), ["w2"], "left"))
    score = F.round(lp(F.col("c12_1"), F.col("c1_1"))
                    + lp(F.col("c12_2"), F.col("c1_2"))
                    - _SP_EDIT_PENALTY * F.col("td"), 6)
    return (scored.select(
                F.concat_ws(" ", "w1", "w2", "w3").alias("suggestion"),
                F.col("td").cast("int").alias("total_dist"),
                score.alias("score"))
            .orderBy(F.desc("score"), "suggestion").limit(_SP_TOP))


# ------------------------------------------------- context suggester

CTX_LANG = "en"


@register("suggest_context", oracle=f"""
SELECT token AS suggestion, count(*) AS freq,
       count(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id,
             unnest(list_filter(string_split(trim(text), ' '),
                                t -> t <> '')) AS token
      FROM documents WHERE lang = '{CTX_LANG}')
WHERE token LIKE '{_PREFIX}%'
GROUP BY token
ORDER BY freq DESC, suggestion
LIMIT 10
""")
def suggest_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester with CONTEXTS (category context =
    lang): completions ranked by frequency WITHIN the context's
    documents only — "type 's', suggest from English docs". The
    context predicate lands on the scan BEFORE tokenization (a
    partition-column filter when the collection is context-
    partitioned, the S5/tenant layout), then T11's prefix shape."""
    docs = (tables.load_parallel(spark, sf_dir, "documents", "doc_id")
            .where(F.col("lang") == CTX_LANG))
    tok = exploded_tokens(docs, "doc_id", "text")
    return (tok.where(F.col("token").startswith(_PREFIX))
               .groupBy(F.col("token").alias("suggestion"))
               .agg(F.count("*").alias("freq"),
                    F.countDistinct("doc_id").alias("n_docs"))
               .orderBy(F.desc("freq"), "suggestion")
               .limit(10))


# --------------------------------------------------------- terms_enum

TE_PREFIX = "s"
TE_PAGE = 5
TE_PAGES = 2


@register("terms_enum", oracle=f"""
WITH v AS (
  SELECT DISTINCT token AS term
  FROM (SELECT unnest(list_filter(string_split(trim(text), ' '),
                                  t -> t <> '')) AS token
        FROM documents)
  WHERE token LIKE '{TE_PREFIX}%'),
r AS (SELECT term, row_number() OVER (ORDER BY term) AS rn FROM v)
SELECT CAST(floor((rn - 1) / {TE_PAGE}.0) AS INT) + 1 AS page,
       CAST(rn - (CAST(floor((rn - 1) / {TE_PAGE}.0) AS INT))
            * {TE_PAGE} AS INT) AS pos,
       term
FROM r WHERE rn <= {TE_PAGE * TE_PAGES}
ORDER BY page, pos
""")
def terms_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_terms_enum` API: enumerate the index's term dictionary
    for terms matching a prefix, in LEXICAL order (NOT
    frequency-ranked — that is suggest_prefix next door), `size`
    {TE_PAGE} per page with `search_after` resuming from the last
    term of the previous page ({TE_PAGES} pages here; rank paging is
    exactly the cursor semantics because the order is total). The
    call autocomplete UIs use for low-latency keyword completion
    straight off the term dictionary.

    Scale shape: the term dictionary is ONE distinct-token
    explode+groupBy pass with the prefix pushed below the distinct
    (a real inverted index serves this from its sorted term file —
    the inverted.py layout); the surviving vocabulary slice is
    bounded, ranked window-free by the bounded-array shape, and the
    page cut is map-side arithmetic."""
    from .hybrid import bounded_ranks
    vocab = (exploded_tokens(tables.load_parallel(
                 spark, sf_dir, "documents", "doc_id"),
                 "doc_id", "text")
             .where(F.col("token").startswith(TE_PREFIX))
             .select(F.col("token").alias("term")).distinct())
    r = bounded_ranks(vocab.withColumn("_z", F.lit(0)), "_z", "term",
                      "rn")
    page = (F.floor((F.col("rn") - 1) / float(TE_PAGE)).cast("int")
            + F.lit(1))
    return (r.where(F.col("rn") <= TE_PAGE * TE_PAGES)
             .select(page.alias("page"),
                     (F.col("rn") - (page - 1) * TE_PAGE).cast("int")
                      .alias("pos"),
                     "term")
             .orderBy("page", "pos"))
