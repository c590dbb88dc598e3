"""Search-surface extensions, r8 wave: `match_bool_prefix`,
`multi_match` cross_fields, `constant_score` filter-context scoring,
`span_multi` (a multi-term query inside the span algebra), and the
fuzzy completion suggester.

Reference parity (the elastic backend's query surface,
`README.md:82` `VECTOR_DB=elastic`): ES `match_bool_prefix` (every
token a term clause, the LAST token a prefix clause — the
type-ahead cousin of match_phrase_prefix), `multi_match` with
`type: cross_fields` (terms blended ACROSS fields: each term may
match in any field, per-term score is the best field's, AND operator
requires every term to land somewhere), `constant_score` (filter
context scores a fixed boost regardless of tf — the bool
filter/should split every ES tutorial leads with), `span_multi`
(a wildcard/prefix multi-term query lifted into span positions so it
composes with span_near slop), and the completion suggester with
`fuzzy` (prefix matching that forgives one edit, ES
suggest.completion.fuzzy.fuzziness=1 with the default
prefix_length=1 first-char prune).

Scale shapes: the first four are map-side array math over the scan —
per-document token/position lists, zero corpus shuffle, TakeOrdered
pages the top-k. The fuzzy completion suggester builds the token
vocabulary with ONE explode+groupBy pass (the only shuffle,
map-side combined), broadcasts the tiny input list, and prunes by
first char + the fixed prefix window BEFORE levenshtein — the edit
distance runs on a per-first-letter sliver of the vocabulary, the
same posture as the term suggester beside it.

Float determinism: scores are sums/maxima of integer tf counts and
inlined double literals — identical IEEE ops on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..functions.text import tokens
from ..registry import register

_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

# ------------------------------------------------------ match_bool_prefix

MBP_TERM = "data"          # full term clause
MBP_PREFIX = "qu"          # trailing prefix clause ("qu" -> "query")
MBP_TOP = 20


@register("match_bool_prefix_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
s AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x = '{MBP_TERM}')) AS BIGINT)
           AS tf_term,
         CAST(len(list_filter(toks, x -> starts_with(x, '{MBP_PREFIX}')))
           AS BIGINT) AS tf_prefix
  FROM t)
SELECT doc_id, tf_term, tf_prefix, tf_term + tf_prefix AS score
FROM s WHERE tf_term + tf_prefix > 0
ORDER BY score DESC, doc_id LIMIT {MBP_TOP}
""")
def match_bool_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `match_bool_prefix` for the query "{MBP_TERM} {MBP_PREFIX}":
    a bool SHOULD of a term clause per completed token plus a prefix
    clause on the last partial token — the query-correction shape
    type-ahead boxes send on every keystroke. Score = tf of the term
    clause + tf of the prefix expansion (each prefix-matched
    occurrence counts once, ES's constant-ish prefix scoring folded
    to term frequency so ties break on evidence). OR semantics:
    either clause alone admits the doc."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = tokens("text")
    tf_term = F.size(F.filter(toks, lambda x: x == MBP_TERM)).cast("long")
    tf_prefix = F.size(
        F.filter(toks, lambda x: x.startswith(MBP_PREFIX))).cast("long")
    out = docs.select("doc_id", tf_term.alias("tf_term"),
                      tf_prefix.alias("tf_prefix"))
    return (out.withColumn("score", F.col("tf_term") + F.col("tf_prefix"))
               .where(F.col("score") > 0)
               .orderBy(F.desc("score"), "doc_id").limit(MBP_TOP))


# ------------------------------------------------ multi_match cross_fields

XF_TEXT_TERM = "stream"    # lands in the analyzed text field
XF_KEY_TERM = "src3"       # lands only in the keyword source field
XF_KEY_BOOST = 3.0         # keyword-field match weight
XF_TOP = 20


@register("multi_match_cross_fields", oracle=f"""
WITH t AS (SELECT doc_id, source, {_TOK} AS toks FROM documents),
s AS (
  SELECT doc_id,
         greatest(
           CAST(len(list_filter(toks, x -> x = '{XF_TEXT_TERM}'))
                AS DOUBLE),
           CASE WHEN source = '{XF_TEXT_TERM}' THEN {XF_KEY_BOOST!r}
                ELSE 0.0e0 END) AS s_t1,
         greatest(
           CAST(len(list_filter(toks, x -> x = '{XF_KEY_TERM}'))
                AS DOUBLE),
           CASE WHEN source = '{XF_KEY_TERM}' THEN {XF_KEY_BOOST!r}
                ELSE 0.0e0 END) AS s_t2
  FROM t)
SELECT doc_id, s_t1, s_t2, s_t1 + s_t2 AS score
FROM s WHERE s_t1 > 0 AND s_t2 > 0
ORDER BY score DESC, doc_id LIMIT {XF_TOP}
""")
def multi_match_cross_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_match` type `cross_fields`, operator AND, over the
    analyzed `text` field and the keyword `source` field for the
    query "{XF_TEXT_TERM} {XF_KEY_TERM}": the fields are blended into
    one logical field — each term may satisfy its clause in EITHER
    field, the per-term score is the best field's contribution (tf in
    text, a fixed {XF_KEY_BOOST} for a keyword hit), and AND requires
    every term to land somewhere. This is the type that fixes the
    "first name in one field, last name in another" failure of
    best_fields — here '{XF_KEY_TERM}' can only ever match `source`,
    yet docs still qualify when '{XF_TEXT_TERM}' matches `text`."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = tokens("text")

    def term_score(term: str):
        tf = F.size(F.filter(toks, lambda x: x == term)).cast("double")
        kw = F.when(F.col("source") == term, F.lit(XF_KEY_BOOST)) \
              .otherwise(F.lit(0.0))
        return F.greatest(tf, kw)

    out = docs.select("doc_id",
                      term_score(XF_TEXT_TERM).alias("s_t1"),
                      term_score(XF_KEY_TERM).alias("s_t2"))
    return (out.where((F.col("s_t1") > 0) & (F.col("s_t2") > 0))
               .withColumn("score", F.col("s_t1") + F.col("s_t2"))
               .select("doc_id", "s_t1", "s_t2", "score")
               .orderBy(F.desc("score"), "doc_id").limit(XF_TOP))


# ---------------------------------------------------------- constant_score

CS_FILTER_LANG = "en"
CS_CLAUSES = (("vector", 1.2), ("merge", 0.7))
CS_TOP = 20


def _cs_oracle() -> str:
    parts = " + ".join(
        f"CASE WHEN len(list_filter(toks, x -> x = '{t}')) > 0 "
        f"THEN {b!r} ELSE 0.0e0 END" for t, b in CS_CLAUSES)
    return f"""
WITH t AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
s AS (SELECT doc_id, {parts} AS score FROM t
      WHERE lang = '{CS_FILTER_LANG}')
SELECT doc_id, score FROM s WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {CS_TOP}
"""


@register("constant_score_search", oracle=_cs_oracle)
def constant_score_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `bool` with a non-scoring `filter` clause
    (lang = '{CS_FILTER_LANG}') plus `constant_score` SHOULD clauses
    — each matching clause contributes exactly its boost, never tf:
    the canonical filter-context / query-context split. A doc
    matching 'vector' ten times scores the same 1.2 as a doc matching
    it once (pinned by test); the filter clause contributes 0 and
    exists only to gate. Scale: the filter is a pushed scan
    predicate, the boosts are map-side CASE — zero corpus shuffle,
    TakeOrdered pages."""
    docs = tables.load(spark, sf_dir, "documents")
    toks = tokens("text")
    def clause(term, boost):
        # NB: a two-arg lambda would be read by F.filter as the
        # (value, index) form — bind the term via closure instead.
        return F.when(F.size(F.filter(toks, lambda x: x == term)) > 0,
                      F.lit(boost)).otherwise(F.lit(0.0))

    score = None
    for term, boost in CS_CLAUSES:
        c = clause(term, boost)
        score = c if score is None else score + c
    return (docs.where(F.col("lang") == CS_FILTER_LANG)
                .select("doc_id", score.alias("score"))
                .where(F.col("score") > 0)
                .orderBy(F.desc("score"), "doc_id").limit(CS_TOP))


# -------------------------------------------------------------- span_multi

SM_PREFIX = "s"        # span_multi(prefix 's') -> scan/small/slow/sort/...
SM_LIT = "join"        # paired literal span
SM_SLOP = 3
SM_TOP = 20


@register("span_multi_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1),
                     i -> starts_with(toks[i], '{SM_PREFIX}')) AS pm,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SM_LIT}') AS pj
  FROM t),
s AS (
  SELECT doc_id, CAST(len(pm) AS BIGINT) AS n_multi,
         CAST(len(flatten(list_transform(pm, a ->
              list_filter(pj, b -> abs(a - b) <= {SM_SLOP}))))
           AS BIGINT) AS n_pairs
  FROM p)
SELECT doc_id, n_multi, n_pairs FROM s WHERE n_pairs > 0
ORDER BY n_pairs DESC, doc_id LIMIT {SM_TOP}
""")
def span_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_multi` wrapping a prefix query ('{SM_PREFIX}*') as
    one side of a span_near with '{SM_LIT}', slop {SM_SLOP}: the
    multi-term expansion is lifted into POSITIONS (any token starting
    with the prefix is a span occurrence), so it composes with the
    span algebra's proximity instead of collapsing to a bag-of-terms
    match. Docs ranked by the number of (expansion, literal) position
    pairs within the slop.

    Scale shape: per-doc position lists built map-side with the
    index-aware transform (same substrate as span_within/containing);
    the pair product is per-document over two bounded tf lists —
    zero corpus shuffle."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")
    pm = F.filter(
        F.transform(toks, lambda t, i: F.when(t.startswith(SM_PREFIX),
                                              i + 1).otherwise(F.lit(-1))),
        lambda x: x >= 0)
    pj = F.filter(
        F.transform(toks, lambda t, i: F.when(t == SM_LIT, i + 1)
                    .otherwise(F.lit(-1))),
        lambda x: x >= 0)
    pairs = F.flatten(F.transform(
        pm, lambda a: F.filter(pj, lambda b: F.abs(a - b) <= SM_SLOP)))
    out = docs.select("doc_id",
                      F.size(pm).cast("long").alias("n_multi"),
                      F.size(pairs).cast("long").alias("n_pairs"))
    return (out.where(F.col("n_pairs") > 0)
               .orderBy(F.desc("n_pairs"), "doc_id").limit(SM_TOP))


# ------------------------------------------------ completion suggester

CF_INPUTS = ("quary", "strem")   # misspelled type-ahead prefixes
CF_FUZZ = 1                      # suggest.completion.fuzzy.fuzziness
CF_PER = 3


@register("suggest_completion_fuzzy", oracle=f"""
WITH tok AS (SELECT unnest({_TOK}) AS term FROM documents),
vocab AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
q AS (SELECT unnest({list(CF_INPUTS)!r}) AS input),
cand AS (
  SELECT q.input, v.term, CAST(v.freq AS BIGINT) AS weight,
         CAST(levenshtein(substr(v.term, 1, len(q.input)), q.input)
           AS INT) AS dist
  FROM q JOIN vocab v
    ON substr(v.term, 1, 1) = substr(q.input, 1, 1)
   AND len(v.term) >= len(q.input) - {CF_FUZZ}
  WHERE levenshtein(substr(v.term, 1, len(q.input)), q.input)
          <= {CF_FUZZ}),
r AS (
  SELECT input, term, weight, dist,
         row_number() OVER (PARTITION BY input
                            ORDER BY weight DESC, term) AS rank
  FROM cand)
SELECT input, term, weight, dist, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {CF_PER}
ORDER BY input, rank
""")
def suggest_completion_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester with `fuzzy.fuzziness={CF_FUZZ}`:
    type-ahead inputs {CF_INPUTS} match vocabulary terms whose PREFIX
    (the input-length head of the term) is within {CF_FUZZ} edit of
    the input — 'quary' still completes to 'query' — ranked by
    weight (corpus frequency, the ES default when no explicit weight
    is indexed), ES's fuzzy default prefix_length=1 pruning the
    candidate set to the first-letter bucket before any edit
    distance.

    Scale shape: vocabulary = ONE explode+groupBy corpus pass; the
    input list broadcasts; first-char + length-band pruning runs
    map-side over vocabulary rows BEFORE levenshtein (the term
    suggester's posture), then a window over ≤|inputs|·candidates
    rows ranks."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    vocab = (docs.select(F.explode(tokens("text")).alias("term"))
                 .groupBy("term").agg(F.count("*").alias("freq")))
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in CF_INPUTS])).alias("input"))
    head = F.substring(F.col("term"), 1, 1)
    dist = F.levenshtein(
        F.expr("substr(term, 1, length(input))"), F.col("input"))
    cand = (vocab.join(F.broadcast(q),
                       (head == F.substring(F.col("input"), 1, 1))
                       & (F.length("term")
                          >= F.length("input") - CF_FUZZ))
                 .where(dist <= CF_FUZZ)
                 .select("input", "term",
                         F.col("freq").cast("long").alias("weight"),
                         dist.cast("int").alias("dist")))
    w = W.partitionBy("input").orderBy(F.desc("weight"), "term")
    return (cand.withColumn("rank", F.row_number().over(w).cast("int"))
                .where(F.col("rank") <= CF_PER)
                .select("input", "term", "weight", "dist", "rank")
                .orderBy("input", "rank"))


# --------------------------------------------------- full bool query

BOOL_MUST = "data"
BOOL_SHOULD = ("merge", "vector", "fast")
BOOL_NOT = "slow"
BOOL_FILTER_LANG = "en"
BOOL_MSM = 1      # minimum_should_match
BOOL_K = 15

_BQ_TERMS = (BOOL_MUST,) + BOOL_SHOULD
_BQ_TERMS_SQL = "('" + "', '".join(_BQ_TERMS) + "')"
_BQ_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"


@register("bool_query_search", oracle=f"""
WITH tok AS (SELECT doc_id, unnest({_BQ_TOK}) AS term FROM documents),
dl AS (SELECT doc_id, len({_BQ_TOK}) AS dl FROM documents),
stats AS (SELECT count(*) AS n, avg(len({_BQ_TOK})) AS avgdl
          FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN {_BQ_TERMS_SQL} GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
       WHERE term IN {_BQ_TERMS_SQL} GROUP BY 1),
flags AS (
  SELECT doc_id,
         list_contains({_BQ_TOK}, '{BOOL_MUST}') AS has_must,
         {" + ".join(f"CAST(list_contains({_BQ_TOK}, '{t}') AS INT)"
                     for t in BOOL_SHOULD)} AS n_should,
         lang = '{BOOL_FILTER_LANG}' AS f_lang,
         list_contains({_BQ_TOK}, '{BOOL_NOT}') AS has_neg
  FROM documents),
score AS (
  SELECT tf.doc_id,
         round(sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75
                                 + 0.75 * dl.dl / stats.avgdl))), 6)
           AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
  GROUP BY tf.doc_id)
SELECT f.doc_id, s.score, CAST(f.n_should AS INT) AS n_should
FROM flags f JOIN score s USING (doc_id)
WHERE f.has_must AND f.f_lang AND NOT f.has_neg
  AND f.n_should >= {BOOL_MSM}
ORDER BY s.score DESC, f.doc_id LIMIT {BOOL_K}
""")
def bool_query_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ES `bool` query in one plan — every clause kind
    composed: `must` (scored, required term), `filter` (required,
    NON-scoring — the filter-context half of the classic bool split),
    `must_not` (excluded), and `should` with `minimum_should_match`
    (optional scored clauses, at least MSM must land). Score = BM25
    sum over the matched must + should terms, exactly ES's
    sum-of-clause-scores; filter clauses contribute presence, never
    score.

    Scale shape: the zero-shuffle BM25 contract (bm25_search's shape)
    extended with clause flags — per-term tf, doc length, and every
    clause predicate are array ops in ONE map-side scan projection;
    one global agg reduces to the scalar stats row (N, avgdl,
    per-term df) that broadcasts back; scoring + clause gating is
    map-side arithmetic and the page is TakeOrdered. No explode, no
    groupBy(doc, term), no join — two parallel corpus scans at any
    size (constants from operators/hybrid.py: k1=1.2, b=0.75)."""
    from ..constants import BM25_B, BM25_K1

    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")

    def eq(term):
        return lambda t: t == F.lit(term)

    per = docs.select(
        "doc_id",
        F.size(tokens("text")).alias("dl"),
        (F.col("lang") == BOOL_FILTER_LANG).alias("f_lang"),
        F.array_contains(tokens("text"), BOOL_NOT).alias("has_neg"),
        *[F.size(F.filter(tokens("text"), eq(t))).alias(f"tf_{i}")
          for i, t in enumerate(_BQ_TERMS)])
    stats = per.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        *[F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
          for i in range(len(_BQ_TERMS))])
    parts = []
    for i in range(len(_BQ_TERMS)):
        tf = F.col(f"tf_{i}").cast("double")
        dfc = F.col(f"df_{i}").cast("double")
        idf = F.log(1 + (F.col("n") - dfc + 0.5) / (dfc + 0.5))
        w = (idf * tf * (BM25_K1 + 1.0)
             / (tf + BM25_K1 * (1.0 - BM25_B
                                + BM25_B * F.col("dl") / F.col("avgdl"))))
        parts.append(F.when(tf > 0, w).otherwise(F.lit(0.0)))
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    n_should = None
    for i in range(1, len(_BQ_TERMS)):
        c = (F.col(f"tf_{i}") > 0).cast("int")
        n_should = c if n_should is None else n_should + c
    return (per.crossJoin(F.broadcast(stats))
               .withColumn("n_should", n_should)
               .where((F.col("tf_0") > 0) & F.col("f_lang")
                      & ~F.col("has_neg")
                      & (F.col("n_should") >= BOOL_MSM))
               .select("doc_id", F.round(score, 6).alias("score"),
                       "n_should")
               .orderBy(F.desc("score"), "doc_id").limit(BOOL_K))
