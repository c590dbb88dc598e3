"""Query-surface completion: ES `match_phrase_prefix`, `regexp`,
`span_near` (unordered), `combined_fields`, plus Weaviate
`near_object` / Qdrant recommend-by-id (`knn_by_id`) and the
Qdrant/ES nested-JSON payload filter.

Reference parity: all five backends of the reference stack expose
some of these (README.md:82 backend selector) — match_phrase_prefix /
regexp / span_near / combined_fields are ES query DSL types; querying
by an existing object id is Weaviate `nearObject` and Qdrant
`recommend(positive=[id])`; filtering on a nested JSON payload field
is Qdrant payload filtering and the ES object-field query path.

Scale shapes — every text op here is MAP-SIDE ONLY over the token
array (no explode, no postings shuffle): per-doc counts come from
higher-order array functions in the scan stage, then one TakeOrdered
cut. The corpus is read exactly once per query; nothing shuffles but
the final top-N page. knn_by_id adds one broadcast 1-row query frame
(same contract as every other knn); nested_payload_filter is a
predicate + bucket-count agg with the JSON parse in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..registry import register
from .hybrid import _BM25_CTE as _HYBRID_BM25_CTE
from .hybrid import bm25_scores
from .knn import corpus_with_query, cosine_score, knn

_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

# ----------------------------------------------------- match_phrase_prefix

MPP_TERM = "fast"
MPP_PREFIX = "ta"


@register("match_phrase_prefix_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(toks)),
              i -> toks[i] = '{MPP_TERM}'
                   AND starts_with(toks[i + 1], '{MPP_PREFIX}')))
              AS BIGINT) AS n_matches
  FROM t)
SELECT doc_id, n_matches FROM m WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id LIMIT 20
""")
def match_phrase_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `match_phrase_prefix`: a phrase whose final term is a
    prefix — here "fast ta*" (matches e.g. "fast table"). Adjacent
    pairs are formed map-side with two array slices zipped together
    (no position explode, no sequence(1,0) descending-range pitfall:
    a slice of length 0 is empty); the count of matching pairs is the
    score. One scan, zero corpus shuffle, TakeOrdered page."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    m = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m))
    n = F.size(F.filter(
        pairs,
        lambda s: (s.getField("0") == MPP_TERM)
        & s.getField("1").startswith(MPP_PREFIX)))
    out = docs.select("doc_id", n.cast("long").alias("n_matches"))
    return (out.where(F.col("n_matches") > 0)
               .orderBy(F.desc("n_matches"), "doc_id").limit(20))


# ----------------------------------------------------------------- regexp

REGEX_PATTERN = "[sf].*t"  # full-match: fast, sort, ...


@register("regexp_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(toks,
              x -> regexp_full_match(x, '{REGEX_PATTERN}'))) AS BIGINT)
           AS n_occurrences,
         CAST(len(list_distinct(list_filter(toks,
              x -> regexp_full_match(x, '{REGEX_PATTERN}')))) AS BIGINT)
           AS n_terms
  FROM t)
SELECT doc_id, n_occurrences, n_terms FROM m WHERE n_occurrences > 0
ORDER BY n_occurrences DESC, doc_id LIMIT 20
""")
def regexp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `regexp` query: terms matching an anchored regular
    expression ("[sf].*t" — full-match semantics on both engines:
    Spark rlike with ^...$ anchors == DuckDB regexp_full_match).
    Scored by total occurrences + distinct matching terms, all
    map-side array math. At scale the regexp runs against a term
    DICTIONARY first (vocabulary << corpus), then matched terms drive
    a postings probe — same contract, same results."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    hit = F.filter(toks, lambda x: x.rlike(f"^{REGEX_PATTERN}$"))
    out = docs.select(
        "doc_id",
        F.size(hit).cast("long").alias("n_occurrences"),
        F.size(F.array_distinct(hit)).cast("long").alias("n_terms"))
    return (out.where(F.col("n_occurrences") > 0)
               .orderBy(F.desc("n_occurrences"), "doc_id").limit(20))


# -------------------------------------------------------------- span_near

SPAN_T1 = "vector"
SPAN_T2 = "table"
SPAN_SLOP = 3


@register("span_near_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_T1}') AS p1,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_T2}') AS p2
  FROM t),
g AS (
  SELECT doc_id,
         flatten(list_transform(p1,
             x -> list_transform(p2, y -> abs(x - y)))) AS gaps
  FROM p),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(gaps, d -> d <= {SPAN_SLOP})) AS BIGINT)
           AS n_pairs,
         CAST(list_min(list_filter(gaps, d -> d <= {SPAN_SLOP})) AS INT)
           AS min_gap
  FROM g)
SELECT doc_id, n_pairs, min_gap FROM m WHERE n_pairs > 0
ORDER BY n_pairs DESC, doc_id LIMIT 20
""")
def span_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_near` with `in_order: false`: both terms within a
    slop-token window in EITHER order (the ordered variant is
    phrase_slop_search). Per-doc position lists are built map-side
    with an index-aware transform; the pair-gap cross product is
    per-document (positions of two specific terms — tiny), never a
    corpus-level join. Zero corpus shuffle."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")

    def positions(term):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i + 1)
                        .otherwise(F.lit(-1))),
            lambda x: x >= 0)

    gaps = F.flatten(F.transform(
        positions(SPAN_T1),
        lambda x: F.transform(positions(SPAN_T2), lambda y: F.abs(x - y))))
    near = F.filter(gaps, lambda d: d <= SPAN_SLOP)
    out = docs.select(
        "doc_id",
        F.size(near).cast("long").alias("n_pairs"),
        F.array_min(near).cast("int").alias("min_gap"))
    return (out.where(F.col("n_pairs") > 0)
               .orderBy(F.desc("n_pairs"), "doc_id").limit(20))


# --------------------------------------------------------- combined_fields

CF_TERMS = ("vector", "query")
CF_TITLE_LEN = 8       # the "title" field = first 8 tokens
CF_TITLE_BOOST = 2.0


@register("combined_fields_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
f AS (
  SELECT doc_id,
         toks[1:{CF_TITLE_LEN}] AS title,
         toks[{CF_TITLE_LEN + 1}:] AS body,
         len(toks) AS dl
  FROM t),
s AS (
  SELECT doc_id, dl,
         {' + '.join(
             f"{CF_TITLE_BOOST!r} * len(list_filter(title, x -> x = '{w}'))"
             f" + 1.0 * len(list_filter(body, x -> x = '{w}'))"
             for w in CF_TERMS)} AS wtf
  FROM f)
SELECT doc_id, round(wtf / sqrt(dl), 6) AS score
FROM s WHERE wtf > 0
ORDER BY score DESC, doc_id LIMIT 15
""")
def combined_fields_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `combined_fields` query: one term-centric score across
    multiple weighted fields, as if they were a single combined field
    (title boosted 2x vs body; title = the first 8 tokens — the test
    corpus is single-field, the field split is the deterministic
    stand-in). Weighted tf with sqrt length normalization, all
    map-side; one TakeOrdered page."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    f = docs.select(
        "doc_id",
        F.slice(toks, 1, CF_TITLE_LEN).alias("title"),
        F.expr(f"slice({_spark_toks()}, {CF_TITLE_LEN + 1}, "
               f"greatest(size({_spark_toks()}) - {CF_TITLE_LEN}, 0))")
         .alias("body"),
        F.size(toks).alias("dl"))
    def eq(term):  # NB: a 2-arg lambda would become an (elem, idx) lambda
        return lambda x: x == F.lit(term)

    wtf = None
    for w in CF_TERMS:
        part = (F.lit(CF_TITLE_BOOST) * F.size(F.filter("title", eq(w)))
                + 1.0 * F.size(F.filter("body", eq(w))))
        wtf = part if wtf is None else wtf + part
    s = f.select("doc_id", "dl", wtf.alias("wtf"))
    return (s.where(F.col("wtf") > 0)
             .select("doc_id",
                     F.round(F.col("wtf") / F.sqrt("dl"), 6).alias("score"))
             .orderBy(F.desc("score"), "doc_id").limit(15))


def _spark_toks() -> str:
    return "filter(split(trim(text), ' '), t -> t != '')"


# --------------------------------------------------------------- knn_by_id

NEAR_OBJECT_ID = 7


@register("knn_by_id", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
           WHERE vec_id = {NEAR_OBJECT_ID})
SELECT vec_id, label,
       list_dot_product(embedding::DOUBLE[], qvec)
       / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
          * sqrt(list_dot_product(qvec, qvec))) AS score
FROM embeddings, q
WHERE vec_id <> {NEAR_OBJECT_ID}
ORDER BY score DESC, vec_id LIMIT 10
""")
def knn_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate `nearObject` / Qdrant `recommend(positive=[id])` with
    a single positive: the query vector is LOOKED UP from the
    collection by id (1-row broadcast, exactly like a literal query
    vector) and the object itself is excluded from the results —
    the defining semantic vs plain knn. Scan -> map(score) ->
    TakeOrdered, zero shuffle."""
    corpus, q = corpus_with_query(spark, sf_dir,
                                  query_vec_id=NEAR_OBJECT_ID)
    return knn(corpus.where(F.col("vec_id") != NEAR_OBJECT_ID), q,
               k=10, metric="cosine", payload=("label",),
               score=cosine_score())


# ------------------------------------------------------------ rank_feature

RANK_FEATURE_PIVOT = 200.0  # saturation pivot for n_chars
RANK_FEATURE_BOOST = 1.5


@register("rank_feature_search", oracle=f"""
WITH {_HYBRID_BM25_CTE}
SELECT b.doc_id,
       round(b.score + {RANK_FEATURE_BOOST!r}
             * (d.n_chars / (d.n_chars + {RANK_FEATURE_PIVOT!r})), 6)
         AS rf_score
FROM bm25 b JOIN documents d USING (doc_id)
ORDER BY rf_score DESC, b.doc_id LIMIT 15
""")
def rank_feature_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rank_feature` query with the `saturation` function:
    relevance plus boost * x/(x+pivot) over a stored numeric feature
    (n_chars). Same co-keyed payload join above the zero-shuffle BM25
    pass as field_value_factor (T32) — the function family
    (saturation vs log1p vs sigmoid) is the distinct surface."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    sat = (F.col("n_chars")
           / (F.col("n_chars") + F.lit(RANK_FEATURE_PIVOT)))
    return (bm25_scores(spark, sf_dir)
            .join(docs.select("doc_id", "n_chars"), "doc_id")
            .select("doc_id",
                    F.round(F.col("score") + RANK_FEATURE_BOOST * sat, 6)
                     .alias("rf_score"))
            .orderBy(F.desc("rf_score"), "doc_id").limit(15))


# -------------------------------------------------- nested payload filter

PAYLOAD_K_LO = 40
PAYLOAD_K_HI = 60


@register("nested_payload_filter", oracle=f"""
WITH p AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k,
         value
  FROM events)
SELECT event_type,
       count(*) AS n,
       CAST(min(k) AS INT) AS min_k,
       CAST(max(k) AS INT) AS max_k,
       round(CAST(sum(CAST(k AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_k,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM p WHERE k BETWEEN {PAYLOAD_K_LO} AND {PAYLOAD_K_HI}
GROUP BY 1 ORDER BY 1
""")
def nested_payload_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant nested-payload filter / ES object-field query: parse a
    JSON payload field in the scan (`get_json_object`), filter on the
    nested value, aggregate per event type. The JSON parse is
    map-side; at scale the extracted field would be materialized as a
    typed column at ingest (schema-on-write) so the predicate reaches
    the parquet scan — this op is the schema-on-read fallback the
    backends offer."""
    ev = tables.load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    p = ev.select("event_type", k.alias("k"), "value")
    return (p.where(F.col("k").between(PAYLOAD_K_LO, PAYLOAD_K_HI))
             .groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.min("k").cast("int").alias("min_k"),
                  F.max("k").cast("int").alias("max_k"),
                  F.round(F.sum(F.col("k").cast("bigint")).cast("double")
                          / F.count("*"), 6).alias("avg_k"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value"))
             .orderBy("event_type"))


# ----------------------------------------------------------- context search

_CTX_COS = ("list_dot_product(embedding::DOUBLE[], {q})"
            "/(sqrt(list_dot_product(embedding::DOUBLE[],"
            " embedding::DOUBLE[]))*sqrt(list_dot_product({q}, {q})))")
CTX_PAIRS = ((17, 225), (42, 300))  # (positive, negative) example ids
_CTX_IDS = tuple(i for p in CTX_PAIRS for i in p)


@register("context_search", oracle=f"""
WITH p1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {CTX_PAIRS[0][0]}),
n1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {CTX_PAIRS[0][1]}),
p2 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {CTX_PAIRS[1][0]}),
n2 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {CTX_PAIRS[1][1]}),
s AS (
  SELECT vec_id, label,
         (CASE WHEN {_CTX_COS.format(q="p1.v")} > {_CTX_COS.format(q="n1.v")}
               THEN 1 ELSE 0 END
        + CASE WHEN {_CTX_COS.format(q="p2.v")} > {_CTX_COS.format(q="n2.v")}
               THEN 1 ELSE 0 END) AS n_satisfied
  FROM embeddings, p1, n1, p2, n2
  WHERE vec_id NOT IN {_CTX_IDS!r})
SELECT vec_id, label, CAST(n_satisfied AS INT) AS n_satisfied
FROM s WHERE n_satisfied > 0
ORDER BY n_satisfied DESC, vec_id LIMIT 15
""")
def context_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `context` search (discovery mode WITHOUT a target):
    rank purely by how many (positive, negative) context pairs a
    point satisfies — inside more half-spaces is better; no distance
    to any target enters the score. All four example vectors ride ONE
    broadcast row (the r3 lesson: chained per-example crossJoins
    re-executed the base scan O(P^depth) times); the half-space tests
    are map-side expressions in the scan, top-k is TakeOrdered."""
    from ..functions import distance as D
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")

    def vec_of(vid, name):
        return (emb.where(F.col("vec_id") == vid)
                   .select(D.vec_double("embedding").alias(name)))

    ctx = (vec_of(CTX_PAIRS[0][0], "p1")
           .crossJoin(F.broadcast(vec_of(CTX_PAIRS[0][1], "n1")))
           .crossJoin(F.broadcast(vec_of(CTX_PAIRS[1][0], "p2")))
           .crossJoin(F.broadcast(vec_of(CTX_PAIRS[1][1], "n2"))))
    corpus = (emb.where(~F.col("vec_id").isin(*_CTX_IDS))
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec")))
    cos = D.METRICS["cosine"]
    n_sat = (F.when(cos("vec", "p1") > cos("vec", "n1"), 1).otherwise(0)
             + F.when(cos("vec", "p2") > cos("vec", "n2"), 1).otherwise(0))
    return (corpus.crossJoin(F.broadcast(ctx))
                  .select("vec_id", "label",
                          n_sat.cast("int").alias("n_satisfied"))
                  .where(F.col("n_satisfied") > 0)
                  .orderBy(F.desc("n_satisfied"), "vec_id")
                  .limit(15))


# ------------------------------------------------------ where_document knn

WHERE_DOC_SUBSTR = "fast table"


@register("knn_where_document", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
hits AS (
  SELECT doc_id FROM documents
  WHERE contains(text, '{WHERE_DOC_SUBSTR}'))
SELECT e.vec_id,
       {_CTX_COS.format(q="qvec")} AS score
FROM embeddings e JOIN hits h ON e.vec_id = h.doc_id, q
WHERE e.vec_id <> 0
ORDER BY score DESC, e.vec_id LIMIT 10
""")
def knn_where_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma `where_document={"$contains": ...}`: vector search
    restricted to records whose DOCUMENT text contains a substring —
    the text predicate and the vector score live on the same logical
    record. The test layout stores text and vectors in two parquet
    tables sharing the id space, so the predicate becomes a co-keyed
    equi-join; a production collection stores them as columns of ONE
    table (Chroma's own layout) and the predicate stays in the scan
    with zero joins. Substring match is `contains` on both engines.
    Reuses the knn()/precomputed-norm helpers (one dot per pair, not
    three) exactly as knn_by_id does."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    hits = (docs.where(F.contains(F.col("text"), F.lit(WHERE_DOC_SUBSTR)))
                .select(F.col("doc_id").alias("vec_id")))
    corpus, q = corpus_with_query(spark, sf_dir, query_vec_id=0)
    restricted = corpus.join(hits, "vec_id").where(F.col("vec_id") != 0)
    return knn(restricted, q, k=10, metric="cosine", score=cosine_score())


# -------------------------------------------------------- edge_ngram index

EDGE_NGRAM_MIN = 2
EDGE_NGRAM_MAX = 4
EDGE_NGRAM_TOP = 15


@register("edge_ngram_index", oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({_TOK}) AS term FROM documents),
g AS (
  SELECT doc_id, substr(term, 1, n) AS prefix
  FROM tok, (SELECT unnest(range({EDGE_NGRAM_MIN}, {EDGE_NGRAM_MAX + 1})) AS n)
  WHERE length(term) >= n)
SELECT prefix, count(DISTINCT doc_id) AS n_docs
FROM g GROUP BY 1
ORDER BY n_docs DESC, prefix LIMIT {EDGE_NGRAM_TOP}
""")
def edge_ngram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `edge_ngram` analyzer surface: the autocomplete index —
    every term indexed under its {EDGE_NGRAM_MIN}..{EDGE_NGRAM_MAX}
    character prefixes, ranked by document frequency. Per-doc DISTINCT
    terms first (map-side array_distinct BEFORE the explode cuts the
    exploded volume to unique terms), then the prefix fan-out is a
    bounded 3x, then one partial-agg distinct count. At scale this IS
    the index build for T11's prefix suggester — vocabulary-bounded
    output, TakeOrdered page."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.array_distinct(
        F.filter(F.split(F.trim("text"), " "), lambda t: t != ""))
    # ONE corpus pass: a union of per-length selects would re-scan and
    # re-tokenize the corpus once per branch (Spark does not dedupe
    # shared lineage across union arms). Explode terms once, then
    # fan out the 2..4-char prefixes map-side on the exploded frame;
    # the length >= MIN guard keeps sequence() ascending.
    tok = docs.select("doc_id", F.explode(toks).alias("term"))
    g = (tok.where(F.length("term") >= EDGE_NGRAM_MIN)
            .select("doc_id", F.explode(F.transform(
                F.sequence(F.lit(EDGE_NGRAM_MIN),
                           F.least(F.lit(EDGE_NGRAM_MAX),
                                   F.length("term"))),
                lambda n: F.substring(F.col("term"), F.lit(1), n)))
                .alias("prefix")))
    return (g.groupBy("prefix")
             .agg(F.countDistinct("doc_id").alias("n_docs"))
             .orderBy(F.desc("n_docs"), "prefix")
             .limit(EDGE_NGRAM_TOP))


# ------------------------------------------------------ values_count filter

VC_MIN = 30
VC_MAX = 70


@register("values_count_filter", oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, len({_TOK}) AS n_values
  FROM documents)
SELECT lang,
       count(*) AS n_docs,
       CAST(min(n_values) AS BIGINT) AS min_values,
       CAST(max(n_values) AS BIGINT) AS max_values,
       CAST(sum(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM t WHERE n_values BETWEEN {VC_MIN} AND {VC_MAX}
GROUP BY 1 ORDER BY 1
""")
def values_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `values_count` payload condition: filter records by the
    NUMBER of values in an array payload field (here: the token array
    — the corpus' only array-shaped payload), then roll up per
    language. The count is map-side array math in the scan; at scale
    the cardinality would be materialized as a typed column at ingest
    (like C14's JSON field) so the range predicate pushes into the
    parquet scan."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    t = docs.select("lang", "n_chars", F.size(toks).alias("n_values"))
    return (t.where(F.col("n_values").between(VC_MIN, VC_MAX))
             .groupBy("lang")
             .agg(F.count("*").alias("n_docs"),
                  F.min("n_values").cast("bigint").alias("min_values"),
                  F.max("n_values").cast("bigint").alias("max_values"),
                  F.sum(F.col("n_chars").cast("bigint")).cast("bigint")
                   .alias("total_chars"))
             .orderBy("lang"))


# -------------------------------------------------------- intervals query

IV_T1 = "vector"
IV_T2 = "merge"
IV_MAX_GAPS = 4


@register("intervals_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{IV_T1}') AS p1,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{IV_T2}') AS p2
  FROM t),
g AS (
  SELECT doc_id,
         flatten(list_transform(p1,
             x -> list_transform(p2, y -> y - x - 1))) AS gaps
  FROM p),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(gaps, d -> d >= 0 AND d <= {IV_MAX_GAPS}))
              AS BIGINT) AS n_matches,
         CAST(list_min(list_filter(gaps, d -> d >= 0 AND d <= {IV_MAX_GAPS}))
              AS INT) AS min_gap
  FROM g)
SELECT doc_id, n_matches, min_gap FROM m WHERE n_matches > 0
ORDER BY n_matches DESC, doc_id LIMIT 20
""")
def intervals_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `intervals` query, `ordered` + `max_gaps`: '{IV_T1}' must
    precede '{IV_T2}' with at most {IV_MAX_GAPS} tokens between them
    (the ORDERED counterpart of span_near_search's unordered window —
    gap = y - x - 1 must be in [0, max_gaps], so order is part of the
    predicate, not just proximity). Same zero-shuffle shape: per-doc
    position lists and the gap cross product are map-side array math;
    only the top-N page moves."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")

    def positions(term):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i + 1)
                        .otherwise(F.lit(-1))),
            lambda x: x >= 0)

    gaps = F.flatten(F.transform(
        positions(IV_T1),
        lambda x: F.transform(positions(IV_T2), lambda y: y - x - 1)))
    ok = F.filter(gaps, lambda d: (d >= 0) & (d <= IV_MAX_GAPS))
    out = docs.select(
        "doc_id",
        F.size(ok).cast("long").alias("n_matches"),
        F.array_min(ok).cast("int").alias("min_gap"))
    return (out.where(F.col("n_matches") > 0)
               .orderBy(F.desc("n_matches"), "doc_id").limit(20))


# ------------------------------------------------- multi_match most_fields

MM_TERMS = ("vector", "query")
MM_TITLE_LEN = 8
MM_TITLE_BOOST = 2.0


@register("multi_match_most_fields", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
f AS (
  SELECT doc_id,
         toks[1:{MM_TITLE_LEN}] AS title,
         toks[{MM_TITLE_LEN + 1}:] AS body
  FROM t),
s AS (
  SELECT doc_id,
         CASE WHEN len(title) > 0 THEN
           {MM_TITLE_BOOST!r} * ({' + '.join(
               f"len(list_filter(title, x -> x = '{w}'))"
               for w in MM_TERMS)}) / sqrt(len(title))
         ELSE 0.0 END
       + CASE WHEN len(body) > 0 THEN
           1.0 * ({' + '.join(
               f"len(list_filter(body, x -> x = '{w}'))"
               for w in MM_TERMS)}) / sqrt(len(body))
         ELSE 0.0 END AS score
  FROM f)
SELECT doc_id, round(score, 6) AS score
FROM s WHERE score > 0
ORDER BY score DESC, doc_id LIMIT 15
""")
def multi_match_most_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `multi_match` type `most_fields`: each field scores
    INDEPENDENTLY (per-field tf with that field's own length norm,
    times the field boost) and the scores ADD — vs combined_fields'
    single blended field statistics (T38) and dis_max's winner-take-
    most (T29); the three are distinct named scoring semantics in the
    ES DSL. Title = first {MM_TITLE_LEN} tokens (single-field corpus
    stand-in, same split as T38). All map-side array math, one
    TakeOrdered page."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = F.filter(F.split(F.trim("text"), " "), lambda t: t != "")
    f = docs.select(
        "doc_id",
        F.slice(toks, 1, MM_TITLE_LEN).alias("title"),
        F.expr(f"slice({_spark_toks()}, {MM_TITLE_LEN + 1}, "
               f"greatest(size({_spark_toks()}) - {MM_TITLE_LEN}, 0))")
         .alias("body"))

    def eq(term):  # 2-arg lambdas become (elem, idx) lambdas
        return lambda x: x == F.lit(term)

    def field_score(col, boost):
        tf = None
        for w in MM_TERMS:
            part = F.size(F.filter(col, eq(w)))
            tf = part if tf is None else tf + part
        return F.when(F.size(col) > 0,
                      F.lit(boost) * tf / F.sqrt(F.size(col))) \
                .otherwise(F.lit(0.0))

    score = field_score(F.col("title"), MM_TITLE_BOOST) \
        + field_score(F.col("body"), 1.0)
    s = f.select("doc_id", score.alias("score"))
    return (s.where(F.col("score") > 0)
             .select("doc_id", F.round("score", 6).alias("score"))
             .orderBy(F.desc("score"), "doc_id").limit(15))


# ----------------------------------------------- recommend (best_score)

RBS_POS = (17, 42)      # positive example ids
RBS_NEG = (225,)        # negative example ids
_RBS_IDS = RBS_POS + RBS_NEG


@register("recommend_best_score", oracle=f"""
WITH p1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_POS[0]}),
p2 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_POS[1]}),
n1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_NEG[0]}),
s AS (
  SELECT vec_id, label,
         greatest({_CTX_COS.format(q="p1.v")},
                  {_CTX_COS.format(q="p2.v")}) AS best_pos,
         {_CTX_COS.format(q="n1.v")} AS best_neg
  FROM embeddings, p1, p2, n1
  WHERE vec_id NOT IN {_RBS_IDS!r}),
sc AS (
  SELECT vec_id, label,
         CASE WHEN best_pos > best_neg THEN best_pos
              ELSE -(best_neg * best_neg) END AS score
  FROM s)
SELECT vec_id, label, round(score, 6) AS score
FROM sc ORDER BY score DESC, vec_id LIMIT 10
""")
def recommend_best_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `recommend` with `strategy=best_score` (the OTHER
    recommend strategy — `average_vector` is the r2 `recommend` op,
    and `context`/discovery is context_search): each point scores as
    its BEST positive-example similarity, unless some negative is
    closer, in which case the score collapses to -(best_neg²) —
    Qdrant's published formula, which ranks negative-dominated points
    strictly below every positive-dominated one. All example vectors
    ride ONE broadcast row; greatest()/CASE are map-side in the scan;
    TakeOrdered page. Round-6 absorbs libm ulps."""
    from ..functions import distance as D
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")

    def vec_of(vid, name):
        return (emb.where(F.col("vec_id") == vid)
                   .select(D.vec_double("embedding").alias(name)))

    ex = (vec_of(RBS_POS[0], "p1")
          .crossJoin(F.broadcast(vec_of(RBS_POS[1], "p2")))
          .crossJoin(F.broadcast(vec_of(RBS_NEG[0], "n1"))))
    corpus = (emb.where(~F.col("vec_id").isin(*_RBS_IDS))
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec")))
    cos = D.METRICS["cosine"]
    best_pos = F.greatest(cos("vec", "p1"), cos("vec", "p2"))
    best_neg = cos("vec", "n1")
    score = F.when(best_pos > best_neg, best_pos) \
             .otherwise(-(best_neg * best_neg))
    return (corpus.crossJoin(F.broadcast(ex))
                  .select("vec_id", "label",
                          F.round(score, 6).alias("score"))
                  .orderBy(F.desc("score"), "vec_id")
                  .limit(10))


@register("recommend_sum_scores", oracle=f"""
WITH p1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_POS[0]}),
p2 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_POS[1]}),
n1 AS (SELECT embedding::DOUBLE[] v FROM embeddings WHERE vec_id = {RBS_NEG[0]}),
s AS (
  SELECT vec_id, label,
         ({_CTX_COS.format(q="p1.v")} + {_CTX_COS.format(q="p2.v")})
         - {_CTX_COS.format(q="n1.v")} AS score
  FROM embeddings, p1, p2, n1
  WHERE vec_id NOT IN {_RBS_IDS!r})
SELECT vec_id, label, round(score, 6) AS score
FROM s ORDER BY score DESC, vec_id LIMIT 10
""")
def recommend_sum_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `recommend` with `strategy=sum_scores` — the THIRD
    recommend strategy (beside `average_vector` = the r2 `recommend`
    and `best_score` above), added for relevance-feedback loops
    (Rocchio-style): score = Σ sim(v, positiveᵢ) − Σ sim(v,
    negativeⱼ), every example contributing additively instead of
    best-of or mean-target. Same plan as best_score: all example
    vectors ride ONE broadcast row, the cosine sum is map-side in the
    corpus scan, TakeOrdered page. Additions run left-to-right
    identically on both engines; round-6 absorbs libm ulps."""
    from ..functions import distance as D
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")

    def vec_of(vid, name):
        return (emb.where(F.col("vec_id") == vid)
                   .select(D.vec_double("embedding").alias(name)))

    ex = (vec_of(RBS_POS[0], "p1")
          .crossJoin(F.broadcast(vec_of(RBS_POS[1], "p2")))
          .crossJoin(F.broadcast(vec_of(RBS_NEG[0], "n1"))))
    corpus = (emb.where(~F.col("vec_id").isin(*_RBS_IDS))
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec")))
    cos = D.METRICS["cosine"]
    score = (cos("vec", "p1") + cos("vec", "p2")) - cos("vec", "n1")
    return (corpus.crossJoin(F.broadcast(ex))
                  .select("vec_id", "label",
                          F.round(score, 6).alias("score"))
                  .orderBy(F.desc("score"), "vec_id")
                  .limit(10))


# ------------------------------------------------------- search_after

SA_CURSOR_DATE = "1999-06-15 00:00:00"
SA_CURSOR_KEY = 30000
SA_PAGE = 10


@register("search_after_page", oracle=f"""
SELECT o_orderkey, o_orderdate, o_orderpriority
FROM orders
WHERE o_orderdate > TIMESTAMP '{SA_CURSOR_DATE}'
   OR (o_orderdate = TIMESTAMP '{SA_CURSOR_DATE}'
       AND o_orderkey > {SA_CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {SA_PAGE}
""")
def search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `search_after` — keyset deep pagination: the client passes
    the sort-key tuple of the last hit (here (o_orderdate,
    o_orderkey) — ES requires a unique tiebreaker field exactly like
    this) and gets the next page. THE at-scale pagination surface:
    unlike from/size (which scores and discards `from` hits on every
    shard — the reason ES caps it at 10k) the cursor becomes an
    ordinary range predicate, so Catalyst pushes it into the parquet
    scan (PushedFilters on o_orderdate) and row-group stats skip
    everything before the cursor; cost per page is O(page), not
    O(offset). ORDER BY + LIMIT compiles to TakeOrdered — no global
    sort."""
    orders = tables.load_parallel(spark, sf_dir, "orders", "o_orderkey")
    cd = F.lit(SA_CURSOR_DATE).cast("timestamp")
    after = (F.col("o_orderdate") > cd) | (
        (F.col("o_orderdate") == cd)
        & (F.col("o_orderkey") > SA_CURSOR_KEY))
    return (orders.where(after)
                  .select("o_orderkey", "o_orderdate", "o_orderpriority")
                  .orderBy("o_orderdate", "o_orderkey")
                  .limit(SA_PAGE))


# ---------------------------------------------------- multi_target_knn

MT_TARGETS = (0, 1)     # the two named-vector query targets


@register("multi_target_knn", oracle=f"""
WITH qa AS (SELECT embedding::DOUBLE[] v FROM embeddings
            WHERE vec_id = {MT_TARGETS[0]}),
qb AS (SELECT embedding::DOUBLE[] v FROM embeddings
       WHERE vec_id = {MT_TARGETS[1]})
SELECT vec_id, label,
       round({_CTX_COS.format(q="qa.v")}, 6) AS score_a,
       round({_CTX_COS.format(q="qb.v")}, 6) AS score_b,
       round({_CTX_COS.format(q="qa.v")}
             + {_CTX_COS.format(q="qb.v")}, 6) AS score
FROM embeddings, qa, qb
WHERE vec_id NOT IN {MT_TARGETS!r}
ORDER BY score DESC, vec_id LIMIT 10
""")
def multi_target_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate multi-target vector search (`near_vector` with
    `targetVectors: [A, B]`, join strategy `sum` — the default; also
    Qdrant's multi-named-vector query): ONE search ranked against TWO
    target vectors at once, per-target scores joined by summing, both
    reported beside the fused score exactly as Weaviate returns
    per-target distances. Both targets ride one broadcast row, so the
    fused score is a single map-side expression over one corpus scan
    — no second pass per target, no shuffle, TakeOrdered page.
    Additions are two-term and left-to-right; round-6 absorbs libm
    ulps."""
    from ..functions import distance as D
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")

    def target(vid, name):
        return (emb.where(F.col("vec_id") == vid)
                   .select(D.vec_double("embedding").alias(name)))

    q = (target(MT_TARGETS[0], "qa")
         .crossJoin(F.broadcast(target(MT_TARGETS[1], "qb"))))
    corpus = (emb.where(~F.col("vec_id").isin(*MT_TARGETS))
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec")))
    cos = D.METRICS["cosine"]
    sa, sb = cos("vec", "qa"), cos("vec", "qb")
    return (corpus.crossJoin(F.broadcast(q))
                  .select("vec_id", "label",
                          F.round(sa, 6).alias("score_a"),
                          F.round(sb, 6).alias("score_b"),
                          F.round(sa + sb, 6).alias("score"))
                  .orderBy(F.desc("score"), "vec_id")
                  .limit(10))


# ----------------------------------------------- recommend lookup_from

LOOKUP_LABEL_MIN = 5    # collection B = the label>=5 slice


@register("recommend_lookup_from", oracle=f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
           WHERE label >= {LOOKUP_LABEL_MIN}),
i1 AS (SELECT min(vec_id) AS id FROM b),
i2 AS (SELECT min(vec_id) AS id FROM b, i1 WHERE vec_id > i1.id),
va AS (SELECT v FROM b, i1 WHERE vec_id = i1.id),
vb AS (SELECT v FROM b, i2 WHERE vec_id = i2.id),
q AS (SELECT list_transform(range(1, len(va.v) + 1),
                            i -> (va.v[i] + vb.v[i]) / 2) AS qvec
      FROM va, vb)
SELECT vec_id, label,
       round(list_dot_product(embedding::DOUBLE[], qvec)
             / (sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]))
                * sqrt(list_dot_product(qvec, qvec))), 6) AS score
FROM embeddings, q
WHERE label < {LOOKUP_LABEL_MIN}
ORDER BY score DESC, vec_id LIMIT 10
""")
def recommend_lookup_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant `recommend` with `lookup_from`: the positive example
    IDS resolve in ANOTHER collection — here collection B is the
    label≥{LOOKUP_LABEL_MIN} slice (its two smallest point ids are
    the positives; deterministic at every sf) and the searched
    collection A is the disjoint label<{LOOKUP_LABEL_MIN} slice, so
    the query vector provably comes from outside the searched set.
    Strategy `average_vector` (Qdrant's default): mean of the
    looked-up positives, then one cosine knn over A.

    Scale shape: the lookup side reduces to two 1-row frames (min-id
    scalar aggregates — broadcast, never a corpus join), the mean is
    a map-side zip_with on one broadcast row, and A pays one scan →
    score → TakeOrdered pass, the same plan as plain knn."""
    from ..functions import distance as D
    emb = tables.load_parallel(spark, sf_dir, "embeddings", "vec_id")
    b = emb.where(F.col("label") >= LOOKUP_LABEL_MIN) \
           .select("vec_id", D.vec_double("embedding").alias("v"))
    i1 = b.agg(F.min("vec_id").alias("id1"))
    # second-smallest id: min over the remainder, joined without a
    # correlated subquery (both sides are 1-row broadcasts)
    i2 = (b.crossJoin(F.broadcast(i1))
           .where(F.col("vec_id") > F.col("id1"))
           .agg(F.min("vec_id").alias("id2")))
    va = (b.join(F.broadcast(i1), b.vec_id == i1.id1)
           .select(F.col("v").alias("va")))
    vb = (b.join(F.broadcast(i2), b.vec_id == i2.id2)
           .select(F.col("v").alias("vb")))
    q = (va.crossJoin(F.broadcast(vb))
           .select(F.zip_with("va", "vb",
                              lambda x, y: (x + y) / 2).alias("qvec"))
           .withColumn("nq", D.norm("qvec")))
    corpus = (emb.where(F.col("label") < LOOKUP_LABEL_MIN)
                 .select("vec_id", "label",
                         D.vec_double("embedding").alias("vec"))
                 .withColumn("nvec", D.norm("vec")))
    score = D.safe_div(D.dot("vec", "qvec"), F.col("nvec") * F.col("nq"))
    return (corpus.crossJoin(F.broadcast(q))
                  .select("vec_id", "label",
                          F.round(score, 6).alias("score"))
                  .orderBy(F.desc("score"), "vec_id")
                  .limit(10))
