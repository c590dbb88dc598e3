"""Search-surface extensions, r7 wave 3: highlighting, the term
suggester, knn similarity cutoff, sliced scroll, the full
query_string language, and the term-vectors API.

Reference parity (the elastic backend's query surface plus the knn
cutoff params every vector backend exposes): ES `highlight` (matched
fragments with <em> tags), ES term suggester (per-token edit-distance
corrections from the corpus vocabulary), ES knn `similarity` /
Weaviate `certainty`/`distance` / Qdrant `score_threshold` (drop
hits below a similarity floor AFTER top-k), ES sliced scroll (the
parallel-export partitioning of a scroll), ES `query_string` (the
full Lucene mini-language with field scoping), and ES `_termvectors`
(per-term tf + positions for one document).

Scale shapes: highlighting and query_string are map-side array math
over the scan (zero corpus shuffle, TakeOrdered pages). The term
suggester builds the token vocabulary with ONE explode+groupBy pass
— the only shuffle — then broadcasts the (tiny) query-term list and
prunes candidates by first-char + length-band BEFORE levenshtein, so
the edit-distance compare touches a sliver of the vocabulary.
Sliced scroll's md5 slice key is uniform by construction and
computed map-side (each export worker reads only its residue class —
the point of the API). Term vectors prune to ONE document before any
work. The knn cutoff filters an already-k-bounded TakeOrdered page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..functions.hashing import md5_int32
from ..functions.text import tokens
from ..registry import register

_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

# ------------------------------------------------------------ highlight

HL_TERM = "table"
HL_WINDOW = 3          # tokens of context each side of the match
HL_K = 15


@register("highlight_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
m AS (
  SELECT doc_id, toks,
         list_position(toks, '{HL_TERM}') AS p,
         len(list_filter(toks, x -> x = '{HL_TERM}')) AS tf
  FROM t),
h AS (
  SELECT doc_id, CAST(tf AS BIGINT) AS score,
         array_to_string(
           list_transform(
             toks[greatest(p - {HL_WINDOW}, 1):least(p + {HL_WINDOW},
                                                     len(toks))],
             (x, i) -> CASE
                 WHEN greatest(p - {HL_WINDOW}, 1) + i - 1 = p
                 THEN '<em>' || x || '</em>' ELSE x END),
           ' ') AS fragment
  FROM m WHERE p > 0)
SELECT doc_id, score, fragment
FROM h ORDER BY score DESC, doc_id LIMIT {HL_K}
""")
def highlight_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `highlight`: hits for a term query come back with a matched
    FRAGMENT — the first occurrence wrapped in `<em>` tags inside a
    ±{HL_WINDOW}-token context window (ES's unified highlighter with
    one fragment, the default response shape). Position find, window
    slice and tag wrap are all per-row array expressions fused into
    the scan — highlighting adds zero shuffle to the underlying term
    query, exactly the property ES's stored-field highlighters pay
    I/O for. Scored by tf, TakeOrdered page."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")
    p = F.array_position(toks, HL_TERM)
    tf = F.size(F.filter(toks, lambda x: x == F.lit(HL_TERM)))
    lo = F.greatest(p - HL_WINDOW, F.lit(1).cast("long"))
    hi = F.least(p + HL_WINDOW, F.size(toks).cast("long"))
    frag = F.slice(toks, lo.cast("int"), (hi - lo + 1).cast("int"))
    # transform's index is 0-based: token index in the doc = lo + i
    tagged = F.transform(
        frag, lambda x, i: F.when(lo + i == p,
                                  F.concat(F.lit("<em>"), x,
                                           F.lit("</em>"))).otherwise(x))
    out = (docs.select("doc_id", p.alias("p"), tf.alias("tf"),
                       F.array_join(tagged, " ").alias("fragment"))
               .where(F.col("p") > 0))
    return (out.select("doc_id", F.col("tf").cast("long").alias("score"),
                       "fragment")
               .orderBy(F.desc("score"), "doc_id").limit(HL_K))


# --------------------------------------------------------- term suggester

SUGGEST_TERMS = ("merg", "scann", "jion")   # misspelled query tokens
SUGGEST_MAX_EDITS = 2
SUGGEST_PER_TERM = 5


@register("suggest_term", oracle=f"""
WITH tok AS (
  SELECT unnest({_TOK}) AS term FROM documents),
vocab AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
q AS (SELECT unnest({list(SUGGEST_TERMS)!r}) AS qterm),
cand AS (
  SELECT q.qterm, v.term AS suggestion, v.freq,
         levenshtein(q.qterm, v.term) AS dist
  FROM q JOIN vocab v
    ON substr(v.term, 1, 1) = substr(q.qterm, 1, 1)
   AND abs(len(v.term) - len(q.qterm)) <= {SUGGEST_MAX_EDITS}
  WHERE levenshtein(q.qterm, v.term) <= {SUGGEST_MAX_EDITS}
    AND v.term <> q.qterm),
r AS (
  SELECT qterm, suggestion, CAST(dist AS INT) AS dist,
         CAST(freq AS BIGINT) AS freq,
         row_number() OVER (PARTITION BY qterm
                            ORDER BY dist, freq DESC, suggestion)
           AS rank
  FROM cand)
SELECT qterm, suggestion, dist, freq, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {SUGGEST_PER_TERM}
ORDER BY qterm, rank
""")
def suggest_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term suggester (`suggest.term`): per misspelled query
    token, corpus-vocabulary corrections within
    {SUGGEST_MAX_EDITS} edits, ranked ES-style (edit distance, then
    document frequency) with the default prefix_length=1 pruning
    (candidates must share the first character — ES's rationale:
    typos rarely hit the first letter, and the prefix turns a full
    vocabulary compare into a keyed lookup).

    Scale shape: the vocabulary is ONE explode+groupBy pass (the only
    corpus shuffle, map-side combined); the query terms are a
    broadcast literal array, so candidate pruning (first char +
    length band) happens map-side over vocabulary rows BEFORE the
    levenshtein — at web-corpus vocabulary sizes the expensive edit
    distance runs on a per-first-letter sliver. Final rank is a
    window over ≤|q|·candidates rows."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    vocab = (docs.select(F.explode(tokens("text")).alias("term"))
                 .groupBy("term").agg(F.count("*").alias("freq")))
    q = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in SUGGEST_TERMS]))
         .alias("qterm"))
    cand = (vocab.join(F.broadcast(q),
                       (F.substring("term", 1, 1)
                        == F.substring("qterm", 1, 1))
                       & (F.abs(F.length("term") - F.length("qterm"))
                          <= SUGGEST_MAX_EDITS))
                 .where((F.levenshtein("qterm", "term")
                         <= SUGGEST_MAX_EDITS)
                        & (F.col("term") != F.col("qterm")))
                 .select("qterm", F.col("term").alias("suggestion"),
                         F.levenshtein("qterm", "term").cast("int")
                          .alias("dist"),
                         F.col("freq").cast("long").alias("freq")))
    w = W.partitionBy("qterm").orderBy("dist", F.desc("freq"),
                                       "suggestion")
    return (cand.withColumn("rank", F.row_number().over(w).cast("int"))
                .where(F.col("rank") <= SUGGEST_PER_TERM)
                .orderBy("qterm", "rank"))


# --------------------------------------------------- knn similarity cutoff

KNN_CUT_K = 20
KNN_CUT_SIM = 0.25


@register("knn_similarity_cutoff", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
           WHERE vec_id = 0),
topk AS (
  SELECT vec_id, label,
         round(list_dot_product(embedding::DOUBLE[], qvec)
               / (sqrt(list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qvec, qvec))), 6) AS score
  FROM embeddings, q
  ORDER BY score DESC, vec_id LIMIT {KNN_CUT_K})
SELECT vec_id, label, score FROM topk
WHERE score >= {KNN_CUT_SIM!r}
ORDER BY score DESC, vec_id
""")
def knn_similarity_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The similarity floor every backend's knn exposes — ES knn
    `similarity`, Weaviate `certainty`/`distance`, Qdrant
    `score_threshold`, Milvus `radius`: retrieve top-k, then DROP
    hits below the floor (k bounds the page, the floor bounds the
    quality; a sparse region legitimately returns fewer than k).
    Applied to the ROUNDED score on both engines so the cutoff
    boundary cannot ulp-flip. Plan: the same zero-shuffle
    scan→score→TakeOrdered as plain knn plus a trivial post-filter
    on k rows."""
    from .knn import corpus_with_query, cosine_score, knn
    corpus, q = corpus_with_query(spark, sf_dir)
    topk = knn(corpus, q, k=KNN_CUT_K, payload=("label",),
               score=F.round(cosine_score(), 6))
    return (topk.where(F.col("score") >= KNN_CUT_SIM)
                .orderBy(F.desc("score"), "vec_id"))


# ------------------------------------------------------------ sliced scroll

SCROLL_SLICES = 4


@register("sliced_scroll", oracle=f"""
WITH s AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
           % {SCROLL_SLICES} AS slice_id,
         doc_id
  FROM documents)
SELECT CAST(slice_id AS INT) AS slice_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM s GROUP BY 1 ORDER BY 1
""")
def sliced_scroll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sliced scroll (`slice: {{id, max}}`): the parallel-export
    form of a scroll — {SCROLL_SLICES} workers each scroll a disjoint
    hash-residue class of the corpus concurrently. The md5 slice key
    is computed map-side and is uniform by construction, so export
    workers get balanced shards with no coordination (the reason ES
    added the API). Output is the per-slice census — counts plus id
    bounds — whose disjointness/completeness the tests pin; each
    worker's actual page stream is C8's scroll_by_cursor scoped to
    its slice predicate."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    sl = (md5_int32(F.col("doc_id").cast("string"))
          % SCROLL_SLICES).cast("int")
    return (docs.select(sl.alias("slice_id"), "doc_id")
                .groupBy("slice_id")
                .agg(F.count("*").cast("long").alias("n_docs"),
                     F.min("doc_id").alias("first_doc"),
                     F.max("doc_id").alias("last_doc"))
                .orderBy("slice_id"))


# ----------------------------------------------------------- query_string

QS_LANG = "en"
QS_OR = ("scan", "merge")
QS_NOT = "slow"


@register("query_string_search", oracle=f"""
WITH t AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> x = '{QS_OR[0]}')) AS f_a,
         len(list_filter(toks, x -> x = '{QS_OR[1]}')) AS f_b,
         len(list_filter(toks, x -> x = '{QS_NOT}')) AS f_n
  FROM t)
SELECT doc_id, CAST(f_a + f_b AS BIGINT) AS score
FROM s
WHERE lang = '{QS_LANG}' AND (f_a > 0 OR f_b > 0) AND f_n = 0
ORDER BY score DESC, doc_id LIMIT 20
""")
def query_string_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `query_string` (the full Lucene mini-language, distinct
    from T60's forgiving simple_query_string): field scoping plus
    boolean operators — here
    `lang:{QS_LANG} AND ({QS_OR[0]} OR {QS_OR[1]}) NOT {QS_NOT}`.
    The field-scoped clause (`lang:`) targets a STRUCTURED column, so
    it compiles to an ordinary pushable predicate (PushedFilters on
    lang — the part simple_query_string's default-field search cannot
    express); the text clauses stay one map-side tf pass. Integer tf
    score, TakeOrdered page, zero corpus shuffle."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")

    def tf(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    f = docs.where(F.col("lang") == QS_LANG).select(
        "doc_id", tf(QS_OR[0]).alias("f_a"), tf(QS_OR[1]).alias("f_b"),
        tf(QS_NOT).alias("f_n"))
    return (f.where(((F.col("f_a") > 0) | (F.col("f_b") > 0))
                    & (F.col("f_n") == 0))
             .select("doc_id",
                     (F.col("f_a") + F.col("f_b")).cast("long")
                     .alias("score"))
             .orderBy(F.desc("score"), "doc_id").limit(20))


# ------------------------------------------------------------ term vectors

TV_DOC_ID = 7
TV_K = 15


@register("term_vectors", oracle=f"""
WITH tok AS (
  SELECT unnest({_TOK}) AS term,
         generate_subscripts({_TOK}, 1) AS pos
  FROM documents WHERE doc_id = {TV_DOC_ID})
SELECT term, CAST(count(*) AS BIGINT) AS term_freq,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM tok GROUP BY term
ORDER BY term_freq DESC, term LIMIT {TV_K}
""")
def term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_termvectors`: per-term statistics for ONE document —
    term frequency and (first) position, the payload analyzers and
    MLT debugging read. The doc_id predicate prunes to a single row
    BEFORE tokenization (at scale: one row-group via min/max stats),
    so the explode+groupBy runs on one document's tokens — constant
    work at any corpus size."""
    docs = tables.load(spark, sf_dir, "documents")
    one = docs.where(F.col("doc_id") == TV_DOC_ID)
    tok = one.select(F.posexplode(tokens("text")).alias("pos", "term"))
    return (tok.groupBy("term")
               .agg(F.count("*").cast("long").alias("term_freq"),
                    (F.min("pos") + 1).cast("long").alias("first_pos"))
               .orderBy(F.desc("term_freq"), "term").limit(TV_K))
