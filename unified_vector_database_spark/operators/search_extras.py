"""Search-surface extensions: relative-score fusion, two-phase
rescoring, field collapsing, and the rare-terms / adjacency-matrix
aggregations.

Reference parity: Weaviate hybrid `fusionType: relativeScoreFusion`
(min-max per-modality normalization — the OTHER fusion next to
rankedFusion/RRF), Elasticsearch `rescore` (re-rank only the top
window of a cheap first phase with an expensive second query),
Elasticsearch `collapse` (one hit per field value + inner-hit count),
and the ES `rare_terms` / `adjacency_matrix` aggregations. All reuse
hybrid.py's BM25/vector CTE twins so the oracle stays term-for-term
identical to the Spark expression tree.

Scale shapes:
- relative fusion: both modalities cut to HYBRID_CANDIDATES by
  TakeOrdered first; min/max are 1-row broadcast aggregates of those
  bounded sets (Weaviate's normalization window IS the retrieved
  result window, so candidate-set min/max is the semantics, not an
  approximation).
- rescore: phase 1 is the zero-shuffle BM25 scan; only the ≤window
  rows join the vector-score scan (broadcast of the window side), so
  the expensive scorer touches `window` rows at any corpus size —
  exactly the cost contract ES rescore exists to provide.
- collapse: one co-keyed join scores⋈docs on doc_id, one bounded
  window per collapse-field value (groups ≤ distinct field values).
- rare_terms / adjacency_matrix: map-side flags + one partial agg;
  the rare-terms tail is cut by TakeOrdered, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register
from .hybrid import (_BM25_CTE, _CAND_CTE, _TOK, _VEC_CTE, _candidates,
                     _vec_scores, bm25_scores)

RESCORE_WINDOW = 50
RESCORE_QW = 1.0     # query_weight
RESCORE_RW = 2.0     # rescore_query_weight
COLLAPSE_LIMIT = 5
RARE_MAX_DOCS = 2
ADJ_FILTERS = (("merge", "merge"), ("vector", "vector"), ("fast", "fast"))


@register("hybrid_relative_score", oracle=f"""
WITH {_BM25_CTE},
{_VEC_CTE},
{_CAND_CTE},
kx AS (SELECT max(score) AS mx, min(score) AS mn FROM kcand),
vx AS (SELECT max(vscore) AS mx, min(vscore) AS mn FROM vcand),
fused AS (
  SELECT coalesce(kcand.doc_id, vcand.doc_id) AS doc_id,
         round(0.5 * coalesce(
                 CASE WHEN kx.mx = kx.mn THEN 1.0e0
                      ELSE (kcand.score - kx.mn) / (kx.mx - kx.mn) END, 0)
             + 0.5 * coalesce(
                 CASE WHEN vx.mx = vx.mn THEN 1.0e0
                      ELSE (vcand.vscore - vx.mn) / (vx.mx - vx.mn) END, 0),
               6) AS fused_score
  FROM kcand FULL OUTER JOIN vcand ON kcand.doc_id = vcand.doc_id, kx, vx)
SELECT doc_id, fused_score FROM fused
ORDER BY fused_score DESC, doc_id LIMIT 15
""")
def hybrid_relative_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate relativeScoreFusion: min-max normalize each modality
    over its candidate window, then average. Differs from
    hybrid_weighted (max-norm) exactly as Weaviate's two fusionTypes
    differ; a degenerate window (max==min) normalizes to 1."""
    kw = _candidates(bm25_scores(spark, sf_dir), "score")
    vec = _candidates(_vec_scores(spark, sf_dir), "vscore")
    kx = kw.agg(F.max("score").alias("kmx"), F.min("score").alias("kmn"))
    vx = vec.agg(F.max("vscore").alias("vmx"), F.min("vscore").alias("vmn"))

    def norm(s, mx, mn):
        return F.when(F.col(mx) == F.col(mn), F.lit(1.0)) \
                .otherwise((s - F.col(mn)) / (F.col(mx) - F.col(mn)))

    return (kw.join(vec, "doc_id", "full_outer")
              .crossJoin(F.broadcast(kx)).crossJoin(F.broadcast(vx))
              .select("doc_id",
                      F.round(0.5 * F.coalesce(norm(F.col("score"), "kmx", "kmn"), F.lit(0.0))
                              + 0.5 * F.coalesce(norm(F.col("vscore"), "vmx", "vmn"), F.lit(0.0)),
                              6).alias("fused_score"))
              .orderBy(F.desc("fused_score"), "doc_id").limit(15))


@register("rescore_topn", oracle=f"""
WITH {_BM25_CTE},
{_VEC_CTE},
win AS (SELECT doc_id, score FROM bm25
        ORDER BY score DESC, doc_id LIMIT {RESCORE_WINDOW})
SELECT win.doc_id,
       round({RESCORE_QW!r}e0 * win.score
             + {RESCORE_RW!r}e0 * vec.vscore, 6) AS final_score
FROM win JOIN vec USING (doc_id)
ORDER BY final_score DESC, doc_id LIMIT 10
""")
def rescore_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rescore`: cheap BM25 picks a top-`window_size` shortlist,
    the expensive scorer (here: exact cosine) runs on the shortlist
    only, and final = qw·orig + rw·rescore. The window side is
    broadcast into the vector-score scan, so phase 2 costs one corpus
    scan + a 50-row hash probe regardless of corpus size."""
    win = (bm25_scores(spark, sf_dir)
           .orderBy(F.desc("score"), "doc_id").limit(RESCORE_WINDOW))
    vec = _vec_scores(spark, sf_dir)
    return (vec.join(F.broadcast(win), "doc_id")
               .select("doc_id",
                       F.round(F.lit(RESCORE_QW) * F.col("score")
                               + F.lit(RESCORE_RW) * F.col("vscore"),
                               6).alias("final_score"))
               .orderBy(F.desc("final_score"), "doc_id").limit(10))


@register("collapse_search", oracle=f"""
WITH {_BM25_CTE},
j AS (SELECT d.lang, b.doc_id, b.score
      FROM bm25 b JOIN documents d USING (doc_id)),
r AS (SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM j)
SELECT lang, doc_id, score, CAST(n AS BIGINT) AS n_collapsed
FROM r WHERE rn = 1
ORDER BY score DESC, lang LIMIT {COLLAPSE_LIMIT}
""")
def collapse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field collapsing: the best BM25 hit per `lang` value plus
    the number of hits it collapsed away. One co-keyed doc_id join,
    one window bounded by matching docs per field value."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    j = (bm25_scores(spark, sf_dir)
         .join(docs.select("doc_id", "lang"), "doc_id"))
    w = W.partitionBy("lang")
    return (j.withColumn("rn", F.row_number().over(
                w.orderBy(F.desc("score"), "doc_id")))
             .withColumn("n_collapsed", F.count("*").over(w).cast("long"))
             .where(F.col("rn") == 1)
             .select("lang", "doc_id", "score", "n_collapsed")
             .orderBy(F.desc("score"), "lang").limit(COLLAPSE_LIMIT))


@register("rare_terms", oracle=f"""
WITH g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             range(1, greatest(len({_TOK}) - 1, 1)),
             i -> {_TOK}[i] || ' ' || {_TOK}[i + 1] || ' '
                  || {_TOK}[i + 2]))) AS term
  FROM documents),
cnt AS (SELECT term, count(*) AS doc_count FROM g GROUP BY 1)
SELECT term, CAST(doc_count AS BIGINT) AS doc_count
FROM cnt
WHERE doc_count <= {RARE_MAX_DOCS}
ORDER BY doc_count, term LIMIT 40
""")
def rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `rare_terms` aggregation over a shingle field: the
    long-tail word trigrams appearing in at most `max_doc_count`
    documents — the opposite cut of `terms` (single words carry no
    rare tail in a bounded vocabulary; shingles do, which is why ES
    users point rare_terms at shingle/keyword fields). Per-doc gram
    sets are distinct map-side (no corpus-wide distinct shuffle —
    ngram_array de-dups within the row before the explode), then one
    partial-agg'd count; the tail is cut by TakeOrdered (doc_count
    asc, term), never a full sort."""
    from ..functions.text import ngram_array
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    g = docs.select("doc_id",
                    F.explode(ngram_array("text", 3)).alias("term"))
    return (g.groupBy("term")
             .agg(F.count("*").cast("long").alias("doc_count"))
             .where(F.col("doc_count") <= RARE_MAX_DOCS)
             .orderBy("doc_count", "term").limit(40))


def _adj_pairs():
    """The single source of the bucket enumeration — the oracle SQL,
    the Spark aggregates, and the stack() unpivot all consume this, so
    the three cannot drift: [(bucket_name, filter_keys_tuple)]."""
    keys = [k for k, _ in ADJ_FILTERS]
    singles = [(k, (k,)) for k in keys]
    pairs = [(f"{a}&{b}", (a, b))
             for i, a in enumerate(keys) for b in keys[i + 1:]]
    return singles + pairs


def _adj_col(ks) -> str:
    return "c_" + "_".join(ks)


@register("adjacency_matrix", oracle=f"""
WITH flags AS (
  SELECT {', '.join(f"CASE WHEN list_contains({_TOK}, '{t}') THEN 1 ELSE 0 END AS f_{k}"
                    for k, t in ADJ_FILTERS)}
  FROM documents),
c AS (SELECT {', '.join(f"CAST(sum({' * '.join('f_' + k for k in ks)}) AS BIGINT) AS {_adj_col(ks)}" for _, ks in _adj_pairs())}
      FROM flags)
{' UNION ALL '.join(f"SELECT '{name}' AS bucket, {_adj_col(ks)} AS doc_count FROM c"
                    for name, ks in _adj_pairs())}
ORDER BY bucket
""")
def adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `adjacency_matrix` aggregation: named term filters and the
    document counts of each filter and each pairwise intersection.
    Pure map-side flag columns + ONE partial aggregate; the 6-row
    unpivot happens on the aggregate, so nothing about the shape
    depends on corpus size."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")
    flags = docs.select(*[
        F.when(F.array_contains(toks, t), 1).otherwise(0).alias(f"f_{k}")
        for k, t in ADJ_FILTERS])
    from functools import reduce
    from operator import mul
    aggs = [F.sum(reduce(mul, [F.col(f"f_{k}") for k in ks])).cast("long")
            .alias(_adj_col(ks)) for _, ks in _adj_pairs()]
    c = flags.agg(*aggs)
    stack = ", ".join(f"'{name}', {_adj_col(ks)}"
                      for name, ks in _adj_pairs())
    return (c.selectExpr(
                f"stack({len(_adj_pairs())}, {stack}) AS (bucket, doc_count)")
             .orderBy("bucket"))


# ------------------------------------------------ span / pattern queries

SPAN_FIRST_TERM = "vector"
SPAN_FIRST_END = 10
WILDCARD = "fa%t"         # LIKE pattern: identical semantics both engines


@register("span_first_search", oracle=f"""
SELECT doc_id, CAST(list_position({_TOK}, '{SPAN_FIRST_TERM}') AS BIGINT) AS pos
FROM documents
WHERE list_position({_TOK}, '{SPAN_FIRST_TERM}') BETWEEN 1 AND {SPAN_FIRST_END}
ORDER BY pos, doc_id LIMIT 20
""")
def span_first_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_first`: the term must occur within the first `end`
    token positions. array_position is map-side in the scan; the page
    is TakeOrdered — the whole query is one scan, zero shuffle."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    pos = F.array_position(tokens("text"), SPAN_FIRST_TERM)
    return (docs.select("doc_id", pos.alias("pos"))
                .where((F.col("pos") >= 1) & (F.col("pos") <= SPAN_FIRST_END))
                .orderBy("pos", "doc_id").limit(20))


@register("wildcard_search", oracle=f"""
SELECT doc_id,
       CAST(len(list_filter({_TOK}, t -> t LIKE '{WILDCARD}')) AS BIGINT)
         AS n_wild
FROM documents
WHERE len(list_filter({_TOK}, t -> t LIKE '{WILDCARD}')) > 0
ORDER BY n_wild DESC, doc_id LIMIT 20
""")
def wildcard_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `wildcard` query: per-token LIKE pattern match, ranked by
    match count. LIKE semantics (%/_) are identical in Spark and
    DuckDB, so the pattern needs no dialect translation (unlike
    regexp, where Java vs RE2 dialects diverge — the reason this
    operator pins LIKE as the portable contract). Map-side array
    filter in the scan + TakeOrdered page."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    n = F.size(F.filter(tokens("text"), lambda t: t.like(WILDCARD)))
    return (docs.select("doc_id", n.cast("long").alias("n_wild"))
                .where(F.col("n_wild") > 0)
                .orderBy(F.desc("n_wild"), "doc_id").limit(20))


# --------------------------------------------------- scoring explanation

from ..constants import BM25_B, BM25_K1  # noqa: E402


@register("score_explain", oracle=f"""
WITH {_BM25_CTE},
top1 AS (SELECT doc_id FROM bm25 ORDER BY score DESC, doc_id LIMIT 1),
qterms(term) AS (VALUES {', '.join(f"('{t}')" for t in ('merge', 'vector', 'fast'))}),
base AS (SELECT top1.doc_id, qterms.term, stats.n, stats.avgdl
         FROM top1, qterms, stats),
x AS (
  SELECT base.doc_id, base.term,
         coalesce(tf.tf, 0) AS tf, df.df, dl.dl, base.n, base.avgdl
  FROM base
  LEFT JOIN tf ON tf.doc_id = base.doc_id AND tf.term = base.term
  JOIN df ON df.term = base.term
  JOIN dl ON dl.doc_id = base.doc_id)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(ln(1 + (n - df + 0.5) / (df + 0.5)), 6) AS idf,
       round(CASE WHEN tf = 0 THEN 0.0e0
                  ELSE ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * ({BM25_K1} + 1.0)
                       / (tf + {BM25_K1} * (1.0 - {BM25_B}
                                            + {BM25_B} * dl / avgdl)) END,
             6) AS contribution
FROM x ORDER BY term
""")
def score_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `explain=true`: the per-term BM25 breakdown (tf, df, idf,
    contribution) for the top-ranked hit. The top-1 row broadcasts
    back into the per-doc stats scan; the 3-row unpivot happens on
    the single joined row, so explain costs one extra bounded join
    over the ordinary search."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    from ..functions.text import tokens

    def eq(term):
        return lambda t: t == F.lit(term)

    terms = ('merge', 'vector', 'fast')
    per = docs.select(
        "doc_id", F.size(tokens("text")).alias("dl"),
        *[F.size(F.filter(tokens("text"), eq(t))).alias(f"tf_{i}")
          for i, t in enumerate(terms)])
    stats = per.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        *[F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
          for i in range(len(terms))])
    top1 = (bm25_scores(spark, sf_dir)
            .orderBy(F.desc("score"), "doc_id").limit(1).select("doc_id"))
    row = (per.join(F.broadcast(top1), "doc_id")
              .crossJoin(F.broadcast(stats)))
    # one explode of a per-term struct array — NOT a 3-way union,
    # which would re-execute the corpus scans behind `row` once per
    # branch (64x-measured: 17.8 s as a union, ~6 s as one pass)
    structs = []
    for i, t in enumerate(terms):
        tf = F.col(f"tf_{i}").cast("double")
        dfc = F.col(f"df_{i}").cast("double")
        idf = F.log(1 + (F.col("n") - dfc + 0.5) / (dfc + 0.5))
        w = (idf * tf * (BM25_K1 + 1.0)
             / (tf + BM25_K1 * (1.0 - BM25_B
                                + BM25_B * F.col("dl") / F.col("avgdl"))))
        contrib = F.when(tf > 0, w).otherwise(F.lit(0.0))
        structs.append(F.struct(
            F.lit(t).alias("term"),
            F.col(f"tf_{i}").cast("long").alias("tf"),
            F.col(f"df_{i}").cast("long").alias("df"),
            F.round(idf, 6).alias("idf"),
            F.round(contrib, 6).alias("contribution")))
    return (row.select("doc_id", F.explode(F.array(*structs)).alias("e"))
               .select("doc_id", "e.term", "e.tf", "e.df", "e.idf",
                       "e.contribution")
               .orderBy("term"))


# ------------------------------------------------------- Weaviate autocut

AUTOCUT_N = 20
AUTOCUT_FACTOR = 2.0


@register("autocut_search", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
s AS (SELECT vec_id, {{cos}} AS score FROM embeddings, q
      WHERE vec_id <> 0
      ORDER BY score DESC, vec_id LIMIT {AUTOCUT_N}),
r AS (SELECT vec_id, score,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rank,
             score - lead(score) OVER (ORDER BY score DESC, vec_id) AS gap
      FROM s),
thr AS (SELECT CASE WHEN count(*) >= 2
                    THEN {AUTOCUT_FACTOR!r}e0 * (max(score) - min(score))
                         / (count(*) - 1) END AS t,
               count(*) AS m FROM s),
cut AS (SELECT coalesce(min(rank) FILTER (rank < thr.m AND gap > thr.t),
                        max(thr.m)) AS c
        FROM r, thr)
SELECT vec_id, score, CAST(rank AS INT) AS rank
FROM r, cut WHERE rank <= cut.c
ORDER BY rank
""".replace("{cos}",
            "list_dot_product(embedding::DOUBLE[], qvec)"
            "/(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            "*sqrt(list_dot_product(qvec, qvec)))"))
def autocut_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate `autocut`: retrieve top-N, then cut the list at the
    first score gap larger than FACTOR× the average step over the
    window — returning only the first 'natural' result group. The
    whole decision runs on the bounded top-N array (one TakeOrdered +
    array math on a single collected row — no window operator, same
    shape as hybrid.bounded_ranks), so autocut adds zero corpus-scale
    work over the plain knn."""
    from .knn import corpus_with_query, cosine_score
    corpus, q = corpus_with_query(spark, sf_dir)
    top = (corpus.where(F.col("vec_id") != 0)   # exclude-self, as served
           .crossJoin(F.broadcast(q))
           .select("vec_id", cosine_score().alias("score"))
           .orderBy(F.desc("score"), "vec_id").limit(AUTOCUT_N))
    return autocut_cut(top)


def autocut_cut(top: DataFrame) -> DataFrame:
    """The autocut decision over any bounded (vec_id, score) result
    window — split out so the short-window degenerate paths (< 2
    rows, fewer rows than AUTOCUT_N) are directly testable
    (tests/test_edge_cases.py)."""
    arr = top.agg(F.array_sort(F.collect_list(F.struct(
        (-F.col("score")).alias("ns"), F.col("vec_id").alias("vec_id"))))
        .alias("a"))
    scores = F.transform(F.col("a"), lambda x: -x.getField("ns"))
    # short-window safety (ANSI mode): m = actual rows retrieved; all
    # lookups via try_element_at so a corpus smaller than the window
    # degrades to "keep everything" instead of INVALID_ARRAY_INDEX
    m = F.least(F.lit(AUTOCUT_N), F.size(F.col("a")))
    thr = F.when(m >= 2,
                 F.lit(AUTOCUT_FACTOR)
                 * (F.try_element_at(scores, F.lit(1))
                    - F.try_element_at(scores, m))
                 / (m - F.lit(1)))
    gaps = F.zip_with(F.slice(scores, 1, AUTOCUT_N - 1),
                      F.slice(scores, 2, AUTOCUT_N - 1),
                      lambda a, b: a - b)
    cut = F.aggregate(
        F.sequence(F.lit(1), F.lit(AUTOCUT_N - 1)),
        F.lit(AUTOCUT_N),
        lambda acc, i: F.least(
            acc, F.when(F.try_element_at(gaps, i) > thr, i)
                  .otherwise(F.lit(AUTOCUT_N))))
    return (arr.select(F.posexplode(F.slice(F.col("a"), 1, F.least(cut, m)))
                        .alias("_pos", "_s"))
               .select(F.col("_s.vec_id").alias("vec_id"),
                       (-F.col("_s.ns")).alias("score"),
                       (F.col("_pos") + 1).cast("int").alias("rank")))


# ------------------------------------------- boosting / dis_max queries

NEG_TERM = "slow"
NEG_BOOST = 0.3
DISMAX_TIE = 0.3


@register("boosting_search", oracle=f"""
WITH {_BM25_CTE},
neg AS (SELECT doc_id,
               CASE WHEN list_contains({_TOK}, '{NEG_TERM}')
                    THEN 1 ELSE 0 END AS is_neg
        FROM documents)
SELECT b.doc_id,
       round(b.score * CASE WHEN neg.is_neg = 1
                            THEN {NEG_BOOST!r}e0 ELSE 1.0e0 END, 6)
         AS boosted_score,
       CAST(neg.is_neg AS INT) AS demoted
FROM bm25 b JOIN neg USING (doc_id)
ORDER BY boosted_score DESC, doc_id LIMIT 15
""")
def boosting_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `boosting` query: positive matches keep their relevance,
    documents also matching the negative clause are DEMOTED by
    `negative_boost` (not excluded — the distinction from must_not).
    The negative flag is a map-side array test in the same scan
    family as the BM25 pass; one co-keyed join, TakeOrdered page."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    neg = docs.select(
        "doc_id",
        F.when(F.array_contains(tokens("text"), NEG_TERM), 1).otherwise(0)
         .alias("is_neg"))
    return (bm25_scores(spark, sf_dir).join(neg, "doc_id")
            .select("doc_id",
                    F.round(F.col("score")
                            * F.when(F.col("is_neg") == 1, F.lit(NEG_BOOST))
                               .otherwise(F.lit(1.0)), 6)
                     .alias("boosted_score"),
                    F.col("is_neg").cast("int").alias("demoted"))
            .orderBy(F.desc("boosted_score"), "doc_id").limit(15))


@register("dis_max_search", oracle=f"""
WITH {_BM25_CTE},
{_VEC_CTE},
{_CAND_CTE},
j AS (
  SELECT coalesce(kcand.doc_id, vcand.doc_id) AS doc_id,
         coalesce(kcand.score, 0) AS s1,
         coalesce(vcand.vscore, 0) AS s2
  FROM kcand FULL OUTER JOIN vcand ON kcand.doc_id = vcand.doc_id)
SELECT doc_id,
       round(greatest(s1, s2)
             + {DISMAX_TIE!r}e0 * least(s1, s2), 6) AS dismax_score
FROM j ORDER BY dismax_score DESC, doc_id LIMIT 15
""")
def dis_max_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `dis_max`: the best per-clause score wins, other matching
    clauses contribute tie_breaker × their score — the
    max-of-modalities alternative to additive fusion. Same bounded
    full-outer candidate join as the fusion family; pure column math
    above it."""
    kw = _candidates(bm25_scores(spark, sf_dir), "score")
    vec = _candidates(_vec_scores(spark, sf_dir), "vscore")
    j = (kw.join(vec, "doc_id", "full_outer")
           .select("doc_id",
                   F.coalesce(F.col("score"), F.lit(0.0)).alias("s1"),
                   F.coalesce(F.col("vscore"), F.lit(0.0)).alias("s2")))
    return (j.select("doc_id",
                     F.round(F.greatest("s1", "s2")
                             + F.lit(DISMAX_TIE) * F.least("s1", "s2"), 6)
                      .alias("dismax_score"))
             .orderBy(F.desc("dismax_score"), "doc_id").limit(15))


# ------------------------------------ pinned / lookup / score modifiers

PINNED_IDS = (7, 42)
LOOKUP_DOC = 42
RANDOM_SEED = 1234
FVF_DIV = 100.0
UNLIKE_DOC = 7
UNLIKE_W = 2


@register("pinned_search", oracle=f"""
WITH {_BM25_CTE},
organic AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id)
           + {len(PINNED_IDS)} AS rank
  FROM (SELECT doc_id, score FROM bm25
        WHERE doc_id NOT IN {PINNED_IDS!r}
        ORDER BY score DESC, doc_id LIMIT 13)),
pinned AS (
  SELECT d.doc_id, coalesce(b.score, 0.0e0) AS score,
         CASE {" ".join(f"WHEN d.doc_id = {p} THEN {i + 1}"
                        for i, p in enumerate(PINNED_IDS))} END AS rank
  FROM documents d LEFT JOIN bm25 b USING (doc_id)
  WHERE d.doc_id IN {PINNED_IDS!r})
SELECT doc_id, score, CAST(rank AS INT) AS rank FROM pinned
UNION ALL
SELECT doc_id, score, CAST(rank AS INT) AS rank FROM organic
ORDER BY rank
""")
def pinned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `pinned` query: curated ids occupy the top ranks in their
    given order (scored or not), organic relevance fills the rest,
    pinned ids excluded from the organic stream. Pinned side is an
    O(|pins|) lookup; organic is the usual bounded TakeOrdered +
    window-free ranks."""
    from .hybrid import bounded_ranks
    bm25 = bm25_scores(spark, sf_dir)
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    rank_expr = F.when(F.col("doc_id") == PINNED_IDS[0], 1)
    for i, p in enumerate(PINNED_IDS[1:], start=2):
        rank_expr = rank_expr.when(F.col("doc_id") == p, i)
    pinned = (docs.where(F.col("doc_id").isin(*PINNED_IDS))
                  .join(bm25, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce("score", F.lit(0.0)).alias("score"),
                          rank_expr.cast("int").alias("rank")))
    # materialize the ≤13-row organic cut once: its two consumers
    # (rank assignment + score join-back) would otherwise each
    # re-execute the BM25 corpus pass behind it (64x-measured:
    # 17.3 s -> one pass per side)
    organic_cut = (bm25.where(~F.col("doc_id").isin(*PINNED_IDS))
                       .orderBy(F.desc("score"), "doc_id").limit(13)
                       .localCheckpoint())
    ranks = bounded_ranks(organic_cut, "score", "doc_id", "rank")
    organic = (organic_cut.join(ranks, "doc_id")
               .select("doc_id", "score",
                       (F.col("rank") + len(PINNED_IDS)).cast("int")
                        .alias("rank")))
    return pinned.unionByName(organic).orderBy("rank")


@register("terms_lookup_filter", oracle=f"""
WITH lookup AS (
  SELECT list_distinct({_TOK}) AS lt FROM documents
  WHERE doc_id = {LOOKUP_DOC})
SELECT d.doc_id,
       CAST(len(list_filter(list_distinct({_TOK}),
                            x -> list_contains(lookup.lt, x))) AS INT)
         AS n_matched
FROM documents d, lookup
WHERE d.doc_id <> {LOOKUP_DOC}
  AND len(list_filter(list_distinct({_TOK}),
                      x -> list_contains(lookup.lt, x))) > 0
ORDER BY d.doc_id LIMIT 25
""")
def terms_lookup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `terms` lookup: the filter's term set is FETCHED from a
    stored document rather than inlined in the request. The lookup
    doc's distinct tokens are one broadcast row; the membership test
    is a map-side array intersect in the scan — filter semantics
    (with a matched-count payload), not MLT's ranking."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    lookup = (docs.where(F.col("doc_id") == LOOKUP_DOC)
                  .select(F.array_distinct(tokens("text")).alias("lt")))
    n = F.size(F.array_intersect(F.array_distinct(tokens("text")),
                                 F.col("lt")))
    return (docs.where(F.col("doc_id") != LOOKUP_DOC)
                .crossJoin(F.broadcast(lookup))
                .select("doc_id", n.cast("int").alias("n_matched"))
                .where(F.col("n_matched") > 0)
                .orderBy("doc_id").limit(25))


@register("field_value_factor_search", oracle=f"""
WITH {_BM25_CTE}
SELECT b.doc_id,
       round(b.score * ln(1.0e0 + d.n_chars / {FVF_DIV!r}e0), 6)
         AS fvf_score
FROM bm25 b JOIN documents d USING (doc_id)
ORDER BY fvf_score DESC, b.doc_id LIMIT 15
""")
def field_value_factor_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score `field_value_factor` (log1p modifier):
    relevance scaled by a stored numeric field. One co-keyed payload
    join above the zero-shuffle BM25 pass; round-6 absorbs the libm
    ulp spread exactly as T17's decay boost does."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    return (bm25_scores(spark, sf_dir)
            .join(docs.select("doc_id", "n_chars"), "doc_id")
            .select("doc_id",
                    F.round(F.col("score")
                            * F.log(1.0 + F.col("n_chars") / F.lit(FVF_DIV)),
                            6).alias("fvf_score"))
            .orderBy(F.desc("fvf_score"), "doc_id").limit(15))


@register("random_score_search", oracle=f"""
SELECT doc_id,
       round(('0x' || substr(md5('{RANDOM_SEED}:' || doc_id), 1, 15))::BIGINT
             / {float(1 << 60)!r}, 6) AS rscore
FROM documents
WHERE list_contains({_TOK}, 'fast')
ORDER BY rscore DESC, doc_id LIMIT 10
""")
def random_score_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score `random_score` with a seed: reproducible
    pseudo-random ranking of the filtered set — the seeded hash IS
    the contract (same seed, same order, any node count), which is
    exactly the repo's deterministic md5 coin."""
    from ..functions.hashing import md5_int60
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    rscore = F.round(
        md5_int60(F.concat(F.lit(f"{RANDOM_SEED}:"),
                           F.col("doc_id").cast("string")))
        / F.lit(float(1 << 60)), 6)
    return (docs.where(F.array_contains(tokens("text"), "fast"))
                .select("doc_id", rscore.alias("rscore"))
                .orderBy(F.desc("rscore"), "doc_id").limit(10))


@register("mlt_unlike", oracle=f"""
WITH grams AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len({_TOK}) - 1, 1)),
             i -> {_TOK}[i] || ' ' || {_TOK}[i + 1] || ' '
                  || {_TOK}[i + 2])) AS gs
  FROM documents),
seed AS (SELECT gs AS sg FROM grams WHERE doc_id = {LOOKUP_DOC}),
neg AS (SELECT gs AS ng FROM grams WHERE doc_id = {UNLIKE_DOC}),
scored AS (
  SELECT g.doc_id,
         len(list_filter(g.gs, x -> list_contains(sg, x))) AS n_pos,
         len(list_filter(g.gs, x -> list_contains(ng, x))) AS n_neg
  FROM grams g, seed, neg
  WHERE g.doc_id NOT IN ({LOOKUP_DOC}, {UNLIKE_DOC}))
SELECT doc_id, CAST(n_pos AS INT) AS n_pos, CAST(n_neg AS INT) AS n_neg,
       CAST(n_pos - {UNLIKE_W} * n_neg AS INT) AS mlt_score
FROM scored
WHERE n_pos - {UNLIKE_W} * n_neg > 0
ORDER BY mlt_score DESC, doc_id LIMIT 15
""")
def mlt_unlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this with `unlike`: gram overlap with the liked
    document minus a weighted penalty for overlap with the disliked
    one.

    Scale shape (64x-probed): BOTH example gram sets ride in ONE
    combined broadcast row (seed×neg is 1×1) so the corpus passes
    through a SINGLE BroadcastNestedLoopJoin — a chain of two 1-row
    crossJoins measured 2.3x slower at 64x (each extra BNLJ re-copies
    the per-doc gram array through another non-codegen join boundary).
    The intersects materialize once in a select BEFORE the score
    filter, so the filter never re-evaluates them."""
    from ..functions.text import ngram_array
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    grams = docs.select("doc_id", ngram_array("text", 3).alias("gs"))
    seed = (grams.where(F.col("doc_id") == LOOKUP_DOC)
                 .select(F.col("gs").alias("sg")))
    neg = (grams.where(F.col("doc_id") == UNLIKE_DOC)
                .select(F.col("gs").alias("ng")))
    ctx = seed.crossJoin(neg)          # one combined 1-row example frame
    scored = (grams.where(~F.col("doc_id").isin(LOOKUP_DOC, UNLIKE_DOC))
              .crossJoin(F.broadcast(ctx))
              .select("doc_id",
                      F.size(F.array_intersect("gs", "sg")).cast("int")
                       .alias("n_pos"),
                      F.size(F.array_intersect("gs", "ng")).cast("int")
                       .alias("n_neg")))
    return (scored.select("doc_id", "n_pos", "n_neg",
                          (F.col("n_pos") - UNLIKE_W * F.col("n_neg"))
                           .cast("int").alias("mlt_score"))
                  .where(F.col("mlt_score") > 0)
                  .orderBy(F.desc("mlt_score"), "doc_id").limit(15))
