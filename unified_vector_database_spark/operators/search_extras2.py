"""Search-surface extensions, r6 wave: distribution-based score
fusion, collapse with inner hits, and `span_not`.

Reference parity: Qdrant hybrid `fusion: dbsf` (distribution-based
score fusion — the OTHER fusion next to RRF, normalizing each
modality by mean ± 3σ over the candidate window), Elasticsearch
`collapse.inner_hits` (the collapsed group's top-N flattened back
into the response), and Elasticsearch `span_not` (matches of one
term except where a second term appears within a window).

Scale shapes:
- dbsf: both modalities cut to HYBRID_CANDIDATES by TakeOrdered
  first; mean/σ are 1-row broadcast aggregates of those bounded sets
  (the normalization window IS the retrieved candidate window, same
  as relativeScoreFusion). Power sums accumulate as exact DECIMAL so
  σ is merge-order-free and the hash oracle holds.
- collapse_inner_hits: one co-keyed doc_id join, one window per
  collapse-field value with WindowGroupLimit pruning rank ≤ N
  map-side; group count bounds everything downstream.
- span_not: per-doc position lists built map-side (index-aware
  transform); the include × exclude gap product is per-document over
  two term-position lists — tiny, never a corpus join. Zero corpus
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from .. import tables
from ..registry import register
from .hybrid import (_BM25_CTE, _CAND_CTE, _TOK, _VEC_CTE, _candidates,
                     _vec_scores, bm25_scores)

# ------------------------------------------------------------- hybrid_dbsf

_DBSF_SIGMAS = 3.0


def _dbsf_norm_sql(cand: str, col: str) -> str:
    """Mean ± 3σ stats of one candidate set as exact-DECIMAL power
    sums (σ_pop in closed form — the extended_stats pattern, so both
    engines derive identical doubles regardless of merge order)."""
    return f"""
  SELECT count(*) AS n,
         CAST(sum(CAST(round({col}, 6) AS DECIMAL(18,6))) AS DOUBLE) AS s1,
         CAST(sum(CAST(round({col}, 6) * round({col}, 6)
                       AS DECIMAL(28,12))) AS DOUBLE) AS s2
  FROM {cand}"""


@register("hybrid_dbsf", oracle=f"""
WITH {_BM25_CTE},
{_VEC_CTE},
{_CAND_CTE},
kx AS ({_dbsf_norm_sql('kcand', 'score')}),
vx AS ({_dbsf_norm_sql('vcand', 'vscore')}),
fused AS (
  SELECT coalesce(kcand.doc_id, vcand.doc_id) AS doc_id,
         round(0.5 * coalesce(least(greatest(
                 CASE WHEN round(kcand.score, 6) IS NULL THEN NULL
                      WHEN sqrt(greatest(kx.s2/kx.n - (kx.s1/kx.n)*(kx.s1/kx.n), 0)) = 0
                      THEN 1.0e0
                      ELSE (round(kcand.score, 6)
                            - (kx.s1/kx.n - {_DBSF_SIGMAS!r}
                               * sqrt(greatest(kx.s2/kx.n - (kx.s1/kx.n)*(kx.s1/kx.n), 0))))
                           / (2 * {_DBSF_SIGMAS!r}
                              * sqrt(greatest(kx.s2/kx.n - (kx.s1/kx.n)*(kx.s1/kx.n), 0)))
                 END, 0.0e0), 1.0e0), 0)
             + 0.5 * coalesce(least(greatest(
                 CASE WHEN round(vcand.vscore, 6) IS NULL THEN NULL
                      WHEN sqrt(greatest(vx.s2/vx.n - (vx.s1/vx.n)*(vx.s1/vx.n), 0)) = 0
                      THEN 1.0e0
                      ELSE (round(vcand.vscore, 6)
                            - (vx.s1/vx.n - {_DBSF_SIGMAS!r}
                               * sqrt(greatest(vx.s2/vx.n - (vx.s1/vx.n)*(vx.s1/vx.n), 0))))
                           / (2 * {_DBSF_SIGMAS!r}
                              * sqrt(greatest(vx.s2/vx.n - (vx.s1/vx.n)*(vx.s1/vx.n), 0)))
                 END, 0.0e0), 1.0e0), 0),
               6) AS fused_score
  FROM kcand FULL OUTER JOIN vcand ON kcand.doc_id = vcand.doc_id, kx, vx)
SELECT doc_id, fused_score FROM fused
ORDER BY fused_score DESC, doc_id LIMIT 15
""")
def hybrid_dbsf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qdrant distribution-based score fusion (`fusion: dbsf`): each
    modality's candidate scores normalize by (s - (μ-3σ)) / 6σ,
    clamped to [0,1], then average — the outlier-robust alternative
    to min-max relativeScoreFusion. μ/σ_pop derive from exact-DECIMAL
    power sums of the round-6 candidate scores (one 1-row broadcast
    aggregate per modality); a degenerate window (σ = 0) normalizes
    to 1 like relative fusion's max==min case."""
    # each candidate frame feeds TWO consumers (its stats agg and the
    # fusion join) — without the lazy checkpoint the broadcast subtree
    # re-runs the whole BM25/cosine corpus pass per consumer (the
    # suggest_phrase recompute class; ≤HYBRID_CANDIDATES rows cached)
    kw = (_candidates(bm25_scores(spark, sf_dir), "score")
          .localCheckpoint(eager=False))
    vec = (_candidates(_vec_scores(spark, sf_dir), "vscore")
           .localCheckpoint(eager=False))

    def stats(df, col, p):
        r6 = F.round(F.col(col), 6)
        return df.agg(
            F.count("*").alias(f"{p}n"),
            F.sum(r6.cast("decimal(18,6)")).cast("double").alias(f"{p}s1"),
            F.sum((r6 * r6).cast("decimal(28,12)")).cast("double")
             .alias(f"{p}s2"))

    kx, vx = stats(kw, "score", "k"), stats(vec, "vscore", "v")

    def norm(s, p):
        mu = F.col(f"{p}s1") / F.col(f"{p}n")
        sig = F.sqrt(F.greatest(
            F.col(f"{p}s2") / F.col(f"{p}n") - mu * mu, F.lit(0.0)))
        # a doc ABSENT from this modality (NULL score) must stay
        # NULL through the sigma=0 branch too, so the outer coalesce
        # gives it 0 — not a free 1.0 (review r5)
        raw = F.when(s.isNull(), F.lit(None).cast("double")) \
               .when(sig == 0, F.lit(1.0)).otherwise(
            (F.round(s, 6) - (mu - _DBSF_SIGMAS * sig))
            / (2 * _DBSF_SIGMAS * sig))
        return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))

    return (kw.join(vec, "doc_id", "full_outer")
              .crossJoin(F.broadcast(kx)).crossJoin(F.broadcast(vx))
              .select("doc_id",
                      F.round(
                          0.5 * F.coalesce(norm(F.col("score"), "k"),
                                           F.lit(0.0))
                          + 0.5 * F.coalesce(norm(F.col("vscore"), "v"),
                                             F.lit(0.0)),
                          6).alias("fused_score"))
              .orderBy(F.desc("fused_score"), "doc_id").limit(15))


# ------------------------------------------------------ collapse inner_hits

INNER_HITS = 3
INNER_GROUPS = 4


@register("collapse_inner_hits", oracle=f"""
WITH {_BM25_CTE},
j AS (SELECT d.lang, b.doc_id, b.score
      FROM bm25 b JOIN documents d USING (doc_id)),
r AS (SELECT lang, doc_id, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id) AS hit_rank,
             max(score) OVER (PARTITION BY lang) AS group_best
      FROM j),
g AS (SELECT DISTINCT lang, group_best FROM r
      ORDER BY group_best DESC, lang LIMIT {INNER_GROUPS})
SELECT r.lang, CAST(r.hit_rank AS INT) AS hit_rank, r.doc_id, r.score
FROM r JOIN g USING (lang)
WHERE r.hit_rank <= {INNER_HITS}
ORDER BY g.group_best DESC, r.lang, r.hit_rank
""")
def collapse_inner_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `collapse` with `inner_hits`: the top {INNER_GROUPS} collapse
    groups (by their best BM25 hit), each flattened to its top
    {INNER_HITS} inner hits with the within-group rank — what
    collapse_search's one-hit-per-group form hides. One doc_id join,
    one bounded window per lang value (WindowGroupLimit prunes
    rank ≤ N map-side); group selection is a TakeOrdered over
    |distinct langs| rows."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    j = (bm25_scores(spark, sf_dir)
         .join(docs.select("doc_id", "lang"), "doc_id"))
    w = W.partitionBy("lang").orderBy(F.desc("score"), "doc_id")
    # ONE window pass; WindowGroupLimit prunes rank ≤ N map-side, so
    # the checkpointed frame is |distinct langs| × N rows — the
    # group_best column is just each group's rank-1 score, no second
    # window or second corpus pass needed
    r = (j.withColumn("hit_rank", F.row_number().over(w))
          .where(F.col("hit_rank") <= INNER_HITS)
          .localCheckpoint(eager=False))
    g = (r.where(F.col("hit_rank") == 1)
          .select("lang", F.col("score").alias("group_best"))
          .orderBy(F.desc("group_best"), "lang").limit(INNER_GROUPS))
    return (r.join(F.broadcast(g), "lang")
             .select("lang", F.col("hit_rank").cast("int").alias("hit_rank"),
                     "doc_id", "score", "group_best")
             .orderBy(F.desc("group_best"), "lang", "hit_rank")
             .drop("group_best"))


# ----------------------------------------------------------------- span_not

SPAN_NOT_INC = "vector"
SPAN_NOT_EXC = "data"
SPAN_NOT_DIST = 2


@register("span_not_search", oracle=f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_NOT_INC}') AS inc,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_NOT_EXC}') AS exc
  FROM t),
k AS (
  SELECT doc_id,
         CAST(len(inc) AS BIGINT) AS n_matches,
         CAST(len(list_filter(inc,
             x -> len(list_filter(exc,
                      y -> abs(x - y) <= {SPAN_NOT_DIST})) = 0))
           AS BIGINT) AS n_kept
  FROM p)
SELECT doc_id, n_matches, n_kept FROM k
WHERE n_kept > 0
ORDER BY n_kept DESC, doc_id LIMIT 20
""")
def span_not_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_not` with pre/post distance: occurrences of the
    include term that do NOT have the exclude term within
    {SPAN_NOT_DIST} tokens on either side (the negative-context span
    query — e.g. "vector" but not near "data"). A doc matches when
    at least one occurrence survives; n_matches/n_kept expose the
    exclusion's effect. Same per-doc position-list shape as
    span_near: map-side, zero corpus shuffle."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")

    def positions(term):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i + 1)
                        .otherwise(F.lit(-1))),
            lambda x: x >= 0)

    inc, exc = positions(SPAN_NOT_INC), positions(SPAN_NOT_EXC)
    kept = F.filter(inc, lambda x: F.size(
        F.filter(exc, lambda y: F.abs(x - y) <= SPAN_NOT_DIST)) == 0)
    out = docs.select(
        "doc_id",
        F.size(inc).cast("long").alias("n_matches"),
        F.size(kept).cast("long").alias("n_kept"))
    return (out.where(F.col("n_kept") > 0)
               .orderBy(F.desc("n_kept"), "doc_id").limit(20))


# ------------------------------------------- parent/child join queries

HAS_CHILD_FLAG = "R"
HAS_CHILD_MIN = 4
HAS_PARENT_PRIORITY = "1-URGENT"


@register("has_child_search", oracle=f"""
WITH c AS (
  SELECT l_orderkey, count(*) AS n_children
  FROM lineitem WHERE l_returnflag = '{HAS_CHILD_FLAG}'
  GROUP BY 1 HAVING count(*) >= {HAS_CHILD_MIN})
SELECT o.o_orderkey, CAST(c.n_children AS BIGINT) AS n_matching_children,
       o.o_totalprice::DOUBLE AS o_totalprice
FROM orders o JOIN c ON o.o_orderkey = c.l_orderkey
ORDER BY n_matching_children DESC, o.o_orderkey LIMIT 20
""")
def has_child_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `has_child` with `min_children` (the join-field query
    family): return PARENT docs (orders) having ≥ N child docs
    (lineitems) matching the child query (returnflag = 'R'), scored
    by match count. The child predicate filters map-side BEFORE the
    group; parent join is co-keyed on the order key — the shuffled
    side is matching child GROUPS, never raw children."""
    li = tables.load(spark, sf_dir, "lineitem")
    orders = tables.load(spark, sf_dir, "orders")
    c = (li.where(F.col("l_returnflag") == HAS_CHILD_FLAG)
           .groupBy("l_orderkey").agg(F.count("*").alias("n"))
           .where(F.col("n") >= HAS_CHILD_MIN))
    return (orders.join(c, orders.o_orderkey == c.l_orderkey)
                  .select("o_orderkey",
                          F.col("n").cast("long")
                           .alias("n_matching_children"),
                          F.col("o_totalprice").cast("double")
                           .alias("o_totalprice"))
                  .orderBy(F.desc("n_matching_children"), "o_orderkey")
                  .limit(20))


@register("has_parent_search", oracle=f"""
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_children,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '{HAS_PARENT_PRIORITY}'
GROUP BY 1 ORDER BY l_returnflag
""")
def has_parent_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `has_parent`: return CHILD docs whose parent matches the
    parent query (urgent orders), rolled up per returnflag so the
    output is census-sized. The parent side filters before the join
    and carries only its key — broadcast-sized at real parent
    selectivity; sums accumulate as exact DECIMAL."""
    li = tables.load(spark, sf_dir, "lineitem")
    par = (tables.load(spark, sf_dir, "orders")
           .where(F.col("o_orderpriority") == HAS_PARENT_PRIORITY)
           .select("o_orderkey"))
    return (li.join(par, li.l_orderkey == par.o_orderkey)
              .groupBy("l_returnflag")
              .agg(F.count("*").cast("long").alias("n_children"),
                   F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                    .cast("double").alias("total_price"))
              .orderBy("l_returnflag"))


# ------------------------------------------------------- gauss decay

DECAY_SCALE_DAYS = 7
DECAY_AT_SCALE = 0.5
DECAY_TOP = 20


@register("gauss_decay_search", oracle=f"""
WITH mx AS (SELECT max(date_trunc('day', ts)::DATE) AS anchor FROM events),
s AS (
  SELECT e.event_id, e.value,
         CAST(mx.anchor - date_trunc('day', e.ts)::DATE AS BIGINT)
           AS age_days
  FROM events e, mx)
SELECT event_id, age_days,
       round(value * power({DECAY_AT_SCALE!r},
             (age_days * 1.0 / {DECAY_SCALE_DAYS})
             * (age_days * 1.0 / {DECAY_SCALE_DAYS})), 6) AS score
FROM s
ORDER BY score DESC, event_id LIMIT {DECAY_TOP}
""")
def gauss_decay_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `function_score` gauss decay on recency (the
    freshness-boosted ranking every news/feed deployment runs):
    score = value · decay^((age/scale)²), decay 0.5 at scale 7 days,
    origin = the corpus' newest day (a 1-row aggregate broadcast —
    no driver round-trip). Day-granular ages keep the decay input
    exact-integer on both engines; the transcendental pow lands only
    in the rounded output and the ORDER BY uses the rounded score,
    so engine ulps cannot reorder."""
    ev = tables.load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    mx = ev.agg(F.max(day).alias("anchor"))
    s = (ev.crossJoin(F.broadcast(mx))
           .select("event_id", "value",
                   F.datediff(F.col("anchor"), day).cast("long")
                    .alias("age_days")))
    ratio = F.col("age_days") * 1.0 / DECAY_SCALE_DAYS
    score = F.round(F.col("value")
                    * F.pow(F.lit(DECAY_AT_SCALE), ratio * ratio), 6)
    return (s.select("event_id", "age_days", score.alias("score"))
             .orderBy(F.desc("score"), "event_id").limit(DECAY_TOP))


@register("linear_decay_search", oracle=f"""
WITH mx AS (SELECT max(date_trunc('day', ts)::DATE) AS anchor FROM events),
s AS (
  SELECT e.event_id, e.value,
         CAST(mx.anchor - date_trunc('day', e.ts)::DATE AS BIGINT)
           AS age_days
  FROM events e, mx)
SELECT event_id, age_days,
       round(value * greatest(0.0,
             1.0 - age_days * 1.0 / (2 * {DECAY_SCALE_DAYS})), 6) AS score
FROM s
ORDER BY score DESC, event_id LIMIT {DECAY_TOP}
""")
def linear_decay_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `function_score` LINEAR decay on recency (the second of the
    ES decay triple — gauss is T53, exp below): multiplier
    max(0, 1 − age/s0) with s0 = scale/(1−decay) = 2·scale, i.e.
    decay 0.5 at {DECAY_SCALE_DAYS} days and zero beyond 2·scale —
    the only decay curve that actually reaches 0, which is why feeds
    use it to hard-expire stale items. Same 1-row-anchor-broadcast
    map-side shape as gauss; the multiplier is pure rational
    arithmetic (no transcendental at all), bit-identical on both
    engines before the round."""
    ev = tables.load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    mx = ev.agg(F.max(day).alias("anchor"))
    s = (ev.crossJoin(F.broadcast(mx))
           .select("event_id", "value",
                   F.datediff(F.col("anchor"), day).cast("long")
                    .alias("age_days")))
    mult = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.col("age_days") * 1.0 / (2 * DECAY_SCALE_DAYS))
    return (s.select("event_id", "age_days",
                     F.round(F.col("value") * mult, 6).alias("score"))
             .orderBy(F.desc("score"), "event_id").limit(DECAY_TOP))


@register("exp_decay_search", oracle=f"""
WITH mx AS (SELECT max(date_trunc('day', ts)::DATE) AS anchor FROM events),
s AS (
  SELECT e.event_id, e.value,
         CAST(mx.anchor - date_trunc('day', e.ts)::DATE AS BIGINT)
           AS age_days
  FROM events e, mx)
SELECT event_id, age_days,
       round(value * power({DECAY_AT_SCALE!r},
                           age_days * 1.0 / {DECAY_SCALE_DAYS}), 6) AS score
FROM s
ORDER BY score DESC, event_id LIMIT {DECAY_TOP}
""")
def exp_decay_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `function_score` EXP decay on recency (closing the decay
    triple): multiplier decay^(age/scale) — the heavy-tailed curve
    that never hits zero, ES's default for "prefer recent but never
    exclude". Same shape and the same transcendental discipline as
    gauss (T53): exact-integer day ages in, pow only in the rounded
    OUTPUT column, ORDER BY the rounded score."""
    ev = tables.load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    mx = ev.agg(F.max(day).alias("anchor"))
    s = (ev.crossJoin(F.broadcast(mx))
           .select("event_id", "value",
                   F.datediff(F.col("anchor"), day).cast("long")
                    .alias("age_days")))
    score = F.round(
        F.col("value") * F.pow(F.lit(DECAY_AT_SCALE),
                               F.col("age_days") * 1.0 / DECAY_SCALE_DAYS),
        6)
    return (s.select("event_id", "age_days", score.alias("score"))
             .orderBy(F.desc("score"), "event_id").limit(DECAY_TOP))


# --------------------------------------------------- distance_feature

DF_PIVOT_DAYS = 10
DF_BOOST = 5.0


@register("distance_feature_search", oracle=f"""
WITH mx AS (SELECT max(date_trunc('day', ts)::DATE) AS anchor FROM events),
s AS (
  SELECT e.event_id, e.event_type,
         CAST(mx.anchor - date_trunc('day', e.ts)::DATE AS BIGINT)
           AS age_days
  FROM events e, mx
  WHERE e.event_type = 'click')
SELECT event_id, age_days,
       round({DF_BOOST!r} * {DF_PIVOT_DAYS}
             / ({DF_PIVOT_DAYS} + age_days), 6) AS score
FROM s
ORDER BY score DESC, event_id LIMIT {DECAY_TOP}
""")
def distance_feature_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `distance_feature` query on a date field: score =
    boost · pivot / (pivot + distance) — the reciprocal-rank-style
    proximity boost ES recommends over decay functions inside bool
    queries (it can use the index to skip far docs; relationally the
    filter does that). Composed here with a term filter
    (event_type = 'click'), matching the documented bool+boost use.
    Pure rational arithmetic on exact-integer day distances —
    bit-identical before the round; 1-row anchor broadcast,
    TakeOrdered page."""
    ev = tables.load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    mx = ev.agg(F.max(day).alias("anchor"))
    s = (ev.where(F.col("event_type") == "click")
           .crossJoin(F.broadcast(mx))
           .select("event_id",
                   F.datediff(F.col("anchor"), day).cast("long")
                    .alias("age_days")))
    score = F.round(
        F.lit(DF_BOOST) * DF_PIVOT_DAYS
        / (F.lit(DF_PIVOT_DAYS) + F.col("age_days")), 6)
    return (s.select("event_id", "age_days", score.alias("score"))
             .orderBy(F.desc("score"), "event_id").limit(DECAY_TOP))


# --------------------------------- span_within / span_containing

SPAN_LITTLE = "key"
SPAN_BIG_A = "table"
SPAN_BIG_B = "scan"
SPAN_BIG_SLOP = 6

_SPAN_WC_CTE = f"""
WITH t AS (SELECT doc_id, {{tok}} AS toks FROM documents),
p AS (
  SELECT doc_id,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_LITTLE}') AS pl,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_BIG_A}') AS pa,
         list_filter(range(1, len(toks) + 1),
                     i -> toks[i] = '{SPAN_BIG_B}') AS pb
  FROM t),
g AS (
  SELECT doc_id, pl,
         flatten(list_transform(pa, a ->
             list_transform(list_filter(pb, b ->
                                abs(a - b) <= {SPAN_BIG_SLOP}),
                            b -> [least(a, b), greatest(a, b)]))) AS big
  FROM p)
"""


def _span_positions(toks, term):
    return F.filter(
        F.transform(toks, lambda t, i: F.when(t == term, i + 1)
                    .otherwise(F.lit(-1))),
        lambda x: x >= 0)


def _span_frames(spark: SparkSession, sf_dir: str):
    """Per-doc little positions + big spans — the ES span algebra
    substrate shared by span_within/span_containing. A big span is a
    span_near(({SPAN_BIG_A!r}, {SPAN_BIG_B!r}), slop) match pair,
    reduced to its [lo, hi] token envelope. All map-side array math,
    zero corpus shuffle; per-doc arrays are bounded by term
    frequency, so the nested lambdas cost O(tf²) per row."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")
    pl = _span_positions(toks, SPAN_LITTLE)
    pa = _span_positions(toks, SPAN_BIG_A)
    pb = _span_positions(toks, SPAN_BIG_B)
    big = F.flatten(F.transform(pa, lambda a: F.transform(
        F.filter(pb, lambda b: F.abs(a - b) <= SPAN_BIG_SLOP),
        lambda b: F.array(F.least(a, b), F.greatest(a, b)))))
    return docs.select("doc_id", pl.alias("pl"), big.alias("big"))


def _inside(x, s):
    return (x >= F.element_at(s, 1)) & (x <= F.element_at(s, 2))


@register("span_within_search", oracle=_SPAN_WC_CTE.format(tok=_TOK) + f"""
SELECT doc_id,
       CAST(len(big) AS BIGINT) AS n_big,
       CAST(len(list_filter(pl, x ->
            len(list_filter(big, s -> x >= s[1] AND x <= s[2])) > 0))
         AS BIGINT) AS n_within
FROM g
WHERE len(list_filter(pl, x ->
          len(list_filter(big, s -> x >= s[1] AND x <= s[2])) > 0)) > 0
ORDER BY n_within DESC, doc_id LIMIT 20
""")
def span_within_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_within`: match occurrences of the LITTLE span
    ('{SPAN_LITTLE}') that sit inside some BIG span (a
    '{SPAN_BIG_A}'…'{SPAN_BIG_B}' near-pair within
    {SPAN_BIG_SLOP} tokens) — with span_containing below, the
    enclosure pair that completes the span family beside
    span_first/span_near/span_not. Returns docs with ≥1 enclosed
    occurrence, scored by how many."""
    f = _span_frames(spark, sf_dir)
    within = F.filter(
        F.col("pl"),
        lambda x: F.exists(F.col("big"), lambda s: _inside(x, s)))
    out = f.select("doc_id",
                   F.size("big").cast("long").alias("n_big"),
                   F.size(within).cast("long").alias("n_within"))
    return (out.where(F.col("n_within") > 0)
               .orderBy(F.desc("n_within"), "doc_id").limit(20))


@register("span_containing_search",
          oracle=_SPAN_WC_CTE.format(tok=_TOK) + f"""
SELECT doc_id,
       CAST(len(big) AS BIGINT) AS n_big,
       CAST(len(list_filter(big, s ->
            len(list_filter(pl, x -> x >= s[1] AND x <= s[2])) > 0))
         AS BIGINT) AS n_containing
FROM g
WHERE len(list_filter(big, s ->
          len(list_filter(pl, x -> x >= s[1] AND x <= s[2])) > 0)) > 0
ORDER BY n_containing DESC, doc_id LIMIT 20
""")
def span_containing_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_containing`: the dual of span_within — match BIG
    spans that CONTAIN at least one little-span occurrence, scored by
    how many big spans qualify. Same per-doc substrate, same map-side
    zero-shuffle shape."""
    f = _span_frames(spark, sf_dir)
    containing = F.filter(
        F.col("big"),
        lambda s: F.exists(F.col("pl"), lambda x: _inside(x, s)))
    out = f.select("doc_id",
                   F.size("big").cast("long").alias("n_big"),
                   F.size(containing).cast("long").alias("n_containing"))
    return (out.where(F.col("n_containing") > 0)
               .orderBy(F.desc("n_containing"), "doc_id").limit(20))


# --------------------------------------------- simple_query_string

SQS_AND = ("scan", "table")   # 'scan +table'
SQS_OR = "merge"              # '| merge'
SQS_NOT = "slow"              # '-slow' scoped to the OR clause


@register("simple_query_string_search", oracle=f"""
WITH t AS (SELECT doc_id, {{tok}} AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x = '{SQS_AND[0]}')) AS f_a,
         len(list_filter(toks, x -> x = '{SQS_AND[1]}')) AS f_b,
         len(list_filter(toks, x -> x = '{SQS_OR}')) AS f_c,
         len(list_filter(toks, x -> x = '{SQS_NOT}')) AS f_n
  FROM t)
SELECT doc_id, CAST(f_a + f_b + f_c AS BIGINT) AS score
FROM s
WHERE (f_a > 0 AND f_b > 0) OR (f_c > 0 AND f_n = 0)
ORDER BY score DESC, doc_id LIMIT 20
""".format(tok=_TOK))
def simple_query_string_search(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """ES `simple_query_string`, query
    `({SQS_AND[0]} + {SQS_AND[1]}) | ({SQS_OR} -{SQS_NOT})` — the
    forgiving end-user mini-language (`+` AND, `|` OR, `-` NOT)
    compiled to its boolean tree; score = total tf of the positive
    terms (the deterministic integer stand-in for the per-clause BM25
    sum, same convention as the other fixed-query DSL ops). One
    map-side array pass, TakeOrdered page."""
    from ..functions.text import tokens
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    toks = tokens("text")

    def tf(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    f = docs.select("doc_id", tf(SQS_AND[0]).alias("f_a"),
                    tf(SQS_AND[1]).alias("f_b"),
                    tf(SQS_OR).alias("f_c"), tf(SQS_NOT).alias("f_n"))
    match = ((F.col("f_a") > 0) & (F.col("f_b") > 0)) \
        | ((F.col("f_c") > 0) & (F.col("f_n") == 0))
    return (f.where(match)
             .select("doc_id",
                     (F.col("f_a") + F.col("f_b") + F.col("f_c"))
                     .cast("long").alias("score"))
             .orderBy(F.desc("score"), "doc_id").limit(20))


# ------------------------------------------------------------- span_or

@register("span_or_search", oracle=_SPAN_WC_CTE.format(tok=_TOK) + f"""
SELECT doc_id,
       CAST(len(pl) AS BIGINT) AS n_little,
       CAST(len(big) AS BIGINT) AS n_big,
       CAST(len(pl) + len(big) AS BIGINT) AS n_spans
FROM g
WHERE len(pl) + len(big) > 0
ORDER BY n_spans DESC, doc_id LIMIT 20
""")
def span_or_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `span_or`: the union wrapper that completes the span family
    (beside span_near/span_first/span_not and the within/containing
    enclosure pair) — clauses here are the little term span
    ('{SPAN_LITTLE}') and the '{SPAN_BIG_A}'…'{SPAN_BIG_B}' near-pair
    span; a doc matches when EITHER clause produces a span, scored by
    total span count exactly as ES feeds every clause match into
    scoring. Same per-doc substrate as within/containing: positions
    and envelopes are map-side array math, zero corpus shuffle,
    TakeOrdered page."""
    f = _span_frames(spark, sf_dir)
    out = f.select("doc_id",
                   F.size("pl").cast("long").alias("n_little"),
                   F.size("big").cast("long").alias("n_big"),
                   (F.size("pl") + F.size("big")).cast("long")
                   .alias("n_spans"))
    return (out.where(F.col("n_spans") > 0)
               .orderBy(F.desc("n_spans"), "doc_id").limit(20))


# --------------------------------------------------------- script_score

SCRIPT_SCORE_WEIGHT = 0.1


@register("script_score_search", oracle=f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
           WHERE vec_id = 0)
SELECT vec_id, label,
       round(list_dot_product(embedding::DOUBLE[], qvec)
             / (sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]))
                * sqrt(list_dot_product(qvec, qvec)))
             + {SCRIPT_SCORE_WEIGHT!r} * ln(1 + label), 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id LIMIT 10
""")
def script_score_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `script_score` query, script
    `cosineSimilarity(params.query_vector, 'embedding') +
    {SCRIPT_SCORE_WEIGHT} * Math.log(1 + doc['label'].value)` — the
    ES-native way to blend vector similarity with a document-field
    boost in ONE formula (the knn-plus-popularity recipe from the ES
    vector scoring docs). The script is an ordinary projected
    expression here, so it fuses into the corpus scan's codegen stage:
    one map-side pass, no shuffle, TakeOrdered page — the same plan a
    plain knn gets, the boost riding along for free. ln(1+label) on an
    INTEGER label is libm-identical on both engines; round-6 absorbs
    the ulp."""
    from ..operators.knn import corpus_with_query, cosine_score, knn
    corpus, q = corpus_with_query(spark, sf_dir)
    score = cosine_score() + F.lit(SCRIPT_SCORE_WEIGHT) \
        * F.log(F.lit(1.0) + F.col("label"))
    return knn(corpus, q, k=10, payload=("label",),
               score=F.round(score, 6))
