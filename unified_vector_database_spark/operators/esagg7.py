"""ES pipeline/introspection stragglers + Milvus JSON payload
filters, r9 wave: `max_bucket`/`min_bucket` (the sibling-pipeline
pair returning the KEYS of extreme buckets, not just the value —
stats_bucket beside it returns only values), the `_field_caps` API
census over a dynamically-mapped JSON payload, and the Milvus
`JSON_CONTAINS` filter family (the JSON twin of the typed-ARRAY
family in esagg6.py).

Reference parity: ES max_bucket / min_bucket pipeline aggregations
(keys come back as an ARRAY — ties are all reported); ES field_caps
(per-field type / searchable / aggregatable and how many indices —
here documents — carry the field); Milvus JSON-field filtering
(`json_contains`, `json_contains_any`, `json_contains_all`, and
scalar path access `props["meta"]["w"]` in boolean expressions).

Scale shapes: the bucket family runs one partial-agg shuffle of
|months| rows and post-processes the bucket frame (pipeline aggs
never re-touch the fact table); field_caps is map-side JSON
extraction folded by ONE global partial agg (the per-field rows are
unpivoted from a single aggregate row — no per-field scans); the
JSON_CONTAINS census is map-side `from_json` + array ops in the scan
stage feeding one |langs|-row rollup. At 100 TB the JSON parse
happens once per row in the scan projection (schema-on-read), and
the ingest-side answer — materialize a typed column — is the
separately-proven `nested_payload_typed` path.

Float determinism: money stays DECIMAL through the fold and casts to
DOUBLE only in the last select on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..functions.text import tokens
from ..registry import register

# --------------------------------------------- max_bucket / min_bucket


@register("max_bucket_agg", oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1),
x AS (SELECT max(rev) AS hi, min(rev) AS lo FROM m)
SELECT 'max_bucket' AS metric,
       string_agg(mon, ',' ORDER BY mon) AS keys,
       CAST(any_value(x.hi) AS DOUBLE) AS value
FROM m, x WHERE m.rev = x.hi
UNION ALL
SELECT 'min_bucket',
       string_agg(mon, ',' ORDER BY mon),
       CAST(any_value(x.lo) AS DOUBLE)
FROM m, x WHERE m.rev = x.lo
ORDER BY metric
""")
def max_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `max_bucket` + `min_bucket` pipeline aggregations over a
    monthly date_histogram of order revenue: each returns the extreme
    metric VALUE and the KEYS of every bucket achieving it (ES
    reports ties as a keys array — here comma-joined in key order,
    the repo's no-ARRAY-output policy). Completes the sibling
    pipeline family beside stats_bucket / percentiles_bucket, which
    reduce values but drop the keys.

    Scale shape: one partial-agg shuffle of |months| rows builds the
    bucket frame; the extremes are a 1-row aggregate broadcast back
    onto it; ties collapse with a deterministic ordered string_agg.
    The fact table is scanned exactly once."""
    m = (tables.load(spark, sf_dir, "orders")
         .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                                "yyyy-MM").alias("mon"))
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
               .alias("rev")))
    x = m.agg(F.max("rev").alias("hi"), F.min("rev").alias("lo"))
    mb = (m.join(F.broadcast(x), m.rev == x.hi)
           .agg(F.lit("max_bucket").alias("metric"),
                F.array_join(F.array_sort(F.collect_list("mon")), ",")
                 .alias("keys"),
                F.any_value("hi").cast("double").alias("value")))
    nb = (m.join(F.broadcast(x), m.rev == x.lo)
           .agg(F.lit("min_bucket").alias("metric"),
                F.array_join(F.array_sort(F.collect_list("mon")), ",")
                 .alias("keys"),
                F.any_value("lo").cast("double").alias("value")))
    return mb.unionAll(nb).orderBy("metric")


# ------------------------------------------------------- field_caps

FC_HOT = 30.0            # events hotter than this carry a `hot` flag
FC_NOTE_TYPE = "error"   # events of this type carry a `note` field

_FC_JSON_SQL = f"""
  SELECT '{{"k":' || json_extract_string(props, '$.k')
         || ',"et":"' || event_type || '"'
         || CASE WHEN value > {FC_HOT!r} THEN ',"hot":true' ELSE '' END
         || CASE WHEN event_type = '{FC_NOTE_TYPE}'
                 THEN ',"note":"err"' ELSE '' END
         || '}}' AS j
  FROM events"""


@register("field_caps_census", oracle=f"""
WITH d AS ({_FC_JSON_SQL}),
a AS (
  SELECT count(*) AS n,
         count(json_extract_string(j, '$.k')) AS n_k,
         count(json_extract_string(j, '$.et')) AS n_et,
         count(json_extract_string(j, '$.hot')) AS n_hot,
         count(json_extract_string(j, '$.note')) AS n_note
  FROM d)
SELECT f.field, f.es_type, f.aggregatable, f.n_docs,
       round(f.n_docs * 1.0 / a.n, 6) AS coverage
FROM a, LATERAL (VALUES
  ('et',   'keyword', TRUE,  a.n_et),
  ('hot',  'boolean', TRUE,  a.n_hot),
  ('k',    'long',    TRUE,  a.n_k),
  ('note', 'text',    FALSE, a.n_note)) AS f(field, es_type,
                                             aggregatable, n_docs)
ORDER BY f.field
""")
def field_caps_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `_field_caps` over a dynamically-mapped JSON payload: the
    events payload is serialized with conditionally-present fields
    (`hot` only on hot events, `note` only on '{FC_NOTE_TYPE}'
    events), and the census reports, per field, its mapped type,
    whether it is aggregatable (text is not — ES needs a keyword
    sub-field), how many documents carry it, and its coverage
    fraction — the mapping-introspection call every client fires
    before building an aggregation UI.

    Scale shape: presence checks are map-side JSON extraction in the
    scan stage folded by ONE global partial agg; the per-field output
    rows unpivot from that single aggregate row (a 4-row stack
    expression), so the corpus is scanned once regardless of how
    many fields the mapping grows."""
    ev = tables.load(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"k":'), F.get_json_object("props", "$.k"),
        F.lit(',"et":"'), F.col("event_type"), F.lit('"'),
        F.when(F.col("value") > FC_HOT, F.lit(',"hot":true'))
         .otherwise(F.lit("")),
        F.when(F.col("event_type") == FC_NOTE_TYPE,
               F.lit(',"note":"err"')).otherwise(F.lit("")),
        F.lit("}"))
    # parse ONCE per row into a typed struct — the repeated
    # get_json_object form re-parses the payload per field and the
    # 64x probe measured it 33x; one from_json is the scale answer
    # (the same parse-once rule events_props_json documents)
    s = F.from_json(j, "k long, et string, hot boolean, note string")
    d = ev.select(s.alias("s"))
    a = d.agg(
        F.count("*").alias("n"),
        F.count("s.k").alias("n_k"),
        F.count("s.et").alias("n_et"),
        F.count("s.hot").alias("n_hot"),
        F.count("s.note").alias("n_note"))
    rows = [("et", "keyword", True, "n_et"),
            ("hot", "boolean", True, "n_hot"),
            ("k", "long", True, "n_k"),
            ("note", "text", False, "n_note")]
    stack = F.explode(F.array(*[
        F.struct(F.lit(f).alias("field"), F.lit(t).alias("es_type"),
                 F.lit(ag).alias("aggregatable"),
                 F.col(c).alias("n_docs"))
        for f, t, ag, c in rows])).alias("f")
    return (a.select("n", stack)
             .select(F.col("f.field").alias("field"),
                     F.col("f.es_type").alias("es_type"),
                     F.col("f.aggregatable").alias("aggregatable"),
                     F.col("f.n_docs").alias("n_docs"),
                     F.round(F.try_divide(F.col("f.n_docs"),
                                          F.col("n")), 6)
                      .alias("coverage"))
             .orderBy("field"))


# ------------------------------------------------- JSON_CONTAINS family

JC_HEAD = 8
JC_ONE = "data"
JC_ANY = ("vector", "merge")
JC_ALL = ("key", "row")
JC_W_MIN = 600


@register("json_contains_filter", oracle=f"""
WITH a AS (
  SELECT lang, n_chars,
         list_distinct(list_slice(
           list_filter(string_split(trim(text), ' '), t -> t <> ''),
           1, {JC_HEAD})) AS labels
  FROM documents)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN list_contains(labels, '{JC_ONE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
       CAST(sum(CASE WHEN list_has_any(labels, {list(JC_ANY)!r})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
       CAST(sum(CASE WHEN list_has_all(labels, {list(JC_ALL)!r})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
       CAST(sum(CASE WHEN n_chars >= {JC_W_MIN} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_deep
FROM a GROUP BY lang ORDER BY lang
""")
def json_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Milvus JSON-field filter family: each document carries a JSON
    payload `{{"labels": [...], "meta": {{"w": n}}}}` (serialized
    with to_json — genuinely a string column, the Milvus JSON field
    type), and the per-language census counts docs passing
    `JSON_CONTAINS(props["labels"], '{JC_ONE}')`,
    `JSON_CONTAINS_ANY(..., {JC_ANY})`, `JSON_CONTAINS_ALL(...,
    {JC_ALL})`, and the scalar path predicate `props["meta"]["w"] >=
    {JC_W_MIN}` — the four JSON operators Milvus exposes. The Spark
    side REALLY round-trips JSON (to_json → from_json + array ops /
    get_json_object for the scalar path), proving the schema-on-read
    plan; the oracle computes the same census from the source
    columns (the serialization is content-preserving by
    construction).

    Scale shape: one parse per row in the scan projection, array
    membership map-side, ONE |langs|-row partial-agg shuffle. The
    ingest-side alternative — materialize typed columns once — is
    the `nested_payload_typed` path next door."""
    docs = tables.load(spark, sf_dir, "documents")
    labels = F.array_distinct(F.slice(tokens("text"), 1, JC_HEAD))
    j = F.to_json(F.struct(
        labels.alias("labels"),
        F.struct(F.col("n_chars").alias("w")).alias("meta")))
    d = docs.select("lang", j.alias("props"))
    lab = F.from_json(F.get_json_object("props", "$.labels"),
                      "array<string>")
    w = F.get_json_object("props", "$.meta.w").cast("long")
    parsed = d.select("lang", lab.alias("labels"), w.alias("w"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return (parsed.groupBy("lang")
            .agg(F.count("*").alias("n_total"),
                 flag(F.array_contains("labels", JC_ONE))
                  .alias("n_contains"),
                 flag(F.arrays_overlap(
                     "labels", F.array(*[F.lit(t) for t in JC_ANY])))
                  .alias("n_any"),
                 flag(F.array_contains("labels", JC_ALL[0])
                      & F.array_contains("labels", JC_ALL[1]))
                  .alias("n_all"),
                 flag(F.col("w") >= JC_W_MIN).alias("n_deep"))
            .orderBy("lang"))


# ------------------------------------------- Weaviate numeric Aggregate


@register("mode_agg", oracle="""
WITH c AS (
  SELECT lang, n_chars, count(*) AS cnt
  FROM documents GROUP BY 1, 2),
m AS (
  SELECT lang, n_chars AS mode_n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, n_chars) AS rn
  FROM c),
s AS (
  SELECT lang, count(*) AS n_docs,
         round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_val,
         round(quantile_cont(n_chars, 0.5), 6) AS median_val,
         min(n_chars) AS min_val, max(n_chars) AS max_val
  FROM documents GROUP BY lang)
SELECT s.lang, s.n_docs, m.mode_n_chars, s.mean_val, s.median_val,
       s.min_val, s.max_val
FROM s JOIN m ON s.lang = m.lang AND m.rn = 1
ORDER BY s.lang
""")
def mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate `Aggregate` over a numeric (int) property: per group
    (lang), the full property census Weaviate returns — count, MODE
    (most frequent value; ties resolve to the smallest, pinned on
    both engines rather than left to engine whim), mean, exact
    interpolated median, min, max. Completes the numeric side of the
    Aggregate API beside the text side's `top_occurrences_agg`.

    Scale shape: the mode needs the value histogram — ONE
    (group, value) partial-agg shuffle, then a per-group
    WindowGroupLimit-prunable rank over |distinct values| rows; the
    moment census is a second partial agg over the same scan (mean
    from exact integer sums; the exact median is the sf-scale
    oracle-checked form — at 100 TB swap in percentile_approx, the
    documented sketch path of the percentile family)."""
    docs = tables.load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W
    c = docs.groupBy("lang", "n_chars").agg(F.count("*").alias("cnt"))
    m = (c.withColumn("rn", F.row_number().over(
            W.partitionBy("lang").orderBy(F.desc("cnt"), "n_chars")))
          .where(F.col("rn") == 1)
          .select("lang", F.col("n_chars").alias("mode_n_chars")))
    s = (docs.groupBy("lang")
             .agg(F.count("*").alias("n_docs"),
                  F.round(F.sum("n_chars").cast("double")
                          / F.count("*"), 6).alias("mean_val"),
                  F.round(F.median("n_chars"), 6).alias("median_val"),
                  F.min("n_chars").alias("min_val"),
                  F.max("n_chars").alias("max_val")))
    return (s.join(m, "lang")
             .select("lang", "n_docs", "mode_n_chars", "mean_val",
                     "median_val", "min_val", "max_val")
             .orderBy("lang"))


# --------------------------------- significant_terms background_filter

SBF_LANG = "en"          # foreground: docs matching the query
SBF_MIN_CHARS = 200      # background_filter: the comparison scope
SBF_TOP = 10


@register("sigterms_background_filter", oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id, lang, n_chars,
         unnest(list_filter(string_split(trim(text), ' '), t -> t <> ''))
           AS token
  FROM documents),
tot AS (
  SELECT count(*) FILTER (lang = '{SBF_LANG}') AS nfg,
         count(*) FILTER (n_chars >= {SBF_MIN_CHARS}) AS nbg
  FROM documents),
tc AS (
  SELECT token,
         sum(CASE WHEN lang = '{SBF_LANG}' THEN 1 ELSE 0 END) AS fg_docs,
         sum(CASE WHEN n_chars >= {SBF_MIN_CHARS} THEN 1 ELSE 0 END)
           AS bg_docs
  FROM dt GROUP BY token)
SELECT token, CAST(fg_docs AS BIGINT) AS fg_docs,
       CAST(bg_docs AS BIGINT) AS bg_docs,
       round((fg_docs * 1.0 / nfg - bg_docs * 1.0 / nbg)
             * (fg_docs * 1.0 / nfg) / (bg_docs * 1.0 / nbg), 6)
         AS jlh_score
FROM tc, tot
WHERE fg_docs >= 2 AND bg_docs > 0
ORDER BY jlh_score DESC, token LIMIT {SBF_TOP}
""")
def sigterms_background_filter(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """ES `significant_terms` with a `background_filter`: significance
    is measured against a SCOPED background set (here docs with
    n_chars >= {SBF_MIN_CHARS}) instead of the whole index — the ES
    knob for "unusual vs comparable documents, not vs everything"
    (e.g. crime types vs the same city, not vs the country). Same JLH
    heuristic as the unfiltered family; only the background doc
    frequencies and total change.

    Scale shape: identical to significant_text — ONE distinct
    (doc, token) explode with BOTH memberships as map-side flags
    folded in a single vocab-keyed partial agg; the 2-value totals
    frame broadcasts into the score projection. The background filter
    adds zero passes."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    dt = (docs.select("doc_id", "lang", "n_chars",
                      F.explode(tokens("text")).alias("token"))
              .distinct())
    tot = docs.agg(
        F.count_if(F.col("lang") == SBF_LANG).alias("nfg"),
        F.count_if(F.col("n_chars") >= SBF_MIN_CHARS).alias("nbg"))
    tc = (dt.groupBy("token")
            .agg(F.sum(F.when(F.col("lang") == SBF_LANG, 1).otherwise(0))
                  .alias("fg_docs"),
                 F.sum(F.when(F.col("n_chars") >= SBF_MIN_CHARS, 1)
                        .otherwise(0)).alias("bg_docs")))
    fgr = F.col("fg_docs") / F.col("nfg")
    bgr = F.col("bg_docs") / F.col("nbg")
    return (tc.crossJoin(F.broadcast(tot))
              .where((F.col("fg_docs") >= 2) & (F.col("bg_docs") > 0))
              .select("token",
                      F.col("fg_docs").cast("long").alias("fg_docs"),
                      F.col("bg_docs").cast("long").alias("bg_docs"),
                      F.round((fgr - bgr) * fgr / bgr, 6)
                       .alias("jlh_score"))
              .orderBy(F.desc("jlh_score"), "token").limit(SBF_TOP))


# --------------------------- terms agg doc_count_error_upper_bound

TSE_SHARDS = 4
TSE_SHARD_SIZE = 8
TSE_TOP = 5


@register("terms_shard_error", oracle=f"""
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(trim(text), ' '), t -> t <> ''))
           AS token
  FROM documents),
sh AS (
  SELECT token,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % {TSE_SHARDS} AS shard
  FROM dt),
c AS (SELECT shard, token, count(*) AS cnt FROM sh GROUP BY 1, 2),
r AS (SELECT shard, token, cnt,
             row_number() OVER (PARTITION BY shard
                                ORDER BY cnt DESC, token) AS rn
      FROM c),
kept AS (SELECT * FROM r WHERE rn <= {TSE_SHARD_SIZE}),
lasts AS (SELECT shard, min(cnt) AS last FROM kept GROUP BY shard),
tl AS (SELECT sum(last) AS total_last FROM lasts),
merged AS (
  SELECT k.token, sum(k.cnt) AS est, sum(l.last) AS covered
  FROM kept k JOIN lasts l USING (shard) GROUP BY k.token),
truec AS (SELECT token, count(*) AS true_cnt FROM sh GROUP BY token)
SELECT m.token AS term, CAST(m.est AS BIGINT) AS doc_count,
       CAST(tl.total_last - m.covered AS BIGINT)
         AS doc_count_error_upper_bound,
       CAST(t.true_cnt AS BIGINT) AS true_count
FROM merged m JOIN truec t ON m.token = t.token, tl
ORDER BY m.est DESC, m.token LIMIT {TSE_TOP}
""")
def terms_shard_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES distributed `terms` aggregation APPROXIMATION CONTRACT,
    reproduced and reported: each shard returns only its local top
    `shard_size` terms, the coordinator merges, and every returned
    bucket carries `doc_count_error_upper_bound` — the sum of the
    LAST (smallest) reported count of every shard that did NOT
    report the term, the worst case it could have missed. The true
    count is computed alongside, so the hash row pins the inequality
    the contract promises: est ≤ true ≤ est + bound (also pinned in
    tests). This is the semantics every user of a sharded terms agg
    must understand before trusting its counts — made explicit here
    because at 100 TB the per-shard cut is not optional.

    Scale shape: shard routing is the map-side md5 the real cluster
    uses; per-shard counts are one (shard, term) partial agg; the
    per-shard top cut is a WindowGroupLimit-prunable rank bounded by
    shard_size; the coordinator merge and the |shards|-row lasts
    frame are broadcast-sized. The exact true count costs one more
    vocab-keyed agg over the same frame (sf-scale check; a real
    cluster doesn't pay it — that's the point of the bound)."""
    from pyspark.sql import Window as W

    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    from ..functions.hashing import md5_int32
    dt = (docs.select("doc_id", F.explode(tokens("text")).alias("token"))
              .distinct())
    sh = dt.select(
        "token",
        (md5_int32(F.col("doc_id").cast("string")) % TSE_SHARDS)
        .alias("shard"))
    c = sh.groupBy("shard", "token").agg(F.count("*").alias("cnt")) \
          .localCheckpoint(eager=False)
    rn = F.row_number().over(
        W.partitionBy("shard").orderBy(F.desc("cnt"), "token"))
    kept = c.withColumn("rn", rn).where(F.col("rn") <= TSE_SHARD_SIZE)
    lasts = kept.groupBy("shard").agg(F.min("cnt").alias("last"))
    tl = lasts.agg(F.sum("last").alias("total_last"))
    merged = (kept.join(F.broadcast(lasts), "shard")
                  .groupBy("token")
                  .agg(F.sum("cnt").alias("est"),
                       F.sum("last").alias("covered")))
    truec = c.groupBy("token").agg(F.sum("cnt").alias("true_cnt"))
    return (merged.join(truec, "token").crossJoin(F.broadcast(tl))
            .select(F.col("token").alias("term"),
                    F.col("est").cast("long").alias("doc_count"),
                    (F.col("total_last") - F.col("covered")).cast("long")
                     .alias("doc_count_error_upper_bound"),
                    F.col("true_cnt").cast("long").alias("true_count"))
            .orderBy(F.desc("doc_count"), "term").limit(TSE_TOP))
