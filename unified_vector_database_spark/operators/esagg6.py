"""Payload-filter and geo-grid surface, r8 wave: ES `exists` /
Qdrant `is_empty`+`is_null` payload conditions, the Milvus ARRAY
field filter family (`array_contains` / `array_contains_any` /
`array_contains_all` / `array_length`), and a hexagonal geo grid
(the ES `geohex_grid` aggregation's shape).

Reference parity: ES `exists` query and the Qdrant
`is_empty`/`is_null` payload conditions (the null-semantics trio
every payload store exposes); Milvus ARRAY-field filtering
(array_contains family + array_length, the typed-array payload
surface); ES `geohex_grid` — implemented as an axial flat-top
hexagon lattice on the planar coordinate field at a fixed cell size,
NOT H3 (H3's icosahedral sphere indexing needs the H3 library; the
aggregation semantics — points bucketed into hex cells, counts per
cell key — are identical, and the docstring says so rather than
pretending H3 parity).

Scale shapes: all three are map-side column math in the scan stage
feeding ONE partial-agg shuffle of bucket-cardinality rows —
identical posture to geotile/geohash beside them. No UDF, no
explode; the hex cube-rounding is a fixed CASE ladder.

Float determinism: hex axial coords are products/sums of the
rational synthetic lattice with INLINED double literals (sqrt(3)/3
precomputed in Python, so both engines consume the same bit
pattern); floor(v + 0.5) replaces round() to avoid engine-specific
tie modes; every IEEE op used (+,-,*,/,floor,abs) is exactly
specified, so the cell keys are bit-identical across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import tables
from ..functions.text import tokens
from ..registry import register

_TOK = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

# ------------------------------------------------- exists / is_empty

EX_NOTE_MARK = "red"        # p_name substring that yields a note
EX_TAG_MINLEN = 5           # name tokens this long become tags


@register("exists_payload_filter", oracle=f"""
WITH p AS (
  SELECT p_type,
         CASE WHEN p_name LIKE '%{EX_NOTE_MARK}%' THEN p_name
              END AS note,
         list_filter(string_split(p_name, ' '),
                     t -> len(t) >= {EX_TAG_MINLEN}) AS tags
  FROM part)
SELECT p_type,
       count(*) AS n_total,
       count(note) AS n_note_exists,
       count(*) - count(note) AS n_note_null,
       CAST(sum(CASE WHEN len(tags) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tags_empty
FROM p GROUP BY p_type ORDER BY p_type
""")
def exists_payload_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `exists` query + Qdrant `is_empty`/`is_null` payload
    conditions as a per-type census over a derived payload view:
    `note` is a nullable field (present only when the part name
    mentions '{EX_NOTE_MARK}'), `tags` a possibly-empty array field
    (name tokens of length ≥ {EX_TAG_MINLEN}). `n_note_exists` is
    the ES `exists` count, `n_note_null` its `must_not exists` /
    Qdrant `is_null` complement, `n_tags_empty` Qdrant's `is_empty`
    (no values present). One scan, map-side derivation, one
    partial-agg shuffle of |types| rows."""
    part = tables.load(spark, sf_dir, "part")
    note = F.when(F.col("p_name").contains(EX_NOTE_MARK),
                  F.col("p_name"))
    tags = F.filter(F.split(F.col("p_name"), " "),
                    lambda t: F.length(t) >= EX_TAG_MINLEN)
    p = part.select("p_type", note.alias("note"), tags.alias("tags"))
    return (p.groupBy("p_type")
             .agg(F.count("*").alias("n_total"),
                  F.count("note").alias("n_note_exists"),
                  (F.count("*") - F.count("note")).alias("n_note_null"),
                  F.sum(F.when(F.size("tags") == 0, 1).otherwise(0))
                   .cast("long").alias("n_tags_empty"))
             .orderBy("p_type"))


# --------------------------------------------------- array_contains family

AC_HEAD = 8                      # the ARRAY field = first 8 tokens, distinct
AC_ONE = "data"
AC_ANY = ("vector", "merge")
AC_ALL = ("key", "row")
AC_MINLEN = 6


@register("array_contains_filter", oracle=f"""
WITH a AS (
  SELECT lang, list_distinct(list_slice({_TOK}, 1, {AC_HEAD})) AS tags
  FROM documents)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN list_contains(tags, '{AC_ONE}')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_contains,
       CAST(sum(CASE WHEN list_has_any(tags, {list(AC_ANY)!r})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
       CAST(sum(CASE WHEN list_has_all(tags, {list(AC_ALL)!r})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
       CAST(sum(CASE WHEN len(tags) >= {AC_MINLEN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_len
FROM a GROUP BY lang ORDER BY lang
""")
def array_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Milvus ARRAY-field filter family over a derived typed-array
    payload (`tags` = the distinct head-{AC_HEAD} tokens of each
    doc): per-language counts of docs passing `array_contains(tags,
    '{AC_ONE}')`, `array_contains_any(tags, {AC_ANY})`,
    `array_contains_all(tags, {AC_ALL})`, and `array_length(tags) >=
    {AC_MINLEN}` — the four operators Milvus exposes on ARRAY
    payload fields (Qdrant spells the first `MatchAny` on a keyword
    array). All membership math is map-side array ops in the scan
    stage; one partial-agg shuffle of |langs| rows."""
    docs = tables.load(spark, sf_dir, "documents")
    tags = F.array_distinct(F.slice(tokens("text"), 1, AC_HEAD))
    a = docs.select("lang", tags.alias("tags"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return (a.groupBy("lang")
             .agg(F.count("*").alias("n_total"),
                  flag(F.array_contains("tags", AC_ONE)).alias("n_contains"),
                  flag(F.arrays_overlap(
                      "tags", F.array(*[F.lit(t) for t in AC_ANY])))
                   .alias("n_any"),
                  flag(F.array_contains("tags", AC_ALL[0])
                       & F.array_contains("tags", AC_ALL[1]))
                   .alias("n_all"),
                  flag(F.size("tags") >= AC_MINLEN).alias("n_len"))
             .orderBy("lang"))


# ------------------------------------------------------------ geohex_grid

HEX_SIZE = 7.0                       # cell size in degrees (flat-top)
_SQRT3_3 = math.sqrt(3.0) / 3.0      # inlined so both engines share bits
HEX_TOP = 20

_HEX_COORD_SQL = f"""
  SELECT (2.0e0 / 3.0e0 * lon) / {HEX_SIZE!r} AS q0,
         ((-1.0e0 / 3.0e0) * lon + {_SQRT3_3!r} * lat) / {HEX_SIZE!r} AS r0
  FROM (SELECT ((c_custkey * 9973) % 18000) / 100.0 - 90.0 AS lat,
               ((c_custkey * 7919) % 36000) / 100.0 - 180.0 AS lon
        FROM customer)"""


@register("geohex_grid_agg", oracle=f"""
WITH h AS ({_HEX_COORD_SQL}),
c AS (
  SELECT q0, r0, -q0 - r0 AS y0,
         CAST(floor(q0 + 0.5e0) AS DOUBLE) AS rx,
         CAST(floor(-q0 - r0 + 0.5e0) AS DOUBLE) AS ry,
         CAST(floor(r0 + 0.5e0) AS DOUBLE) AS rz
  FROM h),
f AS (
  SELECT CASE WHEN abs(rx - q0) > abs(ry - y0)
                AND abs(rx - q0) > abs(rz - r0)
              THEN CAST(-ry - rz AS BIGINT) ELSE CAST(rx AS BIGINT)
         END AS hq,
         CASE WHEN abs(rx - q0) > abs(ry - y0)
                AND abs(rx - q0) > abs(rz - r0) THEN CAST(rz AS BIGINT)
              WHEN abs(ry - y0) > abs(rz - r0) THEN CAST(rz AS BIGINT)
              ELSE CAST(-rx - ry AS BIGINT)
         END AS hr
  FROM c)
SELECT CAST(hq AS VARCHAR) || ',' || CAST(hr AS VARCHAR) AS cell,
       count(*) AS n
FROM f GROUP BY 1 ORDER BY n DESC, cell LIMIT {HEX_TOP}
""")
def geohex_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `geohex_grid`-shaped aggregation: customer points bucketed
    into a flat-top axial hexagon lattice (cell size {HEX_SIZE}° on
    the planar synthetic coordinates) via pixel→axial transform +
    cube rounding, counts per `q,r` cell key. NOT H3 — the library's
    icosahedral sphere indexing isn't reimplemented; the aggregation
    contract (hex binning, per-cell counts, top cells) is, and this
    docstring says which. Completes the geo-grid trio beside
    geotile_grid (Web-Mercator tiles) and geohash_grid (base-32
    cells).

    Scale shape: the cell key is pure JVM column math in the scan
    stage; ONE partial-agg shuffle of cell-cardinality rows."""
    from .geo import with_coords
    cust = with_coords(tables.load(spark, sf_dir, "customer"))
    q0 = (F.lit(2.0) / F.lit(3.0) * F.col("lon")) / F.lit(HEX_SIZE)
    r0 = ((F.lit(-1.0) / F.lit(3.0)) * F.col("lon")
          + F.lit(_SQRT3_3) * F.col("lat")) / F.lit(HEX_SIZE)
    c = cust.select(q0.alias("q0"), r0.alias("r0"),
                    (-q0 - r0).alias("y0"),
                    F.floor(q0 + F.lit(0.5)).cast("double").alias("rx"),
                    F.floor(-q0 - r0 + F.lit(0.5)).cast("double")
                     .alias("ry"),
                    F.floor(r0 + F.lit(0.5)).cast("double").alias("rz"))
    dx = F.abs(F.col("rx") - F.col("q0"))
    dy = F.abs(F.col("ry") - F.col("y0"))
    dz = F.abs(F.col("rz") - F.col("r0"))
    x_wins = (dx > dy) & (dx > dz)
    hq = F.when(x_wins, (-F.col("ry") - F.col("rz")).cast("long")) \
          .otherwise(F.col("rx").cast("long"))
    hr = F.when(x_wins, F.col("rz").cast("long")) \
          .when(dy > dz, F.col("rz").cast("long")) \
          .otherwise((-F.col("rx") - F.col("ry")).cast("long"))
    cell = F.concat(hq.cast("string"), F.lit(","), hr.cast("string"))
    return (c.select(cell.alias("cell"))
             .groupBy("cell").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), "cell").limit(HEX_TOP))


# ---------------------------------------------------- topOccurrences

TOPOCC_K = 3


@register("top_occurrences_agg", oracle=f"""
WITH tok AS (
  SELECT lang, unnest({_TOK}) AS term FROM documents),
c AS (SELECT lang, term, count(*) AS occurs
      FROM tok GROUP BY lang, term),
r AS (
  SELECT lang, term, occurs,
         row_number() OVER (PARTITION BY lang
                            ORDER BY occurs DESC, term) AS rank
  FROM c)
SELECT lang, CAST(rank AS INT) AS rank, term, occurs
FROM r WHERE rank <= {TOPOCC_K}
ORDER BY lang, rank
""")
def top_occurrences_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weaviate `aggregate` on a text property with `topOccurrences`
    (the {{value, occurs}} list Weaviate returns per group), grouped
    by `lang`: the top-{TOPOCC_K} most frequent tokens per language
    with their occurrence counts — the text-property twin of a terms
    sub-aggregation.

    Scale shape: ONE explode + (lang, term) partial-agg shuffle
    (map-side combined, uniform keys); the per-group top-k window
    runs on |langs × vocab| aggregated rows with WindowGroupLimit
    pruning rank ≤ k map-side before the final shuffle."""
    docs = tables.load_parallel(spark, sf_dir, "documents", "doc_id")
    from pyspark.sql import Window as W
    c = (docs.select("lang", F.explode(tokens("text")).alias("term"))
             .groupBy("lang", "term").agg(F.count("*").alias("occurs")))
    w = W.partitionBy("lang").orderBy(F.desc("occurs"), "term")
    return (c.withColumn("rank", F.row_number().over(w).cast("int"))
             .where(F.col("rank") <= TOPOCC_K)
             .select("lang", "rank", "term", "occurs")
             .orderBy("lang", "rank"))
