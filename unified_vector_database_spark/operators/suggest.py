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

from pyspark.sql import DataFrame, SparkSession, functions as F

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
