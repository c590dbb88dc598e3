"""Text column functions (tokenization, shingles) shared by the BM25 /
dedup / text-analysis operators. Tokenization semantics are fixed and
deliberately minimal — split on single spaces after trim, drop empty —
so the DuckDB oracle (string_split + list_filter) is exactly
equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import Window as W


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), " "), lambda t: t != "")


def exploded_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) long form."""
    return df.select(
        id_col, F.posexplode(tokens(text_col)).alias("pos", "token"))


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """(id, shingle) word n-grams via window lead — a set-based shingle
    builder that is shuffle-partitioned by document id (uniform), so it
    scales linearly with corpus size."""
    tok = exploded_tokens(df, id_col, text_col)
    w = W.partitionBy(id_col).orderBy("pos")
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    sh = tok.select(id_col, F.concat_ws(" ", *parts).alias("shingle"),
                    parts[-1].alias("_last"))
    return sh.where(F.col("_last").isNotNull()).drop("_last")


def ngram_array(text_col: Column | str, n: int) -> Column:
    """Distinct word n-grams as an array, built map-side with
    slice+zip — no explode, and no sequence(1, 0) descending-range
    pitfall (a slice of length 0 is just empty)."""
    toks = tokens(text_col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    return F.array_distinct(
        F.transform(zipped, lambda s: F.concat_ws(
            " ", *[s.getField(str(i)) for i in range(n)])))
