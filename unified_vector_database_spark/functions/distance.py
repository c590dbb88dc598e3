"""Vector distance/similarity as JVM-side Column expressions.

These mirror the metrics every reference backend exposes (cosine /
dot / L2 — e.g. Milvus metric_type IP|L2|COSINE, Qdrant Distance,
Weaviate distance; reference README.md:3-9 backends). All math runs
in double precision, accumulated in array-index order, which makes
the results bit-identical to DuckDB's list_dot_product /
list_cosine_similarity / list_distance — the correctness oracle.

No Python UDFs: `F.aggregate` / `F.zip_with` evaluate inside the JVM,
so a knn scan stays a single map stage with no serialization wall.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def vec_double(col: Column | str) -> Column:
    """Cast array<float> -> array<double> (oracle-exact arithmetic)."""
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def safe_div(num: Column, den: Column) -> Column:
    """Division that yields NULL on a zero divisor — Spark ANSI mode
    would otherwise THROW on degenerate (zero-norm) vectors, while
    DuckDB yields NULL; try_divide is the exact DuckDB twin and is
    bit-identical to plain division for every nonzero divisor."""
    return F.try_divide(num, den)


def cosine(a: Column | str, b: Column | str) -> Column:
    # Divide form dot/(sqrt(na)*sqrt(nb)). Oracles must spell this out
    # with list_dot_product rather than call list_cosine_similarity:
    # DuckDB's builtin uses a fused accumulation that drifts by 1 ulp
    # on some pairs (verified exhaustively on 25k pairs — the explicit
    # form is bit-identical between engines, the builtin is not).
    return safe_div(dot(a, b), norm(a) * norm(b))


def l2(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column | str) -> Column:
    """Unit-normalize a vector (pre-normalized corpora turn cosine knn
    into a pure dot product — one multiply-add per dim)."""
    n = norm(a)
    return F.transform(_c(a), lambda x: x / n)


METRICS = {"cosine": cosine, "dot": dot, "l2": l2}
# Higher-is-closer for cosine/dot; lower-is-closer for l2.
ASCENDING = {"cosine": False, "dot": False, "l2": True}


def l1(a: Column | str, b: Column | str) -> Column:
    """Manhattan/taxicab distance (pgvector `<+>`, Milvus L1): the
    same left fold as dot/l2. The oracle twin is
    list_dot_product(absdiffs, ones) — each |d_i|·1.0 term is exact,
    so the sequential dot IS the fold, bit-for-bit."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
