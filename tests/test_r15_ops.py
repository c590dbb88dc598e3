"""Round-6 r15-wave checks: streaming EQL state machine vs the batch
twin, PQ reconstruction-error census vs numpy, filtered aliases.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# -------------------------------------------- stream_eql_sequence

def test_stream_eql_equals_batch_twin(spark, sf_dir):
    """The union of update-mode emissions rolled into the day census
    must equal the batch window-function operator exactly — same
    matches, same spans."""
    from unified_vector_database_spark.operators.timeseries import (
        eql_sequence,
    )
    from unified_vector_database_spark.streaming.stateful import (
        stream_eql_sequence,
    )

    batch = [(r.day, r.n_sequences, r.n_users, r.avg_span_s)
             for r in eql_sequence(spark, sf_dir).collect()]
    stream = [(r.day, r.n_sequences, r.n_users, r.avg_span_s)
              for r in stream_eql_sequence(spark, sf_dir).collect()]
    assert len(batch) > 0
    assert stream == batch


def test_stream_eql_state_is_three_scalars():
    from unified_vector_database_spark.streaming.stateful import (
        EQL_STATE_SCHEMA,
    )

    assert [f.name for f in EQL_STATE_SCHEMA.fields] == \
        ["lv", "lc_ts", "lc_lv"]  # bounded O(1) per key forever


# -------------------------------------------- pq_reconstruct_error

def test_pq_reconstruction_error_matches_numpy(spark, duck, sf_dir):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.functions import distance as D
    from unified_vector_database_spark.operators.index import (
        PQ_M, pq_fit, pq_reconstruct_error,
    )

    emb = tables.load(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", D.vec_double("embedding").alias("vec"))
    cbs = pq_fit(corpus)
    x = np.array([r[0] for r in duck.execute(
        "SELECT embedding FROM embeddings ORDER BY vec_id").fetchall()],
        dtype=np.float64)
    dsub = x.shape[1] // PQ_M
    got = {r.subspace: r for r in
           pq_reconstruct_error(spark, sf_dir).collect()}
    assert set(got) == set(range(1, PQ_M + 1))
    for j in range(PQ_M):
        sub = x[:, j * dsub:(j + 1) * dsub]
        books = np.array(cbs[j])
        d2 = ((sub[:, None, :] - books[None, :, :]) ** 2).sum(axis=2)
        mins = np.round(d2.min(axis=1), 6)
        r = got[j + 1]
        assert r.mean_sq_err == pytest.approx(mins.mean(), abs=1e-6)
        assert r.max_sq_err == pytest.approx(mins.max(), abs=1e-6)
        assert r.mean_sq_err >= 0 and r.max_sq_err >= r.mean_sq_err


# ------------------------------------------------ filtered aliases

def test_filtered_alias_injects_predicate(spark, sf_dir, tmp_path):
    from unified_vector_database_spark import tables
    from unified_vector_database_spark.sources.catalog import Collection

    docs = tables.load(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "n_chars")
    base = str(tmp_path / "fa")
    c = Collection.create(spark, base, "docs", id_col="doc_id")
    c.upsert(docs)
    Collection.set_alias(base, "plain", "docs")
    Collection.set_alias(base, "en", "docs", filter_sql="lang = 'en'")
    allrows = Collection.read_alias(spark, base, "plain")
    en = Collection.read_alias(spark, base, "en")
    assert allrows.count() == docs.count()
    assert en.count() == docs.where(F.col("lang") == "en").count()
    assert en.where(F.col("lang") != "en").count() == 0
    # open_alias stays filter-agnostic and resolves both formats
    assert Collection.open_alias(spark, base, "en").name == "docs"
    assert Collection.open_alias(spark, base, "plain").name == "docs"


# ------------------------------------------------ terms_shard_error

def test_shard_error_bound_contract(spark, duck, sf_dir):
    """The ES promise: est <= true <= est + doc_count_error_upper_bound,
    and the bound is 0 for a term every shard reported."""
    from unified_vector_database_spark.operators.esagg7 import (
        TSE_SHARDS, terms_shard_error,
    )

    rows = terms_shard_error(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc_count <= r.true_count
        assert r.true_count <= r.doc_count + r.doc_count_error_upper_bound
        assert 0 <= r.doc_count_error_upper_bound


def test_shard_error_exact_when_all_shards_report(spark, duck, sf_dir):
    """With shard_size >= vocab, every shard reports every term: the
    merge must be exact (bound 0, est == true) — the small-index
    regime where ES's terms agg IS exact."""
    import hashlib

    from unified_vector_database_spark.operators.esagg7 import TSE_SHARDS

    rows = duck.execute("""
        WITH dt AS (SELECT DISTINCT doc_id,
            unnest(list_filter(string_split(trim(text), ' '),
                   t -> t <> '')) AS token FROM documents)
        SELECT doc_id, token FROM dt""").fetchall()
    import collections
    per_shard = collections.defaultdict(collections.Counter)
    total = collections.Counter()
    for doc_id, token in rows:
        s = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) \
            % TSE_SHARDS
        per_shard[s][token] += 1
        total[token] += 1
    # full merge (no cut) is exact
    merged = collections.Counter()
    for s in per_shard.values():
        merged.update(s)
    assert merged == total


# ---------------------------------------------- stream_counter_rate

def test_stream_counter_rate_equals_batch_twin(spark, sf_dir):
    from unified_vector_database_spark.operators.timeseries import (
        counter_rate_resets,
    )
    from unified_vector_database_spark.streaming.stateful import (
        stream_counter_rate,
    )

    batch = [tuple(r) for r in counter_rate_resets(spark, sf_dir).collect()]
    stream = [tuple(r) for r in stream_counter_rate(spark, sf_dir).collect()]
    assert len(batch) > 0
    assert stream == batch


def test_stream_counter_rate_state_is_six_registers():
    from unified_vector_database_spark.streaming.stateful import (
        RATE_STATE_SCHEMA,
    )
    assert len(RATE_STATE_SCHEMA.fields) == 6  # O(1) per series forever


# -------------------------------------------------- binary_ivf_knn

def test_binary_ivf_recall_vs_exact_hamming(spark, duck, sf_dir):
    """The probe must reach decent recall of the exact top-10 (by the
    same hamming-then-cosine protocol) while scanning only
    nprobe/k of the cells; and every returned id must belong to a
    probed cell."""
    from unified_vector_database_spark.operators.index import (
        BIVF_K, BIVF_NPROBE, _bivf_fit, _binary_kmeans, _pack_bits,
        binary_ivf_knn,
    )

    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    sigs = {vid: _pack_bits(e) for vid, e in rows}
    vecs = {vid: e for vid, e in rows}
    q = sigs[0]

    def hamming(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    import math
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(y * y for y in b)))

    exact_short = sorted(sigs, key=lambda v: (hamming(sigs[v], q), v))[:64]
    exact = sorted(exact_short,
                   key=lambda v: (-cos(vecs[v], vecs[0]), v))[:10]
    got = [r.vec_id for r in binary_ivf_knn(spark, sf_dir).collect()]
    assert len(got) == 10 and got[0] == 0  # self-match first
    assert len(set(got) & set(exact)) >= 5  # pruned probe, decent recall
    # membership: every returned id is in a probed cell
    cents = _bivf_fit(sf_dir)
    def cell(s):
        return min(range(BIVF_K),
                   key=lambda c: (hamming(s, cents[c]), c))
    qcells = sorted(range(BIVF_K),
                    key=lambda c: (hamming(q, cents[c]), c))[:BIVF_NPROBE]
    assert all(cell(sigs[v]) in qcells for v in got)


def test_binary_kmeans_majority_vote_is_deterministic():
    from unified_vector_database_spark.operators.index import (
        _binary_kmeans,
    )
    sigs = [(0b1010, 0), (0b1000, 0), (0b0010, 0), (0b0001, 1)]
    a = _binary_kmeans(sigs, 2, 3)
    b = _binary_kmeans(list(sigs), 2, 3)
    assert a == b
    # majority with the tie->set rule: cluster of {1010,1000,0010}
    # votes bit3: 2/3 set -> 1; bit1: 2/3 -> 1; centroid 1010
    assert (0b1010, 0) in a
