"""Invariant tests for the retrieval / training-ML operators (round 5,
fifth session) — properties the oracle differential can't state
directly: monotonicity across iterations, one-sided sketch error,
ledger conservation, top-k shape. Oracle value-parity itself runs in
test_oracle_parity.py like every registered key.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from net7_etl_bus_spark.plans import registry

from .conftest import SF_SMALL

Q = registry.queries()


def test_tfidf_topk_shape(spark):
    rows = Q["text_tfidf_topk"](spark, SF_SMALL).collect()
    per_doc = Counter(r.doc_id for r in rows)
    assert max(per_doc.values()) <= 5
    # within a doc, scores are emitted non-increasing
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.score_q)
    for doc, scores in by_doc.items():
        assert scores == sorted(scores, reverse=True), doc


def test_bm25_ranks_are_dense_and_unique_per_query(spark):
    rows = Q["text_bm25_search"](spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rk, r.score_q))
    for qid, rs in by_q.items():
        rks = [rk for rk, _ in sorted(rs)]
        assert rks == list(range(1, len(rks) + 1)), (qid, rks)
        scores = [s for _, s in sorted(rs)]
        assert scores == sorted(scores, reverse=True), (qid, scores)
        assert len(rs) <= 10


def test_bm25_score_survives_int64_overflow_regime(spark):
    """The BM25 numerator (~4.4e7 * N * tf * T) wraps int64 at sizes
    the scalecheck battery reaches (N~2e4, T~2e6, tf>=6). The score
    expression computes in DECIMAL(38,0), so it must equal Python's
    arbitrary-precision floor division at exactly that regime — a
    wrapped int64 would come out negative or wildly off."""
    from net7_etl_bus_spark.operators.text import _TFIDF_Q

    cases = [
        # (tf, df, dl, n, t) — first is the documented wrap point
        (6, 5, 100, 20_000, 2_000_000),
        (10, 5, 100, 20_000, 2_000_000),
        (1_000, 37, 5_000, 100_000, 50_000_000),
        (1, 1, 1, 2, 2),
    ]
    df = spark.createDataFrame(
        cases, "tf bigint, df bigint, dl bigint, n bigint, t bigint"
    )
    got = [
        r.sq
        for r in df.select(
            F.expr(
                f"(CAST({_TFIDF_Q} AS DECIMAL(38,0))"
                f" * (2*n - 2*df + 1) * 22 * tf * t)"
                f" div (CAST(2*df + 1 AS DECIMAL(38,0))"
                f" * (CAST(10 AS DECIMAL(38,0))*tf*t + 3*t + 9*dl*n))"
            ).cast("bigint").alias("sq")
        ).collect()
    ]
    want = [
        (_TFIDF_Q * (2 * n - 2 * d + 1) * 22 * tf * t)
        // ((2 * d + 1) * (10 * tf * t + 3 * t + 9 * dl * n))
        for tf, d, dl, n, t in cases
    ]
    assert got == want
    assert all(s > 0 for s in got)
    # and the first case genuinely overflows int64 without the decimal
    tf, d, dl, n, t = cases[0]
    assert _TFIDF_Q * (2 * n - 2 * d + 1) * 22 * tf * t > 2**63 - 1


def test_bpe_train_winner_counts_non_increasing(spark):
    """A merge can only create pairs whose count is bounded by the
    merged pair's count, so each round's winning frequency is <= the
    previous round's — the convergence signal a tokenizer trainer
    watches."""
    rows = sorted(Q["text_bpe_train"](spark, SF_SMALL).collect(),
                  key=lambda r: r.round)
    assert [r.round for r in rows] == [1, 2, 3]
    counts = [r.pair_n for r in rows]
    assert counts == sorted(counts, reverse=True), counts
    for r in rows:
        assert r.x and r.y and r.pair_n > 0


def test_kmeans_inertia_non_increasing_across_rounds(spark):
    """Lloyd's decreases total within-cluster distance every round
    (exactly, up to the documented 2^-14 centroid quantization — allow
    that slack scaled by corpus size). Recompute assignments/inertia
    for round-1 (seed) and round-3 (trained) centroids."""
    import numpy as np

    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.similarity import _KM_DIM, _KM_K, _KM_Q

    e = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    vecs = np.array(
        [r.embedding for r in e.select("embedding").collect()], dtype=np.float64
    )
    xq = np.floor(vecs * _KM_Q).astype(np.int64)
    ids = [r.vec_id for r in e.select("vec_id").collect()]
    id_to_row = {v: i for i, v in enumerate(ids)}
    seed_mat = np.stack([xq[id_to_row[v]] for v in range(_KM_K)])

    trained = Q["emb_kmeans_train"](spark, SF_SMALL).collect()
    by_cid = {}
    for r in trained:
        by_cid.setdefault(r.cid, [0] * _KM_DIM)[r.d - 1] = r.c_q
    trained_mat = np.stack([np.array(v) for _, v in sorted(by_cid.items())])

    def inertia(cent):
        d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    i0, i3 = inertia(seed_mat), inertia(trained_mat)
    slack = xq.shape[0] * _KM_DIM * 4  # quantized-mean rounding headroom
    assert i3 <= i0 + slack, (i0, i3)


def test_semdedup_ledger_conserves_members(spark):
    rows = Q["emb_semdedup"](spark, SF_SMALL).collect()
    assert rows, "no clusters"
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_members, r
        assert r.n_kept >= 1, r  # every cluster keeps a representative


def test_cms_estimate_is_one_sided(spark):
    rows = Q["agg_cms_heavy_hitters"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.est_n >= r.exact_n, r
        assert r.overestimate == r.est_n - r.exact_n, r


def test_triangle_counts_sum_divisible_by_three(spark):
    rows = Q["graph_triangle_count"](spark, SF_SMALL).collect()
    total = sum(r.n_triangles for r in rows)
    assert total % 3 == 0, total
    assert all(r.n_triangles >= 1 for r in rows)


def test_semdedup_accepts_trained_centroids(spark):
    """Pin the documented production swap: cluster assignment under
    emb_kmeans_train's TRAINED centroids (reshaped long->array, scaled
    back from the 2^14 quantization) uses the identical broadcast-join
    + argmin machinery and yields a complete, conservation-correct
    partition of the corpus — no plan shape changes, only the centroid
    relation's provenance."""
    from pyspark.sql import Window

    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.similarity import _KM_Q, _cosine

    trained = (
        Q["emb_kmeans_train"](spark, SF_SMALL)
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "c_q"))),
                lambda s: s.c_q.cast("double") / F.lit(_KM_Q),
            ).alias("cent_emb")
        )
    )
    e = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
        & ~F.exists("embedding", lambda y: F.isnan(y.cast("double")))
    )
    ac = e.crossJoin(F.broadcast(trained)).withColumn(
        "cos_c", _cosine(F.col("embedding"), F.col("cent_emb"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), "cid")
    assign = ac.withColumn("rkc", F.row_number().over(w)).filter(
        F.col("rkc") == 1
    )
    n_corpus = e.count()
    n_assigned = assign.count()
    assert n_assigned == n_corpus, (n_assigned, n_corpus)
    # plan shape: same broadcast nested-loop (K-row build) + WindowGroupLimit
    plan = spark._jvm.PythonSQLUtils.explainString(
        assign._jdf.queryExecution(), "simple"
    )
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def _semdedup_vectors(spark):
    from net7_etl_bus_spark.data import load_table

    e = load_table(spark, SF_SMALL, "embeddings").filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & ~F.exists(
            "embedding",
            lambda y: F.isnan(y.cast("double"))
            | (F.abs(y.cast("double")) == F.lit(float("inf"))),
        )
    )
    norm2 = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    )
    return e.filter(norm2 > 0).select("vec_id", "embedding")


def test_semdedup_frame_matches_registry_on_seed_centroids(spark):
    """semdedup_frame is the production entry point (trained, scaled
    centroids); fed the registry key's own 16 seed centroids it must
    be the registry key — same plan, same ledger, row for row."""
    from net7_etl_bus_spark.operators.similarity import (
        CENT_LO,
        N_CENTROIDS,
        semdedup_frame,
    )

    fe = _semdedup_vectors(spark)
    cent = fe.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_LO + N_CENTROIDS)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cent_emb"))
    got = sorted(map(tuple, semdedup_frame(fe, cent).collect()))
    want = sorted(map(tuple, Q["emb_semdedup"](spark, SF_SMALL).collect()))
    assert got == want


def test_semdedup_frame_scaled_k_shrinks_pair_term(spark):
    """The scale contract semdedup_frame exists for (r9 ladder: the
    fixed-K=16 registry key measured exponent 1.15 under sf0.1->sf1
    growth — the (n/K)^2 pair term taking over): scaling K with n
    holds cluster size flat. At the limit K=n (every vector its own
    centroid) every cluster is a singleton-or-duplicate-group, the
    pair term vanishes, and nothing is dropped; members conservation
    holds under ANY centroid set."""
    from net7_etl_bus_spark.operators.similarity import semdedup_frame

    fe = _semdedup_vectors(spark)
    n = fe.count()
    self_cent = fe.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cent_emb")
    )
    ledger = semdedup_frame(fe, self_cent).collect()
    assert sum(r.n_members for r in ledger) == n  # conservation, any K
    # singletons everywhere (the synthetic vectors have distinct
    # directions, so each wins its own centroid) => zero pair work
    assert all(r.n_members == 1 and r.n_dropped == 0 for r in ledger), [
        r for r in ledger if r.n_members != 1
    ][:5]


def test_lm_score_self_scoring_semantics(spark):
    """text_lm_score invariants beyond the oracle hash, including the
    documented SELF-SCORING caveat: (1) an all-unique-words doc scores
    exactly 1e6 — every hapax bigram's w1 has a single continuation,
    P=1 — while a doc whose repeated 'the' splits mass across two
    continuations scores strictly below it (this is WHY production
    gibberish filtering trains the LM on a reference corpus; the
    docstring states the contract and this test pins the behavior);
    (2) docs with <2 effective tokens stay in the ledger with
    n_bigrams=0 and NULL score; (3) n_bigrams equals tokens-1 for
    clean docs."""
    import tempfile

    from net7_etl_bus_spark.plans import registry

    boiler = "the cat sat on the mat " * 20
    rows = [
        (1, boiler.strip(), "en", "src0", len(boiler)),
        (2, "zeta omega kappa lambda sigma", "en", "src0", 29),
        (3, "one", "en", "src0", 3),
        (4, "", "en", "src0", 0),
        (5, None, "en", "src0", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        got = {
            r.doc_id: r
            for r in registry.queries()["text_lm_score"](spark, td).collect()
        }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1].n_bigrams == 6 * 20 - 1
    assert got[2].n_bigrams == 4
    assert got[2].score_q == 1_000_000       # hapax bigrams: P = 1 each
    assert got[1].score_q < got[2].score_q   # 'the' mass splits 3 ways
    assert got[1].score_q > 500_000          # but still mostly predictable
    for short_id in (3, 4, 5):
        assert got[short_id].n_bigrams == 0
        assert got[short_id].score_q is None


def test_bpe_encode_hand_corpus(spark, tmp_path):
    """text_bpe_encode semantics on a corpus small enough to run BPE by
    hand. Words: ab(x2), cd(x1), abcd(x1). Round-1 pair counts:
    (a,b)=3, (c,d)=2, (b,c)=1 -> merge (a,b); round 2 -> (c,d);
    round 3 -> (ab,cd). Encodings therefore: 'ab'->[ab], 'cd'->[cd],
    'abcd'->[abcd] — the third merge only exists because the first two
    were applied IN RANK ORDER, so this pins transitive merge
    application, not just counting."""
    docs = spark.createDataFrame(
        [(1, "ab ab cd"), (2, "abcd"), (3, None)],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in Q["text_bpe_encode"](spark, str(tmp_path)).collect()}
    assert rows[1].n_words == 3 and rows[1].n_tokens == 3
    assert rows[2].n_words == 1 and rows[2].n_tokens == 1
    assert rows[3].n_words == 0 and rows[3].n_tokens == 0
    assert rows[3].tokens_fp is None
    # identical token streams -> identical fingerprints, and the
    # single-word doc's stream differs from the three-word doc's
    assert rows[1].tokens_fp is not None and rows[2].tokens_fp is not None
    assert rows[1].tokens_fp != rows[2].tokens_fp


def test_bpe_encode_ledger_bounds_real_corpus(spark):
    """Fixture-corpus invariants: every doc appears once; a word is at
    least one subtoken (n_tokens >= n_words) and a subtoken is at
    least one char (sum n_tokens <= sum non-space chars); fingerprint
    present exactly when the doc has words; and the BPE count is never
    ABOVE the unmerged per-char count, i.e. merges only shrink."""
    from net7_etl_bus_spark.data import load_table

    rows = Q["text_bpe_encode"](spark, SF_SMALL).collect()
    docs = load_table(spark, SF_SMALL, "documents")
    assert len(rows) == docs.count()
    assert all(r.n_tokens >= r.n_words for r in rows)
    assert all((r.tokens_fp is None) == (r.n_words == 0) for r in rows)
    n_chars = docs.select(
        F.sum(
            F.length(F.regexp_replace(F.lower(F.trim("text")), " ", ""))
        ).alias("c")
    ).collect()[0].c
    total_tokens = sum(r.n_tokens for r in rows)
    assert 0 < total_tokens <= n_chars
    # merges actually fired on the fixture (some word got compressed)
    total_words = sum(r.n_words for r in rows)
    assert total_tokens < n_chars or total_tokens == total_words


def test_bpe_encode_frame_matches_registry_op(spark):
    """The fixed-artifact apply path (bpe_encode_frame: collected merge
    table + Arrow-batched per-distinct-word Python) must be
    bit-identical to the registry op (chained literal replaces in
    Catalyst) when fed the merges text_bpe_train learns on the same
    corpus — pinning that Python str.replace and Spark replace() agree
    on the left-to-right non-overlapping scan, rank order included."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import bpe_encode_frame

    docs = load_table(spark, SF_SMALL, "documents")
    merges = Q["text_bpe_train"](spark, SF_SMALL)
    got = {r.doc_id: r for r in bpe_encode_frame(docs, merges).collect()}
    want = {r.doc_id: r for r in Q["text_bpe_encode"](spark, SF_SMALL).collect()}
    assert got == want


def test_bpe_encode_frame_external_merges(spark):
    """An externally-authored merge table (never trained here) applies
    in rank order, including the back-to-back-repeat contract
    (' a a a a ' -> ' aa a a ': replace consumes its match, so 'aaaa'
    -> [aa, a, a] with a single (a,a) merge, NOT [aa, aa])."""
    from net7_etl_bus_spark.operators.text import bpe_encode_frame

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab abab"), (3, "")],
        "doc_id long, text string",
    )
    merges = spark.createDataFrame(
        [(1, "a", "a"), (2, "a", "b"), (3, "ab", "ab")],
        "round int, x string, y string",
    )
    rows = {r.doc_id: r for r in bpe_encode_frame(docs, merges).collect()}
    # 'aaaa' -> ' aa a a ' under merge 1 only (no (aa,a)/(a,a) rescan)
    assert rows[1].n_words == 1 and rows[1].n_tokens == 3
    # 'ab' -> [ab]; 'abab' -> [ab, a, b]: the first ' a b ' replace
    # consumes the shared delimiter space, so the second (a,b) pair
    # never matches and merge 3's ' ab ab ' never forms — the same
    # deviation-from-greedy-on-repeats contract as doc 1, here shown
    # blocking a DEPENDENT higher-rank merge
    assert rows[2].n_words == 2 and rows[2].n_tokens == 4
    assert rows[3].n_words == 0 and rows[3].tokens_fp is None


def test_bpe_encode_frame_over_cap_raises(spark):
    """The merge-table collect is bounded: an over-cap table raises at
    plan-construction time instead of OOMing the driver."""
    import pytest

    from net7_etl_bus_spark.operators.text import bpe_encode_frame

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    merges = spark.createDataFrame(
        [(i, "a", "b") for i in range(5)], "round int, x string, y string"
    )
    with pytest.raises(ValueError, match="max_merges"):
        bpe_encode_frame(docs, merges, max_merges=4)
