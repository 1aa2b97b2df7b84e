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
    # Load-bearing invariants only (ADVICE r9: with K=n self-centroids,
    # two vectors sharing an exact DIRECTION tie at cos=1.0 and the
    # (cos desc, cid) tie-break legitimately groups them — don't pin
    # all-singletons to a property of the current testdata). A non-
    # singleton cluster can only be an exact-direction tie group, whose
    # pairs are all >= tau, so everything but its cid-min is dropped.
    for r in ledger:
        assert r.n_kept + r.n_dropped == r.n_members
        if r.n_members == 1:
            assert r.n_dropped == 0
        else:
            assert r.n_kept == 1 and r.n_dropped == r.n_members - 1
    # the pair term still vanishes overall: clusters are duplicate
    # groups, so kept == number of distinct directions, not O(n/K)
    assert sum(r.n_kept for r in ledger) == len(ledger)


def test_semdedup_frame_cascade_degenerates_at_one_super(spark):
    """semdedup_frame's r11 scale knob: at scaled K its flat
    assignment argmin is the same n*K disease the r10 annladder
    measured on search, so the frame now takes n_super/super_cent.
    n_super=1 (the cascade ranking all K in tier 2) must reproduce
    the flat ledger row for row — exactness is a parameter choice,
    as on ivf_search_frame."""
    from net7_etl_bus_spark.operators.similarity import (
        CENT_LO,
        N_CENTROIDS,
        semdedup_frame,
    )

    fe = _semdedup_vectors(spark)
    cent = fe.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_LO + N_CENTROIDS)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cent_emb"))
    flat = sorted(map(tuple, semdedup_frame(fe, cent).collect()))
    hier = sorted(map(tuple, semdedup_frame(fe, cent, n_super=1).collect()))
    assert flat == hier


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


# --- arbitrary-K BPE training (bpe_train_frame, r10) -------------------


def test_bpe_train_frame_prefix_equals_registry_key(spark):
    """VERDICT r9 item 2 pin (a): the driver-loop trainer's first
    _BPE_ROUNDS winners are bit-identical to text_bpe_train's
    plan-level unrolled rounds — same pair counting, same
    (count desc, pair asc) total order, same literal-replace apply."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import _BPE_ROUNDS, bpe_train_frame

    docs = load_table(spark, SF_SMALL, "documents")
    got = [
        (r["round"], r.x, r.y, r.pair_n)
        for r in sorted(bpe_train_frame(docs, _BPE_ROUNDS).collect(),
                        key=lambda r: r["round"])
    ]
    want = [
        (r["round"], r.x, r.y, r.pair_n)
        for r in sorted(Q["text_bpe_train"](spark, SF_SMALL).collect(),
                        key=lambda r: r["round"])
    ]
    assert got == want and len(got) == _BPE_ROUNDS


def test_bpe_train_frame_120_merges_end_to_end(spark):
    """VERDICT r9 item 2 pin (b): a production-K (>=100-merge) training
    run feeds bpe_encode_frame end-to-end into pack_sequences_frame /
    token_budget_frame. The synthetic documents vocabulary is only 31
    words (~107 learnable merges at most), so the >=120-merge capacity
    comes from a generated corpus: 400 distinct 12-hex-char words give
    thousands of learnable merges. Invariants: exactly 120 consecutive
    rounds; every winner count positive; per-document token counts
    never INCREASE when the merge list is extended (each extra merge
    can only fuse symbols); the trained counts conserve through
    pack_sequences_frame and bind the budget in token_budget_frame."""
    import hashlib
    import math

    from net7_etl_bus_spark.operators.packing import _L, pack_sequences_frame
    from net7_etl_bus_spark.operators.sampling import (
        _BUDGET_TOKENS,
        token_budget_frame,
    )
    from net7_etl_bus_spark.operators.text import bpe_encode_frame, bpe_train_frame

    vocab = [hashlib.md5(str(i).encode()).hexdigest()[:12] for i in range(400)]
    docs = spark.createDataFrame(
        [
            (d, " ".join(vocab[(7 * d + 3 * j) % 400] for j in range(40)),
             "src" + str(d % 3))
            for d in range(60)
        ],
        "doc_id long, text string, source string",
    )
    merges = bpe_train_frame(docs, 120)
    mrows = sorted(merges.collect(), key=lambda r: r["round"])
    assert [r["round"] for r in mrows] == list(range(1, 121))
    assert all(r.pair_n >= 1 for r in mrows)

    led120 = {r.doc_id: r for r in bpe_encode_frame(docs, merges).collect()}
    led3 = {
        r.doc_id: r
        for r in bpe_encode_frame(
            docs, merges.where(F.col("round") <= 3)
        ).collect()
    }
    assert set(led120) == set(led3)
    assert all(led120[d].n_tokens <= led3[d].n_tokens for d in led120)
    assert all(led120[d].n_words == led3[d].n_words for d in led120)
    # 117 extra merges actually bought something
    assert sum(r.n_tokens for r in led120.values()) < sum(
        r.n_tokens for r in led3.values()
    )

    toks = spark.createDataFrame(
        [(d, r.n_tokens) for d, r in led120.items()], "doc_id long, t long"
    )
    packed = pack_sequences_frame(toks).collect()
    total = sum(r.n_tokens for r in led120.values() if r.n_tokens > 0)
    assert sum(r.n_tokens for r in packed) == total
    assert len(packed) == math.ceil(total / _L)

    s = docs.select("doc_id", "source").join(
        spark.createDataFrame(
            [(d, r.n_tokens) for d, r in led120.items()],
            "doc_id long, n_tokens long",
        ),
        "doc_id",
    )
    brows = token_budget_frame(s).collect()
    by_src = {}
    for r in brows:
        by_src.setdefault(r.source, 0)
        if r.kept:
            by_src[r.source] += r.n_tokens
    assert by_src and all(v <= _BUDGET_TOKENS for v in by_src.values())


def test_bpe_train_frame_exhausts_real_corpus_vocab(spark):
    """On the real (31-word) documents vocabulary, arbitrary-K training
    runs to EXHAUSTION: early-stop fires before the requested 200
    rounds, and the fully-merged vocabulary tokenizes every word to a
    single symbol — n_tokens == n_words for every document (the
    limiting case the chars/4 estimator can never reach)."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import bpe_encode_frame, bpe_train_frame

    docs = load_table(spark, SF_SMALL, "documents")
    merges = bpe_train_frame(docs, 200)
    n = merges.count()
    assert 30 < n < 200  # stopped on its own, well past the unrolled 3
    led = bpe_encode_frame(docs, merges).collect()
    assert led and all(r.n_tokens == r.n_words for r in led)


def test_bpe_train_frame_early_stop_exhausted_vocab(spark):
    """A fully-merged vocabulary ends training early: requesting 50
    merges on a one-pair corpus returns exactly the one learnable
    merge instead of looping or failing."""
    from net7_etl_bus_spark.operators.text import bpe_train_frame

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    rows = bpe_train_frame(docs, 50).collect()
    assert [(r["round"], r.x, r.y, r.pair_n) for r in rows] == [(1, "a", "b", 3)]


def test_bpe_train_frame_accepts_wordcounts(spark):
    """The (word, cnt) input path: pre-aggregated counts train the
    same merges as the corpus they summarize — the form a production
    trainer persists and retrains from."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import bpe_train_frame, normalized_text

    docs = load_table(spark, SF_SMALL, "documents")
    wc = (
        docs.select(F.explode(F.split(normalized_text("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    got = [(r["round"], r.x, r.y, r.pair_n)
           for r in sorted(bpe_train_frame(wc, 5).collect(),
                           key=lambda r: r["round"])]
    want = [(r["round"], r.x, r.y, r.pair_n)
            for r in sorted(bpe_train_frame(docs, 5).collect(),
                            key=lambda r: r["round"])]
    assert got == want and len(got) == 5


def test_bpe_disjoint_batch_rule():
    """The batched-BPE acceptance rule in isolation (VERDICT r10 item
    3): accept winner-ordered candidates sharing no operand OR created
    symbol with anything already accepted; SKIP conflicting ones (a
    skipped merge is never applied, so exactness is untouched — see
    the rule's docstring); respect the remaining-merge quota."""
    from collections import namedtuple

    from net7_etl_bus_spark.operators.text import _bpe_disjoint_batch

    R = namedtuple("R", "x y pair_n")
    # operand conflict: (b, e) shares b with accepted (a, b) and is
    # skipped; the disjoint (f, g) BEHIND it is still taken
    got = _bpe_disjoint_batch(
        [R("a", "b", 9), R("c", "d", 8), R("b", "e", 7), R("f", "g", 6)], 10
    )
    assert got == [("a", "b", 9), ("c", "d", 8), ("f", "g", 6)]
    # created-symbol conflict: "ab" is what (a, b) just created
    assert _bpe_disjoint_batch([R("a", "b", 9), R("ab", "c", 8)], 10) == [
        ("a", "b", 9)
    ]
    # a candidate CREATING an accepted operand conflicts too: (a, b)
    # creates "ab" which equals the later candidate's x
    assert _bpe_disjoint_batch([R("x", "y", 9), R("a", "b", 8), R("ab", "z", 7)], 10) == [
        ("x", "y", 9), ("a", "b", 8)
    ]
    # quota cuts acceptance even with disjoint candidates remaining
    assert _bpe_disjoint_batch(
        [R("a", "b", 9), R("c", "d", 8), R("e", "f", 7)], 2
    ) == [("a", "b", 9), ("c", "d", 8)]


def test_bpe_train_frame_batched_equals_sequential_when_disjoint(spark):
    """On a corpus whose top pairs are symbol-disjoint, one batched
    round produces the EXACT sequential merge list (disjointness keeps
    every accepted count invariant under the batch's other merges) —
    and in fewer driver round trips (collect calls counted)."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract
    # parent in Spark 4 and its collect is overridden
    from pyspark.sql.classic.dataframe import DataFrame

    from net7_etl_bus_spark.operators.text import bpe_train_frame

    docs = spark.createDataFrame(
        [(i, "ab") for i in range(10)] + [(100 + i, "cd") for i in range(8)],
        "doc_id long, text string",
    )
    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    DataFrame.collect = counting
    try:
        seq = [(r["round"], r.x, r.y, r.pair_n)
               for r in orig(bpe_train_frame(docs, 2, n_batch=1))]
        seq_calls = calls["n"]
        calls["n"] = 0
        bat = [(r["round"], r.x, r.y, r.pair_n)
               for r in orig(bpe_train_frame(docs, 2, n_batch=2))]
        bat_calls = calls["n"]
    finally:
        DataFrame.collect = orig
    assert seq == bat == [(1, "a", "b", 10), (2, "c", "d", 8)]
    assert (seq_calls, bat_calls) == (2, 1)


def test_bpe_train_frame_batched_defers_conflicting_merge(spark):
    """On a corpus where the top-M interact ('abc' x10: (a,b) and
    (b,c) both count 10 and share b), the disjoint-prefix rule must
    DROP the conflicting (b,c) from the batch; next round's recount
    then finds (ab,c) — so (b,c) never merges at all, exactly as
    sequential training decides."""
    from net7_etl_bus_spark.operators.text import bpe_train_frame

    docs = spark.createDataFrame(
        [(i, "abc") for i in range(10)], "doc_id long, text string"
    )
    bat = [(r["round"], r.x, r.y, r.pair_n)
           for r in bpe_train_frame(docs, 2, n_batch=2).collect()]
    assert bat == [(1, "a", "b", 10), (2, "ab", "c", 10)]
    seq = [(r["round"], r.x, r.y, r.pair_n)
           for r in bpe_train_frame(docs, 2, n_batch=1).collect()]
    assert bat == seq


def test_bpe_train_frame_batched_documented_divergence(spark):
    """n_batch > 1 is an approximation with a documented divergence
    mode: merges accepted later in a batch were ranked on batch-START
    counts, so merge ORDER differs from sequential training (where
    each merge's application re-ranks everything before the next
    pick). Pin the real-corpus behavior under the skip rule: the
    round-1 winner is always identical (the global top pair is always
    accepted first), sequential's second merge is ('o','r') while the
    batch had already committed ('i','n') — both with exact
    batch-start counts — and both lists stay well-formed (sequential
    rounds, positive exact counts)."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import bpe_train_frame

    docs = load_table(spark, SF_SMALL, "documents")
    seq = [(r["round"], r.x, r.y, r.pair_n)
           for r in bpe_train_frame(docs, 16).collect()]
    bat = [(r["round"], r.x, r.y, r.pair_n)
           for r in bpe_train_frame(docs, 16, n_batch=8).collect()]
    assert seq[0] == bat[0]
    assert seq[1][1:3] == ("o", "r") and bat[1][1:3] == ("i", "n")
    assert [r for r, *_ in seq] == list(range(1, 17))
    assert [r for r, *_ in bat] == list(range(1, 17))
    assert all(n > 0 for *_ignored, n in seq) and all(n > 0 for *_ignored, n in bat)


# --- Naive-Bayes quality training (r10) ---------------------------------


def test_nb_train_conservation_and_priors(spark):
    """The trained NB artifact's sufficient statistics are conserved:
    every token of every labeled doc lands in exactly one class
    counter, the priors count exactly the teacher-labeled docs, and
    the bucket spine is complete and data-independent."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import (
        _CLF_D,
        normalized_text,
        teacher_labels,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    rows = sorted(Q["text_quality_nb_train"](spark, SF_SMALL).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(_CLF_D))
    total_toks = docs.select(
        F.explode(F.split(normalized_text("text"), " ")).alias("tok")
    ).count()
    assert sum(r.cnt_pos + r.cnt_neg for r in rows) == total_toks
    lab = teacher_labels(docs)
    n_pos = lab.where("is_q").count()
    n_neg = lab.where("NOT is_q").count()
    assert all(r.docs_pos == n_pos and r.docs_neg == n_neg for r in rows)
    assert n_pos > 0 and n_neg > 0  # both classes present in testdata


def test_nb_scorer_consumes_trained_weights(spark):
    """VERDICT r9 item 6's scorer half: nb_score_frame turns the
    trained count table into log-odds weights and reproduces the
    teacher (the fixed linear classifier) on the training corpus well
    above chance — NB distilling a linear model over the SAME hashed
    features. Also pins the ledger shape: one score per tokenized
    doc, n_tokens carried through."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import nb_score_frame, teacher_labels

    docs = load_table(spark, SF_SMALL, "documents")
    model = Q["text_quality_nb_train"](spark, SF_SMALL)
    scored = nb_score_frame(docs, model)
    lab = {r.doc_id: r.is_q for r in teacher_labels(docs).collect()}
    srows = scored.collect()
    assert set(r.doc_id for r in srows) == set(lab)
    agree = sum(bool(r.is_quality) == lab[r.doc_id] for r in srows)
    assert agree / len(srows) >= 0.70, f"{agree}/{len(srows)}"
    clf = {r.doc_id: r.n_tokens
           for r in Q["text_quality_classifier"](spark, SF_SMALL).collect()}
    assert all(r.n_tokens == clf[r.doc_id] for r in srows)


def test_nb_score_frame_rejects_malformed_model(spark):
    """The model collect is bounded by contract: a table that isn't
    exactly the _CLF_D-row artifact raises instead of silently
    mis-indexing weights."""
    import pytest

    from net7_etl_bus_spark.operators.text import nb_score_frame

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    bad = spark.createDataFrame(
        [(0, 1, 1, 1, 1)],
        "bucket long, cnt_pos long, cnt_neg long, docs_pos long, docs_neg long",
    )
    with pytest.raises(ValueError, match="bucket rows"):
        nb_score_frame(docs, bad)


def test_nb_quantized_scorer_tracks_float_scorer_and_teacher(spark):
    """VERDICT r10 item 4: the integer-quantized NB scorer (the
    oracle-expressible half of text_quality_nb_scored) must be a real
    NB decision, not just hashable — pin (1) >=95% per-document
    keep/drop agreement with the float log-odds scorer on the SAME
    trained model (measured 99.4% at sf0.001/sf0.01; the symmetric
    r - 1/r evidence tracks 2*log r for mild bucket ratios), (2)
    teacher agreement at least as strong as the float scorer's own
    70% pin (measured 87%), and (3) the ledger shape: one score per
    tokenized doc, n_tokens carried through."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import (
        nb_score_frame,
        nb_score_quantized_frame,
        teacher_labels,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    model = Q["text_quality_nb_train"](spark, SF_SMALL).localCheckpoint(
        eager=False
    )
    qrows = nb_score_quantized_frame(docs, model).collect()
    flt = {r.doc_id: bool(r.is_quality) for r in nb_score_frame(docs, model).collect()}
    lab = {r.doc_id: r.is_q for r in teacher_labels(docs).collect()}
    assert set(r.doc_id for r in qrows) == set(flt) == set(lab)
    agree_float = sum(bool(r.is_quality) == flt[r.doc_id] for r in qrows)
    assert agree_float / len(qrows) >= 0.95, f"{agree_float}/{len(qrows)}"
    agree_teacher = sum(bool(r.is_quality) == lab[r.doc_id] for r in qrows)
    assert agree_teacher / len(qrows) >= 0.70, f"{agree_teacher}/{len(qrows)}"
    reg = {r.doc_id: r for r in Q["text_quality_nb_scored"](spark, SF_SMALL).collect()}
    assert {d: bool(r.is_quality) for d, r in reg.items()} == {
        r.doc_id: bool(r.is_quality) for r in qrows
    }
    clf = {r.doc_id: r.n_tokens
           for r in Q["text_quality_classifier"](spark, SF_SMALL).collect()}
    assert all(r.n_tokens == clf[r.doc_id] for r in qrows)


def test_nb_quantized_scorer_antisymmetric_under_class_swap(spark):
    """The symmetric ratio evidence's defining property (the reason the
    one-sided ratio mean was rejected): swapping the classes — cnt_pos
    <-> cnt_neg, docs_pos <-> docs_neg — exactly negates every
    document's score, so the decision boundary is class-symmetric like
    log-odds. (Scores with |score| < 1 quantum may keep is_quality on
    both sides; exact negation is the pin.)"""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.text import nb_score_quantized_frame

    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    model = Q["text_quality_nb_train"](spark, SF_SMALL).localCheckpoint(
        eager=False
    )
    swapped = model.selectExpr(
        "bucket",
        "cnt_neg AS cnt_pos",
        "cnt_pos AS cnt_neg",
        "docs_neg AS docs_pos",
        "docs_pos AS docs_neg",
    )
    a = {r.doc_id: r.nb_score_q for r in nb_score_quantized_frame(docs, model).collect()}
    b = {r.doc_id: r.nb_score_q
         for r in nb_score_quantized_frame(docs, swapped).collect()}
    assert a and set(a) == set(b)
    assert all(b[d] == -a[d] for d in a)


# --- production-K k-means trainer (kmeans_train_frame, r10) -------------


def _km_inputs(spark):
    from net7_etl_bus_spark.operators.similarity import (
        _KM_K,
        _KM_Q,
        _km_eligible,
    )

    eq = _km_eligible(spark, SF_SMALL).select(
        "vec_id",
        F.transform(
            "embedding",
            lambda y: F.floor(y.cast("double") * F.lit(_KM_Q)).cast("long"),
        ).alias("xq"),
    )
    cent0 = eq.where(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    return eq, cent0


def test_kmeans_train_frame_checkpointed_equals_registry(spark):
    """kmeans_train_frame with per-round checkpointing (the arbitrary-
    n_iters production mode) must train the EXACT same centroids as
    the registered key's unrolled plan — checkpointing changes plan
    depth, never values (integer arithmetic end-to-end)."""
    from net7_etl_bus_spark.operators.similarity import kmeans_train_frame

    eq, cent0 = _km_inputs(spark)
    got = sorted(
        (r.cid, tuple(r.cq), r.n)
        for r in kmeans_train_frame(eq, cent0, checkpoint_rounds=True).collect()
    )
    reg = Q["emb_kmeans_train"](spark, SF_SMALL).collect()
    by_cid = {}
    for r in reg:
        ent = by_cid.setdefault(r.cid, ([0] * 64, r.n_members))
        ent[0][r.d - 1] = r.c_q
    want = sorted((cid, tuple(v[0]), v[1]) for cid, v in by_cid.items())
    assert got == want


def test_kmeans_train_frame_hier_degenerates_at_one_super(spark):
    """n_super=1: the two-tier integer-distance cascade ranks all K
    centroids in its second tier — bit-identical to the flat argmin."""
    from net7_etl_bus_spark.operators.similarity import kmeans_train_frame

    eq, cent0 = _km_inputs(spark)
    flat = sorted(
        (r.cid, tuple(r.cq), r.n)
        for r in kmeans_train_frame(eq, cent0).collect()
    )
    hier = sorted(
        (r.cid, tuple(r.cq), r.n)
        for r in kmeans_train_frame(eq, cent0, n_super=1).collect()
    )
    assert flat == hier


def test_kmeans_train_frame_hier_conserves_members(spark):
    """At a real super count (S=3 over K=8) assignment is approximate
    but every vector still lands in exactly one cluster each round:
    member counts sum to the corpus, surviving cids are seed cids,
    centroids keep the 64-dim shape."""
    from net7_etl_bus_spark.operators.similarity import (
        _KM_K,
        kmeans_train_frame,
    )

    eq, cent0 = _km_inputs(spark)
    n = eq.count()
    rows = kmeans_train_frame(eq, cent0, n_super=3).collect()
    assert sum(r.n for r in rows) == n
    assert all(0 <= r.cid < _KM_K for r in rows)
    assert all(len(r.cq) == 64 for r in rows)


def test_trained_supers_preserve_degeneracy_and_conserve(spark):
    """VERDICT r10 item 5: trained super-centroids
    (train_super_centroids — k-means over the K-row centroid relation)
    thread through the cascade as super_cent. Pin (1) a single TRAINED
    super degenerates to the exact flat argmin, same as n_super=1 (the
    one group contains all K centroids, so tier 2 ranks everything);
    (2) at S=3 trained supers, assignment stays conservative: every
    vector lands in exactly one cluster, cids are seed cids; (3)
    passing super_cent ALONE (no n_super) activates the cascade."""
    from net7_etl_bus_spark.operators.similarity import (
        _KM_K,
        kmeans_train_frame,
        train_super_centroids,
    )

    eq, cent0 = _km_inputs(spark)
    sup1 = train_super_centroids(cent0, 1)
    flat = sorted(
        (r.cid, tuple(r.cq), r.n)
        for r in kmeans_train_frame(eq, cent0).collect()
    )
    t1 = sorted(
        (r.cid, tuple(r.cq), r.n)
        for r in kmeans_train_frame(eq, cent0, super_cent=sup1).collect()
    )
    assert flat == t1
    sup3 = train_super_centroids(cent0, 3)
    rows = kmeans_train_frame(eq, cent0, super_cent=sup3).collect()
    assert sum(r.n for r in rows) == eq.count()
    assert all(0 <= r.cid < _KM_K for r in rows)
    assert all(len(r.cq) == 64 for r in rows)


def test_ivf_search_frame_trained_supers_degenerate_at_one(spark):
    """The cosine-space cascade with ONE trained super (sup_emb
    column) must be row-identical to the exact flat IVF search — the
    search-side twin of the kmeans degeneracy pin."""
    from net7_etl_bus_spark.operators.similarity import (
        ivf_search_frame,
        train_super_centroids,
    )

    eq, cent0 = _km_inputs(spark)
    from net7_etl_bus_spark.data import load_table

    e = load_table(spark, SF_SMALL, "embeddings").where(
        "embedding IS NOT NULL"
    )
    # double centroids for the search frame; quantized ints for the
    # super trainer (integer-valued doubles -> exact long round-trip)
    cent = cent0.selectExpr(
        "cid", "transform(cq, x -> CAST(x AS DOUBLE)) AS cent_emb"
    )
    sup1 = train_super_centroids(cent0, 1)
    flat = sorted(map(tuple, ivf_search_frame(e, cent).collect()))
    t1 = sorted(map(tuple, ivf_search_frame(e, cent, super_cent=sup1).collect()))
    assert flat == t1
    # and the IVF-PQ twin, same contract
    from net7_etl_bus_spark.operators.similarity import ivfpq_search_frame

    pq_flat = sorted(map(tuple, ivfpq_search_frame(e, cent).collect()))
    pq_t1 = sorted(
        map(tuple, ivfpq_search_frame(e, cent, super_cent=sup1).collect())
    )
    assert pq_flat == pq_t1


def test_nb_train_frame_external_labels_hand_corpus(spark):
    """nb_train_frame's production shape: EXTERNAL labels (not the
    teacher), verified against a hand computation — every token of a
    labeled doc lands in its class's counter at the md5 bucket, docs
    without a label row drop out (inner join), priors count label
    rows, and the spine zero-fills untouched buckets."""
    from net7_etl_bus_spark.operators.text import _CLF_D, nb_train_frame

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "bb cc"), (3, "dd"), (4, "unlabeled ee")],
        "doc_id long, text string",
    )
    labels = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], "doc_id long, is_q boolean"
    )
    rows = {r.bucket: r for r in nb_train_frame(docs, labels).collect()}
    assert sorted(rows) == list(range(_CLF_D))

    import hashlib

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _CLF_D

    want_pos, want_neg = {}, {}
    for toks, is_q in ((["aa", "bb", "aa"], True), (["bb", "cc"], False),
                       (["dd"], True)):
        for t in toks:
            d = want_pos if is_q else want_neg
            d[bucket(t)] = d.get(bucket(t), 0) + 1
    for b in range(_CLF_D):
        assert rows[b].cnt_pos == want_pos.get(b, 0), b
        assert rows[b].cnt_neg == want_neg.get(b, 0), b
        assert rows[b].docs_pos == 2 and rows[b].docs_neg == 1
    # doc 4's tokens appear nowhere (no label row)
    assert sum(r.cnt_pos + r.cnt_neg for r in rows.values()) == 6


def test_hier_assign_conserves_under_empty_trained_super(spark):
    """ADVICE r11 (medium): with a trained super_cent, a super can own
    ZERO centroids in cmap's argmin, and the (previously inner)
    vsel-cmap join silently dropped every vector whose nearest super
    was empty. Pin conservation on a constructed empty-super set for
    BOTH cascades: centroids all align with super s0, so s1 owns
    nothing; a vector pointing at s1 must still land in a cluster
    (its next-nearest LIVE super), not vanish."""
    from net7_etl_bus_spark.operators.similarity import (
        _hier_assign,
        _hier_assign_sq,
    )

    # cosine cascade: both centroids within 6 deg of +x; super s1 = -x
    e = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.05]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])],
        "cid long, cent_emb array<double>",
    )
    sup = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
        "sid long, sup_emb array<double>",
    )
    rows = _hier_assign(e, cent, None, super_cent=sup).collect()
    assert len(rows) == 3, "vector nearest the empty super was dropped"
    got = {r.vec_id: r.cid for r in rows}
    assert set(got) == {0, 1, 2}
    assert all(c in (0, 1) for c in got.values())

    # integer-sqdist cascade: same construction in quantized space
    eq = spark.createDataFrame(
        [(0, [10, 0]), (1, [-10, 1]), (2, [0, 10])],
        "vec_id long, xq array<long>",
    )
    centq = spark.createDataFrame(
        [(0, [10, 0]), (1, [9, 1])], "cid long, cq array<long>"
    )
    supq = spark.createDataFrame(
        [(0, [10, 0]), (1, [-10, 0])], "sid long, sq array<long>"
    )
    rq = _hier_assign_sq(eq, centq, None, super_cent=supq).collect()
    assert len(rq) == 3, "vector nearest the empty super was dropped (sq)"
    assert {r.vec_id for r in rq} == {0, 1, 2}


def test_train_super_centroids_duplicate_coordinates(spark):
    """ADVICE r11 (low): when the centroid relation has fewer DISTINCT
    coordinates than n_super, the farthest-point loop used to argmax
    an all-zero min-distance array and re-pick index 0, emitting
    duplicate (cid, cq) init rows. Pin: duplicates stop the traversal
    — the trained relation has at most as many supers as distinct
    coordinates, with no duplicate sids, and every vector still
    assigns (conservation downstream)."""
    from net7_etl_bus_spark.operators.similarity import (
        _hier_assign_sq,
        train_super_centroids,
    )

    cent = spark.createDataFrame(
        [(0, [5, 5]), (1, [5, 5]), (2, [5, 5]), (3, [-5, 5])],
        "cid long, cq array<long>",
    )
    sup = train_super_centroids(cent, 3)
    rows = sup.collect()
    assert len(rows) <= 2, "more supers than distinct coordinates"
    assert len({r.sid for r in rows}) == len(rows), "duplicate sids"
    # downstream conservation with the truncated super set
    eq = spark.createDataFrame(
        [(0, [5, 5]), (1, [-5, 5]), (2, [0, 0])],
        "vec_id long, xq array<long>",
    )
    got = _hier_assign_sq(eq, cent, None, super_cent=sup).collect()
    assert {r.vec_id for r in got} == {0, 1, 2}


def test_nb_quantized_frame_rejects_malformed_model(spark):
    """ADVICE r11 (low): nb_score_quantized_frame must apply the same
    model validation as nb_score_frame — without it, the inner
    token->weight join silently dropped tokens whose bucket row was
    missing (deflating n_tokens AND the score), and MAX-combined
    inconsistent priors, so the two scorers disagreed on ledger shape
    for the same malformed input."""
    import pytest

    from net7_etl_bus_spark.operators.text import (
        _CLF_D,
        nb_score_quantized_frame,
    )

    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    short = spark.createDataFrame(
        [(0, 1, 1, 1, 1)],
        "bucket long, cnt_pos long, cnt_neg long, docs_pos long, docs_neg long",
    )
    with pytest.raises(ValueError, match="bucket rows"):
        nb_score_quantized_frame(docs, short)

    # right row count, inconsistent priors
    incons = spark.range(_CLF_D).selectExpr(
        "id AS bucket",
        "CAST(1 AS BIGINT) AS cnt_pos",
        "CAST(1 AS BIGINT) AS cnt_neg",
        "CAST(id AS BIGINT) AS docs_pos",
        "CAST(1 AS BIGINT) AS docs_neg",
    )
    with pytest.raises(ValueError, match="inconsistent"):
        nb_score_quantized_frame(docs, incons)

    # duplicate buckets masking a missing one: count right, distinct wrong
    dup = spark.range(_CLF_D).selectExpr(
        f"least(id, {_CLF_D - 2}) AS bucket",
        "CAST(1 AS BIGINT) AS cnt_pos",
        "CAST(1 AS BIGINT) AS cnt_neg",
        "CAST(2 AS BIGINT) AS docs_pos",
        "CAST(1 AS BIGINT) AS docs_neg",
    )
    with pytest.raises(ValueError, match="bucket rows"):
        nb_score_quantized_frame(docs, dup)

    # NULL priors on SOME rows with one consistent non-null pair
    # (ADVICE r12): countDistinct skips NULL-containing rows, so this
    # artifact passed n_pri == 1 and silently scored via MAX while
    # nb_score_frame's Python-set check on the same model raises —
    # the exact cross-scorer shape disagreement the ADVICE r11 fix
    # was meant to close. Both scorers must reject it.
    null_pri = spark.range(_CLF_D).selectExpr(
        "id AS bucket",
        "CAST(1 AS BIGINT) AS cnt_pos",
        "CAST(1 AS BIGINT) AS cnt_neg",
        "CAST(CASE WHEN id = 0 THEN NULL ELSE 2 END AS BIGINT) AS docs_pos",
        "CAST(1 AS BIGINT) AS docs_neg",
    )
    with pytest.raises(ValueError, match="inconsistent"):
        nb_score_quantized_frame(docs, null_pri)
    from net7_etl_bus_spark.operators.text import nb_score_frame

    with pytest.raises(ValueError):
        nb_score_frame(docs, null_pri)


def test_sim_search_ivfpq_trained_shape_and_rank(spark):
    """The trained IVF-PQ chain (r12's new key): per-query ranks are
    dense from 1 and capped at _ADC_K, queries are query ids, corpus
    ids never collide with query ids. Value parity runs through the
    spliced _KM_CTES oracle in test_oracle_parity.py / the driver."""
    from net7_etl_bus_spark.operators.similarity import _ADC_K, N_QUERIES

    rows = Q["sim_search_ivfpq_trained"](spark, SF_SMALL).collect()
    assert rows, "empty trained IVF-PQ result"
    by_q = {}
    for r in rows:
        assert r.query_id < N_QUERIES
        assert r.neighbor_id >= N_QUERIES
        by_q.setdefault(r.query_id, []).append(r.rk)
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), q
        assert max(rks) <= _ADC_K


def test_recommended_k_sizing_rule():
    """VERDICT r11 item 3: the K ~ n sizing rule as executable code.
    Pin linearity (10x vectors -> 10x K, the 0.60-vs-0.82 ladder
    distinction), the SemDeDup-protocol ballpark, edge behavior, and
    argument validation."""
    import pytest

    from net7_etl_bus_spark.operators.similarity import recommended_k

    assert recommended_k(160_000, 1000) == 160  # the r11 ladder row
    assert recommended_k(16_000, 1000) == 16
    # linear in n: the whole point vs sqrt-sizing
    assert recommended_k(10 * 1_048_576) == 10 * recommended_k(1_048_576)
    # ceil, never 0; tiny corpora get one cluster
    assert recommended_k(1) == 1
    assert recommended_k(0) == 1
    assert recommended_k(1025, 1024) == 2
    # SemDeDup protocol ballpark: LAION-440M at ~8.8k/cluster -> 50k
    assert recommended_k(440_000_000, 8800) == 50_000
    with pytest.raises(ValueError):
        recommended_k(-1)
    with pytest.raises(ValueError):
        recommended_k(100, 0)
