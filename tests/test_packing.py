"""Sequence packing (`operators/packing.py`): the concat-and-chunk
ledger must conserve tokens, fill every non-final sequence exactly,
and match the single-node oracle — while the engine computes the
global running sum as a two-level distributed prefix sum (the plan
shape is pinned in test_physical_plans.py's global-window guard)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from net7_etl_bus_spark.data import load_table

from net7_etl_bus_spark.operators.packing import _L, text_pack_sequences
from net7_etl_bus_spark.plans import registry
from scripts.diffcheck import compare

from .conftest import SF_SMALL


def test_differential(spark, duck):
    key = "text_pack_sequences"
    sdf = registry.queries()[key](spark, SF_SMALL).toPandas()
    odf = duck.execute(registry.oracles()[key]).df()
    assert not compare(key, sdf, odf)


def test_packing_invariants(spark):
    out = text_pack_sequences(spark, SF_SMALL).toPandas()
    out = out.sort_values("seq_id").reset_index(drop=True)
    # contiguous sequence ids from 0
    assert list(out["seq_id"]) == list(range(len(out)))
    # every sequence but the last holds exactly L tokens; the last at
    # most L; every sequence touches at least one document
    assert (out["n_tokens"][:-1] == _L).all()
    assert 0 < out["n_tokens"].iloc[-1] <= _L
    assert (out["n_docs"] >= 1).all()
    # token conservation: ledger total == sum of per-doc estimates
    # over the packable population (NULL/empty text dropped)
    from net7_etl_bus_spark.data import load_table

    total = (
        load_table(spark, SF_SMALL, "documents")
        .where(F.col("doc_id").isNotNull() & (F.length("text") > 0))
        .select(F.sum(F.ceil(F.length("text") / 4.0).cast("bigint")))
        .collect()[0][0]
    )
    assert int(out["n_tokens"].sum()) == int(total)


def test_chunk_overlap_tiling(spark):
    """text_chunk_overlap: chunk count and lengths must tile each doc
    exactly — floor((len-1)/stride)+1 chunks, every chunk full-size
    except a possibly short final one of len - stride*(n-1) chars."""
    from net7_etl_bus_spark.operators.text import (
        _CH_SIZE,
        _CH_STRIDE,
        text_chunk_overlap,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .where(F.col("doc_id").isNotNull() & (F.length("text") > 0))
        .select("doc_id", F.length("text").alias("len"))
        .toPandas()
        .set_index("doc_id")["len"]
    )
    out = text_chunk_overlap(spark, SF_SMALL).toPandas()
    for doc_id, grp in out.groupby("doc_id"):
        n = len(grp)
        L = int(docs[doc_id])
        assert n == (L - 1) // _CH_STRIDE + 1
        grp = grp.sort_values("chunk_idx")
        assert list(grp["chunk_idx"]) == list(range(n))
        body, last = grp["chunk_len"].iloc[:-1], int(grp["chunk_len"].iloc[-1])
        assert (body == _CH_SIZE).all() or L < _CH_SIZE
        assert last == min(_CH_SIZE, L - _CH_STRIDE * (n - 1))


def test_rag_prep_ledger_consistency(spark):
    """pipeline_rag_prep's ledger must reconcile exactly with the raw
    chunk relation: per source, n_chunks equals the chunker's output
    count and n_unique equals the number of distinct chunk_md5 values
    whose first (doc_id, chunk_idx) owner lives in that source."""
    from net7_etl_bus_spark.operators.curation import pipeline_rag_prep
    from net7_etl_bus_spark.operators.text import text_chunk_overlap

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "source")
        .toPandas()
        .set_index("doc_id")["source"]
    )
    chunks = text_chunk_overlap(spark, SF_SMALL).toPandas()
    chunks = chunks[chunks["doc_id"].map(docs).notna()]
    chunks["source"] = chunks["doc_id"].map(docs)
    out = (
        pipeline_rag_prep(spark, SF_SMALL)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    assert out["n_chunks"].to_dict() == chunks.groupby("source").size().to_dict()
    firsts = (
        chunks.sort_values(["doc_id", "chunk_idx"])
        .groupby("chunk_md5")
        .first()
    )
    assert out["n_unique"].to_dict() == firsts.groupby("source").size().to_dict()
    assert (out["n_chunks"] - out["n_unique"] == out["n_dup_dropped"]).all()


def test_median_iterative_refinement_path(spark, monkeypatch, tmp_path):
    """Force the histogram-refinement loop (tiny collect threshold and
    fan-out) and check the result still equals the exact sorted
    median; then the mass-ties range-collapse path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from net7_etl_bus_spark.operators import analytics

    monkeypatch.setattr(analytics, "_MED_COLLECT", 8)
    monkeypatch.setattr(analytics, "_MED_BINS", 4)
    out = analytics.agg_median_iterative(spark, SF_SMALL).toPandas()
    xs = sorted(
        load_table(spark, SF_SMALL, "lineitem")
        .where("l_extendedprice IS NOT NULL")
        .toPandas()["l_extendedprice"]
    )
    k = (len(xs) + 1) // 2
    assert float(out["median_price"][0]) == xs[k - 1]
    assert int(out["n_finite"][0]) == len(xs)

    # mass ties: every price identical -> lo == hi break, exact answer
    mirror = str(tmp_path / "ties")
    os.makedirs(mirror)
    src = pq.read_table(os.path.join(SF_SMALL, "lineitem.parquet"))
    i = src.column_names.index("l_extendedprice")
    const = pa.array([42.5] * len(src), pa.float64())
    pq.write_table(
        src.set_column(i, src.field(i), const),
        os.path.join(mirror, "lineitem.parquet"),
    )
    out = analytics.agg_median_iterative(spark, mirror).toPandas()
    assert float(out["median_price"][0]) == 42.5


def test_bloom_prefilter_conservative_and_selective(spark):
    """The bloom stage must (a) never drop a true match — pass-count
    >= exact match count — and (b) actually prune: the pass-set stays
    well under the full probe side at fixture scale (false-positive
    rate bounded), while the final answer equals the plain semi join
    exactly (that part is the oracle's job; here we probe the stages)."""
    from net7_etl_bus_spark.operators.relational import (
        bloom_prefiltered_probe,
        join_bloom_prefilter,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders").where(
        "o_orderpriority = '1-URGENT'"
    )
    exact = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_semi").count()
    pre, _ = bloom_prefiltered_probe(spark, SF_SMALL)
    n_pass, n_all = pre.count(), li.count()
    assert n_pass >= exact  # conservative: no true match ever dropped
    # pruning actually happened, and false positives stay bounded:
    # true-match fraction ~20% + designed ~3% fp, with slack
    assert n_pass <= 0.40 * n_all, (n_pass, n_all)
    out = join_bloom_prefilter(spark, SF_SMALL).toPandas()
    assert int(out["n_lines"][0]) == exact  # bloom never changes the answer


def test_pack_sequences_consumes_bpe_token_counts(spark):
    """The tokenize -> pack chain end-to-end (VERDICT r8 item 3):
    pack_sequences_frame fed text_bpe_encode's REAL per-document
    counts must conserve tokens exactly (ledger sum == BPE ledger sum
    over packable docs), emit ceil(total/L) sequences, and fill every
    sequence but the last to exactly L."""
    import math

    from net7_etl_bus_spark.operators.packing import pack_sequences_frame

    bpe = registry.queries()["text_bpe_encode"](spark, SF_SMALL)
    toks = bpe.select("doc_id", F.col("n_tokens").alias("t"))
    ledger = sorted(
        pack_sequences_frame(toks).collect(), key=lambda r: r.seq_id
    )
    total = toks.where(F.col("t") > 0).agg(F.sum("t")).collect()[0][0]
    assert sum(r.n_tokens for r in ledger) == total
    assert len(ledger) == math.ceil(total / _L)
    for r in ledger[:-1]:
        assert r.n_tokens == _L, r
    assert 0 < ledger[-1].n_tokens <= _L
