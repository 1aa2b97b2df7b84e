"""Property-based tests (hypothesis) — randomized adversaries for the
algorithmic kernels whose correctness the oracle suite can only probe
at fixed inputs.

Each property runs the Spark implementation against an independent
pure-Python model on small randomized inputs. Spark work stays tiny
(driver-local createDataFrame), so the whole module is seconds, not
minutes; deadline is disabled because Spark job latency is noisy.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- connected components vs union-find -------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """The iterative min-label propagation must agree with a classic
    union-find on arbitrary small graphs — including multi-edges,
    reversed duplicates, chains, and disjoint cliques."""
    from net7_etl_bus_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {
        r["id"]: r["label"] for r in connected_components(pairs).collect()
    }
    want = _uf_components(edges)
    assert got == want


# --- interval-overlap binning vs naive quadratic ----------------------

_intervals = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 60)), min_size=1, max_size=20
)


@given(ivls=_intervals, wins=_intervals)
@settings(**_SETTINGS)
def test_interval_bin_join_matches_naive(spark, ivls, wins):
    """The binned equi-join + later-start-bucket residual must produce
    exactly the overlapping pairs of the naive quadratic check — no
    duplicates, no misses, for arbitrary interval layouts (containment,
    touching endpoints, zero-length)."""
    W = 16
    a = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivls)]
    b = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(wins)]
    af = spark.createDataFrame(a, "aid long, a_lo long, a_hi long").withColumn(
        "bucket",
        F.explode(
            F.sequence((F.col("a_lo") / W).cast("long"), (F.col("a_hi") / W).cast("long"))
        ),
    )
    bf = spark.createDataFrame(b, "bid long, b_lo long, b_hi long").withColumn(
        "bucket",
        F.explode(
            F.sequence((F.col("b_lo") / W).cast("long"), (F.col("b_hi") / W).cast("long"))
        ),
    )
    joined = af.join(
        bf,
        (af["bucket"] == bf["bucket"])
        & (F.col("a_lo") <= F.col("b_hi"))
        & (F.col("b_lo") <= F.col("a_hi"))
        & (af["bucket"] == (F.greatest("a_lo", "b_lo") / W).cast("long")),
    ).select("aid", "bid")
    got = sorted((r["aid"], r["bid"]) for r in joined.collect())
    want = sorted(
        (i, j)
        for i, alo, ahi in a
        for j, blo, bhi in b
        if alo <= bhi and blo <= ahi
    )
    assert got == want


# --- incremental dedup state is split-invariant -----------------------

_docs = st.lists(
    st.tuples(st.integers(0, 30), st.sampled_from(["aa", "bb", "cc", "dd"])),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@given(docs=_docs, split=st.integers(1, 3))
@settings(**_SETTINGS)
def test_incremental_dedup_any_split_matches_one_shot(spark, docs, split):
    """dedup_apply_increment folded over ANY partition of the corpus
    into batches must equal the single-batch build — min-survivor and
    counts are associative/commutative under the merge."""
    from net7_etl_bus_spark.operators.dedup import dedup_apply_increment

    df = spark.createDataFrame(docs, "doc_id long, text string")
    state = None
    for k in range(split):
        part = df.filter(F.col("doc_id") % split == k)
        state = dedup_apply_increment(state, part)
    got = {
        r["text_hash"]: (r["keep_doc_id"], r["n_copies"]) for r in state.collect()
    }
    want = {
        r["text_hash"]: (r["keep_doc_id"], r["n_copies"])
        for r in dedup_apply_increment(None, df).collect()
    }
    assert got == want


# --- universal MinHash family sanity ----------------------------------


@given(values=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_minhash_family_is_deterministic_and_bounded(spark, values):
    """The integer universal-hash family: h_i(x) lands in [0, P) and is
    a pure function of the input string (same rows -> same signature
    regardless of partitioning)."""
    from net7_etl_bus_spark.operators.dedup import _MH_A, _MH_B, _MH_P

    df = spark.createDataFrame([(v,) for v in values], "s string")
    x = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint") % _MH_P
    h0 = (F.lit(_MH_A[0]) * x + F.lit(_MH_B[0])) % _MH_P
    one = df.select("s", h0.alias("h")).collect()
    two = df.repartition(7).select("s", h0.alias("h")).collect()
    m1 = {r["s"]: r["h"] for r in one}
    m2 = {r["s"]: r["h"] for r in two}
    assert m1 == m2
    assert all(0 <= v < _MH_P for v in m1.values())


# --- dsum poison contract vs pure-Python model -------------------------

_measures = st.lists(
    st.one_of(
        st.none(),
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.floats(min_value=-1e5, max_value=1e5),  # bias toward in-domain
    ),
    min_size=0,
    max_size=20,
)


def _dsum_model(vals, scale=2):
    """Independent model of registry.dsum: NULLs ignored; any
    NaN/Inf/out-of-domain value poisons the group to NaN; otherwise
    the exact integer sum of floor(v * 10^scale), converted int->double
    (correctly rounded) and divided once by 10^scale."""
    import math

    m = 10**scale
    lim = 9e18 / m
    xs = [v for v in vals if v is not None]
    if any(math.isnan(v) or abs(v) >= lim for v in xs):
        return float("nan")
    if not xs:
        return None
    return float(sum(int(math.floor(v * m)) for v in xs)) / m


@settings(**_SETTINGS)
@given(st.lists(_measures, min_size=1, max_size=6))
def test_dsum_matches_python_model(spark, groups):
    """One Spark job per example: every hypothesis-generated group is a
    key in a single groupBy, so the property covers many groups per
    run. Pins the poison contract itself (not just its cross-engine
    parity, which the fuzz differentials cover)."""
    import math

    from net7_etl_bus_spark.plans.registry import dsum

    rows = [(g, v) for g, vals in enumerate(groups) for v in vals]
    # every group must appear even if empty -> seed with a NULL row
    rows += [(g, None) for g in range(len(groups))]
    df = spark.createDataFrame(rows, "g int, x double")
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(dsum("x").alias("s")).collect()
    }
    for g, vals in enumerate(groups):
        want = _dsum_model(vals)
        have = got[g]
        if want is None:
            assert have is None, (g, vals, have)
        elif math.isnan(want):
            assert have is not None and math.isnan(have), (g, vals, have)
        else:
            assert have == want, (g, vals, have, want)


# --- as-of join & session windows vs naive models ---------------------

# Rows: (user_id or None, minute or None, is_signup). The minute grid
# is small so equal timestamps, sub-gap bursts, and >=10-minute gaps
# all occur; event ids are assigned by enumeration (unique, the
# engine's key contract).
_events = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),
        st.one_of(st.none(), st.integers(0, 59)),
        st.booleans(),
    ),
    min_size=1,
    max_size=18,
)


def _events_dir(tmpdir, rows):
    """Materialize hypothesis rows as an events.parquet a registry
    operator can load — the property exercises the real read path."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [None if m is None else base + datetime.timedelta(minutes=m)
                 for _, m, _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array(
                ["signup" if s else "click" for _, _, s in rows], pa.string()
            ),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@given(rows=_events)
@settings(**{**_SETTINGS, "max_examples": 10})
def test_asof_join_matches_naive(spark, tmp_path_factory, rows):
    """The union+window as-of join must agree with the obvious
    per-row model: each non-signup event gets the max signup ts <= its
    ts for the same non-null user — across equal timestamps (a signup
    at exactly l.ts matches), NULL users, NULL event times, and users
    with no signups at all."""
    from net7_etl_bus_spark.operators.windows import join_asof

    d = _events_dir(str(tmp_path_factory.mktemp("asof")), rows)
    got = {
        r["event_id"]: r["last_signup_ts"]
        for r in join_asof(spark, d).collect()
    }
    signups = [
        (u, m) for u, m, s in rows if s and u is not None and m is not None
    ]
    import datetime

    base = datetime.datetime(2024, 1, 1)
    n_left = 0
    for eid, (u, m, s) in enumerate(rows):
        if s:
            assert eid not in got  # signups are not left rows
            continue
        n_left += 1
        want = None
        if u is not None and m is not None:
            cand = [sm for su, sm in signups if su == u and sm <= m]
            if cand:
                want = base + datetime.timedelta(minutes=max(cand))
        assert got.get(eid) == want, (eid, rows[eid], got.get(eid), want)
    assert len(got) == n_left


def _session_model(rows, gap_min=10):
    """(user, [minutes]) -> [(start_min, end_min, n)] by the
    gaps-and-islands rule matching Spark's session_window: touching
    windows merge, so a new session starts only when the gap from the
    previous event EXCEEDS gap_min; end = last event + gap_min."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for u, m, _ in rows:
        if m is not None:
            per_user[u].append(m)
    out = set()
    for u, ms in per_user.items():
        ms.sort()
        start = prev = ms[0]
        n = 1
        for m in ms[1:]:
            if m - prev <= gap_min:
                prev = m
                n += 1
            else:
                out.add((u, start, prev + gap_min, n))
                start = prev = m
                n = 1
        out.add((u, start, prev + gap_min, n))
    return out


@given(rows=_events)
@settings(**{**_SETTINGS, "max_examples": 10})
def test_session_window_matches_naive(spark, tmp_path_factory, rows):
    """Spark's session_window must agree with the classic
    gaps-and-islands model: merge while gaps are at most 10 minutes
    (touching per-event windows coalesce — the exact-boundary case the
    oracle originally got wrong), close at last event + 10 minutes —
    including equal-ts bursts, singleton sessions, and the NULL-user
    group."""
    import datetime

    from net7_etl_bus_spark.streaming.batch_equiv import win_session

    d = _events_dir(str(tmp_path_factory.mktemp("sess")), rows)
    base = datetime.datetime(2024, 1, 1)

    def mins(ts):
        return (ts - base).total_seconds() / 60.0

    got = {
        (r["user_id"], mins(r["session_start"]), mins(r["session_end"]),
         r["n_events"])
        for r in win_session(spark, d).collect()
    }
    want = {(u, float(a), float(b), n) for u, a, b, n in _session_model(rows)}
    assert got == want, (rows, got ^ want)


# --- SCD2 dimension + point-in-time join vs naive model ---------------

# Three event types so state changes, repeats, and purchase facts all
# occur; the small minute grid makes a purchase land EXACTLY on a
# version boundary (ts == valid_from of the next version, the
# inclusive/exclusive edge) routinely instead of never.
_scd_events = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),
        st.one_of(st.none(), st.integers(0, 29)),
        st.integers(0, 2),
    ),
    min_size=1,
    max_size=16,
)

_TYPES = ["signup", "click", "purchase"]


def _scd2_model(rows):
    """Naive SCD2: per user (non-null user & ts) order by (ts,
    event_id), collapse consecutive identical states, intervals
    [valid_from, valid_to), version by change order."""
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, (u, m, ty) in enumerate(rows):
        if u is not None and m is not None:
            per_user[u].append((m, eid, _TYPES[ty]))
    dim = defaultdict(list)
    for u, evs in per_user.items():
        evs.sort()
        changes = []
        prev = object()  # sentinel != any state
        for m, eid, state in evs:
            if state != prev:
                changes.append((m, state))
                prev = state
        for v, (m, state) in enumerate(changes, start=1):
            nxt = changes[v][0] if v < len(changes) else None
            dim[u].append((state, m, nxt, v))
    return dim


@given(rows=_scd_events)
@settings(**{**_SETTINGS, "max_examples": 10})
def test_scd2_pointintime_matches_naive(spark, tmp_path_factory, rows):
    """The temporal join must agree with the obvious model: each
    purchase fact picks the version with valid_from <= ts < valid_to
    (open current row matches everything from valid_from on) — and a
    fact at EXACTLY a boundary belongs to the newer version, including
    through zero-length [T, T) versions created by same-timestamp
    changes."""
    import datetime

    from net7_etl_bus_spark.operators.cdc import join_scd2_pointintime

    # _events_dir writes event_type from a bool; rewrite with 3 types.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1)
    d = str(tmp_path_factory.mktemp("scd2"))
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [None if m is None else base + datetime.timedelta(minutes=m)
                 for _, m, _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_type": pa.array([_TYPES[ty] for _, _, ty in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))

    got = {
        (r["event_id"], r["state_at_purchase"], r["version"])
        for r in join_scd2_pointintime(spark, d).collect()
    }
    dim = _scd2_model(rows)
    want = set()
    for eid, (u, m, ty) in enumerate(rows):
        if _TYPES[ty] != "purchase" or u is None or m is None:
            continue
        for state, vf, vt, version in dim.get(u, []):
            if vf <= m and (vt is None or m < vt):
                want.add((eid, state, version))
    assert got == want, (rows, got ^ want)


# --- watermark drop ledger vs a pure-Python replay ---------------------

_wm_events = st.lists(
    st.tuples(
        # Full int64 id space, not just dense small ids: sparse
        # snowflake/UUID-derived ids above 2^53 stressed the r7
        # double-division bucketing (ADVICE r7 — b1 now derives via
        # integer `div`, exact and monotone for every int64).
        st.integers(0, 2**63 - 1),        # event_id (deduped below)
        st.integers(0, 6 * 3600),         # seconds offset within 6 hours
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda e: e[0],
)


def _wm_model(rows, delay_s=1800):
    """Row-granular watermark replay in event_id order: drop iff ts is
    more than `delay_s` behind the running max of earlier arrivals."""
    out = {}
    mx = None
    for _eid, sec in sorted(rows):
        hour = sec // 3600
        acc, drop = out.get(hour, (0, 0))
        if mx is not None and sec < mx - delay_s:
            out[hour] = (acc, drop + 1)
        else:
            out[hour] = (acc + 1, drop)
        if mx is None or sec > mx:
            mx = sec
    return out


@given(rows=_wm_events)
@settings(**_SETTINGS)
def test_watermark_ledger_matches_python_replay(spark, rows):
    import datetime as dt

    from net7_etl_bus_spark.streaming.batch_equiv import _watermark_ledger

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(eid, t0 + dt.timedelta(seconds=sec)) for eid, sec in rows],
        "event_id long, ts timestamp",
    )
    got = {
        int((r.window_start - t0).total_seconds() // 3600): (r.n_accepted, r.n_dropped)
        for r in _watermark_ledger(df).collect()
    }
    assert got == _wm_model(rows)


# --- append stability: token budget + epoch shards (VERDICT r8 item 5)

# Unique doc_ids; three sources; token counts small. The appended docs
# always land in source "a" with ids disjoint from the base corpus.
_budget_corpus = st.lists(
    st.tuples(
        st.integers(0, 400),
        st.sampled_from(["a", "b", "c"]),
        st.integers(0, 40),
    ),
    min_size=2,
    max_size=25,
    unique_by=lambda r: r[0],
)
_appended_docs = st.lists(
    st.tuples(st.integers(401, 500), st.integers(0, 40)),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)

_GROWTH_SETTINGS = dict(_SETTINGS, max_examples=8)


@given(corpus=_budget_corpus, extra=_appended_docs)
@settings(**_GROWTH_SETTINGS)
def test_token_budget_append_stable_under_growth(spark, corpus, extra):
    """The op's whole reason to exist (docstring promise, now pinned):
    appending documents to source A never changes which of the OTHER
    sources' documents survive the budget — their entire ledger rows
    (cum_tokens, kept) are bit-identical before and after the append."""
    from net7_etl_bus_spark.operators.sampling import token_budget_frame

    schema = "doc_id long, source string, n_tokens long"
    base = spark.createDataFrame(list(corpus), schema)
    grown = spark.createDataFrame(
        list(corpus) + [(i, "a", t) for i, t in extra], schema
    )
    before = {
        r.doc_id: (r.cum_tokens, bool(r.kept))
        for r in token_budget_frame(base).collect()
        if r.source != "a"
    }
    after = {
        r.doc_id: (r.cum_tokens, bool(r.kept))
        for r in token_budget_frame(grown).collect()
        if r.source != "a"
    }
    assert before == after


@given(corpus=_budget_corpus, extra=_appended_docs)
@settings(**_GROWTH_SETTINGS)
def test_epoch_shards_append_shifts_only_touched_shards(spark, corpus, extra):
    """shuffle_epoch_shards' append contract (VERDICT r8 item 5): an
    appended doc never moves an existing doc to another shard, never
    reorders existing docs within a shard, and position shifts happen
    ONLY in the shards the appended docs hash into — everywhere else
    (shard, position) is bit-identical, which is what lets a restarted
    trainer resume mid-epoch after a lake append."""
    from net7_etl_bus_spark.operators.sampling import epoch_shards_frame

    schema = "doc_id long, n_tokens long"
    base_rows = epoch_shards_frame(
        spark.createDataFrame([(i, t) for i, _s, t in corpus], schema)
    ).collect()
    grown_rows = epoch_shards_frame(
        spark.createDataFrame(
            [(i, t) for i, _s, t in corpus] + list(extra), schema
        )
    ).collect()
    base_ids = {r.doc_id for r in base_rows}
    grown = {r.doc_id: r for r in grown_rows}
    touched = {grown[i].shard for i, _t in extra}
    for r in base_rows:
        assert grown[r.doc_id].shard == r.shard, "append moved a shard"
        if r.shard not in touched:
            assert grown[r.doc_id].position == r.position, (
                "append shifted a position in an untouched shard"
            )
    for sh in touched:
        orig_order = [
            r.doc_id
            for r in sorted(base_rows, key=lambda r: r.position)
            if r.shard == sh
        ]
        new_order = [
            r.doc_id
            for r in sorted(grown_rows, key=lambda r: r.position)
            if r.shard == sh and r.doc_id in base_ids
        ]
        assert orig_order == new_order, "append reordered existing docs"


# --- two-tier assignment cascade: conservation + exactness ------------
#
# The r12 ADVICE fix made _hier_assign_sq rank vectors only over
# supers that own >= 1 centroid (a trained super's Voronoi cell can be
# empty, and the inner assign join then silently dropped vectors).
# The constructed-case pin lives in test_retrieval_ml; this property
# generalizes it: for ARBITRARY vector / centroid / super relations
# (duplicates, clumps, empty cells, supers nowhere near any centroid),
# the cascade must emit EXACTLY one row per vector, every cid must be
# a real centroid id, and the assigned centroid must be the exact
# argmin WITHIN the chosen super's group (the IMI contract: tier-2
# exactness given the tier-1 choice).

_vecs2 = st.lists(
    st.lists(st.integers(-9, 9), min_size=2, max_size=2),
    min_size=1,
    max_size=8,
)
_cents2 = st.lists(
    st.lists(st.integers(-9, 9), min_size=2, max_size=2),
    min_size=1,
    max_size=6,
)
_sups2 = st.lists(
    st.lists(st.integers(-9, 9), min_size=2, max_size=2),
    min_size=1,
    max_size=4,
)


def _sq(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


@given(vecs=_vecs2, cents=_cents2, sups=_sups2)
@settings(**_SETTINGS)
def test_hier_assign_sq_conserves_and_is_groupwise_exact(
    spark, vecs, cents, sups
):
    from net7_etl_bus_spark.operators.similarity import _hier_assign_sq

    eq = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, xq array<long>"
    )
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid long, cq array<long>"
    )
    sup = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sups)], "sid long, sq array<long>"
    )
    got = {r.vec_id: r.cid for r in _hier_assign_sq(eq, cent, None, super_cent=sup).collect()}

    # conservation: exactly one assignment per vector, real cids
    assert sorted(got) == list(range(len(vecs)))
    assert all(0 <= c < len(cents) for c in got.values())

    # python model: centroid -> owning super (ties: smallest sid),
    # then each vector ranks only LIVE supers (ties: smallest sid)
    # and takes the exact argmin within that super's group
    # (ties: smallest cid)
    own = {
        ci: min(range(len(sups)), key=lambda si: (_sq(c, sups[si]), si))
        for ci, c in enumerate(cents)
    }
    live = sorted(set(own.values()))
    for vi, v in enumerate(vecs):
        s_best = min(live, key=lambda si: (_sq(v, sups[si]), si))
        group = [ci for ci in range(len(cents)) if own[ci] == s_best]
        want = min(group, key=lambda ci: (_sq(v, cents[ci]), ci))
        assert got[vi] == want, (vi, v, got[vi], want)
