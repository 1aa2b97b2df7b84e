"""Change-data-capture shapes: SCD type-2 history build and snapshot
diffing (SURVEY.md §2.3 additions).

The reference bus is an ingest service that upserts the latest state of
each record (`DataflowProcessor.cs` keyed MERGE semantics); these
operators cover the two standard warehouse follow-ons a user of such a
bus needs next: turning the change log into a type-2 dimension with
validity intervals, and diffing two point-in-time snapshots of the
keyed state. Both are pure DataFrame formulations — one shuffle on the
entity key each, no self-joins against the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register


@register(
    "scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER wo AS prev_state,
             ROW_NUMBER() OVER wo AS rn
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, event_type NULLS FIRST)),
    changes AS (
      SELECT user_id, state, ts, event_id FROM ordered
      WHERE rn = 1 OR state IS DISTINCT FROM prev_state)
    SELECT user_id, state, ts AS valid_from,
           LEAD(ts) OVER wc AS valid_to,
           CAST(ROW_NUMBER() OVER wc AS BIGINT) AS version,
           (LEAD(ts) OVER wc IS NULL) AS is_current
    FROM changes
    WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, state NULLS FIRST)
    """,
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    log: collapse consecutive identical states per entity, then derive
    [valid_from, valid_to) intervals, a version counter, and the
    current-row flag.

    This is the warehouse-side completion of the reference's
    latest-state upsert (`Services/DataflowProcessor.cs:214-249` keeps
    only the newest record per key; SCD2 is what you build when you
    must also answer "what was the state at time T").

    Scale shape: every window shares PARTITION BY user_id ORDER BY
    (ts, event_id), so the whole query is ONE shuffle + ONE sort per
    partition, reused across the change-collapse and interval steps.
    Per-entity history fits a window partition by construction; no
    global sort, no self-join of the log against itself.
    """
    # CDC record contract (null semantics, fuzz-pinned): a change-log
    # row MUST carry an entity key and an event time — rows without
    # either are invalid and dropped; the STATE itself may be NULL and
    # is compared null-safely (NULL -> 'a' -> NULL is three versions,
    # not one). First-row detection uses row_number, not
    # prev_state IS NULL, which is ambiguous when states can be NULL.
    # state is the final order tiebreak: event_id can be NULL in real
    # data, and without it two same-ts rows would version
    # engine-arbitrarily.
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    changes = (
        e.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lag("event_type").over(wo).alias("prev_state"),
            F.row_number().over(wo).alias("rn"),
        )
        .filter(
            (F.col("rn") == 1) | ~F.col("state").eqNullSafe(F.col("prev_state"))
        )
        .drop("prev_state", "rn")
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id", "state")
    valid_to = F.lead("ts").over(wc)
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(wc).cast("bigint").alias("version"),
        valid_to.isNull().alias("is_current"),
    )


_T1 = "2024-01-01 01:00:00"
_T2 = "2024-01-20 00:00:00"


@register(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type AS state, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST, event_type DESC NULLS LAST, value DESC NULLS LAST) AS rn_new,
             CASE WHEN ts < TIMESTAMP '{_T1}' THEN
               ROW_NUMBER() OVER (PARTITION BY user_id, (ts < TIMESTAMP '{_T1}')
                                  ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST, event_type DESC NULLS LAST, value DESC NULLS LAST)
             END AS rn_old
      FROM events WHERE ts < TIMESTAMP '{_T2}' AND user_id IS NOT NULL),
    new_snap AS (SELECT user_id, state, value FROM ranked WHERE rn_new = 1),
    old_snap AS (SELECT user_id, state, value FROM ranked WHERE rn_old = 1)
    SELECT n.user_id,
           o.state AS old_state, n.state AS new_state,
           o.value AS old_value, n.value AS new_value,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN o.state <> n.state OR o.value <> n.value THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM new_snap n LEFT JOIN old_snap o ON n.user_id = o.user_id
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two point-in-time snapshots of the keyed latest-state table
    (the relation the reference's upsert sink maintains,
    `Services/DataflowProcessor.cs:214-249`): classify every key as
    added / changed / unchanged between T1 and T2.

    Scale shape: BOTH snapshots come out of ONE scan and ONE user_id
    shuffle — a single groupBy computes max_by(state, (ts, event_id))
    twice, once gated on ts < T1 (max_by ignores rows whose ordering
    key is NULL, so the gate is a conditional aggregate, not a second
    pass). The naive two-snapshots-then-full-outer-join plan would
    scan and shuffle the log twice and join two entity-sized
    relations; this does the diff in the aggregate's output row.
    """
    # CDC record contract (same as scd2_dimension, r11 chaos find,
    # seed 7): a change-log row MUST carry an entity key. Spark's
    # one-aggregate plan groups NULL keys together while the oracle's
    # snapshot JOIN (like any SQL equi-join) never matches NULL — the
    # entity-less rows are invalid input and dropped, not diffed.
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("ts") < F.lit(_T2).cast("timestamp"))
        & F.col("user_id").isNotNull()
    )
    # The picked payload (state, value) is part of the ordering key
    # (r11 chaos find, seed 7: mutation tied two rows on (ts, event_id)
    # with different payloads and max_by picked engine-arbitrarily —
    # 12/21 output rows diverged). With the payload in the key, a
    # remaining tie means the payloads are equal too, so the pick is
    # well-defined. Null/NaN ordering is consistent: Spark struct
    # comparison treats a NULL field as smallest and NaN as greatest,
    # exactly DuckDB's DESC NULLS LAST (verified empirically r11).
    ord_key = F.struct("ts", "event_id", F.col("event_type").alias("state"), "value")
    pick = F.struct(F.col("event_type").alias("state"), "value")
    old_gate = F.when(F.col("ts") < F.lit(_T1).cast("timestamp"), ord_key)
    snap = e.groupBy("user_id").agg(
        F.max_by(pick, ord_key).alias("new"),
        F.max_by(pick, old_gate).alias("old"),
    )
    changed = (F.col("old.state") != F.col("new.state")) | (
        F.col("old.value") != F.col("new.value")
    )
    return snap.select(
        "user_id",
        F.col("old.state").alias("old_state"),
        F.col("new.state").alias("new_state"),
        F.col("old.value").alias("old_value"),
        F.col("new.value").alias("new_value"),
        F.when(F.col("old").isNull(), F.lit("added"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )


def scd2_apply_increment(dim: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Incrementally maintain the SCD2 dimension of
    :func:`scd2_dimension` from one micro-batch of new events (the
    foreachBatch body for a streaming type-2 dimension).

    Only each entity's OPEN row participates: it is replayed as a
    pseudo-event in front of the batch, the same change-collapse +
    interval windows run over that small union, and version numbers
    continue from the open row's. Closed history is untouched — the
    work per batch is O(batch + touched entities), never a rebuild.
    Batches must arrive in event-time order per entity (the queue
    contract; late data needs the batch twin rebuild).

    Equivalence with the one-shot batch build over the full log is
    pinned by test (3 sequential batches == scd2_dimension).
    """
    # Same CDC record contract as scd2_dimension (key + event time
    # required, null-safe state compare, state tiebreak) — required
    # for the incremental == rebuild invariant to hold on data with
    # nulls.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "state")
    batch = batch.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    if dim is None:
        open_rows = None
        closed = None
        seed = batch.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
            F.lit(1).cast("bigint").alias("base_version"),
        )
    else:
        open_rows = dim.filter(F.col("is_current"))
        closed = dim.filter(~F.col("is_current"))
        pseudo = open_rows.select(
            "user_id",
            "state",
            F.col("valid_from").alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),  # sorts before real ids at same ts
            F.col("version").alias("base_version"),
        )
        seed = pseudo.unionByName(
            batch.select(
                "user_id",
                F.col("event_type").alias("state"),
                "ts",
                "event_id",
                F.lit(None).cast("bigint").alias("base_version"),
            )
        )
    # change-collapse over (open row ++ batch) per entity — tiny union,
    # same logic as the batch build
    changes = (
        seed.withColumn("prev_state", F.lag("state").over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1) | ~F.col("state").eqNullSafe(F.col("prev_state"))
        )
        .drop("prev_state", "rn")
    )
    base = F.first("base_version", ignorenulls=True).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id", "state")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    valid_to = F.lead("ts").over(w)
    rebuilt = changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        (
            F.row_number().over(w) + F.coalesce(base, F.lit(1)).cast("bigint") - 1
        ).alias("version"),
        valid_to.isNull().alias("is_current"),
    )
    return rebuilt if closed is None else closed.unionByName(rebuilt)


_INC_CUT1 = "2024-01-11 00:00:00"
_INC_CUT2 = "2024-01-21 00:00:00"


@register(
    "scd2_apply_increment",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER wo AS prev_state,
             ROW_NUMBER() OVER wo AS rn
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, event_type NULLS FIRST)),
    changes AS (
      SELECT user_id, state, ts, event_id FROM ordered
      WHERE rn = 1 OR state IS DISTINCT FROM prev_state)
    SELECT user_id, state, ts AS valid_from,
           LEAD(ts) OVER wc AS valid_to,
           CAST(ROW_NUMBER() OVER wc AS BIGINT) AS version,
           (LEAD(ts) OVER wc IS NULL) AS is_current
    FROM changes
    WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, state NULLS FIRST)
    """,
)
def scd2_apply_increment_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable replay of :func:`scd2_apply_increment`: fold the
    event log through the incremental SCD2 maintainer in THREE
    event-time-ordered micro-batches (cut at fixed timestamps) and
    return the final dimension. The oracle is the ONE-SHOT batch build
    (scd2_dimension's SQL) over the same log — so a green row proves
    incremental == rebuild, the invariant every streaming type-2
    pipeline depends on.

    Scale shape: each fold touches only open rows + the batch (see
    scd2_apply_increment); in a real stream each fold's output is
    checkpointed/persisted by foreachBatch, so the three-deep lazy plan
    here is a test-harness artifact, not the production shape.
    """
    e = load_table(spark, sf_dir, "events")
    c1 = F.lit(_INC_CUT1).cast("timestamp")
    c2 = F.lit(_INC_CUT2).cast("timestamp")
    dim: DataFrame | None = None
    for batch in (
        e.filter(F.col("ts") < c1),
        e.filter((F.col("ts") >= c1) & (F.col("ts") < c2)),
        e.filter(F.col("ts") >= c2),
    ):
        dim = scd2_apply_increment(dim, batch)
    assert dim is not None
    return dim


# --- SCD2 point-in-time join ------------------------------------------

_SCD2_DIM_SQL = """

    WITH ordered AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER wo AS prev_state,
             ROW_NUMBER() OVER wo AS rn
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
      WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, event_type NULLS FIRST)),
    changes AS (
      SELECT user_id, state, ts, event_id FROM ordered
      WHERE rn = 1 OR state IS DISTINCT FROM prev_state)
    , dim AS (
      SELECT user_id, state, ts AS valid_from,
             LEAD(ts) OVER wc AS valid_to,
             CAST(ROW_NUMBER() OVER wc AS BIGINT) AS version
      FROM changes
      WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id NULLS FIRST, state NULLS FIRST))
"""


@register(
    "join_scd2_pointintime",
    oracle=_SCD2_DIM_SQL
    + """
    SELECT f.event_id, f.user_id, f.ts, f.value,
           d.state AS state_at_purchase, d.version
    FROM events f
    JOIN dim d
      ON d.user_id = f.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    WHERE f.event_type = 'purchase'
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each purchase fact matched to the
    dimension version valid AT the fact's timestamp — the query every
    SCD2 dimension exists to answer, and the reason warehouses keep
    validity intervals instead of just latest state.

    Composes scd2_dimension directly: the join is an equi-join on the
    entity key with the interval containment as a residual predicate.
    Per-entity version counts bound the multiplicity, and the interval
    filter keeps exactly one version per fact — so the join output is
    |facts| rows, never |facts| x |versions|.

    Scale shape: both sides hash-partition on user_id (one shuffle
    each); the dimension side is the collapsed change log, orders of
    magnitude smaller than the fact. No nested-loop, no broadcast of
    fact-scale data.
    """
    e = load_table(spark, sf_dir, "events")
    dim = scd2_dimension(spark, sf_dir).drop("is_current")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("f_user_id"), "ts", "value"
    )
    return facts.join(
        dim,
        (F.col("user_id") == F.col("f_user_id"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("state").alias("state_at_purchase"),
        "version",
    )
