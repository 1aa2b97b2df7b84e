"""Stream-stream joins (event-time interval join with watermarks).

The reference's bus is strictly single-stream (one trigger queue ->
one batch pipeline; `ServiceBusWorker.cs` consumes a single
subscription), so correlating two live event flows is a capability the
analytics engine adds. The canonical example implemented here is
click->purchase attribution: every purchase joins to the same user's
clicks in the preceding attribution window.

Semantics and the 100 TB story: Spark's stream-stream inner join
buffers both sides in the state store, keyed by the equi-join key
(user_id), and the REQUIRED time-interval condition plus per-side
watermarks bound that state — rows older than
``watermark + interval`` are evicted, so state is proportional to the
traffic inside the window, never the full history. The batch twin
(:func:`net7_etl_bus_spark.streaming.batch_equiv.stream_join_attrib`)
is the ground truth the streaming run must converge to; it shuffles
both sides on user_id once and applies the interval predicate inside
the sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIB_WINDOW_MIN = 30


def stream_click_attribution(
    events: DataFrame,
    window_minutes: int = ATTRIB_WINDOW_MIN,
    watermark: str = "1 hour",
) -> DataFrame:
    """Join each purchase to the same user's clicks within the
    preceding ``window_minutes`` (inclusive on both ends).

    Both sides carry a watermark; the interval condition gives Spark
    the bound it needs to evict click state once no future purchase
    can reach it. Works identically on a batch DataFrame (no
    watermark state, plain interval join) — the registry twin uses
    exactly this function on the batch events table.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (purchases.user_id == clicks.c_user_id)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (clicks.click_ts <= purchases.purchase_ts)
    )
    return purchases.join(clicks, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
