"""Measure bpe_train_frame's driver round trips, wall time, and
skip-conflicts ACCEPTANCE RATE as the batch size M grows (VERDICT r11
item 4): r11 measured n_batch=16 at 6.9x/5.5x fewer collects; the
acceptance rule's docstring predicts diminishing returns as candidate
interaction rises with M — this sweep puts a number on where.

Instrumentation is external (monkeypatched DataFrame.collect counter +
a _bpe_disjoint_batch wrapper recording candidates-seen vs accepted),
so the measured code path is byte-identical to production.

Usage: python scripts/bpesweep.py [sf_dir] [n_merges] [M ...]
Defaults: scaledata/sf1 (the 9k-word-vocab mirror), 120 merges,
M in {1, 16, 64, 256}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.operators import text  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def run_one(docs: DataFrame, n_merges: int, n_batch: int) -> dict:
    counts = {"collects": 0, "cands_seen": 0, "accepted": 0, "rounds": 0}
    # patch the INSTANCE class (pyspark.sql.classic.dataframe.DataFrame
    # under Spark 4) — the pyspark.sql.DataFrame parent's collect is
    # overridden there and never dispatches
    cls = type(docs)
    orig_collect = cls.collect
    orig_batch = text._bpe_disjoint_batch

    def counting_collect(self):
        counts["collects"] += 1
        return orig_collect(self)

    def counting_batch(cands, room):
        out = orig_batch(cands, room)
        counts["rounds"] += 1
        # accept_rate counters cover only rounds whose acceptance was
        # NOT capped by the remaining-merges room (len(out) == room
        # means the loop may have stopped for room, not conflicts —
        # counting such a round deflates the rate artificially; ADVICE
        # r12: the previous code counted ALL rounds while the comment
        # claimed otherwise, biasing the SCALE.md r12 table).
        if len(out) < room:
            counts["cands_seen"] += len(cands)
            counts["accepted"] += len(out)
        return out

    cls.collect = counting_collect
    text._bpe_disjoint_batch = counting_batch
    t0 = time.monotonic()
    try:
        merges = text.bpe_train_frame(docs, n_merges, n_batch=n_batch)
        got = merges.count()
    finally:
        cls.collect = orig_collect
        text._bpe_disjoint_batch = orig_batch
    wall = time.monotonic() - t0
    # acceptance rate over rounds that actually had a full candidate
    # slate to conflict within (the last round is usually truncated by
    # the remaining-merges room, which caps accepted artificially —
    # counting_batch excludes room-capped rounds from both counters)
    return {
        "n_batch": n_batch,
        "merges": int(got),
        "collects": counts["collects"],
        "rounds": counts["rounds"],
        "cands_seen": counts["cands_seen"],
        "accepted": counts["accepted"],
        "accept_rate": round(counts["accepted"] / max(1, counts["cands_seen"]), 3),
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "scaledata", "sf1")
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    ms = [int(a) for a in sys.argv[3:]] or [1, 16, 64, 256]
    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents")
    # warm-up: the session's FIRST training run absorbs JVM/codegen
    # warm-up (measured ~3x on the first row regardless of which M
    # runs first) — burn it on a short untimed run
    run_one(docs, 24, 8)
    for m in ms:
        print(json.dumps(run_one(docs, n_merges, m)), flush=True)


if __name__ == "__main__":
    main()
