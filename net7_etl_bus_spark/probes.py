"""Construction-time routing probes — THE one audited exception to
plan laziness.

Contract (VERDICT r7 item 3: three ad-hoc probe sites had accumulated;
this module makes the exception a single idiom instead of a growing
list):

* Registered queries build LAZY plans — constructing the DataFrame
  runs no Spark job. The documented exception is a *plan-shape
  routing decision that depends on the data*: e.g. "does any document
  exceed the aggregation-buffer cap?" or "does any user exceed the
  per-type event cap?". Such a choice cannot live inside one lazy
  plan without either double-executing an expensive cascade per
  branch or eagerly checkpointing it — both strictly worse than one
  bounded probe job.
* Every probe MUST be bounded: an early-exit ``limit(1)`` existence
  scan, or a re-read of an already-materialized (checkpointed)
  relation. Nothing here may collect data proportional to the input.
* All probe sites go through this module so the exception list is
  greppable: callers are ``dedup._verified_pairs``,
  ``dedup._containment_lsh_frame`` (mega-doc two-tier probes) and
  ``analytics._funnel_per_user`` (bot-user probe via
  :func:`materialized_nonempty`).

At 100 TB these probes stay cheap by construction: ``exists`` pushes
its filter to the scan and stops at the first matching row per the
``limit(1)``; ``materialized_nonempty`` reads one block of an
already-checkpointed, cap-bounded relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exists(df: DataFrame) -> bool:
    """True iff ``df`` has at least one row — one early-exit Spark job
    at plan-BUILD time (``limit(1)`` lets Spark stop scanning at the
    first hit; filters in ``df`` are pushed down to the scan)."""
    return df.limit(1).count() > 0


def materialized_nonempty(df: DataFrame) -> tuple[DataFrame, bool]:
    """Eagerly materialize a SMALL routing relation once and report
    whether it is non-empty.

    For probes whose underlying job is a full aggregation anyway
    (``limit(1)`` on top of an agg cannot short-circuit the scan),
    running the agg once and checkpointing beats probing and then
    rebuilding the same agg for routing (ADVICE r7: the funnel probe
    ran its per-(user, type) count aggregation twice). The caller must
    guarantee the relation is bounded (e.g. only users ABOVE a cap).
    localCheckpoint blocks are released when the DataFrame is GC'd —
    same pattern as the dedup cascade's edge relation.
    """
    out = df.localCheckpoint()  # eager: runs the agg exactly once
    return out, len(out.take(1)) > 0
