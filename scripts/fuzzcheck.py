"""Null-injection fuzz differential.

Builds a seeded, deterministic mirror of the testdata tables with NULLs
injected into a fraction of every (supported) column, then runs the
full Spark-vs-DuckDB differential check on the mutated mirror. Both
engines see the SAME bytes, so any divergence is a genuine cross-engine
semantics bug — default null ordering, null-in-join-key handling,
null-propagation through expressions — i.e. exactly the failure modes
real 100 TB data has and the clean synthetic fixtures never exercise.

Usage: python scripts/fuzzcheck.py [src_sf_dir] [mode] [rate] [seed] [query ...]
``mode`` is one of ``nulls`` (default), ``dupes`` (append re-keyed
content-duplicate rows — exercises dedup ops and multiplicity),
``both``, ``unicode`` (append re-keyed copies with non-ASCII edge
content in string columns — case-folding expanders, combining marks,
exotic spaces, emoji, CRLF), ``extremes`` (overwrite a fraction of
numeric cells with NaN/±Inf/±huge/±tiny/zero specials, including
float-ARRAY elements — a NaN inside a valid embedding is invisible to
IS NULL), ``skew`` (zipf-rekey a fraction of rows onto one hot key
per join/group column — one key owning ~30% of rows — the distribution
failure mode of 100× scale-ups; values are untouched, so every oracle
must still match), ``chaos`` (the stack: skew at the given rate,
then extremes 3%, then nulls 3%, then a full row-order permutation —
cross-class interactions under a shuffled physical layout), or
``boundary`` (snap a fraction of cells onto the engine's own decision
boundaries — the literal filter cutoff timestamps, BETWEEN edges,
quantity thresholds, and the 10-minute/30-minute/1-hour event-time
grids of the window operators. Random data never lands EXACTLY on a
boundary, so >= vs >, [start,end) vs (start,end], and
touching-window-coalescing divergences are invisible to every other
mode — this one manufactures ties on purpose. Values are valid
in-domain bytes seen identically by both engines: every oracle must
still match), or ``reorder`` (seeded permutation of every table's ROW
ORDER, written with small row groups — identical logical content,
different physical layout, so Spark's scan partitioning, partial-agg
order, and join build order all change. Any divergence is a real
order-dependence bug: an unsorted first()/collect_list, a float sum
that dodged dsum, a keeper without a total order. The production
reality this models: at 100 TB, file listing order and partition
assignment are never stable run-to-run), or ``split`` (same rows,
same order, but every table becomes a DIRECTORY of part files with
seeded uneven boundaries, mixed row-group sizes, and one EMPTY part
file — the multi-file steady state of any lake table; rate = number
of parts. Catches operators that assume one input file or choke on
zero-row fragments), or ``ties`` (manufacture FULLY-TIED window sort
keys with differing payloads: seeded row pairs get their primary-key
and time/date columns NULLED and the victim's FK group keys copied
from the donor — the r11 chaos-find disease class made dense. Any
divergence is a real total-order gap: an ORDER BY missing the
measure, a two-window pairing assuming row identity, a keeper
without a total order), or ``ragged`` (append re-keyed copies whose
float-ARRAY columns get LENGTH mutations — truncations incl. the
8-dim matryoshka prefix, the empty array, extensions — the
bad-embedding-writer failure mode; values stay in-domain, so any
divergence is a real dimension-handling gap: zip_with null-padding
vs indexed generate_series, fixed-subspace PQ slices, 64-bit sign
packs, len()-gated eligibility), or ``holes`` (append re-keyed copies
whose float-ARRAY columns get NULL ELEMENTS punched into seeded
positions — the missing-feature writer; lengths and values otherwise
untouched, so any divergence is a real null-element semantics gap:
EXISTS-over-holes returning NULL vs list_bool_or skipping nulls,
null-skipping list aggregates corrupting positional fingerprints,
NULL-poisoned folds silently vacating profile stats), or ``signs``
(IN-PLACE overwrite of float cells and float-array elements with
signed zeros and subnormals — -0.0 meeting +0.0 in the same
group/sort/join key, subnormal underflow, sign-preserving casts;
`extremes` emits -0.0 too but never makes the collision dense), or
``clock`` (IN-PLACE overwrite of timestamp cells with
precision/extreme specials — sub-second µs residues, the epoch and
the µs before it, the datetime64[ns] range edges, 1582/1777/9999 —
the truncation and range seams of every datetime kernel and of the
comparison harness itself), or ``tempest`` (the stacked form of the
r13 classes: clock at the given rate, then signs 3%, then nulls 3%,
then a full row-order permutation — cross-class interactions under a
shuffled physical layout, the precision-edge sibling of ``chaos``).
Exit 0 iff every checked query matches on the mutated data.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.schemas import TESTDATA_TABLES  # noqa: E402

# String columns holding STRUCTURED payloads (JSON) — excluded from
# free-text mutation; see the unicode mode comment.
_STRUCTURED_STRING_COLS = {"props"}

# Primary-key columns re-keyed for duplicated rows (lineitem keeps its
# composite unique via l_linenumber; the bumped copies become dangling
# FK rows, which both engines drop identically in joins).
_TABLE_KEYS = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_linenumber",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def mutate_table(
    src: str, dst: str, rate: float, seed: int, mode: str = "nulls"
) -> None:
    if mode == "chaos":
        # Stacked adversary: hot-key skew, then extreme numerics, then
        # NULLs — interactions between classes (a NULL on a hot key, a
        # NaN inside a skewed group) that no single class produces.
        # Rates are fixed per stage (skew uses the caller's rate; the
        # value-corruption stages use the proven per-class defaults)
        # and seeds are derived so the stack is fully reproducible.
        # Intermediate files MUST keep the table's basename: each stage
        # derives its _TABLE_KEYS protection (and its seeded rng) from
        # the filename, and losing it would let the extremes stage
        # stomp primary keys with INT_MIN/0/-1 specials — violating the
        # engine's documented key-uniqueness input contract and testing
        # the mutation, not the engine.
        base = os.path.basename(src)
        with tempfile.TemporaryDirectory(prefix="chaos_") as td:
            stages = []
            for n in ("s1", "s2", "s3"):
                p = os.path.join(td, n, base)
                os.makedirs(os.path.dirname(p))
                stages.append(p)
            mutate_table(src, stages[0], rate, seed, "skew")
            mutate_table(stages[0], stages[1], 0.03, seed + 1, "extremes")
            mutate_table(stages[1], stages[2], 0.03, seed + 2, "nulls")
            # Final stage: full row-order permutation + fragmented row
            # groups. Content-neutral (oracle values unchanged), but
            # Spark now executes the corrupted stack under a shuffled
            # physical layout too — the closest local approximation of
            # what a real cluster run actually sees.
            mutate_table(stages[2], dst, 1.0, seed + 3, "reorder")
        return
    if mode == "tempest":
        # Stacked adversary #2 (r13): the precision/edge classes
        # composed — clock at the caller's rate, then signs 3%, then
        # nulls 3%, then a full row-order permutation. `chaos` stacks
        # the distribution/corruption classes (skew/extremes/nulls);
        # this one makes the r13 interactions dense: a -0.0 beside a
        # year-9999 timestamp on the same row, a NULL overwriting a
        # sign-mutated cell, a subnormal in a window whose sort key
        # got a µs residue — all under a shuffled physical layout.
        # Same basename preservation rule as chaos: each stage derives
        # key protection and its seeded rng from the filename.
        base = os.path.basename(src)
        with tempfile.TemporaryDirectory(prefix="tempest_") as td:
            stages = []
            for n in ("s1", "s2", "s3"):
                p = os.path.join(td, n, base)
                os.makedirs(os.path.dirname(p))
                stages.append(p)
            mutate_table(src, stages[0], rate, seed, "clock")
            mutate_table(stages[0], stages[1], 0.03, seed + 1, "signs")
            mutate_table(stages[1], stages[2], 0.03, seed + 2, "nulls")
            mutate_table(stages[2], dst, 1.0, seed + 3, "reorder")
        return
    t = pq.read_table(src)
    if mode == "split":
        # Same rows, same order — but the table becomes a DIRECTORY of
        # part files with seeded uneven slice boundaries, mixed row-
        # group sizes, and one deliberately EMPTY part file. This is
        # the steady state of every lake table (a table is never one
        # file at 100 TB; empty fragments are routine after filters or
        # compaction), so every operator must be invariant to the
        # file-fragmentation of its input. rate = number of parts.
        name = os.path.basename(src).replace(".parquet", "")
        rng = np.random.default_rng(zlib.crc32(f"{name}:split:{seed}".encode()))
        n_parts = max(2, int(rate))
        os.makedirs(dst, exist_ok=True)
        cuts = sorted(
            int(v) for v in rng.integers(0, max(1, len(t)) + 1, n_parts - 1)
        )
        bounds = [0, *cuts, len(t)]
        empty_at = int(rng.integers(n_parts + 1))
        part_no = 0
        for k in range(n_parts):
            if k == empty_at:
                pq.write_table(
                    t.slice(0, 0), os.path.join(dst, f"part-{part_no:03d}.parquet")
                )
                part_no += 1
            pq.write_table(
                t.slice(bounds[k], bounds[k + 1] - bounds[k]),
                os.path.join(dst, f"part-{part_no:03d}.parquet"),
                row_group_size=int(rng.choice([97, 997, 10007])),
                use_deprecated_int96_timestamps=False,
            )
            part_no += 1
        if empty_at == n_parts:
            pq.write_table(
                t.slice(0, 0), os.path.join(dst, f"part-{part_no:03d}.parquet")
            )
        return
    if mode == "reorder":
        # Same rows, shuffled order, fragmented row groups (prime size
        # so group boundaries land differently from any source
        # layout). rate is unused: the permutation is total.
        name = os.path.basename(src).replace(".parquet", "")
        rng = np.random.default_rng(
            zlib.crc32(f"{name}:reorder:{seed}".encode())
        )
        t = t.take(pa.array(rng.permutation(len(t))))
        pq.write_table(
            t, dst, row_group_size=997, use_deprecated_int96_timestamps=False
        )
        return
    if mode == "boundary":
        # Snap cells onto the engine's own decision boundaries: the
        # literal cutoffs and grids the registered queries test
        # against. In-place, seeded, valid in-domain values — both
        # engines see identical bytes, so any divergence is a real
        # >=/>, [start,end), or touching-window semantics gap. Keys
        # untouched.
        import datetime

        name = os.path.basename(src).replace(".parquet", "")
        _D = datetime.datetime
        # Filter-cutoff dates appearing as literals in the TPC-H-ish
        # plans (q1 <=, q3 </>, q5/q6 >=/<, q14/q15 month edges ...).
        date_pool = [
            _D(1992, 1, 1), _D(1996, 1, 1), _D(1996, 3, 1), _D(1996, 3, 15),
            _D(1996, 4, 1), _D(1996, 7, 1), _D(1996, 10, 1), _D(1997, 1, 1),
            _D(1998, 1, 1), _D(1998, 3, 15), _D(1998, 9, 2), _D(1999, 1, 1),
        ]
        # Event-time cutoffs (ttl/split/cohort literals) + the window
        # grids: 10-min session gap, 30-min slide, 1-h tumble. Grid
        # snapping makes exact-gap pairs and on-the-edge window starts
        # frequent instead of measure-zero.
        ts_pool = [
            _D(2024, 1, 5), _D(2024, 1, 6), _D(2024, 1, 10), _D(2024, 1, 20),
            _D(2024, 1, 22), _D(2024, 1, 27), _D(2024, 1, 29), _D(2024, 2, 2),
        ]
        grids_s = [600, 1800, 3600]
        value_pools = {
            "l_quantity": [1.0, 10.0, 20.0, 24.0, 30.0, 40.0],
            "l_discount": [0.03, 0.05, 0.07],
            "s_acctbal": [0.0, -0.0],
            "c_acctbal": [0.0, -0.0],
        }
        for i, field in enumerate(t.schema):
            rng = np.random.default_rng(
                zlib.crc32(f"{name}:{field.name}:boundary:{seed}".encode())
            )
            mask = rng.random(len(t)) < rate
            if pa.types.is_timestamp(field.type):
                unit = field.type.unit
                vals = t.column(i).to_pylist()
                out = []
                for j, v in enumerate(vals):
                    if not mask[j] or v is None:
                        out.append(v)
                    elif field.name == "ts":
                        if rng.random() < 0.3:
                            out.append(ts_pool[int(rng.integers(len(ts_pool)))])
                        else:
                            g = grids_s[int(rng.integers(len(grids_s)))]
                            # TZ-independent: values are naive UTC wall
                            # times; never route through .timestamp().
                            epoch = int((v - _D(1970, 1, 1)).total_seconds())
                            out.append(
                                _D(1970, 1, 1)
                                + datetime.timedelta(seconds=epoch - epoch % g)
                            )
                    else:
                        out.append(date_pool[int(rng.integers(len(date_pool)))])
                t = t.set_column(
                    i, field, pa.array(out, type=pa.timestamp(unit))
                )
            elif field.name in value_pools and pa.types.is_floating(field.type):
                pool = value_pools[field.name]
                vals = t.column(i).to_pylist()
                out = [
                    pool[int(rng.integers(len(pool)))] if mask[j] and v is not None else v
                    for j, v in enumerate(vals)
                ]
                t = t.set_column(i, field, pa.array(out, type=field.type))
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode == "ties":
        # Manufacture FULLY-TIED window sort keys with DIFFERING
        # payloads — the r11 chaos-find disease class (win_running_agg
        # seed 6, cdc_snapshot_diff seed 7), made dense instead of
        # measure-zero. For seeded disjoint row PAIRS: the pair's
        # primary-key and time/date columns are NULLED on both rows
        # (the de-facto input contract: keys may be NULL — ops must
        # then filter or stay order-insensitive — while NON-NULL keys
        # stay unique, which this never violates), and the victim's
        # FK-ish group keys are COPIED from the donor so the pair
        # lands in the same window partition / join group. Result: two
        # rows identical in every partition and order column, NULL
        # order keys, original differing measures — any engine
        # divergence is a real total-order gap.
        name = os.path.basename(src).replace(".parquet", "")
        rng = np.random.default_rng(zlib.crc32(f"{name}:ties:{seed}".encode()))
        n = len(t)
        if n >= 2:
            pk = set(_TABLE_KEYS.get(name, ()))
            null_cols = {
                f.name
                for f in t.schema
                if f.name in pk
                or pa.types.is_timestamp(f.type)
                or pa.types.is_date(f.type)
                or f.name.endswith("date")
            }
            group_cols = {
                f.name
                for f in t.schema
                if f.name not in pk
                and pa.types.is_integer(f.type)
                and (f.name.endswith("key") or f.name.endswith("_id"))
            }
            n_pairs = max(1, int(n * rate / 2))
            idx = rng.choice(n, size=min(2 * n_pairs, n - (n % 2)), replace=False)
            pairs = idx.reshape(-1, 2)
            for i, field in enumerate(t.schema):
                if field.name not in null_cols and field.name not in group_cols:
                    continue
                vals = t.column(i).to_pylist()
                for a, b in pairs:
                    if field.name in null_cols:
                        vals[int(a)] = None
                        vals[int(b)] = None
                    else:
                        vals[int(b)] = vals[int(a)]
                t = t.set_column(i, field, pa.array(vals, type=field.type))
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode == "ragged":
        # Append re-keyed copies whose float-ARRAY columns get LENGTH
        # mutations: truncations (63 — off-by-one; 32; 8 — exactly the
        # matryoshka prefix dim; 1), the EMPTY array, and extensions
        # (+1, +16) built from the vector's own in-domain values (no
        # NaN/Inf — `extremes` owns value corruption; the ONLY new
        # phenomenon here is length variance). This is the
        # bad-embedding-writer failure mode at 100 TB: a model change
        # or truncating serializer ships mixed-dim vectors into a
        # corpus whose readers all assume dim=64. Every dimension-
        # sensitive kernel (zip_with null-padding vs generate_series
        # indexing, fixed-subspace PQ slices, 64-bit sign packs,
        # prefix-dim coarse scores, len()-gated eligible sets) must
        # agree cross-engine on the ragged rows. Tables without a
        # float-array column are left byte-identical.
        name = os.path.basename(src).replace(".parquet", "")
        list_cols = [
            f.name
            for f in t.schema
            if pa.types.is_list(f.type) and pa.types.is_floating(f.type.value_type)
        ]
        if list_cols:
            rng = np.random.default_rng(
                zlib.crc32(f"{name}:ragged:{seed}".encode())
            )
            idx = rng.choice(len(t), size=max(1, int(len(t) * rate)), replace=True)
            dup = t.take(pa.array(np.sort(idx)))
            for key_col in _TABLE_KEYS.get(name, ()):
                i = t.schema.get_field_index(key_col)
                maxv = pc.max(t.column(key_col)).as_py() or 0
                fresh = pa.array(
                    np.arange(maxv + 1, maxv + 1 + len(dup)),
                    type=t.schema.field(i).type,
                )
                dup = dup.set_column(i, t.schema.field(i), fresh)
            for cname in list_cols:
                i = dup.schema.get_field_index(cname)
                field = dup.schema.field(i)
                lists = dup.column(i).to_pylist()
                out = []
                for j, lv in enumerate(lists):
                    if not lv:
                        out.append(lv)
                        continue
                    lv = list(lv)
                    variant = (j + seed) % 7
                    if variant == 0:
                        lv = lv[:-1]          # off-by-one short
                    elif variant == 1:
                        lv = lv[: max(1, len(lv) // 2)]
                    elif variant == 2:
                        lv = lv[:8]           # the matryoshka prefix dim
                    elif variant == 3:
                        lv = lv[:1]
                    elif variant == 4:
                        lv = []               # empty, NOT null
                    elif variant == 5:
                        lv = lv + lv[:1]      # one element long
                    else:
                        lv = lv + lv[:16]
                    out.append(lv)
                dup = dup.set_column(i, field, pa.array(out, type=field.type))
            t = pa.concat_tables([t, dup])
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode == "signs":
        # IN-PLACE overwrite of a seeded fraction of float cells with
        # SIGNED-ZERO and SUBNORMAL specials — the IEEE edge surface
        # none of the other classes makes dense (`extremes` emits -0.0
        # and 5e-324 but one special per duplicated row, so a -0.0
        # meeting a +0.0 in the SAME group/sort/join key is
        # measure-zero there; this class manufactures the collision on
        # the ORIGINAL rows). Divergence surfaces: group-key equality
        # (Spark normalizes -0.0 to +0.0 in hash keys — does the other
        # engine?), ORDER BY ties between -0.0 and +0.0, CAST TO
        # VARCHAR sign preservation, subnormal products/sums
        # (underflow-to-zero must agree), sqrt/division on ±0.
        # float32 ARRAY elements get float32-domain subnormals
        # (5e-324 would just flush to +0.0 in a float32 lane).
        # Values are valid in-domain IEEE doubles seen identically by
        # both engines: every oracle must still match.
        name = os.path.basename(src).replace(".parquet", "")
        f64_pool = [
            -0.0, 0.0, 5e-324, -5e-324,
            2.2250738585072009e-308,   # max subnormal
            -2.2250738585072014e-308,  # -min normal
            1e-310, -1e-310,
        ]
        f32_pool = [
            -0.0, 0.0,
            1.401298464324817e-45, -1.401298464324817e-45,    # min subnormal
            1.1754942106924411e-38, -1.1754942106924411e-38,  # max subnormal
        ]
        for i, field in enumerate(t.schema):
            rng = np.random.default_rng(
                zlib.crc32(f"{name}:{field.name}:signs:{seed}".encode())
            )
            if pa.types.is_floating(field.type):
                mask = rng.random(len(t)) < rate
                vals = t.column(i).to_pylist()
                out = [
                    f64_pool[int(rng.integers(len(f64_pool)))]
                    if mask[j] and v is not None
                    else v
                    for j, v in enumerate(vals)
                ]
                t = t.set_column(i, field, pa.array(out, type=field.type))
            elif pa.types.is_list(field.type) and pa.types.is_floating(
                field.type.value_type
            ):
                mask = rng.random(len(t)) < rate
                lists = t.column(i).to_pylist()
                out = []
                for j, lv in enumerate(lists):
                    if mask[j] and lv:
                        lv = list(lv)
                        # several specials per vector, and ALWAYS a
                        # -0.0/+0.0 PAIR so zero-sign collisions inside
                        # one dot product / norm / sign-LSH bit are
                        # dense, not incidental
                        for _ in range(int(rng.integers(2, 5))):
                            lv[int(rng.integers(len(lv)))] = f32_pool[
                                int(rng.integers(len(f32_pool)))
                            ]
                        lv[j % len(lv)] = -0.0
                        lv[(j + 1) % len(lv)] = 0.0
                    out.append(lv)
                t = t.set_column(i, field, pa.array(out, type=field.type))
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode == "clock":
        # IN-PLACE overwrite of a seeded fraction of TIMESTAMP cells
        # with precision/extreme specials: sub-second microsecond
        # residues (.000001 / .999999 / .5 — the second-truncation and
        # window-grid seams), the epoch and the microsecond BEFORE it
        # (negative fractional epoch seconds — the classic
        # floor-vs-truncate integer-division divergence), the
        # datetime64[ns] range edges (2262-04-11T23:47:16.854775 is
        # the last ns-representable microsecond — anything later
        # overflows any ns-backed pandas path in the comparison
        # harness or either engine's arrow conversion), the proleptic
        # Gregorian switch (1582-10-15), and the far past/future
        # (1777, 9999-12-31T23:59:59.999999). Values are valid
        # timestamp[us] bytes seen identically by both engines: every
        # oracle must still match, and every datetime kernel (interval
        # arithmetic, date_trunc, window grids, year extraction,
        # TTL/watermark comparisons) must agree on the edges.
        import datetime

        name = os.path.basename(src).replace(".parquet", "")
        _D = datetime.datetime
        _US = datetime.timedelta(microseconds=1)
        pool = [
            _D(1582, 10, 15, 0, 0, 0),
            _D(1777, 7, 4, 12, 0, 0, 1),
            _D(1969, 12, 31, 23, 59, 59, 999999),
            _D(1970, 1, 1, 0, 0, 0),
            _D(2262, 4, 11, 23, 47, 16, 854775),  # datetime64[ns] max µs
            _D(2262, 4, 12, 0, 0, 0),             # just past ns range
            _D(9999, 12, 31, 23, 59, 59, 999999),
        ]
        for i, field in enumerate(t.schema):
            if not pa.types.is_timestamp(field.type):
                continue
            rng = np.random.default_rng(
                zlib.crc32(f"{name}:{field.name}:clock:{seed}".encode())
            )
            mask = rng.random(len(t)) < rate
            vals = t.column(i).to_pylist()
            out = []
            for j, v in enumerate(vals):
                if not mask[j] or v is None:
                    out.append(v)
                    continue
                r = rng.random()
                if r < 0.4:
                    out.append(pool[int(rng.integers(len(pool)))])
                elif r < 0.6:
                    out.append(v + _US)  # sub-second µs residue
                elif r < 0.8:
                    out.append(
                        v.replace(microsecond=999999)  # 1µs before the
                    )                                  # next second
                else:
                    out.append(v.replace(microsecond=500000))
            t = t.set_column(
                i, field, pa.array(out, type=field.type)
            )
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode == "holes":
        # Append re-keyed copies whose float-ARRAY columns get NULL
        # ELEMENTS punched into seeded positions (lengths unchanged —
        # `ragged` owns length variance; values otherwise untouched —
        # `extremes` owns NaN/Inf). A NULL inside a non-null array
        # cell is the missing-feature writer phenomenon: invisible to
        # IS NULL on the column, skipped by some engines' list
        # aggregates (DuckDB list_max) while propagating through
        # others' fold expressions (acc + NULL). Any divergence is a
        # real null-element semantics gap in the array kernels.
        name = os.path.basename(src).replace(".parquet", "")
        list_cols = [
            f.name
            for f in t.schema
            if pa.types.is_list(f.type) and pa.types.is_floating(f.type.value_type)
        ]
        if list_cols:
            rng = np.random.default_rng(
                zlib.crc32(f"{name}:holes:{seed}".encode())
            )
            idx = rng.choice(len(t), size=max(1, int(len(t) * rate)), replace=True)
            dup = t.take(pa.array(np.sort(idx)))
            for key_col in _TABLE_KEYS.get(name, ()):
                i = t.schema.get_field_index(key_col)
                maxv = pc.max(t.column(key_col)).as_py() or 0
                fresh = pa.array(
                    np.arange(maxv + 1, maxv + 1 + len(dup)),
                    type=t.schema.field(i).type,
                )
                dup = dup.set_column(i, t.schema.field(i), fresh)
            for cname in list_cols:
                i = dup.schema.get_field_index(cname)
                field = dup.schema.field(i)
                lists = dup.column(i).to_pylist()
                out = []
                for j, lv in enumerate(lists):
                    if not lv:
                        out.append(lv)
                        continue
                    lv = list(lv)
                    # 1-3 holes per vector at seeded positions; every
                    # third vector additionally gets a LEADING hole
                    # (position-0 edge) and every fifth an all-null
                    # vector (the degenerate case)
                    if (j + seed) % 5 == 4:
                        lv = [None] * len(lv)
                    else:
                        for h in range(1 + (j + seed) % 3):
                            lv[(j * 7 + h * 13) % len(lv)] = None
                        if (j + seed) % 3 == 2:
                            lv[0] = None
                    out.append(lv)
                dup = dup.set_column(i, field, pa.array(out, type=field.type))
            t = pa.concat_tables([t, dup])
        pq.write_table(t, dst, use_deprecated_int96_timestamps=False)
        return
    if mode in ("dupes", "both"):
        # Append a seeded sample of CONTENT duplicates with FRESH keys
        # (max+1..): the real 100 TB duplication phenomenon — re-crawled
        # pages, retried ingests — same payload under a new identity.
        # Key uniqueness (the engine's documented contract: duplicate
        # PRIMARY keys are ill-defined input — two copies of one
        # event_id break any total order identically-arbitrarily in
        # both engines) is preserved, so every divergence is a real
        # content-duplicate-handling bug, and dedup operators get
        # exercised on exactly what they exist for.
        rng = np.random.default_rng(
            zlib.crc32(f"{os.path.basename(src)}:dupes:{seed}".encode())
        )
        idx = rng.choice(len(t), size=max(1, int(len(t) * rate)), replace=True)
        dup = t.take(pa.array(np.sort(idx)))
        name = os.path.basename(src).replace(".parquet", "")
        for key_col in _TABLE_KEYS.get(name, ()):
            i = t.schema.get_field_index(key_col)
            maxv = pc.max(t.column(key_col)).as_py() or 0
            fresh = pa.array(
                np.arange(maxv + 1, maxv + 1 + len(dup)), type=t.schema.field(i).type
            )
            dup = dup.set_column(i, t.schema.field(i), fresh)
        t = pa.concat_tables([t, dup])
    if mode == "unicode":
        # Append re-keyed copies whose STRING columns get non-ASCII
        # edge content mixed in: case-folding expanders (İ ß ﬁ),
        # combining marks, non-breaking/ideographic spaces, emoji,
        # CRLF. Hunts cross-engine divergence in lower()/regex/split/
        # length/md5 semantics on real-world text — pure-ASCII
        # fixtures can never reach those paths.
        rng = np.random.default_rng(
            zlib.crc32(f"{os.path.basename(src)}:unicode:{seed}".encode())
        )
        idx = rng.choice(len(t), size=max(1, int(len(t) * rate)), replace=True)
        dup = t.take(pa.array(np.sort(idx)))
        name = os.path.basename(src).replace(".parquet", "")
        for key_col in _TABLE_KEYS.get(name, ()):
            i = t.schema.get_field_index(key_col)
            maxv = pc.max(t.column(key_col)).as_py() or 0
            fresh = pa.array(
                np.arange(maxv + 1, maxv + 1 + len(dup)), type=t.schema.field(i).type
            )
            dup = dup.set_column(i, t.schema.field(i), fresh)
        snips = [
            "İstanbul STRASSE ß", "ﬁne ﬂow", "café́", "ＡＢＣ　ｄｅｆ",
            "日本語 テスト", "🙂🙃 emoji", "a b c", "line\r\nbreak",
            "Ꭰ ᏣᎳᎩ", "Σίσυφος ΣΊΣΥΦΟΣ",
        ]
        for i, field in enumerate(dup.schema):
            if field.type != pa.string() and field.type != pa.large_string():
                continue
            if field.name in _STRUCTURED_STRING_COLS:
                # Structured payloads (JSON) are NOT free text: junk
                # suffixes make them malformed, and malformed-JSON
                # handling is a DOCUMENTED engine difference (Spark's
                # Jackson parses the leading document; DuckDB's parser
                # is strict) - see fn_json's docstring. Mutating them
                # tests the mutation, not the engine.
                continue
            col = dup.column(i).to_pylist()
            mutated = [
                None if v is None else f"{v} {snips[(j + seed) % len(snips)]}"
                for j, v in enumerate(col)
            ]
            dup = dup.set_column(i, field, pa.array(mutated, type=field.type))
        t = pa.concat_tables([t, dup])
    if mode == "extremes":
        # Append re-keyed copies with EXTREME numerics mixed into
        # float columns (NaN, +/-Inf, denormals, huge magnitudes) and
        # boundary values into non-key integer columns. A single NaN
        # in a 100 TB metric column is a statistical certainty; the
        # engines must agree on aggregation, ordering and filtering of
        # these rows.
        rng = np.random.default_rng(
            zlib.crc32(f"{os.path.basename(src)}:extremes:{seed}".encode())
        )
        idx = rng.choice(len(t), size=max(1, int(len(t) * rate)), replace=True)
        dup = t.take(pa.array(np.sort(idx)))
        name = os.path.basename(src).replace(".parquet", "")
        keys = set(_TABLE_KEYS.get(name, ()))
        for key_col in keys:
            i = t.schema.get_field_index(key_col)
            maxv = pc.max(t.column(key_col)).as_py() or 0
            fresh = pa.array(
                np.arange(maxv + 1, maxv + 1 + len(dup)), type=t.schema.field(i).type
            )
            dup = dup.set_column(i, t.schema.field(i), fresh)
        f_specials = [float("nan"), float("inf"), float("-inf"), 1e300,
                      -1e300, 5e-324, -0.0, 1e18]
        i_specials = [0, -1, 2**31 - 1, -(2**31), 2**53 + 1, -(2**53) - 1]
        for i, field in enumerate(dup.schema):
            if field.name in keys:
                continue
            if pa.types.is_floating(field.type):
                vals = [f_specials[(j + seed) % len(f_specials)] for j in range(len(dup))]
                dup = dup.set_column(i, field, pa.array(vals, type=field.type))
            elif pa.types.is_integer(field.type) and not field.name.endswith("key"):
                vals = [i_specials[(j + seed) % len(i_specials)] for j in range(len(dup))]
                try:
                    dup = dup.set_column(i, field, pa.array(vals, type=field.type))
                except (pa.ArrowInvalid, OverflowError):
                    pass  # narrower int type: keep original values
            elif pa.types.is_list(field.type) and pa.types.is_floating(
                field.type.value_type
            ):
                # float arrays (embeddings): one special ELEMENT per
                # duplicated vector — a NaN inside an otherwise-valid
                # vector is the realistic corruption (a non-null column
                # cell hides it from IS NULL checks entirely).
                lists = dup.column(i).to_pylist()
                out = []
                for j, lv in enumerate(lists):
                    if lv:
                        lv = list(lv)
                        lv[j % len(lv)] = f_specials[(j + seed) % len(f_specials)]
                    out.append(lv)
                dup = dup.set_column(i, field, pa.array(out, type=field.type))
        t = pa.concat_tables([t, dup])
    if mode == "skew":
        # Zipf-style rekey: a seeded `rate` fraction of rows in every
        # JOIN/GROUP key column (FK-ish integer columns — never the
        # table's primary key, whose uniqueness is the engine's
        # documented input contract) is overwritten with that column's
        # MIN value — one hot key owning ~rate of the table. Values
        # are EXISTING keys, so FK joins still match and both engines
        # see the same bytes: every oracle must still hash-match, but
        # Spark now exercises its skew machinery (AQE skew-join
        # splits, hot hash-agg groups, one monster order/user/part) —
        # the distribution failure mode of a 100x scale-up, which
        # value-corruption fuzzing never touches.
        name = os.path.basename(src).replace(".parquet", "")
        pks = set(_TABLE_KEYS.get(name, ()))
        for i, field in enumerate(t.schema):
            if field.name in pks or not pa.types.is_integer(field.type):
                continue
            if not (field.name.endswith("key") or field.name == "user_id"):
                continue
            col = t.column(i)
            hot = pc.min(col).as_py()
            if hot is None:
                continue
            rng = np.random.default_rng(
                zlib.crc32(f"{os.path.basename(src)}:skew:{field.name}:{seed}".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            col = pc.if_else(
                mask, pa.scalar(hot, type=field.type), col.combine_chunks()
            )
            t = t.set_column(i, field, col)
    if mode in ("nulls", "both"):
        cols = []
        for i, field in enumerate(t.schema):
            col = t.column(i)
            # zlib.crc32 (not hash()) so the mask is stable across processes.
            rng = np.random.default_rng(
                zlib.crc32(f"{os.path.basename(src)}:{field.name}:{seed}".encode())
            )
            mask = pa.array(rng.random(len(t)) < rate)
            try:
                col = pc.if_else(
                    mask, pa.scalar(None, type=field.type), col.combine_chunks()
                )
            except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                pass  # nested/unsupported type: leave column untouched
            cols.append(col)
        t = pa.table(cols, schema=t.schema)
    pq.write_table(t, dst, use_deprecated_int96_timestamps=False)


def main() -> int:
    argv = sys.argv[1:]
    src_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.001"
    rest = argv[1:] if argv and os.path.isdir(argv[0]) else argv
    _MODES = (
        "nulls", "dupes", "both", "unicode", "extremes", "skew", "chaos",
        "boundary", "reorder", "split", "ties", "ragged", "holes",
        "signs", "clock", "tempest",
    )
    mode = rest[0] if rest and rest[0] in _MODES else "nulls"
    rest = rest[1:] if rest and rest[0] in _MODES else rest
    rate = float(rest[0]) if rest and rest[0].replace(".", "").isdigit() else 0.03
    rest = rest[1:] if rest and rest[0].replace(".", "").isdigit() else rest
    seed = int(rest[0]) if rest and rest[0].isdigit() else 0
    only = rest[1:] if rest and rest[0].isdigit() else rest

    with tempfile.TemporaryDirectory(prefix="fuzzsf_") as dst_dir:
        for t in TESTDATA_TABLES:
            mutate_table(
                os.path.join(src_dir, f"{t}.parquet"),
                os.path.join(dst_dir, f"{t}.parquet"),
                rate,
                seed,
                mode,
            )
        print(
            f"# mutated mirror mode={mode} rate={rate} seed={seed}: {dst_dir}",
            flush=True,
        )
        import diffcheck

        sys.argv = ["diffcheck.py", dst_dir, *only]
        return diffcheck.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
