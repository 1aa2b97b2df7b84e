"""Scale-up generator: synthesize a larger SF directory from an
existing one with GENUINE key growth (r5 verdict item 4).

The scalecheck battery replicates rows verbatim, which multiplies data
volume but NOT distinct keys — so it cannot see shuffle fan-out growth,
LSH bucket-occupancy growth, connected-component label rounds, or
vocabulary growth. This generator grows the keyspaces for real:

- every fact replica gets fresh surrogate keys (order/cust/part/supp/
  event/user/doc/vec) offset into new ranges, with foreign keys
  redrawn over the FULL grown dimension keyspace (join fan-out scales);
- documents get genuinely new token content per replica (deterministic
  ~10% vocabulary substitution with replica-unique words + rotation),
  so shingle/minhash/LSH spaces grow like a real corpus;
- embeddings get per-replica deterministic perturbations (new vectors,
  not copies), so ANN bucket occupancy grows;
- dimension domains that do NOT grow in production (region, nation,
  brands, event types, langs, return flags) are held fixed, keeping
  group-by output sizes realistic.

Everything is seeded + hash-derived — zero wall-clock, zero RNG state;
re-running produces byte-identical output. Usage:

    python scripts/gen_scale.py /root/testdata/sf0.1 scaledata/sf1 10

Output lands OUTSIDE git (scaledata/ is gitignored): ~200 MB at
factor 10. The bench evidence it produces (SCALEBENCH numbers and
exponents) is what gets committed, in SCALE.md / ROUNDLOG.md.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42


def _con(threads: int = 16) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    return con


def _copy(con, sql: str, dst: str) -> None:
    con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT parquet)")


# hash(x) in DuckDB is a stable UBIGINT; modulo keeps expressions exact.
def _h(expr: str, salt: str) -> str:
    return f"hash({expr} || '::{salt}')"


def gen_relational(src: str, dst: str, factor: int) -> None:
    """region/nation copied; customer/supplier/part/orders/lineitem/
    events grown x factor with fresh keys and redrawn foreign keys."""
    con = _con()
    t = lambda name: f"read_parquet('{src}/{name}.parquet')"
    counts = {
        name: con.execute(f"SELECT COUNT(*) FROM {t(name)}").fetchone()[0]
        for name in ("customer", "supplier", "part", "orders", "lineitem", "events")
    }
    n_cust, n_supp, n_part = counts["customer"], counts["supplier"], counts["part"]
    n_ord, n_evt = counts["orders"], counts["events"]
    n_user = con.execute(f"SELECT MAX(user_id)+1 FROM {t('events')}").fetchone()[0]

    for name in ("region", "nation"):
        _copy(con, f"SELECT * FROM {t(name)}", f"{dst}/{name}.parquet")

    reps = f"(SELECT unnest(generate_series(0, {factor - 1})) AS r) reps"

    # --- dimensions: fresh keys per replica, attributes hash-redrawn
    # within the base domains (replica 0 is the base data verbatim).
    _copy(con, f"""
        SELECT c_custkey + r * {n_cust} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + r * {n_cust} AS VARCHAR), 9, '0') AS c_name,
               CASE WHEN r = 0 THEN c_nationkey
                    ELSE CAST({_h("c_custkey + r * " + str(n_cust), "cnat")} % 25 AS INT) END AS c_nationkey,
               CASE WHEN r = 0 THEN c_acctbal
                    ELSE ROUND(({_h("c_custkey + r * " + str(n_cust), "cbal")} % 1000000) / 100.0, 2) END AS c_acctbal,
               CASE WHEN r = 0 THEN c_mktsegment
                    ELSE ['AUTOMOBILE','BUILDING','FURNITURE','MACHINERY','HOUSEHOLD']
                         [CAST({_h("c_custkey + r * " + str(n_cust), "cseg")} % 5 AS INT) + 1] END AS c_mktsegment
        FROM {t('customer')} CROSS JOIN {reps}
    """, f"{dst}/customer.parquet")

    _copy(con, f"""
        SELECT s_suppkey + r * {n_supp} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + r * {n_supp} AS VARCHAR), 9, '0') AS s_name,
               CASE WHEN r = 0 THEN s_nationkey
                    ELSE CAST({_h("s_suppkey + r * " + str(n_supp), "snat")} % 25 AS INT) END AS s_nationkey,
               CASE WHEN r = 0 THEN s_acctbal
                    ELSE ROUND(({_h("s_suppkey + r * " + str(n_supp), "sbal")} % 1000000) / 100.0, 2) END AS s_acctbal
        FROM {t('supplier')} CROSS JOIN {reps}
    """, f"{dst}/supplier.parquet")

    # p_name vocabulary (adj x noun) intentionally FIXED (brand/type/
    # size domains don't grow in production catalogs); keys + numeric
    # attrs grow.
    _copy(con, f"""
        SELECT p_partkey + r * {n_part} AS p_partkey,
               p_name,
               CASE WHEN r = 0 THEN p_brand
                    ELSE 'Brand#' || CAST({_h("p_partkey + r * " + str(n_part), "pbr")} % 20 AS VARCHAR) END AS p_brand,
               CASE WHEN r = 0 THEN p_type
                    ELSE ['ECONOMY','LARGE','MEDIUM','PROMO','SMALL','STANDARD']
                         [CAST({_h("p_partkey + r * " + str(n_part), "pty")} % 6 AS INT) + 1] END AS p_type,
               CASE WHEN r = 0 THEN p_size
                    ELSE CAST({_h("p_partkey + r * " + str(n_part), "psz")} % 50 AS INT) + 1 END AS p_size,
               CASE WHEN r = 0 THEN p_retailprice
                    ELSE ROUND(900.0 + ({_h("p_partkey + r * " + str(n_part), "prp")} % 20000) / 10.0, 1) END AS p_retailprice
        FROM {t('part')} CROSS JOIN {reps}
    """, f"{dst}/part.parquet")

    # --- orders: custkey redrawn over the FULL grown customer keyspace
    # (not base-custkey + offset) so per-customer order counts stay
    # Poisson-ish instead of replicating the base pattern x factor.
    _copy(con, f"""
        SELECT o_orderkey + r * {n_ord} AS o_orderkey,
               CASE WHEN r = 0 THEN o_custkey
                    ELSE CAST({_h("o_orderkey + r * " + str(n_ord), "ocust")} % {n_cust * factor} AS BIGINT) END AS o_custkey,
               CASE WHEN r = 0 THEN o_orderstatus
                    ELSE ['F','O','P'][CAST({_h("o_orderkey + r * " + str(n_ord), "ost")} % 3 AS INT) + 1] END AS o_orderstatus,
               CASE WHEN r = 0 THEN o_totalprice
                    ELSE ROUND(1000.0 + ({_h("o_orderkey + r * " + str(n_ord), "otp")} % 45000000) / 100.0, 2) END AS o_totalprice,
               CASE WHEN r = 0 THEN o_orderdate
                    ELSE o_orderdate + INTERVAL (CAST({_h("o_orderkey + r * " + str(n_ord), "odt")} % 57 AS INT) - 28) DAY END AS o_orderdate,
               CASE WHEN r = 0 THEN o_orderpriority
                    ELSE ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
                         [CAST({_h("o_orderkey + r * " + str(n_ord), "opr")} % 5 AS INT) + 1] END AS o_orderpriority
        FROM {t('orders')} CROSS JOIN {reps}
    """, f"{dst}/orders.parquet")

    # --- lineitem: orderkey follows its order's replica offset (line
    # clustering per order preserved); part/supp redrawn over grown
    # keyspaces; returnflag/linestatus domains fixed (agg group counts
    # stay realistic); dates shifted with their order's window.
    _copy(con, f"""
        SELECT l_orderkey + r * {n_ord} AS l_orderkey,
               CASE WHEN r = 0 THEN l_partkey
                    ELSE CAST({_h("l_orderkey + r * " + str(n_ord), "lpk")} % {n_part * factor} AS BIGINT) END AS l_partkey,
               CASE WHEN r = 0 THEN l_suppkey
                    ELSE CAST({_h("l_orderkey + r * " + str(n_ord), "lsk")} % {n_supp * factor} AS BIGINT) END AS l_suppkey,
               l_linenumber,
               CASE WHEN r = 0 THEN l_quantity
                    ELSE CAST({_h("l_orderkey*8 + l_linenumber + r", "lqt")} % 50 AS DOUBLE) + 1 END AS l_quantity,
               CASE WHEN r = 0 THEN l_extendedprice
                    ELSE ROUND(900.0 + ({_h("l_orderkey*8 + l_linenumber + r", "lep")} % 9500000) / 100.0, 2) END AS l_extendedprice,
               CASE WHEN r = 0 THEN l_discount
                    ELSE CAST({_h("l_orderkey*8 + l_linenumber + r", "ldc")} % 11 AS DOUBLE) / 100.0 END AS l_discount,
               CASE WHEN r = 0 THEN l_tax
                    ELSE CAST({_h("l_orderkey*8 + l_linenumber + r", "ltx")} % 9 AS DOUBLE) / 100.0 END AS l_tax,
               l_returnflag, l_linestatus,
               CASE WHEN r = 0 THEN l_shipdate
                    ELSE l_shipdate + INTERVAL (CAST({_h("l_orderkey + r * " + str(n_ord), "odt")} % 57 AS INT) - 28) DAY END AS l_shipdate
        FROM {t('lineitem')} CROSS JOIN {reps}
    """, f"{dst}/lineitem.parquet")

    # --- events: fresh event ids, users redrawn over the grown user
    # space, timestamps preserved (the session/window structure repeats
    # across NEW users — window key cardinality grows, grid doesn't).
    _copy(con, f"""
        SELECT event_id + r * {n_evt} AS event_id,
               ts,
               CASE WHEN r = 0 THEN user_id
                    ELSE CAST({_h("event_id + r * " + str(n_evt), "eus")} % {n_user * factor} AS BIGINT) END AS user_id,
               event_type,
               CASE WHEN r = 0 THEN value
                    ELSE ROUND(({_h("event_id + r * " + str(n_evt), "evl")} % 20000) / 100.0, 2) END AS value,
               props
        FROM {t('events')} CROSS JOIN {reps}
    """, f"{dst}/events.parquet")
    con.close()


def gen_documents(src: str, dst: str, factor: int) -> None:
    """Per-replica token mutation: ~10% of token positions substitute a
    replica-unique vocabulary word, and the token sequence rotates —
    new shingles, new minhash signatures, new n-gram space, like a
    real corpus growing (not like replication)."""
    base = pq.read_table(f"{src}/documents.parquet").to_pydict()
    n = len(base["doc_id"])
    out = {k: list(v) for k, v in base.items()}

    for r in range(1, factor):
        for i in range(n):
            did = base["doc_id"][i] + r * n
            toks = base["text"][i].split(" ")
            rot = (r * 7 + i) % max(1, len(toks))
            toks = toks[rot:] + toks[:rot]
            # seeded per (replica, doc): stable across runs
            rng = np.random.default_rng(SEED + r * 1_000_003 + i)
            for j in range(len(toks)):
                if rng.integers(0, 10) == 0:
                    toks[j] = f"w{r}q{int(rng.integers(0, 997))}"
            text = " ".join(toks)
            out["doc_id"].append(did)
            out["text"].append(text)
            out["lang"].append(base["lang"][i])
            out["source"].append(base["source"][i])
            out["n_chars"].append(len(text))

    schema = pq.read_schema(f"{src}/documents.parquet")
    pq.write_table(pa.table(out, schema=schema), f"{dst}/documents.parquet")


def gen_embeddings(src: str, dst: str, factor: int) -> None:
    """New vectors per replica: deterministic gaussian perturbation of
    the base vector (sigma 0.05 around vectors of unit-ish scale) —
    near the base cluster structure but NOT duplicates, so ANN lists,
    LSH buckets, and SemDeDup clusters grow in occupancy for real."""
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    base = tbl.to_pydict()
    n = len(base["vec_id"])
    out = {k: list(v) for k, v in base.items()}
    for r in range(1, factor):
        rng = np.random.default_rng(SEED + 7_000_003 * r)
        noise = rng.normal(0.0, 0.05, size=(n, len(base["embedding"][0] or [])))
        labels = rng.integers(0, 10, size=n)
        for i in range(n):
            emb = base["embedding"][i]
            out["vec_id"].append(base["vec_id"][i] + r * n)
            if emb is None:
                out["embedding"].append(None)
            else:
                v = np.asarray(emb, dtype=np.float32) + noise[i][: len(emb)].astype(np.float32)
                out["embedding"].append([float(x) for x in v])
            out["label"].append(int(labels[i]))
    pq.write_table(pa.table(out, schema=tbl.schema), f"{dst}/embeddings.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "scaledata/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    gen_relational(src, dst, factor)
    gen_documents(src, dst, factor)
    gen_embeddings(src, dst, factor)
    con = _con(4)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        cnt = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {cnt}")


if __name__ == "__main__":
    main()
