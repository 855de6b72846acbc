"""analytics submodule part03 (mechanical split of the former functions/analytics.py — see __init__.py)."""

from __future__ import annotations
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum
from document_extractor_ray.functions.bucketing import fold_partials
from document_extractor_ray.functions.analytics.part00 import HLL_DAILY_REGISTERS_SQL, HLL_M, Q3_CUTOFF, Q3_SEGMENT, _fmix64_sql, _hll_hash, _join_partitions, _n_blocks, _read, _to_cents, _ts_us, hll_daily_registers  # noqa: E501
from document_extractor_ray.functions.analytics.part01 import KMV_K  # noqa: E501
from document_extractor_ray.functions.analytics.part02 import INGEST_LATENESS_SQL, _HLL_ALPHA_DEN_A, _HLL_ALPHA_DEN_B, _HLL_ALPHA_NUM, ingest_lateness_audit  # noqa: E501



# ---------------------------------------------------------------------------
# Denormalized order fact mart (the ETL join-orchestration artifact)
# ---------------------------------------------------------------------------

def order_fact_mart(sf_dir: str):
    """One denormalized fact row per order: order attributes, the
    customer/nation/region dimension strings, and the lineitem
    measures (line count, total quantity, discounted revenue) — the
    star-schema mart build every warehouse ETL runs nightly.

    Scale plan, in join-size order: the three dimension tables
    (customer → nation → region) are composed into ONE broadcast
    lookup (strings attached to orders inside map_batches — never a
    dim shuffle); the single big×big exchange is the partitioned hash
    join lineitem ⋈ orders on the order key; measures aggregate AFTER
    the join grouped by the orderkey plus its functionally-dependent
    attached columns (the q3_shipping plan — aggregating before the
    join would trip Ray 2.49's empty-schema-block bug)."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    n_idx = pc.index_in(cust["c_nationkey"], value_set=nat["n_nationkey"])
    r_idx = pc.index_in(nat["n_regionkey"].take(n_idx), value_set=reg["r_regionkey"])
    dim = {
        "ck": cust["c_custkey"].combine_chunks(),
        "c_name": cust["c_name"].combine_chunks(),
        "nation": nat["n_name"].take(n_idx).combine_chunks(),
        "region": reg["r_name"].take(r_idx).combine_chunks(),
    }
    dref = state.broadcast(dim)

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def attach(t: pa.Table) -> pa.Table:
        d = state.cached_get(dref)
        idx = pc.index_in(t["o_custkey"], value_set=d["ck"])
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "o_total_cents": _to_cents(t["o_totalprice"]),
                "c_name": d["c_name"].take(idx),
                "nation": d["nation"].take(idx),
                "region": d["region"].take(idx),
            }
        )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty_centi": _to_cents(t["l_quantity"]),
                "disc_cents": _to_cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                ),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = li.map_batches(slim, batch_format="pyarrow").join(
        orders.map_batches(attach, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return (
        bucketed_agg(
            joined,
            ["l_orderkey", "o_orderdate", "o_total_cents", "c_name", "nation",
             "region"],
            [
                ("one", "sum", "n_lines"),
                ("qty_centi", "sum", "sum_qty_centi"),
                ("disc_cents", "sum", "revenue_cents"),
            ],
        )
        .sort("l_orderkey")
        .map_batches(_ts_us("o_orderdate"), batch_format="pyarrow")
    )


ORDER_FACT_MART_SQL = """
SELECT l.l_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS o_total_cents,
       c.c_name, n.n_name AS nation, r.r_name AS region,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l.l_quantity * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_qty_centi,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1, 2, 3, 4, 5, 6
ORDER BY 1
"""


WATERMARK_DELAYS_DAYS = (1, 7, 30, 90)


def watermark_tradeoff(sf_dir: str, delays_days: tuple = WATERMARK_DELAYS_DAYS):
    """The watermark decision table built on ingest_lateness_audit:
    for each candidate watermark delay D, how many arrivals would be
    dropped (late_us > D) and the completeness permille — pick the
    smallest D meeting the completeness SLO.

    Scale shape: streams the per-arrival lateness pipeline once and
    folds a |delays|-row partial per block — the corpus-sized lateness
    table never lands anywhere."""
    lateness = ingest_lateness_audit(sf_dir)
    delays_us = [int(d) * 86_400_000_000 for d in delays_days]

    def partial(t: pa.Table) -> pa.Table:
        late = t["late_us"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "delay_days": pa.array(list(delays_days), pa.int64()),
                "n_p": pa.array([len(late)] * len(delays_us), pa.int64()),
                "d_p": pa.array(
                    [int((late > d).sum()) for d in delays_us], pa.int64()
                ),
            }
        )

    fold: dict[int, list] = {}
    for tb in map(
        ray.get,
        lateness.map_batches(partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for d, n, dr in zip(
            tb["delay_days"].to_pylist(), tb["n_p"].to_pylist(), tb["d_p"].to_pylist()
        ):
            cur = fold.setdefault(int(d), [0, 0])
            cur[0] += int(n)
            cur[1] += int(dr)
    ds_ = sorted(fold)
    return pa.table(
        {
            "delay_days": pa.array(ds_, pa.int64()),
            "n_arrivals": pa.array([fold[d][0] for d in ds_], pa.int64()),
            "n_dropped": pa.array([fold[d][1] for d in ds_], pa.int64()),
            "completeness_permille": pa.array(
                [(fold[d][0] - fold[d][1]) * 1000 // fold[d][0] for d in ds_],
                pa.int64(),
            ),
        }
    )


WATERMARK_TRADEOFF_SQL = f"""
WITH l AS ({INGEST_LATENESS_SQL.replace('ORDER BY o_orderkey', '')})
SELECT CAST(d.d AS BIGINT) AS delay_days,
       CAST(count(*) AS BIGINT) AS n_arrivals,
       CAST(sum(CASE WHEN l.late_us > d.d * 86400000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_dropped,
       CAST((count(*) - sum(CASE WHEN l.late_us > d.d * 86400000000
                                 THEN 1 ELSE 0 END)) * 1000 // count(*)
         AS BIGINT) AS completeness_permille
FROM l CROSS JOIN (SELECT unnest([{", ".join(str(d) for d in WATERMARK_DELAYS_DAYS)}]) AS d) d
GROUP BY d.d ORDER BY delay_days
"""


# ---------------------------------------------------------------------------
# Per-customer order rank (high-cardinality grouped window)
# ---------------------------------------------------------------------------

def order_rank_in_customer(sf_dir: str):
    """Every order's rank within ITS CUSTOMER's history by value
    (row_number over PARTITION BY custkey ORDER BY cents, orderkey)
    plus the customer's order count — the high-cardinality cousin of
    order_value_pct_by_nation: ~1 group per customer, so no broadcast
    histogram fits; instead ONE custkey-hash shuffle co-locates each
    customer's orders and a single vectorized lexsort ranks every
    group in the partition at once (no per-group Python, no global
    sort).  Arrow blocks out (PERF step 37)."""
    from document_extractor_ray import state  # noqa: F401  (plan parity)

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    n_parts = _n_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _to_cents(t["o_totalprice"]),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def rank_partition(g: pd.DataFrame) -> pa.Table:
        cust = g["o_custkey"].to_numpy().astype(np.int64)
        cents = g["cents"].to_numpy().astype(np.int64)
        keys = g["o_orderkey"].to_numpy().astype(np.int64)
        order = np.lexsort((keys, cents, cust))
        cust_s, cents_s, keys_s = cust[order], cents[order], keys[order]
        # rank = position within the customer's contiguous run
        first = np.searchsorted(cust_s, cust_s, side="left")
        rank = np.arange(len(g)) - first + 1
        counts = np.searchsorted(cust_s, cust_s, side="right") - first
        return pa.table(
            {
                "o_orderkey": pa.array(keys_s, pa.int64()),
                "o_custkey": pa.array(cust_s, pa.int64()),
                "cents": pa.array(cents_s, pa.int64()),
                "rank_in_customer": pa.array(rank.astype(np.int64), pa.int64()),
                "n_orders_cust": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_partition, batch_format="pandas")
        .sort("o_orderkey")
    )


ORDER_RANK_IN_CUSTOMER_SQL = """
SELECT o_orderkey, o_custkey, cents,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY cents, o_orderkey) AS BIGINT)
         AS rank_in_customer,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
         AS n_orders_cust
FROM (SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Fulfilment lag histogram (lineitem ⋈ orders + time-lag banding)
# ---------------------------------------------------------------------------

def ship_lag_histogram(sf_dir: str):
    """Distribution of fulfilment lag (l_shipdate − o_orderdate, whole
    days, bucketed by week) per order priority — the logistics SLA
    histogram, and another shape the engine must do well: a big×big
    key join whose output immediately folds into a calendar-bounded
    aggregate.

    Scale plan: both sides column-slimmed in map_batches before the
    ONE partitioned hash join; the (priority × week) aggregate is a
    bounded ``bucketed_agg`` after the join (q3 plan — never an
    aggregate feeding a join)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def slim_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    def slim_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "ord_us": pc.cast(t["o_orderdate"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = li.map_batches(slim_li, batch_format="pyarrow").join(
        orders.map_batches(slim_o, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    day_us = 86_400_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        lag_days = pc.divide(
            pc.subtract(t["ship_us"], t["ord_us"]), pa.scalar(day_us, pa.int64())
        )
        week = pc.divide(lag_days, pa.scalar(7, pa.int64()))
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "lag_week": pc.cast(week, pa.int64()),
                "one": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    return bucketed_agg(
        joined.map_batches(bucketize, batch_format="pyarrow"),
        ["o_orderpriority", "lag_week"],
        [("one", "sum", "n_lines")],
    ).sort(["o_orderpriority", "lag_week"])


SHIP_LAG_HISTOGRAM_SQL = """
SELECT o.o_orderpriority,
       CAST(date_diff('day', o.o_orderdate, l.l_shipdate) // 7 AS BIGINT)
         AS lag_week,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Referential-integrity audit over the star schema's FK edges
# ---------------------------------------------------------------------------

_FK_LI_EDGES = (
    ("lineitem.l_orderkey", "l_orderkey", "orders"),
    ("lineitem.l_partkey", "l_partkey", "part"),
    ("lineitem.l_suppkey", "l_suppkey", "supplier"),
)


def fk_orphan_audit(sf_dir: str):
    """Referential-integrity audit: for each FK edge of the star schema
    (lineitem→orders/part/supplier, orders→customer) count child rows,
    distinct child keys, orphan rows and distinct orphan keys — the
    pre-ingest contract check every warehouse load runs.

    Scale plan: parent key sets are dimension-sized (customer, part,
    supplier) or fact-boundary-sized (orders) → ONE sorted numpy key
    array per edge in the object store (``state.broadcast``); the three
    lineitem edges are FUSED into a single column-pruned pass (one
    read, three vectorized searchsorted membership tests per batch).
    Distinct counts fold per-block ``np.unique`` partials on the driver
    (bounded by parent cardinality + orphan count — PERF-32 rule); at
    10^12-row child scale the same per-block partials route through
    ``functions/bucketing.bucketed_agg`` instead (key-per-row rule)."""
    from document_extractor_ray import state

    def _parent_keys(name: str, col: str) -> np.ndarray:
        ds = _read(sf_dir, name, columns=[col])
        arrs = [
            t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            for t in map(ray.get, ds.to_arrow_refs())
            if t.num_rows
        ]
        return np.unique(np.concatenate(arrs)) if arrs else np.zeros(0, np.int64)

    refs = {
        name: state.broadcast(_parent_keys(name, col))
        for name, col in (
            ("customer", "c_custkey"),
            ("orders", "o_orderkey"),
            ("part", "p_partkey"),
            ("supplier", "s_suppkey"),
        )
    }

    def _edge_partial(edge: str, keys: np.ndarray, parent: np.ndarray) -> dict:
        if len(parent):
            idx = np.searchsorted(parent, keys)
            idx_c = np.minimum(idx, len(parent) - 1)
            present = (idx < len(parent)) & (parent[idx_c] == keys)
        else:
            present = np.zeros(len(keys), bool)
        orphan = keys[~present]
        return {
            "edge": edge,
            "child_rows": len(keys),
            "orphan_rows": int(len(orphan)),
            "uniq_blob": np.unique(keys).tobytes(),
            "orphan_blob": np.unique(orphan).tobytes(),
        }

    def _rows_table(rows: list) -> pa.Table:
        return pa.table(
            {
                "edge": pa.array([r["edge"] for r in rows], pa.string()),
                "child_rows": pa.array([r["child_rows"] for r in rows], pa.int64()),
                "orphan_rows": pa.array([r["orphan_rows"] for r in rows], pa.int64()),
                "uniq_blob": pa.array([r["uniq_blob"] for r in rows], pa.binary()),
                "orphan_blob": pa.array([r["orphan_blob"] for r in rows], pa.binary()),
            }
        )

    def li_partial(t: pa.Table) -> pa.Table:
        return _rows_table(
            [
                _edge_partial(
                    edge,
                    t[col].to_numpy(zero_copy_only=False).astype(np.int64),
                    state.cached_get(refs[pname]),
                )
                for edge, col, pname in _FK_LI_EDGES
            ]
        )

    def orders_partial(t: pa.Table) -> pa.Table:
        return _rows_table(
            [
                _edge_partial(
                    "orders.o_custkey",
                    t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    state.cached_get(refs["customer"]),
                )
            ]
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    partials = [
        t
        for src in (
            li.map_batches(li_partial, batch_format="pyarrow"),
            orders.map_batches(orders_partial, batch_format="pyarrow"),
        )
        for t in map(ray.get, src.to_arrow_refs())
        if t.num_rows
    ]

    acc: dict = {}
    for t in partials:
        for r in range(t.num_rows):
            edge = t["edge"][r].as_py()
            a = acc.setdefault(edge, {"rows": 0, "orph": 0, "uniq": [], "ouniq": []})
            a["rows"] += t["child_rows"][r].as_py()
            a["orph"] += t["orphan_rows"][r].as_py()
            a["uniq"].append(np.frombuffer(t["uniq_blob"][r].as_py(), np.int64))
            a["ouniq"].append(np.frombuffer(t["orphan_blob"][r].as_py(), np.int64))

    edges = sorted(acc)
    return pa.table(
        {
            "edge": pa.array(edges, pa.string()),
            "child_rows": pa.array([acc[e]["rows"] for e in edges], pa.int64()),
            "child_keys": pa.array(
                [len(np.unique(np.concatenate(acc[e]["uniq"]))) for e in edges],
                pa.int64(),
            ),
            "orphan_rows": pa.array([acc[e]["orph"] for e in edges], pa.int64()),
            "orphan_keys": pa.array(
                [len(np.unique(np.concatenate(acc[e]["ouniq"]))) for e in edges],
                pa.int64(),
            ),
        }
    )


FK_ORPHAN_AUDIT_SQL = """
WITH edges AS (
  SELECT 'lineitem.l_orderkey' AS edge, l_orderkey AS k,
         CAST(l_orderkey IN (SELECT o_orderkey FROM orders) AS INT) AS hit
  FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey', l_partkey,
         CAST(l_partkey IN (SELECT p_partkey FROM part) AS INT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey', l_suppkey,
         CAST(l_suppkey IN (SELECT s_suppkey FROM supplier) AS INT)
  FROM lineitem
  UNION ALL
  SELECT 'orders.o_custkey', o_custkey,
         CAST(o_custkey IN (SELECT c_custkey FROM customer) AS INT)
  FROM orders
)
SELECT edge,
       CAST(count(*) AS BIGINT) AS child_rows,
       CAST(count(DISTINCT k) AS BIGINT) AS child_keys,
       CAST(count(*) FILTER (WHERE hit = 0) AS BIGINT) AS orphan_rows,
       CAST(count(DISTINCT k) FILTER (WHERE hit = 0) AS BIGINT) AS orphan_keys
FROM edges GROUP BY edge ORDER BY edge
"""


# ---------------------------------------------------------------------------
# Smoothed target encoding of a categorical column
# ---------------------------------------------------------------------------

TARGET_ENC_SMOOTH_M = 20


def mktseg_target_encoding(sf_dir: str, m: int = TARGET_ENC_SMOOTH_M):
    """Smoothed target encoding of ``c_mktsegment`` against order value
    (the classic categorical-feature encoder): enc = (sum + m·μ_global)
    / (n + m), expressed as ONE integer rational in micro-cents so the
    oracle is bit-exact — enc_micro = 10^6·(sum_cents·G_n + m·G_sum)
    // ((n + m)·G_n) with G_n/G_sum the global count/sum.

    Scale plan: customer dim broadcast once (``state.lookup_join``),
    per-block (segment → count, cents) partials fold on the driver
    (5 segments — bounded, PERF-32), encode math in Python ints (the
    HUGEINT-sized product cannot overflow)."""
    from document_extractor_ray import state

    cust_parts = [
        t
        for t in map(
            ray.get,
            _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_arrow_refs(),
        )
        if t.num_rows
    ]
    dim = pa.concat_tables(cust_parts).combine_chunks()
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["c_mktsegment"])
        slim = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "cents": _to_cents(t["o_totalprice"]),
            }
        )
        return slim.group_by("c_mktsegment").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    acc: dict = {}
    for t in map(ray.get, orders.map_batches(partial, batch_format="pyarrow").to_arrow_refs()):
        if not t.num_rows:
            continue
        for seg, s, n in zip(
            t["c_mktsegment"].to_pylist(),
            t["cents_sum"].to_pylist(),
            t["cents_count"].to_pylist(),
        ):
            cur = acc.setdefault(seg, [0, 0])
            cur[0] += s
            cur[1] += n

    g_sum = sum(v[0] for v in acc.values())
    g_n = sum(v[1] for v in acc.values())
    segs = sorted(acc)
    enc = [
        (1_000_000 * (acc[s][0] * g_n + m * g_sum)) // ((acc[s][1] + m) * g_n)
        for s in segs
    ]
    return pa.table(
        {
            "c_mktsegment": pa.array(segs, pa.string()),
            "n_orders": pa.array([acc[s][1] for s in segs], pa.int64()),
            "sum_cents": pa.array([acc[s][0] for s in segs], pa.int64()),
            "enc_micro": pa.array(enc, pa.int64()),
        }
    )


MKTSEG_TARGET_ENCODING_SQL = f"""
WITH seg AS (
  SELECT c_mktsegment,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
g AS (
  SELECT CAST(sum(n_orders) AS BIGINT) AS g_n,
         CAST(sum(sum_cents) AS BIGINT) AS g_sum
  FROM seg
)
SELECT c_mktsegment, n_orders, sum_cents,
       CAST((1000000::HUGEINT * (sum_cents::HUGEINT * g_n
                                 + {TARGET_ENC_SMOOTH_M} * g_sum))
            // ((n_orders + {TARGET_ENC_SMOOTH_M})::HUGEINT * g_n) AS BIGINT)
         AS enc_micro
FROM seg, g
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error (MASE) over the daily order series
# ---------------------------------------------------------------------------

MASE_SEASON_DAYS = 7


def forecast_mase(sf_dir: str, season: int = MASE_SEASON_DAYS):
    """Mean absolute scaled error of the seasonal-naive forecast
    (ŷ_d = y_{d−7}) for the daily order-count series — the baseline
    every demand-forecast evaluation is scaled against.  MASE =
    mean|y_d − y_{d−7}| / mean|y_d − y_{d−1}| ships as ONE truncating
    integer rational, mase_micro = 10⁶·sum7·n1 // (n7·sum1); the
    component sums/counts are emitted so the reader can re-derive it.
    Lags are CALENDAR lags (a day with no day−k observation is
    skipped), so sparse series stay well-defined.

    Scale shape: the (day → count) histogram folds from per-block
    partials on the driver (calendar-bounded — PERF-32); everything
    after is pure integer math on a vector the size of the horizon."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate([([], "count_all")])
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )

    n7 = sum7 = n1 = sum1 = 0
    for d, n in hist.items():
        if d - season in hist:
            n7 += 1
            sum7 += abs(n - hist[d - season])
        if d - 1 in hist:
            n1 += 1
            sum1 += abs(n - hist[d - 1])
    mase_micro = (1_000_000 * sum7 * n1) // (n7 * sum1) if n7 and sum1 else 0
    return pa.table(
        {
            "n_days": pa.array([len(hist)], pa.int64()),
            "n_pairs_seasonal": pa.array([n7], pa.int64()),
            "sum_abs_err_seasonal": pa.array([sum7], pa.int64()),
            "n_pairs_naive": pa.array([n1], pa.int64()),
            "sum_abs_err_naive": pa.array([sum1], pa.int64()),
            "mase_micro": pa.array([mase_micro], pa.int64()),
        }
    )


FORECAST_MASE_SQL = f"""
WITH h AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
p AS (
  SELECT h.day, h.n, s.n AS n7, o.n AS n1
  FROM h
  LEFT JOIN h s ON s.day = h.day - {MASE_SEASON_DAYS}
  LEFT JOIN h o ON o.day = h.day - 1
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(count(n7) AS BIGINT) AS n_pairs_seasonal,
         CAST(COALESCE(sum(abs(n - n7)), 0) AS BIGINT) AS sum_abs_err_seasonal,
         CAST(count(n1) AS BIGINT) AS n_pairs_naive,
         CAST(COALESCE(sum(abs(n - n1)), 0) AS BIGINT) AS sum_abs_err_naive
  FROM p
)
SELECT n_days, n_pairs_seasonal, sum_abs_err_seasonal, n_pairs_naive,
       sum_abs_err_naive,
       CAST(CASE WHEN n_pairs_seasonal > 0 AND sum_abs_err_naive > 0
                 THEN (1000000::HUGEINT * sum_abs_err_seasonal * n_pairs_naive)
                      // (n_pairs_seasonal::HUGEINT * sum_abs_err_naive)
                 ELSE 0 END AS BIGINT) AS mase_micro
FROM t
"""




# ---------------------------------------------------------------------------
# Z-order (Morton) layout audit: multi-column locality vs zone pruning
# ---------------------------------------------------------------------------

ZORDER_BITS = 16
ZORDER_FINE_MORTON = 1024   # fine-zone granularity the partials fold at
ZORDER_FINE_NATURAL = 64
ZORDER_TARGET_ZONES = 64    # coarse zones per layout (data-scaled)


def zorder_layout_audit(sf_dir: str):
    """Would re-laying lineitem out in z-order help partkey scans?
    Interleave the low 16 bits of (l_partkey, l_suppkey) into a Morton
    code and compare zone-map pruning of a ``l_partkey`` band predicate
    under the NATURAL layout (zones = l_orderkey key ranges — the
    insertion order, where every zone spans the whole partkey domain
    and nothing prunes) against the Z-ORDER layout (zones = morton key
    ranges, partkey-localized).  Four quartile bands of the partkey
    domain are probed; a zone is touched unless its partkey min/max
    misses the band entirely.  Zone width is DATA-SCALED to ~64 zones:
    range = fine · ceil((max_key + 1) / (64 · fine)), so the audit is
    meaningful at every sf (a fixed width degenerates to one zone on
    small domains); integer-division composition (a//b)//c == a//(b·c)
    makes the fine→coarse fold exact on both engines.

    Scale shape: ONE column-pruned pass computes both zone keys per
    row and folds (fine zone → partkey min/max, key max, count)
    partials — bounded by key-domain/fine slots — on the driver; the
    coarsening and the audit are driver math over those bounded maps."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pm = p & 0xFFFF
        sm = s & 0xFFFF
        m = np.zeros(len(p), np.int64)
        for i in range(ZORDER_BITS):
            m |= ((pm >> i) & 1) << (2 * i)
            m |= ((sm >> i) & 1) << (2 * i + 1)
        out = []
        for layout, key, fine in (
            ("natural", o, ZORDER_FINE_NATURAL),
            ("morton", m, ZORDER_FINE_MORTON),
        ):
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "zone": pa.array(key // fine, pa.int64()),
                        "pk": pa.array(p, pa.int64()),
                        "key": pa.array(key, pa.int64()),
                    }
                ),
                ["zone"],
            ).aggregate(
                [("pk", "min"), ("pk", "max"), ("key", "max"), ([], "count_all")]
            )
            out.append(
                pa.table(
                    {
                        "layout": pa.array([layout] * g.num_rows, pa.string()),
                        "zone": g["zone"],
                        "mn": g["pk_min"],
                        "mx": g["pk_max"],
                        "kmx": g["key_max"],
                        "n": pc.cast(g["count_all"], pa.int64()),
                    }
                )
            )
        # exact per-band selectivity needs the partkey histogram
        h = pa.TableGroupBy(pa.table({"pk": pa.array(p, pa.int64())}), ["pk"]).aggregate(
            [([], "count_all")]
        )
        out.append(
            pa.table(
                {
                    "layout": pa.array(["__hist__"] * h.num_rows, pa.string()),
                    "zone": h["pk"],
                    "mn": h["pk"],
                    "mx": h["pk"],
                    "kmx": h["pk"],
                    "n": pc.cast(h["count_all"], pa.int64()),
                }
            )
        )
        return pa.concat_tables(out)

    fine_zones: dict = {"natural": {}, "morton": {}}
    key_max = {"natural": 0, "morton": 0}
    pk_hist: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for lay, z, mn, mx, kmx, n in zip(
            t["layout"].to_pylist(), t["zone"].to_pylist(),
            t["mn"].to_pylist(), t["mx"].to_pylist(),
            t["kmx"].to_pylist(), t["n"].to_pylist(),
        ):
            if lay == "__hist__":
                pk_hist[z] = pk_hist.get(z, 0) + n
            else:
                cur = fine_zones[lay].setdefault(z, [mn, mx, 0])
                cur[0] = min(cur[0], mn)
                cur[1] = max(cur[1], mx)
                cur[2] += n
                key_max[lay] = max(key_max[lay], kmx)

    fines = {"natural": ZORDER_FINE_NATURAL, "morton": ZORDER_FINE_MORTON}
    zones: dict = {}
    for lay, fz in fine_zones.items():
        fine = fines[lay]
        mult = (key_max[lay] + ZORDER_TARGET_ZONES * fine) // (
            ZORDER_TARGET_ZONES * fine
        )
        merged: dict = {}
        for z, (mn, mx, n) in fz.items():
            cz = z // mult
            cur = merged.setdefault(cz, [mn, mx, 0])
            cur[0] = min(cur[0], mn)
            cur[1] = max(cur[1], mx)
            cur[2] += n
        zones[lay] = merged

    mx_pk = max(pk_hist) if pk_hist else 0
    bounds = [((mx_pk + 1) * i) // 4 for i in range(5)]
    out = {k: [] for k in (
        "layout", "band", "lo", "hi", "n_zones", "zones_touched",
        "rows_touched", "rows_selected",
    )}
    for lay in ("morton", "natural"):
        zs = zones[lay]
        for b in range(4):
            lo, hi = bounds[b], bounds[b + 1]
            touched = [(mn, mx, n) for mn, mx, n in zs.values()
                       if not (mx < lo or mn >= hi)]
            out["layout"].append(lay)
            out["band"].append(b)
            out["lo"].append(lo)
            out["hi"].append(hi)
            out["n_zones"].append(len(zs))
            out["zones_touched"].append(len(touched))
            out["rows_touched"].append(sum(n for _, _, n in touched))
            out["rows_selected"].append(
                sum(n for pk, n in pk_hist.items() if lo <= pk < hi)
            )
    return pa.table(
        {
            "layout": pa.array(out["layout"], pa.string()),
            "band": pa.array(out["band"], pa.int64()),
            "lo": pa.array(out["lo"], pa.int64()),
            "hi": pa.array(out["hi"], pa.int64()),
            "n_zones": pa.array(out["n_zones"], pa.int64()),
            "zones_touched": pa.array(out["zones_touched"], pa.int64()),
            "rows_touched": pa.array(out["rows_touched"], pa.int64()),
            "rows_selected": pa.array(out["rows_selected"], pa.int64()),
        }
    )


def _zorder_sql() -> str:
    morton = " + ".join(
        f"(((l_partkey & 65535) >> {i}) & 1) * {1 << (2 * i)}"
        f" + (((l_suppkey & 65535) >> {i}) & 1) * {1 << (2 * i + 1)}"
        for i in range(ZORDER_BITS)
    )
    tz = ZORDER_TARGET_ZONES
    fm = ZORDER_FINE_MORTON
    fn = ZORDER_FINE_NATURAL
    return f"""
WITH rows_z AS (
  SELECT l_orderkey, l_partkey, ({morton}) AS morton FROM lineitem
),
rng AS (
  SELECT {fn} * ((max(l_orderkey) + {tz * fn}) // {tz * fn}) AS r_nat,
         {fm} * ((max(morton) + {tz * fm}) // {tz * fm}) AS r_mor
  FROM rows_z
),
z AS (
  SELECT 'natural' AS layout, l_orderkey // rng.r_nat AS zone,
         min(l_partkey) AS mn, max(l_partkey) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM rows_z CROSS JOIN rng GROUP BY 1, 2
  UNION ALL
  SELECT 'morton', morton // rng.r_mor,
         min(l_partkey), max(l_partkey), CAST(count(*) AS BIGINT)
  FROM rows_z CROSS JOIN rng GROUP BY 1, 2
),
b AS (
  SELECT band,
         ((mx_pk + 1) * band) // 4 AS lo,
         ((mx_pk + 1) * (band + 1)) // 4 AS hi
  FROM (SELECT max(l_partkey) AS mx_pk FROM lineitem)
  CROSS JOIN (SELECT unnest(range(0, 4)) AS band)
),
sel AS (
  SELECT b.band, CAST(count(*) AS BIGINT) AS rows_selected
  FROM lineitem JOIN b ON l_partkey >= b.lo AND l_partkey < b.hi
  GROUP BY 1
)
SELECT z.layout, CAST(b.band AS BIGINT) AS band,
       CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS n_zones,
       CAST(sum(CASE WHEN z.mx < b.lo OR z.mn >= b.hi THEN 0 ELSE 1 END)
            AS BIGINT) AS zones_touched,
       CAST(sum(CASE WHEN z.mx < b.lo OR z.mn >= b.hi THEN 0 ELSE z.n END)
            AS BIGINT) AS rows_touched,
       CAST(COALESCE(any_value(sel.rows_selected), 0) AS BIGINT)
         AS rows_selected
FROM z CROSS JOIN b LEFT JOIN sel ON sel.band = b.band
GROUP BY z.layout, b.band, b.lo, b.hi
ORDER BY layout, band
"""


ZORDER_LAYOUT_AUDIT_SQL = _zorder_sql()


# ---------------------------------------------------------------------------
# KMV set-operation estimates vs exact (union / intersection of user sets)
# ---------------------------------------------------------------------------

def kmv_set_ops_audit(sf_dir: str, k: int = KMV_K):
    """Fifth sketch audit: estimate |A∪B| and |A∩B| of the user sets of
    the first vs second half of the event horizon from K-minimum-value
    sketches (Beyer et al. 2007) and put the estimates NEXT TO the
    exact counts in one row.  Union: (K−1)·2^64 // h_K over the merged
    bottom-K; intersection: matches·union_est // K where matches counts
    union-bottom-K hashes present in BOTH sets — all integer, so the
    oracle replicates the sketch bit-for-bit (same fmix64 HUGEINT
    chain as the HLL/KMV register oracles).

    Scale shape: pass 1 folds the day extent (min/max); pass 2 folds
    per-block distinct (window, user) partials — bounded by user
    cardinality; at open-keyspace scale the same partials feed the
    mergeable bottom-K resolve of ``kmv_registers`` instead and the
    exact columns drop out (that is the point of the sketch)."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def extent(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64()))
        return pa.table(
            {
                "mn": pa.array([pc.min(day).as_py()], pa.int64()),
                "mx": pa.array([pc.max(day).as_py()], pa.int64()),
            }
        )

    mn = mx = None
    for t in map(
        ray.get, ds.map_batches(extent, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for a, b in zip(t["mn"].to_pylist(), t["mx"].to_pylist()):
            mn = a if mn is None else min(mn, a)
            mx = b if mx is None else max(mx, b)
    mid = (mn + mx + 1) // 2

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64())
        ).to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        win = (day >= mid).astype(np.int64)
        pairs = np.unique(np.stack([win, u], axis=1), axis=0)
        return pa.table(
            {
                "win": pa.array(pairs[:, 0], pa.int64()),
                "user_id": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    sets = {0: [], 1: []}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        w = t["win"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        sets[0].append(u[w == 0])
        sets[1].append(u[w == 1])
    a = np.unique(np.concatenate(sets[0])) if sets[0] else np.zeros(0, np.int64)
    b = np.unique(np.concatenate(sets[1])) if sets[1] else np.zeros(0, np.int64)
    union = np.union1d(a, b)
    inter = np.intersect1d(a, b)

    ha = set(int(x) for x in _hll_hash(a.astype(np.uint64)))
    hb = set(int(x) for x in _hll_hash(b.astype(np.uint64)))
    hu = sorted(ha | hb)
    if len(hu) >= k:
        hk = hu[k - 1]
        union_est = ((k - 1) << 64) // hk
        matches = sum(1 for h in hu[:k] if h in ha and h in hb)
        inter_est = (matches * union_est) // k
        jac_micro = (1_000_000 * matches) // k
    else:
        union_est = len(hu)
        matches = len(ha & hb)
        inter_est = matches
        jac_micro = (1_000_000 * matches) // len(hu) if hu else 0

    return pa.table(
        {
            "n_a": pa.array([len(a)], pa.int64()),
            "n_b": pa.array([len(b)], pa.int64()),
            "n_union_exact": pa.array([len(union)], pa.int64()),
            "n_inter_exact": pa.array([len(inter)], pa.int64()),
            "kmv_union_est": pa.array([union_est], pa.int64()),
            "kmv_inter_est": pa.array([inter_est], pa.int64()),
            "kmv_jaccard_micro": pa.array([jac_micro], pa.int64()),
        }
    )


def _kmv_set_ops_sql() -> str:
    mid = (
        "(SELECT (min(epoch_us(ts) // 86400000000)"
        " + max(epoch_us(ts) // 86400000000) + 1) // 2 FROM events)"
    )
    win = f"CASE WHEN epoch_us(ts) // 86400000000 >= {mid} THEN 1 ELSE 0 END"
    return f"""
WITH {_fmix64_sql("user_id", win, "win")},
d AS (SELECT DISTINCT win, h FROM h5),
du AS (SELECT DISTINCT h FROM d),
bk AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM du),
uni AS (SELECT CAST(count(*) AS BIGINT) AS n FROM du),
kth AS (SELECT h AS hk FROM bk WHERE rank = {KMV_K}),
mt AS (
  SELECT CAST(count(*) AS BIGINT) AS matches
  FROM bk WHERE rank <= {KMV_K}
    AND h IN (SELECT h FROM d WHERE win = 0)
    AND h IN (SELECT h FROM d WHERE win = 1)
),
ex AS (
  SELECT CAST(count(DISTINCT CASE WHEN win = 0 THEN user_id END) AS BIGINT) AS n_a,
         CAST(count(DISTINCT CASE WHEN win = 1 THEN user_id END) AS BIGINT) AS n_b,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_union_exact
  FROM (SELECT {win} AS win, user_id FROM events)
),
ix AS (
  SELECT CAST(count(*) AS BIGINT) AS n_inter_exact FROM (
    SELECT user_id FROM (SELECT DISTINCT {win} AS win, user_id FROM events)
    GROUP BY user_id HAVING count(*) = 2)
),
est AS (
  SELECT CASE WHEN uni.n >= {KMV_K}
              THEN CAST(({(KMV_K - 1) << 64}::HUGEINT) // (SELECT hk FROM kth)
                   AS BIGINT)
              ELSE uni.n END AS kmv_union_est,
         mt.matches
  FROM uni, mt
)
SELECT ex.n_a, ex.n_b, ex.n_union_exact, ix.n_inter_exact,
       est.kmv_union_est,
       CAST(CASE WHEN (SELECT n FROM uni) >= {KMV_K}
                 THEN (est.matches::HUGEINT * est.kmv_union_est) // {KMV_K}
                 ELSE est.matches END AS BIGINT) AS kmv_inter_est,
       CAST(CASE WHEN (SELECT n FROM uni) >= {KMV_K}
                 THEN (1000000 * est.matches) // {KMV_K}
                 WHEN (SELECT n FROM uni) > 0
                 THEN (1000000 * est.matches) // (SELECT n FROM uni)
                 ELSE 0 END AS BIGINT) AS kmv_jaccard_micro
FROM ex, ix, est
"""


KMV_SET_OPS_AUDIT_SQL = _kmv_set_ops_sql()


# ---------------------------------------------------------------------------
# Theil inequality index with between/within group decomposition
# ---------------------------------------------------------------------------

def value_theil_decomp(sf_dir: str):
    """Theil-T inequality of event value (cents) decomposed by
    event_type: per-type within-group Theil T_g = Σ x·(L(x·n_g) −
    L(S_g)) / S_g plus '__total__' and '__between__' summary rows —
    the decomposable alternative to the Gini ops (between + weighted
    within ≈ total, the additivity Gini lacks).  L(v) = round(ln v ·
    10⁶) micro-nats; every division is the convention-proof floor
    (a − ((a % n + n) % n)) // n so the two engines agree even if a
    rounded numerator dips negative.

    Scale shape: everything derives from the shared (type, cents)
    histogram fold (bounded by types × distinct cents; bucketed_agg
    is the open-domain escalation), then pure driver integer math."""
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "cents": _to_cents(t["value"])}),
            ["event_type", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"],
        "n",
        max_keys=2_000_000,
    )

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    types = sorted({et for et, _ in hist})
    n_tot = sum(hist.values())
    s_tot = sum(c * n for (_, c), n in hist.items())

    rows = []
    num_btw = 0
    for et in types:
        items = [(c, n) for (e, c), n in hist.items() if e == et]
        n_g = sum(n for _, n in items)
        s_g = sum(c * n for c, n in items)
        num_g = sum(n * c * (L(c * n_g) - L(s_g)) for c, n in items if c > 0)
        rows.append((et, n_g, s_g, fdiv(num_g, s_g)))
        num_btw += s_g * (L(s_g * n_tot) - L(s_tot * n_g))

    num_tot = sum(
        n * c * (L(c * n_tot) - L(s_tot)) for (_, c), n in hist.items() if c > 0
    )
    rows.append(("__between__", n_tot, s_tot, fdiv(num_btw, s_tot)))
    rows.append(("__total__", n_tot, s_tot, fdiv(num_tot, s_tot)))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "sum_cents": pa.array([r[2] for r in rows], pa.int64()),
            "theil_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


VALUE_THEIL_DECOMP_SQL = """
WITH h AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS n_g,
         CAST(sum(cents * n) AS BIGINT) AS s_g
  FROM h GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n_tot, CAST(sum(s_g) AS BIGINT) AS s_tot
  FROM g
),
withing AS (
  SELECT h.event_type,
         CAST(sum(h.n * h.cents
                  * (CAST(round(ln(h.cents * g.n_g) * 1000000) AS BIGINT)
                     - CAST(round(ln(g.s_g) * 1000000) AS BIGINT)))
              AS HUGEINT) AS num
  FROM h JOIN g USING (event_type)
  WHERE h.cents > 0
  GROUP BY 1
),
per_type AS (
  SELECT g.event_type, g.n_g AS n_events, g.s_g AS sum_cents,
         CAST((w.num - ((w.num % g.s_g + g.s_g) % g.s_g)) // g.s_g AS BIGINT)
           AS theil_micro
  FROM g JOIN withing w USING (event_type)
),
btw AS (
  SELECT CAST(sum(g.s_g::HUGEINT
                  * (CAST(round(ln(g.s_g * t.n_tot) * 1000000) AS BIGINT)
                     - CAST(round(ln(t.s_tot * g.n_g) * 1000000) AS BIGINT)))
              AS HUGEINT) AS num
  FROM g CROSS JOIN tot t
),
total AS (
  SELECT CAST(sum(h.n * h.cents
                  * (CAST(round(ln(h.cents * t.n_tot) * 1000000) AS BIGINT)
                     - CAST(round(ln(t.s_tot) * 1000000) AS BIGINT)))
              AS HUGEINT) AS num
  FROM h CROSS JOIN tot t
  WHERE h.cents > 0
)
SELECT event_type, n_events, sum_cents, theil_micro FROM per_type
UNION ALL
SELECT '__between__', t.n_tot, t.s_tot,
       CAST((b.num - ((b.num % t.s_tot + t.s_tot) % t.s_tot)) // t.s_tot
            AS BIGINT)
FROM tot t, btw b
UNION ALL
SELECT '__total__', t.n_tot, t.s_tot,
       CAST((x.num - ((x.num % t.s_tot + t.s_tot) % t.s_tot)) // t.s_tot
            AS BIGINT)
FROM tot t, total x
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test over the daily revenue series
# ---------------------------------------------------------------------------

def orders_mann_kendall(sf_dir: str):
    """Mann-Kendall monotone-trend test of daily order revenue — the
    nonparametric companion of events_trend_slope (no distributional
    assumption, robust to outliers): S = Σ_{i<j} sign(y_j − y_i) over
    the day-ordered series, the tie-corrected variance numerator
    var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), and Kendall's tau_a in
    micro units via the convention-proof floor division (S can be
    negative; DuckDB ``//`` truncates, Python floors).

    Scale shape: the (day → cents) series folds from per-block
    partials (calendar-bounded); the O(n²) pairwise sign sum runs
    vectorized on the driver over that bounded series (2.4k days →
    5.8M int8 comparisons, microseconds)."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(
            pa.table({"day": day, "cents": _to_cents(t["o_totalprice"])}), ["day"]
        ).aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "cents"
    )

    days = sorted(series)
    y = np.array([series[d] for d in days], dtype=np.int64)
    n = len(y)
    s_stat = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
    _, tie_counts = np.unique(y, return_counts=True)
    ties = tie_counts[tie_counts > 1].astype(object)
    var18 = n * (n - 1) * (2 * n + 5) - int(
        sum(t * (t - 1) * (2 * t + 5) for t in ties)
    )
    denom = n * (n - 1)
    num = 2_000_000 * s_stat
    tau_micro = (num - ((num % denom + denom) % denom)) // denom if denom else 0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s_stat": pa.array([s_stat], pa.int64()),
            "var18": pa.array([var18], pa.int64()),
            "tau_micro": pa.array([tau_micro], pa.int64()),
        }
    )


ORDERS_MANN_KENDALL_SQL = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM d a JOIN d b ON b.day > a.day
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
t AS (
  SELECT CAST(COALESCE(sum(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT) AS corr
  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY y
        HAVING count(*) > 1)
)
SELECT n.n AS n_days, s.s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.corr AS BIGINT) AS var18,
       CAST((2000000 * s.s_stat
             - (((2000000 * s.s_stat) % (n.n * (n.n - 1))
                 + n.n * (n.n - 1)) % (n.n * (n.n - 1))))
            // (n.n * (n.n - 1)) AS BIGINT) AS tau_micro
FROM s, n, t
"""


# ---------------------------------------------------------------------------
# Price elasticity: per-brand OLS slope of quantity on discount
# ---------------------------------------------------------------------------

def discount_qty_elasticity(sf_dir: str):
    """Per-brand least-squares slope of line quantity on discount
    (permille) — does discounting move volume?  The slope ships as the
    exact integer pair (slope_num, slope_den) = (n·Σxy − Σx·Σy,
    n·Σxx − (Σx)²) plus a floor-proof micro quotient, the
    events_trend_slope convention.

    Scale shape: part dim broadcast once (``state.lookup_join``),
    per-block per-brand moment partials (n, Σx, Σy, Σxy, Σxx) fold on
    the driver (25 brands — bounded, PERF-32)."""
    from document_extractor_ray import state

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "l_partkey", d, "p_partkey", ["p_brand"])
        x = pc.cast(
            pc.round(pc.multiply(t["l_discount"], 1000.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        y = pc.cast(
            pc.round(t["l_quantity"], round_mode="half_towards_infinity"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "p_brand": t["p_brand"],
                    "x": pa.array(x, pa.int64()),
                    "y": pa.array(y, pa.int64()),
                    "xy": pa.array(x * y, pa.int64()),
                    "xx": pa.array(x * x, pa.int64()),
                }
            ),
            ["p_brand"],
        ).aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "sx": g["x_sum"],
                "sy": g["y_sum"],
                "sxy": g["xy_sum"],
                "sxx": g["xx_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_discount", "l_quantity"])
    acc: dict = {}
    for t in map(
        ray.get, li.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for br, sx, sy, sxy, sxx, n in zip(
            t["p_brand"].to_pylist(), t["sx"].to_pylist(), t["sy"].to_pylist(),
            t["sxy"].to_pylist(), t["sxx"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(br, [0, 0, 0, 0, 0])
            cur[0] += sx
            cur[1] += sy
            cur[2] += sxy
            cur[3] += sxx
            cur[4] += n

    brands = sorted(acc)
    num = [acc[b][4] * acc[b][2] - acc[b][0] * acc[b][1] for b in brands]
    den = [acc[b][4] * acc[b][3] - acc[b][0] * acc[b][0] for b in brands]
    micro = [
        ((1_000_000 * nu) - (((1_000_000 * nu) % de + de) % de)) // de if de else 0
        for nu, de in zip(num, den)
    ]
    return pa.table(
        {
            "p_brand": pa.array(brands, pa.string()),
            "n_lines": pa.array([acc[b][4] for b in brands], pa.int64()),
            "slope_num": pa.array(num, pa.int64()),
            "slope_den": pa.array(den, pa.int64()),
            "slope_micro": pa.array(micro, pa.int64()),
        }
    )


DISCOUNT_QTY_ELASTICITY_SQL = """
WITH m AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_discount * 1000.0) AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sy,
         CAST(sum(CAST(round(l_discount * 1000.0) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxy,
         CAST(sum(CAST(round(l_discount * 1000.0) AS BIGINT)
                  * CAST(round(l_discount * 1000.0) AS BIGINT)) AS BIGINT) AS sxx
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_brand, n AS n_lines,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0 ELSE
         (1000000::HUGEINT * (n * sxy - sx * sy)
          - (((1000000::HUGEINT * (n * sxy - sx * sy))
              % (n * sxx - sx * sx) + (n * sxx - sx * sx))
             % (n * sxx - sx * sx)))
         // (n * sxx - sx * sx) END AS BIGINT) AS slope_micro
FROM m ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Overdispersion (variance/mean) of per-user daily event counts
# ---------------------------------------------------------------------------

def user_day_overdispersion(sf_dir: str):
    """Index of dispersion D = s²/x̄ of active per-(user, day) event
    counts per event_type — the Poisson-overdispersion diagnostic that
    decides between Poisson and negative-binomial count models.
    D ships as one integer rational: dispersion_micro =
    10⁶·(n·Σc² − (Σc)²) // ((n−1)·Σc) (numerator ≥ 0, truncation
    safe).

    Scale shape: the (user, day, type) count is a key-per-row
    aggregate → routed through ``bucketed_agg`` (CLAUDE.md rule), then
    a bounded per-type moment fold on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(
            pa.table(
                {"user_id": t["user_id"], "day": day, "event_type": t["event_type"]}
            ),
            ["user_id", "day", "event_type"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "day": g["day"],
                "event_type": g["event_type"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "day", "event_type"],
        [("c_part", "sum", "c")],
    )

    def moments(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "c": t["c"],
                    "c2": pa.array(c * c, pa.int64()),
                }
            ),
            ["event_type"],
        ).aggregate([("c", "sum"), ("c2", "sum"), ([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["c_sum"],
                "s2": g["c2_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, cells.map_batches(moments, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for et, s, s2, n in zip(
            t["event_type"].to_pylist(), t["s"].to_pylist(),
            t["s2"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(et, [0, 0, 0])
            cur[0] += s
            cur[1] += s2
            cur[2] += n

    types = sorted(acc)
    disp = [
        (1_000_000 * (acc[e][2] * acc[e][1] - acc[e][0] * acc[e][0]))
        // ((acc[e][2] - 1) * acc[e][0])
        if acc[e][2] > 1 and acc[e][0] > 0
        else 0
        for e in types
    ]
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_cells": pa.array([acc[e][2] for e in types], pa.int64()),
            "sum_c": pa.array([acc[e][0] for e in types], pa.int64()),
            "sum_c2": pa.array([acc[e][1] for e in types], pa.int64()),
            "dispersion_micro": pa.array(disp, pa.int64()),
        }
    )


USER_DAY_OVERDISPERSION_SQL = """
WITH c AS (
  SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM c GROUP BY 1
)
SELECT event_type, n AS n_cells, s AS sum_c, s2 AS sum_c2,
       CAST(CASE WHEN n > 1 AND s > 0
                 THEN (1000000::HUGEINT * (n * s2 - s * s))
                      // ((n - 1)::HUGEINT * s)
                 ELSE 0 END AS BIGINT) AS dispersion_micro
FROM a ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Join-order cost audit: exact intermediate cardinalities per plan
# ---------------------------------------------------------------------------

def join_order_cost_audit(sf_dir: str):
    """The optimizer's question, answered exactly: for the Q3 join
    (customer segment × order date × lineitem shipdate) compare the
    intermediate-result cardinalities of the two join orders —
    dim-first ((orders ⋈ customer) ⋈ lineitem) vs fact-first
    ((lineitem ⋈ orders) ⋈ customer).  Emits filtered input sizes,
    per-step output rows and the summed intermediate cost per plan;
    the gap between the two costs is the price of a bad join order.

    Scale shape: the plans are NOT executed — every cardinality is a
    broadcast-semi-join COUNT (filtered key sets via ray.put, pc.is_in
    count folds per block), exactly the statistics pass a planner
    would run; no join output is materialized anywhere."""
    from document_extractor_ray import state

    cutoff_us = int(
        pa.scalar(Q3_CUTOFF, pa.string()).cast(pa.timestamp("us")).value
    )

    cset_parts = [
        t
        for t in map(
            ray.get,
            _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
            .map_batches(
                lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT)).select(
                    ["c_custkey"]
                ),
                batch_format="pyarrow",
            )
            .to_arrow_refs(),
        )
        if t.num_rows
    ]
    cset = (
        np.unique(
            np.concatenate(
                [t["c_custkey"].to_numpy(zero_copy_only=False) for t in cset_parts]
            )
        )
        if cset_parts
        else np.zeros(0, np.int64)
    )
    n_c = len(cset)
    cset_ref = state.broadcast(cset.astype(np.int64))

    def o_partial(t: pa.Table) -> pa.Table:
        keep = pc.less(pc.cast(t["o_orderdate"], pa.int64()), cutoff_us)
        t = t.filter(keep)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        par = state.cached_get(cset_ref)
        idx = np.searchsorted(par, ck)
        hit = (idx < len(par)) & (par[np.minimum(idx, max(len(par) - 1, 0))] == ck) \
            if len(par) else np.zeros(len(ck), bool)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array(["all", "sel"], pa.string()),
                "keys": pa.array(
                    [np.sort(ok).astype(np.int64).tobytes(),
                     np.sort(ok[hit]).astype(np.int64).tobytes()],
                    pa.binary(),
                ),
            }
        )

    o_all_parts, o_sel_parts = [], []
    for t in map(
        ray.get,
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(o_partial, batch_format="pyarrow")
        .to_arrow_refs(),
    ):
        for kind, blob in zip(t["kind"].to_pylist(), t["keys"].to_pylist()):
            (o_all_parts if kind == "all" else o_sel_parts).append(
                np.frombuffer(blob, np.int64)
            )
    o_all = np.unique(np.concatenate(o_all_parts)) if o_all_parts else np.zeros(0, np.int64)
    o_sel = np.unique(np.concatenate(o_sel_parts)) if o_sel_parts else np.zeros(0, np.int64)
    n_o, n_o_sel = len(o_all), len(o_sel)
    o_all_ref = state.broadcast(o_all)
    o_sel_ref = state.broadcast(o_sel)

    def l_partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(pc.cast(t["l_shipdate"], pa.int64()), cutoff_us)
        lk = t.filter(keep)["l_orderkey"].to_numpy(zero_copy_only=False)

        def n_in(par: np.ndarray) -> int:
            if not len(par) or not len(lk):
                return 0
            idx = np.searchsorted(par, lk)
            return int(
                ((idx < len(par)) & (par[np.minimum(idx, len(par) - 1)] == lk)).sum()
            )

        return pa.table(
            {
                "n_l": pa.array([len(lk)], pa.int64()),
                "n_l_sel": pa.array([n_in(state.cached_get(o_all_ref))], pa.int64()),
                "n_final": pa.array([n_in(state.cached_get(o_sel_ref))], pa.int64()),
            }
        )

    n_l = n_l_sel = n_final = 0
    for t in map(
        ray.get,
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(l_partial, batch_format="pyarrow")
        .to_arrow_refs(),
    ):
        for a, b, c in zip(
            t["n_l"].to_pylist(), t["n_l_sel"].to_pylist(), t["n_final"].to_pylist()
        ):
            n_l += a
            n_l_sel += b
            n_final += c

    plans = [
        ("dim_first", n_o_sel, n_final),
        ("fact_first", n_l_sel, n_final),
    ]
    return pa.table(
        {
            "plan": pa.array([p[0] for p in plans], pa.string()),
            "n_customer_filtered": pa.array([n_c] * 2, pa.int64()),
            "n_orders_filtered": pa.array([n_o] * 2, pa.int64()),
            "n_lineitem_filtered": pa.array([n_l] * 2, pa.int64()),
            "step1_rows": pa.array([p[1] for p in plans], pa.int64()),
            "step2_rows": pa.array([p[2] for p in plans], pa.int64()),
            "cost_rows": pa.array([p[1] + p[2] for p in plans], pa.int64()),
        }
    )


JOIN_ORDER_COST_AUDIT_SQL = f"""
WITH cset AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = '{Q3_SEGMENT}'
),
o1 AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
),
o2 AS (
  SELECT o_orderkey FROM o1
  WHERE o_custkey IN (SELECT c_custkey FROM cset)
),
l1 AS (
  SELECT l_orderkey FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
),
m AS (
  SELECT CAST((SELECT count(*) FROM cset) AS BIGINT) AS n_c,
         CAST((SELECT count(*) FROM o1) AS BIGINT) AS n_o,
         CAST((SELECT count(*) FROM l1) AS BIGINT) AS n_l,
         CAST((SELECT count(*) FROM o2) AS BIGINT) AS n_o_sel,
         CAST((SELECT count(*) FROM l1
               WHERE l_orderkey IN (SELECT o_orderkey FROM o1)) AS BIGINT)
           AS n_l_sel,
         CAST((SELECT count(*) FROM l1
               WHERE l_orderkey IN (SELECT o_orderkey FROM o2)) AS BIGINT)
           AS n_final
)
SELECT 'dim_first' AS plan, n_c AS n_customer_filtered,
       n_o AS n_orders_filtered, n_l AS n_lineitem_filtered,
       n_o_sel AS step1_rows, n_final AS step2_rows,
       CAST(n_o_sel + n_final AS BIGINT) AS cost_rows
FROM m
UNION ALL
SELECT 'fact_first', n_c, n_o, n_l, n_l_sel, n_final,
       CAST(n_l_sel + n_final AS BIGINT)
FROM m
ORDER BY plan
"""


# ---------------------------------------------------------------------------
# Bitmap/RLE index sizing plan for low-cardinality order columns
# ---------------------------------------------------------------------------

BITMAP_ZONE = 4096  # orderkeys per run-counting partition


def bitmap_index_plan(sf_dir: str):
    """Index sizing for the low-cardinality order columns
    (o_orderstatus, o_orderpriority): row count, distinct values, and
    the RLE run count in o_orderkey order — the numbers that decide
    bitmap vs RLE vs dictionary encoding for a scan index.

    Scale shape: run counting needs neighbor state, so rows partition
    into deterministic o_orderkey RANGES (groupby zone → map_groups,
    each zone sorted locally); the driver stitches zone boundaries —
    total runs = Σ zone runs − (adjacent zones whose edge values
    match), the encoding_size_audit two-pass prefix pattern."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    cols = ("o_orderstatus", "o_orderpriority")

    def add_zone(t: pa.Table) -> pa.Table:
        return t.append_column(
            "zone", pc.divide(t["o_orderkey"], pa.scalar(BITMAP_ZONE, pa.int64()))
        )

    def zone_stats(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["o_orderkey"])
        t = t.take(order)
        zone = t["zone"][0].as_py()
        out = {"zone": [], "column": [], "runs": [], "first_v": [], "last_v": [],
               "n": [], "uniq": []}
        for col in cols:
            v = t[col].to_numpy(zero_copy_only=False)
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            out["zone"].append(zone)
            out["column"].append(col)
            out["runs"].append(runs)
            out["first_v"].append(str(v[0]) if len(v) else "")
            out["last_v"].append(str(v[-1]) if len(v) else "")
            out["n"].append(len(v))
            out["uniq"].append("\x00".join(sorted(set(map(str, v)))))
        return pa.table(
            {
                "zone": pa.array(out["zone"], pa.int64()),
                "column": pa.array(out["column"], pa.string()),
                "runs": pa.array(out["runs"], pa.int64()),
                "first_v": pa.array(out["first_v"], pa.string()),
                "last_v": pa.array(out["last_v"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "uniq": pa.array(out["uniq"], pa.string()),
            }
        )

    zones: dict = {c: {} for c in cols}
    for t in map(
        ray.get,
        ds.map_batches(add_zone, batch_format="pyarrow")
        .groupby("zone")
        .map_groups(zone_stats, batch_format="pyarrow")
        .to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for z, col, runs, fv, lv, n, uq in zip(
            t["zone"].to_pylist(), t["column"].to_pylist(), t["runs"].to_pylist(),
            t["first_v"].to_pylist(), t["last_v"].to_pylist(),
            t["n"].to_pylist(), t["uniq"].to_pylist(),
        ):
            zones[col][z] = (runs, fv, lv, n, set(uq.split("\x00")) if uq else set())

    rows = []
    for col in cols:
        zs = sorted(zones[col])
        total_runs = sum(zones[col][z][0] for z in zs)
        n_rows = sum(zones[col][z][3] for z in zs)
        uniq: set = set()
        for z in zs:
            uniq |= zones[col][z][4]
        for a, b in zip(zs, zs[1:]):
            if zones[col][a][2] == zones[col][b][1]:
                total_runs -= 1
        rows.append((col, n_rows, len(uniq), total_runs))
    rows.sort()
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "n_runs": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


BITMAP_INDEX_PLAN_SQL = """
WITH s AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         lag(o_orderstatus) OVER w AS prev_status,
         lag(o_orderpriority) OVER w AS prev_prio
  FROM orders
  WINDOW w AS (ORDER BY o_orderkey)
)
SELECT 'o_orderpriority' AS "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN prev_prio IS NULL
                       OR o_orderpriority <> prev_prio THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs
FROM s
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       CAST(sum(CASE WHEN prev_status IS NULL
                       OR o_orderstatus <> prev_status THEN 1 ELSE 0 END)
            AS BIGINT)
FROM s
ORDER BY "column"
"""


# ---------------------------------------------------------------------------
# CDC upsert apply audit (merge-into semantics between two windows)
# ---------------------------------------------------------------------------

def upsert_apply_audit(sf_dir: str):
    """MERGE-INTO accounting: treat each half of the event horizon as
    a keyed snapshot (last value per user — latest ts, event_id tie)
    and apply the second as upserts into the first: how many keys are
    inserted, updated-with-change, updated-equal, or untouched — the
    row-level CDC audit every lakehouse merge job reports.

    Scale shape: per-block (window, user) argmax partials — argmax by
    (ts, event_id) is a mergeable fold — combine on the driver
    (user-bounded; at open keyspace the same partials pack into
    ``bucketed_minmax`` pairs); the audit itself is set arithmetic
    over the two bounded snapshots."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id", "value"])

    def extent(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64()))
        return pa.table(
            {
                "mn": pa.array([pc.min(day).as_py()], pa.int64()),
                "mx": pa.array([pc.max(day).as_py()], pa.int64()),
            }
        )

    mn = mx = None
    for t in map(
        ray.get, ds.map_batches(extent, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for a, b in zip(t["mn"].to_pylist(), t["mx"].to_pylist()):
            mn = a if mn is None else min(mn, a)
            mx = b if mx is None else max(mx, b)
    mid = (mn + mx + 1) // 2

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        win = (ts // day_us >= mid).astype(np.int64)
        # lexsort so the LAST row of each (win, user) run is its argmax
        order = np.lexsort((eid, ts, uid, win))
        w, u, s, e, c = win[order], uid[order], ts[order], eid[order], cents[order]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
        return pa.table(
            {
                "win": pa.array(w[last], pa.int64()),
                "user_id": pa.array(u[last], pa.int64()),
                "ts_us": pa.array(s[last], pa.int64()),
                "event_id": pa.array(e[last], pa.int64()),
                "cents": pa.array(c[last], pa.int64()),
            }
        )

    state_: dict = {0: {}, 1: {}}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for w, u, s, e, c in zip(
            t["win"].to_pylist(), t["user_id"].to_pylist(), t["ts_us"].to_pylist(),
            t["event_id"].to_pylist(), t["cents"].to_pylist(),
        ):
            cur = state_[w].get(u)
            if cur is None or (s, e) > (cur[0], cur[1]):
                state_[w][u] = (s, e, c)

    a, b = state_[0], state_[1]
    inserts = sum(1 for u in b if u not in a)
    changed = sum(1 for u in b if u in a and b[u][2] != a[u][2])
    equal = sum(1 for u in b if u in a and b[u][2] == a[u][2])
    untouched = sum(1 for u in a if u not in b)
    return pa.table(
        {
            "n_state_a": pa.array([len(a)], pa.int64()),
            "n_changes_b": pa.array([len(b)], pa.int64()),
            "n_inserts": pa.array([inserts], pa.int64()),
            "n_updates_changed": pa.array([changed], pa.int64()),
            "n_updates_equal": pa.array([equal], pa.int64()),
            "n_untouched": pa.array([untouched], pa.int64()),
        }
    )


UPSERT_APPLY_AUDIT_SQL = """
WITH mid AS (
  SELECT (min(epoch_us(ts) // 86400000000)
          + max(epoch_us(ts) // 86400000000) + 1) // 2 AS m
  FROM events
),
w AS (
  SELECT CASE WHEN epoch_us(ts) // 86400000000 >= (SELECT m FROM mid)
              THEN 1 ELSE 0 END AS win,
         user_id, ts, event_id,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
last AS (
  SELECT win, user_id, cents FROM (
    SELECT *, row_number() OVER (
        PARTITION BY win, user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM w) WHERE rn = 1
),
a AS (SELECT user_id, cents FROM last WHERE win = 0),
b AS (SELECT user_id, cents FROM last WHERE win = 1),
j AS (
  SELECT a.user_id AS ua, a.cents AS ca, b.user_id AS ub, b.cents AS cb
  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
)
SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_state_a,
       CAST((SELECT count(*) FROM b) AS BIGINT) AS n_changes_b,
       CAST(count(*) FILTER (WHERE ua IS NULL) AS BIGINT) AS n_inserts,
       CAST(count(*) FILTER (WHERE ua IS NOT NULL AND ub IS NOT NULL
                               AND ca <> cb) AS BIGINT) AS n_updates_changed,
       CAST(count(*) FILTER (WHERE ua IS NOT NULL AND ub IS NOT NULL
                               AND ca = cb) AS BIGINT) AS n_updates_equal,
       CAST(count(*) FILTER (WHERE ub IS NULL) AS BIGINT) AS n_untouched
FROM j
"""


# ---------------------------------------------------------------------------
# Two-level binary segmentation (second changepoint with exact gains)
# ---------------------------------------------------------------------------

def events_two_changepoints(sf_dir: str):
    """Binary segmentation, level two: after the best changepoint of
    the daily event-count series (events_top_changepoint), find the
    best SECOND split inside either resulting segment, ranked by the
    exact SSE-reduction gain — gain = sL²/nL + sR²/nR − s²/n as the
    integer rational (sL²·nR·n + sR²·nL·n − s²·nL·nR) / (nL·nR·n),
    compared cross-multiplied (Python ints / HUGEINT), earliest day
    on ties.  Emits both splits with their segment stats and gains.

    Scale shape: identical to the level-one operator — one bounded
    daily-count fold, then driver integer math over the calendar-
    bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    counts: dict = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for d, n in zip(tb["day"].to_pylist(), tb["n"].to_pylist()):
            counts[d] = counts.get(d, 0) + int(n)

    days = sorted(counts)
    ns = [counts[d] for d in days]
    m = len(days)
    cum = [0]
    for v in ns:
        cum.append(cum[-1] + v)

    def best_split(lo: int, hi: int):
        """Best internal split of segment [lo, hi) by exact gain."""
        n_seg = hi - lo
        s_seg = cum[hi] - cum[lo]
        best = None
        for j in range(lo + 1, hi):
            nl, nr = j - lo, hi - j
            sl = cum[j] - cum[lo]
            sr = s_seg - sl
            g_num = sl * sl * nr * n_seg + sr * sr * nl * n_seg - s_seg * s_seg * nl * nr
            g_den = nl * nr * n_seg
            if best is None or g_num * best[1] > best[0] * g_den:
                best = (g_num, g_den, j, nl, nr, sl, sr)
        return best

    empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "split_day": pa.array([], pa.timestamp("us")),
            "n_left": pa.array([], pa.int64()),
            "n_right": pa.array([], pa.int64()),
            "sum_left": pa.array([], pa.int64()),
            "sum_right": pa.array([], pa.int64()),
            "gain_num": pa.array([], pa.int64()),
            "gain_den": pa.array([], pa.int64()),
        }
    )
    lvl1 = best_split(0, m)
    if lvl1 is None:
        return empty
    _, _, i1, _, _, _, _ = lvl1
    cands = [c for c in (best_split(0, i1), best_split(i1, m)) if c is not None]
    rows = [(1, lvl1)]
    if cands:
        cands.sort(key=lambda c: (c[2],))  # stable earliest-day order
        best2 = None
        for c in cands:
            if best2 is None or c[0] * best2[1] > best2[0] * c[1]:
                best2 = c
        rows.append((2, best2))
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], pa.int64()),
            "split_day": pa.array([days[r[1][2]] for r in rows], pa.timestamp("us")),
            "n_left": pa.array([r[1][3] for r in rows], pa.int64()),
            "n_right": pa.array([r[1][4] for r in rows], pa.int64()),
            "sum_left": pa.array([r[1][5] for r in rows], pa.int64()),
            "sum_right": pa.array([r[1][6] for r in rows], pa.int64()),
            "gain_num": pa.array([r[1][0] for r in rows], pa.int64()),
            "gain_den": pa.array([r[1][1] for r in rows], pa.int64()),
        }
    )


EVENTS_TWO_CHANGEPOINTS_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
ord AS (
  SELECT day, n,
         row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS m,
         sum(n) OVER (ORDER BY day) AS cum,
         sum(n) OVER () AS tot
  FROM daily
),
cand1 AS (
  SELECT i AS j, day AS right_first_prev,
         CAST(i AS BIGINT) AS nl, CAST(m - i AS BIGINT) AS nr,
         CAST(cum AS BIGINT) AS sl, CAST(tot - cum AS BIGINT) AS sr,
         CAST(m AS BIGINT) AS n_seg, CAST(tot AS BIGINT) AS s_seg
  FROM ord WHERE i < m
),
g1 AS (
  SELECT *,
         (sl::HUGEINT * sl * nr * n_seg + sr::HUGEINT * sr * nl * n_seg
          - s_seg::HUGEINT * s_seg * nl * nr) AS g_num,
         (nl::HUGEINT * nr * n_seg) AS g_den
  FROM cand1
),
w1 AS (
  SELECT * FROM g1 c
  WHERE NOT EXISTS (
    SELECT 1 FROM g1 o
    WHERE o.g_num * c.g_den > c.g_num * o.g_den
       OR (o.g_num * c.g_den = c.g_num * o.g_den AND o.j < c.j))
),
cand2 AS (
  SELECT o.i AS j,
         CASE WHEN o.i < w1.j THEN o.i ELSE o.i - w1.j END AS nl_raw,
         CASE WHEN o.i < w1.j THEN w1.j - o.i ELSE o.m - o.i END AS nr_raw,
         CASE WHEN o.i < w1.j THEN o.cum
              ELSE o.cum - w1.sl END AS sl_raw,
         CASE WHEN o.i < w1.j THEN w1.sl - o.cum
              ELSE o.tot - o.cum END AS sr_raw,
         CASE WHEN o.i < w1.j THEN w1.nl ELSE w1.nr END AS n_seg,
         CASE WHEN o.i < w1.j THEN w1.sl ELSE w1.sr END AS s_seg
  FROM ord o CROSS JOIN w1
  WHERE o.i < o.m AND o.i <> w1.j
),
g2 AS (
  SELECT j, CAST(nl_raw AS BIGINT) AS nl, CAST(nr_raw AS BIGINT) AS nr,
         CAST(sl_raw AS BIGINT) AS sl, CAST(sr_raw AS BIGINT) AS sr,
         (sl_raw::HUGEINT * sl_raw * nr_raw * n_seg
          + sr_raw::HUGEINT * sr_raw * nl_raw * n_seg
          - s_seg::HUGEINT * s_seg * nl_raw * nr_raw) AS g_num,
         (nl_raw::HUGEINT * nr_raw * n_seg) AS g_den
  FROM cand2
),
w2 AS (
  SELECT * FROM g2 c
  WHERE NOT EXISTS (
    SELECT 1 FROM g2 o
    WHERE o.g_num * c.g_den > c.g_num * o.g_den
       OR (o.g_num * c.g_den = c.g_num * o.g_den AND o.j < c.j))
)
SELECT CAST(1 AS BIGINT) AS rank,
       (SELECT day FROM ord WHERE i = w1.j + 1) AS split_day,
       w1.nl AS n_left, w1.nr AS n_right, w1.sl AS sum_left, w1.sr AS sum_right,
       CAST(w1.g_num AS BIGINT) AS gain_num, CAST(w1.g_den AS BIGINT) AS gain_den
FROM w1
UNION ALL
SELECT CAST(2 AS BIGINT),
       (SELECT day FROM ord WHERE i = w2.j + 1),
       w2.nl, w2.nr, w2.sl, w2.sr,
       CAST(w2.g_num AS BIGINT), CAST(w2.g_den AS BIGINT)
FROM w2
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Sliding-window HLL union audit (mergeable registers across windows)
# ---------------------------------------------------------------------------

def hll_sliding_union_audit(sf_dir: str):
    """The streaming reason sketches exist: the 7-day sliding distinct
    count from UNIONED daily HLL registers (register-wise max — the
    mergeable-monoid property) next to the exact sliding count, both
    exact-integer (the hll_estimate_audit arithmetic: rational alpha,
    HUGEINT harmonic sum, ln-micro linear counting).  One daily
    register table serves every window — no per-window rescan, which
    is the whole point at 10^12 events.

    Scale shape: the register side is the bounded daily fold of
    hll_daily_registers; the exact side folds (day, user) pairs via
    ``bucketed_agg`` (audit-only — at open scale the estimate IS the
    production number and exact runs on sampled windows)."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    m = HLL_M
    regs: dict = {}
    for r in hll_daily_registers(sf_dir).take_all():
        regs.setdefault(r["day"], {})[r["register"]] = int(r["max_rho"])

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def du_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "day": pc.floor_temporal(t["ts"], unit="day"),
                    "user_id": t["user_id"],
                }
            ),
            ["day", "user_id"],
        ).aggregate([])
        return pa.table(
            {
                "day": g["day"],
                "user_id": g["user_id"],
                "one": pa.array(np.ones(g.num_rows, np.int64), pa.int64()),
            }
        )

    pairs = bucketed_agg(
        ds.map_batches(du_partial, batch_format="pyarrow"),
        ["day", "user_id"],
        [("one", "max", "one")],
    )
    day_users: dict = {}
    for tb in map(ray.get, pairs.to_arrow_refs()):
        if not tb.num_rows:
            continue
        for d, u in zip(tb["day"].to_pylist(), tb["user_id"].to_pylist()):
            day_users.setdefault(d, set()).add(u)

    days = sorted(day_users)
    lnm_m = int(math.floor(math.log(m) * 1_000_000 + 0.5))
    out = {k: [] for k in ("day", "n_exact_7d", "zeros", "est_milli", "err_milli")}
    for d in days:
        win = [x for x in days if 0 <= (d - x).days <= 6]
        exact = len(set().union(*(day_users[x] for x in win)))
        merged: dict = {}
        for x in win:
            for reg, rho in regs.get(x, {}).items():
                if rho > merged.get(reg, 0):
                    merged[reg] = rho
        zeros = m - len(merged)
        S = sum((1 << 64) >> rho for rho in merged.values()) + zeros * (1 << 64)
        est = (
            _HLL_ALPHA_NUM * m * m * m * 1000 * (1 << 64)
        ) // ((_HLL_ALPHA_DEN_A * m + _HLL_ALPHA_DEN_B) * S)
        if est <= 2500 * m and zeros > 0:
            lnz = int(math.floor(math.log(zeros) * 1_000_000 + 0.5))
            est = m * (lnm_m - lnz) // 1000
        out["day"].append(d)
        out["n_exact_7d"].append(exact)
        out["zeros"].append(zeros)
        out["est_milli"].append(est)
        out["err_milli"].append(est - 1000 * exact)
    return pa.table(
        {
            "day": pa.array(out["day"], pa.timestamp("us")),
            "n_exact_7d": pa.array(out["n_exact_7d"], pa.int64()),
            "zeros": pa.array(out["zeros"], pa.int64()),
            "est_milli": pa.array(out["est_milli"], pa.int64()),
            "err_milli": pa.array(out["err_milli"], pa.int64()),
        }
    )


def _hll_sliding_sql() -> str:
    m = HLL_M
    two64 = 1 << 64
    an, da, db = _HLL_ALPHA_NUM, _HLL_ALPHA_DEN_A, _HLL_ALPHA_DEN_B
    num = an * m * m * m * 1000 * two64
    den_c = da * m + db
    return f"""
WITH regs AS ({HLL_DAILY_REGISTERS_SQL}),
wdays AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
wregs AS (
  SELECT w.day, r.register, max(r.max_rho) AS max_rho
  FROM regs r JOIN wdays w
    ON r.day BETWEEN w.day - INTERVAL 6 DAY AND w.day
  GROUP BY 1, 2
),
agg AS (
  SELECT day, CAST(count(*) AS BIGINT) AS hit,
         sum({two64}::HUGEINT // (1::BIGINT << max_rho)) AS s_hit
  FROM wregs GROUP BY day
),
ex AS (
  SELECT w.day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_exact_7d
  FROM wdays w JOIN events e
    ON date_trunc('day', e.ts) BETWEEN w.day - INTERVAL 6 DAY AND w.day
  GROUP BY 1
),
j AS (
  SELECT ex.day, ex.n_exact_7d,
         CAST({m} - coalesce(agg.hit, 0) AS BIGINT) AS zeros,
         coalesce(agg.s_hit, 0)
           + ({m} - coalesce(agg.hit, 0)) * {two64}::HUGEINT AS s
  FROM ex LEFT JOIN agg ON agg.day = ex.day
),
est AS (
  SELECT day, n_exact_7d, zeros,
         {num}::HUGEINT // ({den_c}::HUGEINT * s) AS raw
  FROM j
)
SELECT day, n_exact_7d, zeros,
       CAST(CASE WHEN raw <= {2500 * m} AND zeros > 0
                 THEN {m} * (CAST(round(ln({m}) * 1000000) AS BIGINT)
                             - CAST(round(ln(zeros) * 1000000) AS BIGINT))
                      // 1000
                 ELSE raw END AS BIGINT) AS est_milli,
       CAST(CASE WHEN raw <= {2500 * m} AND zeros > 0
                 THEN {m} * (CAST(round(ln({m}) * 1000000) AS BIGINT)
                             - CAST(round(ln(zeros) * 1000000) AS BIGINT))
                      // 1000
                 ELSE raw END - 1000 * n_exact_7d AS BIGINT) AS err_milli
FROM est ORDER BY day
"""


HLL_SLIDING_UNION_AUDIT_SQL = _hll_sliding_sql()


# ---------------------------------------------------------------------------
# Selectivity independence audit (optimizer estimate error per conjunction)
# ---------------------------------------------------------------------------

def selectivity_independence_audit(sf_dir: str):
    """How wrong is the textbook independence assumption?  For every
    (o_orderstatus, o_orderpriority) conjunction: the ACTUAL row count
    vs the optimizer estimate n·sel(status)·sel(priority) in
    milli-rows, plus the signed error in parts-per-million of the
    estimate — the companion table to join_order_cost_audit (that one
    prices join order, this one prices predicate correlation).

    Scale shape: one bounded contingency fold (statuses × priorities)
    from per-block partials; everything else is driver integer math
    (est_milli = 1000·n_s·n_p // n, truncation safe on positives)."""
    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["o_orderstatus", "o_orderpriority"]),
            ["o_orderstatus", "o_orderpriority"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "s": g["o_orderstatus"],
                "p": g["o_orderpriority"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["s", "p"], "n"
    )

    n_tot = sum(cells.values())
    ns: dict = {}
    np_: dict = {}
    for (s, p), n in cells.items():
        ns[s] = ns.get(s, 0) + n
        np_[p] = np_.get(p, 0) + n

    rows = []
    for (s, p), actual in sorted(cells.items()):
        est_milli = (1000 * ns[s] * np_[p]) // n_tot
        diff = 1_000_000 * (1000 * actual - est_milli)
        err_ppm = (diff - ((diff % est_milli + est_milli) % est_milli)) // est_milli \
            if est_milli else 0
        rows.append((s, p, actual, est_milli, err_ppm))
    return pa.table(
        {
            "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
            "o_orderpriority": pa.array([r[1] for r in rows], pa.string()),
            "actual_rows": pa.array([r[2] for r in rows], pa.int64()),
            "est_milli_rows": pa.array([r[3] for r in rows], pa.int64()),
            "err_ppm": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SELECTIVITY_INDEPENDENCE_AUDIT_SQL = """
WITH c AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(count(*) AS BIGINT) AS actual
  FROM orders GROUP BY 1, 2
),
ms AS (SELECT s, CAST(sum(actual) AS BIGINT) AS n_s FROM c GROUP BY 1),
mp AS (SELECT p, CAST(sum(actual) AS BIGINT) AS n_p FROM c GROUP BY 1),
t AS (SELECT CAST(sum(actual) AS BIGINT) AS n FROM c),
x AS (
  SELECT c.s, c.p, c.actual,
         CAST((1000 * ms.n_s * mp.n_p) // t.n AS BIGINT) AS est_milli
  FROM c JOIN ms USING (s) JOIN mp USING (p) CROSS JOIN t
)
SELECT s AS o_orderstatus, p AS o_orderpriority,
       actual AS actual_rows, est_milli AS est_milli_rows,
       CAST(CASE WHEN est_milli = 0 THEN 0 ELSE
         (1000000::HUGEINT * (1000 * actual - est_milli)
          - (((1000000::HUGEINT * (1000 * actual - est_milli)) % est_milli
              + est_milli) % est_milli)) // est_milli END AS BIGINT) AS err_ppm
FROM x ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Key-space gap audit (data-completeness check over a dense key domain)
# ---------------------------------------------------------------------------

def key_gap_audit(sf_dir: str):
    """Completeness audit of the order keys actually referenced by
    lineitem: distinct keys, domain span, missing-key count, gap-run
    count and the largest gap — the sequence check an ingest monitor
    runs against an expected-dense key feed (the shipped lineitem
    references 98.3% of the order domain, so the gaps are real).

    Scale shape: per-block ``np.unique`` key partials fold to the
    global distinct array on the driver (fact-boundary-sized, same
    budget as fk_orphan_audit's parent sets; the open-domain
    escalation is per-key-range zone folds with boundary stitching —
    the bitmap_index_plan shape), then one vectorized np.diff."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    parts = [
        np.unique(t["l_orderkey"].to_numpy(zero_copy_only=False))
        for t in map(ray.get, ds.to_arrow_refs())
        if t.num_rows
    ]
    keys = np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    if not len(keys):
        diffs = np.zeros(0, np.int64)
    else:
        diffs = np.diff(keys)
    return pa.table(
        {
            "n_keys": pa.array([len(keys)], pa.int64()),
            "key_min": pa.array([int(keys[0]) if len(keys) else 0], pa.int64()),
            "key_max": pa.array([int(keys[-1]) if len(keys) else 0], pa.int64()),
            "n_missing": pa.array(
                [int(keys[-1] - keys[0] + 1 - len(keys)) if len(keys) else 0],
                pa.int64(),
            ),
            "n_gap_runs": pa.array([int((diffs > 1).sum())], pa.int64()),
            "max_gap": pa.array(
                [int(diffs.max() - 1) if len(diffs) else 0], pa.int64()
            ),
        }
    )


KEY_GAP_AUDIT_SQL = """
WITH k AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
d AS (SELECT key, key - lag(key) OVER (ORDER BY key) AS diff FROM k)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(min(key) AS BIGINT) AS key_min,
       CAST(max(key) AS BIGINT) AS key_max,
       CAST(max(key) - min(key) + 1 - count(*) AS BIGINT) AS n_missing,
       CAST(count(*) FILTER (WHERE diff > 1) AS BIGINT) AS n_gap_runs,
       CAST(COALESCE(max(diff) - 1, 0) AS BIGINT) AS max_gap
FROM d
"""


# ---------------------------------------------------------------------------
# One-way ANOVA of event value across event types (exact integer F)
# ---------------------------------------------------------------------------

def value_anova_by_type(sf_dir: str):
    """Classical one-way ANOVA of event value (cents) across event
    types — completes the test family (χ², G, KS, Mann-Kendall,
    Theil): between/within sum-of-squares in MILLI-cents² (each
    per-group term is the truncating rational 1000·s_g² // n_g, a
    DEFINED integer statistic both engines compute identically) and
    the F statistic in micro units.

    Scale shape: one bounded (type → n, Σx, Σx²) moment fold from
    per-block partials; everything after is driver integer math."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "x": pa.array(c, pa.int64()),
                    "x2": pa.array(c * c, pa.int64()),
                }
            ),
            ["event_type"],
        ).aggregate([("x", "sum"), ("x2", "sum"), ([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["x_sum"],
                "s2": g["x2_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for et, s, s2, n in zip(
            t["event_type"].to_pylist(), t["s"].to_pylist(),
            t["s2"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(et, [0, 0, 0])
            cur[0] += s
            cur[1] += s2
            cur[2] += n

    k = len(acc)
    n_tot = sum(v[2] for v in acc.values())
    s_tot = sum(v[0] for v in acc.values())
    s2_tot = sum(v[1] for v in acc.values())
    grp_milli = sum((1000 * v[0] * v[0]) // v[2] for v in acc.values())
    grand_milli = (1000 * s_tot * s_tot) // n_tot
    ssb_milli = grp_milli - grand_milli
    ssw_milli = 1000 * s2_tot - grp_milli
    df_b, df_w = k - 1, n_tot - k
    f_micro = (
        (1_000_000 * ssb_milli * df_w) // (ssw_milli * df_b)
        if df_b > 0 and ssw_milli > 0
        else 0
    )
    return pa.table(
        {
            "n_events": pa.array([n_tot], pa.int64()),
            "n_groups": pa.array([k], pa.int64()),
            "df_between": pa.array([df_b], pa.int64()),
            "df_within": pa.array([df_w], pa.int64()),
            "ssb_milli": pa.array([ssb_milli], pa.int64()),
            "ssw_milli": pa.array([ssw_milli], pa.int64()),
            "f_micro": pa.array([f_micro], pa.int64()),
        }
    )


VALUE_ANOVA_BY_TYPE_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)
                  * CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS s2
  FROM events GROUP BY 1
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(s) AS BIGINT) AS s_tot,
         CAST(sum(s2) AS BIGINT) AS s2_tot,
         CAST(sum((1000::HUGEINT * s * s) // n) AS HUGEINT) AS grp_milli
  FROM g
),
x AS (
  SELECT n_tot, k,
         grp_milli - (1000::HUGEINT * s_tot * s_tot) // n_tot AS ssb,
         1000::HUGEINT * s2_tot - grp_milli AS ssw,
         k - 1 AS df_b, n_tot - k AS df_w
  FROM t
)
SELECT n_tot AS n_events, k AS n_groups,
       CAST(df_b AS BIGINT) AS df_between, CAST(df_w AS BIGINT) AS df_within,
       CAST(ssb AS BIGINT) AS ssb_milli, CAST(ssw AS BIGINT) AS ssw_milli,
       CAST(CASE WHEN df_b > 0 AND ssw > 0
                 THEN (1000000::HUGEINT * ssb * df_w) // (ssw * df_b)
                 ELSE 0 END AS BIGINT) AS f_micro
FROM x
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily order-count series
# ---------------------------------------------------------------------------

def daily_runs_test(sf_dir: str):
    """Randomness check of the daily order-count series: split days at
    the LOWER MEDIAN count (ties join the not-above group — a
    deterministic rule both engines share), count the observed
    above/not-above runs, and emit the expected run count and variance
    as truncating integer rationals — the nonparametric serial-
    dependence test next to orders_mann_kendall's trend test.

    Scale shape: the calendar-bounded daily fold again; the run scan
    is one vectorized pass over the bounded series."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate([([], "count_all")])
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )

    days = sorted(hist)
    counts = np.array([hist[d] for d in days], dtype=np.int64)
    med = int(np.sort(counts)[(len(counts) - 1) // 2])
    above = counts > med
    n1 = int(above.sum())
    n2 = len(counts) - n1
    runs = 1 + int((above[1:] != above[:-1]).sum()) if len(counts) else 0
    tot = n1 + n2
    exp_milli = (1000 * (2 * n1 * n2 + tot)) // tot if tot else 0
    var_num = 2 * n1 * n2 * (2 * n1 * n2 - tot)
    var_den = tot * tot * (tot - 1)
    var_micro = (1_000_000 * var_num) // var_den if var_den and var_num > 0 else 0
    return pa.table(
        {
            "n_days": pa.array([len(counts)], pa.int64()),
            "median_count": pa.array([med], pa.int64()),
            "n_above": pa.array([n1], pa.int64()),
            "n_not_above": pa.array([n2], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "exp_runs_milli": pa.array([exp_milli], pa.int64()),
            "var_runs_micro": pa.array([var_micro], pa.int64()),
        }
    )


DAILY_RUNS_TEST_SQL = """
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
med AS (
  SELECT n AS m FROM (
    SELECT n, row_number() OVER (ORDER BY n) AS rn, count(*) OVER () AS c
    FROM daily
  ) WHERE rn = (c + 1) // 2
),
s AS (
  SELECT day, CAST(n > (SELECT m FROM med) AS INT) AS above,
         lag(CAST(n > (SELECT m FROM med) AS INT)) OVER (ORDER BY day) AS prev
  FROM daily
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(above) AS BIGINT) AS n1,
         CAST(count(*) - sum(above) AS BIGINT) AS n2,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND above <> prev
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
  FROM s
)
SELECT n_days, CAST((SELECT m FROM med) AS BIGINT) AS median_count,
       n1 AS n_above, n2 AS n_not_above, n_runs,
       CAST((1000 * (2 * n1 * n2 + n1 + n2)) // (n1 + n2) AS BIGINT)
         AS exp_runs_milli,
       CAST(CASE WHEN (n1 + n2) > 1
                   AND 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) > 0
                 THEN (1000000::HUGEINT * 2 * n1 * n2
                       * (2 * n1 * n2 - n1 - n2))
                      // ((n1 + n2)::HUGEINT * (n1 + n2) * (n1 + n2 - 1))
                 ELSE 0 END AS BIGINT) AS var_runs_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# k-anonymity audit over a quasi-identifier tuple
# ---------------------------------------------------------------------------

K_ANON_THRESHOLD = 5


def k_anonymity_audit(sf_dir: str, k: int = K_ANON_THRESHOLD):
    """Privacy-release audit: group customers by the quasi-identifier
    tuple (c_nationkey, c_mktsegment) and report the k-anonymity
    profile — group count, smallest group, and how many groups/rows
    fall below k (those rows would re-identify under a join attack;
    the structured-data companion of the text-side ``pii_scrub``).

    Scale shape: the QI contingency is nations × segments — a bounded
    per-block fold; an open QI domain routes the same partials through
    ``bucketed_agg`` and the profile becomes a group-size histogram
    fold (dedup_cluster_size_hist shape)."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["c_nationkey", "c_mktsegment"]),
            ["c_nationkey", "c_mktsegment"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "nk": pc.cast(g["c_nationkey"], pa.int64()),
                "seg": g["c_mktsegment"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["nk", "seg"], "n"
    )

    sizes = sorted(cells.values())
    n_rows = sum(sizes)
    below = [s for s in sizes if s < k]
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_groups": pa.array([len(sizes)], pa.int64()),
            "min_group": pa.array([sizes[0] if sizes else 0], pa.int64()),
            "k_threshold": pa.array([k], pa.int64()),
            "groups_below_k": pa.array([len(below)], pa.int64()),
            "rows_below_k": pa.array([sum(below)], pa.int64()),
        }
    )


K_ANONYMITY_AUDIT_SQL = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY 1, 2
)
SELECT CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(n) AS BIGINT) AS min_group,
       CAST({K_ANON_THRESHOLD} AS BIGINT) AS k_threshold,
       CAST(count(*) FILTER (WHERE n < {K_ANON_THRESHOLD}) AS BIGINT)
         AS groups_below_k,
       CAST(COALESCE(sum(n) FILTER (WHERE n < {K_ANON_THRESHOLD}), 0) AS BIGINT)
         AS rows_below_k
FROM g
"""


# ---------------------------------------------------------------------------
# Hot/warm/cold storage tiering plan from access recency + frequency
# ---------------------------------------------------------------------------

TIER_HOT_DAYS = 180
TIER_WARM_DAYS = 720


def part_tiering_plan(sf_dir: str):
    """Storage-tiering policy table: classify every part by last
    shipment recency relative to the feed's max shipdate — hot
    (≤180 days), warm (≤720), cold (rest) — and report parts and
    line volume per tier, the numbers a lakehouse tiering job acts
    on.

    Scale shape: per-part (max shipdate, line count) is a key-per-row
    aggregate → routed through ``bucketed_agg`` (CLAUDE.md rule); the
    global max shipdate and the 3-tier rollup are bounded folds."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    day_us = 86_400_000_000
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["l_shipdate"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(
            pa.table({"l_partkey": t["l_partkey"], "day": day}), ["l_partkey"]
        ).aggregate([("day", "max"), ([], "count_all")])
        return pa.table(
            {
                "l_partkey": g["l_partkey"],
                "last_day": g["day_max"],
                "n_lines": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_part = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"],
        [("last_day", "max", "last_day"), ("n_lines", "sum", "n_lines")],
    )

    rows = [
        t
        for t in map(ray.get, per_part.to_arrow_refs())
        if t.num_rows
    ]
    last = np.concatenate([t["last_day"].to_numpy(zero_copy_only=False) for t in rows]) \
        if rows else np.zeros(0, np.int64)
    nl = np.concatenate([t["n_lines"].to_numpy(zero_copy_only=False) for t in rows]) \
        if rows else np.zeros(0, np.int64)
    mx = int(last.max()) if len(last) else 0
    age = mx - last
    tier = np.where(age <= TIER_HOT_DAYS, "hot",
                    np.where(age <= TIER_WARM_DAYS, "warm", "cold"))
    out = []
    for name in ("cold", "hot", "warm"):
        m = tier == name
        if m.any():  # empty tiers don't appear (matches the GROUP BY)
            out.append((name, int(m.sum()), int(nl[m].sum())))
    return pa.table(
        {
            "tier": pa.array([r[0] for r in out], pa.string()),
            "n_parts": pa.array([r[1] for r in out], pa.int64()),
            "n_lines": pa.array([r[2] for r in out], pa.int64()),
        }
    )


PART_TIERING_PLAN_SQL = f"""
WITH p AS (
  SELECT l_partkey,
         max(epoch_us(l_shipdate) // 86400000000) AS last_day,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
mx AS (SELECT max(last_day) AS mx FROM p),
t AS (
  SELECT CASE WHEN mx.mx - p.last_day <= {TIER_HOT_DAYS} THEN 'hot'
              WHEN mx.mx - p.last_day <= {TIER_WARM_DAYS} THEN 'warm'
              ELSE 'cold' END AS tier,
         p.n_lines
  FROM p CROSS JOIN mx
)
SELECT tier, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n_lines) AS BIGINT) AS n_lines
FROM t GROUP BY tier ORDER BY tier
"""


# ---------------------------------------------------------------------------
# Stratified-sampling design effect (survey-sampling variance gain)
# ---------------------------------------------------------------------------

def stratified_design_effect(sf_dir: str):
    """Would stratifying by market segment help a sampled estimate of
    mean order value?  Emits the SRS population variance and the
    proportional-allocation stratified variance (within-strata term)
    in MILLI-cents², each per-group term the truncating rational
    1000·(n_g·Σx²_g − (Σx_g)²) // n_g ... // N, plus the design
    effect deff = var_strat/var_srs in micro — deff < 1 is the
    measured payoff of stratification.

    Scale shape: the same bounded per-segment moment fold as
    mktseg_target_encoding (customer dim broadcast, 5 segments);
    driver integer math after."""
    from document_extractor_ray import state

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["c_mktsegment"])
        c = _to_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        # x² can reach 2.5e15 per row — a block sum would brush int64;
        # split into (quotient, remainder) by 1e6 and rebuild with
        # Python ints on the driver.
        x2 = c * c
        g = pa.TableGroupBy(
            pa.table(
                {
                    "seg": t["c_mktsegment"],
                    "x": pa.array(c, pa.int64()),
                    "x2q": pa.array(x2 // 1_000_000, pa.int64()),
                    "x2r": pa.array(x2 % 1_000_000, pa.int64()),
                }
            ),
            ["seg"],
        ).aggregate(
            [("x", "sum"), ("x2q", "sum"), ("x2r", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "seg": g["seg"],
                "s": g["x_sum"],
                "s2q": g["x2q_sum"],
                "s2r": g["x2r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    acc: dict = {}
    for t in map(
        ray.get, orders.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for seg, s, s2q, s2r, n in zip(
            t["seg"].to_pylist(), t["s"].to_pylist(), t["s2q"].to_pylist(),
            t["s2r"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(seg, [0, 0, 0])
            cur[0] += s
            cur[1] += s2q * 1_000_000 + s2r
            cur[2] += n

    n_tot = sum(v[2] for v in acc.values())
    s_tot = sum(v[0] for v in acc.values())
    s2_tot = sum(v[1] for v in acc.values())
    var_srs_milli = (1000 * (n_tot * s2_tot - s_tot * s_tot)) // (n_tot * n_tot)
    var_strat_milli = (
        sum((1000 * (v[2] * v[1] - v[0] * v[0])) // v[2] for v in acc.values())
        // n_tot
    )
    deff_micro = (
        (1_000_000 * var_strat_milli) // var_srs_milli if var_srs_milli > 0 else 0
    )
    return pa.table(
        {
            "n_orders": pa.array([n_tot], pa.int64()),
            "n_strata": pa.array([len(acc)], pa.int64()),
            "var_srs_milli": pa.array([var_srs_milli], pa.int64()),
            "var_strat_milli": pa.array([var_strat_milli], pa.int64()),
            "deff_micro": pa.array([deff_micro], pa.int64()),
        }
    )


STRATIFIED_DESIGN_EFFECT_SQL = """
WITH g AS (
  SELECT c_mktsegment AS seg,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS s,
         sum(CAST(round(o_totalprice * 100.0) AS HUGEINT)
             * CAST(round(o_totalprice * 100.0) AS HUGEINT)) AS s2
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS n_tot,
         CAST(sum(s) AS BIGINT) AS s_tot,
         sum(s2) AS s2_tot,
         CAST(sum((1000::HUGEINT * (n::HUGEINT * s2 - s::HUGEINT * s)) // n)
              AS HUGEINT) AS strat_terms
  FROM g
),
x AS (
  SELECT n_tot, k,
         (1000::HUGEINT * (n_tot::HUGEINT * s2_tot - s_tot::HUGEINT * s_tot))
           // (n_tot::HUGEINT * n_tot) AS var_srs,
         strat_terms // n_tot AS var_strat
  FROM t
)
SELECT n_tot AS n_orders, k AS n_strata,
       CAST(var_srs AS BIGINT) AS var_srs_milli,
       CAST(var_strat AS BIGINT) AS var_strat_milli,
       CAST(CASE WHEN var_srs > 0
                 THEN (1000000::HUGEINT * var_strat) // var_srs
                 ELSE 0 END AS BIGINT) AS deff_micro
FROM x
"""


# ---------------------------------------------------------------------------
# Little's law audit over the order open-interval process
# ---------------------------------------------------------------------------

def littles_law_audit(sf_dir: str):
    """Queueing sanity check: compute the time integral of the number
    of OPEN orders (order placed, last line not yet shipped) by
    sweep-line, and the total open duration directly per order — the
    two sides of Little's law L̄·T = Σ durations, derived through
    completely different dataflows (a global event sweep vs a per-key
    aggregate), so their exact equality is a distributed-correctness
    proof, not a tautology.  Negative durations (lines shipped before
    the order date exist in this feed) carry sign through both paths.
    Also emits L̄, W̄ and λ as truncating rationals.

    Scale shape: per-order close time via ``bucketed_agg`` max (key-
    per-row rule); the sweep folds a calendar-bounded (timestamp →
    signed delta) map on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
                }
            ),
            ["l_orderkey"],
        ).aggregate([("ship_us", "max")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "close_us": g["ship_us_max"]}
        )

    closes = bucketed_agg(
        li.map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("close_us", "max", "close_us")],
    )

    close_map: dict = {}
    for t in map(ray.get, closes.to_arrow_refs()):
        if not t.num_rows:
            continue
        for k, c in zip(t["l_orderkey"].to_pylist(), t["close_us"].to_pylist()):
            close_map[k] = max(close_map.get(k, c), c)

    ckeys = np.array(sorted(close_map), dtype=np.int64)
    cvals = np.array([close_map[k] for k in ckeys], dtype=np.int64)

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    starts_l, ends_l = [], []
    for t in map(ray.get, orders.to_arrow_refs()):
        if not t.num_rows:
            continue
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        st = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ckeys, ok)
        hit = (idx < len(ckeys)) & (ckeys[np.minimum(idx, max(len(ckeys) - 1, 0))] == ok) \
            if len(ckeys) else np.zeros(len(ok), bool)
        starts_l.append(st[hit])
        ends_l.append(cvals[idx[hit]])
    starts = np.concatenate(starts_l) if starts_l else np.zeros(0, np.int64)
    ends = np.concatenate(ends_l) if ends_l else np.zeros(0, np.int64)
    n_orders = len(starts)
    dur_sum = int(ends.sum() - starts.sum())

    sign = np.where(ends >= starts, 1, -1).astype(np.int64)
    lo = np.minimum(starts, ends)
    hi = np.maximum(starts, ends)
    pts = np.concatenate([lo, hi])
    dl = np.concatenate([sign, -sign])
    order = np.argsort(pts, kind="stable")
    pts, dl = pts[order], dl[order]
    uniq, inv = np.unique(pts, return_inverse=True)
    agg = np.zeros(len(uniq), np.int64)
    np.add.at(agg, inv, dl)
    open_cnt = np.cumsum(agg)
    integral = int((open_cnt[:-1] * np.diff(uniq)).sum()) if len(uniq) > 1 else 0
    horizon = int(uniq[-1] - uniq[0]) if len(uniq) > 1 else 0
    day_us = 86_400_000_000

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n if n else 0

    return pa.table(
        {
            "n_orders": pa.array([n_orders], pa.int64()),
            "horizon_us": pa.array([horizon], pa.int64()),
            "duration_sum_us": pa.array([dur_sum], pa.int64()),
            "open_integral_us": pa.array([integral], pa.int64()),
            "l_avg_micro": pa.array([fdiv(1_000_000 * integral, horizon)], pa.int64()),
            "w_avg_us": pa.array([fdiv(dur_sum, n_orders)], pa.int64()),
            "lambda_per_day_micro": pa.array(
                [fdiv(1_000_000 * n_orders * day_us, horizon)], pa.int64()
            ),
        }
    )


LITTLES_LAW_AUDIT_SQL = """
WITH o AS (
  SELECT o.o_orderkey,
         epoch_us(o.o_orderdate) AS start_us,
         max(epoch_us(l.l_shipdate)) AS end_us
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ev AS (
  SELECT CASE WHEN end_us >= start_us THEN start_us ELSE end_us END AS t,
         CAST(CASE WHEN end_us >= start_us THEN 1 ELSE -1 END AS BIGINT) AS d
  FROM o
  UNION ALL
  SELECT CASE WHEN end_us >= start_us THEN end_us ELSE start_us END,
         CAST(CASE WHEN end_us >= start_us THEN -1 ELSE 1 END AS BIGINT)
  FROM o
),
g AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM ev GROUP BY t),
sw AS (
  SELECT t, sum(d) OVER (ORDER BY t) AS open_cnt,
         lead(t) OVER (ORDER BY t) AS nxt
  FROM g
),
m AS (
  SELECT CAST((SELECT count(*) FROM o) AS BIGINT) AS n_orders,
         CAST((SELECT max(t) - min(t) FROM g) AS BIGINT) AS horizon_us,
         CAST((SELECT sum(end_us - start_us) FROM o) AS BIGINT)
           AS duration_sum_us,
         CAST(COALESCE(sum(open_cnt * (nxt - t)), 0) AS BIGINT)
           AS open_integral_us
  FROM sw WHERE nxt IS NOT NULL
)
SELECT n_orders, horizon_us, duration_sum_us, open_integral_us,
       CAST((1000000::HUGEINT * open_integral_us
             - (((1000000::HUGEINT * open_integral_us) % horizon_us
                 + horizon_us) % horizon_us)) // horizon_us AS BIGINT)
         AS l_avg_micro,
       CAST((duration_sum_us
             - ((duration_sum_us % n_orders + n_orders) % n_orders))
            // n_orders AS BIGINT) AS w_avg_us,
       CAST((1000000::HUGEINT * n_orders * 86400000000)
            // horizon_us AS BIGINT) AS lambda_per_day_micro
FROM m
"""


# ---------------------------------------------------------------------------
# Pairwise correlation matrix over the lineitem numeric columns
# ---------------------------------------------------------------------------

_CORR_COLS = ("qty_units", "price_dollars", "discount_permille", "tax_permille")


def lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson association between the four lineitem numeric
    measures (quantity in units, price in whole dollars, discount and
    tax in permille — integer encodings both engines share): each pair
    ships the exact centered moments (n·Σxy − ΣxΣy etc.) plus signed
    r² in micro — the column-profiling matrix a feature-selection or
    compression planner reads.

    Scale shape: ONE pass computes all 4 sums, 4 sums-of-squares and
    6 cross sums per block (PERF-36: metrics are columns, not scans);
    the 14-number fold and the 6-pair math run on the driver."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )

    def enc(t: pa.Table) -> dict:
        return {
            "qty_units": pc.cast(
                pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False),
            "price_dollars": pc.cast(
                pc.round(t["l_extendedprice"], round_mode="half_towards_infinity"),
                pa.int64(),
            ).to_numpy(zero_copy_only=False),
            "discount_permille": pc.cast(
                pc.round(
                    pc.multiply(t["l_discount"], 1000.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False),
            "tax_permille": pc.cast(
                pc.round(
                    pc.multiply(t["l_tax"], 1000.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False),
        }

    def partial(t: pa.Table) -> pa.Table:
        cols = enc(t)
        names, vals = [], []
        names.append("__n__")
        vals.append(t.num_rows)
        for a in _CORR_COLS:
            names.append(f"s:{a}")
            vals.append(int(cols[a].sum()))
        for i, a in enumerate(_CORR_COLS):
            for b in _CORR_COLS[i:]:
                names.append(f"x:{a}:{b}")
                vals.append(int((cols[a] * cols[b]).sum()))
        return pa.table(
            {
                "key": pa.array(names, pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "key", "v"
    )

    n = acc["__n__"]

    def fdiv(a: int, d: int) -> int:
        return (a - ((a % d + d) % d)) // d if d else 0

    rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            sxy = n * acc[f"x:{a}:{b}"] - acc[f"s:{a}"] * acc[f"s:{b}"]
            sxx = n * acc[f"x:{a}:{a}"] - acc[f"s:{a}"] ** 2
            syy = n * acc[f"x:{b}:{b}"] - acc[f"s:{b}"] ** 2
            r2 = fdiv(1_000_000 * sxy * sxy, sxx * syy) if sxx and syy else 0
            rows.append((a, b, n, sxy, r2 if sxy >= 0 else -r2))
    rows.sort()
    return pa.table(
        {
            "col_a": pa.array([r[0] for r in rows], pa.string()),
            "col_b": pa.array([r[1] for r in rows], pa.string()),
            "n_rows": pa.array([r[2] for r in rows], pa.int64()),
            "sxy_centered": pa.array([r[3] for r in rows], pa.int64()),
            "r2_signed_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def _corr_matrix_sql() -> str:
    expr = {
        "qty_units": "CAST(round(l_quantity) AS BIGINT)",
        "price_dollars": "CAST(round(l_extendedprice) AS BIGINT)",
        "discount_permille": "CAST(round(l_discount * 1000.0) AS BIGINT)",
        "tax_permille": "CAST(round(l_tax * 1000.0) AS BIGINT)",
    }
    sums = ",\n         ".join(
        [f"CAST(sum({e}) AS BIGINT) AS s_{c}" for c, e in expr.items()]
        + [
            f"sum(({expr[a]})::HUGEINT * ({expr[b]})) AS x_{a}__{b}"
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        ]
    )
    pair_rows = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            sxy = f"(n * x_{a}__{b} - s_{a}::HUGEINT * s_{b})"
            sxx = f"(n * x_{a}__{a} - s_{a}::HUGEINT * s_{a})"
            syy = f"(n * x_{b}__{b} - s_{b}::HUGEINT * s_{b})"
            r2 = (
                f"CASE WHEN {sxx} = 0 OR {syy} = 0 THEN 0 ELSE "
                f"(CASE WHEN {sxy} >= 0 THEN 1 ELSE -1 END) * "
                f"((1000000::HUGEINT * {sxy} * {sxy}"
                f" - (((1000000::HUGEINT * {sxy} * {sxy}) % ({sxx} * {syy})"
                f" + ({sxx} * {syy})) % ({sxx} * {syy})))"
                f" // ({sxx} * {syy})) END"
            )
            pair_rows.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
                f" CAST(n AS BIGINT) AS n_rows,"
                f" CAST({sxy} AS BIGINT) AS sxy_centered,"
                f" CAST({r2} AS BIGINT) AS r2_signed_micro FROM m"
            )
    union = "\nUNION ALL\n".join(pair_rows)
    return f"""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {sums}
  FROM lineitem
)
{union}
ORDER BY col_a, col_b
"""


LINEITEM_CORR_MATRIX_SQL = _corr_matrix_sql()


# ---------------------------------------------------------------------------
# Canary sampling extrapolation audit (10% hash sample vs truth)
# ---------------------------------------------------------------------------

SAMPLE_AUDIT_PCT = 10


def sample_extrapolation_audit(sf_dir: str, pct: int = SAMPLE_AUDIT_PCT):
    """The canary question every sampled pipeline must answer: how far
    off is the ×10 extrapolation of a deterministic 10% hash sample
    from the true daily event counts?  Emits per-day actual, sampled,
    extrapolated and absolute error — membership is the corpus-wide
    fmix64(event_id) % 100 < pct rule (hash_sample's), so the same
    event is in or out of every downstream sample.

    Scale shape: ONE pass computes day + membership per batch and
    folds the calendar-bounded (day → actual, sampled) map."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        inn = ((_hll_hash(u) % np.uint64(100)) < np.uint64(pct)).astype(np.int64)
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(
            pa.table({"day": day, "inn": pa.array(inn, pa.int64())}), ["day"]
        ).aggregate([("inn", "sum"), ([], "count_all")])
        return pa.table(
            {
                "day": g["day"],
                "n_sample": g["inn_sum"],
                "n_actual": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for d, s, n in zip(
            t["day"].to_pylist(), t["n_sample"].to_pylist(), t["n_actual"].to_pylist()
        ):
            cur = acc.setdefault(d, [0, 0])
            cur[0] += s
            cur[1] += n

    days = sorted(acc)
    mult = 100 // pct
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "n_actual": pa.array([acc[d][1] for d in days], pa.int64()),
            "n_sample": pa.array([acc[d][0] for d in days], pa.int64()),
            "n_est": pa.array([mult * acc[d][0] for d in days], pa.int64()),
            "abs_err": pa.array(
                [abs(mult * acc[d][0] - acc[d][1]) for d in days], pa.int64()
            ),
        }
    )


def _sample_extrapolation_sql(pct: int = SAMPLE_AUDIT_PCT) -> str:
    mult = 100 // pct
    return f"""
WITH {_fmix64_sql("event_id", "epoch_us(ts) // 86400000000", "day")},
d AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_actual,
         CAST(count(*) FILTER (WHERE h % 100 < {pct}) AS BIGINT) AS n_sample
  FROM h5 GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, n_actual, n_sample,
       CAST({mult} * n_sample AS BIGINT) AS n_est,
       CAST(abs({mult} * n_sample - n_actual) AS BIGINT) AS abs_err
FROM d ORDER BY day
"""


SAMPLE_EXTRAPOLATION_AUDIT_SQL = _sample_extrapolation_sql()


RESERVOIR_Q_PERMILLES = (100, 250, 500, 750, 900, 990)


def reservoir_quantile_error(sf_dir: str, pct: int = SAMPLE_AUDIT_PCT):
    """sample_extrapolation_audit's sibling for ORDER statistics: how
    far off are value quantiles estimated from the deterministic 10%
    fmix64(event_id) hash sample vs the exact full-data quantiles?
    Per probe permille: exact cents, sample-estimated cents, absolute
    error.  Quantile = sorted cents at 0-based rank
    (q_permille * (n - 1)) // 1000 (floor interpolation — rank
    arithmetic stays integer on both engines).

    Scale shape: ONE pass folds the value-domain-bounded cents
    histogram with full/sample counts per cents value; the driver
    walks two cumulative-sum arrays — no sort, no per-row state."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        inn = ((_hll_hash(u) % np.uint64(100)) < np.uint64(pct)).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"cents": _to_cents(t["value"]), "inn": pa.array(inn)}),
            ["cents"],
        ).aggregate([("inn", "sum"), ([], "count_all")])
        return pa.table(
            {
                "cents": g["cents"],
                "n_smp": g["inn_sum"],
                "n_all": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from document_extractor_ray.functions.bucketing import fold_partials

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "cents",
        ["n_smp", "n_all"],
        max_keys=2_000_000,
    )
    vals = np.array(sorted(hist), dtype=np.int64)
    n_smp = np.array([hist[v][0] for v in vals], dtype=np.int64)
    n_all = np.array([hist[v][1] for v in vals], dtype=np.int64)
    cum_all = np.cumsum(n_all)
    cum_smp = np.cumsum(n_smp)
    tot_all = int(cum_all[-1])
    tot_smp = int(cum_smp[-1])

    def at_rank(cum: np.ndarray, rank: int) -> int:
        return int(vals[int(np.searchsorted(cum, rank + 1))])

    rows = {"q_permille": [], "exact_cents": [], "est_cents": [], "abs_err": []}
    for q in RESERVOIR_Q_PERMILLES:
        exact = at_rank(cum_all, q * (tot_all - 1) // 1000)
        est = at_rank(cum_smp, q * (tot_smp - 1) // 1000)
        rows["q_permille"].append(q)
        rows["exact_cents"].append(exact)
        rows["est_cents"].append(est)
        rows["abs_err"].append(abs(est - exact))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def _reservoir_quantile_sql(pct: int = SAMPLE_AUDIT_PCT) -> str:
    probes = ", ".join(f"({q})" for q in RESERVOIR_Q_PERMILLES)
    return f"""
WITH {_fmix64_sql("event_id", "CAST(round(value * 100) AS BIGINT)", "cents")},
f AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rk,
             count(*) OVER () AS n FROM h5),
s AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rk,
             count(*) OVER () AS n FROM h5 WHERE h % 100 < {pct}),
qs(q) AS (VALUES {probes}),
e AS (SELECT q, cents AS exact_cents FROM qs
      JOIN f ON f.rk = (q * (f.n - 1)) // 1000),
m AS (SELECT q, cents AS est_cents FROM qs
      JOIN s ON s.rk = (q * (s.n - 1)) // 1000)
SELECT CAST(e.q AS BIGINT) AS q_permille,
       CAST(exact_cents AS BIGINT) AS exact_cents,
       CAST(est_cents AS BIGINT) AS est_cents,
       CAST(abs(est_cents - exact_cents) AS BIGINT) AS abs_err
FROM e JOIN m USING (q)
ORDER BY e.q
"""


RESERVOIR_QUANTILE_ERROR_SQL = _reservoir_quantile_sql()


# ---------------------------------------------------------------------------
# Telemetry double-fire audit (adjacent same-user same-type events)
# ---------------------------------------------------------------------------

DOUBLE_FIRE_WINDOW_US = 3_600_000_000  # 1 hour


def event_double_fire_audit(sf_dir: str, window_us: int = DOUBLE_FIRE_WINDOW_US):
    """Telemetry hygiene: per event type, how many ADJACENT events of
    the same user fire within the double-click window — the duplicate-
    instrumentation smell an ingest pipeline flags before dedup.
    Adjacency is (user, type) ordered by (ts, event_id); the rate
    ships in ppm of the type's event count.

    Scale shape: the per-key ordered scan shuffles ONCE on user_id
    (the sessionize pattern — balanced map_groups partitions, Arrow
    in/out per PERF-37), each group vectorized; the per-type rollup
    is a bounded fold."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, et))
        et_s, ts_s = et[order], ts[order]
        same = et_s[1:] == et_s[:-1]
        close = (ts_s[1:] - ts_s[:-1]) <= window_us
        pair_types = et_s[1:][same & close]
        types, pair_counts = np.unique(pair_types, return_counts=True)
        all_types, tot_counts = np.unique(et_s, return_counts=True)
        cnt = {ty: 0 for ty in all_types}
        for ty, n in zip(types, pair_counts):
            cnt[ty] = int(n)
        return pa.table(
            {
                "event_type": pa.array(list(all_types), pa.string()),
                "pairs_p": pa.array([cnt[ty] for ty in all_types], pa.int64()),
                "n_p": pa.array(tot_counts.astype(np.int64), pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get,
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for ty, p, n in zip(
            t["event_type"].to_pylist(), t["pairs_p"].to_pylist(), t["n_p"].to_pylist()
        ):
            cur = acc.setdefault(ty, [0, 0])
            cur[0] += p
            cur[1] += n

    types = sorted(acc)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array([acc[t][1] for t in types], pa.int64()),
            "n_double_fires": pa.array([acc[t][0] for t in types], pa.int64()),
            "rate_ppm": pa.array(
                [(1_000_000 * acc[t][0]) // acc[t][1] for t in types], pa.int64()
            ),
        }
    )


EVENT_DOUBLE_FIRE_AUDIT_SQL = f"""
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE gap IS NOT NULL
                               AND gap <= {DOUBLE_FIRE_WINDOW_US}) AS BIGINT)
         AS n_double_fires,
       CAST((1000000 * count(*) FILTER (WHERE gap IS NOT NULL
                                          AND gap <= {DOUBLE_FIRE_WINDOW_US}))
            // count(*) AS BIGINT) AS rate_ppm
FROM s GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# HDR-histogram precision sweep (bucket width vs quantile error)
# ---------------------------------------------------------------------------

HDR_SWEEP_WIDTHS = (1, 16, 256)
HDR_SWEEP_QS = (500, 900, 990)


def hdr_precision_sweep(sf_dir: str):
    """Sketch-sizing table: quantile error of a fixed-width bucket
    histogram over event value at widths 1/16/256 cents for
    p50/p90/p99 — the width-vs-accuracy tradeoff a percentile-sketch
    deployment picks from, all from ONE (cents → count) fold
    (PERF-36: resolutions are derived groupings, never extra scans).
    Quantile rule: smallest value whose running count reaches
    ceil(total·q/1000); bucket estimates report the bucket's lower
    edge.

    Scale shape: one bounded histogram fold; the sweep is driver
    math."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"cents": _to_cents(t["value"])}), ["cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"cents": g["cents"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "cents",
        "n",
        max_keys=2_000_000,
    )

    vals = np.array(sorted(hist), dtype=np.int64)
    cnts = np.array([hist[v] for v in vals], dtype=np.int64)
    cum = np.cumsum(cnts)
    tot = int(cum[-1]) if len(cum) else 0

    out = {k: [] for k in ("width", "q_permille", "exact_cents", "est_cents", "abs_err")}
    for w in HDR_SWEEP_WIDTHS:
        b = vals // w
        ub, binv = np.unique(b, return_inverse=True)
        bc = np.zeros(len(ub), np.int64)
        np.add.at(bc, binv, cnts)
        bcum = np.cumsum(bc)
        for q in HDR_SWEEP_QS:
            need = (tot * q + 999) // 1000
            exact = int(vals[np.searchsorted(cum, need)])
            est = int(ub[np.searchsorted(bcum, need)]) * w
            out["width"].append(w)
            out["q_permille"].append(q)
            out["exact_cents"].append(exact)
            out["est_cents"].append(est)
            out["abs_err"].append(abs(est - exact))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def _hdr_sweep_sql() -> str:
    ws = ", ".join(f"({w})" for w in HDR_SWEEP_WIDTHS)
    qs = ", ".join(f"({q})" for q in HDR_SWEEP_QS)
    return f"""
WITH c AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
qs(q) AS (VALUES {qs}),
ws(w) AS (VALUES {ws}),
need AS (SELECT q, (tot * q + 999) // 1000 AS need FROM tot CROSS JOIN qs),
ex AS (
  SELECT q, CAST(min(cents) AS BIGINT) AS exact_cents
  FROM (
    SELECT c.cents, nd.q, nd.need,
           sum(c.n) OVER (PARTITION BY nd.q ORDER BY c.cents) AS cum
    FROM c CROSS JOIN need nd
  ) WHERE cum >= need GROUP BY q
),
bh AS (
  SELECT ws.w, c.cents // ws.w AS b, CAST(sum(c.n) AS BIGINT) AS n
  FROM c CROSS JOIN ws GROUP BY 1, 2
),
est AS (
  SELECT w, q, CAST(min(b) AS BIGINT) AS b
  FROM (
    SELECT bh.w, bh.b, nd.q, nd.need,
           sum(bh.n) OVER (PARTITION BY bh.w, nd.q ORDER BY bh.b) AS cum
    FROM bh CROSS JOIN need nd
  ) WHERE cum >= need GROUP BY 1, 2
)
SELECT CAST(est.w AS BIGINT) AS width,
       CAST(est.q AS BIGINT) AS q_permille,
       ex.exact_cents,
       CAST(est.b * est.w AS BIGINT) AS est_cents,
       CAST(abs(est.b * est.w - ex.exact_cents) AS BIGINT) AS abs_err
FROM est JOIN ex USING (q)
ORDER BY width, q_permille
"""


HDR_PRECISION_SWEEP_SQL = _hdr_sweep_sql()


# ---------------------------------------------------------------------------
# Session timeout sensitivity sweep (gap threshold vs session count)
# ---------------------------------------------------------------------------

SESSION_SWEEP_GAPS_US = (1_800_000_000, 7_200_000_000)  # 30 min, 2 h


def session_timeout_sweep(sf_dir: str, gaps=SESSION_SWEEP_GAPS_US):
    """How sensitive is sessionization to the timeout? For each gap
    threshold, the session count is n_users + (inter-event gaps above
    the threshold) — both thresholds evaluated from ONE per-user
    ordered pass (PERF-36: thresholds are extra counters, not extra
    shuffles).  The spread between the two counts is the instability
    a session-based metric inherits from its timeout choice.

    Scale shape: the sessionize user shuffle once; per-group
    vectorized diff; a 2-counter fold."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def per_user(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        d = np.diff(ts[order])
        return pa.table(
            {
                "gap_us": pa.array(list(gaps), pa.int64()),
                "over": pa.array([int((d > g).sum()) for g in gaps], pa.int64()),
                "users": pa.array([1] * len(gaps), pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get,
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for g, o, u in zip(
            t["gap_us"].to_pylist(), t["over"].to_pylist(), t["users"].to_pylist()
        ):
            cur = acc.setdefault(g, [0, 0])
            cur[0] += o
            cur[1] += u

    out_gaps = sorted(acc)
    return pa.table(
        {
            "gap_us": pa.array(out_gaps, pa.int64()),
            "n_users": pa.array([acc[g][1] for g in out_gaps], pa.int64()),
            "n_sessions": pa.array([acc[g][1] + acc[g][0] for g in out_gaps], pa.int64()),
        }
    )


def _session_sweep_sql(gaps=SESSION_SWEEP_GAPS_US) -> str:
    values = ", ".join(f"({g})" for g in gaps)
    return f"""
WITH s AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
g(gap_us) AS (VALUES {values})
SELECT CAST(g.gap_us AS BIGINT) AS gap_us,
       CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT s.user_id)
            + count(*) FILTER (WHERE s.gap > g.gap_us) AS BIGINT)
         AS n_sessions
FROM s CROSS JOIN g
GROUP BY g.gap_us ORDER BY gap_us
"""


SESSION_TIMEOUT_SWEEP_SQL = _session_sweep_sql()


# ---------------------------------------------------------------------------
# Duplicate-invoice heuristic (billing dedup / fraud screen)
# ---------------------------------------------------------------------------

DUP_INVOICE_WINDOW_DAYS = 7


def duplicate_invoice_audit(sf_dir: str, window_days: int = DUP_INVOICE_WINDOW_DAYS):
    """Billing-dedup screen: pairs of orders by the SAME customer for
    the SAME amount (exact cents) within a 7-day window — the classic
    double-billing heuristic.  Emits the pair count and the number of
    distinct flagged orders.

    Scale shape: the pair search shuffles once on o_custkey (the
    sessionize pattern); within a customer the candidate pairs are
    grouped by exact cents first, so the quadratic step runs only
    inside (customer, amount) micro-groups."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

    def per_cust(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        day = (
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, day, cents))
        c, d, k = cents[order], day[order], okey[order]
        pairs = 0
        flagged: set = set()
        # within equal-cents runs, all pairs within the day window
        run_start = 0
        for i in range(1, len(c) + 1):
            if i == len(c) or c[i] != c[run_start]:
                for a in range(run_start, i):
                    for b in range(a + 1, i):
                        if abs(int(d[b]) - int(d[a])) <= window_days:
                            pairs += 1
                            flagged.add(int(k[a]))
                            flagged.add(int(k[b]))
                run_start = i
        return pa.table(
            {
                "pairs": pa.array([pairs], pa.int64()),
                "flagged": pa.array([len(flagged)], pa.int64()),
            }
        )

    pairs = 0
    flagged = 0
    for t in map(
        ray.get,
        ds.groupby("o_custkey").map_groups(per_cust, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        pairs += sum(t["pairs"].to_pylist())
        flagged += sum(t["flagged"].to_pylist())

    return pa.table(
        {
            "n_suspect_pairs": pa.array([pairs], pa.int64()),
            "n_orders_flagged": pa.array([flagged], pa.int64()),
        }
    )


DUPLICATE_INVOICE_AUDIT_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
),
p AS (
  SELECT a.o_orderkey AS ka, b.o_orderkey AS kb
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey
   AND a.cents = b.cents
   AND b.o_orderkey > a.o_orderkey
   AND abs(b.day - a.day) <= {DUP_INVOICE_WINDOW_DAYS}
)
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_suspect_pairs,
       CAST((SELECT count(*) FROM (
           SELECT ka AS k FROM p UNION SELECT kb FROM p)) AS BIGINT)
         AS n_orders_flagged
"""


# ---------------------------------------------------------------------------
# Price-ending forensic profile (.00 / .99 / psychological endings)
# ---------------------------------------------------------------------------

def price_ending_profile(sf_dir: str):
    """Distribution of order-amount cent endings — round (.00),
    charm (.99/.95), and everything else — the pricing-forensics
    companion of value_benford_profile (fabricated or synthetic
    amounts show ending mixes real pricing never does).

    Scale shape: per-block (ending-class → count) fold over
    cents % 100; three counters."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        e = cents % 100
        return pa.table(
            {
                "round00": pa.array([int((e == 0).sum())], pa.int64()),
                "charm": pa.array([int(((e == 99) | (e == 95)).sum())], pa.int64()),
                "n": pa.array([len(e)], pa.int64()),
            }
        )

    r00 = charm = n = 0
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        r00 += sum(t["round00"].to_pylist())
        charm += sum(t["charm"].to_pylist())
        n += sum(t["n"].to_pylist())

    other = n - r00 - charm
    return pa.table(
        {
            "n_orders": pa.array([n], pa.int64()),
            "n_round00": pa.array([r00], pa.int64()),
            "n_charm": pa.array([charm], pa.int64()),
            "n_other": pa.array([other], pa.int64()),
            "round00_permille": pa.array([(1000 * r00) // n if n else 0], pa.int64()),
            "charm_permille": pa.array([(1000 * charm) // n if n else 0], pa.int64()),
        }
    )


PRICE_ENDING_PROFILE_SQL = """
WITH c AS (
  SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) % 100 AS e FROM orders
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE e = 0) AS BIGINT) AS r00,
         CAST(count(*) FILTER (WHERE e = 99 OR e = 95) AS BIGINT) AS charm
  FROM c
)
SELECT n AS n_orders, r00 AS n_round00, charm AS n_charm,
       CAST(n - r00 - charm AS BIGINT) AS n_other,
       CAST(CASE WHEN n = 0 THEN 0 ELSE (1000 * r00) // n END AS BIGINT)
         AS round00_permille,
       CAST(CASE WHEN n = 0 THEN 0 ELSE (1000 * charm) // n END AS BIGINT)
         AS charm_permille
FROM a
"""


# ---------------------------------------------------------------------------
# Revenue waterfall per order year (gross → discount → tax → net)
# ---------------------------------------------------------------------------

def orders_margin_waterfall(sf_dir: str):
    """The finance waterfall per shipment year: gross line revenue,
    discount given, tax collected, and net — each leg summed in exact
    cents with the q1 rounding convention (per-line round half-away,
    then integer sums), so the decomposition re-adds bit-for-bit.

    Scale shape: per-block per-year partials (years are calendar-
    bounded), one driver fold."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice", "l_discount", "l_tax"]
    )

    def partial(t: pa.Table) -> pa.Table:
        year = pc.year(t["l_shipdate"])
        gross = _to_cents(t["l_extendedprice"])
        disc = pc.cast(
            pc.round(
                pc.multiply(pc.multiply(t["l_extendedprice"], t["l_discount"]), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        tax = pc.cast(
            pc.round(
                pc.multiply(pc.multiply(t["l_extendedprice"], t["l_tax"]), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(
            pa.table({"year": year, "g": gross, "d": disc, "x": tax}), ["year"]
        ).aggregate([("g", "sum"), ("d", "sum"), ("x", "sum"), ([], "count_all")])
        return pa.table(
            {
                "year": pc.cast(g["year"], pa.int64()),
                "g": g["g_sum"],
                "d": g["d_sum"],
                "x": g["x_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for y, g, d, x, n in zip(
            t["year"].to_pylist(), t["g"].to_pylist(), t["d"].to_pylist(),
            t["x"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(y, [0, 0, 0, 0])
            cur[0] += g
            cur[1] += d
            cur[2] += x
            cur[3] += n

    years = sorted(acc)
    return pa.table(
        {
            "year": pa.array(years, pa.int64()),
            "n_lines": pa.array([acc[y][3] for y in years], pa.int64()),
            "gross_cents": pa.array([acc[y][0] for y in years], pa.int64()),
            "discount_cents": pa.array([acc[y][1] for y in years], pa.int64()),
            "tax_cents": pa.array([acc[y][2] for y in years], pa.int64()),
            "net_cents": pa.array(
                [acc[y][0] - acc[y][1] + acc[y][2] for y in years], pa.int64()
            ),
        }
    )


ORDERS_MARGIN_WATERFALL_SQL = """
WITH l AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS year,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS g,
         CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT) AS d,
         CAST(round(l_extendedprice * l_tax * 100.0) AS BIGINT) AS x
  FROM lineitem
)
SELECT year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(g) AS BIGINT) AS gross_cents,
       CAST(sum(d) AS BIGINT) AS discount_cents,
       CAST(sum(x) AS BIGINT) AS tax_cents,
       CAST(sum(g) - sum(d) + sum(x) AS BIGINT) AS net_cents
FROM l GROUP BY year ORDER BY year
"""


# ---------------------------------------------------------------------------
# Pareto frontier over the part catalog (size vs price)
# ---------------------------------------------------------------------------

def part_pareto_frontier(sf_dir: str):
    """Non-dominated parts in the (size ↑, retail price ↓) plane —
    the "cheapest at every capability level" skyline a procurement
    view materializes.  A part survives unless some other part has
    size ≥, price ≤ and at least one strictly better (ties broken
    nowhere — true skyline semantics; equal-(size, price) twins both
    survive).

    Scale shape: per-block candidate pruning (a block's local skyline
    is a superset filter — dominance is transitive), then the exact
    skyline scan over the pruned bounded set on the driver."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_size", "p_retailprice"])

    def local_skyline(t: pa.Table) -> pa.Table:
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _to_cents(t["p_retailprice"]).to_numpy(zero_copy_only=False)
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((cents, -size))  # size desc, then price asc
        s, c, k = size[order], cents[order], key[order]
        # block-local skyline (a superset filter — dominance is
        # transitive, so the global scan stays exact): keep a row iff
        # it is its size-run's min price AND strictly cheaper than
        # every strictly-larger size's min
        new = np.ones(len(s), dtype=bool)
        new[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        run_min = c[starts]  # price asc within run
        prev_strict = np.r_[np.iinfo(np.int64).max,
                            np.minimum.accumulate(run_min)[:-1]]
        keep = (c == run_min[run_id]) & (c < prev_strict[run_id])
        return pa.table(
            {
                "p_partkey": pa.array(k[keep], pa.int64()),
                "p_size": pa.array(s[keep], pa.int64()),
                "price_cents": pa.array(c[keep], pa.int64()),
            }
        )

    cands = [
        t
        for t in map(
            ray.get,
            ds.map_batches(local_skyline, batch_format="pyarrow").to_arrow_refs(),
        )
        if t.num_rows
    ]
    tbl = pa.concat_tables(cands)
    size = tbl["p_size"].to_numpy(zero_copy_only=False)
    cents = tbl["price_cents"].to_numpy(zero_copy_only=False)
    key = tbl["p_partkey"].to_numpy(zero_copy_only=False)
    keep = np.ones(len(size), bool)
    for i in range(len(size)):
        dom = (size >= size[i]) & (cents <= cents[i]) & (
            (size > size[i]) | (cents < cents[i])
        )
        if dom.any():
            keep[i] = False
    out = pa.table(
        {
            "p_partkey": pa.array(key[keep], pa.int64()),
            "p_size": pa.array(size[keep], pa.int64()),
            "price_cents": pa.array(cents[keep], pa.int64()),
        }
    )
    return out.sort_by([("p_size", "ascending"), ("price_cents", "ascending"),
                        ("p_partkey", "ascending")])


PART_PARETO_FRONTIER_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_cents
  FROM part
)
SELECT p_partkey, p_size, price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size > a.p_size OR b.price_cents < a.price_cents)
)
ORDER BY p_size, price_cents, p_partkey
"""


# ---------------------------------------------------------------------------
# Median dwell time per event-type transition
# ---------------------------------------------------------------------------

def transition_gap_median(sf_dir: str):
    """Per (prev_type → next_type) transition: occurrence count and
    the LOWER-MEDIAN dwell time between the two events — the timing
    layer on top of event_transitions' counts (a Markov chain with
    holding times).  Median rule: element at (n−1)//2 of the sorted
    gaps, deterministic on ties.

    Scale shape: one user shuffle (sessionize pattern); per-group
    vectorized successor pairing; the (pair → gap histogram) fold is
    bounded by type² × distinct gaps (day-granular feed)."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])

    def per_user(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        et_s, ts_s = et[order], ts[order]
        if len(ts_s) < 2:
            return pa.table(
                {
                    "prev_type": pa.array([], pa.string()),
                    "next_type": pa.array([], pa.string()),
                    "gap_us": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "prev_type": pa.array(et_s[:-1]),
                    "next_type": pa.array(et_s[1:]),
                    "gap_us": pa.array(ts_s[1:] - ts_s[:-1], pa.int64()),
                }
            ),
            ["prev_type", "next_type", "gap_us"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev_type": g["prev_type"],
                "next_type": g["next_type"],
                "gap_us": g["gap_us"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist: dict = {}
    for t in map(
        ray.get,
        ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for p, nx, gp, n in zip(
            t["prev_type"].to_pylist(), t["next_type"].to_pylist(),
            t["gap_us"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = hist.setdefault((p, nx), {})
            cur[gp] = cur.get(gp, 0) + n

    rows = []
    for (p, nx), gaps in sorted(hist.items()):
        n = sum(gaps.values())
        need = (n - 1) // 2 + 1
        cum = 0
        med = 0
        for gp in sorted(gaps):
            cum += gaps[gp]
            if cum >= need:
                med = gp
                break
        rows.append((p, nx, n, med))
    return pa.table(
        {
            "prev_type": pa.array([r[0] for r in rows], pa.string()),
            "next_type": pa.array([r[1] for r in rows], pa.string()),
            "n_transitions": pa.array([r[2] for r in rows], pa.int64()),
            "median_gap_us": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


TRANSITION_GAP_MEDIAN_SQL = """
WITH s AS (
  SELECT lag(event_type) OVER w AS prev_type,
         event_type AS next_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (SELECT prev_type, next_type, gap_us FROM s WHERE prev_type IS NOT NULL),
r AS (
  SELECT prev_type, next_type, gap_us,
         row_number() OVER (PARTITION BY prev_type, next_type
                            ORDER BY gap_us) AS rn,
         count(*) OVER (PARTITION BY prev_type, next_type) AS n
  FROM g
)
SELECT prev_type, next_type,
       CAST(any_value(n) AS BIGINT) AS n_transitions,
       CAST(min(gap_us) FILTER (WHERE rn = (n - 1) // 2 + 1) AS BIGINT)
         AS median_gap_us
FROM r GROUP BY prev_type, next_type
ORDER BY prev_type, next_type
"""


# ---------------------------------------------------------------------------
# Nation trade balance (supplied vs purchased line revenue)
# ---------------------------------------------------------------------------

def nation_trade_balance(sf_dir: str):
    """Per nation: line revenue SUPPLIED (via the supplier side) vs
    PURCHASED (via the customer side of the owning order) and the
    balance — the q5/q7 join machinery folded into one two-sided
    ledger.

    Scale plan: supplier and customer nation maps broadcast once
    (``state.lookup_join``); the customer side pays ONE partitioned
    lineitem⋈orders join (q3 plan), both sides pre-sliced to join key
    + cents; per-nation folds are dimension-bounded."""
    from document_extractor_ray import state

    supp = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    supp_ref = state.broadcast(supp)

    cust = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    cust_ref = state.broadcast(cust)

    nation = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()

    # supplied side: one broadcast-dim pass over lineitem
    def supplied(t: pa.Table) -> pa.Table:
        d = state.cached_get(supp_ref)
        t = state.lookup_join(t, "l_suppkey", d, "s_suppkey", ["s_nationkey"])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "nk": pc.cast(t["s_nationkey"], pa.int64()),
                    "cents": _to_cents(t["l_extendedprice"]),
                }
            ),
            ["nk"],
        ).aggregate([("cents", "sum")])
        return pa.table({"nk": g["nk"], "cents": g["cents_sum"]})

    sup_acc = fold_partials(
        _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice"])
        .map_batches(supplied, batch_format="pyarrow"),
        "nk",
        "cents",
    )

    # purchased side: lineitem ⋈ orders (partitioned), customer dim broadcast
    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )

    def slim_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "cents": _to_cents(t["l_extendedprice"]),
            }
        )

    joined = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
        .map_batches(slim_li, batch_format="pyarrow")
        .join(
            _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]),
            join_type="inner",
            num_partitions=n_parts,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
    )

    def purchased(t: pa.Table) -> pa.Table:
        d = state.cached_get(cust_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["c_nationkey"])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "nk": pc.cast(t["c_nationkey"], pa.int64()),
                    "cents": t["cents"],
                }
            ),
            ["nk"],
        ).aggregate([("cents", "sum")])
        return pa.table({"nk": g["nk"], "cents": g["cents_sum"]})

    pur_acc = fold_partials(
        joined.map_batches(purchased, batch_format="pyarrow"), "nk", "cents"
    )

    names = dict(
        zip(
            pc.cast(nation["n_nationkey"], pa.int64()).to_pylist(),
            nation["n_name"].to_pylist(),
        )
    )
    keys = sorted(set(sup_acc) | set(pur_acc))
    return pa.table(
        {
            "n_name": pa.array([names[k] for k in keys], pa.string()),
            "supplied_cents": pa.array([sup_acc.get(k, 0) for k in keys], pa.int64()),
            "purchased_cents": pa.array([pur_acc.get(k, 0) for k in keys], pa.int64()),
            "balance_cents": pa.array(
                [sup_acc.get(k, 0) - pur_acc.get(k, 0) for k in keys], pa.int64()
            ),
        }
    ).sort_by([("n_name", "ascending")])


NATION_TRADE_BALANCE_SQL = """
WITH sup AS (
  SELECT s_nationkey AS nk,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS supplied
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1
),
pur AS (
  SELECT c_nationkey AS nk,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS purchased
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT n.n_name,
       CAST(COALESCE(sup.supplied, 0) AS BIGINT) AS supplied_cents,
       CAST(COALESCE(pur.purchased, 0) AS BIGINT) AS purchased_cents,
       CAST(COALESCE(sup.supplied, 0) - COALESCE(pur.purchased, 0) AS BIGINT)
         AS balance_cents
FROM nation n
LEFT JOIN sup ON sup.nk = n.n_nationkey
LEFT JOIN pur ON pur.nk = n.n_nationkey
WHERE sup.nk IS NOT NULL OR pur.nk IS NOT NULL
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# Association-rule metrics over brand co-occurrence baskets
# ---------------------------------------------------------------------------

def brand_rule_metrics(sf_dir: str):
    """Support, confidence and lift for EVERY brand pair co-occurring
    in an order basket (the rule layer on top of brand_basket_pairs'
    raw counts; the pair domain is brands² so nothing is truncated):
    conf(a→b) = pair/n_a, conf(b→a) = pair/n_b, lift = pair·N/(n_a·n_b)
    — each a truncating milli rational.

    Scale shape: distinct (order, brand) memberships come from the
    partitioned fact⋈dim join bucketed by order; basket marginals and
    the bounded pair table fold on the driver like the parent op."""
    from document_extractor_ray import state

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim_ref = state.broadcast(dim)
    brands = sorted(set(dim["p_brand"].to_pylist()))
    b_code = {b: i for i, b in enumerate(brands)}
    nb = len(brands)

    def member_partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "l_partkey", d, "p_partkey", ["p_brand"])
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        bc = np.array(
            [b_code[b] for b in t["p_brand"].to_pylist()], dtype=np.int64
        )
        comp = np.unique(ok * nb + bc)
        return pa.table({"comp": pa.array(comp, pa.int64())})

    comps = [
        t["comp"].to_numpy(zero_copy_only=False)
        for t in map(
            ray.get,
            _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
            .map_batches(member_partial, batch_format="pyarrow")
            .to_arrow_refs(),
        )
        if t.num_rows
    ]
    comp = np.unique(np.concatenate(comps)) if comps else np.zeros(0, np.int64)
    orders = comp // nb
    codes = comp % nb
    n_orders = len(np.unique(orders))
    marg = np.bincount(codes, minlength=nb).astype(int)

    # all within-order pairs: orders are contiguous in the sorted comp
    new = np.ones(len(orders), dtype=bool)
    new[1:] = orders[1:] != orders[:-1]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], len(orders)]
    lens = ends - starts
    # vectorized within-basket pair enumeration, grouped by basket
    # length (codes are ascending inside each sorted-composite run,
    # so (i < j) pairs are already (a < b) pairs)
    pair_keys = []
    for l in np.unique(lens):
        if l < 2:
            continue
        sel = starts[lens == l]
        matrix = codes[sel[:, None] + np.arange(l)[None, :]]
        iu, ju = np.triu_indices(int(l), 1)
        pair_keys.append((matrix[:, iu] * nb + matrix[:, ju]).ravel())
    pair_counts: dict = {}
    if pair_keys:
        keys, cnts = np.unique(np.concatenate(pair_keys), return_counts=True)
        pair_counts = {
            (int(kk) // nb, int(kk) % nb): int(cc) for kk, cc in zip(keys, cnts)
        }

    def fdiv(a: int, d: int) -> int:
        return a // d if d else 0

    rows = []
    for (a, b), n_ab in sorted(pair_counts.items()):
        na, nb_ = int(marg[a]), int(marg[b])
        rows.append(
            (
                brands[a], brands[b], n_ab,
                fdiv(1000 * n_ab, na),
                fdiv(1000 * n_ab, nb_),
                fdiv(1000 * n_ab * n_orders, na * nb_),
            )
        )
    rows.sort()
    return pa.table(
        {
            "brand_a": pa.array([r[0] for r in rows], pa.string()),
            "brand_b": pa.array([r[1] for r in rows], pa.string()),
            "n_baskets": pa.array([r[2] for r in rows], pa.int64()),
            "conf_ab_milli": pa.array([r[3] for r in rows], pa.int64()),
            "conf_ba_milli": pa.array([r[4] for r in rows], pa.int64()),
            "lift_milli": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


BRAND_RULE_METRICS_SQL = """
WITH m AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS b
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM m),
marg AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
p AS (
  SELECT a.b AS brand_a, c.b AS brand_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM m a JOIN m c ON a.o = c.o AND c.b > a.b
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.n_ab AS n_baskets,
       CAST((1000 * p.n_ab) // ma.n AS BIGINT) AS conf_ab_milli,
       CAST((1000 * p.n_ab) // mb.n AS BIGINT) AS conf_ba_milli,
       CAST((1000::HUGEINT * p.n_ab * nn.n_orders) // (ma.n * mb.n) AS BIGINT)
         AS lift_milli
FROM p
JOIN marg ma ON ma.b = p.brand_a
JOIN marg mb ON mb.b = p.brand_b
CROSS JOIN n nn
ORDER BY brand_a, brand_b
"""


# ---------------------------------------------------------------------------
# Daily new-user share (acquisition vs activity growth metric)
# ---------------------------------------------------------------------------

def daily_new_user_share(sf_dir: str):
    """Per day: events, users first seen that day, and the new-user
    share of active users in milli — the growth dashboard's
    acquisition-vs-retention split.

    Scale shape: per-user first-seen day via ``bucketed_agg`` min
    (key-per-row rule); daily event/active counts from the bounded
    calendar fold; the join of the two is a driver dict merge."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def first_partial(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64()))
        g = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"], "day": day}), ["user_id"]
        ).aggregate([("day", "min")])
        return pa.table({"user_id": g["user_id"], "first_day": g["day_min"]})

    firsts = bucketed_agg(
        ds.map_batches(first_partial, batch_format="pyarrow"),
        ["user_id"],
        [("first_day", "min", "first_day")],
    )
    new_by_day: dict = {}
    for t in map(ray.get, firsts.to_arrow_refs()):
        if not t.num_rows:
            continue
        for d in t["first_day"].to_pylist():
            new_by_day[d] = new_by_day.get(d, 0) + 1

    # per-block distinct users per day would be PARTIAL (a user can
    # appear in several blocks) — fold (day, user) pairs exactly via
    # bucketed_agg like the HLL audits instead
    pairs = bucketed_agg(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "day": pc.divide(
                        pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64())
                    ),
                    "user_id": t["user_id"],
                    "n_part": pa.array(np.ones(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["day", "user_id"],
        [("n_part", "sum", "n")],
    )
    active: dict = {}
    events: dict = {}
    for t in map(ray.get, pairs.to_arrow_refs()):
        if not t.num_rows:
            continue
        for d, n in zip(t["day"].to_pylist(), t["n"].to_pylist()):
            active[d] = active.get(d, 0) + 1
            events[d] = events.get(d, 0) + n

    days = sorted(events)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "n_events": pa.array([events[d] for d in days], pa.int64()),
            "n_active_users": pa.array([active[d] for d in days], pa.int64()),
            "n_new_users": pa.array([new_by_day.get(d, 0) for d in days], pa.int64()),
            "new_share_milli": pa.array(
                [(1000 * new_by_day.get(d, 0)) // active[d] for d in days],
                pa.int64(),
            ),
        }
    )


DAILY_NEW_USER_SHARE_SQL = """
WITH e AS (
  SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
d AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM e GROUP BY 1
),
nw AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS n_new
       FROM f GROUP BY 1)
SELECT CAST(d.day AS BIGINT) AS day, d.n_events,
       d.n_active AS n_active_users,
       CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new_users,
       CAST((1000 * COALESCE(nw.n_new, 0)) // d.n_active AS BIGINT)
         AS new_share_milli
FROM d LEFT JOIN nw ON nw.day = d.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Weekly event-type mix drift (G-test vs the overall mix)
# ---------------------------------------------------------------------------

def type_mix_drift_gtest(sf_dir: str):
    """Per ISO-ish week (epoch-day // 7): the G statistic of that
    week's event-type mix against the whole horizon's mix — the
    composition-drift monitor a streaming pipeline alarms on.
    G = 2·Σ O·(L(O·N_w_tot·? ) ... expressed exactly as
    2·Σ_t O_t·(L(O_t·N) − L(E_num)) with E_num = week_total·type_total
    and the L(·) ln-micro convention (lang_source_gtest's identity:
    ln(O/E) = ln(O·N) − ln(week·type)).

    Scale shape: one bounded (week, type) contingency fold."""
    import math

    day_us = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        week = pc.divide(
            pc.divide(pc.cast(t["ts"], pa.int64()), pa.scalar(day_us, pa.int64())),
            pa.scalar(7, pa.int64()),
        )
        g = pa.TableGroupBy(
            pa.table({"week": week, "event_type": t["event_type"]}),
            ["week", "event_type"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "week": g["week"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["week", "event_type"],
        "n",
    )

    n_tot = sum(cells.values())
    wk_tot: dict = {}
    ty_tot: dict = {}
    for (w, ty), n in cells.items():
        wk_tot[w] = wk_tot.get(w, 0) + n
        ty_tot[ty] = ty_tot.get(ty, 0) + n

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    weeks = sorted(wk_tot)
    rows = []
    for w in weeks:
        g2 = 0
        for ty, tt in ty_tot.items():
            o = cells.get((w, ty), 0)
            if o:
                g2 += 2 * o * (L(o * n_tot) - L(wk_tot[w] * tt))
        rows.append((w, wk_tot[w], g2))
    return pa.table(
        {
            "week": pa.array([r[0] for r in rows], pa.int64()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "g_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


TYPE_MIX_DRIFT_GTEST_SQL = """
WITH c AS (
  SELECT (epoch_us(ts) // 86400000000) // 7 AS week, event_type,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
w AS (SELECT week, CAST(sum(o) AS BIGINT) AS wt FROM c GROUP BY 1),
ty AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS tt FROM c GROUP BY 1),
n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c)
SELECT CAST(c.week AS BIGINT) AS week,
       CAST(any_value(w.wt) AS BIGINT) AS n_events,
       CAST(sum(2 * c.o
                * (CAST(round(ln(c.o * n.n) * 1000000) AS BIGINT)
                   - CAST(round(ln(w.wt * ty.tt) * 1000000) AS BIGINT)))
            AS BIGINT) AS g_micro
FROM c JOIN w USING (week) JOIN ty USING (event_type) CROSS JOIN n
GROUP BY c.week ORDER BY week
"""
