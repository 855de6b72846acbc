"""Generic relational operators over the TPC-H-ish test tables.

These prove the engine's general dataflow coverage (groupby aggregate,
broadcast join, windowed/sessionized aggregates, sort/top-k) with exact
DuckDB oracles.  Numeric outputs are integer-exact by construction
(money summed in cents, ratios in permille, averages expressed as
sum/count of identical integers) so the driver's value-hash comparison
cannot be broken by floating-point association order.

Scale notes (100 TB thinking):
- aggregates pre-combine inside map_batches before the small groupby
  where cardinality is known to be low (partial aggregation pattern);
- dimension joins broadcast the small side via ray.put once, never a
  shuffle join;
- sessionize shuffles once on user_id (unavoidable: per-key ordered
  gap detection), with the per-group work vectorized in pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from document_extractor_ray.functions.bucketing import fold_partials


def _read(sf_dir: str, name: str, columns=None):
    from document_extractor_ray.sources import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/{name}.parquet", columns=columns, override_num_blocks=_n_blocks()
    )


def _n_blocks() -> int:
    """Block count ~ cluster CPUs: the default splitter makes far more,
    and every extra block is a task + a shuffle partition (measured 4x
    on the sf0.1 Q1 aggregate: 3.8s default vs 0.9s at 32 blocks)."""
    if ray.is_initialized():
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    return 32


# DuckDB round() is half-away-from-zero; pyarrow defaults to half-even.
# Money values hit exact .5 ties (e.g. 1230 cents * 0.95), so the oracle
# comparison needs the same tie-break.  (round_mode passed as a kwarg:
# a module-level RoundOptions instance is not cloudpickle-able.)


def _ts_us(col: str):
    """Batch fn casting a timestamp column back to microsecond unit."""

    def cast(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(col)
        return t.set_column(i, col, pc.cast(t[col], pa.timestamp("us")))

    return cast


def _join_partitions(*paths: str) -> int:
    """Hash-join partition count scaled to DATA SIZE (~64 MB of input
    per partition), clamped to [4, 4x cluster CPUs].  Measured on the
    sf0.1 join: 32 partitions cost 3.7 s where 4-8 cost 2.2 s — every
    partition is aggregator-actor work, so small inputs want few; at
    corpus scale the byte-based count rises until the CPU cap."""
    import os

    total = 0
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    by_size = max(4, total // (64 << 20) + 1)
    cap = 4 * (int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8)
    return int(min(by_size, cap))


def _to_cents(arr) -> pa.Array:
    return pc.cast(
        pc.round(pc.multiply(arr, 100.0), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# ---------------------------------------------------------------------------
# Q1-style grouped aggregate over lineitem
# ---------------------------------------------------------------------------

def q1_lineitem(sf_dir: str):
    """Pricing summary: filter on ship date, aggregate per
    (returnflag, linestatus).  Money in integer cents for exactness."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), type=pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = pc.cast(pc.round(t["l_quantity"], round_mode="half_towards_infinity"), pa.int64())
        price_c = _to_cents(t["l_extendedprice"])
        disc_c = _to_cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "price_cents": price_c,
                "disc_cents": disc_c,
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_base_price_cents"),
            Sum("disc_cents", alias_name="sum_disc_price_cents"),
            Count(alias_name="count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Broadcast join: top customers by order spend, with nation name
# ---------------------------------------------------------------------------

def top_customers(sf_dir: str, k: int = 10):
    """Sum order value per customer, broadcast-join customer+nation
    dims (ray.put once, dict lookup per batch — never a shuffle join),
    top-k by spend."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": _to_cents(t["o_totalprice"]),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    # customer keys are key-per-row at crawl scale: bucketed aggregate,
    # not Ray's per-group hash aggregate (PERF.md steps 20-23)
    per_cust = bucketed_agg(
        orders.map_batches(to_cents, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "sum", "total_spend_cents"), (None, "count", "n_orders")],
    )

    # Broadcast the pre-joined dim table once (Arrow: zero-copy through
    # the object store); per batch the attach is pc.index_in + take —
    # no dict, no per-row Python (state.lookup_join).
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    dim = state.lookup_join(
        cust, "c_nationkey", nation, "n_nationkey", ["n_name"], fill=""
    ).select(["c_custkey", "c_name", "n_name"])
    ref = state.broadcast(dim)

    def attach(t: pa.Table) -> pa.Table:
        return state.lookup_join(
            t, "o_custkey", state.cached_get(ref), "c_custkey",
            ["c_name", "n_name"], fill="",
        )

    out = (
        per_cust.map_batches(attach, batch_format="pyarrow")
        .sort(["total_spend_cents", "o_custkey"], descending=[True, False])
        .limit(k)
    )
    return out


TOP_CUSTOMERS_SQL = """
SELECT o.o_custkey,
       CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_spend_cents,
       count(*) AS n_orders,
       any_value(c.c_name) AS c_name,
       any_value(n.n_name) AS n_name
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY o.o_custkey
ORDER BY total_spend_cents DESC, o_custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Tumbling-window aggregate over the events stream
# ---------------------------------------------------------------------------

def events_daily(sf_dir: str):
    """Events per (event_type, day): tumbling 1-day window as a
    grouped aggregate (streaming-window analogue, SURVEY.md §2.11)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        cents = _to_cents(t["value"])
        return pa.table(
            {"event_type": t["event_type"], "day": day, "value_cents": cents}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="sum_value_cents"))
        .sort(["event_type", "day"])
        # Ray's aggregate shuffle downcasts timestamp keys to [s]; restore
        # [us] so the dtype matches DuckDB date_trunc exactly.
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )


EVENTS_DAILY_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sliding_7d(sf_dir: str):
    """Sliding 7-day window counts per event type: each event
    contributes to the 7 window-end days it falls into (explode inside
    map_batches — 7x small rows, no self-join), then one grouped
    count.  The window explode is the standard shuffle-free sliding
    aggregation shape at scale."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    from datetime import timedelta

    def explode(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        parts = []
        for k in range(7):
            parts.append(
                pa.table(
                    {
                        "event_type": t["event_type"],
                        "window_end": pc.add(day, pa.scalar(timedelta(days=k))),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_end"])
        .aggregate(Count(alias_name="n"))
        .sort(["event_type", "window_end"])
        .map_batches(_ts_us("window_end"), batch_format="pyarrow")
    )


EVENTS_SLIDING_SQL = """
SELECT event_type,
       date_trunc('day', ts) + to_days(CAST(t.k AS INTEGER)) AS window_end,
       count(*) AS n
FROM events, range(0, 7) AS t(k)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sessionization (per-key ordered gap detection)
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def sessionize(sf_dir: str):
    """Session count per user with a 30-minute inactivity gap.

    Shuffles once — but on a HASH BUCKET of user_id, not user_id
    itself: map_groups pays one Python call + frame construction per
    group (measured ~3.7k rows/s with unique keys, PERF.md), so the
    group is a balanced partition of many users and the whole
    partition's gap count is one vectorized pandas groupby-diff.  The
    ordering assumption (events sorted by ts within a user) is
    established inside the partition — input order never matters."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        # Cheap deterministic spreader; multiply-shift mixes the low
        # bits so sequential user_ids don't all land in order.
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32())
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = g.groupby("user_id", sort=True)["ts"].diff().dt.total_seconds() > SESSION_GAP_S
        n_sessions = gaps.groupby(g["user_id"], sort=True).sum().astype(np.int64) + 1
        return pd.DataFrame(
            {
                "user_id": n_sessions.index.to_numpy(),
                "n_sessions": n_sessions.to_numpy(),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("user_id")
    )


SESSIONIZE_SQL = f"""
SELECT user_id, CAST(1 + sum(CASE WHEN diff_s > {SESSION_GAP_S} THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM (
    SELECT user_id,
           epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS diff_s
    FROM events
)
GROUP BY user_id
ORDER BY user_id
"""


def session_entry_exit(sf_dir: str):
    """Session entry/exit event-type matrix: per 30-minute-gap session
    the type of its first and last event, counted over all sessions —
    the bounce/landing profile (which flows START a visit vs which
    ones users leave on) that sits one level above sessionize's raw
    counts.

    Scale shape: sessionize's hash-bucketed map_groups plan (balanced
    partitions of many users, one vectorized pandas pass each); only
    the |types|^2-bounded (entry, exit) count cells leave each
    partition, folded on the driver via fold_partials.  Ties within a
    timestamp order by event_id on both sides (events ts is monotone
    in event_id, so this is belt-and-suspenders determinism)."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].diff()
        new_s = prev.isna() | (prev.dt.total_seconds() > SESSION_GAP_S)
        sess = new_s.cumsum()  # first row per user is always True
        agg = g.groupby(sess.to_numpy(), sort=False)["event_type"].agg(
            ["first", "last"]
        )
        cells = (
            agg.groupby(["first", "last"], sort=True).size().astype(np.int64)
        )
        idx = cells.index
        return pa.table(
            {
                "entry_type": pa.array([k[0] for k in idx], pa.string()),
                "exit_type": pa.array([k[1] for k in idx], pa.string()),
                "n": pa.array(cells.to_numpy(), pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas"),
        ["entry_type", "exit_type"],
        "n",
    )
    keys = sorted(cells)
    return pa.table(
        {
            "entry_type": pa.array([k[0] for k in keys], pa.string()),
            "exit_type": pa.array([k[1] for k in keys], pa.string()),
            "n_sessions": pa.array([cells[k] for k in keys], pa.int64()),
        }
    )


SESSION_ENTRY_EXIT_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
  FROM e
),
fl AS (
  SELECT user_id, sess,
         first_value(event_type) OVER ws AS entry_type,
         last_value(event_type) OVER ws AS exit_type,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ts, event_id) AS rn
  FROM s
  WINDOW ws AS (PARTITION BY user_id, sess ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS n_sessions
FROM fl WHERE rn = 1
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Dimension rollup: nations per region (broadcast join of two dims)
# ---------------------------------------------------------------------------

def nations_per_region(sf_dir: str):
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    ref = state.broadcast(region)

    def attach(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "n_regionkey", state.cached_get(ref), "r_regionkey",
            ["r_name"], fill="",
        )
        return t.select(["r_name", "n_nationkey"])

    return (
        nation.map_batches(attach, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_nations"))
        .sort("r_name")
    )


NATIONS_PER_REGION_SQL = """
SELECT r.r_name, count(*) AS n_nations
FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


# ---------------------------------------------------------------------------
# Sort / top-k over documents
# ---------------------------------------------------------------------------

def top_k_longest_docs(sf_dir: str, k: int = 20):
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars", "lang"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


TOP_K_LONGEST_SQL = """
SELECT doc_id, n_chars, lang FROM documents
ORDER BY n_chars DESC, doc_id ASC
LIMIT 20
"""


def parts_by_brand(sf_dir: str):
    """Filter + grouped aggregate over part (row filter pushed to the
    batch, money in cents)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["p_size"], 10), pc.less_equal(t["p_size"], 30)
        )
        t = t.filter(mask)
        return pa.table(
            {"p_brand": t["p_brand"], "retail_cents": _to_cents(t["p_retailprice"])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"), Sum("retail_cents", alias_name="sum_retail_cents"))
        .sort("p_brand")
    )


PARTS_BY_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts,
       CAST(sum(CAST(round(p_retailprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_retail_cents
FROM part
WHERE p_size BETWEEN 10 AND 30
GROUP BY p_brand
ORDER BY p_brand
"""


def supplier_balance_topk(sf_dir: str, k: int = 15):
    """Top-k suppliers by account balance with the nation dim broadcast."""
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal", "s_nationkey"])
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ref = state.broadcast(nation)

    def prep(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "s_nationkey", state.cached_get(ref), "n_nationkey",
            ["n_name"], fill="",
        )
        return pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "acctbal_cents": _to_cents(t["s_acctbal"]),
                "n_name": t["n_name"],
            }
        )

    return (
        sup.map_batches(prep, batch_format="pyarrow")
        .sort(["acctbal_cents", "s_suppkey"], descending=[True, False])
        .limit(k)
    )


SUPPLIER_BALANCE_SQL = """
SELECT s.s_suppkey,
       CAST(round(s.s_acctbal * 100.0) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY acctbal_cents DESC, s_suppkey ASC
LIMIT 15
"""


def customers_without_orders(sf_dir: str):
    """Anti join via broadcast key set (the semi/anti-join pattern:
    broadcast the filtered order-customer key set once, filter inside
    map_batches — no shuffle; at larger-than-broadcast scale the same
    filter runs per hash-partition with a partitioned key set).
    Customers with no URGENT-priority order (the unfiltered anti join
    is empty on the test data)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    # Distributed distinct: per-batch unique first (slims the shuffle
    # to unique keys per block), then a grouped count whose OUTPUT is
    # the distinct key set — the driver receives only distinct keys,
    # never iterates order batches.
    def urgent_keys(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        return pa.table({"o_custkey": pc.unique(f["o_custkey"])})

    from document_extractor_ray.functions.bucketing import bucketed_agg

    distinct = bucketed_agg(
        orders.map_batches(urgent_keys, batch_format="pyarrow"),
        ["o_custkey"],
        [(None, "count", "_n")],
    )
    key_arr = pa.array(distinct.to_pandas()["o_custkey"].to_numpy(), pa.int64())
    ref = ray.put(key_arr)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        have = ray.get(ref)
        mask = pc.invert(pc.is_in(t["c_custkey"], value_set=have))
        return t.filter(mask)

    return cust.map_batches(anti, batch_format="pyarrow").sort("c_custkey")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def order_revenue_by_nation(sf_dir: str):
    """Revenue per nation: a TRUE partitioned hash join (Dataset.join)
    of two fact-sized sides — orders ⋈ customer on custkey — then a
    grouped sum.  The broadcast-lookup queries above cover the
    small-dim case; this one proves the shuffle-join path the engine
    needs when neither side fits a broadcast (both sides hash-shuffle
    once on the join key; the nation dim is then a broadcast attach).
    Money in integer cents for exactness."""
    from document_extractor_ray import state

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "cents": _to_cents(t["o_totalprice"])}
        )

    n_parts = _join_partitions(
        f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet"
    )
    joined = orders.map_batches(to_cents, batch_format="pyarrow").join(
        cust,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    per_nation = (
        joined.groupby("c_nationkey")
        .aggregate(
            Sum("cents", alias_name="revenue_cents"), Count(alias_name="n_orders")
        )
    )

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ref = state.broadcast(nation)

    def attach(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "c_nationkey", state.cached_get(ref), "n_nationkey",
            ["n_name"], fill="",
        )
        return t.select(["n_name", "revenue_cents", "n_orders"])

    return per_nation.map_batches(attach, batch_format="pyarrow").sort("n_name")


ORDER_REVENUE_BY_NATION_SQL = """
SELECT n.n_name,
       CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


def doc_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    return (
        ds.groupby(["lang", "source"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .sort(["lang", "source"])
    )


DOC_STATS_SQL = """
SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def doc_stats_rollup(sf_dir: str):
    """ROLLUP(lang, source): per-(lang, source), per-lang and grand
    totals in ONE shuffle.  Each batch pre-aggregates its own counts
    at the finest level and replicates those partial rows to the
    coarser levels with an 'ALL' sentinel (3x a tiny combiner output,
    not 3x the data), so one grouped Sum produces every level — the
    standard multi-level-aggregate shape at scale vs running three
    separate jobs over the corpus."""
    ds = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["lang", "source"]).aggregate(
            [([], "count_all"), ("n_chars", "sum")]
        )
        fine = pa.table(
            {
                "lang": g["lang"],
                "source": g["source"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "chars": pc.cast(g["n_chars_sum"], pa.int64()),
            }
        )
        n_rows = fine.num_rows
        per_lang = fine.set_column(
            1, "source", pa.array(["ALL"] * n_rows, pa.string())
        )
        grand = per_lang.set_column(0, "lang", pa.array(["ALL"] * n_rows, pa.string()))
        return pa.concat_tables([fine, per_lang, grand])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("n", alias_name="n_docs"), Sum("chars", alias_name="sum_chars"))
        .sort(["lang", "source"])
    )


# NOT "GROUP BY ROLLUP + coalesce": the engine merges a GENUINE
# lang/source value 'ALL' into the sentinel rollup groups (one groupby
# over sentinel-replicated partials), so the oracle must too — the
# outer re-aggregation over the three explicit levels reproduces that
# merge exactly, where ROLLUP would keep the genuine fine-level 'ALL'
# group as its own row and silently diverge.
DOC_STATS_ROLLUP_SQL = """
SELECT lang, source,
       CAST(sum(n) AS BIGINT) AS n_docs, CAST(sum(ch) AS BIGINT) AS sum_chars
FROM (
  SELECT lang, source, count(*) AS n, sum(n_chars) AS ch
  FROM documents GROUP BY 1, 2
  UNION ALL
  SELECT lang, 'ALL', count(*), sum(n_chars) FROM documents GROUP BY 1
  UNION ALL
  SELECT 'ALL', 'ALL', count(*), sum(n_chars) FROM documents
)
GROUP BY 1, 2
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# As-of join (per-key temporal "latest row at or before t")
# ---------------------------------------------------------------------------

def events_asof_orders(sf_dir: str):
    """As-of join: for every event, the latest order of the same
    customer placed at or before the event time (ties on o_orderdate
    break to the highest o_orderkey).  Events whose user placed no
    order by then are dropped (inner as-of).

    Ray Data has no inequality join, so this is the distributed as-of
    shape: both sides slimmed to join columns, tagged, unioned, and
    shuffled ONCE on a hash bucket of the key (the sessionize
    pattern — map_groups pays one Python call per balanced partition,
    not per user); inside a partition one pandas merge_asof
    (vectorized C backward search) joins every user at once.  At
    10^12 rows the same plan holds: the bucket count scales with the
    cluster and no side is ever collected."""
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    n_parts = _n_blocks()

    def _bucket(key_col):
        def add(t: pa.Table) -> pa.Table:
            h = pc.bit_wise_and(
                pc.multiply(
                    pc.cast(t[key_col], pa.int64()), pa.scalar(2654435761, pa.int64())
                ),
                pa.scalar(0x7FFFFFFF, pa.int64()),
            )
            return t.append_column(
                "part",
                pc.cast(pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()),
            )
        return add

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": t["part"],
                "kind": pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8()),
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "t": t["ts"],
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "total_cents": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": t["part"],
                "kind": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
                "user_id": pc.cast(t["o_custkey"], pa.int64()),
                "t": t["o_orderdate"],
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "total_cents": _to_cents(t["o_totalprice"]),
            }
        )

    tagged = events.map_batches(_bucket("user_id"), batch_format="pyarrow").map_batches(
        tag_events, batch_format="pyarrow"
    ).union(
        orders.map_batches(_bucket("o_custkey"), batch_format="pyarrow").map_batches(
            tag_orders, batch_format="pyarrow"
        )
    )

    def asof_partition(g: pd.DataFrame) -> pd.DataFrame:
        right = g[g["kind"] == 0].sort_values(["t", "o_orderkey"], kind="mergesort")
        left = g[g["kind"] == 1].sort_values("t", kind="mergesort")
        if not len(left):
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                    "total_cents": pd.Series([], dtype="int64"),
                }
            )
        right = right.assign(o_orderdate=right["t"])
        m = pd.merge_asof(
            left[["t", "user_id", "event_id"]],
            right[["t", "user_id", "o_orderkey", "o_orderdate", "total_cents"]],
            on="t",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "ts": m["t"],
                "o_orderkey": m["o_orderkey"].astype("int64"),
                "o_orderdate": m["o_orderdate"],
                "total_cents": m["total_cents"].astype("int64"),
            }
        )

    return (
        tagged.groupby("part")
        .map_groups(asof_partition, batch_format="pandas")
        .sort("event_id")
        .map_batches(_ts_us("ts"), batch_format="pyarrow")
        .map_batches(_ts_us("o_orderdate"), batch_format="pyarrow")
    )


EVENTS_ASOF_ORDERS_SQL = """
WITH j AS (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts, o_orderkey, o_orderdate, total_cents
FROM j WHERE rn = 1
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Range (interval) self-join: same-user events in the preceding hour
# ---------------------------------------------------------------------------

PRIOR_WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def events_prior_hour(sf_dir: str):
    """Range join: for every event, how many events of the SAME user
    fall in the preceding hour [ts-1h, ts) — the burst-detection /
    rate-limit window.

    Ray Data has no inequality join; this is the distributed range-
    join shape: shuffle ONCE on a hash bucket of user_id (the
    sessionize plan — a user's events co-locate, partitions stay
    balanced), then the whole partition's window counts come from two
    vectorized np.searchsorted calls over a composite (user, ts) key
    — no per-user Python, no self-join blowup.  The composite key
    encodes user as a segment offset, so one sorted array answers
    every user's range queries at once."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uidx = pd.factorize(g["user_id"], sort=False)[0].astype(np.int64)
        lo = ts_us.min() if len(ts_us) else 0
        span = (ts_us.max() - lo if len(ts_us) else 0) + 2 * PRIOR_WINDOW_US
        key = uidx * span + (ts_us - lo)
        # window [ts-1h, ts): both bounds stay inside the user's
        # segment because span > ts-range + 1h.
        hi_rank = np.searchsorted(key, key, side="left")
        lo_rank = np.searchsorted(key, key - PRIOR_WINDOW_US, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype("int64"),
                "n_prior_1h": (hi_rank - lo_rank).astype("int64"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("event_id")
    )


EVENTS_PRIOR_HOUR_SQL = """
SELECT e.event_id, CAST(count(e2.event_id) AS BIGINT) AS n_prior_1h
FROM events e
LEFT JOIN events e2 ON e2.user_id = e.user_id
 AND e2.ts >= e.ts - INTERVAL 1 HOUR AND e2.ts < e.ts
GROUP BY e.event_id
ORDER BY e.event_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping-priority pipeline (semi-join + hash join + top-k)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOP_K = 10


def q3_shipping(sf_dir: str, k: int = Q3_TOP_K):
    """Shipping-priority top-k (TPC-H Q3 shape): unshipped revenue per
    order for one market segment.

    Scale plan, in join-size order:
    - customer is filtered to one segment and reduced to its KEY SET,
      broadcast once (ray.put) — a broadcast semi-join via pc.is_in,
      never a shuffle of the customer table;
    - orders and lineitem are filtered and column-slimmed inside
      map_batches BEFORE the one partitioned hash join (both sides
      shuffle only join key + payload ints);
    - revenue aggregates AFTER the join (groupby on the join output),
      because Ray 2.49's hash-aggregate output feeding a join trips
      the empty-schema-block bug (see dedup._propagate_labels) — and
      grouping by (orderkey, orderdate, priority) is equivalent since
      the extra keys are functionally dependent on the orderkey.
    """
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], Q3_SEGMENT))[
        "c_custkey"
    ].combine_chunks()
    kref = state.broadcast(keys)
    cutoff = pa.scalar(pd.Timestamp(Q3_CUTOFF), type=pa.timestamp("us"))

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    def filt_orders(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.less(t["o_orderdate"], cutoff),
            pc.is_in(t["o_custkey"], value_set=state.cached_get(kref)),
        )
        return t.filter(m).select(["o_orderkey", "o_orderdate", "o_orderpriority"])

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def filt_li(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "disc_cents": _to_cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                ),
            }
        )

    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = li.map_batches(filt_li, batch_format="pyarrow").join(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    return (
        bucketed_agg(
            joined,
            ["l_orderkey", "o_orderdate", "o_orderpriority"],
            [("disc_cents", "sum", "revenue_cents")],
        )
        .sort(["revenue_cents", "l_orderkey"], descending=[True, False])
        .limit(k)
        .map_batches(_ts_us("o_orderdate"), batch_format="pyarrow")
    )


Q3_SHIPPING_SQL = f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
       o.o_orderdate, o.o_orderpriority
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT {Q3_TOP_K}
"""


# ---------------------------------------------------------------------------
# Per-key ordered first/last (argmin/argmax) aggregation
# ---------------------------------------------------------------------------

def user_first_last(sf_dir: str):
    """First and last event per user (ordered by ts, event_id) plus
    the event count — the per-key argmin/argmax pattern.

    One shuffle on a hash BUCKET of user_id (the sessionize shape:
    map_groups pays one Python call per balanced partition, not per
    user), then one vectorized pandas pass picks each user's boundary
    rows.  The per-batch combiner ships only each batch's per-user
    boundary candidates + count partials, so the shuffle carries at
    most 2 rows per (user, batch) — never the event stream."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        head = df.groupby("user_id", sort=False).head(1)
        tail = df.groupby("user_id", sort=False).tail(1)
        cnt = df.groupby("user_id", sort=False).size().rename("n_part").reset_index()
        out = pd.concat([head, tail]).drop_duplicates(subset=["event_id"])
        out = out.merge(cnt, on="user_id")
        # count only on the head row so partial sums stay exact
        is_head = out["event_id"].isin(head["event_id"])
        out["n_part"] = np.where(is_head, out["n_part"], 0)
        h = (out["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) & np.uint64(
            0x7FFFFFFF
        )
        out["part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = g.groupby("user_id", sort=True).head(1).set_index("user_id")
        last = g.groupby("user_id", sort=True).tail(1).set_index("user_id")
        n = g.groupby("user_id", sort=True)["n_part"].sum()
        return pd.DataFrame(
            {
                "user_id": n.index.to_numpy(),
                "first_ts": first["ts"].to_numpy(),
                "first_type": first["event_type"].to_numpy(),
                "last_ts": last["ts"].to_numpy(),
                "last_type": last["event_type"].to_numpy(),
                "n_events": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("user_id")
        .map_batches(_ts_us("first_ts"), batch_format="pyarrow")
        .map_batches(_ts_us("last_ts"), batch_format="pyarrow")
    )


USER_FIRST_LAST_SQL = """
WITH o AS (
  SELECT user_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
SELECT f.user_id,
       f.ts AS first_ts, f.event_type AS first_type,
       l.ts AS last_ts, l.event_type AS last_type,
       CAST(f.n_events AS BIGINT) AS n_events
FROM (SELECT * FROM o WHERE rn_a = 1) f
JOIN (SELECT * FROM o WHERE rn_d = 1) l USING (user_id)
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Ordered string aggregation (funnel paths)
# ---------------------------------------------------------------------------

PATH_MAX_STEPS = 8


def user_event_paths(sf_dir: str, max_steps: int = PATH_MAX_STEPS):
    """Each user's chronological event-type path (first ``max_steps``
    events, '>'-joined) — the ordered string_agg / funnel-mining
    primitive.  One hash-bucket shuffle co-locates a user's events
    (the sessionize plan); inside the partition the per-user head and
    join are one sorted pandas pass.  The per-batch combiner ships
    only each batch's first ``max_steps`` events per user, so the
    shuffle is bounded by users x max_steps, not the event stream."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df = df.groupby("user_id", sort=False).head(max_steps)
        h = (df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) & np.uint64(
            0x7FFFFFFF
        )
        df["part"] = (h % np.uint64(n_parts)).astype(np.int32)
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata(None)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = g.groupby("user_id", sort=True).head(max_steps)
        path = g.groupby("user_id", sort=True)["event_type"].agg(">".join)
        n = g.groupby("user_id", sort=True).size()
        return pd.DataFrame(
            {
                "user_id": path.index.to_numpy(),
                "path": path.to_numpy(),
                "n_steps": n.to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("user_id")
    )


USER_EVENT_PATHS_SQL = f"""
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rn) AS path,
       count(*) AS n_steps
FROM o WHERE rn <= {PATH_MAX_STEPS}
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Running cumulative window (SUM OVER ... ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------

def user_cumulative_value(sf_dir: str):
    """Per-event running totals per user — the cumulative
    SUM/COUNT window (``ROWS UNBOUNDED PRECEDING``).  One hash-bucket
    shuffle co-locates each user's events (the sessionize plan: the
    per-key ordered scan is the irreducible shuffle); inside a
    partition the whole bucket is ONE sorted pandas pass — grouped
    cumsum/cumcount are segment kernels, never per-user Python.
    Money cumulates in cents (int64) so the running sum is
    association-order-exact against the SQL window."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": _to_cents(t["value"]),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        by = g.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "cum_n": (by.cumcount() + 1).to_numpy().astype(np.int64),
                "cum_value_cents": by["cents"].cumsum().to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("event_id")
    )


USER_CUMULATIVE_VALUE_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS cum_n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cum_value_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Snapshot delta (CDC): full-outer compare of two corpus snapshots
# ---------------------------------------------------------------------------

def user_day_delta(sf_dir: str):
    """Change-data-capture between two snapshots of the event stream
    (old = event_id <= max/2, new = the rest), keyed on (user, day):
    per key the old/new counts plus an added/removed/changed/same
    classification — the FULL OUTER JOIN snapshot-compare, expressed
    as union+pivot so it costs ONE grouped aggregate instead of two
    aggregates plus an outer shuffle join.  Per-batch Arrow group_by
    pre-combines the indicator sums, so only (key, 2 ints) partials
    cross the wire; at 10^12 events the shuffle is bounded by key
    cardinality.  The id cutoff is a single column-pruned min/max
    pass (metadata-cheap)."""
    cutoff = int(
        _read(sf_dir, "events", columns=["event_id"]).max("event_id") // 2
    )
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def combine(t: pa.Table) -> pa.Table:
        old = pc.cast(pc.less_equal(t["event_id"], cutoff), pa.int64())
        keyed = pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "o": old,
                "n": pc.subtract(1, old),
            }
        )
        return keyed.group_by(["user_id", "day"]).aggregate([("o", "sum"), ("n", "sum")])

    def classify(t: pa.Table) -> pa.Table:
        n_old = t["o_sum"].to_numpy(zero_copy_only=False)
        n_new = t["n_sum"].to_numpy(zero_copy_only=False)
        change = np.where(
            n_old == 0,
            "added",
            np.where(n_new == 0, "removed", np.where(n_old != n_new, "changed", "same")),
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": t["day"],
                "n_old": pa.array(n_old, pa.int64()),
                "n_new": pa.array(n_new, pa.int64()),
                "change": pa.array(change.astype(object), pa.string()),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    return (
        bucketed_agg(
            ds.map_batches(combine, batch_format="pyarrow"),
            ["user_id", "day"],
            [("o_sum", "sum", "o_sum"), ("n_sum", "sum", "n_sum")],
        )
        .map_batches(classify, batch_format="pyarrow")
        .sort(["user_id", "day"])
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )


USER_DAY_DELTA_SQL = """
WITH cut AS (SELECT max(event_id) // 2 AS c FROM events),
h AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         sum(CASE WHEN event_id <= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_old,
         sum(CASE WHEN event_id >  (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_new
  FROM events GROUP BY 1, 2
)
SELECT user_id, day,
       CAST(n_old AS BIGINT) AS n_old,
       CAST(n_new AS BIGINT) AS n_new,
       CASE WHEN n_old = 0 THEN 'added'
            WHEN n_new = 0 THEN 'removed'
            WHEN n_old <> n_new THEN 'changed'
            ELSE 'same' END AS change
FROM h
ORDER BY user_id, day
"""


# ---------------------------------------------------------------------------
# Distributed distinct-count aggregate
# ---------------------------------------------------------------------------

def distinct_users_per_type(sf_dir: str):
    """count(DISTINCT user_id) per event type — the distributed
    distinct aggregate.  Each batch first dedups its own (type, user)
    pairs with one Arrow group-by (combiner: a user active in many
    events per block shuffles once, not per event), the grouped Count
    across blocks establishes global distinctness, and per-batch
    partials + a tiny second groupby produce the final counts.  The
    wide shuffle carries distinct pairs — bounded by |users| x
    |types|, never the event count."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "user_id": g["user_id"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    pairs = bucketed_agg(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["event_type", "user_id"],
        [("n", "sum", "n_events_pair")],
    )

    def type_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["event_type"]).aggregate(
            [([], "count_all"), ("n_events_pair", "sum")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "u": pc.cast(g["count_all"], pa.int64()),
                "e": pc.cast(g["n_events_pair_sum"], pa.int64()),
            }
        )

    return (
        pairs.map_batches(type_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("u", alias_name="n_users"), Sum("e", alias_name="n_events"))
        .sort("event_type")
    )


DISTINCT_USERS_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# HyperLogLog register table (mergeable distinct-count sketch)
# ---------------------------------------------------------------------------

HLL_P = 8                       # 2^8 = 256 registers, ~6.5% std error
HLL_M = 1 << HLL_P
# murmur3 64-bit finalizer: HLL needs an AVALANCHING hash — a bare
# multiply-shift maps sequential ids to a Weyl (low-discrepancy)
# register sequence whose too-even spread breaks the sketch's
# collision statistics (measured: 149/256 registers hit by 150
# sequential ids vs ~114 expected; linear counting then estimated 223).
HLL_SEED = 0x165667B19E3779F9
HLL_C1 = 0xFF51AFD7ED558CCD
HLL_C2 = 0xC4CEB9FE1A85EC53
_HLL_LOW_BITS = 64 - HLL_P
_HLL_POWERS = np.left_shift(
    np.uint64(1), np.arange(_HLL_LOW_BITS + 1, dtype=np.uint64)
)


def _hll_hash(u: np.ndarray) -> np.ndarray:
    """fmix64(u + seed) — all uint64 wraparound, mirrored bit-for-bit
    by the SQL oracle's HUGEINT CTE chain."""
    with np.errstate(over="ignore"):
        h = u + np.uint64(HLL_SEED)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(HLL_C1)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(HLL_C2)
        h = h ^ (h >> np.uint64(33))
    return h


def hll_user_registers(sf_dir: str):
    """HyperLogLog register table over events.user_id — the mergeable
    distinct-count sketch (Flajolet et al. 2007).  The reference has
    no sketches; at 10^12 rows this replaces the exact
    distinct-pair shuffle of distinct_users_per_type with O(256)
    state per stream.

    The query emits the REGISTER TABLE (register, max_rho), not the
    float estimate: registers are integer-exact and SQL-replicable
    (the same multiply-shift hash in HUGEINT arithmetic, exact bit
    length via length(ltrim(bin(x),'0'))), so the driver's hash gate
    verifies the distributed sketch state bit-for-bit;
    ``hll_estimate`` turns it into the cardinality estimate on the
    driver.  Scale shape: each batch folds to <= 256 partial-max
    rows (np.maximum.at), one grouped Max merges them — registers
    are a commutative monoid, so shards/streams merge freely."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _hll_hash(u)
        reg = (h >> np.uint64(_HLL_LOW_BITS)).astype(np.int64)
        low = h & np.uint64((1 << _HLL_LOW_BITS) - 1)
        # exact bit length: #powers-of-two <= low (no float log2)
        bl = np.searchsorted(_HLL_POWERS, low, side="right")
        rho = (_HLL_LOW_BITS - bl + 1).astype(np.int64)
        maxes = np.zeros(HLL_M, dtype=np.int64)
        np.maximum.at(maxes, reg, rho)
        hit = np.nonzero(maxes)[0]
        return pa.table(
            {
                "register": pa.array(hit.astype(np.int64), pa.int64()),
                "max_rho": pa.array(maxes[hit], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("register")
        .aggregate(Max("max_rho", alias_name="max_rho"))
        .sort("register")
    )


def hll_estimate(registers, m: int = HLL_M) -> float:
    """Standard HLL estimate (with small-range correction) from a
    (register, max_rho) table — rows for unhit registers may be
    absent (rho 0)."""
    rho = np.zeros(m, dtype=np.int64)
    if hasattr(registers, "to_pydict"):
        d = registers.to_pydict()
        rho[np.asarray(d["register"], dtype=np.int64)] = d["max_rho"]
    else:  # Dataset
        for r in registers.take_all():
            rho[r["register"]] = r["max_rho"]
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -rho))
    zeros = int(np.count_nonzero(rho == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)


def _fmix64_sql(expr: str, group_expr: str = "", group_col: str = "") -> str:
    """CTE chain computing fmix64(expr + seed) as column ``h`` over
    events, optionally carrying ``group_expr AS group_col`` from the
    source through every stage (later stages reference the column by
    name).  h ^ (h >> 33) in HUGEINT: the shifted value is < 2^31, so
    the xor only touches the low 32-bit half -> split, BIGINT xor,
    glue."""
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    c0 = f"{group_expr} AS {group_col}, " if group_col else ""
    c = f"{group_col}, " if group_col else ""
    return f"""h0 AS (
  SELECT {c0}({expr}::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM events
),
h1 AS (SELECT {c}{xs33('h')} AS h FROM h0),
h2 AS (SELECT {c}{_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT {c}{xs33('h')} AS h FROM h2),
h4 AS (SELECT {c}{_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT {c}{xs33('h')} AS h FROM h4)"""


def _hll_sql(group_expr: str = "", group_col: str = "") -> str:
    two56 = 1 << _HLL_LOW_BITS
    carry_sel = f"{group_col}, " if group_col else ""
    group_by = f"GROUP BY {group_col}, register" if group_col else "GROUP BY register"
    order_by = f"ORDER BY {group_col}, register" if group_col else "ORDER BY register"
    return f"""
WITH {_fmix64_sql("user_id", group_expr, group_col)},
r AS (
  SELECT {carry_sel}CAST(h // {two56} AS BIGINT) AS register,
         CAST(h % {two56} AS BIGINT) AS low
  FROM h5
)
SELECT {carry_sel}register,
       CAST(max({_HLL_LOW_BITS} - length(ltrim(bin(low), '0')) + 1) AS BIGINT) AS max_rho
FROM r
{group_by}
{order_by}
"""


HLL_USER_REGISTERS_SQL = _hll_sql()


def hll_daily_registers(sf_dir: str):
    """Per-DAY HyperLogLog register tables over events.user_id — the
    grouped-sketch shape (distinct users per day without a distinct
    shuffle).  Each batch folds to at most |days-in-batch| x 256
    partial-max cells via one flattened np.maximum.at; a grouped Max
    merges across batches.  Because max is associative over any row
    partition, merging the daily tables by register reproduces the
    GLOBAL sketch exactly (pytest-asserted) — the property that lets
    per-shard / per-day sketches roll up to any coarser window for
    free at 100 TB."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _hll_hash(u)
        reg = (h >> np.uint64(_HLL_LOW_BITS)).astype(np.int64)
        low = h & np.uint64((1 << _HLL_LOW_BITS) - 1)
        bl = np.searchsorted(_HLL_POWERS, low, side="right")
        rho = (_HLL_LOW_BITS - bl + 1).astype(np.int64)
        day = pc.floor_temporal(t["ts"], unit="day")
        day_us = pc.cast(day, pa.int64()).to_numpy(zero_copy_only=False)
        uniq_days, inv = np.unique(day_us, return_inverse=True)
        maxes = np.zeros(len(uniq_days) * HLL_M, dtype=np.int64)
        np.maximum.at(maxes, inv * HLL_M + reg, rho)
        nz = np.nonzero(maxes)[0]
        return pa.table(
            {
                "day": pa.array(uniq_days[nz // HLL_M], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "register": pa.array(nz % HLL_M, pa.int64()),
                "max_rho": pa.array(maxes[nz], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "register"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
        .sort(["day", "register"])
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )


HLL_DAILY_REGISTERS_SQL = _hll_sql("date_trunc('day', ts)", "day")


# ---------------------------------------------------------------------------
# Deterministic hash-based sampling
# ---------------------------------------------------------------------------

HASH_SAMPLE_PCT = 10


def hash_sample_docs(sf_dir: str, pct: int = HASH_SAMPLE_PCT):
    """Deterministic ``pct``% document sample: keep doc_id iff
    fmix64(doc_id) % 100 < pct.  Unlike modulo-on-the-raw-id
    (stratified_sample's systematic variant), the avalanche hash is
    unbiased under ANY id assignment pattern (sequential, sharded,
    gapped), reproducible across runs/engines, and consistent — the
    same doc is in or out of every downstream sample.  Embarrassingly
    parallel: one vectorized filter per batch, no shuffle, no state."""
    from document_extractor_ray.functions.textstats import _read_docs

    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = (_hll_hash(u) % np.uint64(100)) < np.uint64(pct)
        return t.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def _hash_sample_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    return f"""
WITH h0 AS (
  SELECT doc_id, lang,
         (doc_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM documents
),
h1 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h0),
h2 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h2),
h4 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h4)
SELECT doc_id, lang FROM h5
WHERE h % 100 < {HASH_SAMPLE_PCT}
ORDER BY doc_id
"""


HASH_SAMPLE_SQL = _hash_sample_sql()


# ---------------------------------------------------------------------------
# Weighted mixture sampling (training-data source mixing)
# ---------------------------------------------------------------------------

# per-mille keep rates per source — the "data mixture" a training run
# specifies (e.g. upsample curated sources, downsample crawl).  The
# synthetic corpus has sources src0..src19; a deterministic spread of
# rates exercises every branch of the mixture.
MIXTURE_PERMILLE = {f"src{i}": (i * 97) % 900 + 50 for i in range(20)}


def mixture_sample(sf_dir: str, rates: dict = None):
    """Deterministic weighted source mixing: keep a document iff
    fmix64(doc_id) % 1000 < rate[source] — the mixture-sampling step
    of training-data assembly, with per-source rates instead of
    hash_sample's single global rate.  Same avalanche hash, same
    engine-vs-SQL bit equality; sources absent from the rate map drop
    to 0.  Embarrassingly parallel, no shuffle."""
    from document_extractor_ray.functions.textstats import _read_docs

    rates = MIXTURE_PERMILLE if rates is None else rates
    ds = _read_docs(sf_dir, ["doc_id", "source", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (_hll_hash(u) % np.uint64(1000)).astype(np.int64)
        src = t["source"].to_pylist()
        thresh = np.fromiter(
            (rates.get(s, 0) for s in src), dtype=np.int64, count=len(src)
        )
        return t.filter(pa.array(bucket < thresh))

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def _mixture_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in MIXTURE_PERMILLE.items()
    )
    return f"""
WITH h0 AS (
  SELECT doc_id, source, lang,
         (doc_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM documents
),
h1 AS (SELECT doc_id, source, lang, {xs33('h')} AS h FROM h0),
h2 AS (SELECT doc_id, source, lang, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT doc_id, source, lang, {xs33('h')} AS h FROM h2),
h4 AS (SELECT doc_id, source, lang, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT doc_id, source, lang, {xs33('h')} AS h FROM h4)
SELECT doc_id, source, lang FROM h5
WHERE h % 1000 < (CASE {cases} ELSE 0 END)
ORDER BY doc_id
"""


MIXTURE_SAMPLE_SQL = _mixture_sql()


# ---------------------------------------------------------------------------
# Exact global percentile rank without a global sort
# ---------------------------------------------------------------------------

def doc_length_percentiles(sf_dir: str):
    """Every document's exact global length-rank in permille:
    rank_permille = (#docs with n_chars < mine) * 1000 // N — the
    window-function PERCENT_RANK analogue, computed WITHOUT a global
    sort: the bounded-domain count table (the token_quantiles plan)
    collects once, its cumulative map broadcasts, and each batch
    looks its ranks up vectorized.  At 10^12 docs the count table is
    |distinct lengths| rows; no shuffle ever carries the corpus."""
    from ray.data.aggregate import Sum

    from document_extractor_ray import state

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def count_partial(t: pa.Table) -> pa.Table:
        v, n = np.unique(t["n_chars"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"v": pa.array(v, pa.int64()), "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .sort("v")
        .take_all()
    )
    vs = np.array([r["v"] for r in counts], dtype=np.int64)
    ns = np.array([r["n"] for r in counts], dtype=np.int64)
    below = np.concatenate([[0], np.cumsum(ns)[:-1]]).astype(np.int64)
    total = int(ns.sum())
    ref = state.broadcast((vs, below, total))

    def rank(t: pa.Table) -> pa.Table:
        vs_b, below_b, total_b = state.cached_get(ref)
        x = t["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vs_b, x)
        pm = below_b[idx] * 1000 // max(total_b, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "rank_permille": pa.array(pm.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(rank, batch_format="pyarrow").sort("doc_id")


# rank() - 1 == count of rows strictly below (ties share min rank)
DOC_LENGTH_PERCENTILES_SQL = """
SELECT doc_id, n_chars,
       CAST((rank() OVER (ORDER BY n_chars) - 1) * 1000
            // greatest(count(*) OVER (), 1) AS BIGINT) AS rank_permille
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# LAG window: day-over-day delta of daily event counts
# ---------------------------------------------------------------------------

def events_daily_delta(sf_dir: str):
    """Day-over-day change in daily event counts per type — the LAG
    window-function analogue.  The raw stream first collapses to
    per-(type, day) counts (partial-combine groupby, the events_daily
    plan), and only the tiny daily table pays the per-key ordered
    window: one map_groups per event_type computes the whole series'
    lagged diff vectorized.  At 10^12 events the daily table is still
    ~types x days rows — windowing after pre-aggregation is the scale
    shape.  Each type's FIRST day is dropped (LAG has no previous row
    there): keeping delta_n int64-exact beats a nullable column the
    cross-engine compare can only see as float."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
            }
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
    )

    def lag_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day", kind="mergesort")
        delta = g["n"].diff().iloc[1:]
        g = g.iloc[1:]
        return pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "day": g["day"].to_numpy(),
                "n": g["n"].to_numpy(),
                "delta_n": delta.to_numpy(dtype="int64")
                if len(g)
                else np.array([], dtype="int64"),
            }
        )

    return (
        daily.groupby("event_type")
        .map_groups(lag_group, batch_format="pandas")
        .sort(["event_type", "day"])
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )


EVENTS_DAILY_DELTA_SQL = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, n,
         n - lag(n) OVER (PARTITION BY event_type ORDER BY day) AS delta_n
  FROM d
)
SELECT event_type, day, n, CAST(delta_n AS BIGINT) AS delta_n
FROM w WHERE delta_n IS NOT NULL
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Pivot / wide aggregation (one column per category value)
# ---------------------------------------------------------------------------

# The pivot's column set must be KNOWN up front (a pivot with unknown
# categories is two passes: distinct + pivot); these are the event
# taxonomy, alphabetical.
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(sf_dir: str):
    """Pivot the event stream wide: one row per user, one count column
    per event type (the feature-matrix shape every behavioural model
    consumes).  Each batch turns the category into integer indicator
    columns and pre-combines them with Arrow ``group_by`` — so the
    shuffle carries one (user, 5 ints) partial per user per block, and
    the global groupby is a pure Sum merge.  At 10^12 events the wire
    cost is bounded by user cardinality x block count, never by event
    count; adding a category adds a column, not a pass."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in PIVOT_TYPES:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        keyed = pa.table(cols)
        return keyed.group_by("user_id").aggregate(
            [(f"n_{ty}", "sum") for ty in PIVOT_TYPES]
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    out = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        [(f"n_{ty}_sum", "sum", f"n_{ty}") for ty in PIVOT_TYPES],
    ).sort("user_id")
    return out


EVENT_TYPE_PIVOT_SQL = """
SELECT user_id,
       {cols}
FROM events
GROUP BY user_id
ORDER BY user_id
""".format(
    cols=",\n       ".join(
        "CAST(sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_{ty}".format(ty=ty)
        for ty in PIVOT_TYPES
    )
)


# ---------------------------------------------------------------------------
# LAG window over the base table (per-key previous-row delta)
# ---------------------------------------------------------------------------

def user_lag_gaps(sf_dir: str):
    """Per-event gap to the SAME user's previous event in microseconds
    (-1 for a user's first event) — the LAG(ts) OVER (PARTITION BY
    user ORDER BY ts) window on the raw stream, the building block of
    bot/burst features.  Same irreducible plan as the other per-key
    ordered windows (user_cumulative_value): ONE hash-bucket shuffle
    co-locates a user's events, then the whole partition is a single
    sorted numpy diff — the per-row lag is `ts[i] - ts[i-1]` masked by
    a same-user boundary vector, no per-user Python ever."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        gap[:1] = -1
        if len(g) > 1:
            same = uid[1:] == uid[:-1]
            gap[1:] = np.where(same, ts_us[1:] - ts_us[:-1], -1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype("int64"),
                "user_id": uid.astype("int64"),
                "gap_us": gap,
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("event_id")
    )


USER_LAG_GAPS_SQL = """
SELECT event_id, user_id,
       CAST(COALESCE(
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts),
         -1) AS BIGINT) AS gap_us
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Grouped correlation via sufficient statistics (exact integer partials)
# ---------------------------------------------------------------------------

def events_corr_stats(sf_dir: str):
    """Per-event-type sufficient statistics for the Pearson correlation
    between event value (cents) and hour-of-day: n, Σx, Σy, Σx², Σy²,
    Σxy — ALL int64, so the distributed sum is associative and exact
    (the float corr is one driver-side formula away, but floats never
    cross the wire).  This is the canonical 'moment sketch' pattern:
    any per-group variance/covariance/regression reduces to integer
    partials combined inside map_batches, one tiny groupby to merge.
    Per 10^12 rows the shuffle carries (5 types x blocks) rows."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        x = _to_cents(t["value"])
        y = pc.cast(pc.hour(t["ts"]), pa.int64())
        keyed = pa.table(
            {
                "event_type": t["event_type"],
                "n": pa.array(np.ones(len(t), dtype=np.int64)),
                "sum_x": x,
                "sum_y": y,
                "sum_xx": pc.multiply(x, x),
                "sum_yy": pc.multiply(y, y),
                "sum_xy": pc.multiply(x, y),
            }
        )
        return keyed.group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            *[
                Sum(f"{c}_sum", alias_name=c)
                for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")
            ]
        )
        .sort("event_type")
    )


EVENTS_CORR_STATS_SQL = """
WITH p AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         CAST(extract(hour FROM ts) AS BIGINT) AS y
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x,
       CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * x) AS BIGINT) AS sum_xx,
       CAST(sum(y * y) AS BIGINT) AS sum_yy,
       CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM p
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Bloom-filter semi-join (compact prefilter + exact partitioned verify)
# ---------------------------------------------------------------------------

BLOOM_PRIORITY = "1-URGENT"
BLOOM_M_WORDS = 1 << 14  # 2^20 bits = 128 KiB — sized for ~50k keys @ ~2% fp
BLOOM_K = 4


def _bloom_positions(keys: np.ndarray, m_words: int = BLOOM_M_WORDS) -> np.ndarray:
    """(k, n) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher); multiply-xorshift mixers, pure uint64 numpy."""
    x = keys.astype(np.uint64)
    h1 = x * np.uint64(0x9E3779B97F4A7C15)
    h1 ^= h1 >> np.uint64(29)
    h2 = (x + np.uint64(0x165667B19E3779F9)) * np.uint64(0xC2B2AE3D27D4EB4F)
    h2 ^= h2 >> np.uint64(31)
    m_bits = np.uint64(m_words * 64)
    return np.stack([(h1 + np.uint64(i) * h2) % m_bits for i in range(BLOOM_K)])


def lineitem_semi_bloom(
    sf_dir: str, priority: str = BLOOM_PRIORITY, m_words: int = BLOOM_M_WORDS
):
    """Semi-join lineitem against urgent orders with a Bloom-filter
    prefilter + exact verify — the large-x-large semi-join pattern for
    when the build-side KEY SET is too big to broadcast but a 128 KiB
    bitmap is not.

    Scale shape, in order:
    - build: each build-side block folds its keys into a partial
      bitmap (one 128 KiB binary row per block); the driver ORs those
      few rows — driver traffic is blocks x 128 KiB, independent of
      key count — and ``ray.put``s the merged filter ONCE.
    - probe: every lineitem batch tests k=4 bits vectorized in numpy;
      non-members (the vast majority in a selective semi-join) never
      leave the scan node.
    - verify: Bloom false positives are removed exactly — survivors
      and build keys hash-partition on the join key, and each
      partition answers membership with one sorted np.isin; only
      survivors (~sel + 2% fp) pay this shuffle.  The per-key
      aggregate (n_items, qty) folds into the same partition pass, so
      no further shuffle follows."""
    from document_extractor_ray import state

    n_parts = _n_blocks()

    keys_ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def build_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], priority))
        words = np.zeros(m_words, dtype=np.uint64)
        if len(t):
            k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = _bloom_positions(k, m_words).ravel()
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([words.tobytes()], pa.large_binary())})

    merged = np.zeros(m_words, dtype=np.uint64)
    for row in keys_ds.map_batches(build_partial, batch_format="pyarrow").take_all():
        merged |= np.frombuffer(row["bits"], dtype=np.uint64)
    bloom_ref = ray.put(merged)

    def probe(t: pa.Table) -> pa.Table:
        words = state.cached_get(bloom_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = _bloom_positions(k, m_words)
        hit = (words[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
        keep = hit.all(axis=0).astype(bool)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "key": t["l_orderkey"],
                "qty": pc.cast(
                    pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )

    def tag_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], priority))
        return pa.table(
            {
                "key": t["o_orderkey"],
                "qty": pa.array(np.zeros(len(t), dtype=np.int64)),
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def verify_agg(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.sort(g.loc[g["side"] == 0, "key"].to_numpy())
        items = g[g["side"] == 1]
        items = items[np.isin(items["key"].to_numpy(), keys)]
        if not len(items):
            return pd.DataFrame(
                {"o_orderkey": pd.Series(dtype="int64"),
                 "n_items": pd.Series(dtype="int64"),
                 "qty": pd.Series(dtype="int64")}
            )
        agg = items.groupby("key", sort=False).agg(
            n_items=("qty", "size"), qty=("qty", "sum")
        )
        return pd.DataFrame(
            {
                "o_orderkey": agg.index.to_numpy().astype("int64"),
                "n_items": agg["n_items"].to_numpy().astype("int64"),
                "qty": agg["qty"].to_numpy().astype("int64"),
            }
        )

    probed = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]
    ).map_batches(probe, batch_format="pyarrow")
    tagged_keys = keys_ds.map_batches(tag_keys, batch_format="pyarrow")

    return (
        probed.union(tagged_keys)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify_agg, batch_format="pandas")
        .sort("o_orderkey")
    )


LINEITEM_SEMI_BLOOM_SQL = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
FROM lineitem l
WHERE l.l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Exact global ranking without a total-order sort
# ---------------------------------------------------------------------------

def doc_global_rank(sf_dir: str):
    """Exact global row_number() for every document by
    (n_chars DESC, doc_id) — WITHOUT a total-order sort of the corpus.

    The trick is rank = base(key) + within-tie position:
    - pass 1 builds the exact key histogram (per-batch Arrow group_by
      partials, one tiny grouped Sum) and turns it into cumulative
      base offsets on the driver — the histogram is bounded by the
      KEY DOMAIN (distinct n_chars values), not row count, and is
      broadcast once via ray.put.  (For an unbounded key domain the
      same plan works on range-bucket boundaries instead of exact
      keys.)
    - pass 2 hash-shuffles rows on the key only (ties must co-locate;
      partitions stay balanced unless one key dominates), sorts each
      partition once, and adds the per-tie cumcount to the broadcast
      base — a whole-partition vectorized pass, no per-key Python.
    So the all-to-all moves each row once with NO merge step of a
    global sort, and the driver holds only the histogram."""
    from document_extractor_ray import state

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    n_parts = _n_blocks()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"k": t["n_chars"]}), ["k"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"k": g["k"], "n": pc.cast(g["count_all"], pa.int64())})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # keys ascending; base offset for key k = count of rows with key > k
    hist = hist.sort_values("k").reset_index(drop=True)
    keys = hist["k"].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    above = counts[::-1].cumsum()[::-1] - counts  # rows strictly greater
    base_ref = ray.put((keys, above))

    def add_part(t: pa.Table) -> pa.Table:
        k = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def rank_partition(g: pd.DataFrame) -> pd.DataFrame:
        keys_b, above_b = state.cached_get(base_ref)
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        k = g["n_chars"].to_numpy().astype(np.int64)
        tie_pos = np.arange(len(g)) - np.searchsorted(k, k, side="left")
        base = above_b[np.searchsorted(keys_b, k)]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype("int64"),
                "n_chars": k,
                "rnk": (base + tie_pos + 1).astype("int64"),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_partition, batch_format="pandas")
        .sort("doc_id")
    )


DOC_GLOBAL_RANK_SQL = """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Grouped mode (most frequent value per key, deterministic ties)
# ---------------------------------------------------------------------------

def user_modal_type(sf_dir: str):
    """Per-user modal event type (most frequent; ties break to the
    alphabetically first type) plus its count — the grouped-mode
    aggregate.  Two bounded steps: per-batch Arrow group_by counts
    (user, type) pairs — the shuffle carries at most
    users x |taxonomy| partial rows per block — then a hash aggregate
    merges pair counts and a second exchange groups the MERGED pair
    table (already tiny: one row per (user, type), never per event)
    for a whole-partition vectorized argmax — sort + drop_duplicates,
    no per-user Python."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]}),
            ["user_id", "event_type"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        # count desc, type asc: first row per user is the mode
        g = g.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True]
        )
        top = g.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": top["user_id"].to_numpy().astype("int64"),
                "modal_type": top["event_type"].to_numpy(),
                "n": top["n"].to_numpy().astype("int64"),
            }
        )

    return (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("user_id")
        .map_groups(argmax, batch_format="pandas")
        .sort("user_id")
    )


USER_MODAL_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS modal_type, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Global cumulative window (SUM OVER ORDER BY, no partition key)
# ---------------------------------------------------------------------------

def orders_cumulative_revenue(sf_dir: str):
    """Running revenue total over ALL orders ordered by
    (o_orderdate, o_orderkey) — the global cumulative window, which
    naively needs a total-order sort plus a sequential scan.  Same
    decomposition as doc_global_rank: cumulative = prefix(base day) +
    within-day running sum.  Pass 1 aggregates cents per DAY (partial
    per batch, tiny grouped Sum — bounded by the date domain) and the
    driver broadcasts the exclusive prefix sums; pass 2 hash-shuffles
    rows by day only, sorts each partition once, and a grouped numpy
    cumsum within each day adds to the broadcast base.  Money stays
    int64 cents end-to-end so the running total is association-exact."""
    from document_extractor_ray import state

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    n_parts = _n_blocks()

    def day_partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "day": pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"), pa.int64()),
                "c": _to_cents(t["o_totalprice"]),
            }
        )
        return keyed.group_by("day").aggregate([("c", "sum")])

    hist = (
        ds.map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("c_sum", alias_name="c"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days = hist["day"].to_numpy().astype(np.int64)
    prefix = np.concatenate([[0], hist["c"].to_numpy().astype(np.int64).cumsum()[:-1]])
    base_ref = ray.put((days, prefix))

    def add_part(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="day"), pa.int64())
        dn = d.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (dn * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "day": d,
                "cents": _to_cents(t["o_totalprice"]),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def cum_partition(g: pd.DataFrame) -> pd.DataFrame:
        days_b, prefix_b = state.cached_get(base_ref)
        g = g.sort_values(["day", "o_orderkey"], kind="mergesort")
        within = g.groupby("day", sort=False)["cents"].cumsum().to_numpy()
        base = prefix_b[np.searchsorted(days_b, g["day"].to_numpy())]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy().astype("int64"),
                "cum_revenue_cents": (base + within).astype("int64"),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cum_partition, batch_format="pandas")
        .sort("o_orderkey")
    )


ORDERS_CUMULATIVE_REVENUE_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
            OVER (ORDER BY date_trunc('day', o_orderdate), o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch (deterministic, mergeable, int-exact)
# ---------------------------------------------------------------------------

# Log2 octaves with 8 linear sub-buckets each: bucket width / lower
# bound <= 1/8, so a midpoint estimate is within ~6.25% relative
# error.  Values 0..15 get exact unit buckets.  Everything is integer
# bit arithmetic — the register table is bit-identical across engines
# and merge order, unlike rank-based sketches (KLL/t-digest) whose
# compactions depend on arrival order.

def _hdr_bucket(v: np.ndarray) -> np.ndarray:
    """Bucket index for positive int64 cents (vectorized, exact).
    frexp's exponent IS bit_length for integers exactly representable
    in float64 (cents here are << 2^53)."""
    v = v.astype(np.int64)
    out = np.where(v < 0, -1, v)  # small/negative default
    big = v > 15
    if big.any():
        bl = np.frexp(v[big].astype(np.float64))[1].astype(np.int64)
        sub = (v[big] >> (bl - 4)) & 7
        out = out.copy()
        out[big] = 16 + (bl - 5) * 8 + sub
    return out.astype(np.int64)


def hdr_bucket_bounds(bucket: int) -> tuple[int, int]:
    """[lo, hi) integer bounds of a bucket (inverse of _hdr_bucket)."""
    if bucket < 16:
        return bucket, bucket + 1
    octave, sub = divmod(bucket - 16, 8)
    bl = octave + 5
    width = 1 << (bl - 4)
    lo = (8 + sub) * width
    return lo, lo + width


def value_hdr_registers(sf_dir: str):
    """Per-event-type HDR-histogram register table over value cents —
    the QUANTILE-sketch counterpart of hll_*_registers: deterministic,
    mergeable (counts add), bounded relative error (<=1/8 bucket
    width), and integer-exact so the register table itself is the
    oracle surface.  Per batch the bucket index is pure bit
    arithmetic + one Arrow group_by partial; the shuffle carries
    (type, bucket, n) rows bounded by taxonomy x ~200 buckets,
    independent of row count.  Quantiles come from hdr_quantile() on
    the tiny register table — at 10^12 events nothing but the sketch
    ever reaches the driver."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        keyed = pa.table(
            {
                "event_type": t["event_type"],
                "bucket": pa.array(_hdr_bucket(cents)),
            }
        )
        g = pa.TableGroupBy(keyed, ["event_type", "bucket"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "bucket": g["bucket"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["event_type", "bucket"])
    )


def hdr_quantile(registers, q_permille: int) -> dict[str, float]:
    """Per-type quantile estimate (bucket midpoint at the ceil-rank
    CDF position) from a value_hdr_registers result."""
    rows = registers.take_all() if hasattr(registers, "take_all") else registers
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["bucket"], r["n"]))
    out = {}
    for ty, bl in by_type.items():
        bl.sort()
        total = sum(n for _, n in bl)
        rank = -(-q_permille * total // 1000)  # ceil
        cum = 0
        for bucket, n in bl:
            cum += n
            if cum >= rank:
                lo, hi = hdr_bucket_bounds(bucket)
                out[ty] = (lo + hi) / 2.0
                break
    return out


VALUE_HDR_REGISTERS_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
b AS (
  SELECT event_type,
         CASE WHEN v < 0 THEN -1
              WHEN v <= 15 THEN v
              ELSE 16 + (length(printf('%b', v)) - 5) * 8
                      + ((v >> (length(printf('%b', v)) - 4)) & 7)
         END AS bucket
  FROM c
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM b
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

# permille thresholds: [0,900) train, [900,950) val, [950,1000) test
SPLIT_TRAIN_PM = 900
SPLIT_VAL_PM = 950


def train_val_test_split(sf_dir: str):
    """Assign every document a train/val/test split label by
    fmix64(doc_id) % 1000 thresholds (90/5/5) — the dataset-split
    step of training-data assembly.  Hash-based assignment is the
    only split that survives scale: it needs no global shuffle or
    count, is stable under re-runs and corpus growth (a doc never
    migrates between splits when new data arrives), and any engine
    reproduces it bit-exactly.  Embarrassingly parallel one-pass
    filter-free map; the label is pure arithmetic per batch."""
    from document_extractor_ray.functions.textstats import _read_docs

    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def label(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (_hll_hash(u) % np.uint64(1000)).astype(np.int64)
        split = np.where(
            bucket < SPLIT_TRAIN_PM,
            "train",
            np.where(bucket < SPLIT_VAL_PM, "val", "test"),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "split": pa.array(split.astype(object), pa.string()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow").sort("doc_id")


def _split_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    return f"""
WITH h0 AS (
  SELECT doc_id, lang,
         (doc_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM documents
),
h1 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h0),
h2 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h2),
h4 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h4)
SELECT doc_id, lang,
       CASE WHEN h % 1000 < {SPLIT_TRAIN_PM} THEN 'train'
            WHEN h % 1000 < {SPLIT_VAL_PM} THEN 'val'
            ELSE 'test' END AS split
FROM h5
ORDER BY doc_id
"""


TRAIN_VAL_TEST_SPLIT_SQL = _split_sql()


# ---------------------------------------------------------------------------
# Cohort retention (first-activity cohort x week offset)
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400_000_000


def user_retention(sf_dir: str):
    """Cohort retention table: users grouped by FIRST-activity day,
    counted per week offset they return in — the product-analytics
    cohort triangle, which naively is distinct + self-join + distinct
    count.  Distributed as one user-hash shuffle of per-batch-deduped
    (user, day) pairs (wire bounded by distinct user-days): a user's
    whole history co-locates, so cohort day (min), week offsets, and
    the per-(cohort, offset) user counts all fall out of a single
    vectorized partition pass — each user lives in exactly one
    partition, so partial counts add with no double counting, and the
    final grouped Sum merges rows bounded by days x offsets."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = _n_blocks()

    def pair_partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        pairs = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"], "day": day}), ["user_id", "day"]
        ).aggregate([])
        u = pairs["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pairs.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def cohort_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min").to_numpy()
        offs = (g["day"].to_numpy() - cohort) // _WEEK_US
        tri = (
            pd.DataFrame(
                {"user_id": g["user_id"].to_numpy(), "cohort": cohort, "off": offs}
            )
            .drop_duplicates()
            .groupby(["cohort", "off"], sort=False)
            .size()
        )
        idx = tri.index.to_frame(index=False)
        # return an ARROW block: a pandas return makes Ray's own
        # pandas->arrow conversion attach dict schema metadata that
        # floods "Failed to hash the schemas" warnings downstream
        return pa.table(
            {
                "cohort_day": pa.array(
                    idx["cohort"].to_numpy().astype("int64"), pa.int64()
                ),
                "week_offset": pa.array(
                    idx["off"].to_numpy().astype("int64"), pa.int64()
                ),
                "n_users": pa.array(tri.to_numpy().astype("int64"), pa.int64()),
            }
        )

    def to_ts(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("cohort_day")
        return t.set_column(
            i, "cohort_day", pc.cast(t["cohort_day"], pa.timestamp("us"))
        )

    return (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cohort_partial, batch_format="pandas")
        .groupby(["cohort_day", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .map_batches(to_ts, batch_format="pyarrow")
        .sort(["cohort_day", "week_offset"])
        .map_batches(_ts_us("cohort_day"), batch_format="pyarrow")
    )


USER_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1)
SELECT f.cohort AS cohort_day,
       CAST(date_diff('day', f.cohort, ud.day) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT ud.user_id) AS BIGINT) AS n_users
FROM ud JOIN f ON ud.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semi-structured (JSON) property extraction + grouped stats
# ---------------------------------------------------------------------------

def props_json_stats(sf_dir: str):
    """Parse the JSON ``props`` column and aggregate the extracted
    integer field per event type — the semi-structured-extraction
    primitive (every web-scale event/crawl table carries a JSON blob
    column).

    The extraction is a single vectorized Arrow kernel
    (``pc.extract_regex`` -> ``struct_field`` -> cast), never a
    per-row ``json.loads`` loop: the fixture blobs are flat
    ``{"k": <int>}`` objects, for which the anchored regex IS the
    grammar.  (A general nested-JSON path would swap this kernel for
    a columnar JSON parser — e.g. pyarrow.json block reads — behind
    the same per-batch contract.)  Each batch pre-combines its own
    (type, count, sum, min, max) partials with one Arrow group_by, so
    the shuffle carries |event types| rows per block regardless of
    event count."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "k": k}), ["event_type"]
        ).aggregate([([], "count_all"), ("k", "sum"), ("k", "min"), ("k", "max")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "sum_k": pc.cast(g["k_sum"], pa.int64()),
                "min_k": pc.cast(g["k_min"], pa.int64()),
                "max_k": pc.cast(g["k_max"], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"),
        )
        .sort("event_type")
    )


PROPS_JSON_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Customer-360 full outer join (union + groupby, no join operator)
# ---------------------------------------------------------------------------

def user_activity_360(sf_dir: str):
    """Full-outer merge of per-user event activity with per-customer
    order activity (user_id == o_custkey is the shared entity key):
    every entity present on EITHER side gets one row, missing-side
    measures are zero.

    Scale shape — the union+groupby full outer: neither side is ever
    joined.  Each side pre-aggregates per batch (Arrow group_by, so
    the shuffle carries one row per distinct key per block, not per
    event), pads the other side's measures with zeros, and a single
    grouped Sum merges the union.  One key-hash shuffle total,
    skew-tolerant (hot keys just sum), and structurally symmetric —
    the same plan does left/right/full outer by dropping a side."""
    return user_activity_full(
        _read(sf_dir, "events", columns=["user_id", "value"]),
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
    )


def user_activity_full(ev: "ray.data.Dataset", orders: "ray.data.Dataset"):
    """Core of ``user_activity_360`` over explicit datasets (events
    with user_id/value, orders with o_custkey/o_totalprice) — split
    out so tests can plant keys on either side only."""

    def ev_part(t: pa.Table) -> pa.Table:
        # count_all, not ("c","count"): Arrow's value count skips
        # nulls while the oracle's count(*) counts rows
        g = (
            pa.table({"user_id": t["user_id"], "c": _to_cents(t["value"])})
            .group_by("user_id")
            .aggregate([("c", "sum"), ([], "count_all")])
        )
        n = g.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "user_id": g["user_id"],
                "n_events": pc.cast(g["count_all"], pa.int64()),
                "events_value_cents": pc.cast(
                    pc.fill_null(g["c_sum"], 0), pa.int64()
                ),
                "n_orders": z,
                "orders_total_cents": z,
            }
        )

    def or_part(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"user_id": t["o_custkey"], "c": _to_cents(t["o_totalprice"])}
            )
            .group_by("user_id")
            .aggregate([("c", "sum"), ([], "count_all")])
        )
        n = g.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "user_id": g["user_id"],
                "n_events": z,
                "events_value_cents": z,
                "n_orders": pc.cast(g["count_all"], pa.int64()),
                "orders_total_cents": pc.cast(
                    pc.fill_null(g["c_sum"], 0), pa.int64()
                ),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    return bucketed_agg(
        ev.map_batches(ev_part, batch_format="pyarrow").union(
            orders.map_batches(or_part, batch_format="pyarrow")
        ),
        ["user_id"],
        [
            ("n_events", "sum", "n_events"),
            ("events_value_cents", "sum", "events_value_cents"),
            ("n_orders", "sum", "n_orders"),
            ("orders_total_cents", "sum", "orders_total_cents"),
        ],
    ).sort("user_id")


USER_ACTIVITY_360_SQL = """
WITH e AS (
  SELECT user_id, count(*) AS n_events,
         sum(CAST(round(value * 100.0) AS BIGINT)) AS events_value_cents
  FROM events GROUP BY 1
),
o AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS orders_total_cents
  FROM orders GROUP BY 1
)
SELECT coalesce(e.user_id, o.o_custkey) AS user_id,
       CAST(coalesce(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(e.events_value_cents, 0) AS BIGINT) AS events_value_cents,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(o.orders_total_cents, 0) AS BIGINT) AS orders_total_cents
FROM e FULL OUTER JOIN o ON e.user_id = o.o_custkey
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Exact grouped median + MAD (robust statistics from one count table)
# ---------------------------------------------------------------------------

def value_mad_by_type(sf_dir: str):
    """Exact per-event_type median and median-absolute-deviation of
    the value in integer cents — the robust location/scale pair
    (Hampel 1974) a quality pipeline uses where outliers poison
    mean/stddev.

    Scale shape: ONE corpus pass builds the (type, cents, n) count
    table (per-batch Arrow group_by partials, one grouped Sum); both
    the median (lower-median rank convention: smallest v with
    2*cum >= n, integer cross-multiplied like the quantile family)
    AND the MAD come from that same table — the deviation
    distribution is a re-fold of the value counts around the median,
    so no second corpus pass exists.  The collected table is
    value-DOMAIN-bounded (cents in a fixed range), not corpus-bounded;
    for unbounded domains swap in the HDR-bucket sketch
    (value_hdr_registers)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"], "v": _to_cents(t["value"])})
            .group_by(["event_type", "v"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "v": g["v"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    counts = (
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "v"],
            [("n", "sum", "n")],
        )
        .sort(["event_type", "v"])
        .take_all()
    )

    by_type: dict[str, list] = {}
    for r in counts:
        by_type.setdefault(r["event_type"], []).append((r["v"], r["n"]))

    def _lower_median(vs: np.ndarray, ns: np.ndarray, total: int) -> int:
        cum = np.cumsum(ns)
        idx = int(np.searchsorted(cum * 2, total, side="left"))
        return int(vs[min(idx, len(vs) - 1)])

    types, totals, medians, mads = [], [], [], []
    for et in sorted(by_type):
        vs = np.array([v for v, _ in by_type[et]], np.int64)
        ns = np.array([n for _, n in by_type[et]], np.int64)
        total = int(ns.sum())
        med = _lower_median(vs, ns, total)
        dev = np.abs(vs - med)
        # merge equal deviations (two v map to the same |v - med|);
        # np.unique sorts, so no pre-sort is needed
        uniq, inv = np.unique(dev, return_inverse=True)
        dsum = np.zeros(len(uniq), np.int64)
        np.add.at(dsum, inv, ns)
        mad = _lower_median(uniq, dsum, total)
        types.append(et)
        totals.append(total)
        medians.append(med)
        mads.append(mad)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n": pa.array(totals, pa.int64()),
            "median_cents": pa.array(medians, pa.int64()),
            "mad_cents": pa.array(mads, pa.int64()),
        }
    )


VALUE_MAD_BY_TYPE_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS v, count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
cum AS (
  SELECT event_type, v, sum(n) OVER (PARTITION BY event_type ORDER BY v) AS cumn
  FROM c
),
med AS (
  SELECT tot.event_type,
         (SELECT min(v) FROM cum
           WHERE cum.event_type = tot.event_type AND cum.cumn * 2 >= tot.n) AS m
  FROM tot
),
dev AS (
  SELECT c.event_type, abs(c.v - med.m) AS d, sum(c.n) AS n
  FROM c JOIN med USING (event_type) GROUP BY 1, 2
),
dcum AS (
  SELECT event_type, d, sum(n) OVER (PARTITION BY event_type ORDER BY d) AS cumn
  FROM dev
)
SELECT tot.event_type, tot.n,
       CAST(med.m AS BIGINT) AS median_cents,
       (SELECT CAST(min(d) AS BIGINT) FROM dcum
         WHERE dcum.event_type = tot.event_type AND dcum.cumn * 2 >= tot.n) AS mad_cents
FROM tot JOIN med USING (event_type)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------

def event_transitions(sf_dir: str):
    """Corpus-wide event-type transition counts: for every user's
    ts-ordered event stream (event_id tie-break), count each
    consecutive (prev_type -> next_type) pair — the first-order Markov
    /funnel matrix behind session-flow analytics.

    Same irreducible plan as the other per-key ordered windows
    (user_lag_gaps): ONE user-hash shuffle co-locates a user's events,
    the whole partition sorts once, the pair extraction is a shifted
    numpy compare masked by user boundaries, and each partition emits
    only its LOCAL (prev, next, n) partial counts — |types|^2-bounded,
    so the final grouped Sum is a trivial second shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(g) < 2:
            return pd.DataFrame(
                {"prev_type": pd.Series([], dtype=str),
                 "next_type": pd.Series([], dtype=str),
                 "n": pd.Series([], dtype="int64")}
            )
        same = uid[1:] == uid[:-1]
        pairs = pd.DataFrame(
            {"prev_type": et[:-1][same], "next_type": et[1:][same]}
        )
        out = pairs.groupby(["prev_type", "next_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["prev_type", "next_type"])
    )


EVENT_TRANSITIONS_SQL = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sliding-window distinct users (sliding + exact distinct composition)
# ---------------------------------------------------------------------------

def sliding_7d_users(sf_dir: str):
    """Exact distinct users per trailing 7-day window — the DAU/WAU
    rollup: for every window-end day, how many distinct users were
    active in [end-6, end].

    Composition of the two established shapes: each batch dedups its
    (day, user) pairs with one Arrow group-by (combiner — a user's
    many events per block shuffle once), the window explode fans each
    pair to its 7 window ends (shuffle-free, like events_sliding_7d),
    global distinctness comes from one groupby(window_end, user_id),
    and per-batch partial counts + a tiny second groupby finish —
    the wide shuffle carries at most 7 x |user-days|, never events."""
    from datetime import timedelta

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def explode_pairs(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(
            pa.table({"day": day, "user_id": t["user_id"]}), ["day", "user_id"]
        ).aggregate([([], "count_all")])
        parts = [
            pa.table(
                {
                    "window_end": pc.add(g["day"], pa.scalar(timedelta(days=k))),
                    "user_id": g["user_id"],
                }
            )
            for k in range(7)
        ]
        return pa.concat_tables(parts)

    from document_extractor_ray.functions.bucketing import bucketed_agg

    pairs = bucketed_agg(
        ds.map_batches(explode_pairs, batch_format="pyarrow"),
        ["window_end", "user_id"],
        [(None, "count", "_dup")],
    )

    def end_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["window_end"]), ["window_end"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "window_end": g["window_end"],
                "n_users": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        pairs.map_batches(end_partial, batch_format="pyarrow")
        .groupby("window_end")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .sort("window_end")
        .map_batches(_ts_us("window_end"), batch_format="pyarrow")
    )


SLIDING_7D_USERS_SQL = """
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
wnd AS (
  SELECT day + to_days(CAST(t.k AS INTEGER)) AS window_end, user_id
  FROM du, range(0, 7) AS t(k)
)
SELECT window_end, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM wnd GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Robust outlier filter: |x - median| > K * MAD, all-integer
# ---------------------------------------------------------------------------

OUTLIER_K = 5


def value_outliers(sf_dir: str, k_mad: int = OUTLIER_K):
    """Events whose value is a robust outlier within its event_type:
    |cents - median| > k * MAD (the Hampel identifier with the
    classic k=5 cut) — the filter stage the robust statistics exist
    for, and unlike z-scores it is ALL-INTEGER, so the oracle is
    bit-exact with no float margin audit.

    Scale shape: the (type, median, mad) table comes from the same
    one-pass count-table fold as value_mad_by_type (value-domain-
    bounded), broadcasts once as a tiny Arrow dim, and the filter is a
    vectorized index_in + take + compare per batch — the corpus
    streams, nothing wide shuffles."""
    from document_extractor_ray import state

    mad_tbl = value_mad_by_type(sf_dir)
    ref = state.broadcast(mad_tbl)

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def flag(t: pa.Table) -> pa.Table:
        dim = state.cached_get(ref)
        cents = _to_cents(t["value"])
        idx = pc.index_in(t["event_type"], value_set=dim["event_type"])
        med = pc.take(dim["median_cents"], idx)
        mad = pc.take(dim["mad_cents"], idx)
        dev = pc.abs(pc.subtract(cents, med))
        keep = pc.greater(dev, pc.multiply(mad, k_mad))
        out = pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": cents,
                "abs_dev": dev,
            }
        )
        return out.filter(keep)

    return ds.map_batches(flag, batch_format="pyarrow").sort("event_id")


VALUE_OUTLIERS_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS v, count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
cum AS (
  SELECT event_type, v, sum(n) OVER (PARTITION BY event_type ORDER BY v) AS cumn
  FROM c
),
med AS (
  SELECT tot.event_type,
         (SELECT min(v) FROM cum
           WHERE cum.event_type = tot.event_type AND cum.cumn * 2 >= tot.n) AS m
  FROM tot
),
dev AS (
  SELECT c.event_type, abs(c.v - med.m) AS d, sum(c.n) AS n
  FROM c JOIN med USING (event_type) GROUP BY 1, 2
),
dcum AS (
  SELECT event_type, d, sum(n) OVER (PARTITION BY event_type ORDER BY d) AS cumn
  FROM dev
),
madt AS (
  SELECT tot.event_type, med.m,
         (SELECT min(d) FROM dcum
           WHERE dcum.event_type = tot.event_type AND dcum.cumn * 2 >= tot.n) AS mad
  FROM tot JOIN med USING (event_type)
)
SELECT e.event_id, e.event_type,
       CAST(round(e.value * 100.0) AS BIGINT) AS cents,
       CAST(abs(CAST(round(e.value * 100.0) AS BIGINT) - madt.m) AS BIGINT) AS abs_dev
FROM events e JOIN madt USING (event_type)
WHERE abs(CAST(round(e.value * 100.0) AS BIGINT) - madt.m) > {OUTLIER_K} * madt.mad
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Ordered-stage funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 86_400_000_000  # stage i+1 must land within 1 day of stage i


def funnel_counts(sf_dir: str):
    """Funnel conversion: how many users reached each stage in ORDER —
    stage i+1 counts a user only if they fired that event type
    STRICTLY AFTER their stage-i entry time and within the 1-day
    conversion window (entry = earliest qualifying event).  The
    product-analytics primitive behind conversion dashboards.

    Sequential semantics per user, so it shuffles once on a hash
    bucket of user_id (the sessionize plan — a user's events
    co-locate, partitions stay balanced); inside a partition the whole
    stage walk is len(FUNNEL_STAGES) vectorized groupby-min passes
    (each stage's threshold Series reindexes onto the next stage's
    candidate rows — NaT thresholds auto-exclude users who never
    reached the prior stage).  The partial per partition is one row
    per stage, so the final aggregate is a 3-key Sum — nothing
    key-per-row ever leaves a partition."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        reached = []
        prev = None  # user_id -> entry ts of the previous stage
        for stage in FUNNEL_STAGES:
            sub = g[g["event_type"] == stage]
            if prev is not None:
                thr = prev.reindex(sub["user_id"]).to_numpy()
                ts = sub["ts"].to_numpy()
                # NaT threshold (user never reached prior stage) or
                # no in-window strictly-later event both compare False.
                sub = sub[
                    (ts > thr)
                    & (ts <= thr + np.timedelta64(FUNNEL_WINDOW_US, "us"))
                ]
            prev = sub.groupby("user_id", sort=False)["ts"].min()
            reached.append(len(prev))
        return pd.DataFrame(
            {
                "stage_idx": np.arange(len(FUNNEL_STAGES), dtype=np.int64),
                "users": np.asarray(reached, dtype=np.int64),
            }
        )

    stage_names = pa.array(list(FUNNEL_STAGES), pa.string())

    def attach_name(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "stage_idx" not in t.column_names:
            # Ray 2.49 hash aggregates can emit empty blocks with an
            # EMPTY schema (CLAUDE.md trap) — normalize them.
            return pa.table(
                {
                    "stage_idx": pa.array([], pa.int64()),
                    "stage": pa.array([], pa.string()),
                    "users": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "stage_idx": t["stage_idx"],
                "stage": stage_names.take(pc.cast(t["stage_idx"], pa.int32())),
                "users": t["users"],
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .groupby("stage_idx")
        .aggregate(Sum("users", alias_name="users"))
        .map_batches(attach_name, batch_format="pyarrow")
        .sort("stage_idx")
    )


FUNNEL_COUNTS_SQL = f"""
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s0.t
    AND e.ts <= s0.t + to_microseconds({FUNNEL_WINDOW_US}::BIGINT)
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s1.t
    AND e.ts <= s1.t + to_microseconds({FUNNEL_WINDOW_US}::BIGINT)
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS stage_idx, '{FUNNEL_STAGES[0]}' AS stage,
         (SELECT CAST(count(*) AS BIGINT) FROM s0) AS users
  UNION ALL
  SELECT CAST(1 AS BIGINT), '{FUNNEL_STAGES[1]}',
         (SELECT CAST(count(*) AS BIGINT) FROM s1)
  UNION ALL
  SELECT CAST(2 AS BIGINT), '{FUNNEL_STAGES[2]}',
         (SELECT CAST(count(*) AS BIGINT) FROM s2)
)
ORDER BY stage_idx
"""


# ---------------------------------------------------------------------------
# Promo revenue ratio per ship month (TPC-H Q14 shape; uses the part dim)
# ---------------------------------------------------------------------------

def promo_revenue_monthly(sf_dir: str):
    """Monthly promo-revenue share: lineitem joined to the part dim,
    revenue split by whether p_type is a PROMO part, ratio in exact
    permille — the TPC-H Q14 shape.

    Money stays integer end to end: revenue per line is
    cents(extendedprice) * (1000 - permille(discount)) — one exact
    int64 "milli-cent" product — so sums and the final ratio are
    bit-reproducible under any association order.  The part dim
    broadcasts once via ray.put (p_partkey -> promo flag; ~9 bytes a
    row, so the documented broadcast ceiling is ~10^8 parts — above
    that, swap the attach for the partitioned hash join used by
    order_revenue_by_nation).  Per batch the attach is index_in +
    take, the partial is an Arrow group_by over ship months, and the
    shuffle carries (month, 2 sums) partials — months are bounded, so
    the final aggregate is a native Sum."""
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    from document_extractor_ray import state

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    dim = pa.table(
        {
            "p_partkey": part["p_partkey"],
            "is_promo": pc.cast(
                pc.starts_with(part["p_type"], "PROMO"), pa.int64()
            ),
        }
    )
    ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "l_partkey", state.cached_get(ref), "p_partkey", ["is_promo"], fill=0
        )
        rev_mc = pc.multiply(
            _to_cents(t["l_extendedprice"]),
            pc.subtract(
                pa.scalar(1000, pa.int64()),
                pc.cast(
                    pc.round(
                        pc.multiply(t["l_discount"], 1000.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            ),
        )
        month = pc.floor_temporal(t["l_shipdate"], unit="month")
        g = pa.TableGroupBy(
            pa.table(
                {
                    "month": month,
                    "promo_mc": pc.multiply(rev_mc, pc.cast(t["is_promo"], pa.int64())),
                    "total_mc": rev_mc,
                }
            ),
            ["month"],
        ).aggregate([("promo_mc", "sum"), ("total_mc", "sum")])
        return g.rename_columns(["month", "promo_mc", "total_mc"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month": pc.cast(t["month"], pa.timestamp("us")),
                "promo_mc": t["promo_mc"],
                "total_mc": t["total_mc"],
                "promo_permille": pc.divide(
                    pc.multiply(t["promo_mc"], pa.scalar(1000, pa.int64())),
                    t["total_mc"],
                ),
            }
        )

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(
            Sum("promo_mc", alias_name="promo_mc"),
            Sum("total_mc", alias_name="total_mc"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("month")
    )


PROMO_REVENUE_MONTHLY_SQL = """
WITH li AS (
  SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS month,
         CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
           * (1000 - CAST(round(l.l_discount * 1000.0) AS BIGINT)) AS rev_mc,
         CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT month,
       CAST(sum(rev_mc * is_promo) AS BIGINT) AS promo_mc,
       CAST(sum(rev_mc) AS BIGINT) AS total_mc,
       CAST((1000 * sum(rev_mc * is_promo)) // sum(rev_mc) AS BIGINT) AS promo_permille
FROM li
GROUP BY month
ORDER BY month
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov distance between event-type value dists
# ---------------------------------------------------------------------------

KS_TYPE_A = "click"
KS_TYPE_B = "purchase"


def value_ks_types(sf_dir: str, type_a: str = KS_TYPE_A, type_b: str = KS_TYPE_B):
    """Exact two-sample KS statistic between the value distributions
    of two event types — the drift / A-B-sameness test, all integer:
    with per-type counts folded per distinct cents value, D * n_a *
    n_b = max_v |cumsum_a(v) * n_b - cumsum_b(v) * n_a| needs no
    floats, so the oracle is bit-exact (ks_num fits int64 up to ~3e9
    rows per side; the SQL side computes in HUGEINT regardless).

    Distributed shape: one filtered pass pre-counts (cents, side)
    per batch, a bucketed aggregate folds the distinct-value table
    (value-domain-bounded, NOT row-bounded), and the ordered cumsum
    scan runs in ONE task over that small table — the same
    counts-table fold the median/MAD family uses; for an unbounded
    value domain, range-partition the cents axis and prefix-sum the
    per-partition totals (the value_hdr escalation)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.is_in(t["event_type"], value_set=pa.array([type_a, type_b]))
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "cents": _to_cents(t["value"]),
                    "isb": pc.cast(pc.equal(t["event_type"], type_b), pa.int64()),
                }
            ),
            ["cents", "isb"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "cents": g["cents"],
                "isb": g["isb"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        isb = t["isb"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((isb, cents))
        cents, isb, n = cents[order], isb[order], n[order]
        na, nb = int(n[isb == 0].sum()), int(n[isb == 1].sum())
        # one row per distinct cents: cumulative counts of each side
        uniq, start = np.unique(cents, return_index=True)
        ca = np.cumsum(np.where(isb == 0, n, 0))
        cb = np.cumsum(np.where(isb == 1, n, 0))
        end = np.append(start[1:], len(cents)) - 1  # last row per value
        dv = np.abs(ca[end] * nb - cb[end] * na)
        best = int(dv.max()) if len(dv) else 0
        at = int(uniq[dv.argmax()]) if len(dv) else 0
        permille = 1000 * best // (na * nb) if na and nb else 0
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "ks_num": pa.array([best], pa.int64()),
                "at_cents": pa.array([at], pa.int64()),
                "ks_permille": pa.array([permille], pa.int64()),
            }
        )

    # the (cents, isb) key is value-domain-bounded -> bucketed partial
    # fold, then ONE ordered scan (groupby on the constant part)
    folded = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cents", "isb"],
        [("n", "sum", "n")],
    )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        )

    def resolve_part(t: pa.Table) -> pa.Table:
        return resolve(t.drop_columns(["part"]))

    return (
        folded.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve_part, batch_format="pyarrow")
    )


VALUE_KS_TYPES_SQL = f"""
WITH e AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')
),
c AS (
  SELECT cents,
         CAST(sum(CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
         CAST(sum(CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
  FROM e GROUP BY cents
),
t AS (
  SELECT CAST(sum(na_v) AS BIGINT) AS na, CAST(sum(nb_v) AS BIGINT) AS nb FROM c
),
cum AS (
  SELECT cents,
         sum(na_v) OVER (ORDER BY cents) AS ca,
         sum(nb_v) OVER (ORDER BY cents) AS cb
  FROM c
),
d AS (SELECT cents, abs(ca * t.nb - cb * t.na) AS dv FROM cum, t)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST((SELECT max(dv) FROM d) AS BIGINT) AS ks_num,
       CAST((SELECT min(cents) FROM d WHERE dv = (SELECT max(dv) FROM d))
            AS BIGINT) AS at_cents,
       CAST(1000 * (SELECT max(dv) FROM d) // (t.na * t.nb) AS BIGINT)
         AS ks_permille
FROM t
"""


# ---------------------------------------------------------------------------
# Orders-with-returned-lines counts by priority (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

RETURNED_SEMI_BROADCAST_LIMIT = 5_000_000


def returned_orders_by_priority(sf_dir: str):
    """Order counts per priority restricted to orders having >= 1
    returned lineitem — the EXISTS / semi-join aggregate (TPC-H Q4's
    shape; the reference has no joins at all, SURVEY §2.5, so this is
    engine surface beyond it).

    Distributed shape: the inner side reduces to DISTINCT orderkeys
    FIRST (per-batch unique, then a bucketed distinct fold — the
    shuffle carries unique keys, never lineitem rows), and the probe
    is a broadcast `is_in` mask over orders below
    RETURNED_SEMI_BROADCAST_LIMIT keys; above the budget the same
    probe runs as a partitioned inner join on o_orderkey against the
    distinct-key Dataset (the customers_without_orders escalation).
    The final groupby has 5 bounded keys — plain Ray aggregate."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def returned_keys(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table({"l_orderkey": pc.unique(f["l_orderkey"])})

    distinct = bucketed_agg(
        li.map_batches(returned_keys, batch_format="pyarrow"),
        ["l_orderkey"],
        [(None, "count", "_n")],
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    n_keys = distinct.count()
    if n_keys <= RETURNED_SEMI_BROADCAST_LIMIT:
        keys = pa.array(distinct.to_pandas()["l_orderkey"].to_numpy(), pa.int64())
        ref = state.broadcast(keys)

        def semi(t: pa.Table) -> pa.Table:
            have = state.cached_get(ref)
            return t.filter(pc.is_in(t["o_orderkey"], value_set=have))

        hits = orders.map_batches(semi, batch_format="pyarrow")
    else:  # pragma: no cover - exercised via broadcast_limit override in tests
        hits = orders.join(
            distinct.select_columns(["l_orderkey"]),
            join_type="inner",
            num_partitions=_join_partitions(
                f"{sf_dir}/orders.parquet", f"{sf_dir}/lineitem.parquet"
            ),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

    return (
        hits.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .sort("o_orderpriority")
    )


RETURNED_ORDERS_BY_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Top customers by returned-item revenue (TPC-H Q10 shape)
# ---------------------------------------------------------------------------

RETURNED_REVENUE_TOP_K = 20


def returned_revenue_topk(sf_dir: str, k: int = RETURNED_REVENUE_TOP_K):
    """Top-k customers by revenue on RETURNED items (TPC-H Q10's
    shape): filtered fact x fact partitioned hash join (lineitem
    filtered to returnflag='R' joined to orders on orderkey), a
    customer-keyed revenue aggregate (key cardinality grows with
    data -> bucketed fold, PERF 20-22), a global top-k, then the
    name/nation dims attach to only the k winners.

    Money: revenue = extendedprice * (1 - discount) rounded
    half-away-from-zero to integer cents per line BEFORE summing, so
    the DuckDB oracle reproduces the total bit for bit.

    Scale notes: the join ships only (orderkey, cents) on the probe
    side and (orderkey, custkey) on the build side; the dim attach
    reads the customer/nation parquet with an `is_in` filter on k=20
    keys (row-group pruned, never a scan of the dim at 100 TB)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def slim(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        # aggregate BELOW the join: per-batch per-orderkey partial sums
        # shrink the probe side from lines to orders before any shuffle
        # (at sf0.1 the join's fixed cost dominates either way; at 10^12
        # lines this is the difference between shuffling lines and
        # shuffling orders; exactness unaffected — the per-LINE cents
        # rounding happens first, the sum is associative)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "cents": _to_cents(
                        pc.multiply(
                            t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                        )
                    ),
                }
            ),
            ["l_orderkey"],
        ).aggregate([("cents", "sum")])
        return pa.table(
            {"l_orderkey": g["l_orderkey"], "cents": g["cents_sum"]}
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = li.map_batches(slim, batch_format="pyarrow").join(
        orders,
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
        ),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    per_cust = bucketed_agg(
        joined.select_columns(["o_custkey", "cents"]),
        ["o_custkey"],
        [("cents", "sum", "revenue_cents")],
    )
    top = (
        per_cust.sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(k)
        .take_all()
    )

    import pyarrow.parquet as pq

    keys = [r["o_custkey"] for r in top]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys)] if keys else None,
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cmap = {
        int(ck): (cn, int(nk))
        for ck, cn, nk in zip(
            cust["c_custkey"].to_pylist(),
            cust["c_name"].to_pylist(),
            cust["c_nationkey"].to_pylist(),
        )
    }
    nmap = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    return pa.table(
        {
            "c_custkey": pa.array([r["o_custkey"] for r in top], pa.int64()),
            "c_name": pa.array(
                [cmap[r["o_custkey"]][0] for r in top], pa.string()
            ),
            "n_name": pa.array(
                [nmap[cmap[r["o_custkey"]][1]] for r in top], pa.string()
            ),
            "revenue_cents": pa.array(
                [r["revenue_cents"] for r in top], pa.int64()
            ),
        }
    )


RETURNED_REVENUE_TOPK_SQL = f"""
WITH rev AS (
  SELECT o.o_custkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
  ORDER BY revenue_cents DESC, o.o_custkey
  LIMIT {RETURNED_REVENUE_TOP_K}
)
SELECT c.c_custkey, c.c_name, n.n_name, rev.revenue_cents
FROM rev
JOIN customer c ON c.c_custkey = rev.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY rev.revenue_cents DESC, c.c_custkey
"""


# ---------------------------------------------------------------------------
# Year-over-year revenue per nation (windowed join aggregate)
# ---------------------------------------------------------------------------

def nation_yoy_revenue(sf_dir: str):
    """Revenue per (nation, order year) with the year-over-year delta
    — the lag-window-over-a-join report.  Reuses the
    order_revenue_by_nation partitioned join; the aggregate keys
    (nation x year) are BOUNDED (25 x ~7), so Ray's hash aggregate is
    fine, and the lag pass runs vectorized in ONE task over the tiny
    aggregate (first year per nation gets a NULL delta, matching SQL
    lag())."""
    from document_extractor_ray import state

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def slim(t: pa.Table) -> pa.Table:
        # aggregate BELOW the join: (custkey, yr) partials collapse
        # the order rows of a customer-year before the shuffle
        g = pa.TableGroupBy(
            pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["o_custkey", "yr"],
        ).aggregate([("cents", "sum")])
        return pa.table(
            {"o_custkey": g["o_custkey"], "yr": g["yr"], "cents": g["cents_sum"]}
        )

    joined = orders.map_batches(slim, batch_format="pyarrow").join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/orders.parquet", f"{sf_dir}/customer.parquet"
        ),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    per = joined.groupby(["c_nationkey", "yr"]).aggregate(
        Sum("cents", alias_name="revenue_cents")
    )

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    ref = state.broadcast(nation)

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_nationkey" not in t.column_names:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "yr": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int32()),
                }
            )
        t = state.lookup_join(
            t, "c_nationkey", state.cached_get(ref), "n_nationkey",
            ["n_name"], fill="",
        )
        t = t.select(["n_name", "yr", "revenue_cents"])
        return t.append_column(
            "part", pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        )

    def lag_pass(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        order = np.lexsort(
            (
                t["yr"].to_numpy(zero_copy_only=False),
                t["n_name"].to_numpy(zero_copy_only=False),
            )
        )
        t = t.take(pa.array(order))
        names = t["n_name"].to_numpy(zero_copy_only=False)
        rev = t["revenue_cents"].to_numpy(zero_copy_only=False)
        same = np.zeros(len(names), bool)
        if len(names) > 1:
            same[1:] = names[1:] == names[:-1]
        delta = np.where(same, rev - np.roll(rev, 1), 0)
        return pa.table(
            {
                "n_name": t["n_name"],
                "yr": t["yr"],
                "revenue_cents": t["revenue_cents"],
                "delta_cents": pa.array(delta, pa.int64(), mask=~same),
            }
        )

    return (
        per.map_batches(attach, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lag_pass, batch_format="pyarrow")
    )


NATION_YOY_REVENUE_SQL = """
WITH per AS (
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, yr
)
SELECT n_name, yr, revenue_cents,
       CAST(revenue_cents - lag(revenue_cents) OVER (
             PARTITION BY n_name ORDER BY yr) AS BIGINT) AS delta_cents
FROM per
ORDER BY n_name, yr
"""


# ---------------------------------------------------------------------------
# Per-part top supplier by shipped quantity (grouped argmax over a join-free
# fact aggregate)
# ---------------------------------------------------------------------------

def part_top_supplier(sf_dir: str):
    """For every part, the supplier that shipped the most of it
    (ties -> lower suppkey) — the grouped-argmax primitive.  Part keys
    grow with the catalog, so BOTH folds are hash-bucketed by
    l_partkey (PERF 20-22): fold 1 merges per-batch (part, supplier)
    quantity partials; because the bucket key is the PART, every
    supplier row of a part lands in the same partition, and the
    argmax is one vectorized lexsort + first-occurrence pass per
    PARTITION — never per part.  Quantities sum as integer
    centi-units so the oracle is exact."""
    from document_extractor_ray.functions.bucketing import key_part_column, n_shuffle_parts

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])
    n_parts = n_shuffle_parts()

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_partkey": t["l_partkey"],
                    "l_suppkey": t["l_suppkey"],
                    "qc": _to_cents(t["l_quantity"]),
                }
            ),
            ["l_partkey", "l_suppkey"],
        ).aggregate([("qc", "sum")])
        out = pa.table(
            {
                "l_partkey": g["l_partkey"],
                "l_suppkey": g["l_suppkey"],
                "qc": g["qc_sum"],
            }
        )
        return out.append_column(
            "part", key_part_column(out, ["l_partkey"], n_parts)
        )

    def argmax_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        g = pa.TableGroupBy(t, ["l_partkey", "l_suppkey"]).aggregate([("qc", "sum")])
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False)
        qc = g["qc_sum"].to_numpy(zero_copy_only=False)
        # sort (part asc, qty desc, supp asc); first row per part wins
        order = np.lexsort((sk, -qc, pk))
        pk, sk, qc = pk[order], sk[order], qc[order]
        first = np.ones(len(pk), bool)
        if len(pk) > 1:
            first[1:] = pk[1:] != pk[:-1]
        return pa.table(
            {
                "l_partkey": pa.array(pk[first], pa.int64()),
                "top_suppkey": pa.array(sk[first], pa.int64()),
                "qty_cents": pa.array(qc[first], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(argmax_part, batch_format="pyarrow")
        .sort("l_partkey")
    )


PART_TOP_SUPPLIER_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
r AS (
  SELECT l_partkey, l_suppkey, qty_cents,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY qty_cents DESC, l_suppkey) AS rk
  FROM per
)
SELECT l_partkey, l_suppkey AS top_suppkey, qty_cents
FROM r WHERE rk = 1
ORDER BY l_partkey
"""


# ---------------------------------------------------------------------------
# Per-session attribute table (sessionize with boundaries + durations)
# ---------------------------------------------------------------------------

def session_stats(sf_dir: str):
    """One row per (user, session): 1-based session id, event count
    and span in microseconds, with the same 30-minute inactivity gap
    as `sessionize`.  The windowed-session ATTRIBUTE table (sessionize
    only counts sessions) — the thing downstream funnel/engagement
    reports join against.

    Same shuffle shape as sessionize (PERF.md): one hash-bucket
    shuffle of user_id into ~CPU partitions, then per PARTITION a
    single vectorized pandas pass (sort, gap diff, cumsum session
    ids, one groupby agg) — never per-user Python.  Equal-timestamp
    events cannot diverge from the SQL window: a 0-gap never starts
    a session and min/max/count are permutation-invariant."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].diff()
        starts = prev.isna() | (prev.dt.total_seconds() > SESSION_GAP_S)
        sid = starts.groupby(g["user_id"], sort=False).cumsum().astype(np.int64)
        grp = g.assign(session_id=sid).groupby(
            ["user_id", "session_id"], sort=True
        )["ts"]
        agg = grp.agg(["size", "min", "max"]).reset_index()
        dur = (
            (agg["max"].to_numpy() - agg["min"].to_numpy())
            // np.timedelta64(1, "us")
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].to_numpy(),
                "session_id": agg["session_id"].to_numpy(),
                "n_events": agg["size"].to_numpy().astype(np.int64),
                "duration_us": dur,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort(["user_id", "session_id"])
    )


SESSION_STATS_SQL = f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts - lag(ts) OVER w) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS st
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         sum(st) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       count(*) AS n_events,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# Brand co-occurrence basket pairs (market-basket primitive)
# ---------------------------------------------------------------------------

BASKET_TOP_K = 25


def brand_basket_pairs(sf_dir: str, k: int = BASKET_TOP_K):
    """Top-k pairs of part BRANDS co-occurring in one order (counted
    once per order) — the market-basket / co-occurrence primitive
    over a fact⋈dim join.

    Shape: partitioned hash join lineitem⋈part ships only (orderkey,
    brand); orders co-locate via the hash-bucket shuffle, and pair
    enumeration inside each partition is FULLY vectorized — distinct
    (order, brand) via one Arrow group_by, then all within-order
    pairs from one np.repeat/offset construction (NO per-order Python:
    unlike LSH buckets, nearly every order is a multi-row bucket, so
    the pair_fn-per-bucket helper would pay a call per order).  The
    pair key domain is brands² (bounded), so the count fold is one
    plain aggregate."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    from document_extractor_ray.functions.bucketing import (
        key_part_column,
        n_shuffle_parts,
    )

    joined = ds.join(
        part,
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/part.parquet"
        ),
        on=("l_partkey",),
        right_on=("p_partkey",),
    )
    n_parts = n_shuffle_parts()

    def slim(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["l_orderkey", "p_brand"]), ["l_orderkey", "p_brand"]
        ).aggregate([])
        out = pa.table({"l_orderkey": g["l_orderkey"], "p_brand": g["p_brand"]})
        return out.append_column(
            "part", key_part_column(out, ["l_orderkey"], n_parts)
        )

    _EMPTY = pa.table(
        {
            "brand_a": pa.array([], pa.string()),
            "brand_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pairs(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        # global distinct within the partition (an order is whole here)
        g = pa.TableGroupBy(t, ["l_orderkey", "p_brand"]).aggregate([])
        t = pa.table(
            {"o": g["l_orderkey"], "b": g["p_brand"]}
        ).sort_by([("o", "ascending"), ("b", "ascending")])
        o = t["o"].to_numpy(zero_copy_only=False)
        n = len(o)
        if n < 2:
            return _EMPTY
        # run boundaries -> vectorized upper-triangle pair indices
        starts = np.flatnonzero(np.concatenate(([True], o[1:] != o[:-1])))
        ends = np.append(starts[1:], n)
        run_end = np.repeat(ends, ends - starts)  # end of each row's run
        reps = run_end - np.arange(n) - 1
        total = int(reps.sum())
        if total == 0:
            return _EMPTY
        left = np.repeat(np.arange(n), reps)
        off = np.concatenate(([0], np.cumsum(reps)[:-1]))
        right = left + 1 + (np.arange(total) - off[left])
        b = t["b"].combine_chunks()
        g2 = pa.TableGroupBy(
            pa.table(
                {
                    "brand_a": b.take(pa.array(left)),
                    "brand_b": b.take(pa.array(right)),
                }
            ),
            ["brand_a", "brand_b"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "brand_a": g2["brand_a"],
                "brand_b": g2["brand_b"],
                "n": pc.cast(g2["count_all"], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["brand_a", "brand_b"]).aggregate([("n", "sum")])
        return pa.table(
            {"brand_a": g["brand_a"], "brand_b": g["brand_b"], "n": g["n_sum"]}
        )

    def add_zero(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        )

    def fold_part(t: pa.Table) -> pa.Table:
        return fold(t.drop_columns(["part"]))

    return (
        joined.map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(fold, batch_format="pyarrow")  # brand² partials
        .map_batches(add_zero, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold_part, batch_format="pyarrow")
        .sort(["n", "brand_a", "brand_b"], descending=[True, False, False])
        .limit(k)
    )


BRAND_BASKET_PAIRS_SQL = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS n
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n FROM pairs
ORDER BY n DESC, brand_a, brand_b
LIMIT {BASKET_TOP_K}
"""


# ---------------------------------------------------------------------------
# Lines-per-order histogram (fact-shape profile)
# ---------------------------------------------------------------------------

def order_lines_histogram(sf_dir: str):
    """Distribution of lineitem counts per order — the fact-table
    shape profile (skew planner input).  Fold 1 is a bucketed
    per-order count (orderkeys grow with data); fold 2 groups THAT
    by count value (domain-bounded, ~7 distinct) — the same
    frequency-of-frequencies reduction token_gini uses."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["l_orderkey"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_order = bucketed_agg(
        ds.map_batches(cnt_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("c", "sum", "c")],
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["c"]).rename_columns(["n_lines"]), ["n_lines"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "n_lines": g["n_lines"],
                "n_orders": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return bucketed_agg(
        per_order.map_batches(hist_partial, batch_format="pyarrow"),
        ["n_lines"],
        [("n_orders", "sum", "n_orders")],
    ).sort("n_lines")


ORDER_LINES_HISTOGRAM_SQL = """
SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
FROM (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
)
GROUP BY n_lines
ORDER BY n_lines
"""


# ---------------------------------------------------------------------------
# Per-type decile assignment (distributed rank via counts-table broadcast)
# ---------------------------------------------------------------------------

def value_decile_assign(sf_dir: str):
    """Every event labeled with the decile of its value WITHIN its
    event type — the feature-bucketization / quantile-binning step,
    tie-stable: decile = ((rank_min − 1) * 10) // n_type where
    rank_min is SQL rank() (equal values share the minimum rank), so
    no row-order nondeterminism (ntile() would be order-dependent on
    ties).

    Distributed rank WITHOUT a global sort: fold 1 is the (type,
    cents) counts table (value-domain-bounded, the median/KS shape);
    the per-type cumulative-below table broadcasts once, and each
    batch assigns ranks by one searchsorted per type present.  For an
    unbounded value domain, range-partition the cents axis and
    prefix-sum partition totals (the value_hdr escalation)."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"event_type": t["event_type"], "cents": _to_cents(t["value"])}
            ),
            ["event_type", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = bucketed_agg(
        ds.map_batches(cnt_partial, batch_format="pyarrow"),
        ["event_type", "cents"],
        [("n", "sum", "n")],
    ).take_all()  # value-domain-bounded table (see docstring escalation)

    lut: dict = {}
    for r in counts:
        lut.setdefault(r["event_type"], []).append((r["cents"], r["n"]))
    packed = {}
    for et, rows in lut.items():
        rows.sort()
        cents = np.array([c for c, _ in rows], np.int64)
        ns = np.array([n for _, n in rows], np.int64)
        below = np.concatenate(([0], np.cumsum(ns)[:-1]))
        packed[et] = (cents, below, int(ns.sum()))
    ref = state.broadcast(packed)

    def assign(t: pa.Table) -> pa.Table:
        p = state.cached_get(ref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        dec = np.zeros(len(et), np.int64)
        for typ in np.unique(et):
            m = et == typ
            cs, below, n = p[typ]
            rank0 = below[np.searchsorted(cs, cents[m])]  # rank_min - 1
            dec[m] = rank0 * 10 // n
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "cents": pa.array(cents, pa.int64()),
                "decile": pa.array(dec, pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow").sort("event_id")


VALUE_DECILE_ASSIGN_SQL = """
SELECT event_id, event_type, cents,
       CAST((rank() OVER (PARTITION BY event_type ORDER BY cents) - 1) * 10
            // (count(*) OVER (PARTITION BY event_type)) AS BIGINT) AS decile
FROM (
  SELECT event_id, event_type,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Events per order within a trailing window (interval-count join)
# ---------------------------------------------------------------------------

ORDER_WINDOW_DAYS = 7


def order_window_event_counts(sf_dir: str, days: int = ORDER_WINDOW_DAYS):
    """Per order: how many events its customer produced within
    [orderdate, orderdate + days] — the interval/range-count join Ray
    Data has no operator for (events_asof_orders covers the as-of
    case; this is the window-count case).

    Boundary-marker merge, the scale shape: both sides slim, tag, and
    hash-bucket ONCE on the user key (the as-of/sessionize pattern);
    inside each partition one lexsort of (user, t, kind) with kind
    ordered lo(-1) < event(0) < hi(+1) makes the running event count
    C(t) readable at each marker — inclusive bounds fall out of the
    tie order, no per-order search.  Each order then contributes
    (+C_hi, −C_lo) rows and ONE bucketed sum per orderkey yields the
    counts — orders whose user has no events settle to 0."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    events = _read(sf_dir, "events", columns=["user_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    n_parts = _n_blocks()
    span_us = days * 86_400_000_000

    def _bucket(key_col):
        def add(t: pa.Table) -> pa.Table:
            h = pc.bit_wise_and(
                pc.multiply(
                    pc.cast(t[key_col], pa.int64()), pa.scalar(2654435761, pa.int64())
                ),
                pa.scalar(0x7FFFFFFF, pa.int64()),
            )
            return t.append_column(
                "part",
                pc.cast(
                    pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)),
                    pa.int32(),
                ),
            )
        return add

    def tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": t["part"],
                "user": pc.cast(t["user_id"], pa.int64()),
                "t": pc.cast(t["ts"], pa.int64()),
                "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "okey": pa.nulls(t.num_rows, pa.int64()),
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        lo = pc.cast(t["o_orderdate"], pa.int64())
        user = pc.cast(t["o_custkey"], pa.int64())
        n = t.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "part": t["part"],
                        "user": user,
                        "t": lo,
                        "kind": pa.array(np.full(n, -1, np.int8), pa.int8()),
                        "okey": pc.cast(t["o_orderkey"], pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "part": t["part"],
                        "user": user,
                        "t": pc.add(lo, pa.scalar(span_us, pa.int64())),
                        "kind": pa.array(np.ones(n, np.int8), pa.int8()),
                        "okey": pc.cast(t["o_orderkey"], pa.int64()),
                    }
                ),
            ]
        )

    tagged = events.map_batches(_bucket("user_id"), batch_format="pyarrow").map_batches(
        tag_events, batch_format="pyarrow"
    ).union(
        orders.map_batches(_bucket("o_custkey"), batch_format="pyarrow").map_batches(
            tag_orders, batch_format="pyarrow"
        )
    )

    _SWEEP_EMPTY = pa.table(
        {"o_orderkey": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )

    def sweep(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        if t.num_rows == 0:
            return _SWEEP_EMPTY
        user = t["user"].to_numpy(zero_copy_only=False)
        ts = t["t"].to_numpy(zero_copy_only=False)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        order = np.lexsort((kind, ts, user))
        user, ts, kind = user[order], ts[order], kind[order]
        # events carry a null okey; fill before to_numpy or the array
        # silently goes float64/NaN
        okey = pc.fill_null(t["okey"], 0).to_numpy(zero_copy_only=False)[order]
        cum = np.cumsum(kind == 0)
        # reset per user: subtract the cumulative count at user start
        change = np.concatenate(([True], user[1:] != user[:-1]))
        starts = np.flatnonzero(change)
        base_at_start = np.where(starts > 0, cum[starts - 1], 0)
        base = np.repeat(base_at_start, np.diff(np.append(starts, len(user))))
        c = cum - base
        lo = kind == -1
        hi = kind == 1
        # at a lo marker cumsum excludes same-ts events (markers sort
        # first) -> C(t < lo); at a hi marker it includes them -> C(t <= hi)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    np.concatenate((okey[lo], okey[hi])), pa.int64()
                ),
                "c": pa.array(
                    np.concatenate((-c[lo], c[hi])).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        bucketed_agg(
            tagged.groupby("part").map_groups(sweep, batch_format="pyarrow"),
            ["o_orderkey"],
            [("c", "sum", "n_events")],
        ).sort("o_orderkey")
    )


ORDER_WINDOW_EVENT_COUNTS_SQL = f"""
SELECT o.o_orderkey, CAST(count(e.ts) AS BIGINT) AS n_events
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts <= o.o_orderdate + INTERVAL {ORDER_WINDOW_DAYS} DAY
GROUP BY o.o_orderkey
ORDER BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Customer order totals (LEFT OUTER partitioned join)
# ---------------------------------------------------------------------------

def customer_order_totals(sf_dir: str):
    """Every customer with order count and revenue — zero rows kept
    (the LEFT OUTER member of the join family: inner =
    order_revenue_by_nation, anti = customers_without_orders, as-of =
    events_asof_orders, interval = order_window_event_counts, full
    outer = user_activity_360).  The orders side pre-aggregates per
    custkey BELOW the join (bucketed fold), so the outer join ships
    one row per customer per side; null fills use pc.fill_null AFTER
    the join (or_kleene discipline not needed — no boolean masks)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def slim(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"o_custkey": t["o_custkey"], "cents": _to_cents(t["o_totalprice"])}
            ),
            ["o_custkey"],
        ).aggregate([("cents", "sum"), ([], "count_all")])
        return pa.table(
            {
                "o_custkey": g["o_custkey"],
                "cents": g["cents_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_cust = bucketed_agg(
        orders.map_batches(slim, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "sum", "cents"), ("n", "sum", "n")],
    )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    joined = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=_join_partitions(
            f"{sf_dir}/customer.parquet", f"{sf_dir}/orders.parquet"
        ),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        if t.num_rows == 0 or "c_custkey" not in cols:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "n_orders": pc.fill_null(t["n"], 0),
                "revenue_cents": pc.fill_null(t["cents"], 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("c_custkey")


CUSTOMER_ORDER_TOTALS_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(count(o.o_custkey) AS BIGINT) AS n_orders,
       CAST(coalesce(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY c.c_custkey
"""


# ---------------------------------------------------------------------------
# Rolling ROWS-frame window: trailing-3-event sum per user
# ---------------------------------------------------------------------------

ROLLING_N = 3


def user_rolling3_sum(sf_dir: str, n: int = ROLLING_N):
    """Per event: the sum of this and the previous n-1 events' values
    for the same user — the bounded ROWS-frame window (``ROWS BETWEEN
    n-1 PRECEDING AND CURRENT ROW``), completing the frame family
    next to cumulative (UNBOUNDED PRECEDING), lag/lead, and the
    day-RANGE sliding windows.

    Same plan as user_cumulative_value: one hash-bucket shuffle of
    user_id, one sorted pandas pass per PARTITION; the rolling sum is
    cumsum(x) - shift(cumsum(x), n) with per-user edge repair — a
    segment kernel, never per-user Python.  Order on (ts, event_id)
    so equal timestamps cannot make the frame nondeterministic;
    values roll in integer cents."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": _to_cents(t["value"]),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = g["cents"].to_numpy()
        users = g["user_id"].to_numpy()
        cs = np.cumsum(cents)
        # frame base across user boundaries and short prefixes: position
        # within the user's run, clipped at n, defines the true frame
        change = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.flatnonzero(change)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(users))))
        pos = np.arange(len(users)) - run_start  # 0-based within user
        frame = np.minimum(pos + 1, n)
        lo = np.arange(len(users)) - frame  # index before frame start
        base = np.where(lo >= 0, cs[np.maximum(lo, 0)], 0)
        roll = cs - base
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": users,
                "roll3_cents": roll.astype(np.int64),
                "n_in_frame": frame.astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("event_id")
    )


USER_ROLLING3_SUM_SQL = f"""
SELECT event_id, user_id,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll3_cents,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_in_frame
FROM (
  SELECT event_id, user_id, ts,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
)
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Grouped top-k at key-per-row cardinality (per-user top events)
# ---------------------------------------------------------------------------

GROUP_TOP_K = 3


def user_top3_events(sf_dir: str, k: int = GROUP_TOP_K):
    """Each user's top-k events by value — grouped top-k where the
    GROUP KEY grows with the data (users), the shape Ray's
    groupby.map_groups pays per-group Python for and a global sort
    wastes a full shuffle on.  Plan: hash-bucket the user key once
    (the sessionize plan), then ONE lexsort per partition; group
    boundaries fall out of a neighbor-compare and rank-within-run is
    index arithmetic — per-PARTITION vectorized work, rows leaving
    each partition bounded by k per user.  Ties: (cents DESC,
    event_id ASC), fully deterministic."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "cents": _to_cents(t["value"]),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def topk_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        users = t["user_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        eids = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eids, -cents, users))
        users, cents, eids = users[order], cents[order], eids[order]
        change = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.flatnonzero(change)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(users))))
        rank = np.arange(len(users)) - run_start + 1
        keep = rank <= k
        return pa.table(
            {
                "user_id": pa.array(users[keep], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "event_id": pa.array(eids[keep], pa.int64()),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_part, batch_format="pyarrow")
        .sort(["user_id", "rank"])
    )


USER_TOP3_EVENTS_SQL = f"""
SELECT user_id, CAST(rk AS BIGINT) AS rank, event_id, cents
FROM (
  SELECT user_id, event_id, cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY cents DESC, event_id) AS rk
  FROM (
    SELECT event_id, user_id,
           CAST(round(value * 100.0) AS BIGINT) AS cents
    FROM events
  )
)
WHERE rk <= {GROUP_TOP_K}
ORDER BY user_id, rank
"""


# ---------------------------------------------------------------------------
# Global ordered running aggregate (prefix-max record breakers)
# ---------------------------------------------------------------------------

RECORD_FOLD_BUDGET = 100_000


def order_date_records(sf_dir: str):
    """Record-breaking orders: every order whose o_orderdate strictly
    exceeds ALL earlier orders' dates in o_orderkey (arrival) order —
    the GLOBAL ordered running-aggregate shape (a watermark / late-data
    audit), which a naive plan answers with a total-order sort.

    No sort and no row shuffle: a global record-breaker is necessarily
    a record-breaker WITHIN any batch that contains it (the batch holds
    a subset of its predecessors), so one map_batches pass emits
    per-batch candidates — expected O(ln B) rows per batch under
    exchangeable arrival order, ~ln(10^12) ≈ 28 survivors overall — and
    the driver resolves the exact prefix-max over that tiny set.  The
    fold is idempotent, so adversarial arrival orders (each batch
    internally date-ascending) degrade gracefully: re-fold the
    candidate set through coarser batches until it fits the driver
    budget instead of ever collecting an unbounded table."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def record_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                }
            )
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        d = t["o_orderdate"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="mergesort")
        k, d = k[order], d[order]
        cm = np.maximum.accumulate(d)
        keep = np.concatenate(([True], d[1:] > cm[:-1]))
        return pa.table(
            {
                "o_orderkey": pa.array(k[keep].astype("int64")),
                "o_orderdate": pa.array(d[keep].astype("datetime64[us]")),
            }
        )

    cands = ds.map_batches(record_partial, batch_format="pyarrow").materialize()
    while cands.count() > RECORD_FOLD_BUDGET:
        before = cands.num_blocks()
        cands = (
            cands.repartition(max(1, before // 8))
            .map_batches(record_partial, batch_format="pyarrow")
            .materialize()
        )
        if cands.num_blocks() >= before:  # can't shrink further
            break

    pdf = cands.to_pandas().sort_values("o_orderkey")
    if len(pdf) == 0:
        return pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
            }
        )
    d = pdf["o_orderdate"].to_numpy()
    cm = np.maximum.accumulate(d)
    keep = np.concatenate(([True], d[1:] > cm[:-1]))
    return pa.table(
        {
            "o_orderkey": pa.array(
                pdf["o_orderkey"].to_numpy()[keep].astype("int64")
            ),
            "o_orderdate": pa.array(d[keep].astype("datetime64[us]")),
        }
    )


ORDER_DATE_RECORDS_SQL = """
SELECT o_orderkey, o_orderdate
FROM (
  SELECT o_orderkey, o_orderdate,
         max(o_orderdate) OVER (ORDER BY o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max
  FROM orders
)
WHERE prev_max IS NULL OR o_orderdate > prev_max
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Deep star join with a locality twist (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_START = "1998-01-01"
Q5_END = "2001-01-01"


Q5_BROADCAST_LIMIT = 1_000_000


def q5_local_supplier(sf_dir: str, broadcast_limit: int = None):
    """Local-supplier revenue by nation (TPC-H Q5 shape): the deepest
    star join in the surface — lineitem ⋈ orders ⋈ customer ⋈ supplier
    ⋈ nation ⋈ region with the c_nationkey = s_nationkey locality
    twist.  Join-size discipline (the chained-join deadlock and
    empty-schema-block traps make ONE fact-fact join the budget):
    - region ⋈ nation collapses on the driver to a broadcast
      nationkey → n_name map for the chosen region (≤5 rows);
    - customer and supplier are column-slimmed to key → nationkey maps
      broadcast once via ray.put (suppliers are genuinely small; the
      customer map grows with the data — above a broadcast budget that
      side escalates to a second partitioned join on custkey, the
      customer_order_totals shape, materialized between joins);
    - orders filters its date window and attaches c_nationkey per
      batch (pc.index_in lookup, dropping non-region customers);
      lineitem attaches s_nationkey the same way — so the ONE
      partitioned hash join (orderkey) ships nothing but ints;
    - the locality predicate (c_nat == s_nat) runs vectorized
      post-join, and revenue pre-aggregates per batch into a ≤25-row
      nation partial BEFORE the final tiny groupby: the all-to-all
      carries nations, never lineitems."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = region.filter(pc.equal(region["r_name"], Q5_REGION))[
        "r_regionkey"
    ].combine_chunks()
    nat = nation.filter(pc.is_in(nation["n_regionkey"], value_set=rkeys))
    nat_keys = nat["n_nationkey"].combine_chunks()
    nat_dim = pa.table(
        {"nationkey": nat_keys, "n_name": nat["n_name"].combine_chunks()}
    )

    limit = Q5_BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_tab = cust.filter(
        pc.is_in(cust["c_nationkey"], value_set=nat_keys)
    ).combine_chunks()
    cust_ref = state.broadcast(cust_tab) if cust_tab.num_rows <= limit else None
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_ref = state.broadcast(
        supp.filter(pc.is_in(supp["s_nationkey"], value_set=nat_keys)).combine_chunks()
    )

    start = pa.scalar(pd.Timestamp(Q5_START), type=pa.timestamp("us"))
    end = pa.scalar(pd.Timestamp(Q5_END), type=pa.timestamp("us"))
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def filt_orders(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], start),
                pc.less(t["o_orderdate"], end),
            )
        ).select(["o_orderkey", "o_custkey"])

    def prep_orders(t: pa.Table) -> pa.Table:
        t = filt_orders(t)
        t = state.lookup_join(
            t, "o_custkey", state.cached_get(cust_ref), "c_custkey", ["c_nationkey"]
        )
        t = t.filter(pc.is_valid(t["c_nationkey"]))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_nat": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    if cust_ref is not None:
        orders_nat = orders.map_batches(prep_orders, batch_format="pyarrow")
    else:
        # Above-budget escalation: the customer map no longer fits a
        # broadcast, so attach c_nationkey with a partitioned hash join
        # on custkey instead, materialized before the fact-fact join
        # (the chained-join deadlock trap, CLAUDE.md).
        cust_ds = ray.data.from_arrow(cust_tab).repartition(_n_blocks())

        def cjoin_out(t: pa.Table) -> pa.Table:
            cols = set(t.column_names)
            if t.num_rows == 0 or "o_orderkey" not in cols:
                return pa.table(
                    {
                        "o_orderkey": pa.array([], pa.int64()),
                        "c_nat": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "c_nat": pc.cast(t["c_nationkey"], pa.int64()),
                }
            )

        orders_nat = (
            orders.map_batches(filt_orders, batch_format="pyarrow")
            .join(
                cust_ds,
                join_type="inner",
                num_partitions=_join_partitions(f"{sf_dir}/orders.parquet"),
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
            .map_batches(cjoin_out, batch_format="pyarrow")
            .materialize()
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def prep_li(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "l_suppkey", state.cached_get(supp_ref), "s_suppkey", ["s_nationkey"]
        )
        t = t.filter(pc.is_valid(t["s_nationkey"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
                "disc_cents": _to_cents(
                    pc.multiply(
                        t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                    )
                ),
            }
        )

    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = li.map_batches(prep_li, batch_format="pyarrow").join(
        orders_nat,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def local_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_nat"], t["s_nat"]))
        if t.num_rows == 0:
            return pa.table(
                {
                    "nationkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            pa.table({"nationkey": t["s_nat"], "c": t["disc_cents"]}), ["nationkey"]
        ).aggregate([("c", "sum")])
        return pa.table(
            {
                "nationkey": g["nationkey"],
                "revenue_cents": pc.cast(g["c_sum"], pa.int64()),
            }
        )

    nat_ref = state.broadcast(nat_dim)

    def attach_name(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "nationkey", state.cached_get(nat_ref), "nationkey", ["n_name"]
        )
        return t.select(["n_name", "revenue_cents"])

    agg = (
        joined.map_batches(local_partial, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    return (
        agg.map_batches(attach_name, batch_format="pyarrow")
        .sort(["revenue_cents", "n_name"], descending=[True, False])
    )


Q5_LOCAL_SUPPLIER_SQL = f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o.o_orderdate < TIMESTAMP '{Q5_END}'
GROUP BY n.n_name
ORDER BY revenue_cents DESC, n.n_name
"""


# ---------------------------------------------------------------------------
# Cumulative distinct cardinality over time (new-vs-returning audience)
# ---------------------------------------------------------------------------

def cumulative_unique_users(sf_dir: str):
    """Cumulative distinct users by day — the growth-curve metric every
    web pipeline reports, and the canonical "running COUNT(DISTINCT)"
    a naive plan answers with a per-day re-scan.

    Decomposition: cumulative distinct at day d = |{users whose FIRST
    day <= d}|.  So (1) the user-cardinality step (min day per user) is
    a key-per-row aggregate routed through bucketed_minmax — the
    CLAUDE.md-mandated shuffle shape, partials combined per batch so
    the exchange carries one row per (user, batch); (2) first days
    collapse to a new-users-per-day table bounded by the DAY DOMAIN;
    (3) the driver finishes with one vectorized prefix sum evaluated at
    each observed event day (np.searchsorted over ~days rows).  Two
    column-pruned passes over the stream, no full materialization, and
    driver state is calendar-bounded forever."""
    from document_extractor_ray.functions.bucketing import bucketed_minmax

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
            }
        )

    first_day = bucketed_minmax(
        _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["user_id"],
        "day",
        "min",
    )

    def new_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"day": t["day"]}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    new_per_day = (
        first_day.map_batches(new_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )

    def day_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {"day": pc.unique(pc.floor_temporal(t["ts"], unit="day"))}
        )

    days = (
        _read(sf_dir, "events", columns=["ts"])
        .map_batches(day_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )

    nd = np.sort(new_per_day["day"].to_numpy().astype("datetime64[us]"))
    order = np.argsort(new_per_day["day"].to_numpy().astype("datetime64[us]"))
    counts = new_per_day["n"].to_numpy().astype("int64")[order]
    csum = np.cumsum(counts)
    obs = np.sort(days["day"].to_numpy().astype("datetime64[us]"))
    pos = np.searchsorted(nd, obs, side="right")
    cum = np.where(pos > 0, csum[np.maximum(pos - 1, 0)], 0)
    return pa.table(
        {
            "day": pa.array(obs, pa.timestamp("us")),
            "cum_users": pa.array(cum.astype("int64")),
        }
    )


CUMULATIVE_UNIQUE_USERS_SQL = """
WITH fd AS (
  SELECT user_id, min(date_trunc('day', ts)) AS d FROM events GROUP BY user_id
),
days AS (
  SELECT DISTINCT date_trunc('day', ts) AS day FROM events
)
SELECT days.day, CAST(count(fd.user_id) AS BIGINT) AS cum_users
FROM days LEFT JOIN fd ON fd.d <= days.day
GROUP BY days.day
ORDER BY days.day
"""


# ---------------------------------------------------------------------------
# Single-pass multi-column table profiling (ingest audit)
# ---------------------------------------------------------------------------

def table_profile(sf_dir: str):
    """Per-column ingest profile of the events stream — row count, null
    count, canonical min/max — in ONE pass: the schema-audit every
    ingest job runs before committing a 100 TB load.

    Each batch emits a 6-row partial (one per column) carrying counts
    plus native-typed extrema; extrema are canonicalized to int64
    (epoch-micros for timestamps, cents for doubles — rounding is
    monotone, so it commutes with min/max) or kept as strings for text
    columns, because canonical-STRING merging would order "9" > "10".
    Partials are block-bounded (6 rows per batch), so the final merge
    is a tiny vectorized groupby — never a second scan, never
    driver-side row iteration over data."""
    cols_int = ["event_id", "user_id"]
    cols_str = ["event_type", "props"]

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []

        def push(name, mn_i, mx_i, mn_s, mx_s):
            col = t[name]
            names.append(name)
            ns.append(t.num_rows)
            nulls.append(col.null_count)
            mins_i.append(mn_i)
            maxs_i.append(mx_i)
            mins_s.append(mn_s)
            maxs_s.append(mx_s)

        for name in cols_int:
            mm = pc.min_max(t[name])
            push(name, mm["min"].as_py(), mm["max"].as_py(), None, None)
        mm = pc.min_max(t["ts"])
        to_us = lambda s: None if s.as_py() is None else pd.Timestamp(s.as_py()).value // 1000
        push("ts", to_us(mm["min"]), to_us(mm["max"]), None, None)
        mm = pc.min_max(t["value"])
        cents = lambda s: None if s.as_py() is None else int(
            pc.round(pa.scalar(s.as_py() * 100.0), ndigits=0,
                     round_mode="half_towards_infinity").as_py()
        )
        push("value", cents(mm["min"]), cents(mm["max"]), None, None)
        for name in cols_str:
            mm = pc.min_max(t[name])
            push(name, None, None, mm["min"].as_py(), mm["max"].as_py())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "min_i": pa.array(mins_i, pa.int64()),
                "max_i": pa.array(maxs_i, pa.int64()),
                "min_str": pa.array(mins_s, pa.string()),
                "max_str": pa.array(maxs_s, pa.string()),
            }
        )

    parts = (
        _read(sf_dir, "events")
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    g = parts.groupby("col", sort=True)
    merged = pd.DataFrame(
        {
            "n_rows": g["n"].sum(),
            "n_nulls": g["nulls"].sum(),
            "min_i": g["min_i"].min(),
            "max_i": g["max_i"].max(),
            "min_str": g["min_str"].min(),
            "max_str": g["max_str"].max(),
        }
    ).reset_index()
    is_num = merged["min_i"].notna()
    min_s = np.where(
        is_num, merged["min_i"].map(lambda v: "" if pd.isna(v) else str(int(v))),
        merged["min_str"].fillna(""),
    )
    max_s = np.where(
        is_num, merged["max_i"].map(lambda v: "" if pd.isna(v) else str(int(v))),
        merged["max_str"].fillna(""),
    )
    return pa.table(
        {
            "col": pa.array(merged["col"].to_numpy(), pa.string()),
            "n_rows": pa.array(merged["n_rows"].to_numpy().astype("int64")),
            "n_nulls": pa.array(merged["n_nulls"].to_numpy().astype("int64")),
            "min_s": pa.array(min_s, pa.string()),
            "max_s": pa.array(max_s, pa.string()),
        }
    )


TABLE_PROFILE_SQL = """
SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS n_nulls,
       CAST(min(event_id) AS VARCHAR) AS min_s,
       CAST(max(event_id) AS VARCHAR) AS max_s FROM events
UNION ALL
SELECT 'user_id', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(user_id) AS BIGINT),
       CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR) FROM events
UNION ALL
SELECT 'ts', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(ts) AS BIGINT),
       CAST(epoch_us(min(ts)) AS VARCHAR), CAST(epoch_us(max(ts)) AS VARCHAR)
FROM events
UNION ALL
SELECT 'value', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(value) AS BIGINT),
       CAST(CAST(round(min(value) * 100.0) AS BIGINT) AS VARCHAR),
       CAST(CAST(round(max(value) * 100.0) AS BIGINT) AS VARCHAR) FROM events
UNION ALL
SELECT 'event_type', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(event_type) AS BIGINT),
       min(event_type), max(event_type) FROM events
UNION ALL
SELECT 'props', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(props) AS BIGINT),
       min(props), max(props) FROM events
ORDER BY col
"""


# ---------------------------------------------------------------------------
# Correlated-subquery shape: detail rows filtered against their group's mean
# ---------------------------------------------------------------------------

def orders_above_customer_avg(sf_dir: str):
    """Orders whose value exceeds 1.5x their OWN customer's average —
    the correlated-subquery shape (TPC-H Q17/Q22 family): aggregate a
    group statistic, join it BACK to the detail rows, filter each row
    against its group.  The per-customer (sum, count) folds through
    bucketed_agg below the join (key-per-row custkey cardinality), so
    the ONE partitioned join ships one stat row per customer against
    slim (orderkey, custkey, cents) facts; the 1.5x-average predicate
    is the integer cross-multiplication 2*cents*cnt > 3*tot — the
    "average" never exists as a float anywhere."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def stat_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"o_custkey": t["o_custkey"], "cents": _to_cents(t["o_totalprice"])}
            ),
            ["o_custkey"],
        ).aggregate([("cents", "sum"), ([], "count_all")])
        return pa.table(
            {
                "cust": g["o_custkey"],
                "tot": g["cents_sum"],
                "cnt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_cust = bucketed_agg(
        orders.map_batches(stat_partial, batch_format="pyarrow"),
        ["cust"],
        [("tot", "sum", "tot"), ("cnt", "sum", "cnt")],
    )

    def fact_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _to_cents(t["o_totalprice"]),
            }
        )

    joined = orders.map_batches(fact_slim, batch_format="pyarrow").join(
        per_cust,
        join_type="inner",
        num_partitions=_join_partitions(f"{sf_dir}/orders.parquet"),
        on=("o_custkey",),
        right_on=("cust",),
    )

    def above(t: pa.Table) -> pa.Table:
        keep = pc.greater(
            pc.multiply(pc.multiply(pa.scalar(2, pa.int64()), t["cents"]), t["cnt"]),
            pc.multiply(pa.scalar(3, pa.int64()), t["tot"]),
        )
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey", "cents"])

    return joined.map_batches(above, batch_format="pyarrow").sort("o_orderkey")


ORDERS_ABOVE_CUSTOMER_AVG_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents
FROM orders o
JOIN per_cust p ON p.o_custkey = o.o_custkey
WHERE 2 * CAST(round(o.o_totalprice * 100.0) AS BIGINT) * p.cnt > 3 * p.tot
ORDER BY o.o_orderkey
"""


# ---------------------------------------------------------------------------
# Bilateral-pair revenue by year (TPC-H Q7 shape)
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_18"
Q7_NATION_B = "NATION_19"


def q7_volume_shipping(sf_dir: str):
    """Bilateral trade volume between two nations by ship year (TPC-H
    Q7 shape): the DISJUNCTIVE join predicate — (supp=A AND cust=B) OR
    (supp=B AND cust=A) — that a join engine cannot push into a single
    equi-key.  Push it as set-membership instead: customer and supplier
    are pre-filtered to the two nations while being slimmed to
    broadcast key→nationkey maps, so after the ONE partitioned
    orderkey join the disjunction collapses to s_nat != c_nat.  Revenue
    pre-aggregates per batch into (s_nat, c_nat, year) partials — a
    2 x years domain — before the tiny final groupby; names attach
    from a 2-row broadcast at the end."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nat = nation.filter(
        pc.is_in(
            nation["n_name"],
            value_set=pa.array([Q7_NATION_A, Q7_NATION_B]),
        )
    )
    nat_keys = nat["n_nationkey"].combine_chunks()
    nat_dim = pa.table(
        {"natkey": nat_keys, "n_name": nat["n_name"].combine_chunks()}
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_ref = state.broadcast(
        cust.filter(pc.is_in(cust["c_nationkey"], value_set=nat_keys)).combine_chunks()
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_ref = state.broadcast(
        supp.filter(pc.is_in(supp["s_nationkey"], value_set=nat_keys)).combine_chunks()
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def prep_orders(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "o_custkey", state.cached_get(cust_ref), "c_custkey", ["c_nationkey"]
        )
        t = t.filter(pc.is_valid(t["c_nationkey"]))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_nat": pc.cast(t["c_nationkey"], pa.int64()),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def prep_li(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "l_suppkey", state.cached_get(supp_ref), "s_suppkey", ["s_nationkey"]
        )
        t = t.filter(pc.is_valid(t["s_nationkey"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "s_nat": pc.cast(t["s_nationkey"], pa.int64()),
                "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "disc_cents": _to_cents(
                    pc.multiply(
                        t["l_extendedprice"], pc.subtract(1.0, t["l_discount"])
                    )
                ),
            }
        )

    joined = li.map_batches(prep_li, batch_format="pyarrow").join(
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
        ),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["s_nat"], t["c_nat"]))
        if t.num_rows == 0:
            return pa.table(
                {
                    "s_nat": pa.array([], pa.int64()),
                    "c_nat": pa.array([], pa.int64()),
                    "l_year": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            t.select(["s_nat", "c_nat", "l_year", "disc_cents"]),
            ["s_nat", "c_nat", "l_year"],
        ).aggregate([("disc_cents", "sum")])
        return pa.table(
            {
                "s_nat": g["s_nat"],
                "c_nat": g["c_nat"],
                "l_year": g["l_year"],
                "revenue_cents": pc.cast(g["disc_cents_sum"], pa.int64()),
            }
        )

    nat_ref = state.broadcast(nat_dim)

    def attach_names(t: pa.Table) -> pa.Table:
        dim = state.cached_get(nat_ref)
        sup = pc.take(
            dim["n_name"].combine_chunks(),
            pc.index_in(t["s_nat"], value_set=dim["natkey"].combine_chunks()),
        )
        cus = pc.take(
            dim["n_name"].combine_chunks(),
            pc.index_in(t["c_nat"], value_set=dim["natkey"].combine_chunks()),
        )
        return pa.table(
            {
                "supp_nation": sup,
                "cust_nation": cus,
                "l_year": t["l_year"],
                "revenue_cents": t["revenue_cents"],
            }
        )

    return (
        joined.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["s_nat", "c_nat", "l_year"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .map_batches(attach_names, batch_format="pyarrow")
        .sort(["supp_nation", "cust_nation", "l_year"])
    )


Q7_VOLUME_SHIPPING_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
   OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Ratio-to-report (share-of-total) aggregate
# ---------------------------------------------------------------------------

def nation_revenue_share(sf_dir: str):
    """Revenue by customer nation plus each nation's permille share of
    the grand total — the ratio-to-report window shape (sum OVER ()).
    One streamed pass: orders attach their customer's nationkey from a
    broadcast key→nation map and pre-aggregate per batch into ≤25-row
    nation partials; the final groupby and the grand-total division are
    driver work on a 25-row table.  Shares are integer permille
    (rev*1000 // total, floor division both engines) so no float ratio
    ever exists."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_ref = state.broadcast(cust.combine_chunks())

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def nat_partial(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "o_custkey", state.cached_get(cust_ref), "c_custkey", ["c_nationkey"]
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "natkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["natkey"],
        ).aggregate([("cents", "sum")])
        return pa.table(
            {"natkey": g["natkey"], "revenue_cents": pc.cast(g["cents_sum"], pa.int64())}
        )

    per_nat = (
        orders.map_batches(nat_partial, batch_format="pyarrow")
        .groupby("natkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    total = int(per_nat["revenue_cents"].sum())
    name_of = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    per_nat["n_name"] = per_nat["natkey"].map(name_of)
    per_nat["share_permille"] = (
        per_nat["revenue_cents"].astype(object) * 1000 // total
    ).astype("int64")
    per_nat = per_nat.sort_values(
        ["revenue_cents", "n_name"], ascending=[False, True]
    )
    return pa.table(
        {
            "n_name": pa.array(per_nat["n_name"].to_numpy(), pa.string()),
            "revenue_cents": pa.array(
                per_nat["revenue_cents"].to_numpy().astype("int64")
            ),
            "share_permille": pa.array(
                per_nat["share_permille"].to_numpy().astype("int64")
            ),
        }
    )


NATION_REVENUE_SHARE_SQL = """
WITH nr AS (
  SELECT n.n_name,
         CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name
)
SELECT n_name, revenue_cents,
       CAST(revenue_cents * 1000 // (SELECT sum(revenue_cents) FROM nr)
            AS BIGINT) AS share_permille
FROM nr
ORDER BY revenue_cents DESC, n_name
"""


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (priority top-k, integer-exact)
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 100


def weighted_sample_docs(sf_dir: str, k: int = WEIGHTED_SAMPLE_K):
    """Deterministic weighted sample of k documents, longer docs
    favored ∝ n_chars — the priority-sampling shape (Efraimidis-
    Spirakis family) with an INTEGER-EXACT priority key both engines
    order identically: skey = (fmix64(doc_id) mod 2^32) * 2^31 //
    n_chars (floor), ties broken by doc_id.  The avalanche hash gives
    each doc a reproducible uniform draw; dividing by the weight makes
    heavy docs win the k smallest keys proportionally.  Maximum value
    (2^32-1)*2^31 < 2^63, so the key never leaves int64.

    Scale shape: one vectorized pass computes keys and each batch
    emits only its k smallest rows (np.argpartition, no full sort), so
    the driver merge sees ≤ k x blocks rows — never the corpus."""
    from document_extractor_ray.functions.textstats import _read_docs

    ds = _read_docs(sf_dir, ["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h32 = _hll_hash(u) & np.uint64(0xFFFFFFFF)
        skey = ((h32 << np.uint64(31)) // w).astype(np.int64)
        if len(skey) > k:
            idx = np.argpartition(skey, k)[:k]
        else:
            idx = np.arange(len(skey))
        return pa.table(
            {
                "doc_id": pa.array(u[idx].astype("int64")),
                "n_chars": pa.array(w[idx].astype("int64")),
                "skey": pa.array(skey[idx]),
            }
        )

    parts = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["skey", "doc_id"], kind="mergesort")
        .head(k)
    )
    return pa.table(
        {
            "doc_id": pa.array(parts["doc_id"].to_numpy().astype("int64")),
            "n_chars": pa.array(parts["n_chars"].to_numpy().astype("int64")),
            "skey": pa.array(parts["skey"].to_numpy().astype("int64")),
        }
    )


def _weighted_sample_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    return f"""
WITH h0 AS (
  SELECT doc_id, n_chars,
         (doc_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM documents
),
h1 AS (SELECT doc_id, n_chars, {xs33('h')} AS h FROM h0),
h2 AS (SELECT doc_id, n_chars, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT doc_id, n_chars, {xs33('h')} AS h FROM h2),
h4 AS (SELECT doc_id, n_chars, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT doc_id, n_chars, {xs33('h')} AS h FROM h4)
SELECT doc_id, n_chars,
       CAST((h % {two32}) * {1 << 31} // n_chars AS BIGINT) AS skey
FROM h5
ORDER BY skey, doc_id
LIMIT {WEIGHTED_SAMPLE_K}
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


# ---------------------------------------------------------------------------
# One-pass statistical resampling (deterministic bootstrap replicas)
# ---------------------------------------------------------------------------

BOOTSTRAP_B = 32


def bootstrap_replicas(sf_dir: str, B: int = BOOTSTRAP_B):
    """B deterministic half-sample replicas of the event-value total —
    the one-pass resampling shape behind bootstrap/jackknife error
    bars on any streamed metric.  Replica b keeps event e iff bit b of
    fmix64(event_id)'s low 32 bits is 0 (an unbiased deterministic
    coin both engines can flip), so ONE pass computes all B masked
    (sum, count) pairs: the per-batch kernel is a (rows x B) bit
    matrix followed by a single matmul against the cents vector — B
    partial rows leave each batch, the final groupby is B rows total.
    The CI math (std of replica means) is driver arithmetic on exact
    integers; no float ever crosses an engine boundary."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h32 = (_hll_hash(u) & np.uint64(0xFFFFFFFF)).astype(np.int64)
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        bits = ((h32[:, None] >> np.arange(B, dtype=np.int64)) & 1) == 0
        sums = bits.T @ cents
        cnts = bits.sum(axis=0)
        return pa.table(
            {
                "replica": pa.array(np.arange(B, dtype=np.int64)),
                "n": pa.array(cnts.astype("int64")),
                "sum_cents": pa.array(sums.astype("int64")),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("replica")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
        .sort("replica")
    )


def _bootstrap_replicas_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    return f"""
WITH h0 AS (
  SELECT event_id, value,
         (event_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM events
),
h1 AS (SELECT event_id, value, {xs33('h')} AS h FROM h0),
h2 AS (SELECT event_id, value, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT event_id, value, {xs33('h')} AS h FROM h2),
h4 AS (SELECT event_id, value, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT event_id, value, {xs33('h')} AS h FROM h4),
h6 AS (SELECT event_id, value, CAST(h % {two32} AS BIGINT) AS h32 FROM h5)
SELECT g.b AS replica,
       CAST(count(*) FILTER (((h6.h32 >> g.b) & 1) = 0) AS BIGINT) AS n,
       CAST(sum(CAST(round(h6.value * 100.0) AS BIGINT))
            FILTER (((h6.h32 >> g.b) & 1) = 0) AS BIGINT) AS sum_cents
FROM h6 CROSS JOIN generate_series(0, {BOOTSTRAP_B - 1}) AS g(b)
GROUP BY g.b
ORDER BY replica
"""


BOOTSTRAP_REPLICAS_SQL = _bootstrap_replicas_sql()


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders (HAVING over a fact-key groupby)
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 250
Q18_TOP = 100


def _settle_nonempty(ds: "ray.data.Dataset", empty: pa.Table) -> "ray.data.Dataset":
    """Rebuild a Dataset from its non-empty block refs before feeding a
    Dataset.join — Ray 2.49 hash aggregates / map_groups / join outputs
    carry zero-row blocks with an EMPTY schema that crash a downstream
    pyarrow join ('no match for FieldRef'), and map_batches never sees
    zero-row blocks so a normalizing UDF can't fix them (the dedup.py
    settle pattern, hoisted for the analytics join family)."""
    mat = ds.materialize()
    refs = [r for r in mat.to_arrow_refs() if ray.get(r).num_rows > 0]
    if not refs:
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)


def q18_large_orders(
    sf_dir: str,
    threshold: int = Q18_QTY_THRESHOLD,
    broadcast_limit: int = 200_000,
):
    """Large-volume orders (TPC-H Q18 shape): orders whose summed
    lineitem quantity exceeds a threshold, with their customer — the
    canonical groupby-HAVING-join plan.  Scale shape: the per-orderkey
    quantity fold is key-per-row, so it runs through ``bucketed_agg``
    (never Ray's per-group aggregate); the HAVING filter collapses the
    fact side to the rare heavy orders BEFORE any join.  Below
    ``broadcast_limit`` survivors the orderkey→qty map broadcasts via
    ray.put and the orders scan attaches total_qty with a per-batch
    lookup (no first join at all — the q5 budget discipline, saving a
    full partitioned exchange; measured 4.2 s → with only the customer
    join left); above it, the original partitioned join runs.  Joins
    are settled + materialized between (empty-schema block and
    chained-join traps, CLAUDE.md)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "qty": pc.cast(
                    pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )

    per_order = bucketed_agg(
        li.map_batches(slim, batch_format="pyarrow"),
        ["l_orderkey"],
        [("qty", "sum", "total_qty")],
    )

    def having(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["total_qty"], threshold))

    big = _settle_nonempty(
        per_order.map_batches(having, batch_format="pyarrow"),
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "total_qty": pa.array([], pa.int64()),
            }
        ),
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    heavy_empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.timestamp("us")),
            "total_qty": pa.array([], pa.int64()),
        }
    )

    big_mat = big.materialize()
    n_big = big_mat.count()
    if n_big <= broadcast_limit:
        from document_extractor_ray import state

        big_tab = pa.concat_tables(
            [ray.get(r) for r in big_mat.to_arrow_refs()]
        ).combine_chunks()
        big_ref = state.broadcast(big_tab)

        def attach_qty(t: pa.Table) -> pa.Table:
            t = state.lookup_join(
                t, "o_orderkey", state.cached_get(big_ref), "l_orderkey", ["total_qty"]
            )
            t = t.filter(pc.is_valid(t["total_qty"]))
            return t.select(["o_orderkey", "o_custkey", "o_orderdate", "total_qty"])

        heavy = _settle_nonempty(
            orders.map_batches(attach_qty, batch_format="pyarrow"), heavy_empty
        )
    else:
        j1 = orders.join(
            big_mat,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/orders.parquet"),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        def j1_out(t: pa.Table) -> pa.Table:
            cols = set(t.column_names)
            if t.num_rows == 0 or "o_orderkey" not in cols:
                return heavy_empty
            t = _ts_us("o_orderdate")(t)
            return t.select(["o_orderkey", "o_custkey", "o_orderdate", "total_qty"])

        heavy = _settle_nonempty(
            j1.map_batches(j1_out, batch_format="pyarrow"), heavy_empty
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j2 = heavy.join(
        cust,
        join_type="inner",
        num_partitions=_join_partitions(f"{sf_dir}/customer.parquet"),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        if t.num_rows == 0 or "o_orderkey" not in cols:
            return pa.table(
                {
                    "c_custkey": pa.array([], pa.int64()),
                    "c_name": pa.array([], pa.string()),
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us")),
                    "total_qty": pa.array([], pa.int64()),
                }
            )
        t = _ts_us("o_orderdate")(t)
        # the hash join collapses the right key into the left key
        # column, so the customer key IS o_custkey post-join
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": t["c_name"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "total_qty": t["total_qty"],
            }
        )

    return (
        j2.map_batches(finish, batch_format="pyarrow")
        .sort(["total_qty", "o_orderkey"], descending=[True, False])
        .limit(Q18_TOP)
    )


Q18_LARGE_ORDERS_SQL = f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, lq.total_qty
FROM (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {Q18_QTY_THRESHOLD}
) lq
JOIN orders o ON o.o_orderkey = lq.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT {Q18_TOP}
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global-scalar subquery filter (above-average balances)
# ---------------------------------------------------------------------------

def q22_acctbal_opportunity(sf_dir: str):
    """Customers whose balance beats the GLOBAL average positive
    balance, counted per nation (TPC-H Q22's scalar-subquery shape).
    Two passes over a column-pruned customer table: pass 1 folds
    (sum positive cents, count positive) to two driver scalars — a
    per-batch partial then a bounded blocks-count take, never a row
    materialization; pass 2 broadcasts the scalars in the closure and
    compares CROSS-MULTIPLIED integers (cents * n_pos > total_cents),
    so no float average ever exists on either engine.  The final
    per-nation rollup is a ≤25-key groupby; nation names attach via a
    broadcast dim lookup, never a shuffle join."""
    from document_extractor_ray import state

    cust_cols = ["c_nationkey", "c_acctbal"]

    def pos_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], 0.0))
        cents = _to_cents(pos["c_acctbal"])
        return pa.table(
            {
                "s": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
                "n": pa.array([pos.num_rows], pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "customer", columns=["c_acctbal"])
        .map_batches(pos_partial, batch_format="pyarrow")
        .take_all()
    )
    total_cents = sum(r["s"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nat_ref = state.broadcast(nation)

    def rich_partial(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["c_acctbal"])
        keep = pc.greater(
            pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
            pa.scalar(total_cents, pa.int64()),
        )
        t = pa.table({"c_nationkey": t["c_nationkey"], "cents": cents}).filter(keep)
        g = pa.TableGroupBy(t, ["c_nationkey"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "c_nationkey": g["c_nationkey"],
                "balance_cents": g["cents_sum"],
                "n_cust": pc.cast(g["count_all"], pa.int64()),
            }
        )

    def attach(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "c_nationkey", state.cached_get(nat_ref), "n_nationkey", ["n_name"]
        )
        return pa.table(
            {
                "n_name": t["n_name"],
                "n_cust": t["n_cust"],
                "balance_cents": t["balance_cents"],
            }
        )

    return (
        _read(sf_dir, "customer", columns=cust_cols)
        .map_batches(rich_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("balance_cents", alias_name="balance_cents"),
            Sum("n_cust", alias_name="n_cust"),
        )
        .map_batches(attach, batch_format="pyarrow")
        .sort("n_name")
    )


Q22_ACCTBAL_OPPORTUNITY_SQL = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(CAST(round(c.c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS balance_cents
FROM customer c, pos, nation n
WHERE CAST(round(c.c_acctbal * 100.0) AS BIGINT) * pos.n_pos > pos.total_cents
  AND n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------

def user_streaks(sf_dir: str):
    """Longest consecutive-day active streak (and total active days)
    per user — the canonical gaps-and-islands window query.  Scale
    shape: per-batch LOCAL (user, day) dedup slims the exchange to
    unique pairs, ONE hash-bucket shuffle on user_id co-locates each
    user, and the per-PARTITION pass is a single lexsort + run-length
    arithmetic (np.reduceat over run boundaries) — no per-user Python,
    no window sort of raw events.  Days are integer epoch-day floor
    divisions of microseconds, identical on both engines."""
    from document_extractor_ray.functions.bucketing import part_of_int64

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = _n_blocks()
    day_us = np.int64(86_400_000_000)

    def local_days(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // day_us
        pairs = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "d": pa.array(pairs[:, 1], pa.int64()),
                "part": part_of_int64(pairs[:, 0], n_parts),
            }
        )

    def streaks_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_days": pa.array([], pa.int64()),
                "best_streak": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        pairs = np.unique(np.stack([u, d], axis=1), axis=0)
        u, d = pairs[:, 0], pairs[:, 1]
        # run boundaries: new user OR non-consecutive day
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1] + 1)
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, len(u)))
        run_user = u[starts]
        ub = np.ones(len(run_user), dtype=bool)
        ub[1:] = run_user[1:] != run_user[:-1]
        ustarts = np.flatnonzero(ub)
        return pa.table(
            {
                "user_id": pa.array(run_user[ustarts], pa.int64()),
                "n_days": pa.array(
                    np.add.reduceat(run_len, ustarts).astype(np.int64), pa.int64()
                ),
                "best_streak": pa.array(
                    np.maximum.reduceat(run_len, ustarts).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(local_days, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: streaks_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("user_id")
    )


USER_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
  FROM events
),
isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS anchor
  FROM days
),
runs AS (
  SELECT user_id, anchor, count(*) AS len FROM isl GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_days,
       CAST(max(len) AS BIGINT) AS best_streak
FROM runs GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch per event_type
# ---------------------------------------------------------------------------

KMV_K = 32


def kmv_registers(sf_dir: str, k: int = KMV_K):
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002) of
    users per event_type: the K smallest DISTINCT fmix64 hash values —
    a mergeable bottom-k summary whose estimate is
    (K-1) * 2^64 // h_K.  Like the HLL family the query emits the
    REGISTER TABLE, bit-exact on both engines (same multiply-shift
    hash; the uint64 value ships as hi/lo BIGINT halves so the
    driver's dtype-sensitive hash gate can compare it).  Scale shape:
    each batch folds to <= types*K rows via np.unique + partition; one
    tiny grouped merge resolves — sketch state is O(K) per stream and
    merges are associative, so shards combine freely."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def bottomk(types: np.ndarray, hs: np.ndarray) -> pa.Table:
        # distinct (type, h), then K smallest h per type via one lexsort
        pairs = np.unique(
            np.stack([types.astype(np.int64), hs.view(np.int64)], axis=1), axis=0
        )
        tcol, hcol = pairs[:, 0], pairs[:, 1].view(np.uint64)
        order = np.lexsort((hcol, tcol))
        tcol, hcol = tcol[order], hcol[order]
        new = np.ones(len(tcol), dtype=bool)
        new[1:] = tcol[1:] != tcol[:-1]
        run_start = np.repeat(
            np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(tcol)))
        )
        rank = np.arange(len(tcol)) - run_start + 1
        keep = rank <= k
        return pa.table(
            {
                "tcode": pa.array(tcol[keep], pa.int64()),
                "rank": pa.array(rank[keep].astype(np.int64), pa.int64()),
                "h": pa.array(hcol[keep].view(np.int64), pa.int64()),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _hll_hash(u)
        tdict = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = tdict.indices.to_numpy(zero_copy_only=False)
        vocab = tdict.dictionary.to_pylist()  # <= #event types, tiny
        out = bottomk(codes, h)
        names = pa.array(
            [vocab[c] for c in out["tcode"].to_numpy(zero_copy_only=False)],
            pa.string(),
        )
        return pa.table({"event_type": names, "rank": out["rank"], "h": out["h"]})

    def resolve(t: pa.Table) -> pa.Table:
        tdict = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = tdict.indices.to_numpy(zero_copy_only=False)
        vocab = tdict.dictionary.to_pylist()
        hs = t["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        out = bottomk(codes, hs)
        names = [vocab[c] for c in out["tcode"].to_numpy(zero_copy_only=False)]
        hu = out["h"].to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table(
            {
                "event_type": pa.array(names, pa.string()),
                "rank": out["rank"],
                "h_hi": pa.array((hu >> np.uint64(32)).astype(np.int64), pa.int64()),
                "h_lo": pa.array(
                    (hu & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()
                ),
            }
        )

    # partials are <= types*K rows per block; a single-partition
    # map_groups merge is a driver-bounded fold, same as the HLL merge
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: resolve(t.drop_columns(["g"])), batch_format="pyarrow"
        )
        .sort(["event_type", "rank"])
    )


def kmv_estimate(registers: pa.Table, k: int = KMV_K) -> dict:
    """Driver-side cardinality estimate per type: (K-1)*2^64 // h_K."""
    est = {}
    df = registers.to_pandas()
    for et, g in df.groupby("event_type"):
        if len(g) >= k:
            hk = (int(g["h_hi"].iloc[k - 1]) << 32) | int(g["h_lo"].iloc[k - 1])
            est[et] = ((k - 1) << 64) // hk
        else:
            est[et] = len(g)  # fewer distinct values than K: exact
    return est


def _kmv_sql() -> str:
    two32 = 1 << 32
    return f"""
WITH {_fmix64_sql("user_id", "event_type", "event_type")},
d AS (SELECT DISTINCT event_type, h FROM h5),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rank
  FROM d
)
SELECT event_type, CAST(rank AS BIGINT) AS rank,
       CAST(h // {two32} AS BIGINT) AS h_hi,
       CAST(h % {two32} AS BIGINT) AS h_lo
FROM r WHERE rank <= {KMV_K}
ORDER BY event_type, rank
"""


KMV_REGISTERS_SQL = _kmv_sql()


# ---------------------------------------------------------------------------
# Set intersection over a keyed stream (INTERSECT shape)
# ---------------------------------------------------------------------------

WINDOW_A_END = "2024-01-02"
WINDOW_B_START = "2024-01-30"


def users_both_windows(sf_dir: str):
    """Users active in BOTH the first and the last day of the stream —
    the INTERSECT set operator (cohort overlap), done as ONE scan:
    per-batch rows collapse to distinct (user, in_a, in_b) bit
    partials, a bucketed max-fold ORs the bits per user, and a filter
    keeps users present on both sides.  No second scan, no distinct
    per side, no join — the exchange carries one slim row per user
    seen in either window."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    a_end = pa.scalar(pd.Timestamp(WINDOW_A_END), type=pa.timestamp("us"))
    b_start = pa.scalar(pd.Timestamp(WINDOW_B_START), type=pa.timestamp("us"))
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def bits(t: pa.Table) -> pa.Table:
        in_a = pc.cast(pc.less(t["ts"], a_end), pa.int64())
        in_b = pc.cast(pc.greater_equal(t["ts"], b_start), pa.int64())
        tab = pa.table({"user_id": t["user_id"], "a": in_a, "b": in_b}).filter(
            pc.or_(pc.equal(in_a, 1), pc.equal(in_b, 1))
        )
        g = pa.TableGroupBy(tab, ["user_id"]).aggregate([("a", "max"), ("b", "max")])
        return pa.table(
            {"user_id": g["user_id"], "a": g["a_max"], "b": g["b_max"]}
        )

    both = bucketed_agg(
        ds.map_batches(bits, batch_format="pyarrow"),
        ["user_id"],
        [("a", "max", "a"), ("b", "max", "b")],
    )

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.equal(t["a"], 1), pc.equal(t["b"], 1)))
        return t.select(["user_id"])

    return both.map_batches(keep, batch_format="pyarrow").sort("user_id")


USERS_BOTH_WINDOWS_SQL = f"""
SELECT user_id FROM (
  SELECT user_id,
         max(CASE WHEN ts < TIMESTAMP '{WINDOW_A_END}' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN ts >= TIMESTAMP '{WINDOW_B_START}' THEN 1 ELSE 0 END) AS b
  FROM events
  WHERE ts < TIMESTAMP '{WINDOW_A_END}' OR ts >= TIMESTAMP '{WINDOW_B_START}'
  GROUP BY user_id
)
WHERE a = 1 AND b = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Grouped exact quantiles of a windowed derivation (inter-arrival gaps)
# ---------------------------------------------------------------------------

INTERARRIVAL_QS = (250, 500, 750, 900)


def interarrival_quantiles(sf_dir: str, permilles=INTERARRIVAL_QS):
    """Exact permille quantiles of the inter-event gap (whole seconds,
    per user, attributed to the LATER event's type) — the grouped
    quantile of a WINDOW-DERIVED column, composing the sessionize
    shuffle with the histogram-selection quantile plan.  Scale shape:
    one user-hash shuffle; each partition lexsorts once and diffs
    neighbors (no per-user Python); gaps fold to (type, gap_s, n)
    histogram partials — bounded by the gap-value domain, never event
    count — and the selection walks each type's cumulative histogram
    vectorized."""
    from document_extractor_ray.functions.bucketing import bucketed_agg, part_of_int64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "event_type": t["event_type"],
                "part": part_of_int64(u, n_parts),
            }
        )

    def gaps_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "gap_s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, u))
        u, us = u[order], us[order]
        same = u[1:] == u[:-1]
        gap_s = (us[1:] - us[:-1]) // 1_000_000
        types = t["event_type"].combine_chunks().take(
            pa.array(order[1:][same])
        )
        g = pa.TableGroupBy(
            pa.table({"event_type": types, "gap_s": pa.array(gap_s[same], pa.int64())}),
            ["event_type", "gap_s"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "gap_s": g["gap_s"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: gaps_part(t.drop_columns(["part"])), batch_format="pyarrow"
        ),
        ["event_type", "gap_s"],
        [("n", "sum", "n")],
    )

    qs = np.asarray(permilles, dtype=np.int64)

    def select_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "q_permille": pa.array([], pa.int64()),
                "gap_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().sort_values(["event_type", "gap_s"])
        out_t, out_q, out_v = [], [], []
        for et, g in df.groupby("event_type", sort=True):
            v = g["gap_s"].to_numpy()
            cum = g["n"].to_numpy().cumsum()
            tot = cum[-1]
            idx = np.searchsorted(cum * 1000, qs * tot, side="left")
            out_t.extend([et] * len(qs))
            out_q.extend(qs.tolist())
            out_v.extend(v[idx].tolist())
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "q_permille": pa.array(out_q, pa.int64()),
                "gap_s": pa.array(out_v, pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    # type-cardinality fold: histogram rows are (types x gap domain),
    # small enough for one partition after the bucketed merge
    return (
        hist.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: select_part(t.drop_columns(["g"])), batch_format="pyarrow"
        )
        .sort(["event_type", "q_permille"])
    )


def _interarrival_sql() -> str:
    qvals = ", ".join(f"({q})" for q in INTERARRIVAL_QS)
    return f"""
WITH g0 AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS BIGINT)
          - lag(CAST(epoch_us(ts) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
         ) // 1000000 AS gap_s
  FROM events
),
c AS (
  SELECT event_type, gap_s, count(*) AS n FROM g0
  WHERE gap_s IS NOT NULL GROUP BY event_type, gap_s
),
cum AS (
  SELECT event_type, gap_s,
         sum(n) OVER (PARTITION BY event_type ORDER BY gap_s) AS cumn
  FROM c
),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY event_type),
qs(q) AS (VALUES {qvals})
SELECT cum.event_type, CAST(qs.q AS BIGINT) AS q_permille,
       CAST(min(cum.gap_s) AS BIGINT) AS gap_s
FROM qs, cum JOIN tot ON tot.event_type = cum.event_type
WHERE cum.cumn * 1000 >= qs.q * tot.tn
GROUP BY cum.event_type, qs.q
ORDER BY cum.event_type, q_permille
"""


INTERARRIVAL_QUANTILES_SQL = _interarrival_sql()


# ---------------------------------------------------------------------------
# Spike detection: days whose event count beats 2x the type's median day
# ---------------------------------------------------------------------------

SPIKE_NUM = 11   # spike threshold: 10*n > 11*median (1.1x, integer
SPIKE_DEN = 10   # cross-multiplied so no float ratio exists)


def spike_days(sf_dir: str, num: int = SPIKE_NUM, den: int = SPIKE_DEN):
    """Anomalous days per event type: daily count > (num/den) x the type's
    MEDIAN daily count (lower median via the cumulative-histogram
    selection — integer-exact, no float stddev).  Scale shape: the
    (type, day) rollup is a bounded-domain groupby (taxonomy x
    calendar), folded per batch before the tiny grouped Sum; median
    selection and the spike filter run vectorized on the bounded
    rollup."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    day_us = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()), day_us)
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "d": d}), ["event_type", "d"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "d": g["d"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "d"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def flag(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "d": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "median_n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        out = []
        for et, g in df.groupby("event_type", sort=True):
            cnt = np.sort(g["n"].to_numpy())
            cum = np.arange(1, len(cnt) + 1)
            med = cnt[np.searchsorted(cum * 2, len(cnt), side="left")]
            spikes = g[den * g["n"] > num * med].copy()
            spikes["median_n"] = med
            out.append(spikes)
        res = pd.concat(out) if out else df.iloc[:0].assign(median_n=0)
        return pa.Table.from_pandas(
            res[["event_type", "d", "n", "median_n"]], preserve_index=False
        ).replace_schema_metadata(None)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        daily.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: flag(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort(["event_type", "d"])
    )


SPIKE_DAYS_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, n AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY n) AS rk,
         count(*) OVER (PARTITION BY event_type) AS tot
  FROM daily
),
med AS (
  SELECT event_type, CAST(min(v) AS BIGINT) AS median_n
  FROM cum WHERE rk * 2 >= tot GROUP BY event_type
)
SELECT daily.event_type, daily.d, daily.n, med.median_n
FROM daily JOIN med USING (event_type)
WHERE {SPIKE_DEN} * daily.n > {SPIKE_NUM} * med.median_n
ORDER BY event_type, d
"""


# ---------------------------------------------------------------------------
# Conditional ratio after a fact-fact join (fulfillment latency SLA)
# ---------------------------------------------------------------------------

FILL_SLA_DAYS = 60


def orders_fill_rate(sf_dir: str, sla_days: int = FILL_SLA_DAYS):
    """Per order priority: how many lineitems shipped within the SLA
    window of their order date — the FILTER-aggregate over a fact-fact
    join (TPC-H Q4's flavor with an arithmetic join predicate).  Both
    sides slim to ints before the ONE partitioned orderkey join
    (shipdate/orderdate as epoch micros); the SLA compare and the
    per-priority conditional counts fold per batch to <= 5 partial
    rows, so the post-join exchange carries priorities, never
    lineitems.  The rate ships as integer permille (floor division on
    both engines)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def slim_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    def slim_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "order_us": pc.cast(t["o_orderdate"], pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    sla_us = np.int64(sla_days) * np.int64(86_400_000_000)
    joined = li.map_batches(slim_li, batch_format="pyarrow").join(
        orders.map_batches(slim_orders, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
        ),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        if t.num_rows == 0 or "o_orderpriority" not in cols:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_items": pa.array([], pa.int64()),
                    "n_fast": pa.array([], pa.int64()),
                }
            )
        fast = pc.cast(
            pc.less_equal(
                t["ship_us"], pc.add(t["order_us"], pa.scalar(sla_us, pa.int64()))
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(
            pa.table({"o_orderpriority": t["o_orderpriority"], "fast": fast}),
            ["o_orderpriority"],
        ).aggregate([([], "count_all"), ("fast", "sum")])
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n_items": pc.cast(g["count_all"], pa.int64()),
                "n_fast": g["fast_sum"],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "fast_permille",
            pc.cast(pc.divide(pc.multiply(t["n_fast"], 1000), t["n_items"]), pa.int64()),
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_items", alias_name="n_items"), Sum("n_fast", alias_name="n_fast"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("o_orderpriority")
    )


ORDERS_FILL_RATE_SQL = f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(*) FILTER (CAST(epoch_us(l.l_shipdate) AS BIGINT)
            <= CAST(epoch_us(o.o_orderdate) AS BIGINT) + {FILL_SLA_DAYS} * 86400000000) AS BIGINT) AS n_fast,
       CAST(1000 * count(*) FILTER (CAST(epoch_us(l.l_shipdate) AS BIGINT)
            <= CAST(epoch_us(o.o_orderdate) AS BIGINT) + {FILL_SLA_DAYS} * 86400000000)
            // count(*) AS BIGINT) AS fast_permille
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartile codes)
# ---------------------------------------------------------------------------

RFM_QS = (250, 500, 750)


def rfm_segments(sf_dir: str):
    """Classic RFM customer segmentation over the event stream: per
    user the days-since-last-event, event count and summed cents, each
    coded 1-4 by GLOBAL quartile cuts, segment = 100r + 10f + m.
    Exactness: cut_q = min value whose cumulative user count reaches
    q permille (the repo's histogram-selection quantile), code =
    1 + #(cuts < value) — pure integer compares, so degenerate
    distributions (recency here has a 3-value domain) code identically
    on both engines.  Scale shape: one bucketed per-user fold; each
    measure's HISTOGRAM (bounded by its value domain, the
    doc_length_percentiles precedent — a 10^9-user corpus would
    quantize cents to fixed bins first) folds to the driver for three
    cuts; one broadcast-free vectorized assign pass.  The per-user
    table materializes once and feeds histograms + assign (the
    multi-consumer guard)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    mx_parts = (
        ds.map_batches(
            lambda t: pa.table(
                {"m": pa.array([pc.max(pc.cast(t["ts"], pa.int64())).as_py()], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    max_us = max(r["m"] for r in mx_parts)
    day_us = 86_400_000_000

    def per_user_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "last_us": pc.cast(t["ts"], pa.int64()),
                "f": pa.array(np.ones(t.num_rows, np.int64)),
                "m_cents": _to_cents(t["value"]),
            }
        )

    per_user = bucketed_agg(
        ds.map_batches(per_user_partial, batch_format="pyarrow"),
        ["user_id"],
        [("last_us", "max", "last_us"), ("f", "sum", "f"), ("m_cents", "sum", "m_cents")],
    )

    def derive(t: pa.Table) -> pa.Table:
        r_days = pc.cast(
            pc.divide(pc.subtract(pa.scalar(max_us, pa.int64()), t["last_us"]), day_us),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "r_days": r_days,
                "f": t["f"],
                "m_cents": t["m_cents"],
            }
        )

    per = per_user.map_batches(derive, batch_format="pyarrow").materialize()

    def cuts_of(col: str) -> np.ndarray:
        def hist_partial(t: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(pa.table({"v": t[col]}), ["v"]).aggregate(
                [([], "count_all")]
            )
            return pa.table({"v": g["v"], "n": pc.cast(g["count_all"], pa.int64())})

        hist = (
            per.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
            .sort_values("v")
        )
        v = hist["v"].to_numpy().astype(np.int64)
        cum = hist["n"].to_numpy().astype(np.int64).cumsum()
        tot = cum[-1]
        qs = np.asarray(RFM_QS, dtype=np.int64)
        return v[np.searchsorted(cum * 1000, qs * tot, side="left")]

    r_cuts, f_cuts, m_cuts = cuts_of("r_days"), cuts_of("f"), cuts_of("m_cents")

    def code(vals: np.ndarray, cuts: np.ndarray) -> np.ndarray:
        return 1 + (vals[:, None] > cuts[None, :]).sum(axis=1).astype(np.int64)

    def assign(t: pa.Table) -> pa.Table:
        r = code(t["r_days"].to_numpy(zero_copy_only=False), r_cuts)
        f = code(t["f"].to_numpy(zero_copy_only=False), f_cuts)
        m = code(t["m_cents"].to_numpy(zero_copy_only=False), m_cuts)
        return pa.table(
            {
                "user_id": t["user_id"],
                "r_days": t["r_days"],
                "f": t["f"],
                "m_cents": t["m_cents"],
                "r_code": pa.array(r, pa.int64()),
                "f_code": pa.array(f, pa.int64()),
                "m_code": pa.array(m, pa.int64()),
                "rfm": pa.array(100 * r + 10 * f + m, pa.int64()),
            }
        )

    return per.map_batches(assign, batch_format="pyarrow").sort("user_id")


def _rfm_sql() -> str:
    qvals = ", ".join(f"({q})" for q in RFM_QS)

    def cuts(src: str, col: str) -> str:
        return f"""{src}h AS (SELECT {col} AS v, count(*) AS c FROM per GROUP BY 1),
{src}cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM {src}h),
{src}cuts AS (
  SELECT CAST(qs.q AS BIGINT) AS q, min(v) AS cut
  FROM (VALUES {qvals}) qs(q), {src}cum, nu
  WHERE {src}cum.cum * 1000 >= qs.q * nu.n GROUP BY qs.q
)"""

    return f"""
WITH mx AS (SELECT max(CAST(epoch_us(ts) AS BIGINT)) AS m FROM events),
per AS (
  SELECT user_id,
         CAST((mx.m - max(CAST(epoch_us(ts) AS BIGINT))) // 86400000000 AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS f,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS m_cents
  FROM events, mx GROUP BY user_id, mx.m
),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
{cuts("r", "r_days")},
{cuts("f", "f")},
{cuts("m", "m_cents")}
SELECT user_id, r_days, f, m_cents,
       CAST(1 + (SELECT count(*) FROM rcuts WHERE per.r_days > rcuts.cut) AS BIGINT) AS r_code,
       CAST(1 + (SELECT count(*) FROM fcuts WHERE per.f > fcuts.cut) AS BIGINT) AS f_code,
       CAST(1 + (SELECT count(*) FROM mcuts WHERE per.m_cents > mcuts.cut) AS BIGINT) AS m_code,
       CAST(100 * (1 + (SELECT count(*) FROM rcuts WHERE per.r_days > rcuts.cut))
            + 10 * (1 + (SELECT count(*) FROM fcuts WHERE per.f > fcuts.cut))
            + (1 + (SELECT count(*) FROM mcuts WHERE per.m_cents > mcuts.cut)) AS BIGINT) AS rfm
FROM per
ORDER BY user_id
"""


RFM_SEGMENTS_SQL = _rfm_sql()


# ---------------------------------------------------------------------------
# Funnel latency: first 'view' -> first 'purchase' per user
# ---------------------------------------------------------------------------

def conversion_latency(sf_dir: str):
    """Per-user conversion latency: whole seconds from the FIRST view
    to the FIRST purchase, for users whose first purchase follows
    their first view — the funnel-latency metric (funnel_counts'
    ordered-pair cousin with a time payload).  Scale shape: one
    bucketed (user, type) min-fold over a pre-filtered two-type scan
    (the exchange carries at most 2 rows per user), then an in-row
    pivot + filter per partition — no window sort of raw events."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def slim(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array(["view", "purchase"], pa.string())
        )
        t = t.filter(keep)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_type": t["event_type"],
                "us": pc.cast(t["ts"], pa.int64()),
            }
        )

    firsts = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["user_id", "event_type"],
        [("us", "min", "us")],
    )

    def pivot(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "view_us": pa.array([], pa.int64()),
                "purchase_us": pa.array([], pa.int64()),
                "latency_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        wide = df.pivot_table(
            index="user_id", columns="event_type", values="us", aggfunc="min"
        )
        if "view" not in wide.columns or "purchase" not in wide.columns:
            return empty
        wide = wide.dropna(subset=["view", "purchase"])
        wide = wide[wide["purchase"] > wide["view"]]
        if not len(wide):
            return empty
        v = wide["view"].to_numpy().astype(np.int64)
        p = wide["purchase"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(wide.index.to_numpy().astype(np.int64), pa.int64()),
                "view_us": pa.array(v, pa.int64()),
                "purchase_us": pa.array(p, pa.int64()),
                "latency_s": pa.array((p - v) // 1_000_000, pa.int64()),
            }
        )

    # firsts is already user-bucketed: both of a user's rows share the
    # partition, so the pivot is correct per map_groups partition
    def tag_user_part(t: pa.Table) -> pa.Table:
        from document_extractor_ray.functions.bucketing import part_of_int64

        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", part_of_int64(u, _n_blocks()))

    return (
        firsts.map_batches(tag_user_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda t: pivot(t.drop_columns(["part"])), batch_format="pyarrow")
        .sort("user_id")
    )


CONVERSION_LATENCY_SQL = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN CAST(epoch_us(ts) AS BIGINT) END) AS view_us,
         min(CASE WHEN event_type = 'purchase' THEN CAST(epoch_us(ts) AS BIGINT) END) AS purchase_us
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id
)
SELECT user_id, view_us, purchase_us,
       CAST((purchase_us - view_us) // 1000000 AS BIGINT) AS latency_s
FROM f
WHERE view_us IS NOT NULL AND purchase_us IS NOT NULL AND purchase_us > view_us
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets over a bounded domain
# ---------------------------------------------------------------------------

def events_cube(sf_dir: str):
    """Counts and summed cents by CUBE(event_type, day-of-week) — all
    four grouping sets, margins labeled with the rollup family's
    sentinels ('ALL' / -1).  Day-of-week is pure integer arithmetic
    ((epoch_day + 4) % 7, Monday=0) so both engines derive it
    identically.  Scale shape: ONE bounded (type x 7) base fold per
    batch, one tiny grouped Sum; all margins are vectorized re-sums of
    the base table — the raw stream is scanned exactly once."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    day_us = np.int64(86_400_000_000)

    def partial(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()), day_us)
        dow = pc.subtract(
            pc.add(d, 4), pc.multiply(pc.divide(pc.add(d, 4), 7), 7)
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "dow": pc.cast(dow, pa.int64()),
                    "cents": _to_cents(t["value"]),
                }
            ),
            ["event_type", "dow"],
        ).aggregate([([], "count_all"), ("cents", "sum")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "dow": g["dow"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "cents": g["cents_sum"],
            }
        )

    base = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        outs = [df[["event_type", "dow", "n", "cents"]]]
        m1 = df.groupby("event_type", as_index=False)[["n", "cents"]].sum()
        m1["dow"] = -1
        outs.append(m1[["event_type", "dow", "n", "cents"]])
        m2 = df.groupby("dow", as_index=False)[["n", "cents"]].sum()
        m2["event_type"] = "ALL"
        outs.append(m2[["event_type", "dow", "n", "cents"]])
        m3 = pd.DataFrame(
            {
                "event_type": ["ALL"],
                "dow": [-1],
                "n": [df["n"].sum()],
                "cents": [df["cents"].sum()],
            }
        )
        outs.append(m3)
        res = pd.concat(outs, ignore_index=True)
        res["n"] = res["n"].astype("int64")
        res["cents"] = res["cents"].astype("int64")
        res["dow"] = res["dow"].astype("int64")
        return pa.Table.from_pandas(
            res, preserve_index=False
        ).replace_schema_metadata(None)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        base.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: expand(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort(["event_type", "dow"])
    )


EVENTS_CUBE_SQL = """
WITH base AS (
  SELECT event_type,
         ((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 4) % 7) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(dow AS BIGINT) AS dow, n, cents FROM base
UNION ALL
SELECT event_type, -1, CAST(sum(n) AS BIGINT), CAST(sum(cents) AS BIGINT)
FROM base GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(dow AS BIGINT), CAST(sum(n) AS BIGINT), CAST(sum(cents) AS BIGINT)
FROM base GROUP BY dow
UNION ALL
SELECT 'ALL', -1, CAST(sum(n) AS BIGINT), CAST(sum(cents) AS BIGINT) FROM base
ORDER BY event_type, dow
"""


# ---------------------------------------------------------------------------
# Time-weighted value integral per user (TWAP numerator/denominator)
# ---------------------------------------------------------------------------

def user_twap(sf_dir: str):
    """Per-user time-weighted value integral: Σ cents_i * gap_s_i over
    consecutive event pairs (the EARLIER event's value held until the
    next event) plus total held seconds — TWAP = weighted / total is
    the consumer's one division; both shipped terms are exact int64.
    Scale shape: the interarrival machinery (one user-hash shuffle,
    per-partition lexsort + neighbor diff), then a reduceat fold to one
    row per user — no per-user Python."""
    from document_extractor_ray.functions.bucketing import part_of_int64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "cents": _to_cents(t["value"]),
                "part": part_of_int64(u, n_parts),
            }
        )

    def fold_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "weighted_cents_s": pa.array([], pa.int64()),
                "total_s": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, u))
        u, us, cents = u[order], us[order], cents[order]
        same = u[1:] == u[:-1]
        gap_s = (us[1:] - us[:-1]) // 1_000_000
        w = cents[:-1] * gap_s
        uu = u[:-1][same]
        ww = w[same]
        gg = gap_s[same]
        if not len(uu):
            return empty
        ub = np.ones(len(uu), dtype=bool)
        ub[1:] = uu[1:] != uu[:-1]
        starts = np.flatnonzero(ub)
        return pa.table(
            {
                "user_id": pa.array(uu[starts], pa.int64()),
                "weighted_cents_s": pa.array(
                    np.add.reduceat(ww, starts).astype(np.int64), pa.int64()
                ),
                "total_s": pa.array(
                    np.add.reduceat(gg, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: fold_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("user_id")
    )


USER_TWAP_SQL = """
WITH seq AS (
  SELECT user_id,
         CAST(round(value * 100.0) AS BIGINT) AS cents,
         (lead(CAST(epoch_us(ts) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
          - CAST(epoch_us(ts) AS BIGINT)) // 1000000 AS gap_s
  FROM events
)
SELECT user_id,
       CAST(sum(cents * gap_s) AS BIGINT) AS weighted_cents_s,
       CAST(sum(gap_s) AS BIGINT) AS total_s
FROM seq WHERE gap_s IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Distinct-count per key at dimension cardinality (catalog coverage)
# ---------------------------------------------------------------------------

def supplier_part_coverage(sf_dir: str):
    """Per supplier: distinct parts actually shipped, order-line count
    and catalog-coverage permille — the assortment-breadth metric.
    Scale shape: per-batch (supp, part) dedup slims the exchange, ONE
    bucketed fold dedups globally, then a per-supplier rollup counts
    distinct parts without ever re-touching lineitem; the catalog size
    is one driver scalar from parquet metadata."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.bucketing import bucketed_agg

    n_parts_catalog = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    ds = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def local(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"s": t["l_suppkey"], "p": t["l_partkey"]}), ["s", "p"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"s": g["s"], "p": g["p"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    pairs = bucketed_agg(
        ds.map_batches(local, batch_format="pyarrow"),
        ["s", "p"],
        [("n", "sum", "n_lines")],
    )

    def per_supp_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"s": t["s"], "n_lines": t["n_lines"]}), ["s"]
        ).aggregate([([], "count_all"), ("n_lines", "sum")])
        return pa.table(
            {
                "s_suppkey": g["s"],
                "n_parts": pc.cast(g["count_all"], pa.int64()),
                "n_lines": g["n_lines_sum"],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "coverage_permille",
            pc.cast(
                pc.divide(pc.multiply(t["n_parts"], 1000), n_parts_catalog), pa.int64()
            ),
        )

    return (
        pairs.map_batches(per_supp_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n_parts", alias_name="n_parts"), Sum("n_lines", alias_name="n_lines"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("s_suppkey")
    )


SUPPLIER_PART_COVERAGE_SQL = """
SELECT s AS s_suppkey,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(n) AS BIGINT) AS n_lines,
       CAST(1000 * count(*) // (SELECT count(*) FROM part) AS BIGINT) AS coverage_permille
FROM (
  SELECT l_suppkey AS s, l_partkey AS p, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1, 2
)
GROUP BY s
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Behavioral concentration: Gini of event-type mix per user
# ---------------------------------------------------------------------------

EVENT_TAXONOMY = ("click", "error", "purchase", "signup", "view")


def user_type_gini(sf_dir: str):
    """Per-user Gini concentration of the event-type mix over the full
    5-type taxonomy (zeros count): permille of
    ΣΣ|c_i - c_j| / (2 · T² · mean) — integer-exact as
    1000 · T · Σij|ci-cj| // (2 · T² · total) with T=5 — flagging
    single-behavior users (gini→800 = all one type) vs uniform ones
    (0).  Scale shape: per-batch (user, type) counts, one bucketed
    fold, per-partition pivot to a (users x 5) matrix and a vectorized
    25-pair abs-diff — taxonomy is a bounded constant, so the pair
    work is O(users · T²) flat."""
    from document_extractor_ray.functions.bucketing import bucketed_agg, part_of_int64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    T = len(EVENT_TAXONOMY)

    def local(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"], "event_type": t["event_type"]}),
            ["user_id", "event_type"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = bucketed_agg(
        ds.map_batches(local, batch_format="pyarrow"),
        ["user_id", "event_type"],
        [("n", "sum", "n")],
    )

    def gini_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "gini_permille": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        wide = df.pivot_table(
            index="user_id", columns="event_type", values="n", aggfunc="sum", fill_value=0
        )
        for et in EVENT_TAXONOMY:
            if et not in wide.columns:
                wide[et] = 0
        m = wide[list(EVENT_TAXONOMY)].to_numpy().astype(np.int64)
        total = m.sum(axis=1)
        num = np.abs(m[:, :, None] - m[:, None, :]).sum(axis=(1, 2))
        gini = 1000 * T * num // (2 * T * T * np.maximum(total, 1))
        return pa.table(
            {
                "user_id": pa.array(wide.index.to_numpy().astype(np.int64), pa.int64()),
                "n_events": pa.array(total, pa.int64()),
                "gini_permille": pa.array(gini.astype(np.int64), pa.int64()),
            }
        )

    def tag_user(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", part_of_int64(u, _n_blocks()))

    return (
        counts.map_batches(tag_user, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: gini_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("user_id")
    )


def _user_type_gini_sql() -> str:
    T = len(EVENT_TAXONOMY)
    cols = {et: f"c{i}" for i, et in enumerate(EVENT_TAXONOMY)}
    pivots = ",\n         ".join(
        f"CAST(count(*) FILTER (event_type = '{et}') AS BIGINT) AS {c}"
        for et, c in cols.items()
    )
    names = list(cols.values())
    absdiffs = " + ".join(
        f"abs({a} - {b})" for a in names for b in names
    )
    total = " + ".join(names)
    return f"""
WITH w AS (
  SELECT user_id,
         {pivots}
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST({total} AS BIGINT) AS n_events,
       CAST(1000 * {T} * ({absdiffs})
            // (2 * {T * T} * greatest({total}, 1)) AS BIGINT) AS gini_permille
FROM w
ORDER BY user_id
"""


USER_TYPE_GINI_SQL = _user_type_gini_sql()


# ---------------------------------------------------------------------------
# Time-series resampling with gap fill (regular 5-minute grid)
# ---------------------------------------------------------------------------

RESAMPLE_BIN_US = 300 * 1_000_000  # 5 minutes


def events_resample_5min(sf_dir: str):
    """Regular 5-minute time grid per event type with ZERO-FILLED gaps
    — the resampling step every downstream forecaster/monitor expects
    (missing bin == 0, not absent).  Scale shape: the (type, bin)
    rollup is bounded by taxonomy x time range (never event count),
    folded per batch before the grouped Sum; the dense grid is
    reindexed vectorized in one bounded fold — the raw stream never
    materializes a grid row."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])
    bin_us = np.int64(RESAMPLE_BIN_US)

    def partial(t: pa.Table) -> pa.Table:
        b = pc.divide(pc.cast(t["ts"], pa.int64()), bin_us)
        g = pa.TableGroupBy(
            pa.table({"event_type": t["event_type"], "bin": pc.cast(b, pa.int64())}),
            ["event_type", "bin"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "bin": g["bin"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    sparse = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def densify(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "bin": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        lo, hi = int(df["bin"].min()), int(df["bin"].max())
        grid = np.arange(lo, hi + 1, dtype=np.int64)
        types = sorted(df["event_type"].unique())
        out = []
        for et in types:
            g = df[df["event_type"] == et]
            dense = np.zeros(len(grid), dtype=np.int64)
            dense[g["bin"].to_numpy().astype(np.int64) - lo] = g["n"].to_numpy()
            out.append(
                pd.DataFrame({"event_type": et, "bin": grid, "n": dense})
            )
        return pa.Table.from_pandas(
            pd.concat(out, ignore_index=True), preserve_index=False
        ).replace_schema_metadata(None)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        sparse.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: densify(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort(["event_type", "bin"])
    )


EVENTS_RESAMPLE_5MIN_SQL = f"""
WITH sparse AS (
  SELECT event_type,
         CAST(epoch_us(ts) AS BIGINT) // {RESAMPLE_BIN_US} AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM sparse),
grid AS (
  SELECT t.event_type, g.b AS bin
  FROM (SELECT DISTINCT event_type FROM sparse) t,
       bounds, LATERAL (SELECT unnest(range(bounds.lo, bounds.hi + 1)) AS b) g
)
SELECT grid.event_type, CAST(grid.bin AS BIGINT) AS bin,
       CAST(coalesce(sparse.n, 0) AS BIGINT) AS n
FROM grid LEFT JOIN sparse USING (event_type, bin)
ORDER BY event_type, bin
"""


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation moments per event type (ordered pair sums)
# ---------------------------------------------------------------------------

def value_autocorr_moments(sf_dir: str):
    """Sufficient statistics for the lag-1 autocorrelation of event
    value within each type: over consecutive (by ts, event_id) event
    pairs of a type — n_pairs, Σx, Σy, Σx², Σy², Σxy, all exact int64
    cents — the moment-sketch discipline (events_corr_stats) applied
    to an ORDER-DEPENDENT statistic.  The float autocorr is one
    driver formula; integers are all that cross the wire.  Scale
    shape: one type-hash shuffle co-locates each type so "consecutive"
    is global; honest ceiling: a whole type per partition caps
    parallelism at |taxonomy| and a 10^12-row type overfills one
    partition — the production plan range-partitions (type, time) and
    stitches the ONE boundary pair per range, same moments."""
    from document_extractor_ray.functions.bucketing import key_part_column

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "ts", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "cents": _to_cents(t["value"]),
            }
        )
        return out.append_column(
            "part", key_part_column(out, ["event_type"], n_parts)
        )

    def moments_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sy": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
                "syy": pa.array([], pa.int64()),
                "sxy": pa.array([], pa.int64()),
            }
        )
        if t.num_rows < 2:
            return empty
        td = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = td.indices.to_numpy(zero_copy_only=False)
        vocab = td.dictionary.to_pylist()
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, codes))
        codes, cents = codes[order], cents[order]
        same = codes[1:] == codes[:-1]
        x = cents[:-1][same]
        y = cents[1:][same]
        cc = codes[:-1][same]
        if not len(cc):
            return empty
        rows = {"event_type": [], "n_pairs": [], "sx": [], "sy": [], "sxx": [], "syy": [], "sxy": []}
        for code in np.unique(cc):
            m = cc == code
            xs, ys = x[m], y[m]
            rows["event_type"].append(vocab[code])
            rows["n_pairs"].append(int(m.sum()))
            rows["sx"].append(int(xs.sum()))
            rows["sy"].append(int(ys.sum()))
            rows["sxx"].append(int((xs * xs).sum()))
            rows["syy"].append(int((ys * ys).sum()))
            rows["sxy"].append(int((xs * ys).sum()))
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n_pairs": pa.array(rows["n_pairs"], pa.int64()),
                "sx": pa.array(rows["sx"], pa.int64()),
                "sy": pa.array(rows["sy"], pa.int64()),
                "sxx": pa.array(rows["sxx"], pa.int64()),
                "syy": pa.array(rows["syy"], pa.int64()),
                "sxy": pa.array(rows["sxy"], pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: moments_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .groupby("event_type")
        .aggregate(
            Sum("n_pairs", alias_name="n_pairs"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .sort("event_type")
    )


VALUE_AUTOCORR_MOMENTS_SQL = """
WITH seq AS (
  SELECT event_type,
         CAST(round(value * 100.0) AS BIGINT) AS x,
         lead(CAST(round(value * 100.0) AS BIGINT))
           OVER (PARTITION BY event_type
                 ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS y
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x) AS BIGINT) AS sx,
       CAST(sum(y) AS BIGINT) AS sy,
       CAST(sum(x * x) AS BIGINT) AS sxx,
       CAST(sum(y * y) AS BIGINT) AS syy,
       CAST(sum(x * y) AS BIGINT) AS sxy
FROM seq WHERE y IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Retention cohort matrix via the bitmask fold (no self-join)
# ---------------------------------------------------------------------------

def retention_cohort_matrix(sf_dir: str):
    """The classic cohort-retention triangle: users grouped by FIRST
    active week (cohort), counted in every week they returned.  The
    usual plan self-joins user-weeks to first-weeks; here the week
    span is a bounded catalog (<= 63), so each user folds to ONE
    int64 week-BITMASK (`bucketing.bitmask_pair_counts`'s discipline,
    inlined since cohort = lowest set bit needs the mask, not pairs):
    only the mask histogram leaves the shuffle, and the driver expands
    the (cohort_week, week, n_users) triangle with a popcount pass.
    Zero joins, zero per-user driver state."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    week_us = np.int64(7 * 86_400_000_000)

    def slim(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["ts"], pa.int64()), week_us)
        g = pa.TableGroupBy(
            pa.table({"user_id": t["user_id"], "w": pc.cast(w, pa.int64())}),
            ["user_id", "w"],
        ).aggregate([])
        return pa.table({"user_id": g["user_id"], "w": g["w"]})

    # anchor weeks to the global minimum so bits stay < 63 regardless
    # of the epoch offset (one tiny driver scalar)
    w0_parts = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "w": pa.array(
                        [
                            pc.min(
                                pc.divide(pc.cast(t["ts"], pa.int64()), week_us)
                            ).as_py()
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    w0 = min(r["w"] for r in w0_parts)

    w1_parts = (
        ds.map_batches(
            lambda t: pa.table(
                {
                    "w": pa.array(
                        [
                            pc.max(
                                pc.divide(pc.cast(t["ts"], pa.int64()), week_us)
                            ).as_py()
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    span = max(r["w"] for r in w1_parts) - w0 + 1
    if span > 26:
        # the mask histogram's domain is 2^span: fine for the half-year
        # cohort window this implements, unbounded past it — re-bucket
        # weeks to months (or quarters) before the fold, same popcount
        # expansion
        raise ValueError(
            f"retention_cohort_matrix bitmask fold spans {span} weeks; "
            "re-bucket periods (months/quarters) above 26"
        )

    def to_bit(t: pa.Table) -> pa.Table:
        rel = pc.subtract(t["w"], w0)
        bit = pc.shift_left(pa.scalar(1, pa.int64()), pc.cast(rel, pa.int64()))
        return pa.table({"user_id": t["user_id"], "mask": bit})

    masks = bucketed_agg(
        bucketed_agg(
            ds.map_batches(slim, batch_format="pyarrow").map_batches(
                to_bit, batch_format="pyarrow"
            ),
            ["user_id", "mask"],
            [(None, "count", "n")],
        ),
        ["user_id"],
        [("mask", "sum", "mask")],
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"mask": t["mask"]}), ["mask"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"mask": g["mask"], "n": pc.cast(g["count_all"], pa.int64())})

    hist = bucketed_agg(
        masks.map_batches(hist_partial, batch_format="pyarrow"),
        ["mask"],
        [("n", "sum", "n")],
    ).take_all()

    m = np.array([r["mask"] for r in hist], dtype=np.int64)
    c = np.array([r["n"] for r in hist], dtype=np.int64)
    lowbit = (m & -m).astype(np.int64)
    cohort = np.log2(lowbit.astype(np.float64)).astype(np.int64)  # exact: power of 2
    out_c, out_w, out_n = [], [], []
    for cw in sorted(set(cohort.tolist())):
        sel = cohort == cw
        for w in range(cw, 64):
            both = sel & (((m >> np.int64(w)) & np.int64(1)).astype(bool))
            n = int(c[both].sum())
            if n:
                out_c.append(cw)
                out_w.append(w)
                out_n.append(n)
    return pa.table(
        {
            "cohort_week": pa.array(out_c, pa.int64()),
            "week": pa.array(out_w, pa.int64()),
            "n_users": pa.array(out_n, pa.int64()),
        }
    )


RETENTION_COHORT_MATRIX_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS w
  FROM events
),
w0 AS (SELECT min(w) AS w0 FROM uw),
rel AS (SELECT user_id, CAST(uw.w - w0.w0 AS BIGINT) AS w FROM uw, w0),
cohort AS (SELECT user_id, min(w) AS cw FROM rel GROUP BY user_id)
SELECT cohort.cw AS cohort_week, rel.w AS week,
       CAST(count(*) AS BIGINT) AS n_users
FROM rel JOIN cohort USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week
"""


# ---------------------------------------------------------------------------
# TPC-H Q6: the pure filter-aggregate (scan-speed baseline)
# ---------------------------------------------------------------------------

Q6_START, Q6_END = "1996-01-01", "1997-01-01"


def q6_forecast_revenue(sf_dir: str):
    """Forecast-revenue-change (TPC-H Q6): one predicate-heavy scan,
    one global sum — the minimal operator that measures pure columnar
    scan + filter throughput (no shuffle at all; each block folds to a
    2-int partial).  Discount bounds compare the SAME stored float64
    against the same literals on both engines, so the boundary rows
    select identically."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    start = pa.scalar(pd.Timestamp(Q6_START), type=pa.timestamp("us"))
    end = pa.scalar(pd.Timestamp(Q6_END), type=pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], start),
                pc.less(t["l_shipdate"], end),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], 0.05),
                    pc.less_equal(t["l_discount"], 0.07),
                ),
                pc.less(t["l_quantity"], 24.0),
            ),
        )
        t = t.filter(keep)
        cents = _to_cents(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table(
            {
                "n_items": pa.array([t.num_rows], pa.int64()),
                "revenue_cents": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    def merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array([pc.sum(t["n_items"]).as_py() or 0], pa.int64()),
                "revenue_cents": pa.array(
                    [pc.sum(t["revenue_cents"]).as_py() or 0], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: merge(t.drop_columns(["g"])), batch_format="pyarrow")
    )


Q6_FORECAST_REVENUE_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_START}' AND l_shipdate < TIMESTAMP '{Q6_END}'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# TPC-H Q15: top supplier in a revenue window (global argmax, keep ties)
# ---------------------------------------------------------------------------

Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """Top revenue supplier(s) over a quarter (TPC-H Q15): per-supplier
    window revenue through the bucketed fold (supplier keys grow with
    the data), the global max as a two-pass scalar (per-block partial
    maxes, one driver fold), then an equality filter keeps ALL tied
    winners — names attach by filtering the supplier dim against the
    tiny winner set, never a shuffle join."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.bucketing import bucketed_agg

    start = pa.scalar(pd.Timestamp(Q15_START), type=pa.timestamp("us"))
    end = pa.scalar(pd.Timestamp(Q15_END), type=pa.timestamp("us"))
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def slim(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], start), pc.less(t["l_shipdate"], end)
            )
        )
        return pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "cents": _to_cents(
                    pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
                ),
            }
        )

    rev = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["l_suppkey"],
        [("cents", "sum", "revenue_cents")],
    ).materialize()

    maxes = rev.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.max(t["revenue_cents"]).as_py() or 0], pa.int64())}
        ),
        batch_format="pyarrow",
    ).take_all()
    top = max((r["m"] for r in maxes), default=0)

    winners = rev.map_batches(
        lambda t: t.filter(pc.equal(t["revenue_cents"], top)),
        batch_format="pyarrow",
    ).take_all()
    keys = pa.array(sorted(r["l_suppkey"] for r in winners), pa.int64())
    rev_of = {r["l_suppkey"]: r["revenue_cents"] for r in winners}

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    supp = supp.filter(pc.is_in(supp["s_suppkey"], value_set=keys))
    order = pc.sort_indices(supp["s_suppkey"])
    supp = supp.take(order)
    return pa.table(
        {
            "s_suppkey": supp["s_suppkey"],
            "s_name": supp["s_name"],
            "revenue_cents": pa.array(
                [rev_of[k.as_py()] for k in supp["s_suppkey"]], pa.int64()
            ),
        }
    )


Q15_TOP_SUPPLIER_SQL = f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}' AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.rev AS revenue_cents
FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rev = (SELECT max(rev) FROM r)
ORDER BY s.s_suppkey
"""


# ---------------------------------------------------------------------------
# Benford first-digit forensics over event values
# ---------------------------------------------------------------------------

def value_benford_profile(sf_dir: str):
    """First-significant-digit profile of event values per type — the
    Benford's-law forensic screen for fabricated or clipped numeric
    columns.  The digit is derived from the DECIMAL STRING of integer
    cents on both engines (no float log10 anywhere near a boundary).
    Scale shape: bounded (type x 9) counts fold per batch; one tiny
    grouped Sum; share in integer permille."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["value"])
        keep = pc.greater(cents, 0)
        t2 = pa.table({"event_type": t["event_type"], "cents": cents}).filter(keep)
        digit = pc.utf8_slice_codeunits(
            pc.cast(t2["cents"], pa.string()), 0, 1
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t2["event_type"],
                    "digit": pc.cast(digit, pa.int64()),
                }
            ),
            ["event_type", "digit"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "digit": g["digit"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "digit"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def share(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "digit": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "share_permille": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas()
        tot = df.groupby("event_type")["n"].transform("sum")
        df["share_permille"] = (1000 * df["n"] // tot).astype("int64")
        return pa.Table.from_pandas(
            df[["event_type", "digit", "n", "share_permille"]], preserve_index=False
        ).replace_schema_metadata(None)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        agg.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: share(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort(["event_type", "digit"])
    )


VALUE_BENFORD_PROFILE_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(round(value * 100.0) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE CAST(round(value * 100.0) AS BIGINT) > 0
  GROUP BY 1, 2
)
SELECT event_type, digit, n,
       CAST(1000 * n // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_permille
FROM d
ORDER BY event_type, digit
"""


# ---------------------------------------------------------------------------
# Revenue inequality per nation (exact rank-weighted Gini)
# ---------------------------------------------------------------------------

def revenue_gini_by_nation(sf_dir: str):
    """Gini coefficient of customer order revenue within each nation —
    the market-concentration metric, exact in integer permille via the
    rank-weighted form G = Σ(2i − n − 1)·x_(i) / (n·Σx) (sorted x,
    1-based i): numerator and denominator are exact int64 sums, the
    division is one floor per nation.  Scale shape: per-customer
    revenue through the bucketed fold; the rank-weighted pass hash-
    partitions on nation (bounded 25 — parallelism capped by the
    nation catalog, the documented grouped-sorted-fold ceiling; a
    10^12-row nation would range-partition by revenue and merge rank
    offsets) and sorts each partition once."""
    from document_extractor_ray.functions.bucketing import bucketed_agg, key_part_column

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "cents": _to_cents(t["o_totalprice"])}
        )

    per_cust = bucketed_agg(
        orders.map_batches(slim, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "sum", "cents")],
    )

    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    cust_ref = state.broadcast(cust)

    def attach_nation(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "o_custkey", state.cached_get(cust_ref), "c_custkey", ["c_nationkey"]
        )
        t = t.filter(pc.is_valid(t["c_nationkey"]))
        out = pa.table(
            {
                "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "cents": t["cents"],
            }
        )
        return out.append_column(
            "part", key_part_column(out, ["nationkey"], _n_blocks())
        )

    def gini_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nationkey": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
                "gini_permille": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        nk = t["nationkey"].to_numpy(zero_copy_only=False)
        x = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((x, nk))
        nk, x = nk[order], x[order]
        new = np.ones(len(nk), dtype=bool)
        new[1:] = nk[1:] != nk[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(nk))))
        n_of = np.diff(np.append(starts, len(nk)))
        i = np.arange(len(nk)) - run_start + 1  # 1-based rank within nation
        n_rep = np.repeat(n_of, n_of)
        w = 2 * i - n_rep - 1
        num = np.add.reduceat(w * x, starts)
        tot = np.add.reduceat(x, starts)
        gini = 1000 * num // np.maximum(n_of * tot, 1)
        return pa.table(
            {
                "nationkey": pa.array(nk[starts], pa.int64()),
                "n_customers": pa.array(n_of.astype(np.int64), pa.int64()),
                "revenue_cents": pa.array(tot.astype(np.int64), pa.int64()),
                "gini_permille": pa.array(gini.astype(np.int64), pa.int64()),
            }
        )

    return (
        per_cust.map_batches(attach_nation, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: gini_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("nationkey")
    )


REVENUE_GINI_BY_NATION_SQL = """
WITH per AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey,
         CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, cents,
         row_number() OVER (PARTITION BY nationkey ORDER BY cents, o_custkey) AS i,
         count(*) OVER (PARTITION BY nationkey) AS n
  FROM per
)
SELECT CAST(nationkey AS BIGINT) AS nationkey,
       CAST(any_value(n) AS BIGINT) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       CAST(1000 * sum((2 * i - n - 1) * cents)
            // greatest(any_value(n) * sum(cents), 1) AS BIGINT) AS gini_permille
FROM ranked
GROUP BY nationkey
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# Contingency table with exact independence-test ingredients
# ---------------------------------------------------------------------------

def mktseg_priority_contingency(sf_dir: str, broadcast_limit: int = 2_000_000):
    """(market segment x order priority) contingency table with the
    EXACT integer ingredients of the chi-square independence test per
    cell: observed n, row total, column total, grand total — the float
    statistic Σ(O − RC/N)²·N/(RC) is one driver formula away, and no
    float ever crosses the wire.  Scale shape: the customer→segment
    map broadcasts below a budget (the q5 discipline; above it the
    partitioned custkey join path), the crosstab folds per batch to
    <= 25 cells, margins are vectorized re-sums of the final table."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    if cust.num_rows <= broadcast_limit:
        cust_ref = state.broadcast(cust)

        def attach(t: pa.Table) -> pa.Table:
            t = state.lookup_join(
                t, "o_custkey", state.cached_get(cust_ref), "c_custkey", ["c_mktsegment"]
            )
            return t.filter(pc.is_valid(t["c_mktsegment"]))

        pairs = orders.map_batches(attach, batch_format="pyarrow")
    else:
        cust_ds = ray.data.from_arrow(cust).repartition(_n_blocks())
        pairs = orders.join(
            cust_ds,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/orders.parquet"),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).materialize()

    def cell_partial(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        if t.num_rows == 0 or "c_mktsegment" not in cols:
            return pa.table(
                {
                    "segment": pa.array([], pa.string()),
                    "priority": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(
            pa.table(
                {"segment": t["c_mktsegment"], "priority": t["o_orderpriority"]}
            ),
            ["segment", "priority"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "segment": g["segment"],
                "priority": g["priority"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = (
        pairs.map_batches(cell_partial, batch_format="pyarrow")
        .groupby(["segment", "priority"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def margins(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        row = df.groupby("segment")["n"].sum()
        col = df.groupby("priority")["n"].sum()
        grand = int(df["n"].sum())
        df["row_total"] = df["segment"].map(row).astype("int64")
        df["col_total"] = df["priority"].map(col).astype("int64")
        df["grand_total"] = grand
        return pa.Table.from_pandas(
            df[["segment", "priority", "n", "row_total", "col_total", "grand_total"]],
            preserve_index=False,
        ).replace_schema_metadata(None)

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        cells.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: margins(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort(["segment", "priority"])
    )


MKTSEG_PRIORITY_CONTINGENCY_SQL = """
WITH cells AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         CAST(count(*) AS BIGINT) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT segment, priority, n,
       CAST(sum(n) OVER (PARTITION BY segment) AS BIGINT) AS row_total,
       CAST(sum(n) OVER (PARTITION BY priority) AS BIGINT) AS col_total,
       CAST(sum(n) OVER () AS BIGINT) AS grand_total
FROM cells
ORDER BY segment, priority
"""


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity revenue (correlated per-part average)
# ---------------------------------------------------------------------------

def q17_small_qty_revenue(sf_dir: str):
    """Revenue locked in small-quantity orders (TPC-H Q17 shape):
    lineitems whose quantity is under 20% of their PART's average —
    the correlated-scalar-subquery-over-a-fact-key plan.  The per-part
    (sum, count) fold runs bucketed (part keys grow with the data),
    rejoins the detail rows through ONE partitioned hash join of slim
    int columns, and the 0.2·avg predicate is the integer
    cross-multiplication 5·qty·cnt < sum — no float average exists.
    Output folds to one global (n_items, revenue_cents) row, so
    nothing but partials leave the join."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def slim(t: pa.Table) -> pa.Table:
        q = pc.cast(
            pc.round(t["l_quantity"], round_mode="half_towards_infinity"), pa.int64()
        )
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty": q,
                "price_c": _to_cents(t["l_extendedprice"]),
            }
        )

    slimmed = li.map_batches(slim, batch_format="pyarrow").materialize()

    def pq_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"l_partkey": t["l_partkey"], "qty": t["qty"]}), ["l_partkey"]
        ).aggregate([("qty", "sum"), ([], "count_all")])
        return pa.table(
            {
                "pk": g["l_partkey"],
                "s": g["qty_sum"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_part = _settle_nonempty(
        bucketed_agg(
            slimmed.map_batches(pq_partial, batch_format="pyarrow"),
            ["pk"],
            [("s", "sum", "s"), ("c", "sum", "c")],
        ),
        pa.table(
            {
                "pk": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        ),
    )

    joined = slimmed.join(
        per_part,
        join_type="inner",
        num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
        on=("l_partkey",),
        right_on=("pk",),
    )

    def fold(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        if t.num_rows == 0 or "qty" not in cols:
            return pa.table(
                {
                    "n_items": pa.array([0], pa.int64()),
                    "revenue_cents": pa.array([0], pa.int64()),
                }
            )
        keep = pc.less(
            pc.multiply(pc.multiply(t["qty"], 5), t["c"]), t["s"]
        )
        t = t.filter(keep)
        return pa.table(
            {
                "n_items": pa.array([t.num_rows], pa.int64()),
                "revenue_cents": pa.array(
                    [pc.sum(t["price_c"]).as_py() or 0], pa.int64()
                ),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    def merge(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_items": pa.array([pc.sum(t["n_items"]).as_py() or 0], pa.int64()),
                "revenue_cents": pa.array(
                    [pc.sum(t["revenue_cents"]).as_py() or 0], pa.int64()
                ),
            }
        )

    return (
        joined.map_batches(fold, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: merge(t.drop_columns(["g"])), batch_format="pyarrow")
    )


Q17_SMALL_QTY_REVENUE_SQL = """
WITH pq AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN pq ON pq.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * pq.c < pq.s
"""


# ---------------------------------------------------------------------------
# Running-max drawdown per user (cummax window composite)
# ---------------------------------------------------------------------------

def user_value_drawdown(sf_dir: str):
    """Maximum drawdown of each user's event-value series (cents):
    max over time of (running max − value) — the risk-style window
    composite (cummax + diff + max) that a plain aggregate cannot
    express.  Scale shape: the sessionize shuffle (one user-hash
    exchange), per-partition lexsort, numpy cummax segmented by user
    runs, one reduceat max — no per-user Python."""
    from document_extractor_ray.functions.bucketing import part_of_int64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "us": pc.cast(t["ts"], pa.int64()),
                "cents": _to_cents(t["value"]),
                "part": part_of_int64(u, n_parts),
            }
        )

    def drawdown_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "max_drawdown_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, u))
        u, cents = u[order], cents[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        # segmented cummax without a per-user loop: add a per-segment
        # offset so one global accumulate never bleeds across users;
        # offset = max+1 keeps headroom at ~9e18/max segments per
        # partition (a 2^40 constant would overflow past 8M segments)
        seg_id = np.cumsum(new) - 1
        BIG = np.int64(int(cents.max()) + 1)
        shifted = cents + seg_id * BIG
        np.maximum.accumulate(shifted, out=shifted)
        runmax = shifted - seg_id * BIG
        dd = runmax - cents
        out = np.maximum.reduceat(dd, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "max_drawdown_cents": pa.array(out.astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: drawdown_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("user_id")
    )


USER_VALUE_DRAWDOWN_SQL = """
WITH seq AS (
  SELECT user_id,
         max(CAST(round(value * 100.0) AS BIGINT))
           OVER (PARTITION BY user_id
                 ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id
                 ROWS UNBOUNDED PRECEDING) AS runmax,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
)
SELECT user_id,
       CAST(max(runmax - cents) AS BIGINT) AS max_drawdown_cents
FROM seq GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS semi-join (late-shipment priority audit)
# ---------------------------------------------------------------------------

Q4_WINDOW_LO = "1995-07-01"
Q4_WINDOW_HI = "1995-10-01"
Q4_LATE_DAYS = 60
Q4_BROADCAST_LIMIT = 200_000


def q4_order_priority(
    sf_dir: str, broadcast_limit: int = Q4_BROADCAST_LIMIT
):
    """Priority distribution of one quarter's orders that had at least
    one LATE lineitem (TPC-H Q4's EXISTS semi-join; the synthetic
    lineitem lacks commit/receipt dates, so "late" is shipdate more
    than 60 days after the order date — same correlated-predicate
    shape).  Scale plan: the date window prunes orders FIRST (the
    selective side), then below ``broadcast_limit`` survivors the
    (orderkey -> orderdate, priority) table broadcasts via ray.put and
    the lineitem scan semi-joins with a per-batch index_in lookup —
    no exchange at all; above budget it falls back to one partitioned
    hash join.  EXISTS collapses through ``bucketed_agg`` distinct
    (orderkeys grow with data — never Ray's per-group aggregate), and
    only the 5-row priority rollup leaves the shuffle."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    lo = pa.scalar(pd.Timestamp(Q4_WINDOW_LO), type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(Q4_WINDOW_HI), type=pa.timestamp("us"))
    late_us = Q4_LATE_DAYS * 86_400_000_000

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def window(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi)
            )
        )
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pc.cast(pc.cast(t["o_orderdate"], pa.int64()), pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    win = orders.map_batches(window, batch_format="pyarrow").materialize()
    n_win = win.count()

    late_empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "o_orderpriority": pa.array([], pa.string()),
        }
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    if n_win <= broadcast_limit:
        win_tab = pa.concat_tables(
            [ray.get(r) for r in win.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [late_empty.append_column("odate_us", pa.array([], pa.int64()))]
        ).combine_chunks()
        win_ref = state.broadcast(win_tab)

        def late_rows(t: pa.Table) -> pa.Table:
            dim = state.cached_get(win_ref)
            t = pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ship_us": pc.cast(pc.cast(t["l_shipdate"], pa.int64()), pa.int64()),
                }
            )
            t = state.lookup_join(
                t, "l_orderkey", dim, "o_orderkey", ["odate_us", "o_orderpriority"]
            )
            keep = pc.and_kleene(
                pc.is_valid(t["odate_us"]),
                pc.greater(t["ship_us"], pc.add(t["odate_us"], late_us)),
            )
            t = t.filter(pc.fill_null(keep, False))
            return t.select(["l_orderkey", "o_orderpriority"])

        late = li.map_batches(late_rows, batch_format="pyarrow")
    else:
        j = li.join(
            win,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def late_out(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in set(t.column_names):
                return late_empty
            ship = pc.cast(pc.cast(t["l_shipdate"], pa.int64()), pa.int64())
            t = t.filter(pc.greater(ship, pc.add(t["odate_us"], late_us)))
            return t.select(["l_orderkey", "o_orderpriority"])

        late = j.map_batches(late_out, batch_format="pyarrow")

    distinct = bucketed_agg(
        late, ["l_orderkey"], [("o_orderpriority", "min", "o_orderpriority")]
    )

    def prio_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["o_orderpriority"]), ["o_orderpriority"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "o_orderpriority": g["o_orderpriority"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    return (
        distinct.map_batches(prio_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="order_count"))
        .sort("o_orderpriority")
    )


Q4_ORDER_PRIORITY_SQL = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_WINDOW_LO}'
  AND o.o_orderdate <  TIMESTAMP '{Q4_WINDOW_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (zero-join form)
# ---------------------------------------------------------------------------

def q13_customer_distribution(sf_dir: str):
    """Distribution of customers by how many orders they placed
    (TPC-H Q13's LEFT JOIN + double aggregate).  Zero-join plan: the
    per-custkey count folds through ``bucketed_agg`` (custkeys grow
    with data), the count histogram is a bounded second aggregate, and
    the LEFT-JOIN zero bucket is derived arithmetically — total
    customers (parquet METADATA row count, no scan) minus customers
    seen in orders.  Nothing customer-shaped ever leaves a worker."""
    import pyarrow.parquet as pq

    from document_extractor_ray.functions.bucketing import bucketed_agg

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    per_cust = bucketed_agg(orders, ["o_custkey"], [(None, "count", "c_count")])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["c_count"]), ["c_count"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"c_count": g["c_count"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("n", alias_name="custdist"))
    )
    # the histogram is bounded by max-orders-per-customer: driver-safe
    rows = hist.take_all()
    total = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    buyers = sum(r["custdist"] for r in rows)
    if total - buyers > 0:
        rows.append({"c_count": 0, "custdist": total - buyers})
    rows.sort(key=lambda r: (-r["custdist"], -r["c_count"]))
    return pa.table(
        {
            "c_count": pa.array([r["c_count"] for r in rows], pa.int64()),
            "custdist": pa.array([r["custdist"] for r in rows], pa.int64()),
        }
    )


Q13_CUSTOMER_DISTRIBUTION_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive brand x quantity-range predicate join
# ---------------------------------------------------------------------------

Q19_TERMS = (("Brand#12", 1, 11), ("Brand#23", 10, 20), ("Brand#5", 20, 30))
Q19_BROADCAST_LIMIT = 1_000_000


def q19_brand_qty_revenue(
    sf_dir: str, broadcast_limit: int = Q19_BROADCAST_LIMIT
):
    """Revenue from three (brand, quantity-range) bands (TPC-H Q19's
    OR-of-ANDs predicate pushed through a part join).  The quantity
    bound prunes lineitem BEFORE the part attach; the brand-filtered
    part side (3 of 25 brands) broadcasts via ray.put below
    ``broadcast_limit`` rows (partitioned hash join above); the band
    masks are vectorized is_in/between kernels; only 3 partial rows
    per block reach the final groupby."""
    from document_extractor_ray import state

    brands = [b for b, _, _ in Q19_TERMS]
    qty_max = max(hi for _, _, hi in Q19_TERMS)

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def brand_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["p_brand"], value_set=pa.array(brands)))

    dim = part.map_batches(brand_filter, batch_format="pyarrow").materialize()
    n_dim = dim.count()

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def slim(t: pa.Table) -> pa.Table:
        qty = pc.cast(
            pc.round(t["l_quantity"], round_mode="half_towards_infinity"), pa.int64()
        )
        t = t.append_column("qty", qty)
        t = t.filter(pc.less_equal(t["qty"], qty_max))
        dp = _to_cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table({"l_partkey": t["l_partkey"], "qty": t["qty"], "dp": dp})

    slimmed = li.map_batches(slim, batch_format="pyarrow")

    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "qty": pa.array([], pa.int64()),
            "dp": pa.array([], pa.int64()),
        }
    )

    if n_dim <= broadcast_limit:
        dim_tab = pa.concat_tables(
            [ray.get(r) for r in dim.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [
                pa.table(
                    {
                        "p_partkey": pa.array([], pa.int64()),
                        "p_brand": pa.array([], pa.string()),
                    }
                )
            ]
        ).combine_chunks()
        dim_ref = state.broadcast(dim_tab)

        def attach(t: pa.Table) -> pa.Table:
            t = state.lookup_join(
                t, "l_partkey", state.cached_get(dim_ref), "p_partkey", ["p_brand"]
            )
            t = t.filter(pc.is_valid(t["p_brand"]))
            return t.select(["p_brand", "qty", "dp"])

        tagged = slimmed.map_batches(attach, batch_format="pyarrow")
    else:
        j = slimmed.join(
            dim,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
            on=("l_partkey",),
            right_on=("p_partkey",),
        )

        def j_out(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "p_brand" not in set(t.column_names):
                return empty
            return t.select(["p_brand", "qty", "dp"])

        tagged = j.map_batches(j_out, batch_format="pyarrow")

    def band_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        mask = pa.array(np.zeros(t.num_rows, dtype=bool))
        for brand, lo, hi in Q19_TERMS:
            band = pc.and_(
                pc.equal(t["p_brand"], brand),
                pc.and_(
                    pc.greater_equal(t["qty"], lo), pc.less_equal(t["qty"], hi)
                ),
            )
            mask = pc.or_(mask, band)
        t = t.filter(mask)
        g = pa.TableGroupBy(t.select(["p_brand", "dp"]), ["p_brand"]).aggregate(
            [("dp", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "p_brand": g["p_brand"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "rev": g["dp_sum"],
            }
        )

    return (
        tagged.map_batches(band_partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Sum("n", alias_name="n_items"), Sum("rev", alias_name="revenue_cents")
        )
        .sort("p_brand")
    )


_Q19_PRED = " OR ".join(
    f"(p_brand = '{b}' AND qty BETWEEN {lo} AND {hi})" for b, lo, hi in Q19_TERMS
)

Q19_BRAND_QTY_REVENUE_SQL = f"""
WITH f AS (
  SELECT p.p_brand,
         CAST(round(l.l_quantity) AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT) AS dp
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand IN ({", ".join(repr(t[0]) for t in Q19_TERMS)})
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(dp) AS BIGINT) AS revenue_cents
FROM f
WHERE {_Q19_PRED}
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# CUSUM change detection over daily value sums (sequential control chart)
# ---------------------------------------------------------------------------

def value_cusum_alarms(sf_dir: str):
    """One-sided CUSUM control chart per event type over daily value
    sums: s_d = max(0, s_{d-1} + cents_d - k) with allowance k = the
    type's mean daily cents (floor-exact integer), alarm when s_d > k.
    The recurrence is inherently sequential, but only over the
    TIME-bounded (type x day) table: the data-sized fold is the daily
    partial aggregate inside map_batches; the per-type scan afterwards
    touches ~days rows however large the event stream grows.  Oracle:
    the same recurrence as a recursive CTE."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": day,
                "cents": _to_cents(t["value"]),
            }
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("cents", alias_name="cents"))
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )

    def cusum_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("day", "ascending")])
        t = t.take(idx)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        # k: floor-exact mean daily cents (positive sums; both engines
        # floor-divide positives identically)
        k = int(cents.sum()) // len(cents)
        s, out = 0, np.empty(len(cents), np.int64)
        for i, c in enumerate(cents):          # ~days iterations, time-bounded
            s = max(0, s + int(c) - k)
            out[i] = s
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": t["day"],
                "cusum_cents": pa.array(out, pa.int64()),
                "alarm": pa.array(out > k),
            }
        )

    return (
        daily.groupby("event_type")
        .map_groups(cusum_group, batch_format="pyarrow")
        .sort(["event_type", "day"])
    )


VALUE_CUSUM_ALARMS_SQL = """
WITH RECURSIVE daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
allowance AS (
  SELECT event_type, CAST(sum(cents) // count(*) AS BIGINT) AS k
  FROM daily GROUP BY 1
),
seq AS (
  SELECT d.event_type, d.day, d.cents, a.k,
         CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)
              AS BIGINT) AS rn
  FROM daily d JOIN allowance a ON a.event_type = d.event_type
),
cusum AS (
  SELECT event_type, day, rn, k,
         GREATEST(CAST(0 AS BIGINT), cents - k) AS s
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.day, n.rn, n.k,
         GREATEST(CAST(0 AS BIGINT), c.s + n.cents - n.k)
  FROM cusum c
  JOIN seq n ON n.event_type = c.event_type AND n.rn = c.rn + 1
)
SELECT event_type, day, CAST(s AS BIGINT) AS cusum_cents, s > k AS alarm
FROM cusum ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: nation market share of a part type's revenue by year
# ---------------------------------------------------------------------------

Q8_PART_TYPE = "ECONOMY"
Q8_BROADCAST_LIMIT = 1_000_000


def q8_market_share(sf_dir: str, broadcast_limit: int = Q8_BROADCAST_LIMIT):
    """Supplier-nation market share of ECONOMY-part revenue per order
    year (TPC-H Q8's multi-dim star join).  Share ships as the exact
    integer pair (nation_rev_cents, year_total_cents) — the division
    is the consumer's.  Join discipline: the part-type filter
    broadcasts as a KEY SET and prunes lineitem to ~1/6 BEFORE the one
    partitioned exchange (lineitem ⋈ orders on orderkey); the
    supplier→nation map broadcasts below ``broadcast_limit`` rows
    (2 slim int columns) and the 25-row nation dim always broadcasts;
    above budget both fall back to partitioned joins.  The final
    (year × nation)-bounded rollup gets its per-year total from a
    window fold over that bounded table, never from a second scan."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])

    def type_keys(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p_type"], Q8_PART_TYPE)).select(["p_partkey"])

    keys = part.map_batches(type_keys, batch_format="pyarrow").materialize()
    n_keys = keys.count()

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp_mat = supp.materialize()
    n_supp = supp_mat.count()

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    use_broadcast = n_keys <= broadcast_limit and n_supp <= broadcast_limit
    if use_broadcast:
        key_tab = pa.concat_tables(
            [ray.get(r) for r in keys.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [pa.table({"p_partkey": pa.array([], pa.int64())})]
        ).combine_chunks()
        supp_tab = pa.concat_tables(
            [ray.get(r) for r in supp_mat.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [
                pa.table(
                    {
                        "s_suppkey": pa.array([], pa.int64()),
                        "s_nationkey": pa.array([], pa.int32()),
                    }
                )
            ]
        ).combine_chunks()
        key_ref = state.broadcast(key_tab)
        supp_ref = state.broadcast(supp_tab)

        def prune(t: pa.Table) -> pa.Table:
            kt = state.cached_get(key_ref)
            t = t.filter(
                pc.is_in(t["l_partkey"], value_set=kt["p_partkey"].combine_chunks())
            )
            dp = _to_cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
            )
            t = pa.table(
                {"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"], "dp": dp}
            )
            t = state.lookup_join(
                t, "l_suppkey", state.cached_get(supp_ref), "s_suppkey", ["s_nationkey"]
            )
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "nk": pc.cast(t["s_nationkey"], pa.int64()),
                    "dp": t["dp"],
                }
            )

        pruned = li.map_batches(prune, batch_format="pyarrow")
    else:
        j0 = li.join(
            keys,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
            on=("l_partkey",),
            right_on=("p_partkey",),
        ).materialize()
        j1 = j0.join(
            supp_mat,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )

        def slim_j(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in set(t.column_names):
                return pa.table(
                    {
                        "l_orderkey": pa.array([], pa.int64()),
                        "nk": pa.array([], pa.int64()),
                        "dp": pa.array([], pa.int64()),
                    }
                )
            dp = _to_cents(
                pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
            )
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "nk": pc.cast(t["s_nationkey"], pa.int64()),
                    "dp": dp,
                }
            )

        pruned = j1.map_batches(slim_j, batch_format="pyarrow")

    pruned = _settle_nonempty(
        pruned,
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "nk": pa.array([], pa.int64()),
                "dp": pa.array([], pa.int64()),
            }
        ),
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def o_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "yr": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        )

    j = pruned.join(
        orders.map_batches(o_slim, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_partitions(f"{sf_dir}/orders.parquet"),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def agg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "yr" not in set(t.column_names):
            return pa.table(
                {
                    "yr": pa.array([], pa.int64()),
                    "nk": pa.array([], pa.int64()),
                    "rev": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(t.select(["yr", "nk", "dp"]), ["yr", "nk"]).aggregate(
            [("dp", "sum")]
        )
        return pa.table({"yr": g["yr"], "nk": g["nk"], "rev": g["dp_sum"]})

    agg = (
        j.map_batches(agg_partial, batch_format="pyarrow")
        .groupby(["yr", "nk"])
        .aggregate(Sum("rev", alias_name="nation_rev_cents"))
    )

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nref = state.broadcast(nation)

    def attach(t: pa.Table) -> pa.Table:
        t = t.append_column("nk32", pc.cast(t["nk"], pa.int32()))
        t = state.lookup_join(
            t, "nk32", state.cached_get(nref), "n_nationkey", ["n_name"], fill=""
        )
        return pa.table(
            {
                "year": t["yr"],
                "nation": t["n_name"],
                "nation_rev_cents": t["nation_rev_cents"],
            }
        )

    def year_total(t: pa.Table) -> pa.Table:
        tot = pc.sum(t["nation_rev_cents"]).as_py() or 0
        return t.append_column(
            "year_total_cents", pa.array(np.full(t.num_rows, tot, np.int64), pa.int64())
        )

    return (
        agg.map_batches(attach, batch_format="pyarrow")
        .groupby("year")
        .map_groups(year_total, batch_format="pyarrow")
        .sort(["year", "nation"])
    )


Q8_MARKET_SHARE_SQL = f"""
WITH f AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year, s.s_nationkey AS nk,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0) AS BIGINT) AS dp
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{Q8_PART_TYPE}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
),
agg AS (
  SELECT year, nk, CAST(sum(dp) AS BIGINT) AS nation_rev_cents
  FROM f GROUP BY 1, 2
)
SELECT a.year, n.n_name AS nation, a.nation_rev_cents,
       CAST(sum(a.nation_rev_cents) OVER (PARTITION BY a.year) AS BIGINT)
         AS year_total_cents
FROM agg a JOIN nation n ON n.n_nationkey = a.nk
ORDER BY year, nation
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who alone shipped late on multi-supplier orders
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 60
Q21_TOP = 20
Q21_BROADCAST_LIMIT = 1_000_000


def q21_waiting_suppliers(
    sf_dir: str, broadcast_limit: int = Q21_BROADCAST_LIMIT
):
    """Suppliers who were the SOLE late shipper on a finished
    multi-supplier order (TPC-H Q21's semi+anti join stack; the
    synthetic lineitem has no commit/receipt dates, so late =
    shipdate > orderdate + 60d, and 'finished' = o_orderstatus 'F').
    Plan: status-filtered orders broadcast below budget (partitioned
    join above); per-(orderkey, suppkey) late flags then per-orderkey
    (n_supp, n_late, sole-late suppkey) both fold through
    ``bucketed_agg`` — pair keys grow with data; the EXISTS/NOT-EXISTS
    pair of the original collapses into the n_supp>1 AND n_late=1
    filter on that fold; supplier names attach via broadcast dim."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    late_us = Q21_LATE_DAYS * 86_400_000_000

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"])

    def f_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pc.cast(pc.cast(t["o_orderdate"], pa.int64()), pa.int64()),
            }
        )

    fo = orders.map_batches(f_orders, batch_format="pyarrow").materialize()
    n_fo = fo.count()

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    flag_empty = pa.table(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "l_suppkey": pa.array([], pa.int64()),
            "late": pa.array([], pa.int64()),
        }
    )

    if n_fo <= broadcast_limit:
        fo_tab = pa.concat_tables(
            [ray.get(r) for r in fo.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [
                pa.table(
                    {
                        "o_orderkey": pa.array([], pa.int64()),
                        "odate_us": pa.array([], pa.int64()),
                    }
                )
            ]
        ).combine_chunks()
        fo_ref = state.broadcast(fo_tab)

        def flags(t: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "ship_us": pc.cast(pc.cast(t["l_shipdate"], pa.int64()), pa.int64()),
                }
            )
            t = state.lookup_join(
                t, "l_orderkey", state.cached_get(fo_ref), "o_orderkey", ["odate_us"]
            )
            t = t.filter(pc.is_valid(t["odate_us"]))
            late = pc.cast(
                pc.greater(t["ship_us"], pc.add(t["odate_us"], late_us)), pa.int64()
            )
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "late": late,
                }
            )

        flagged = li.map_batches(flags, batch_format="pyarrow")
    else:
        jf = li.join(
            fo,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/lineitem.parquet"),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def flags_j(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in set(t.column_names):
                return flag_empty
            ship = pc.cast(pc.cast(t["l_shipdate"], pa.int64()), pa.int64())
            late = pc.cast(pc.greater(ship, pc.add(t["odate_us"], late_us)), pa.int64())
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_suppkey": t["l_suppkey"],
                    "late": late,
                }
            )

        flagged = jf.map_batches(flags_j, batch_format="pyarrow")

    per_pair = bucketed_agg(
        flagged, ["l_orderkey", "l_suppkey"], [("late", "max", "late")]
    )

    def pair_prep(t: pa.Table) -> pa.Table:
        late_supp = pc.if_else(
            pc.equal(t["late"], 1), t["l_suppkey"], pa.scalar(-1, pa.int64())
        )
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "late": t["late"],
                "late_supp": late_supp,
            }
        )

    per_order = bucketed_agg(
        per_pair.map_batches(pair_prep, batch_format="pyarrow"),
        ["l_orderkey"],
        [
            ("one", "sum", "n_supp"),
            ("late", "sum", "n_late"),
            ("late_supp", "max", "late_supp"),
        ],
    )

    def waiting_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater(t["n_supp"], 1), pc.equal(t["n_late"], 1))
        )
        g = pa.TableGroupBy(t.select(["late_supp"]), ["late_supp"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"late_supp": g["late_supp"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    counts = (
        per_order.map_batches(waiting_partial, batch_format="pyarrow")
        .groupby("late_supp")
        .aggregate(Sum("n", alias_name="numwait"))
    )

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    sref = state.broadcast(supp)

    def attach(t: pa.Table) -> pa.Table:
        t = state.lookup_join(
            t, "late_supp", state.cached_get(sref), "s_suppkey", ["s_name"], fill=""
        )
        return t.select(["s_name", "numwait"])

    return (
        counts.map_batches(attach, batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(Q21_TOP)
    )


Q21_WAITING_SUPPLIERS_SQL = f"""
WITH f AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > f.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN f ON f.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
po AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late,
         max(CASE WHEN late = 1 THEN l_suppkey ELSE -1 END) AS late_supp
  FROM ls GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM po JOIN supplier s ON s.s_suppkey = po.late_supp
WHERE n_supp > 1 AND n_late = 1
GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT {Q21_TOP}
"""


# ---------------------------------------------------------------------------
# Per-user event-type entropy (behavioral diversity, micro-nat integers)
# ---------------------------------------------------------------------------

def user_event_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type mix, shipped as the
    exact integer numerator ent_num = Σ_c m_c·(L(n) − L(m_c)) with
    L(v) = round(ln(v)·1e6) — bots and single-action users score 0,
    diverse users approach ln(n_types).  Scale shape: the (user, type)
    fold is key-per-row so it runs through ``bucketed_agg``; the
    per-user reduce then happens inside the SAME hash partition via a
    numpy reduceat over user runs (types-per-user is bounded), ln
    values memoized per distinct count."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg, part_of_int64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    per_ut = bucketed_agg(
        ds, ["user_id", "event_type"], [(None, "count", "m")]
    )
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "m": t["m"],
                "part": part_of_int64(u, n_parts),
            }
        )

    def ent_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "ent_num": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        u = t["user_id"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        u, m = u[order], m[order]
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        totals = np.add.reduceat(m, starts)
        # memoized micro-ln over the distinct counts in this partition
        vals = np.unique(np.concatenate([m, totals]))
        lut = {int(v): int(math.floor(math.log(v) * 1_000_000 + 0.5)) for v in vals}
        lm = np.array([lut[int(v)] for v in m], np.int64)
        ln_tot = np.array([lut[int(v)] for v in totals], np.int64)
        seg = np.cumsum(new) - 1
        terms = m * (ln_tot[seg] - lm)
        ent = np.add.reduceat(terms, starts)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_events": pa.array(totals.astype(np.int64), pa.int64()),
                "ent_num": pa.array(ent.astype(np.int64), pa.int64()),
            }
        )

    return (
        per_ut.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda t: ent_part(t.drop_columns(["part"])), batch_format="pyarrow"
        )
        .sort("user_id")
    )


USER_EVENT_ENTROPY_SQL = """
WITH cnt AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS m
  FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, CAST(sum(m) AS BIGINT) AS n FROM cnt GROUP BY 1)
SELECT cnt.user_id, t.n AS n_events,
       CAST(sum(m * (CAST(round(ln(t.n) * 1000000) AS BIGINT)
                     - CAST(round(ln(m) * 1000000) AS BIGINT))) AS BIGINT)
         AS ent_num
FROM cnt JOIN tot t ON t.user_id = cnt.user_id
GROUP BY cnt.user_id, t.n
ORDER BY cnt.user_id
"""


# ---------------------------------------------------------------------------
# Daily-count trend slope per event type (exact integer least squares)
# ---------------------------------------------------------------------------

def events_trend_slope(sf_dir: str):
    """Linear trend of daily event counts per type, shipped as the
    exact integer pair (slope_num, slope_den) = (n·Σxy − ΣxΣy,
    n·Σxx − Σx²) over (day_index, count) points — the growth/decay
    detector behind traffic alerting, with no float regression on
    either engine.  Scale shape: the data-sized work is the daily
    count partial fold; the regression touches only the TIME-bounded
    (type × day) table inside one map_groups."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pc.floor_temporal(t["ts"], unit="day"),
            }
        )

    daily = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="y"))
        .map_batches(_ts_us("day"), batch_format="pyarrow")
    )

    def fit(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("day", "ascending")])
        t = t.take(idx)
        y = [int(v) for v in t["y"].to_numpy(zero_copy_only=False)]
        n = len(y)
        sx = sy = sxy = sxx = 0
        for x, yv in enumerate(y):          # time-bounded (~days) loop
            sx += x
            sy += yv
            sxy += x * yv
            sxx += x * x
        return pa.table(
            {
                "event_type": t["event_type"].slice(0, 1),
                "n_days": pa.array([n], pa.int64()),
                "slope_num": pa.array([n * sxy - sx * sy], pa.int64()),
                "slope_den": pa.array([n * sxx - sx * sx], pa.int64()),
            }
        )

    return (
        daily.groupby("event_type")
        .map_groups(fit, batch_format="pyarrow")
        .sort("event_type")
    )


EVENTS_TREND_SLOPE_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
              AS BIGINT) AS x
  FROM daily
),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM seq GROUP BY 1
)
SELECT event_type, n_days,
       CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Event-type affinity matrix (bitmask fold — no user self-join)
# ---------------------------------------------------------------------------

def event_type_affinity(sf_dir: str):
    """How many USER-DAYS exhibit each PAIR of event types (plus
    per-type user-day counts) — the behavioral co-occurrence matrix
    behind feature bundling (user-day granularity so the matrix stays
    informative on long histories where every user eventually does
    everything).  Scale shape: the event-type catalog is a bounded
    constant, so the all-pairs self-join collapses into the bitmask
    fold (``bitmask_pair_counts``): distinct (user, day, type) rows
    OR into one int64 mask per user-day, only the mask HISTOGRAM
    leaves the shuffle, and the driver expands pair counts with one
    popcount pass — nothing pair-shaped ever moves."""
    from document_extractor_ray.functions.bucketing import (
        bitmask_pair_counts,
        bucketed_agg,
    )

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    type_rows = (
        bucketed_agg(ds.select_columns(["event_type"]), ["event_type"], [(None, "count", "n")])
        .select_columns(["event_type"])
        .take_all()
    )
    types = sorted(r["event_type"] for r in type_rows)
    code_of = {s: i for i, s in enumerate(types)}

    def explode(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        codes = np.array(
            [code_of[s] for s in t["event_type"].to_pylist()], np.int64
        )
        trip = np.unique(np.stack([u, day, codes], axis=1), axis=0)
        return pa.table(
            {
                "u": pa.array(trip[:, 0], pa.int64()),
                "day": pa.array(trip[:, 1], pa.int64()),
                "code": pa.array(trip[:, 2], pa.int64()),
            }
        )

    pair_counts, code_counts = bitmask_pair_counts(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["u", "day"],
        "code",
        len(types),
    )
    out_a, out_b, out_both, out_na, out_nb = [], [], [], [], []
    for (i, j), n_both in sorted(pair_counts.items()):
        out_a.append(types[i])
        out_b.append(types[j])
        out_both.append(n_both)
        out_na.append(code_counts.get(i, 0))
        out_nb.append(code_counts.get(j, 0))
    return pa.table(
        {
            "type_a": pa.array(out_a, pa.string()),
            "type_b": pa.array(out_b, pa.string()),
            "n_udays_both": pa.array(out_both, pa.int64()),
            "n_udays_a": pa.array(out_na, pa.int64()),
            "n_udays_b": pa.array(out_nb, pa.int64()),
        }
    )


EVENT_TYPE_AFFINITY_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type FROM events
),
tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_udays_both,
       CAST(min(ta.n) AS BIGINT) AS n_udays_a,
       CAST(min(tb.n) AS BIGINT) AS n_udays_b
FROM ut a
JOIN ut b ON b.user_id = a.user_id AND b.day = a.day
         AND a.event_type < b.event_type
JOIN tc ta ON ta.event_type = a.event_type
JOIN tc tb ON tb.event_type = b.event_type
GROUP BY 1, 2
HAVING count(*) > 0
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Recency-decayed user value (exact integer halving per week)
# ---------------------------------------------------------------------------

def user_decay_scores(sf_dir: str):
    """Recency-weighted user value: each event's cents contribute
    cents >> weeks_ago (halved per week of age, exact integer — no
    irrational decay factor ever exists on either engine).  The
    recency-LTV score feeding churn models.  Two passes, q22-style:
    pass 1 folds the corpus max day to ONE driver scalar; pass 2
    broadcasts it in the closure and folds per-user sums through
    ``bucketed_agg`` (user keys grow with data)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    WEEK_US = 7 * 86_400_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def max_partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        m = pc.max(pc.cast(day, pa.int64())).as_py()
        return pa.table({"m": pa.array([m if m is not None else 0], pa.int64())})

    max_us = max(
        r["m"]
        for r in ds.map_batches(max_partial, batch_format="pyarrow").take_all()
    )

    def decay(t: pa.Table) -> pa.Table:
        day_us = pc.cast(
            pc.floor_temporal(t["ts"], unit="day"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        w = np.minimum((max_us - day_us) // WEEK_US, 62).astype(np.int64)
        dec = cents >> w        # positive cents: >> w == // 2^w
        return pa.table(
            {"user_id": t["user_id"], "dec": pa.array(dec, pa.int64())}
        )

    return bucketed_agg(
        ds.map_batches(decay, batch_format="pyarrow"),
        ["user_id"],
        [("dec", "sum", "decay_cents")],
    ).sort("user_id")


USER_DECAY_SCORES_SQL = """
WITH mx AS (SELECT max(date_trunc('day', ts)) AS m FROM events),
e AS (
  SELECT user_id,
         CAST(round(value * 100.0) AS BIGINT) AS cents,
         CAST(least(date_diff('day', date_trunc('day', ts),
                              (SELECT m FROM mx)) // 7, 62) AS BIGINT) AS w
  FROM events
)
SELECT user_id,
       CAST(sum(cents // (CAST(1 AS BIGINT) << w)) AS BIGINT) AS decay_cents
FROM e GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Supplier revenue concentration per nation (exact HHI ingredients)
# ---------------------------------------------------------------------------

SUPPLIER_CONC_BROADCAST_LIMIT = 1_000_000


def supplier_concentration(
    sf_dir: str, broadcast_limit: int = SUPPLIER_CONC_BROADCAST_LIMIT
):
    """Herfindahl concentration ingredients of supplier revenue within
    each nation: (n_suppliers, total_rev_dollars, hhi_num = Σ rev_d²)
    — HHI = hhi_num / total² is the consumer's float; everything
    shipped is an exact integer (dollars, floor-rounded from cents,
    keep Σrev² inside int64 headroom).  Scale shape: the per-supplier
    fold is key-per-row (``bucketed_agg``); the supplier→nation map
    broadcasts below budget (partitioned join above); only 25 nation
    rows leave the final shuffle."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def slim(t: pa.Table) -> pa.Table:
        dp = _to_cents(
            pc.multiply(t["l_extendedprice"], pc.subtract(1.0, t["l_discount"]))
        )
        return pa.table({"l_suppkey": t["l_suppkey"], "dp": dp})

    per_supp = bucketed_agg(
        li.map_batches(slim, batch_format="pyarrow"),
        ["l_suppkey"],
        [("dp", "sum", "cents")],
    )

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).materialize()
    n_supp = supp.count()

    if n_supp <= broadcast_limit:
        supp_tab = pa.concat_tables(
            [ray.get(r) for r in supp.to_arrow_refs() if ray.get(r).num_rows > 0]
            or [
                pa.table(
                    {
                        "s_suppkey": pa.array([], pa.int64()),
                        "s_nationkey": pa.array([], pa.int32()),
                    }
                )
            ]
        ).combine_chunks()
        sref = state.broadcast(supp_tab)

        def attach_nk(t: pa.Table) -> pa.Table:
            t = state.lookup_join(
                t, "l_suppkey", state.cached_get(sref), "s_suppkey", ["s_nationkey"]
            )
            t = t.filter(pc.is_valid(t["s_nationkey"]))
            return pa.table(
                {"nk": pc.cast(t["s_nationkey"], pa.int64()), "cents": t["cents"]}
            )

        tagged = per_supp.map_batches(attach_nk, batch_format="pyarrow")
    else:
        j = per_supp.join(
            supp,
            join_type="inner",
            num_partitions=_join_partitions(f"{sf_dir}/supplier.parquet"),
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )

        def j_out(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "cents" not in set(t.column_names):
                return pa.table(
                    {"nk": pa.array([], pa.int64()), "cents": pa.array([], pa.int64())}
                )
            return pa.table(
                {"nk": pc.cast(t["s_nationkey"], pa.int64()), "cents": t["cents"]}
            )

        tagged = j.map_batches(j_out, batch_format="pyarrow")

    def conc_partial(t: pa.Table) -> pa.Table:
        rev_d = pc.divide(t["cents"], 100)
        sq = pc.multiply(rev_d, rev_d)
        g = pa.TableGroupBy(
            pa.table({"nk": t["nk"], "rev_d": rev_d, "sq": sq}), ["nk"]
        ).aggregate([([], "count_all"), ("rev_d", "sum"), ("sq", "sum")])
        return pa.table(
            {
                "nk": g["nk"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "rev": g["rev_d_sum"],
                "sq": g["sq_sum"],
            }
        )

    # partials are nation-bounded (<= 25 rows per block): fold on the
    # driver instead of paying two more exchanges (a hash aggregate +
    # a sort cost ~1.5 s fixed each at this scale — PERF step 29)
    parts = tagged.map_batches(conc_partial, batch_format="pyarrow").take_all()
    acc: dict[int, list[int]] = {}
    for r in parts:
        a = acc.setdefault(int(r["nk"]), [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["rev"])
        a[2] += int(r["sq"])

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    name_of = dict(
        zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
        )
    )
    rows = sorted((name_of.get(nk, ""), v) for nk, v in acc.items())
    return pa.table(
        {
            "nation": pa.array([r[0] for r in rows], pa.string()),
            "n_suppliers": pa.array([r[1][0] for r in rows], pa.int64()),
            "total_rev_dollars": pa.array([r[1][1] for r in rows], pa.int64()),
            "hhi_num": pa.array([r[1][2] for r in rows], pa.int64()),
        }
    )


SUPPLIER_CONCENTRATION_SQL = """
WITH rs AS (
  SELECT s.s_nationkey AS nk, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
                       AS BIGINT)) // 100 AS BIGINT) AS rev_d
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(rev_d) AS BIGINT) AS total_rev_dollars,
       CAST(sum(rev_d * rev_d) AS BIGINT) AS hhi_num
FROM rs JOIN nation n ON n.n_nationkey = rs.nk
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Key-skew audit (pre-shuffle hot-key diagnosis via count-of-counts)
# ---------------------------------------------------------------------------

def key_skew_audit(sf_dir: str, table: str = "orders", key: str = "o_custkey"):
    """Skew profile of a shuffle key BEFORE paying for the shuffle:
    key count, total rows, max/p50/p99 per-key row counts (exact,
    derived from the count-of-counts histogram) and the smallest
    hottest key.  This is the audit a planner runs to decide between
    plain hash partitioning and salting.  Scale shape: the per-key
    fold is ``bucketed_agg``; everything after it is the count
    HISTOGRAM — bounded by distinct per-key counts, never key count —
    plus one broadcast-scalar pass to find the hottest key."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, table, columns=[key])
    per_key = bucketed_agg(ds, [key], [(None, "count", "c")]).materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["c"]), ["c"]).aggregate([([], "count_all")])
        return pa.table({"c": g["c"], "nk": pc.cast(g["count_all"], pa.int64())})

    hist = sorted(
        (
            per_key.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("c")
            .aggregate(Sum("nk", alias_name="nk"))
        ).take_all(),
        key=lambda r: r["c"],
    )  # bounded by distinct count values
    n_keys = sum(r["nk"] for r in hist)
    total = sum(r["c"] * r["nk"] for r in hist)
    max_count = hist[-1]["c"] if hist else 0

    def quantile(q_num: int, q_den: int) -> int:
        cum = 0
        for r in hist:
            cum += r["nk"]
            if cum * q_den >= q_num * n_keys:
                return r["c"]
        return max_count

    def top_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c"], max_count))
        m = pc.min(t[key]).as_py()
        if m is None:
            return pa.table({"k": pa.array([], pa.int64())})
        return pa.table({"k": pa.array([m], pa.int64())})

    tops = per_key.map_batches(top_partial, batch_format="pyarrow").take_all()
    top_key = min(r["k"] for r in tops) if tops else 0

    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "total_rows": pa.array([total], pa.int64()),
            "max_count": pa.array([max_count], pa.int64()),
            "p50_count": pa.array([quantile(1, 2)], pa.int64()),
            "p99_count": pa.array([quantile(99, 100)], pa.int64()),
            "top_key": pa.array([top_key], pa.int64()),
        }
    )


KEY_SKEW_AUDIT_SQL = """
WITH per_key AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1
),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM per_key GROUP BY 1),
tot AS (
  SELECT CAST(sum(nk) AS BIGINT) AS n_keys,
         CAST(sum(c * nk) AS BIGINT) AS total_rows,
         CAST(max(c) AS BIGINT) AS max_count
  FROM hist
),
cum AS (
  SELECT c, sum(nk) OVER (ORDER BY c) AS cum,
         (SELECT n_keys FROM tot) AS nk
  FROM hist
)
SELECT t.n_keys, t.total_rows, t.max_count,
       CAST((SELECT min(c) FROM cum WHERE cum * 2 >= nk) AS BIGINT) AS p50_count,
       CAST((SELECT min(c) FROM cum WHERE cum * 100 >= 99 * nk) AS BIGINT) AS p99_count,
       CAST((SELECT min(k) FROM per_key WHERE c = t.max_count) AS BIGINT) AS top_key
FROM tot t
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: late-shipment priority split per line status
# ---------------------------------------------------------------------------

Q12_LATE_DAYS = 60


def q12_late_linestatus(sf_dir: str):
    """High- vs low-priority lineitem counts among LATE shipments,
    grouped by line status (TPC-H Q12's conditional-count join; the
    synthetic lineitem has no shipmode/commit/receipt columns, so
    l_linestatus plays the shipmode role and late = shipdate >
    orderdate + 60d).  One partitioned hash join of two slim int/str
    projections; the CASE-WHEN counts fold per batch so only
    (status × 2) partials leave each block."""
    late_us = Q12_LATE_DAYS * 86_400_000_000
    high = pa.array(["1-URGENT", "2-HIGH"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate", "l_linestatus"])

    def li_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(pc.cast(t["l_shipdate"], pa.int64()), pa.int64()),
                "l_linestatus": t["l_linestatus"],
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "odate_us": pc.cast(pc.cast(t["o_orderdate"], pa.int64()), pa.int64()),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    j = li.map_batches(li_slim, batch_format="pyarrow").join(
        orders.map_batches(o_slim, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=_join_partitions(
            f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
        ),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def split_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_linestatus": pa.array([], pa.string()),
                "hi": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "l_linestatus" not in set(t.column_names):
            return empty
        t = t.filter(pc.greater(t["ship_us"], pc.add(t["odate_us"], late_us)))
        is_hi = pc.cast(pc.is_in(t["o_orderpriority"], value_set=high), pa.int64())
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_linestatus": t["l_linestatus"],
                    "hi": is_hi,
                    "lo": pc.subtract(1, is_hi),
                }
            ),
            ["l_linestatus"],
        ).aggregate([("hi", "sum"), ("lo", "sum")])
        return pa.table(
            {"l_linestatus": g["l_linestatus"], "hi": g["hi_sum"], "lo": g["lo_sum"]}
        )

    # partials are status-bounded (<= 2 rows per block): driver fold
    # instead of two more exchanges (PERF step 32)
    acc: dict[str, list[int]] = {}
    for r in j.map_batches(split_partial, batch_format="pyarrow").take_all():
        a = acc.setdefault(r["l_linestatus"], [0, 0])
        a[0] += int(r["hi"])
        a[1] += int(r["lo"])
    rows = sorted(acc.items())
    return pa.table(
        {
            "l_linestatus": pa.array([k for k, _ in rows], pa.string()),
            "high_line_count": pa.array([v[0] for _, v in rows], pa.int64()),
            "low_line_count": pa.array([v[1] for _, v in rows], pa.int64()),
        }
    )


Q12_LATE_LINESTATUS_SQL = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL {Q12_LATE_DAYS} DAY
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Persistent heavy hitters (per-day top-k users, persistence across days)
# ---------------------------------------------------------------------------

HEAVY_TOP_K = 5
HEAVY_MIN_DAYS = 3


def persistent_heavy_users(
    sf_dir: str, k: int = HEAVY_TOP_K, min_days: int = HEAVY_MIN_DAYS
):
    """Users who appear in the per-day top-k by event count on at
    least ``min_days`` distinct days — the "persistent heavy hitter"
    report an abuse/quota pipeline runs (one-day spikes are noise; a
    user who tops the chart day after day is a behavior).  Ties break
    (count DESC, user_id ASC), identical to the oracle's row_number().

    Scale shape: the (day, user) fold is key-per-row
    (``bucketed_agg``); each resolved block then keeps only its LOCAL
    top-k per day — top-k is a monotone selector, so the global top-k
    is inside the union of per-block top-ks — leaving ≤ days·k rows
    per block; the driver re-selects and counts persistence over that
    bounded set (PERF 32)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t["ts"], unit="day"),
                "user_id": t["user_id"],
            }
        )

    du = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day", "user_id"],
        [(None, "count", "cnt")],
    )

    def _topk_per_day(
        d: np.ndarray, u: np.ndarray, c: np.ndarray, kk: int
    ) -> np.ndarray:
        order = np.lexsort((u, -c, d))
        ds_, n = d[order], len(order)
        starts = np.flatnonzero(
            np.concatenate(([True], ds_[1:] != ds_[:-1]))
        )
        rank = np.arange(n) - np.repeat(
            starts, np.diff(np.append(starts, n))
        )
        return order[rank < kk]

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        d = t["day"].to_numpy(zero_copy_only=False).view(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        return t.take(pa.array(_topk_per_day(d, u, c, k)))

    parts = du.map_batches(block_topk, batch_format="pyarrow").take_all()
    if not parts:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "days_in_topk": pa.array([], pa.int64()),
                "topk_events": pa.array([], pa.int64()),
            }
        )
    d = np.array([r["day"] for r in parts], "datetime64[us]").view(np.int64)
    u = np.array([r["user_id"] for r in parts], np.int64)
    c = np.array([r["cnt"] for r in parts], np.int64)
    sel = _topk_per_day(d, u, c, k)
    u, c = u[sel], c[sel]
    users, inv = np.unique(u, return_inverse=True)
    days = np.bincount(inv)
    ev = np.bincount(inv, weights=c).astype(np.int64)
    keep = days >= min_days
    order = np.lexsort((users[keep], -days[keep]))
    return pa.table(
        {
            "user_id": pa.array(users[keep][order], pa.int64()),
            "days_in_topk": pa.array(days[keep][order].astype(np.int64)),
            "topk_events": pa.array(ev[keep][order]),
        }
    )


PERSISTENT_HEAVY_USERS_SQL = f"""
WITH du AS (
  SELECT date_trunc('day', ts) AS day, user_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT day, user_id, cnt,
         row_number() OVER (PARTITION BY day
                            ORDER BY cnt DESC, user_id) AS r
  FROM du
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS days_in_topk,
       CAST(sum(cnt) AS BIGINT) AS topk_events
FROM rk WHERE r <= {HEAVY_TOP_K}
GROUP BY 1 HAVING count(*) >= {HEAVY_MIN_DAYS}
ORDER BY days_in_topk DESC, user_id
"""


# ---------------------------------------------------------------------------
# Interval sweep-line: concurrently-shipping orders per day
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def shipping_open_orders(sf_dir: str):
    """Orders whose shipping window [min(l_shipdate), max(l_shipdate)]
    covers each boundary day — the interval-overlap sweep-line that a
    capacity planner runs (how many orders are in flight at once).
    Purely lineitem-derived, so orders without lines (257 exist at
    sf0.01) never enter, identically in Ray and the oracle.

    Scale shape: one key-per-row min+max fold per order
    (``bucketed_agg``); each resolved block collapses its windows to
    per-day ±1 deltas (day-bounded partials); the driver folds the
    ~distinct-days-sized delta table and prefix-sums it — the classic
    sweep-line, never materializing order-level intervals."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    w = bucketed_agg(
        li,
        ["l_orderkey"],
        [("l_shipdate", "min", "s"), ("l_shipdate", "max", "e")],
    )

    def deltas(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"day": pa.array([], pa.int64()), "delta": pa.array([], pa.int64())}
            )
        s = (
            pc.floor_temporal(t["s"], unit="day")
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        e = (
            pc.floor_temporal(t["e"], unit="day")
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        ) + _DAY_US
        day = np.concatenate([s, e])
        dl = np.concatenate(
            [np.ones(len(s), np.int64), -np.ones(len(e), np.int64)]
        )
        g = pa.TableGroupBy(
            pa.table({"day": pa.array(day), "delta": pa.array(dl)}), ["day"]
        ).aggregate([("delta", "sum")])
        return pa.table({"day": g["day"], "delta": g["delta_sum"]})

    parts = w.map_batches(deltas, batch_format="pyarrow").take_all()
    acc: dict[int, int] = {}
    for r in parts:
        acc[int(r["day"])] = acc.get(int(r["day"]), 0) + int(r["delta"])
    days = sorted(acc)
    vals = np.cumsum([acc[d] for d in days]).astype(np.int64)
    return pa.table(
        {
            "day": pa.array(np.array(days, np.int64)).cast(pa.timestamp("us")),
            "open_orders": pa.array(vals),
        }
    )


SHIPPING_OPEN_ORDERS_SQL = """
WITH w AS (
  SELECT l_orderkey, min(l_shipdate) AS s, max(l_shipdate) AS e
  FROM lineitem GROUP BY 1
),
b AS (
  SELECT date_trunc('day', s) AS day, 1 AS d FROM w
  UNION ALL
  SELECT date_trunc('day', e) + INTERVAL 1 DAY AS day, -1 AS d FROM w
),
agg AS (SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM b GROUP BY 1)
SELECT day, CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM agg ORDER BY day
"""


# ---------------------------------------------------------------------------
# Last-touch attribution (strictly-preceding non-purchase event per purchase)
# ---------------------------------------------------------------------------


def attribution_last_touch(sf_dir: str):
    """Marketing-style last-touch attribution: each purchase credits
    the user's most recent STRICTLY earlier non-purchase event type
    ('none' if the purchase is the user's first event), reporting
    purchases and purchase value per credited type.  Ties cannot
    occur: ordering is (ts, event_id) and event_id is unique.

    Scale shape: the sessionize pattern — one shuffle on a HASH BUCKET
    of user_id (never user_id itself), then the whole partition's
    forward-fill is two vectorized pandas groupby passes (ffill +
    shift); per-partition output is type-bounded (≤ 6 rows), folded on
    the driver (PERF 32)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        s = g["event_type"].where(g["event_type"] != "purchase")
        filled = s.groupby(g["user_id"], sort=False).ffill()
        src = filled.groupby(g["user_id"], sort=False).shift(1)
        buy = g["event_type"] == "purchase"
        cents = _to_cents(pa.array(g.loc[buy, "value"].to_numpy())).to_numpy(
            zero_copy_only=False
        )
        out = pd.DataFrame(
            {"src": src[buy].fillna("none").to_numpy(), "cents": cents}
        )
        agg = out.groupby("src", sort=True).agg(
            n_purchases=("cents", "size"), purchase_value_cents=("cents", "sum")
        )
        return agg.reset_index()

    parts = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .take_all()
    )
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["src"], [0, 0])
        a[0] += int(r["n_purchases"])
        a[1] += int(r["purchase_value_cents"])
    keys = sorted(acc)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_purchases": pa.array([acc[k][0] for k in keys], pa.int64()),
            "purchase_value_cents": pa.array(
                [acc[k][1] for k in keys], pa.int64()
            ),
        }
    )


ATTRIBUTION_LAST_TOUCH_SQL = """
WITH w AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src
  FROM events
)
SELECT coalesce(src, 'none') AS event_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS purchase_value_cents
FROM w WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Exact join-cardinality profile without executing the join
# ---------------------------------------------------------------------------


def join_size_exact(sf_dir: str):
    """EXACT output cardinality of orders ⋈ lineitem on orderkey plus
    per-side and common key counts — computed from per-key count
    tables, never by materializing the join (the planner-statistics
    primitive: Σ_k n_o(k)·n_l(k)).

    Scale shape: each side is one key-per-row ``bucketed_agg``; the
    two count tables are tagged and UNIONed so the final merge is ONE
    more bucketed pass co-partitioned on the key; every block then
    collapses to a single partial row folded on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    o = _read(sf_dir, "orders", columns=["o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"],
                "n_o": pa.array(np.ones(t.num_rows, np.int64)),
                "n_l": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["l_orderkey"],
                "n_o": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_l": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    both = o.map_batches(tag_o, batch_format="pyarrow").union(
        li.map_batches(tag_l, batch_format="pyarrow")
    )
    merged = bucketed_agg(
        both, ["k"], [("n_o", "sum", "n_o"), ("n_l", "sum", "n_l")]
    )

    def fold(t: pa.Table) -> pa.Table:
        no = t["n_o"].to_numpy(zero_copy_only=False)
        nl = t["n_l"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "orders_keys": pa.array([int((no > 0).sum())], pa.int64()),
                "lineitem_keys": pa.array([int((nl > 0).sum())], pa.int64()),
                "common_keys": pa.array(
                    [int(((no > 0) & (nl > 0)).sum())], pa.int64()
                ),
                "join_rows": pa.array([int((no * nl).sum())], pa.int64()),
            }
        )

    parts = merged.map_batches(fold, batch_format="pyarrow").take_all()
    tot = [0, 0, 0, 0]
    for r in parts:
        tot[0] += int(r["orders_keys"])
        tot[1] += int(r["lineitem_keys"])
        tot[2] += int(r["common_keys"])
        tot[3] += int(r["join_rows"])
    return pa.table(
        {
            "orders_keys": pa.array([tot[0]], pa.int64()),
            "lineitem_keys": pa.array([tot[1]], pa.int64()),
            "common_keys": pa.array([tot[2]], pa.int64()),
            "join_rows": pa.array([tot[3]], pa.int64()),
        }
    )


JOIN_SIZE_EXACT_SQL = """
WITH o AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_o
           FROM orders GROUP BY 1),
l AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_l
      FROM lineitem GROUP BY 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM o) AS orders_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM l) AS lineitem_keys,
       (SELECT CAST(count(*) AS BIGINT) FROM o JOIN l USING (k)) AS common_keys,
       (SELECT CAST(coalesce(sum(n_o * n_l), 0) AS BIGINT)
        FROM o JOIN l USING (k)) AS join_rows
"""


# ---------------------------------------------------------------------------
# Value-decile × event-type independence audit (exact chi-square numerators)
# ---------------------------------------------------------------------------


def value_type_chi2(sf_dir: str):
    """Contingency of GLOBAL value decile × event type with the exact
    chi-square ingredients per cell — chi² = Σ chi2_num/chi2_den with
    chi2_num = (N·o − r·c)² and chi2_den = r·c·N, all integers so the
    oracle matches bit for bit (int64-safe while N·o < ~3·10⁹; beyond
    that rescale to per-mille expected counts).  Tests whether value
    magnitude is independent of event type — the drift check before
    trusting a type-stratified sampler.  Decile is rank_min-based
    (ties share a decile), the value_decile_assign convention.

    Scale shape: pass 1 folds the GLOBAL (cents → count) table
    (value-domain-bounded, the value_decile_assign/median shape) and
    broadcasts the cents→decile step function; pass 2 assigns deciles
    with one searchsorted per batch and pre-counts (decile, type)
    cells; the ≤ 10·|types| cell table folds on the driver."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"cents": _to_cents(t["value"])}), ["cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"cents": g["cents"], "n_part": pc.cast(g["count_all"], pa.int64())}
        )

    cnt = bucketed_agg(
        ds.map_batches(cents_partial, batch_format="pyarrow"),
        ["cents"],
        [("n_part", "sum", "n")],
    ).materialize()
    ct = pa.concat_tables(
        tb for tb in map(ray.get, cnt.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()
    order = pc.sort_indices(ct["cents"])
    cents_sorted = ct["cents"].take(order).to_numpy(zero_copy_only=False)
    n_sorted = ct["n"].take(order).to_numpy(zero_copy_only=False)
    n_total = int(n_sorted.sum())
    below = np.concatenate(([0], np.cumsum(n_sorted)[:-1]))
    # rank_min = below + 1; decile = ((rank_min - 1) * 10) // N
    decile_of = (below * 10) // max(n_total, 1)
    ref = state.broadcast((cents_sorted, decile_of.astype(np.int64)))

    def cell_partial(t: pa.Table) -> pa.Table:
        cs, dec = state.cached_get(ref)
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cs, cents)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "decile": pa.array(dec[idx]),
                    "event_type": t["event_type"],
                }
            ),
            ["decile", "event_type"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "decile": g["decile"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = ds.map_batches(cell_partial, batch_format="pyarrow").take_all()
    acc: dict[tuple, int] = {}
    for r in parts:
        k = (int(r["decile"]), r["event_type"])
        acc[k] = acc.get(k, 0) + int(r["n"])
    r_tot: dict[int, int] = {}
    c_tot: dict[str, int] = {}
    for (d, ty), n in acc.items():
        r_tot[d] = r_tot.get(d, 0) + n
        c_tot[ty] = c_tot.get(ty, 0) + n
    nn = sum(acc.values())
    cells = sorted(acc)
    num = [
        (nn * acc[c] - r_tot[c[0]] * c_tot[c[1]]) ** 2 for c in cells
    ]
    den = [r_tot[c[0]] * c_tot[c[1]] * nn for c in cells]
    return pa.table(
        {
            "decile": pa.array([c[0] for c in cells], pa.int64()),
            "event_type": pa.array([c[1] for c in cells], pa.string()),
            "n": pa.array([acc[c] for c in cells], pa.int64()),
            "r_tot": pa.array([r_tot[c[0]] for c in cells], pa.int64()),
            "c_tot": pa.array([c_tot[c[1]] for c in cells], pa.int64()),
            "chi2_num": pa.array(num, pa.int64()),
            "chi2_den": pa.array(den, pa.int64()),
        }
    )


VALUE_TYPE_CHI2_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents FROM events
),
rk AS (SELECT event_type, rank() OVER (ORDER BY cents) AS r FROM v),
a AS (
  SELECT event_type,
         CAST(((r - 1) * 10) // (SELECT count(*) FROM v) AS BIGINT) AS decile
  FROM rk
),
o AS (
  SELECT decile, event_type, CAST(count(*) AS BIGINT) AS n
  FROM a GROUP BY 1, 2
),
rm AS (SELECT decile, CAST(sum(n) AS BIGINT) AS r_tot FROM o GROUP BY 1),
cm AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS c_tot FROM o GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM o)
SELECT o.decile, o.event_type, o.n, rm.r_tot, cm.c_tot,
       CAST((t.nn * o.n - rm.r_tot * cm.c_tot)
            * (t.nn * o.n - rm.r_tot * cm.c_tot) AS BIGINT) AS chi2_num,
       CAST(rm.r_tot * cm.c_tot * t.nn AS BIGINT) AS chi2_den
FROM o JOIN rm USING (decile) JOIN cm USING (event_type) CROSS JOIN t
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Transition significance (Dunning LLR over the Markov transition matrix)
# ---------------------------------------------------------------------------


def transition_llr(sf_dir: str):
    """Dunning log-likelihood-ratio significance for every
    (prev → next) event-type transition — which session flows are real
    structure vs what independent type draws would produce.  Same
    exact-integer eight-term identity as collocation_llr (micro-nat
    S(x) = x·round(ln x·1e6) numerators, bit-exact in SQL), applied to
    event_transitions' counts with marginals r1 = Σ_next, c1 = Σ_prev.

    Scale shape: all heavy work is event_transitions' single user-hash
    shuffle; the LLR itself folds the |types|²-bounded matrix on the
    driver."""
    import math

    tr = event_transitions(sf_dir).take_all()
    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    def S(x: int) -> int:
        return 0 if x == 0 else x * L(x)

    pre: dict[str, int] = {}
    suf: dict[str, int] = {}
    for r in tr:
        pre[r["prev_type"]] = pre.get(r["prev_type"], 0) + int(r["n"])
        suf[r["next_type"]] = suf.get(r["next_type"], 0) + int(r["n"])
    n_tot = sum(pre.values())
    rows = []
    for r in sorted(tr, key=lambda x: (x["prev_type"], x["next_type"])):
        k11 = int(r["n"])
        r1, c1 = pre[r["prev_type"]], suf[r["next_type"]]
        llr = 2 * (
            S(k11)
            + S(r1 - k11)
            + S(c1 - k11)
            + S(n_tot - r1 - c1 + k11)
            - S(r1)
            - S(n_tot - r1)
            - S(c1)
            - S(n_tot - c1)
            + S(n_tot)
        )
        # sign: positive LLR with observed > expected = attraction;
        # expected comparison shipped so the consumer can split
        over = 1 if k11 * n_tot > r1 * c1 else 0
        rows.append((r["prev_type"], r["next_type"], k11, llr, over))
    return pa.table(
        {
            "prev_type": pa.array([x[0] for x in rows], pa.string()),
            "next_type": pa.array([x[1] for x in rows], pa.string()),
            "n": pa.array([x[2] for x in rows], pa.int64()),
            "llr_num": pa.array([x[3] for x in rows], pa.int64()),
            "over_expected": pa.array([x[4] for x in rows], pa.int64()),
        }
    )


def _transition_llr_sql() -> str:
    def S(x: str) -> str:
        return (
            f"(CASE WHEN ({x}) = 0 THEN 0 ELSE ({x}) * "
            f"CAST(round(ln({x}) * 1000000) AS BIGINT) END)"
        )

    return f"""
WITH tr AS ({EVENT_TRANSITIONS_SQL}),
pre AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS r1 FROM tr GROUP BY 1),
suf AS (SELECT next_type, CAST(sum(n) AS BIGINT) AS c1 FROM tr GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM tr)
SELECT tr.prev_type, tr.next_type, tr.n,
       CAST(2 * ({S("tr.n")} + {S("r1 - tr.n")} + {S("c1 - tr.n")}
                 + {S("t.nt - r1 - c1 + tr.n")}
                 - {S("r1")} - {S("t.nt - r1")} - {S("c1")} - {S("t.nt - c1")}
                 + {S("t.nt")}) AS BIGINT) AS llr_num,
       CAST(CASE WHEN tr.n * t.nt > r1 * c1 THEN 1 ELSE 0 END AS BIGINT)
         AS over_expected
FROM tr JOIN pre USING (prev_type) JOIN suf USING (next_type) CROSS JOIN tot t
ORDER BY tr.prev_type, tr.next_type
"""


TRANSITION_LLR_SQL = _transition_llr_sql()


# ---------------------------------------------------------------------------
# Hour-of-day activity profile per event type
# ---------------------------------------------------------------------------


def events_hour_profile(sf_dir: str):
    """Events per (event_type, hour-of-day) with each cell's integer
    permille share of its type's total — the diurnal load profile
    behind capacity planning and anomaly baselines.  Scale shape: one
    streaming pass; per-batch (type, hour) pre-counts are
    |types|·24-bounded, folded on the driver (PERF 32)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
                }
            ),
            ["event_type", "hour"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "hour": g["hour"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[tuple, int] = {}
    tot: dict[str, int] = {}
    for r in parts:
        k = (r["event_type"], int(r["hour"]))
        acc[k] = acc.get(k, 0) + int(r["n"])
        tot[r["event_type"]] = tot.get(r["event_type"], 0) + int(r["n"])
    cells = sorted(acc)
    return pa.table(
        {
            "event_type": pa.array([c[0] for c in cells], pa.string()),
            "hour": pa.array([c[1] for c in cells], pa.int64()),
            "n": pa.array([acc[c] for c in cells], pa.int64()),
            "share_permille": pa.array(
                [acc[c] * 1000 // tot[c[0]] for c in cells], pa.int64()
            ),
        }
    )


EVENTS_HOUR_PROFILE_SQL = """
WITH g AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, n,
       n * 1000 // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
         AS share_permille
FROM g ORDER BY event_type, hour
"""


# ---------------------------------------------------------------------------
# Grouped integer OLS: per-user value trend
# ---------------------------------------------------------------------------

_TREND_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def user_value_trend(sf_dir: str):
    """Per-user linear trend of event value over time, shipped as the
    exact integer OLS pair slope_num = n·Σxy − Σx·Σy and slope_den =
    n·Σx² − (Σx)² over (day-index, cents) points — the per-entity
    drift detector (is this account's spend rising?), grouped OLS with
    no float regression on either engine.  x is days since 2024-01-01
    so the moment sums stay far inside int64.

    Scale shape: ONE key-per-row ``bucketed_agg`` carrying five moment
    sums per user; the slope arithmetic is a vectorized map over the
    resolved blocks — no per-user Python, no second pass."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        day_us = (
            pc.floor_temporal(t["ts"], unit="day")
            .cast(pa.int64())
        )
        x = pc.divide(pc.subtract(day_us, _TREND_EPOCH_US), _DAY_US)
        y = _to_cents(t["value"])
        return pa.table(
            {
                "user_id": t["user_id"],
                "n1": pa.array(np.ones(t.num_rows, np.int64)),
                "sx": x,
                "sy": y,
                "sxy": pc.multiply(x, y),
                "sxx": pc.multiply(x, x),
            }
        )

    agg = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        [
            ("n1", "sum", "n"),
            ("sx", "sum", "sx"),
            ("sy", "sum", "sy"),
            ("sxy", "sum", "sxy"),
            ("sxx", "sum", "sxx"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t["user_id"],
                "n": t["n"],
                "slope_num": pa.array(n * sxy - sx * sy),
                "slope_den": pa.array(n * sxx - sx * sx),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


USER_VALUE_TREND_SQL = """
WITH v AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '2024-01-01',
                        date_trunc('day', ts)) AS BIGINT) AS x,
         CAST(round(value * 100.0) AS BIGINT) AS y
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
FROM v GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Two-window exact quantile drift per event type
# ---------------------------------------------------------------------------

_DRIFT_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC


def value_drift_quantiles(sf_dir: str):
    """Exact p50/p90 of event value (cents) in the first vs second
    half of the observation window, per type, plus the shifts — the
    distribution-drift monitor run before trusting a model trained on
    window 1 (quantile shift is the robust drift signal; means move
    with single outliers).  Quantile rule: smallest cents whose
    cumulative count reaches ceil(q·n) — percentile_disc semantics.

    Scale shape: ONE (type, window, cents) bucketed count fold
    (value-domain-bounded, the median/KS/decile shape); quantile
    selection walks the tiny sorted count table on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        w = pc.cast(
            pc.greater_equal(pc.cast(t["ts"], pa.int64()), _DRIFT_SPLIT_US),
            pa.int64(),
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "w": w,
                    "cents": _to_cents(t["value"]),
                }
            ),
            ["event_type", "w", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "w": g["w"],
                "cents": g["cents"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cnt = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "w", "cents"],
        [("n_part", "sum", "n")],
    ).take_all()
    groups: dict[tuple, list] = {}
    for r in cnt:
        groups.setdefault((r["event_type"], int(r["w"])), []).append(
            (int(r["cents"]), int(r["n"]))
        )

    def quantile(rows, q_permille):
        rows.sort()
        n = sum(c for _, c in rows)
        need = (n * q_permille + 999) // 1000
        cum = 0
        for cents, c in rows:
            cum += c
            if cum >= need:
                return cents
        return rows[-1][0] if rows else 0

    types = sorted({k[0] for k in groups})
    out = {c: [] for c in (
        "event_type", "p50_w1_cents", "p50_w2_cents", "p90_w1_cents",
        "p90_w2_cents", "p50_shift_cents", "p90_shift_cents",
    )}
    for ty in types:
        p50 = [quantile(groups.get((ty, w), [(0, 0)]), 500) for w in (0, 1)]
        p90 = [quantile(groups.get((ty, w), [(0, 0)]), 900) for w in (0, 1)]
        out["event_type"].append(ty)
        out["p50_w1_cents"].append(p50[0])
        out["p50_w2_cents"].append(p50[1])
        out["p90_w1_cents"].append(p90[0])
        out["p90_w2_cents"].append(p90[1])
        out["p50_shift_cents"].append(p50[1] - p50[0])
        out["p90_shift_cents"].append(p90[1] - p90[0])
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            **{
                c: pa.array(out[c], pa.int64())
                for c in list(out)[1:]
            },
        }
    )


VALUE_DRIFT_QUANTILES_SQL = """
WITH v AS (
  SELECT event_type,
         CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS w,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT event_type, w, cents, CAST(count(*) AS BIGINT) AS n
  FROM v GROUP BY 1, 2, 3
),
tot AS (SELECT event_type, w, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1, 2),
cum AS (
  SELECT event_type, w, cents,
         sum(n) OVER (PARTITION BY event_type, w ORDER BY cents) AS cm
  FROM c
),
q AS (
  SELECT cum.event_type, cum.w,
         min(CASE WHEN cm >= (nt * 500 + 999) // 1000 THEN cents END) AS p50,
         min(CASE WHEN cm >= (nt * 900 + 999) // 1000 THEN cents END) AS p90
  FROM cum JOIN tot USING (event_type, w)
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(max(CASE WHEN w = 0 THEN p50 END) AS BIGINT) AS p50_w1_cents,
       CAST(max(CASE WHEN w = 1 THEN p50 END) AS BIGINT) AS p50_w2_cents,
       CAST(max(CASE WHEN w = 0 THEN p90 END) AS BIGINT) AS p90_w1_cents,
       CAST(max(CASE WHEN w = 1 THEN p90 END) AS BIGINT) AS p90_w2_cents,
       CAST(max(CASE WHEN w = 1 THEN p50 END)
            - max(CASE WHEN w = 0 THEN p50 END) AS BIGINT) AS p50_shift_cents,
       CAST(max(CASE WHEN w = 1 THEN p90 END)
            - max(CASE WHEN w = 0 THEN p90 END) AS BIGINT) AS p90_shift_cents
FROM q GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Second-order event-type sequences (trigram Markov counts)
# ---------------------------------------------------------------------------

def event_trigrams(sf_dir: str):
    """Corpus-wide event-type TRIGRAM counts: for every user's
    ts-ordered stream (event_id tie-break), count each consecutive
    (t1 -> t2 -> t3) triple — the second-order Markov matrix that
    detects flow patterns a bigram matrix conflates (e.g. view->click
    behaves differently after a purchase than after another view).

    Same irreducible plan as ``event_transitions``: ONE user-hash
    shuffle co-locates each user's events, the partition sorts once,
    the triple extraction is two shifted numpy compares masked by user
    boundaries, and each partition emits only |types|^3-bounded local
    partials — so the final fold is over <= parts * |types|^3 rows and
    runs on the driver (PERF step 32: a further Ray exchange on
    bounded partials is ~1.5 s pure fixed cost).  The partials come
    back as ARROW tables: take_all() on pandas-block map_groups output
    pays a per-row python fetch path ~10x slower than arrow blocks
    (measured 5.5 s vs 0.6 s on 4k rows at sf0.1 — PERF step 34)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    empty = pa.table(
        {
            "t1": pa.array([], pa.string()),
            "t2": pa.array([], pa.string()),
            "t3": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        if len(g) < 3:
            return empty
        same = (uid[1:-1] == uid[:-2]) & (uid[2:] == uid[1:-1])
        triples = pd.DataFrame(
            {"t1": et[:-2][same], "t2": et[1:-1][same], "t3": et[2:][same]}
        )
        out = triples.groupby(["t1", "t2", "t3"], as_index=False).size()
        out = out.rename(columns={"size": "n"}).astype({"n": "int64"})
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .take_all()
    )
    agg: dict[tuple, int] = {}
    for r in partials:
        k = (r["t1"], r["t2"], r["t3"])
        agg[k] = agg.get(k, 0) + int(r["n"])
    keys = sorted(agg)
    return pa.table(
        {
            "t1": pa.array([k[0] for k in keys], pa.string()),
            "t2": pa.array([k[1] for k in keys], pa.string()),
            "t3": pa.array([k[2] for k in keys], pa.string()),
            "n": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


EVENT_TRIGRAMS_SQL = """
WITH s AS (
  SELECT event_type,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
         lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
  FROM events
)
SELECT p2 AS t1, p1 AS t2, event_type AS t3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE p2 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Per-user interarrival order statistics (exact lower median)
# ---------------------------------------------------------------------------

def user_median_gap(sf_dir: str):
    """Per-user interarrival profile: count, EXACT lower-median
    (percentile_disc(0.5)), min and max gap in microseconds between a
    user's consecutive events ((ts, event_id) order); single-event
    users have no gaps and are absent — the per-entity cadence
    profile behind bot/burst detection.

    Scale shape: the user_lag_gaps plan — ONE hash-bucket shuffle
    co-locates a user's events, one partition sort, gaps as a masked
    numpy diff; the per-user order statistic is ONE vectorized pandas
    groupby quantile with interpolation='lower', whose index
    floor((n-1)/2) equals percentile_disc's ceil(n/2)-1 for every n,
    so the median is DuckDB-exact with zero floats.  Output leaves
    each partition as Arrow (PERF 34), one row per multi-event user."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "median_gap_us": pa.array([], pa.int64()),
            "min_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
        }
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        if len(g) < 2:
            return empty
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame(
            {"user_id": uid[1:][same], "gap": (ts_us[1:] - ts_us[:-1])[same]}
        )
        if not len(df):
            return empty
        gr = df.groupby("user_id", sort=True)["gap"]
        out = gr.agg(
            n_gaps="size", min_gap_us="min", max_gap_us="max"
        ).reset_index()
        out.insert(
            2,
            "median_gap_us",
            gr.quantile(0.5, interpolation="lower").astype(np.int64).to_numpy(),
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .sort("user_id")
    )


USER_MEDIAN_GAP_SQL = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
         AS median_gap_us,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Heavy-hitter coverage (minimal user prefix covering half the traffic)
# ---------------------------------------------------------------------------

def heavy_hitter_coverage(sf_dir: str):
    """The minimal set of heaviest users covering >= 50% of all events
    (rank by n_events DESC, user_id ASC): each kept row carries its
    count and running cumulative — the 'how concentrated is traffic'
    cut used to size per-entity caches and skew mitigations.

    Scale shape: the orders_cumulative_revenue decomposition applied
    to a DERIVED ranking.  Per-user counts come from one
    ``bucketed_agg`` (never a key-per-row Ray groupby); the global
    cumulative over (n DESC, user_id) splits into prefix(count value)
    + within-count-value running sum — pass 1 folds the COUNT-VALUE
    histogram (bounded by max per-user count, ~hundreds) to driver
    prefix sums, pass 2 hash-shuffles user rows by their count value
    (equal counts co-locate), sorts each partition by user_id, and a
    grouped cumsum adds the broadcast base; the keep rule is the
    integer cross-multiplication 2*(cum - n) < total."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id"])
    # materialized: consumed twice (histogram pass + cumulative pass)
    counts = bucketed_agg(ds, ["user_id"], [(None, "count", "n")]).materialize()
    n_parts = _n_blocks()

    # Pass 1: count-value histogram -> exclusive prefix per value
    # (values DESC), plus the grand total.
    def hist_partial(t: pa.Table) -> pa.Table:
        return pa.table({"n": t["n"]}).group_by("n").aggregate([([], "count_all")])

    parts = (
        counts.map_batches(hist_partial, batch_format="pyarrow").take_all()
    )
    hist: dict[int, int] = {}
    for r in parts:
        hist[int(r["n"])] = hist.get(int(r["n"]), 0) + int(r["count_all"])
    vals = sorted(hist, reverse=True)
    prefix: dict[int, int] = {}
    acc = 0
    for v in vals:
        prefix[v] = acc
        acc += v * hist[v]
    total = acc

    import ray as _ray

    pref_ref = _ray.put(prefix)

    def add_part(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (n * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "cum_events": pa.array([], pa.int64()),
        }
    )

    def cum_partition(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        pref = _ray.get(pref_ref)
        g = g.sort_values(["n", "user_id"], ascending=[False, True],
                          kind="mergesort")
        n = g["n"].to_numpy().astype(np.int64)
        uid = g["user_id"].to_numpy().astype(np.int64)
        # within each count value: rank among equal counts (user asc)
        new = np.ones(len(g), bool)
        new[1:] = n[1:] != n[:-1]
        idx = np.arange(len(g))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rank = idx - start + 1
        base = np.fromiter((pref[int(v)] for v in n), np.int64, count=len(g))
        cum = base + rank * n
        keep = 2 * (cum - n) < total
        out = pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "n_events": pa.array(n[keep], pa.int64()),
                "cum_events": pa.array(cum[keep], pa.int64()),
            }
        )
        return out

    return (
        counts.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cum_partition, batch_format="pandas")
        .sort(["n_events", "user_id"], descending=[True, False])
    )


HEAVY_HITTER_COVERAGE_SQL = """
WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
tot AS (SELECT sum(n) AS t FROM pu),
r AS (
  SELECT user_id, n,
         sum(n) OVER (ORDER BY n DESC, user_id ASC
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM pu
)
SELECT user_id, CAST(n AS BIGINT) AS n_events, CAST(cum AS BIGINT) AS cum_events
FROM r, tot WHERE 2 * (cum - n) < t
ORDER BY n_events DESC, user_id
"""


# ---------------------------------------------------------------------------
# Active-days histogram (engagement distribution)
# ---------------------------------------------------------------------------

def user_active_days_histogram(sf_dir: str):
    """Engagement distribution: how many users were active on exactly
    K distinct days, for each K — the standard DAU/engagement-decile
    input.  Scale shape: ONE user-hash shuffle co-locates each user's
    events (per-user distinct-day counting is then partition-local
    and exact), each partition emits a day-count histogram partial
    bounded by the date domain (~hundreds of rows), and the driver
    folds the partials (PERF 32, Arrow out per PERF 34)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    n_parts = _n_blocks()

    def prep(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "day": day,
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    empty = pa.table(
        {
            "active_days": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        nd = (
            g.drop_duplicates(["user_id", "day"])
            .groupby("user_id", sort=False)
            .size()
        )
        h = nd.value_counts().sort_index()
        return pa.table(
            {
                "active_days": pa.array(h.index.to_numpy().astype(np.int64)),
                "n_users": pa.array(h.to_numpy().astype(np.int64)),
            }
        )

    parts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas")
        .take_all()
    )
    agg: dict[int, int] = {}
    for r in parts:
        agg[int(r["active_days"])] = agg.get(int(r["active_days"]), 0) + int(
            r["n_users"]
        )
    ks = sorted(agg)
    return pa.table(
        {
            "active_days": pa.array(ks, pa.int64()),
            "n_users": pa.array([agg[k] for k in ks], pa.int64()),
        }
    )


USER_ACTIVE_DAYS_SQL = """
WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
pu AS (SELECT user_id, count(*) AS nd FROM ud GROUP BY user_id)
SELECT CAST(nd AS BIGINT) AS active_days, CAST(count(*) AS BIGINT) AS n_users
FROM pu GROUP BY nd ORDER BY active_days
"""


# ---------------------------------------------------------------------------
# Interval self-join (overlapping order windows per customer)
# ---------------------------------------------------------------------------

def order_interval_overlaps(sf_dir: str):
    """Range/interval SELF-JOIN: pairs of orders of the SAME customer
    whose activity windows [o_orderdate, last lineitem shipdate]
    overlap, with the overlap length in whole days — the interval-join
    primitive (conflict detection, concurrent-exposure joins) Ray Data
    has no native operator for.

    Scale shape: the interval end comes from ONE ``bucketed_agg`` max
    over lineitem (never a key-per-row Ray groupby); the bucketed
    output is SETTLED to non-empty blocks (Ray 2.49 empty-schema trap)
    and feeds ONE partitioned hash join with the slimmed orders side;
    the pair explosion is then partition-local — hash-shuffle on
    o_custkey co-locates a customer's orders and a per-partition
    pandas self-merge emits pairs, so the quadratic term is bounded by
    per-customer order count (~10-45 pairs), never corpus-wide.  Day
    arithmetic is exact int64 microseconds (all stamps are midnight)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def ship_i64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
            }
        )

    ends = bucketed_agg(
        li.map_batches(ship_i64, batch_format="pyarrow"),
        ["l_orderkey"],
        [("ship_us", "max", "end_us")],
    )
    ends = _settle_nonempty(
        ends,
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
            }
        ),
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "start_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )

    n_parts = _join_partitions(
        f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = orders.map_batches(slim, batch_format="pyarrow").join(
        ends,
        join_type="inner",
        num_partitions=n_parts,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    shuffle_parts = _n_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (c * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(shuffle_parts)).astype(np.int32))
        )

    empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "okey_a": pa.array([], pa.int64()),
            "okey_b": pa.array([], pa.int64()),
            "overlap_days": pa.array([], pa.int64()),
        }
    )
    US_PER_DAY = 86_400_000_000

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        if len(g) < 2:
            return empty
        d = g[["o_custkey", "o_orderkey", "start_us", "end_us"]]
        m = d.merge(d, on="o_custkey", suffixes=("_a", "_b"))
        m = m[m["o_orderkey_a"] < m["o_orderkey_b"]]
        ov = (
            np.minimum(m["end_us_a"].to_numpy(), m["end_us_b"].to_numpy())
            - np.maximum(m["start_us_a"].to_numpy(), m["start_us_b"].to_numpy())
        )
        keep = ov >= 0
        return pa.table(
            {
                "o_custkey": pa.array(
                    m["o_custkey"].to_numpy()[keep].astype(np.int64)
                ),
                "okey_a": pa.array(
                    m["o_orderkey_a"].to_numpy()[keep].astype(np.int64)
                ),
                "okey_b": pa.array(
                    m["o_orderkey_b"].to_numpy()[keep].astype(np.int64)
                ),
                "overlap_days": pa.array(
                    (ov[keep] // US_PER_DAY).astype(np.int64)
                ),
            }
        )

    return (
        joined.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_partition, batch_format="pandas")
        .sort(["o_custkey", "okey_a", "okey_b"])
    )


ORDER_INTERVAL_OVERLAPS_SQL = """
WITH iv AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate AS s,
         max(l.l_shipdate) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
)
SELECT a.o_custkey,
       a.o_orderkey AS okey_a,
       b.o_orderkey AS okey_b,
       CAST(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) AS BIGINT)
         AS overlap_days
FROM iv a
JOIN iv b ON b.o_custkey = a.o_custkey AND a.o_orderkey < b.o_orderkey
WHERE greatest(a.s, b.s) <= least(a.e, b.e)
ORDER BY a.o_custkey, okey_a, okey_b
"""


# ---------------------------------------------------------------------------
# Decile mobility matrix across time windows
# ---------------------------------------------------------------------------

def user_decile_transition(sf_dir: str):
    """Decile MOBILITY matrix: each user's total event value is ranked
    into deciles within window w1 (ts < 2024-01-16, the
    value_drift_quantiles split) and window w2, and the output counts
    users per (d_w1, d_w2) cell — the cohort-drift fingerprint (-1 =
    inactive in that window).  Deciles are tie-stable rank_min bins:
    d = 10·(count strictly below) // n_window, never ntile()'s
    order-dependent split.

    Scale shape: per-(user, window) sums via ONE ``bucketed_agg``;
    decile boundaries come from a (window, sum-cents) count fold
    (distinct-sum-bounded, the value_decile_assign escalation note
    applies); assignment is a broadcast searchsorted; the per-user
    (d1, d2) pairing is one user-hash shuffle whose partitions emit
    11x11-bounded matrix partials folded on the driver (PERF 32)."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    cutoff = pa.scalar(pd.Timestamp("2024-01-16"), type=pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "w": pc.cast(pc.greater_equal(t["ts"], cutoff), pa.int32()),
                "cents": _to_cents(t["value"]),
            }
        )

    sums = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id", "w"],
        [("cents", "sum", "cents")],
    ).materialize()  # two consumers: boundary fold + assignment

    def cnt_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"w": t["w"], "cents": t["cents"]}), ["w", "cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "w": g["w"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    rows = sums.map_batches(cnt_partial, batch_format="pyarrow").take_all()
    byw: dict[int, dict[int, int]] = {0: {}, 1: {}}
    for r in rows:
        d = byw[int(r["w"])]
        d[int(r["cents"])] = d.get(int(r["cents"]), 0) + int(r["n"])
    packed = {}
    for w, d in byw.items():
        cs = np.array(sorted(d), np.int64)
        ns = np.array([d[int(c)] for c in cs], np.int64)
        below = np.concatenate([[0], ns.cumsum()[:-1]])
        packed[w] = (cs, below, int(ns.sum()))
    ref = state.broadcast(packed)
    n_parts = _n_blocks()

    def assign(t: pa.Table) -> pa.Table:
        lut = state.cached_get(ref)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.empty(len(w), np.int64)
        for wv in (0, 1):
            m = w == wv
            if m.any():
                cs, below, nt = lut[wv]
                idx = np.searchsorted(cs, cents[m])
                d[m] = below[idx] * 10 // max(nt, 1)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "user_id": t["user_id"],
                "w": t["w"],
                "d": pa.array(d, pa.int64()),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    empty = pa.table(
        {
            "d_w1": pa.array([], pa.int64()),
            "d_w2": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    def matrix_partition(g: pd.DataFrame) -> pa.Table:
        if not len(g):
            return empty
        pv = g.pivot_table(
            index="user_id", columns="w", values="d", aggfunc="first"
        )
        d1 = pv[0].fillna(-1).astype(np.int64) if 0 in pv else pd.Series(-1, index=pv.index, dtype=np.int64)
        d2 = pv[1].fillna(-1).astype(np.int64) if 1 in pv else pd.Series(-1, index=pv.index, dtype=np.int64)
        out = (
            pd.DataFrame({"d_w1": d1, "d_w2": d2})
            .groupby(["d_w1", "d_w2"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(empty.schema)

    parts = (
        sums.map_batches(assign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(matrix_partition, batch_format="pandas")
        .take_all()
    )
    agg: dict = {}
    for r in parts:
        k = (int(r["d_w1"]), int(r["d_w2"]))
        agg[k] = agg.get(k, 0) + int(r["n_users"])
    keys = sorted(agg)
    return pa.table(
        {
            "d_w1": pa.array([k[0] for k in keys], pa.int64()),
            "d_w2": pa.array([k[1] for k in keys], pa.int64()),
            "n_users": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


USER_DECILE_TRANSITION_SQL = """
WITH s AS (
  SELECT user_id,
         CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS w,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT user_id, w,
         ((rank() OVER (PARTITION BY w ORDER BY cents) - 1) * 10)
           // (count(*) OVER (PARTITION BY w)) AS d
  FROM s
),
p AS (
  SELECT coalesce(a.d, -1) AS d_w1, coalesce(b.d, -1) AS d_w2
  FROM (SELECT user_id, d FROM r WHERE w = 0) a
  FULL JOIN (SELECT user_id, d FROM r WHERE w = 1) b USING (user_id)
)
SELECT CAST(d_w1 AS BIGINT) AS d_w1, CAST(d_w2 AS BIGINT) AS d_w2,
       CAST(count(*) AS BIGINT) AS n_users
FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Day-of-week seasonality profile
# ---------------------------------------------------------------------------

def orders_dow_profile(sf_dir: str):
    """Order seasonality by ISO day-of-week (1=Mon..7=Sun): count and
    integer-cents revenue per weekday — the calendar-seasonality twin
    of events_hour_profile on the orders table.  One map_batches
    partial per batch (7-row bounded), grouped Sum, no wide state."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(t["o_orderdate"]), 1)  # Mon=0 -> ISO 1
        g = pa.TableGroupBy(
            pa.table(
                {
                    "dow": pc.cast(dow, pa.int64()),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["dow"],
        ).aggregate([([], "count_all"), ("cents", "sum")])
        return pa.table(
            {
                "dow": g["dow"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "cents": pc.cast(g["cents_sum"], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[int, list[int]] = {}
    for r in parts:
        a = agg.setdefault(int(r["dow"]), [0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["cents"])
    ks = sorted(agg)
    return pa.table(
        {
            "dow": pa.array(ks, pa.int64()),
            "n_orders": pa.array([agg[k][0] for k in ks], pa.int64()),
            "revenue_cents": pa.array([agg[k][1] for k in ks], pa.int64()),
        }
    )


ORDERS_DOW_PROFILE_SQL = """
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# EWMA smoothing of the daily event series (exact fixed-point recursion)
# ---------------------------------------------------------------------------

EWMA_NUM = 3   # e_t = (3*e_{t-1} + 1e6*n_t) // 4  (alpha = 1/4)
EWMA_DEN = 4


def events_ewma(sf_dir: str):
    """Exponentially-weighted moving average of the per-type daily
    event counts, as an EXACT fixed-point recursion: e_1 = 1e6*n_1,
    e_t = (3*e_{t-1} + 1e6*n_t) // 4 over the observed days in order
    — the streaming smoother next to events_trend_slope (regression)
    and value_cusum_alarms (drift alarms).  Floor division each step
    keeps the whole series integer, so the oracle replays it as a
    recursive CTE bit-exactly.

    Scale shape: the recursion is inherently sequential PER KEY but
    its input is the (event_type, day) aggregate — bounded by
    types x days, not events — folded from per-batch partials; each
    type's series then smooths independently (driver here; one
    map_groups per type at real key counts)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "day": pc.floor_temporal(t["ts"], unit="day"),
                }
            ),
            ["event_type", "day"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg: dict[tuple, int] = {}
    blocks = [
        tb
        for tb in map(
            ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if tb.num_rows
    ]
    for tb in blocks:
        for et, day, n in zip(
            tb["event_type"].to_pylist(), tb["day"].to_pylist(), tb["n"].to_pylist()
        ):
            agg[(et, day)] = agg.get((et, day), 0) + int(n)
    out_et, out_day, out_n, out_e = [], [], [], []
    prev_et, e = None, 0
    for (et, day), n in sorted(agg.items()):
        if et != prev_et:
            e = 1_000_000 * n
            prev_et = et
        else:
            e = (EWMA_NUM * e + 1_000_000 * n) // EWMA_DEN
        out_et.append(et)
        out_day.append(day)
        out_n.append(n)
        out_e.append(e)
    return pa.table(
        {
            "event_type": pa.array(out_et, pa.string()),
            "day": pa.array(out_day, pa.timestamp("us")),
            "n": pa.array(out_n, pa.int64()),
            "ewma_micro": pa.array(out_e, pa.int64()),
        }
    )


EVENTS_EWMA_SQL = f"""
WITH RECURSIVE d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM d
),
rec AS (
  SELECT event_type, day, n, i, n * 1000000 AS e FROM s WHERE i = 1
  UNION ALL
  SELECT s.event_type, s.day, s.n, s.i,
         ({EWMA_NUM} * rec.e + 1000000 * s.n) // {EWMA_DEN}
  FROM s JOIN rec ON s.event_type = rec.event_type AND s.i = rec.i + 1
)
SELECT event_type, day, n, CAST(e AS BIGINT) AS ewma_micro
FROM rec ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Rolling 7-day MEDIAN of the daily event series (robust smoother)
# ---------------------------------------------------------------------------

ROLLING_MEDIAN_W = 7


def events_rolling_median(sf_dir: str, w: int = ROLLING_MEDIAN_W):
    """Rolling ``w``-day MEDIAN of per-type daily event counts — the
    robust smoother next to events_ewma (a single spike day moves the
    mean but not the median).  Reported as med2 = the SUM of the two
    middle order statistics (= 2x median), which is integer-exact for
    both odd and even windows, so no float ever enters the compare.

    Scale shape: input is the bounded (event_type, day) aggregate
    folded from per-batch partials; each window is a sort of <= w
    ints.  Per-key sequential, same as events_ewma — one map_groups
    per type at real key counts."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "day": pc.floor_temporal(t["ts"], unit="day"),
                }
            ),
            ["event_type", "day"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg: dict[tuple, int] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for et, day, n in zip(
            tb["event_type"].to_pylist(), tb["day"].to_pylist(), tb["n"].to_pylist()
        ):
            agg[(et, day)] = agg.get((et, day), 0) + int(n)
    by_type: dict[str, list] = {}
    for (et, day), n in sorted(agg.items()):
        by_type.setdefault(et, []).append((day, n))
    out_et, out_day, out_n, out_m = [], [], [], []
    for et, series in by_type.items():
        ns = [n for _, n in series]
        for i, (day, n) in enumerate(series):
            win = sorted(ns[max(0, i - w + 1) : i + 1])
            lw = len(win)
            if lw % 2:
                m2 = 2 * win[lw // 2]
            else:
                m2 = win[lw // 2 - 1] + win[lw // 2]
            out_et.append(et)
            out_day.append(day)
            out_n.append(n)
            out_m.append(m2)
    return pa.table(
        {
            "event_type": pa.array(out_et, pa.string()),
            "day": pa.array(out_day, pa.timestamp("us")),
            "n": pa.array(out_n, pa.int64()),
            "med2": pa.array(out_m, pa.int64()),
        }
    )


EVENTS_ROLLING_MEDIAN_SQL = f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(round(2 * median(n) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN {ROLLING_MEDIAN_W - 1} PRECEDING AND CURRENT ROW
       )) AS BIGINT) AS med2
FROM d ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# HDR sketch accuracy audit: estimated vs exact quantiles, same output
# ---------------------------------------------------------------------------

HDR_AUDIT_QS = (500, 900, 990)


def hdr_quantile_error(sf_dir: str, qs=HDR_AUDIT_QS):
    """Sketch-accuracy audit for the HDR quantile registers: per
    (event_type, q) the EXACT order-statistic of value cents (rank =
    ceil(q*n/1000), 1-based ascending) next to the HDR estimate as
    est2 = lo+hi of the first bucket whose cumulative count reaches
    the rank (2x midpoint, integer), and err2 = est2 - 2*exact — the
    measured (not modeled) error bound, the same audit shape as
    bloom_decontaminate's FP surplus.  The HDR guarantee (<= 1/8
    relative bucket width) is what err2 empirically validates.

    Scale shape: ONE (event_type, cents) histogram partial per batch
    feeds BOTH sides — the exact rank walks the value histogram
    (bounded by distinct cents, the same boundedness
    range_partition_plan exploits), the estimate walks the ~200-bucket
    register fold of the same rows; nothing row-sized reaches the
    driver."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"event_type": t["event_type"], "cents": _to_cents(t["value"])}
            ),
            ["event_type", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist: dict[str, dict[int, int]] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for et, c, n in zip(
            tb["event_type"].to_pylist(), tb["cents"].to_pylist(), tb["n"].to_pylist()
        ):
            h = hist.setdefault(et, {})
            h[int(c)] = h.get(int(c), 0) + int(n)
    out = {"event_type": [], "q_permille": [], "exact_cents": [], "est2_cents": [], "err2": []}
    for et in sorted(hist):
        vals = sorted(hist[et].items())
        total = sum(n for _, n in vals)
        regs: dict[int, int] = {}
        for c, n in vals:
            b = int(_hdr_bucket(np.array([c], dtype=np.int64))[0])
            regs[b] = regs.get(b, 0) + n
        rlist = sorted(regs.items())
        for q in qs:
            rank = -(-q * total // 1000)
            cum = 0
            exact = None
            for c, n in vals:
                cum += n
                if cum >= rank:
                    exact = c
                    break
            cum = 0
            est2 = None
            for b, n in rlist:
                cum += n
                if cum >= rank:
                    lo, hi = hdr_bucket_bounds(b)
                    est2 = lo + hi
                    break
            out["event_type"].append(et)
            out["q_permille"].append(q)
            out["exact_cents"].append(exact)
            out["est2_cents"].append(est2)
            out["err2"].append(est2 - 2 * exact)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "q_permille": pa.array(out["q_permille"], pa.int64()),
            "exact_cents": pa.array(out["exact_cents"], pa.int64()),
            "est2_cents": pa.array(out["est2_cents"], pa.int64()),
            "err2": pa.array(out["err2"], pa.int64()),
        }
    )


def _hdr_audit_sql() -> str:
    qs = ", ".join(f"({q})" for q in HDR_AUDIT_QS)
    return f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
qs(q) AS (VALUES {qs}),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
  FROM c
),
ex AS (
  SELECT r.event_type, q.q, r.v AS exact_cents
  FROM ranked r JOIN tot USING (event_type) CROSS JOIN qs q
  WHERE r.rn = (q.q * tot.n + 999) // 1000
),
b AS (
  SELECT event_type,
         CASE WHEN v < 0 THEN -1
              WHEN v <= 15 THEN v
              ELSE 16 + (length(printf('%b', v)) - 5) * 8
                      + ((v >> (length(printf('%b', v)) - 4)) & 7)
         END AS bucket
  FROM c
),
regs AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
         FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cm
  FROM regs
),
estb AS (
  SELECT cum.event_type, q.q, min(cum.bucket) AS bucket
  FROM cum JOIN tot USING (event_type) CROSS JOIN qs q
  WHERE cum.cm >= (q.q * tot.n + 999) // 1000
  GROUP BY 1, 2
),
est AS (
  SELECT event_type, q,
         CASE WHEN bucket < 16 THEN 2 * bucket + 1
              ELSE 2 * (8 + (bucket - 16) % 8)
                     * (1 << (((bucket - 16) // 8 + 5) - 4))
                   + (1 << (((bucket - 16) // 8 + 5) - 4))
         END AS est2
  FROM estb
)
SELECT ex.event_type, CAST(ex.q AS BIGINT) AS q_permille,
       ex.exact_cents,
       CAST(est.est2 AS BIGINT) AS est2_cents,
       CAST(est.est2 - 2 * ex.exact_cents AS BIGINT) AS err2
FROM ex JOIN est ON est.event_type = ex.event_type AND est.q = ex.q
ORDER BY ex.event_type, ex.q
"""


HDR_QUANTILE_ERROR_SQL = _hdr_audit_sql()


# ---------------------------------------------------------------------------
# Burst segmentation with hysteresis (2-day Schmitt trigger)
# ---------------------------------------------------------------------------

def events_burst_hysteresis(sf_dir: str):
    """Burst/quiet segmentation of the per-type daily series with a
    two-day hysteresis (Schmitt trigger): the raw indicator is
    day-count > type median, but the STATE only flips after two
    CONSECUTIVE days agree — the debounced burst detector that a
    single spike day cannot flip (the state-machine sibling of
    value_cusum_alarms; Kleinberg's two-state automaton reduces to
    exactly this under a large switching cost).  state_1 = hi_1;
    state_t = hi_t if hi_t == hi_{t-1} else state_{t-1}.  Median
    compares as 2*n > med2 (two-middle sum), so no float enters.

    Scale shape: bounded (type, day) fold; per-key sequential
    recursion like events_ewma; oracle replays it as a recursive CTE."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "day": pc.floor_temporal(t["ts"], unit="day"),
                }
            ),
            ["event_type", "day"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "day": g["day"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg: dict[tuple, int] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for et, day, n in zip(
            tb["event_type"].to_pylist(), tb["day"].to_pylist(), tb["n"].to_pylist()
        ):
            agg[(et, day)] = agg.get((et, day), 0) + int(n)
    by_type: dict[str, list] = {}
    for (et, day), n in sorted(agg.items()):
        by_type.setdefault(et, []).append((day, n))
    out = {"event_type": [], "day": [], "n": [], "hi": [], "state": []}
    for et, series in by_type.items():
        ns = sorted(n for _, n in series)
        lw = len(ns)
        med2 = (
            2 * ns[lw // 2] if lw % 2 else ns[lw // 2 - 1] + ns[lw // 2]
        )
        state = None
        prev_hi = None
        for day, n in series:
            hi = 1 if 2 * n > med2 else 0
            if state is None:
                state = hi
            elif hi == prev_hi:
                state = hi
            prev_hi = hi
            out["event_type"].append(et)
            out["day"].append(day)
            out["n"].append(n)
            out["hi"].append(hi)
            out["state"].append(state)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "day": pa.array(out["day"], pa.timestamp("us")),
            "n": pa.array(out["n"], pa.int64()),
            "hi": pa.array(out["hi"], pa.int64()),
            "state": pa.array(out["state"], pa.int64()),
        }
    )


EVENTS_BURST_HYSTERESIS_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, CAST(round(2 * median(n)) AS BIGINT) AS med2
  FROM d GROUP BY event_type
),
s AS (
  SELECT d.event_type, d.day, d.n,
         CASE WHEN 2 * d.n > med.med2 THEN 1 ELSE 0 END AS hi,
         row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i
  FROM d JOIN med USING (event_type)
),
sp AS (
  SELECT *, lag(hi) OVER (PARTITION BY event_type ORDER BY i) AS prev_hi
  FROM s
),
rec AS (
  SELECT event_type, day, n, hi, i, hi AS state FROM sp WHERE i = 1
  UNION ALL
  SELECT sp.event_type, sp.day, sp.n, sp.hi, sp.i,
         CASE WHEN sp.hi = sp.prev_hi THEN sp.hi ELSE rec.state END
  FROM sp JOIN rec ON sp.event_type = rec.event_type AND sp.i = rec.i + 1
)
SELECT event_type, day, n, CAST(hi AS BIGINT) AS hi,
       CAST(state AS BIGINT) AS state
FROM rec ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Winsorization audit (p01/p99 robust clipping)
# ---------------------------------------------------------------------------

WINSOR_LO_PM = 10
WINSOR_HI_PM = 990


def value_winsorized_stats(sf_dir: str):
    """Per-type winsorization audit: the p01/p99 cents bounds (exact
    ceil-rank order statistics, the hdr_quantile_error convention),
    how many values each side clips, and the winsorized integer sum —
    the robust-preprocessing step that tames value outliers before
    means/regressions, with the clipping cost measured instead of
    assumed.

    Scale shape: the same ONE (type, cents) histogram partial as
    hdr_quantile_error feeds bounds, clip counts and clipped sum —
    everything walks the bounded value histogram, nothing row-sized
    reaches the driver."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"event_type": t["event_type"], "cents": _to_cents(t["value"])}
            ),
            ["event_type", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist: dict[str, dict[int, int]] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for et, c, n in zip(
            tb["event_type"].to_pylist(), tb["cents"].to_pylist(), tb["n"].to_pylist()
        ):
            h = hist.setdefault(et, {})
            h[int(c)] = h.get(int(c), 0) + int(n)
    out = {k: [] for k in (
        "event_type", "lo_cents", "hi_cents", "n_clip_lo", "n_clip_hi", "winsor_sum_cents"
    )}
    for et in sorted(hist):
        vals = sorted(hist[et].items())
        total = sum(n for _, n in vals)

        def at_rank(rank):
            cum = 0
            for c, n in vals:
                cum += n
                if cum >= rank:
                    return c
            return vals[-1][0]

        lo = at_rank(-(-WINSOR_LO_PM * total // 1000))
        hi = at_rank(-(-WINSOR_HI_PM * total // 1000))
        n_lo = sum(n for c, n in vals if c < lo)
        n_hi = sum(n for c, n in vals if c > hi)
        wsum = sum(min(max(c, lo), hi) * n for c, n in vals)
        out["event_type"].append(et)
        out["lo_cents"].append(lo)
        out["hi_cents"].append(hi)
        out["n_clip_lo"].append(n_lo)
        out["n_clip_hi"].append(n_hi)
        out["winsor_sum_cents"].append(wsum)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "lo_cents": pa.array(out["lo_cents"], pa.int64()),
            "hi_cents": pa.array(out["hi_cents"], pa.int64()),
            "n_clip_lo": pa.array(out["n_clip_lo"], pa.int64()),
            "n_clip_hi": pa.array(out["n_clip_hi"], pa.int64()),
            "winsor_sum_cents": pa.array(out["winsor_sum_cents"], pa.int64()),
        }
    )


VALUE_WINSORIZED_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
  FROM c
),
b AS (
  SELECT r.event_type,
         max(CASE WHEN r.rn = ({WINSOR_LO_PM} * tot.n + 999) // 1000
                  THEN r.v END) AS lo,
         max(CASE WHEN r.rn = ({WINSOR_HI_PM} * tot.n + 999) // 1000
                  THEN r.v END) AS hi
  FROM ranked r JOIN tot USING (event_type)
  GROUP BY r.event_type
)
SELECT c.event_type,
       CAST(b.lo AS BIGINT) AS lo_cents,
       CAST(b.hi AS BIGINT) AS hi_cents,
       CAST(count(*) FILTER (c.v < b.lo) AS BIGINT) AS n_clip_lo,
       CAST(count(*) FILTER (c.v > b.hi) AS BIGINT) AS n_clip_hi,
       CAST(sum(least(greatest(c.v, b.lo), b.hi)) AS BIGINT)
         AS winsor_sum_cents
FROM c JOIN b USING (event_type)
GROUP BY c.event_type, b.lo, b.hi
ORDER BY c.event_type
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution of the event-transition chain
# ---------------------------------------------------------------------------

MARKOV_ITERS = 10


def event_markov_stationary(sf_dir: str, iters: int = MARKOV_ITERS):
    """Stationary distribution of the first-order event-type Markov
    chain by EXACT integer power iteration: P quantizes to permille
    rows (p_ij = n_ij*1000 // row_sum_i), v0 is uniform micro, and
    each step is v'[j] = (sum_i v[i]*p_ij) // 1000 — every iterate is
    bit-reproducible, so the oracle replays all 10 steps as chained
    CTEs (the textrank oracle pattern).  The result ranks event types
    by long-run visit share — the funnel steady state on top of
    event_transitions' matrix.

    Scale shape: the transition matrix is |types|^2-bounded regardless
    of event count (event_transitions' partition-local partials), so
    the iteration is driver arithmetic on a tiny table — the shuffle
    cost IS event_transitions'."""
    tr = event_transitions(sf_dir).take_all()
    types = sorted({r["prev_type"] for r in tr} | {r["next_type"] for r in tr})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    n = np.zeros((k, k), dtype=np.int64)
    for r in tr:
        n[idx[r["prev_type"]], idx[r["next_type"]]] = int(r["n"])
    row = n.sum(axis=1)
    p = np.zeros_like(n)
    nz = row > 0
    p[nz] = n[nz] * 1000 // row[nz, None]
    v = np.full(k, 1_000_000 // k, dtype=np.int64)
    for _ in range(iters):
        v = (v @ p) // 1000
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "stationary_micro": pa.array(v, pa.int64()),
        }
    )


def _markov_sql() -> str:
    steps = []
    for t in range(1, MARKOV_ITERS + 1):
        steps.append(
            f"v{t} AS (SELECT p.next_type AS event_type,\n"
            f"  CAST(sum(v{t-1}.v * p.p) // 1000 AS BIGINT) AS v\n"
            f"  FROM v{t-1} JOIN p ON p.prev_type = v{t-1}.event_type\n"
            f"  GROUP BY p.next_type)"
        )
    chain = ",\n".join(steps)
    return f"""
WITH tr AS ({EVENT_TRANSITIONS_SQL}),
types AS (
  SELECT prev_type AS event_type FROM tr
  UNION SELECT next_type FROM tr
),
k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
rs AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_sum FROM tr GROUP BY 1),
p AS (
  SELECT tr.prev_type, tr.next_type,
         CAST(tr.n * 1000 // rs.row_sum AS BIGINT) AS p
  FROM tr JOIN rs USING (prev_type)
),
v0 AS (SELECT event_type, CAST(1000000 // (SELECT k FROM k) AS BIGINT) AS v
       FROM types),
{chain}
SELECT t.event_type,
       CAST(coalesce(v{MARKOV_ITERS}.v, 0) AS BIGINT) AS stationary_micro
FROM types t LEFT JOIN v{MARKOV_ITERS} ON v{MARKOV_ITERS}.event_type = t.event_type
ORDER BY t.event_type
"""


EVENT_MARKOV_STATIONARY_SQL = _markov_sql()


# ---------------------------------------------------------------------------
# HLL sketch accuracy audit: integer-exact estimate vs exact distinct
# ---------------------------------------------------------------------------

_HLL_ALPHA_NUM = 7213          # alpha(m) = 0.7213/(1 + 1.079/m)
_HLL_ALPHA_DEN_A = 10000       # = 7213*m / (10000*m + 10790) exactly
_HLL_ALPHA_DEN_B = 10790


def hll_estimate_audit(sf_dir: str):
    """Completes the sketch-audit trio (bloom FP surplus, HDR
    quantile error): per day, the EXACT distinct-user count next to
    the HLL estimate computed in EXACT INTEGER arithmetic — alpha is
    the exact rational 7213m/(10000m+10790), the harmonic sum is
    S = sum_j 2^(64-rho_j) in unbounded ints (HUGEINT in SQL), the
    raw estimate is alpha*m^2*2^64*1000 // S milli, and the
    small-range branch (raw <= 2.5m, zeros > 0) is linear counting
    m*(ln_micro m - ln_micro zeros)//1000 — so even the sketch's
    ERROR is oracle-reproducible bit for bit.

    Scale shape: the registers side IS hll_daily_registers (bounded
    days x 256 cells); the exact side is a per-day distinct fold —
    at 10^12 events the exact audit runs on sampled days only (the
    register estimate is the production number), which this operator's
    bounded per-day fold supports directly."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    m = HLL_M
    regs: dict = {}
    for r in hll_daily_registers(sf_dir).take_all():
        regs.setdefault(r["day"], []).append(int(r["max_rho"]))

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
    exact: dict = {}
    for tb in map(ray.get, pairs.to_arrow_refs()):
        if not tb.num_rows:
            continue
        for d in tb["day"].to_pylist():
            exact[d] = exact.get(d, 0) + 1

    out = {k: [] for k in ("day", "n_exact", "zeros", "est_milli", "err_milli")}
    lnm_m = int(math.floor(math.log(m) * 1_000_000 + 0.5))
    for day in sorted(exact):
        rhos = regs.get(day, [])
        hit = len(rhos)
        zeros = m - hit
        S = sum((1 << 64) >> rho for rho in rhos) + zeros * (1 << 64)
        est = (
            _HLL_ALPHA_NUM * m * m * m * 1000 * (1 << 64)
        ) // ((_HLL_ALPHA_DEN_A * m + _HLL_ALPHA_DEN_B) * S)
        if est <= 2500 * m and zeros > 0:
            lnz = int(math.floor(math.log(zeros) * 1_000_000 + 0.5))
            est = m * (lnm_m - lnz) // 1000
        out["day"].append(day)
        out["n_exact"].append(exact[day])
        out["zeros"].append(zeros)
        out["est_milli"].append(est)
        out["err_milli"].append(est - 1000 * exact[day])
    return pa.table(
        {
            "day": pa.array(out["day"], pa.timestamp("us")),
            "n_exact": pa.array(out["n_exact"], pa.int64()),
            "zeros": pa.array(out["zeros"], pa.int64()),
            "est_milli": pa.array(out["est_milli"], pa.int64()),
            "err_milli": pa.array(out["err_milli"], pa.int64()),
        }
    )


def _hll_audit_sql() -> str:
    m = HLL_M
    two64 = 1 << 64
    an, da, db = _HLL_ALPHA_NUM, _HLL_ALPHA_DEN_A, _HLL_ALPHA_DEN_B
    num = an * m * m * m * 1000 * two64
    den_c = da * m + db
    return f"""
WITH regs AS ({HLL_DAILY_REGISTERS_SQL}),
agg AS (
  SELECT day, CAST(count(*) AS BIGINT) AS hit,
         sum({two64}::HUGEINT // (1::BIGINT << max_rho)) AS s_hit
  FROM regs GROUP BY day
),
ex AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
),
j AS (
  SELECT ex.day, ex.n_exact,
         CAST({m} - coalesce(agg.hit, 0) AS BIGINT) AS zeros,
         coalesce(agg.s_hit, 0)
           + ({m} - coalesce(agg.hit, 0)) * {two64}::HUGEINT AS s
  FROM ex LEFT JOIN agg ON agg.day = ex.day
),
est AS (
  SELECT day, n_exact, zeros,
         {num}::HUGEINT // ({den_c}::HUGEINT * s) AS raw
  FROM j
)
SELECT day, n_exact, zeros,
       CAST(CASE WHEN raw <= {2500 * m} AND zeros > 0
                 THEN {m} * (CAST(round(ln({m}) * 1000000) AS BIGINT)
                             - CAST(round(ln(zeros) * 1000000) AS BIGINT))
                      // 1000
                 ELSE raw END AS BIGINT) AS est_milli,
       CAST(CASE WHEN raw <= {2500 * m} AND zeros > 0
                 THEN {m} * (CAST(round(ln({m}) * 1000000) AS BIGINT)
                             - CAST(round(ln(zeros) * 1000000) AS BIGINT))
                      // 1000
                 ELSE raw END - 1000 * n_exact AS BIGINT) AS err_milli
FROM est ORDER BY day
"""


HLL_ESTIMATE_AUDIT_SQL = _hll_audit_sql()


# ---------------------------------------------------------------------------
# Seasonal decomposition of the daily order series (integer-exact)
# ---------------------------------------------------------------------------

def orders_trend_decompose(sf_dir: str):
    """Classical trend/residual decomposition of daily order counts in
    EXACT integers: trend7_sum = the 7-day CENTERED window sum (full
    windows only), resid7 = 7*n - trend7_sum (positive = above-trend
    day, the seasonality+noise component x7) — the decomposition
    step behind orders_dow_profile's seasonal effect, kept in window
    sums so no division ever rounds.

    Scale shape: the (day, n) series folds bounded from per-batch
    partials (days, not orders); the centered window walk is a
    prefix-sum over that bounded series."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"day": t["o_orderdate"]}), ["day"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    agg: dict = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for d, n in zip(tb["day"].to_pylist(), tb["n"].to_pylist()):
            agg[d] = agg.get(d, 0) + int(n)
    days = sorted(agg)
    ns = [agg[d] for d in days]
    out_d, out_n, out_t, out_r = [], [], [], []
    for i in range(3, len(days) - 3):
        t7 = sum(ns[i - 3 : i + 4])
        out_d.append(days[i])
        out_n.append(ns[i])
        out_t.append(t7)
        out_r.append(7 * ns[i] - t7)
    return pa.table(
        {
            "day": pa.array(out_d, pa.timestamp("us")),
            "n": pa.array(out_n, pa.int64()),
            "trend7_sum": pa.array(out_t, pa.int64()),
            "resid7": pa.array(out_r, pa.int64()),
        }
    )


ORDERS_TREND_DECOMPOSE_SQL = """
WITH d AS (
  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
w AS (
  SELECT day, n,
         CAST(sum(n) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
           AS trend7_sum,
         CAST(count(*) OVER (ORDER BY day
              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wn
  FROM d
)
SELECT day, n, trend7_sum, CAST(7 * n - trend7_sum AS BIGINT) AS resid7
FROM w WHERE wn = 7
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Churn hazard curve (discrete survival analysis over activity weeks)
# ---------------------------------------------------------------------------

def churn_hazard_curve(sf_dir: str):
    """Discrete-time churn hazard over QUARTERS-since-first-order per
    customer: per offset k, at_risk = customers whose last-order
    offset >= k, churned = customers whose last offset is EXACTLY k
    and who are not right-censored (still ordering in the final
    observed quarter), hazard_permille = churned*1000 // at_risk —
    the Kaplan-Meier-style survival statistic user_retention's cohort
    matrix doesn't give (hazard conditions on being alive, retention
    doesn't).  Quarters, because the events table's users are all
    active across the whole window (every hazard would be 0) while
    customer order spans genuinely vary.

    Scale shape: per-customer (first, last) are two bucketed min/max
    aggregates over (customer, quarter) ints; the offset histogram
    folds bounded by the quarter span, never customer count."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    q_us = 91 * 24 * 3600 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["o_orderdate"], pa.int64()), q_us)
        g = pa.TableGroupBy(
            pa.table({"user_id": t["o_custkey"], "w": w}), ["user_id"]
        ).aggregate([("w", "min"), ("w", "max")])
        return pa.table(
            {
                "user_id": g["user_id"],
                "wmin": pc.cast(g["w_min"], pa.int64()),
                "wmax": pc.cast(g["w_max"], pa.int64()),
            }
        )

    lo = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        [("wmin", "min", "wmin"), ("wmax", "max", "wmax")],
    )
    first: dict = {}
    last: dict = {}
    for tb in map(ray.get, lo.to_arrow_refs()):
        if not tb.num_rows:
            continue
        for u, a, b in zip(
            tb["user_id"].to_pylist(), tb["wmin"].to_pylist(), tb["wmax"].to_pylist()
        ):
            first[u] = min(first.get(u, a), a)
            last[u] = max(last.get(u, b), b)
    wmax_global = max(last.values())
    offs: dict[int, list] = {}
    for u in first:
        k = last[u] - first[u]
        censored = 1 if last[u] == wmax_global else 0
        a = offs.setdefault(k, [0, 0])
        a[0] += 1
        a[1] += 1 - censored
    ks = sorted(offs)
    total = sum(v[0] for v in offs.values())
    out_k, out_ar, out_ch, out_hz = [], [], [], []
    cum = 0
    for k in ks:
        at_risk = total - cum
        churned = offs[k][1]
        out_k.append(k)
        out_ar.append(at_risk)
        out_ch.append(churned)
        out_hz.append(churned * 1000 // at_risk)
        cum += offs[k][0]
    return pa.table(
        {
            "week_offset": pa.array(out_k, pa.int64()),
            "at_risk": pa.array(out_ar, pa.int64()),
            "churned": pa.array(out_ch, pa.int64()),
            "hazard_permille": pa.array(out_hz, pa.int64()),
        }
    )


CHURN_HAZARD_SQL = """
WITH uw AS (
  SELECT o_custkey,
         min(CAST(epoch_us(o_orderdate::TIMESTAMP) AS BIGINT) // 7862400000000)
           AS wmin,
         max(CAST(epoch_us(o_orderdate::TIMESTAMP) AS BIGINT) // 7862400000000)
           AS wmax
  FROM orders GROUP BY o_custkey
),
g AS (SELECT max(wmax) AS wg FROM uw),
o AS (
  SELECT CAST(uw.wmax - uw.wmin AS BIGINT) AS k,
         CAST(CASE WHEN uw.wmax = g.wg THEN 0 ELSE 1 END AS BIGINT) AS obs
  FROM uw, g
),
h AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_k, CAST(sum(obs) AS BIGINT) AS churned
  FROM o GROUP BY k
),
c AS (
  SELECT k, n_k, churned,
         CAST((SELECT count(*) FROM o) AS BIGINT)
           - CAST(coalesce(sum(n_k) OVER (ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS at_risk
  FROM h
)
SELECT k AS week_offset, at_risk, churned,
       CAST(churned * 1000 // at_risk AS BIGINT) AS hazard_permille
FROM c ORDER BY week_offset
"""


# ---------------------------------------------------------------------------
# Per-group percentile rank without a window (broadcast histograms)
# ---------------------------------------------------------------------------

def order_value_pct_by_nation(sf_dir: str):
    """Every order's percentile rank WITHIN its customer's nation:
    pct_permille = (strictly-less count)*1000 // (n_nation - 1) — the
    grouped window rank (rank() OVER PARTITION BY) computed the way a
    10^12-row engine must: no per-group sort window, just a per-nation
    VALUE HISTOGRAM folded from per-batch partials, broadcast once,
    and one searchsorted per batch (the doc_global_rank pattern, per
    group).  The nation attach broadcasts the customer dim (1 int per
    customer); the partitioned hash join is the named alternative
    when the dim outgrows a broadcast.

    Cents histograms are bounded by distinct prices, not orders —
    the same boundedness hdr_quantile_error and range_partition_plan
    exploit."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].combine_chunks()
    nk = pc.cast(cust["c_nationkey"], pa.int64()).combine_chunks()
    dim_ref = state.broadcast({"ck": ck, "nk": nk})

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def attach(t: pa.Table) -> pa.Table:
        st = state.cached_get(dim_ref)
        idx = pc.index_in(t["o_custkey"], value_set=st["ck"])
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_nationkey": st["nk"].take(idx),
                "cents": _to_cents(t["o_totalprice"]),
            }
        )

    attached = ds.map_batches(attach, batch_format="pyarrow")

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["c_nationkey", "cents"]), ["c_nationkey", "cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "c_nationkey": g["c_nationkey"],
                "cents": g["cents"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    hist: dict[int, dict[int, int]] = {}
    for tb in map(
        ray.get,
        attached.map_batches(hist_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for nkv, c, n in zip(
            tb["c_nationkey"].to_pylist(), tb["cents"].to_pylist(), tb["n"].to_pylist()
        ):
            h = hist.setdefault(int(nkv), {})
            h[int(c)] = h.get(int(c), 0) + int(n)
    tables = {}
    for nkv, h in hist.items():
        uniq = np.array(sorted(h), dtype=np.int64)
        counts = np.array([h[int(v)] for v in uniq], dtype=np.int64)
        cum_before = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tables[nkv] = (uniq, cum_before, int(counts.sum()))
    rank_ref = state.broadcast(tables)

    def pct(t: pa.Table) -> pa.Table:
        tabs = state.cached_get(rank_ref)
        nkv = t["c_nationkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        out = np.zeros(t.num_rows, dtype=np.int64)
        keep = np.ones(t.num_rows, dtype=bool)
        for g in np.unique(nkv):
            uniq, cb, n_tot = tabs[int(g)]
            m = nkv == g
            if n_tot <= 1:
                keep[m] = False
                continue
            pos = np.searchsorted(uniq, cents[m], side="left")
            out[m] = cb[pos] * 1000 // (n_tot - 1)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "c_nationkey": t["c_nationkey"],
                "cents": t["cents"],
                "pct_permille": pa.array(out, pa.int64()),
            }
        ).filter(pa.array(keep))

    return attached.map_batches(pct, batch_format="pyarrow").sort("o_orderkey")


ORDER_VALUE_PCT_SQL = """
WITH oc AS (
  SELECT o.o_orderkey, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
  SELECT o_orderkey, c_nationkey, cents,
         rank() OVER (PARTITION BY c_nationkey ORDER BY cents) AS rk,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM oc
)
SELECT o_orderkey, c_nationkey, cents,
       CAST((rk - 1) * 1000 // (n - 1) AS BIGINT) AS pct_permille
FROM r WHERE n > 1 ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# CMS join-cardinality estimate vs exact (the planner-sketch audit)
# ---------------------------------------------------------------------------

def join_size_cms_audit(sf_dir: str):
    """AMS/Count-Min join-size estimation (Alon-Matias-Szegedy via the
    CMS inner product, Cormode & Muthukrishnan 2005): build one d x 256
    count-min matrix per join side over the orderkey, estimate
    |orders ⋈ lineitem| as min_d sum_w a[d][w]*b[d][w], and report it
    NEXT TO the exact cardinality with the integer-permille
    overestimate — the fourth sketch audit (Bloom FP, HDR error, HLL
    error, now join-size), and the planner statistic that decides
    broadcast-vs-shuffle before any data moves.  The CMS guarantee
    (est >= exact always; over by <= eps*|a||b| w.h.p.) is what
    over_permille empirically validates.

    Scale shape: each side's matrix folds from d*256-bounded per-batch
    partials (key hashing is two vectorized uint64 ops); the exact
    side is the key-per-row bucketed count join_size_exact already
    pays — at 10^12 rows the SKETCH is the production number and the
    exact audit runs sampled, which the mergeable matrices support."""
    from document_extractor_ray.functions.textstats import CMS_A, CMS_B, CMS_D

    def side_matrix(name: str, col: str) -> np.ndarray:
        ds = _read(sf_dir, name, columns=[col])

        def partial(t: pa.Table) -> pa.Table:
            x = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
            rows_, buckets_, ns_ = [], [], []
            with np.errstate(over="ignore"):
                for j in range(CMS_D):
                    w = (
                        (x * np.uint64(CMS_A[j]) + np.uint64(CMS_B[j]))
                        >> np.uint64(56)
                    ).astype(np.int64)
                    cnt = np.bincount(w, minlength=256)
                    nz = np.nonzero(cnt)[0]
                    rows_.append(np.full(len(nz), j, np.int64))
                    buckets_.append(nz.astype(np.int64))
                    ns_.append(cnt[nz].astype(np.int64))
            return pa.table(
                {
                    "j": pa.array(np.concatenate(rows_), pa.int64()),
                    "w": pa.array(np.concatenate(buckets_), pa.int64()),
                    "n": pa.array(np.concatenate(ns_), pa.int64()),
                }
            )

        m = np.zeros((CMS_D, 256), dtype=np.int64)
        for tb in map(
            ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ):
            if not tb.num_rows:
                continue
            np.add.at(
                m,
                (
                    tb["j"].to_numpy(zero_copy_only=False),
                    tb["w"].to_numpy(zero_copy_only=False),
                ),
                tb["n"].to_numpy(zero_copy_only=False),
            )
        return m

    a = side_matrix("orders", "o_orderkey")
    b = side_matrix("lineitem", "l_orderkey")
    est = int(min((a[j] * b[j]).sum() for j in range(CMS_D)))
    exact = int(join_size_exact(sf_dir)["join_rows"][0].as_py())
    return pa.table(
        {
            "exact_rows": pa.array([exact], pa.int64()),
            "est_rows": pa.array([est], pa.int64()),
            "over_permille": pa.array(
                [(est - exact) * 1000 // max(exact, 1)], pa.int64()
            ),
        }
    )


def _join_cms_sql() -> str:
    from document_extractor_ray.functions.textstats import CMS_A, CMS_B, CMS_D

    hp_rows = ",\n    ".join(
        f"({j}, {int(CMS_A[j])}::HUGEINT, {int(CMS_B[j])}::HUGEINT)"
        for j in range(CMS_D)
    )
    p64 = 1 << 64
    shift = 1 << 56
    return f"""
WITH ok AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY 1),
lk AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
       FROM lineitem GROUP BY 1),
hp(j, a, b) AS (VALUES
    {hp_rows}
),
ca AS (
  SELECT hp.j,
         ((ok.k::HUGEINT * hp.a + hp.b) % {p64}::HUGEINT)
           // {shift}::HUGEINT AS w,
         CAST(sum(ok.n) AS BIGINT) AS n
  FROM ok CROSS JOIN hp GROUP BY 1, 2
),
cb AS (
  SELECT hp.j,
         ((lk.k::HUGEINT * hp.a + hp.b) % {p64}::HUGEINT)
           // {shift}::HUGEINT AS w,
         CAST(sum(lk.n) AS BIGINT) AS n
  FROM lk CROSS JOIN hp GROUP BY 1, 2
),
dots AS (
  SELECT ca.j, CAST(sum(ca.n * cb.n) AS BIGINT) AS dot
  FROM ca JOIN cb ON cb.j = ca.j AND cb.w = ca.w
  GROUP BY ca.j
),
est AS (SELECT CAST(min(dot) AS BIGINT) AS e FROM dots),
ex AS (SELECT CAST(coalesce(sum(ok.n * lk.n), 0) AS BIGINT) AS x
       FROM ok JOIN lk USING (k))
SELECT ex.x AS exact_rows, est.e AS est_rows,
       CAST((est.e - ex.x) * 1000 // greatest(ex.x, 1) AS BIGINT)
         AS over_permille
FROM ex, est
"""


JOIN_SIZE_CMS_SQL = _join_cms_sql()


# ---------------------------------------------------------------------------
# Exact single-changepoint over the daily event series
# ---------------------------------------------------------------------------

def events_top_changepoint(sf_dir: str):
    """The single best changepoint in the daily event-count series:
    the split that minimizes pooled within-segment SSE — equivalently
    (total sum-of-squares being split-invariant) MAXIMIZES
    s1²/n1 + s2²/n2 — compared as exact integer rationals
    (score_num = s1²·n2 + s2²·n1 over score_den = n1·n2, cross-
    multiplied), earliest split wins ties.  This is one step of binary
    segmentation, the classic batch changepoint detector.

    Scale shape: the only distributed work is the bounded daily-count
    fold (per-block partials, one skip-empty driver fold — the PERF
    step 32 shape); the argmax scans the day-count series, which is
    bounded by the calendar, never by event volume."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

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
    tot = sum(ns)
    best = None  # (num, den, n_left, ...) compared by cross-multiplication
    cum = 0
    for i in range(1, m):
        cum += ns[i - 1]
        n1, n2 = i, m - i
        s1, s2 = cum, tot - cum
        num = s1 * s1 * n2 + s2 * s2 * n1
        den = n1 * n2
        if best is None or num * best[1] > best[0] * den:
            best = (num, den, i, s1, s2)
    if best is None:  # <2 days: no split exists (oracle emits no row)
        return pa.table(
            {
                "split_day": pa.array([], pa.timestamp("us")),
                "n_left": pa.array([], pa.int64()),
                "n_right": pa.array([], pa.int64()),
                "sum_left": pa.array([], pa.int64()),
                "sum_right": pa.array([], pa.int64()),
                "score_num": pa.array([], pa.int64()),
                "score_den": pa.array([], pa.int64()),
            }
        )
    num, den, i, s1, s2 = best
    return pa.table(
        {
            "split_day": pa.array([days[i]], pa.timestamp("us")),
            "n_left": pa.array([i], pa.int64()),
            "n_right": pa.array([m - i], pa.int64()),
            "sum_left": pa.array([s1], pa.int64()),
            "sum_right": pa.array([s2], pa.int64()),
            "score_num": pa.array([num], pa.int64()),
            "score_den": pa.array([den], pa.int64()),
        }
    )


EVENTS_TOP_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
ord AS (
  SELECT day, n,
         row_number() OVER (ORDER BY day) AS i,
         lead(day) OVER (ORDER BY day) AS next_day,
         count(*) OVER () AS m,
         sum(n) OVER (ORDER BY day) AS cum,
         sum(n) OVER () AS tot
  FROM daily
),
cand AS (
  SELECT next_day AS split_day,
         CAST(i AS BIGINT) AS n_left, CAST(m - i AS BIGINT) AS n_right,
         CAST(cum AS BIGINT) AS sum_left, CAST(tot - cum AS BIGINT) AS sum_right,
         CAST(cum * cum * (m - i) + (tot - cum) * (tot - cum) * i AS BIGINT)
           AS score_num,
         CAST(i * (m - i) AS BIGINT) AS score_den
  FROM ord WHERE i < m
)
SELECT split_day, n_left, n_right, sum_left, sum_right, score_num, score_den
FROM cand c
WHERE NOT EXISTS (
  SELECT 1 FROM cand d
  WHERE CAST(d.score_num AS HUGEINT) * c.score_den
          > CAST(c.score_num AS HUGEINT) * d.score_den
     OR (CAST(d.score_num AS HUGEINT) * c.score_den
           = CAST(c.score_num AS HUGEINT) * d.score_den
         AND d.n_left < c.n_left)
)
"""


# ---------------------------------------------------------------------------
# Customer-cohort LTV triangle over orders
# ---------------------------------------------------------------------------

def customer_cohort_ltv(sf_dir: str):
    """Lifetime-value cohort triangle: customers grouped by the
    QUARTER of their first order, revenue and activity folded per
    (cohort quarter, quarters-since-first) cell — the finance-side
    sequel to user_retention's activity triangle.

    Same scale shape as user_retention: per-batch (custkey, quarter,
    cents) partials, ONE custkey-hash shuffle so each customer's
    history co-locates (distinct-customer partials from disjoint
    partitions add exactly), then a grouped Sum over rows bounded by
    cohorts × ages — calendar-bounded, never order-bounded."""
    ds = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"]
    )
    n_parts = _n_blocks()

    def partial(t: pa.Table) -> pa.Table:
        q = pc.add(
            pc.multiply(pc.year(t["o_orderdate"]), pa.scalar(4, pa.int32())),
            pc.subtract(pc.quarter(t["o_orderdate"]), pa.scalar(1, pa.int32())),
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "cust": t["o_custkey"],
                    "q": pc.cast(q, pa.int64()),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["cust", "q"],
        ).aggregate([("cents", "sum"), ([], "count_all")])
        u = g["cust"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (u * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "cust": g["cust"],
                "q": g["q"],
                "cents": pc.cast(g["cents_sum"], pa.int64()),
                "n": pc.cast(g["count_all"], pa.int64()),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def cohort_partial(g: pd.DataFrame) -> pa.Table:
        g = (
            g.groupby(["cust", "q"], sort=False)[["cents", "n"]]
            .sum()
            .reset_index()
        )
        cq = g.groupby("cust")["q"].transform("min").to_numpy()
        cell = pd.DataFrame(
            {
                "cq": cq,
                "age": g["q"].to_numpy() - cq,
                "cents": g["cents"].to_numpy(),
                "n": g["n"].to_numpy(),
                "cust": g["cust"].to_numpy(),
            }
        )
        agg = cell.groupby(["cq", "age"], sort=False).agg(
            n_customers=("cust", "nunique"),
            n_orders=("n", "sum"),
            revenue_cents=("cents", "sum"),
        )
        idx = agg.index.to_frame(index=False)
        return pa.table(
            {
                "cq": pa.array(idx["cq"].to_numpy().astype("int64"), pa.int64()),
                "age_quarters": pa.array(
                    idx["age"].to_numpy().astype("int64"), pa.int64()
                ),
                "n_customers": pa.array(
                    agg["n_customers"].to_numpy().astype("int64"), pa.int64()
                ),
                "n_orders": pa.array(
                    agg["n_orders"].to_numpy().astype("int64"), pa.int64()
                ),
                "revenue_cents": pa.array(
                    agg["revenue_cents"].to_numpy().astype("int64"), pa.int64()
                ),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_year": pc.divide(t["cq"], pa.scalar(4, pa.int64())),
                "cohort_quarter": pc.add(
                    pc.subtract(
                        t["cq"],
                        pc.multiply(
                            pc.divide(t["cq"], pa.scalar(4, pa.int64())),
                            pa.scalar(4, pa.int64()),
                        ),
                    ),
                    pa.scalar(1, pa.int64()),
                ),
                "age_quarters": t["age_quarters"],
                "n_customers": t["n_customers"],
                "n_orders": t["n_orders"],
                "revenue_cents": t["revenue_cents"],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cohort_partial, batch_format="pandas")
        .groupby(["cq", "age_quarters"])
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort(["cohort_year", "cohort_quarter", "age_quarters"])
    )


CUSTOMER_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS q,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT o_custkey, min(q) AS cq FROM o GROUP BY 1)
SELECT CAST(f.cq // 4 AS BIGINT) AS cohort_year,
       CAST(f.cq % 4 + 1 AS BIGINT) AS cohort_quarter,
       CAST(o.q - f.cq AS BIGINT) AS age_quarters,
       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o.cents) AS BIGINT) AS revenue_cents
FROM o JOIN f USING (o_custkey)
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Out-of-orderness / watermark lateness audit (ingest replay)
# ---------------------------------------------------------------------------

LATE_RANGE = 1024  # keys per deterministic lateness range


def ingest_lateness_audit(sf_dir: str, range_size: int = LATE_RANGE):
    """Event-time lateness per arrival, replaying the orders feed in
    insertion-key order: with o_orderkey as the arrival sequence and
    o_orderdate as event time, lateness = running-max(prior event
    time) − event time (clamped at 0) — the out-of-orderness profile
    that sizes a streaming watermark delay (an arrival with
    late_us > D would be dropped by a watermark D behind the
    high-water mark).  The events table is already ts-sorted by
    event_id (zero lateness — verified), so the orders feed is the
    non-vacuous stream for this audit.

    Scale shape: the global running max decomposes over deterministic
    key RANGES (the pack_sequences trick): pass 1 folds one
    (range, max_ts) row per range (bounded by id-domain/range_size,
    pick range_size so ranges fit the driver), the driver broadcasts
    EXCLUSIVE prefix maxima, pass 2 shuffles rows once by range and
    runs a vectorized within-range cummax — output independent of
    block layout."""
    from document_extractor_ray import state

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    n_parts = _n_blocks()

    def range_partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "rng": pc.divide(t["o_orderkey"], pa.scalar(range_size, pa.int64())),
                "ts_us": pc.cast(t["o_orderdate"], pa.int64()),
            }
        )
        return keyed.group_by("rng").aggregate([("ts_us", "max")])

    fold: dict[int, int] = {}
    for tb in map(
        ray.get, ds.map_batches(range_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for r, m in zip(tb["rng"].to_pylist(), tb["ts_us_max"].to_pylist()):
            r = int(r)
            fold[r] = max(fold.get(r, np.iinfo(np.int64).min), int(m))
    rngs = np.array(sorted(fold), dtype=np.int64)
    maxes = np.array([fold[int(r)] for r in rngs], dtype=np.int64)
    # exclusive prefix max: the high-water mark BEFORE each range
    excl = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(maxes)[:-1])
    )
    base_ref = state.broadcast((rngs, excl))

    def add_part(t: pa.Table) -> pa.Table:
        rng = pc.divide(t["o_orderkey"], pa.scalar(range_size, pa.int64()))
        rn = rng.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (rn * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "rng": rng,
                "ts_us": pc.cast(t["o_orderdate"], pa.int64()),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def late_partition(g: pd.DataFrame) -> pa.Table:
        rngs_b, excl_b = state.cached_get(base_ref)
        g = g.sort_values(["rng", "o_orderkey"], kind="mergesort")
        ts = g["ts_us"].to_numpy().astype(np.int64)
        # within-range prior cummax (shifted), seeded by the broadcast
        # exclusive range base
        base = excl_b[np.searchsorted(rngs_b, g["rng"].to_numpy())]
        out = np.empty(len(g), dtype=np.int64)
        start = 0
        rvals = g["rng"].to_numpy()
        for i in range(1, len(g) + 1):
            if i == len(g) or rvals[i] != rvals[start]:
                seg = ts[start:i]
                prior = np.concatenate(
                    ([base[start]], np.maximum.accumulate(seg)[:-1])
                )
                out[start:i] = np.maximum(prior, base[start])
                start = i
        with np.errstate(over="ignore"):
            late = np.maximum(out - ts, 0)
        # the very first arrival has no predecessor: base is -inf there
        late[out == np.iinfo(np.int64).min] = 0
        # return an ARROW block: pandas blocks make the downstream sort
        # + row materialization pay a per-row conversion (measured 111 s
        # vs ~2 s for the Arrow twin delta_partition at sf0.1)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    g["o_orderkey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "late_us": pa.array(late.astype(np.int64), pa.int64()),
                "is_late": pa.array(late > 0, pa.bool_()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(late_partition, batch_format="pandas")
        .sort("o_orderkey")
    )


INGEST_LATENESS_SQL = """
SELECT o_orderkey,
       CAST(greatest(
         coalesce(max(epoch_us(o_orderdate)) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - epoch_us(o_orderdate), 0), 0) AS BIGINT) AS late_us,
       CAST(greatest(
         coalesce(max(epoch_us(o_orderdate)) OVER (ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  - epoch_us(o_orderdate), 0), 0) > 0 AS BOOLEAN) AS is_late
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Population stability index (PSI) drift per event type
# ---------------------------------------------------------------------------

def value_psi_drift(sf_dir: str):
    """PSI of event value between the first and second half of the
    window, per type — THE industry drift gate (PSI < 0.1 stable,
    > 0.25 retrain), complementing value_drift_quantiles (shift) and
    value_ks_types (max gap) with the full-distribution divergence.

    Bins are the reference window's deciles (percentile_disc edges,
    ties falling low), counts Laplace-smoothed (+1 per bin) so empty
    bins stay defined, and PSI is computed as ONE exact integer
    rational: psi_micro = Σ (a'B' − b'A')·(L(a'B') − L(b'A')) // A'B'
    with L(v) = round(ln v · 1e6) — the proven ln-micro identity, so
    both engines emit the identical integer.

    Scale shape: the same (type, window, cents) bucketed count fold as
    the quantile/KS family (value-domain-bounded); edges, binning and
    the 10-term PSI sum are a driver walk over that bounded table."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        w = pc.cast(
            pc.greater_equal(pc.cast(t["ts"], pa.int64()), _DRIFT_SPLIT_US),
            pa.int64(),
        )
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t["event_type"],
                    "w": w,
                    "cents": _to_cents(t["value"]),
                }
            ),
            ["event_type", "w", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "w": g["w"],
                "cents": g["cents"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cnt = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "w", "cents"],
        [("n_part", "sum", "n")],
    ).take_all()
    groups: dict[tuple, dict] = {}
    for r in cnt:
        groups.setdefault((r["event_type"], int(r["w"])), {})[int(r["cents"])] = (
            groups.get((r["event_type"], int(r["w"])), {}).get(int(r["cents"]), 0)
            + int(r["n"])
        )

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    types = sorted({k[0] for k in groups})
    out_t, out_psi, out_a, out_b = [], [], [], []
    for ty in types:
        ref = sorted(groups.get((ty, 0), {}).items())
        cur = sorted(groups.get((ty, 1), {}).items())
        vals = np.array([c for c, _ in ref], dtype=np.int64)
        ns = np.array([n for _, n in ref], dtype=np.int64)
        tot = int(ns.sum())
        cum = np.cumsum(ns)
        edges = []
        for q in range(100, 1000, 100):
            need = (tot * q + 999) // 1000
            edges.append(int(vals[np.searchsorted(cum, need)]))
        edges = np.array(edges, dtype=np.int64)

        def bincounts(rows):
            cnts = np.zeros(10, dtype=np.int64)
            for cents, n in rows:
                cnts[np.searchsorted(edges, cents, side="left")] += n
            return cnts

        a1 = bincounts(ref) + 1
        b1 = bincounts(cur) + 1
        A = int(a1.sum())
        B = int(b1.sum())
        num = sum(
            (int(a) * B - int(b) * A) * (L(int(a) * B) - L(int(b) * A))
            for a, b in zip(a1, b1)
        )
        out_t.append(ty)
        out_psi.append(num // (A * B))
        out_a.append(A)
        out_b.append(B)
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "psi_micro": pa.array(out_psi, pa.int64()),
            "n_ref_smoothed": pa.array(out_a, pa.int64()),
            "n_cur_smoothed": pa.array(out_b, pa.int64()),
        }
    )


VALUE_PSI_DRIFT_SQL = """
WITH v AS (
  SELECT event_type,
         CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS w,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
ref AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS n
  FROM v WHERE w = 0 GROUP BY 1, 2
),
edges AS (
  SELECT event_type, q, min(cents) AS edge
  FROM (
    SELECT r.event_type, r.cents, qq.q,
           sum(n) OVER (PARTITION BY r.event_type, qq.q
                        ORDER BY r.cents) AS cum,
           sum(n) OVER (PARTITION BY r.event_type, qq.q) AS tot
    FROM ref r
    CROSS JOIN (SELECT unnest(range(1, 10)) * 100 AS q) qq
  )
  WHERE cum >= (tot * q + 999) // 1000
  GROUP BY 1, 2
),
binned AS (
  SELECT v.event_type, v.w,
         (SELECT count(*) FROM edges e
          WHERE e.event_type = v.event_type AND v.cents > e.edge) AS bin
  FROM v
),
cnt AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM binned GROUP BY 1, 2
),
bins AS (
  SELECT t.event_type, gg.bin
  FROM (SELECT DISTINCT event_type FROM v) t
  CROSS JOIN (SELECT unnest(range(10)) AS bin) gg
),
filled AS (
  SELECT bins.event_type, bins.bin,
         coalesce(c.a, 0) + 1 AS a1, coalesce(c.b, 0) + 1 AS b1
  FROM bins LEFT JOIN cnt c
    ON c.event_type = bins.event_type AND c.bin = bins.bin
),
tot AS (
  SELECT event_type, CAST(sum(a1) AS BIGINT) AS na,
         CAST(sum(b1) AS BIGINT) AS nb
  FROM filled GROUP BY 1
),
term AS (
  SELECT f.event_type, t.na, t.nb,
         (f.a1 * t.nb - f.b1 * t.na)
         * (CAST(round(ln(f.a1 * t.nb) * 1000000) AS BIGINT)
            - CAST(round(ln(f.b1 * t.na) * 1000000) AS BIGINT)) AS tt
  FROM filled f JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(sum(tt) // (na * nb) AS BIGINT) AS psi_micro,
       CAST(na AS BIGINT) AS n_ref_smoothed,
       CAST(nb AS BIGINT) AS n_cur_smoothed
FROM term
GROUP BY event_type, na, nb
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Columnar delta-encoding size planner over the events stream
# ---------------------------------------------------------------------------

ENC_RANGE = 1024  # event_ids per deterministic encoding range


def encoding_size_audit(sf_dir: str, range_size: int = ENC_RANGE):
    """Storage planner for delta encoding: for each of the three
    numeric event columns (event_id, ts as µs, value as cents), take
    successive differences in event_id order, classify every delta
    into its minimal signed byte width (1/2/4/8) and report per
    (column, width) value counts and byte mass — the table that
    predicts Parquet/Gorilla delta-encoding wins before a rewrite
    (sequential ids compress to 1 byte/value, timestamps near it,
    random cents don't).

    Scale shape: like ingest_lateness_audit, the neighbor dependency
    decomposes over deterministic event_id RANGES — pass 1 folds one
    boundary row per range (the values at the range's max event_id),
    the driver broadcasts each range's PREDECESSOR boundary, pass 2
    shuffles once by range and differences each range vectorized; the
    (column × 4-width) aggregate is a driver fold."""
    from document_extractor_ray import state

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "value"])
    n_parts = _n_blocks()

    def cols_of(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "cents": _to_cents(t["value"]),
            }
        )

    def boundary_partial(t: pa.Table) -> pa.Table:
        t = cols_of(t)
        rng = pc.divide(t["event_id"], pa.scalar(range_size, pa.int64()))
        tb = t.append_column("rng", rng)
        g = pa.TableGroupBy(tb, ["rng"]).aggregate([("event_id", "max")])
        # re-attach the row values AT the per-range max event_id
        idx = pc.index_in(g["event_id_max"], value_set=tb["event_id"])
        return pa.table(
            {
                "rng": g["rng"],
                "max_eid": g["event_id_max"],
                "ts_us": tb["ts_us"].take(idx),
                "cents": tb["cents"].take(idx),
            }
        )

    bound: dict[int, tuple] = {}
    for tb in map(
        ray.get,
        ds.map_batches(boundary_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for r, e, tsu, c in zip(
            tb["rng"].to_pylist(),
            tb["max_eid"].to_pylist(),
            tb["ts_us"].to_pylist(),
            tb["cents"].to_pylist(),
        ):
            r = int(r)
            if r not in bound or int(e) > bound[r][0]:
                bound[r] = (int(e), int(tsu), int(c))
    # predecessor boundary per range (None for the lowest range)
    prev: dict[int, tuple] = {}
    rs = sorted(bound)
    for i, r in enumerate(rs):
        if i:
            prev[r] = bound[rs[i - 1]][0:3]
    prev_ref = state.broadcast(prev)

    def add_part(t: pa.Table) -> pa.Table:
        t = cols_of(t)
        rng = pc.divide(t["event_id"], pa.scalar(range_size, pa.int64()))
        rn = rng.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (rn * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column("rng", rng).append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def width_of(d: np.ndarray) -> np.ndarray:
        a = np.abs(d)
        return np.select(
            [a < (1 << 7), a < (1 << 15), a < (1 << 31)], [1, 2, 4], 8
        ).astype(np.int64)

    def delta_partition(g: pd.DataFrame) -> pa.Table:
        pv = state.cached_get(prev_ref)
        g = g.sort_values(["rng", "event_id"], kind="mergesort")
        counts: dict[tuple, int] = {}
        rvals = g["rng"].to_numpy()
        data = {
            "event_id": g["event_id"].to_numpy().astype(np.int64),
            "ts_us": g["ts_us"].to_numpy().astype(np.int64),
            "cents": g["cents"].to_numpy().astype(np.int64),
        }
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or rvals[i] != rvals[start]:
                p = pv.get(int(rvals[start]))
                for ci, col in enumerate(("event_id", "ts_us", "cents")):
                    seg = data[col][start:i]
                    first = np.array(
                        [] if p is None else [seg[0] - p[ci]], dtype=np.int64
                    )
                    d = np.concatenate((first, np.diff(seg)))
                    w = width_of(d)
                    for wv, n in zip(*np.unique(w, return_counts=True)):
                        k = (col, int(wv))
                        counts[k] = counts.get(k, 0) + int(n)
                start = i
        keys = sorted(counts)
        return pa.table(
            {
                "column": pa.array([k[0] for k in keys], pa.string()),
                "width_bytes": pa.array([k[1] for k in keys], pa.int64()),
                "n_p": pa.array([counts[k] for k in keys], pa.int64()),
            }
        )

    fold: dict[tuple, int] = {}
    shuffled = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(delta_partition, batch_format="pandas")
    )
    for tb in map(ray.get, shuffled.to_arrow_refs()):
        if not tb.num_rows:
            continue
        for c, w, n in zip(
            tb["column"].to_pylist(),
            tb["width_bytes"].to_pylist(),
            tb["n_p"].to_pylist(),
        ):
            fold[(c, int(w))] = fold.get((c, int(w)), 0) + int(n)
    keys = sorted(fold)
    return pa.table(
        {
            "column": pa.array([k[0] for k in keys], pa.string()),
            "width_bytes": pa.array([k[1] for k in keys], pa.int64()),
            "n_values": pa.array([fold[k] for k in keys], pa.int64()),
            "sum_bytes": pa.array(
                [fold[k] * k[1] for k in keys], pa.int64()
            ),
        }
    )


ENCODING_SIZE_AUDIT_SQL = """
WITH s AS (
  SELECT event_id,
         event_id - lag(event_id) OVER w AS d_eid,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS d_ts,
         CAST(round(value * 100.0) AS BIGINT)
           - lag(CAST(round(value * 100.0) AS BIGINT)) OVER w AS d_cents
  FROM events
  WINDOW w AS (ORDER BY event_id)
),
u AS (
  SELECT 'event_id' AS "column", d_eid AS d FROM s WHERE d_eid IS NOT NULL
  UNION ALL
  SELECT 'ts_us', d_ts FROM s WHERE d_ts IS NOT NULL
  UNION ALL
  SELECT 'cents', d_cents FROM s WHERE d_cents IS NOT NULL
),
w AS (
  SELECT "column",
         CASE WHEN abs(d) < 128 THEN 1
              WHEN abs(d) < 32768 THEN 2
              WHEN abs(d) < 2147483648 THEN 4
              ELSE 8 END AS width_bytes
  FROM u
)
SELECT "column", CAST(width_bytes AS BIGINT) AS width_bytes,
       CAST(count(*) AS BIGINT) AS n_values,
       CAST(count(*) * width_bytes AS BIGINT) AS sum_bytes
FROM w
GROUP BY "column", width_bytes
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Zone-map (min/max skip index) pruning audit
# ---------------------------------------------------------------------------

ZONE_RANGE = 1024  # event_ids per zone


def zonemap_prune_audit(sf_dir: str, range_size: int = ZONE_RANGE):
    """How much would a min/max zone map (Parquet row-group stats,
    ClickHouse skip index) prune: for each reference decile threshold
    t of event value, count the zones whose max < t — those zones are
    skipped entirely by a ``value >= t`` scan — plus the row mass
    skipped.  Near-zero pruning (the expected result for a value
    column uncorrelated with insertion order) is itself the finding:
    it says SORT before writing if value predicates matter.

    Scale shape: two bounded folds — a (zone → min/max/count) map
    (zones = id-domain/range_size) and the (cents → count) histogram
    the quantile family shares; the audit table is a driver walk."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def zone_partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "rng": pc.divide(t["event_id"], pa.scalar(range_size, pa.int64())),
                "cents": _to_cents(t["value"]),
            }
        )
        g = pa.TableGroupBy(keyed, ["rng"]).aggregate(
            [("cents", "min"), ("cents", "max"), ([], "count_all")]
        )
        return pa.table(
            {
                "rng": g["rng"],
                "mn": g["cents_min"],
                "mx": g["cents_max"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    zones: dict[int, list] = {}
    for tb in map(
        ray.get, ds.map_batches(zone_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for r, mn, mx, n in zip(
            tb["rng"].to_pylist(), tb["mn"].to_pylist(),
            tb["mx"].to_pylist(), tb["n"].to_pylist(),
        ):
            r = int(r)
            cur = zones.setdefault(r, [int(mn), int(mx), 0])
            cur[0] = min(cur[0], int(mn))
            cur[1] = max(cur[1], int(mx))
            cur[2] += int(n)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"cents": _to_cents(t["value"])}), ["cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"cents": g["cents"], "n_part": pc.cast(g["count_all"], pa.int64())}
        )

    hist = bucketed_agg(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["cents"],
        [("n_part", "sum", "n")],
    ).take_all()
    pairs = sorted((int(r["cents"]), int(r["n"])) for r in hist)
    vals = np.array([c for c, _ in pairs], dtype=np.int64)
    cnts = np.array([n for _, n in pairs], dtype=np.int64)
    cum = np.cumsum(cnts)
    tot = int(cum[-1]) if len(cum) else 0

    zmx = np.array([zones[r][1] for r in sorted(zones)], dtype=np.int64)
    zn = np.array([zones[r][2] for r in sorted(zones)], dtype=np.int64)
    out = {k: [] for k in (
        "q_permille", "threshold_cents", "n_zones", "n_zones_pruned",
        "rows_pruned",
    )}
    for q in range(100, 1000, 100):
        need = (tot * q + 999) // 1000
        thr = int(vals[np.searchsorted(cum, need)])
        pruned = zmx < thr
        out["q_permille"].append(q)
        out["threshold_cents"].append(thr)
        out["n_zones"].append(len(zmx))
        out["n_zones_pruned"].append(int(pruned.sum()))
        out["rows_pruned"].append(int(zn[pruned].sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


ZONEMAP_PRUNE_AUDIT_SQL = f"""
WITH r AS (
  SELECT event_id // {ZONE_RANGE} AS rng,
         CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
z AS (SELECT rng, max(cents) AS mx, CAST(count(*) AS BIGINT) AS n
      FROM r GROUP BY 1),
c AS (SELECT cents, CAST(count(*) AS BIGINT) AS n FROM r GROUP BY 1),
q AS (
  SELECT q, min(cents) AS thr
  FROM (
    SELECT c.cents, qq.q,
           sum(n) OVER (PARTITION BY qq.q ORDER BY c.cents) AS cum,
           sum(n) OVER (PARTITION BY qq.q) AS tot
    FROM c CROSS JOIN (SELECT unnest(range(1, 10)) * 100 AS q) qq
  )
  WHERE cum >= (tot * q + 999) // 1000
  GROUP BY 1
)
SELECT CAST(q.q AS BIGINT) AS q_permille,
       CAST(q.thr AS BIGINT) AS threshold_cents,
       CAST(count(*) AS BIGINT) AS n_zones,
       CAST(sum(CASE WHEN z.mx < q.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zones_pruned,
       CAST(sum(CASE WHEN z.mx < q.thr THEN z.n ELSE 0 END) AS BIGINT)
         AS rows_pruned
FROM q CROSS JOIN z
GROUP BY q.q, q.thr
ORDER BY q_permille
"""


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


# ---------------------------------------------------------------------------
# Top-customer revenue concentration per order year
# ---------------------------------------------------------------------------

TOP_SHARE_K = 10


def top_customer_share_by_year(sf_dir: str, k: int = TOP_SHARE_K):
    """Customer-concentration trend: per order year, the revenue share
    (milli) of that year's top-k customers — the key-account risk
    metric next to revenue_gini_by_nation.  Top-k rule: cents desc,
    custkey asc.

    Scale shape: the (year, customer) revenue is a key-per-row
    aggregate → ``bucketed_agg``; each bucket emits only its local
    top-k per year plus per-year totals, so the driver merge is
    bounded by years × (k × buckets)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                    "o_custkey": t["o_custkey"],
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["year", "o_custkey"],
        ).aggregate([("cents", "sum")])
        return pa.table(
            {
                "year": g["year"],
                "o_custkey": g["o_custkey"],
                "cents_p": g["cents_sum"],
            }
        )

    per_cust = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["year", "o_custkey"],
        [("cents_p", "sum", "cents")],
    )

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("year", "ascending"),
                ("cents", "descending"),
                ("o_custkey", "ascending"),
            ],
        )
        t = t.take(idx)
        yr = t["year"].to_numpy(zero_copy_only=False)
        new = np.ones(len(yr), dtype=bool)
        new[1:] = yr[1:] != yr[:-1]
        run_start = np.repeat(
            np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(yr)))
        ) if len(yr) else np.zeros(0, np.int64)
        rank = np.arange(len(yr)) - run_start
        keep = rank < TOP_SHARE_K
        # per-year totals ride along as sentinel custkey -1 rows
        g = pa.TableGroupBy(t.select(["year", "cents"]), ["year"]).aggregate(
            [("cents", "sum")]
        )
        tot = pa.table(
            {
                "year": g["year"],
                "o_custkey": pa.array([-1] * g.num_rows, pa.int64()),
                "cents": g["cents_sum"],
            }
        )
        return pa.concat_tables([t.filter(pa.array(keep)), tot])

    acc_top: dict = {}
    acc_tot: dict = {}
    for t in map(
        ray.get,
        per_cust.map_batches(local_topk, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for y, ck, c in zip(
            t["year"].to_pylist(), t["o_custkey"].to_pylist(), t["cents"].to_pylist()
        ):
            if ck == -1:
                acc_tot[y] = acc_tot.get(y, 0) + c
            else:
                acc_top.setdefault(y, []).append((c, ck))

    years = sorted(acc_tot)
    rows = []
    for y in years:
        cands = sorted(acc_top.get(y, []), key=lambda x: (-x[0], x[1]))[:k]
        top = sum(c for c, _ in cands)
        rows.append((y, acc_tot[y], top, (1000 * top) // acc_tot[y]))
    return pa.table(
        {
            "year": pa.array([r[0] for r in rows], pa.int64()),
            "total_cents": pa.array([r[1] for r in rows], pa.int64()),
            "topk_cents": pa.array([r[2] for r in rows], pa.int64()),
            "topk_share_milli": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


TOP_CUSTOMER_SHARE_BY_YEAR_SQL = f"""
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year, o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
r AS (
  SELECT year, cents,
         row_number() OVER (PARTITION BY year
                            ORDER BY cents DESC, o_custkey) AS rn
  FROM c
),
a AS (
  SELECT year,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(COALESCE(sum(cents) FILTER (WHERE rn <= {TOP_SHARE_K}), 0)
              AS BIGINT) AS topk_cents
  FROM r GROUP BY 1
)
SELECT year, total_cents, topk_cents,
       CAST((1000 * topk_cents) // total_cents AS BIGINT) AS topk_share_milli
FROM a ORDER BY year
"""


# ---------------------------------------------------------------------------
# Line-number sequencing conformance audit
# ---------------------------------------------------------------------------

def line_sequencing_audit(sf_dir: str):
    """Schema-contract check: are each order's line numbers the dense
    sequence 1..n?  This feed violates it wholesale (13.4k of 14.7k
    orders at sf0.01), so the audit reports the violation taxonomy a
    data-contract monitor would: orders whose min ≠ 1, whose max ≠
    line count, and the worst max-vs-count overshoot.

    Scale shape: per-order (min, max, count) via ``bucketed_agg``
    (key-per-row rule); the taxonomy is a bounded driver fold."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "ln": pc.cast(t["l_linenumber"], pa.int64()),
                }
            ),
            ["l_orderkey"],
        ).aggregate([("ln", "min"), ("ln", "max"), ([], "count_all")])
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "mn": g["ln_min"],
                "mx": g["ln_max"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_order = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("mn", "min", "mn"), ("mx", "max", "mx"), ("n_part", "sum", "n")],
    )

    n_orders = bad_min = bad_max = worst = 0
    for t in map(ray.get, per_order.to_arrow_refs()):
        if not t.num_rows:
            continue
        mn = t["mn"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        n_orders += len(n)
        bad_min += int((mn != 1).sum())
        bad_max += int((mx != n).sum())
        if len(n):
            worst = max(worst, int((mx - n).max()))
    return pa.table(
        {
            "n_orders": pa.array([n_orders], pa.int64()),
            "n_min_violations": pa.array([bad_min], pa.int64()),
            "n_max_violations": pa.array([bad_max], pa.int64()),
            "worst_overshoot": pa.array([worst], pa.int64()),
        }
    )


LINE_SEQUENCING_AUDIT_SQL = """
WITH o AS (
  SELECT l_orderkey,
         CAST(min(l_linenumber) AS BIGINT) AS mn,
         CAST(max(l_linenumber) AS BIGINT) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE mn <> 1) AS BIGINT) AS n_min_violations,
       CAST(count(*) FILTER (WHERE mx <> n) AS BIGINT) AS n_max_violations,
       CAST(max(mx - n) AS BIGINT) AS worst_overshoot
FROM o
"""


# ---------------------------------------------------------------------------
# Reorder-interval medians per market segment
# ---------------------------------------------------------------------------

def reorder_interval_quantiles(sf_dir: str):
    """Lower-median days between a customer's consecutive orders, per
    market segment — the repeat-purchase cadence a retention model
    calibrates against.  Consecutive = ordered by (orderdate,
    orderkey) within the customer.

    Scale shape: ONE custkey shuffle (sessionize pattern) with the
    segment attached from the broadcast customer dim inside the group
    kernel; the (segment, gap-day) histogram fold is calendar-
    bounded."""
    from document_extractor_ray import state

    day_us = 86_400_000_000
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

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def per_cust(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        seg = state.lookup_join(
            t.slice(0, 1), "o_custkey", d, "c_custkey", ["c_mktsegment"]
        )["c_mktsegment"][0].as_py()
        day = (
            pc.cast(t["o_orderdate"], pa.int64()).to_numpy(zero_copy_only=False)
            // day_us
        )
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, day))
        gaps = np.diff(day[order])
        u, c = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "seg": pa.array([seg] * len(u), pa.string()),
                "gap_days": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist: dict = {}
    for t in map(
        ray.get,
        ds.groupby("o_custkey").map_groups(per_cust, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for s, g, n in zip(
            t["seg"].to_pylist(), t["gap_days"].to_pylist(), t["n"].to_pylist()
        ):
            cur = hist.setdefault(s, {})
            cur[g] = cur.get(g, 0) + n

    segs = sorted(hist)
    rows = []
    for s in segs:
        n = sum(hist[s].values())
        need = (n - 1) // 2 + 1
        cum = 0
        med = 0
        for g in sorted(hist[s]):
            cum += hist[s][g]
            if cum >= need:
                med = g
                break
        rows.append((s, n, med))
    return pa.table(
        {
            "c_mktsegment": pa.array([r[0] for r in rows], pa.string()),
            "n_gaps": pa.array([r[1] for r in rows], pa.int64()),
            "median_gap_days": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


REORDER_INTERVAL_QUANTILES_SQL = """
WITH s AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000
         - lag(epoch_us(o_orderdate) // 86400000000) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS gap
  FROM orders
),
g AS (
  SELECT c.c_mktsegment, s.gap
  FROM s JOIN customer c ON c.c_custkey = s.o_custkey
  WHERE s.gap IS NOT NULL
),
r AS (
  SELECT c_mktsegment, gap,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY gap) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM g
)
SELECT c_mktsegment,
       CAST(any_value(n) AS BIGINT) AS n_gaps,
       CAST(min(gap) FILTER (WHERE rn = (n - 1) // 2 + 1) AS BIGINT)
         AS median_gap_days
FROM r GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Order-status vs line-status lifecycle consistency
# ---------------------------------------------------------------------------

def status_lifecycle_matrix(sf_dir: str):
    """Cross-table lifecycle contract: for each order status, how do
    the order's LINE statuses aggregate — all 'F', all 'O', or mixed?
    A clean lifecycle has 'F' orders fully-F and 'O' orders fully-O;
    every off-diagonal cell is a state-machine violation worth a
    contract alert.

    Scale shape: per-order (n_F, n_lines) via ``bucketed_agg``; order
    status attaches through one partitioned join of the slim status
    column (fact-fact boundary — broadcast would ship every orderkey);
    the 3×3 contingency folds on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus"])

    def li_partial(t: pa.Table) -> pa.Table:
        is_f = pc.cast(pc.equal(t["l_linestatus"], "F"), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"l_orderkey": t["l_orderkey"], "f": is_f}), ["l_orderkey"]
        ).aggregate([("f", "sum"), ([], "count_all")])
        return pa.table(
            {
                "l_orderkey": g["l_orderkey"],
                "n_f": g["f_sum"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    per_order = bucketed_agg(
        li.map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        [("n_f", "sum", "n_f"), ("n_part", "sum", "n")],
    ).materialize()

    n_parts = _join_partitions(
        f"{sf_dir}/orders.parquet", f"{sf_dir}/orders.parquet"
    )
    joined = per_order.join(
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]),
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cell_partial(t: pa.Table) -> pa.Table:
        nf = t["n_f"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        prof = np.where(nf == n, "all_F", np.where(nf == 0, "all_O", "mixed"))
        g = pa.TableGroupBy(
            pa.table(
                {"o_orderstatus": t["o_orderstatus"], "line_profile": pa.array(prof)}
            ),
            ["o_orderstatus", "line_profile"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "o_orderstatus": g["o_orderstatus"],
                "line_profile": g["line_profile"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        joined.map_batches(cell_partial, batch_format="pyarrow"),
        ["o_orderstatus", "line_profile"],
        "n",
    )

    keys = sorted(acc)
    return pa.table(
        {
            "o_orderstatus": pa.array([k[0] for k in keys], pa.string()),
            "line_profile": pa.array([k[1] for k in keys], pa.string()),
            "n_orders": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


STATUS_LIFECYCLE_MATRIX_SQL = """
WITH p AS (
  SELECT l_orderkey,
         CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_f,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderstatus,
         CASE WHEN p.n_f = p.n THEN 'all_F'
              WHEN p.n_f = 0 THEN 'all_O'
              ELSE 'mixed' END AS line_profile
  FROM p JOIN orders o ON o.o_orderkey = p.l_orderkey
)
SELECT o_orderstatus, line_profile, CAST(count(*) AS BIGINT) AS n_orders
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# First-touch event-type mix (acquisition channel distribution)
# ---------------------------------------------------------------------------

def first_touch_mix(sf_dir: str):
    """Which event type do users START with?  Per type: users whose
    first event (earliest ts, event_id tie) is of that type, share in
    milli — the first-touch attribution complement of
    attribution_last_touch.

    Scale shape: per-block per-user argmin partials (mergeable —
    the upsert_apply_audit fold), bounded type rollup."""
    ds = _read(sf_dir, "events", columns=["ts", "event_id", "user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, s, e, ty = uid[order], ts[order], eid[order], et[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        return pa.table(
            {
                "user_id": pa.array(u[first], pa.int64()),
                "ts_us": pa.array(s[first], pa.int64()),
                "event_id": pa.array(e[first], pa.int64()),
                "event_type": pa.array(ty[first], pa.string()),
            }
        )

    best: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for u, s, e, ty in zip(
            t["user_id"].to_pylist(), t["ts_us"].to_pylist(),
            t["event_id"].to_pylist(), t["event_type"].to_pylist(),
        ):
            cur = best.get(u)
            if cur is None or (s, e) < (cur[0], cur[1]):
                best[u] = (s, e, ty)

    n_users = len(best)
    mix: dict = {}
    for _, _, ty in best.values():
        mix[ty] = mix.get(ty, 0) + 1
    types = sorted(mix)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_users": pa.array([mix[t] for t in types], pa.int64()),
            "share_milli": pa.array(
                [(1000 * mix[t]) // n_users for t in types], pa.int64()
            ),
        }
    )


FIRST_TOUCH_MIX_SQL = """
WITH f AS (
  SELECT event_type FROM (
    SELECT event_type, row_number() OVER (
        PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events) WHERE rn = 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM f)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST((1000 * count(*)) // (SELECT n_users FROM n) AS BIGINT)
         AS share_milli
FROM f GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Mann-Whitney rank test of doc length per source (one-vs-rest)
# ---------------------------------------------------------------------------

def length_mannwhitney(sf_dir: str):
    """Mann-Whitney U of doc length, each source vs the rest of the
    corpus — the nonparametric "is this source systematically longer?"
    screen that complements value_ks_types' KS distance.  Integer-exact
    by construction: wins / ties are pair counts derived from the
    (source, n_chars) histogram and ``u2x = 2*wins + ties`` is exactly
    twice the tie-averaged U statistic (so no .5 ever materializes).

    Scale shape: per-block (source, n_chars) histogram partials folded
    on the driver (bounded: |sources| x |distinct lengths|); the O(V)
    cumulative-count pass replaces any O(N log N) global rank sort, so
    no row-level data ever leaves the blocks."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["source", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "v": g["n_chars"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "v"], "n"
    )
    if not cells:
        return pa.table(
            {
                "source": pa.array([], pa.string()),
                "n_src": pa.array([], pa.int64()),
                "n_rest": pa.array([], pa.int64()),
                "wins": pa.array([], pa.int64()),
                "ties": pa.array([], pa.int64()),
                "u2x": pa.array([], pa.int64()),
            }
        )
    vals = sorted({v for (_, v) in cells})
    v_idx = {v: i for i, v in enumerate(vals)}
    sources = sorted({s for (s, _) in cells})
    nt = np.zeros(len(vals), np.int64)
    per_src = {s: np.zeros(len(vals), np.int64) for s in sources}
    for (s, v), n in cells.items():
        per_src[s][v_idx[v]] += n
        nt[v_idx[v]] += n
    cum_lt_all = np.concatenate(([0], np.cumsum(nt)[:-1]))
    total = int(nt.sum())
    rows = []
    for s in sources:
        ns = per_src[s]
        cum_lt_s = np.concatenate(([0], np.cumsum(ns)[:-1]))
        wins = int((ns * (cum_lt_all - cum_lt_s)).sum())
        ties = int((ns * (nt - ns)).sum())
        n_src = int(ns.sum())
        rows.append((s, n_src, total - n_src, wins, ties, 2 * wins + ties))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_src": pa.array([r[1] for r in rows], pa.int64()),
            "n_rest": pa.array([r[2] for r in rows], pa.int64()),
            "wins": pa.array([r[3] for r in rows], pa.int64()),
            "ties": pa.array([r[4] for r in rows], pa.int64()),
            "u2x": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


LENGTH_MANNWHITNEY_SQL = """
WITH c AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
t AS (
  SELECT v, CAST(sum(n) AS BIGINT) AS nt,
         CAST(COALESCE(sum(sum(n)) OVER (
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS cum_lt
  FROM c GROUP BY v
),
s AS (
  SELECT source, v, n,
         CAST(COALESCE(sum(n) OVER (
             PARTITION BY source ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS cum_s_lt
  FROM c
)
SELECT s.source,
       CAST(sum(s.n) AS BIGINT) AS n_src,
       CAST((SELECT sum(n) FROM c) - sum(s.n) AS BIGINT) AS n_rest,
       CAST(sum(s.n * (t.cum_lt - s.cum_s_lt)) AS BIGINT) AS wins,
       CAST(sum(s.n * (t.nt - s.n)) AS BIGINT) AS ties,
       CAST(2 * sum(s.n * (t.cum_lt - s.cum_s_lt))
            + sum(s.n * (t.nt - s.n)) AS BIGINT) AS u2x
FROM s JOIN t USING (v)
GROUP BY s.source
ORDER BY s.source
"""


# ---------------------------------------------------------------------------
# SCD type-2 dimension build from the event stream (audit)
# ---------------------------------------------------------------------------

def scd2_intervals(sf_dir: str):
    """Slowly-changing-dimension (type 2) build over the event feed:
    collapse each user's consecutive runs of equal event_type into
    versioned validity intervals [valid_from, valid_to) — valid_to of
    a version is the NEXT version's valid_from, NULL for the current
    row — then audit the dimension per type: version count, open
    (current) rows, and total closed-interval dwell in microseconds.

    Scale shape: the sessionize hash-bucket plan (balanced partitions
    of whole users, one vectorized pandas pass each); only |types|
    partial rows leave each partition, folded on the driver."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def per_partition(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        new_run = np.ones(len(g), bool)
        if len(g) > 1:
            new_run[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        run_user = uid[starts]
        run_type = et[starts]
        run_from = ts[starts]
        # valid_to = next run's valid_from within the same user.
        valid_to = np.empty(len(starts), np.int64)
        closed = np.zeros(len(starts), bool)
        if len(starts) > 1:
            same_user = run_user[1:] == run_user[:-1]
            closed[:-1] = same_user
            valid_to[:-1] = np.where(same_user, run_from[1:], 0)
        df = pd.DataFrame(
            {
                "event_type": run_type,
                "n_versions": np.int64(1),
                "n_current": (~closed).astype(np.int64),
                "closed_dur_us": np.where(closed, valid_to - run_from, 0),
            }
        )
        out = df.groupby("event_type", sort=True).sum().reset_index()
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "n_versions": pa.array(out["n_versions"], pa.int64()),
                "n_current": pa.array(out["n_current"], pa.int64()),
                "closed_dur_us": pa.array(out["closed_dur_us"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas"),
        "event_type",
        ["n_versions", "n_current", "closed_dur_us"],
    )
    keys = sorted(cells)
    return pa.table(
        {
            "event_type": pa.array(keys, pa.string()),
            "n_versions": pa.array([cells[k][0] for k in keys], pa.int64()),
            "n_current": pa.array([cells[k][1] for k in keys], pa.int64()),
            "closed_dur_us": pa.array([cells[k][2] for k in keys], pa.int64()),
        }
    )


SCD2_INTERVALS_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
r AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM e
),
v AS (
  SELECT user_id, run, event_type, min(ts) AS valid_from
  FROM r GROUP BY 1, 2, 3
),
v2 AS (
  SELECT *, lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
              AS valid_to
  FROM v
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current,
       CAST(COALESCE(sum(epoch_us(valid_to - valid_from)), 0) AS BIGINT)
         AS closed_dur_us
FROM v2 GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Theil-Sen robust slope of the daily order count series
# ---------------------------------------------------------------------------

def daily_theil_sen(sf_dir: str):
    """Theil-Sen estimator of the daily-order-count trend: the median
    over all day pairs (i < j) of the pairwise slope, quantized to
    micro-units with floor division (part of the op's definition so
    both engines sort identical integers).  Robust complement to
    orders_mann_kendall's trend TEST — this one estimates the slope.
    Median rule: sum of the two middle elements (doubled when the pair
    count is odd), so the output stays integer.

    Scale shape: the day histogram is a driver-bounded fold (calendar
    cardinality); the O(D^2) pairwise slopes are vectorized numpy over
    ~days^2/2 elements — bounded by the calendar, not the data."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32())
        g = pa.TableGroupBy(pa.table({"day": d}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = np.array(sorted(hist), np.int64)
    y = np.array([hist[d] for d in days], np.int64)
    i, j = np.triu_indices(len(days), k=1)
    dy = (y[j] - y[i]) * 1_000_000
    dx = days[j] - days[i]
    slopes = np.floor_divide(dy, dx)
    slopes.sort()
    n_pairs = len(slopes)
    lo = slopes[(n_pairs - 1) // 2]
    hi = slopes[n_pairs // 2]
    return pa.table(
        {
            "n_days": pa.array([len(days)], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "slope_micro_x2": pa.array([int(lo) + int(hi)], pa.int64()),
        }
    )


DAILY_THEIL_SEN_SQL = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
p AS (
  SELECT ((b.y - a.y) * 1000000
          - (((((b.y - a.y) * 1000000) % dd) + dd) % dd)) // dd AS sm
  FROM d a JOIN d b ON b.day > a.day,
       LATERAL (SELECT CAST(date_diff('day', a.day, b.day) AS BIGINT) AS dd) l
),
o AS (
  SELECT sm, row_number() OVER (ORDER BY sm) AS rn, count(*) OVER () AS n
  FROM p
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(any_value(n) AS BIGINT) AS n_pairs,
       CAST(sum(sm) FILTER (WHERE rn = (n + 1) // 2)
            + sum(sm) FILTER (WHERE rn = (n + 2) // 2) AS BIGINT)
         AS slope_micro_x2
FROM o
"""


# ---------------------------------------------------------------------------
# Neyman optimal sample allocation across order-priority strata
# ---------------------------------------------------------------------------

NEYMAN_SAMPLE_N = 1000


def neyman_allocation_plan(sf_dir: str, sample_n: int = NEYMAN_SAMPLE_N):
    """Neyman-optimal allocation of a fixed sample budget across
    o_orderpriority strata: n_h proportional to N_h * sigma_h, i.e. to
    isqrt(SS_h) with SS_h = N_h * sum(x^2) - (sum x)^2 over cents —
    the sampling-design counterpart of stratified_design_effect (that
    one scores proportional allocation; this one emits the optimal
    plan).  Integer-exact end to end: exact integer sqrt (one-step
    corrected in SQL, math.isqrt here) and largest-remainder rounding
    (ties broken by stratum name) so the allocations sum to exactly
    ``sample_n``.

    Scale shape: bounded per-stratum moment fold (5 priorities); x^2
    block sums carry the (quotient, remainder)-by-1e6 split so int64
    never overflows inside a block partial."""
    import math

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = _to_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        x2 = c * c
        g = pa.TableGroupBy(
            pa.table(
                {
                    "stratum": t["o_orderpriority"],
                    "x": pa.array(c, pa.int64()),
                    "x2q": pa.array(x2 // 1_000_000, pa.int64()),
                    "x2r": pa.array(x2 % 1_000_000, pa.int64()),
                }
            ),
            ["stratum"],
        ).aggregate(
            [("x", "sum"), ("x2q", "sum"), ("x2r", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "stratum": g["stratum"],
                "s": g["x_sum"],
                "s2q": g["x2q_sum"],
                "s2r": g["x2r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "stratum",
        ["s", "s2q", "s2r", "n"],
    )
    strata = sorted(acc)
    wgt = {}
    for k in strata:
        s, s2q, s2r, n = acc[k]
        ss = n * (s2q * 1_000_000 + s2r) - s * s
        wgt[k] = math.isqrt(ss)
    w_tot = sum(wgt.values())
    base = {k: sample_n * wgt[k] // w_tot for k in strata}
    rem = {k: sample_n * wgt[k] - base[k] * w_tot for k in strata}
    short = sample_n - sum(base.values())
    for k in sorted(strata, key=lambda k: (-rem[k], k))[:short]:
        base[k] += 1
    return pa.table(
        {
            "stratum": pa.array(strata, pa.string()),
            "n_h": pa.array([acc[k][3] for k in strata], pa.int64()),
            "neyman_w": pa.array([wgt[k] for k in strata], pa.int64()),
            "alloc": pa.array([base[k] for k in strata], pa.int64()),
        }
    )


NEYMAN_ALLOCATION_PLAN_SQL = f"""
WITH g AS (
  SELECT o_orderpriority AS stratum,
         CAST(count(*) AS BIGINT) AS n_h,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sx,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)
             * CAST(round(o_totalprice * 100) AS BIGINT)) AS sx2
  FROM orders GROUP BY 1
),
ss AS (
  SELECT stratum, n_h,
         CAST(n_h AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx AS ssq
  FROM g
),
w0 AS (
  SELECT stratum, n_h, ssq,
         CAST(floor(sqrt(CAST(ssq AS DOUBLE))) AS HUGEINT) AS s0
  FROM ss
),
w AS (
  SELECT stratum, n_h,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= ssq THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > ssq THEN 1 ELSE 0 END) AS wgt
  FROM w0
),
tot AS (SELECT sum(wgt) AS w_tot FROM w),
a AS (
  SELECT stratum, n_h, wgt,
         ({NEYMAN_SAMPLE_N} * wgt) // w_tot AS base,
         ({NEYMAN_SAMPLE_N} * wgt) % w_tot AS rem
  FROM w, tot
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, stratum) AS rk,
         (SELECT {NEYMAN_SAMPLE_N} - sum(base) FROM a) AS short
  FROM a
)
SELECT stratum, n_h,
       CAST(wgt AS BIGINT) AS neyman_w,
       CAST(base + (CASE WHEN rk <= short THEN 1 ELSE 0 END) AS BIGINT)
         AS alloc
FROM r ORDER BY stratum
"""


# ---------------------------------------------------------------------------
# Customer order-frequency migration matrix (half-window vs half-window)
# ---------------------------------------------------------------------------

FREQ_MIGRATION_SPLIT = "1998-05-01"
_FREQ_BANDS = ((1, "F1"), (3, "F2"), (6, "F3"))


def _freq_band(n: int) -> str:
    if n == 0:
        return "none"
    for hi, name in _FREQ_BANDS:
        if n <= hi:
            return name
    return "F4"


def customer_freq_migration(sf_dir: str):
    """Customer order-frequency migration matrix: band each customer's
    order count in the first half of the window (< {split}) and in the
    second half into none/F1(1)/F2(2-3)/F3(4-6)/F4(7+), and count
    customers per (band_from, band_to) cell — the cohort-movement view
    a retention team reads (who lapsed, who accelerated).

    Scale shape: one custkey hash-bucket shuffle of slim (custkey,
    half) rows; per-partition pandas pivots whole customers, and only
    the 5x5-bounded cells leave each partition."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    n_parts = _n_blocks()
    split_us = int(
        pd.Timestamp(FREQ_MIGRATION_SPLIT).value // 1000
    )  # timestamp[us]

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["o_custkey"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        late = pc.cast(
            pc.greater_equal(
                pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(split_us, pa.int64())
            ),
            pa.int64(),
        )
        return pa.table(
            {"cust": t["o_custkey"], "late": late, "part": part}
        )

    def per_partition(g: pd.DataFrame) -> pa.Table:
        piv = g.groupby(["cust", "late"]).size().unstack(fill_value=0)
        n1 = piv[0].to_numpy() if 0 in piv.columns else np.zeros(len(piv), np.int64)
        n2 = piv[1].to_numpy() if 1 in piv.columns else np.zeros(len(piv), np.int64)
        bands = pd.DataFrame(
            {
                "band_from": [_freq_band(int(v)) for v in n1],
                "band_to": [_freq_band(int(v)) for v in n2],
            }
        )
        cnt = bands.groupby(["band_from", "band_to"], sort=True).size()
        return pa.table(
            {
                "band_from": pa.array([k[0] for k in cnt.index], pa.string()),
                "band_to": pa.array([k[1] for k in cnt.index], pa.string()),
                "n": pa.array(cnt.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_partition, batch_format="pandas"),
        ["band_from", "band_to"],
        "n",
    )
    keys = sorted(cells)
    return pa.table(
        {
            "band_from": pa.array([k[0] for k in keys], pa.string()),
            "band_to": pa.array([k[1] for k in keys], pa.string()),
            "n_customers": pa.array([cells[k] for k in keys], pa.int64()),
        }
    )


customer_freq_migration.__doc__ = customer_freq_migration.__doc__.format(
    split=FREQ_MIGRATION_SPLIT
)

_FREQ_BAND_SQL = """CASE WHEN {n} = 0 THEN 'none'
              WHEN {n} <= 1 THEN 'F1'
              WHEN {n} <= 3 THEN 'F2'
              WHEN {n} <= 6 THEN 'F3'
              ELSE 'F4' END"""

CUSTOMER_FREQ_MIGRATION_SQL = f"""
WITH c AS (
  SELECT o_custkey AS cust,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '{FREQ_MIGRATION_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '{FREQ_MIGRATION_SPLIT}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM orders GROUP BY 1
)
SELECT {_FREQ_BAND_SQL.format(n='n1')} AS band_from,
       {_FREQ_BAND_SQL.format(n='n2')} AS band_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Per-user sequence surprisal under the global transition LM
# ---------------------------------------------------------------------------

def markov_sequence_surprisal(sf_dir: str):
    """Per-user surprisal of the observed event sequence under the
    corpus-wide first-order Markov model: each transition contributes
    ln(c1/c12) in the proven ln-micro convention (floor(x*1e6+0.5) ==
    DuckDB round(ln*1e6), libm-identical), summed per user — the
    sequence-model anomaly score (bots replay high-probability loops
    and score LOW; erratic users score HIGH) that complements
    event_markov_stationary's global chain.

    Scale shape: pass 1 folds the |types|^2-bounded transition counts;
    pass 2 is the sessionize hash-bucket plan emitting per-user
    partial rows, each cell mapped through the broadcast 25-entry
    surprisal table inside the partition."""
    import math

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    n_parts = _n_blocks()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(
            pc.multiply(
                pc.cast(t["user_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
            ),
            pa.scalar(0x7FFFFFFF, pa.int64()),
        )
        part = pc.cast(
            pc.subtract(h, pc.multiply(pc.divide(h, n_parts), n_parts)), pa.int32()
        )
        return t.append_column("part", part)

    def trans_partial(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        cnt = (
            pd.DataFrame({"prev": et[:-1][same], "nxt": et[1:][same]})
            .groupby(["prev", "nxt"], sort=True)
            .size()
        )
        return pa.table(
            {
                "prev": pa.array([k[0] for k in cnt.index], pa.string()),
                "nxt": pa.array([k[1] for k in cnt.index], pa.string()),
                "n": pa.array(cnt.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    c12 = fold_partials(
        bucketed.groupby("part").map_groups(trans_partial, batch_format="pandas"),
        ["prev", "nxt"],
        "n",
    )
    c1: dict = {}
    for (p, _), n in c12.items():
        c1[p] = c1.get(p, 0) + n
    surp = {
        k: int(math.floor(math.log(c1[k[0]] / n) * 1_000_000 + 0.5))
        for k, n in c12.items()
    }

    def per_user(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame(
            {
                "user_id": uid[:-1][same],
                "sm": [
                    surp[(p, nx)]
                    for p, nx in zip(et[:-1][same], et[1:][same])
                ],
            }
        )
        out = df.groupby("user_id", sort=True).agg(
            n_transitions=("sm", "size"), surprisal_micro=("sm", "sum")
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
                "n_transitions": pa.array(
                    out["n_transitions"].to_numpy().astype(np.int64), pa.int64()
                ),
                "surprisal_micro": pa.array(
                    out["surprisal_micro"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        bucketed.groupby("part")
        .map_groups(per_user, batch_format="pandas")
        .sort("user_id")
    )


MARKOV_SEQUENCE_SURPRISAL_SQL = """
WITH s AS (
  SELECT user_id, lag(event_type) OVER w AS prev, event_type AS nxt
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c12
  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
),
c AS (SELECT prev, CAST(sum(c12) AS BIGINT) AS c1 FROM t GROUP BY prev),
surp AS (
  SELECT t.prev, t.nxt,
         CAST(round(ln(CAST(c.c1 AS DOUBLE) / t.c12) * 1000000) AS BIGINT)
           AS sm
  FROM t JOIN c USING (prev)
)
SELECT s.user_id,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(sum(surp.sm) AS BIGINT) AS surprisal_micro
FROM s JOIN surp ON s.prev = surp.prev AND s.nxt = surp.nxt
GROUP BY s.user_id ORDER BY s.user_id
"""


# ---------------------------------------------------------------------------
# Sampled join-size estimator audit (key sampling vs exact)
# ---------------------------------------------------------------------------

JOIN_SAMPLE_MOD = 16


def sample_join_estimator_audit(sf_dir: str, mod: int = JOIN_SAMPLE_MOD):
    """Key-sampled join-cardinality estimator vs ground truth: sample
    the JOIN-KEY domain (orderkey % mod == 0 — both sides keep the
    same keys, the trick that makes join sampling work at all), count
    the join rows inside the sample, scale by mod, and report the
    integer-permille error against join_size_exact's truth — the audit
    that says whether a planner can trust key-sampled statistics on
    this key distribution.

    Scale shape: identical to join_size_exact (two tagged key-count
    streams, one co-partitioned bucketed merge); the sampled sums ride
    the same per-block fold, so the audit costs ONE extra column, not
    a second pass."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    o = _read(sf_dir, "orders", columns=["o_orderkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def tag_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["o_orderkey"],
                "n_o": pa.array(np.ones(t.num_rows, np.int64)),
                "n_l": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["l_orderkey"],
                "n_o": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_l": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )

    both = o.map_batches(tag_o, batch_format="pyarrow").union(
        li.map_batches(tag_l, batch_format="pyarrow")
    )
    merged = bucketed_agg(
        both, ["k"], [("n_o", "sum", "n_o"), ("n_l", "sum", "n_l")]
    )

    def fold(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False)
        no = t["n_o"].to_numpy(zero_copy_only=False)
        nl = t["n_l"].to_numpy(zero_copy_only=False)
        rows = no * nl
        samp = k % mod == 0
        return pa.table(
            {
                "kk": pa.array([1], pa.int64()),
                "join_rows": pa.array([int(rows.sum())], pa.int64()),
                "sampled_keys": pa.array(
                    [int((samp & (rows > 0)).sum())], pa.int64()
                ),
                "sampled_join_rows": pa.array([int(rows[samp].sum())], pa.int64()),
            }
        )

    tot = fold_partials(
        merged.map_batches(fold, batch_format="pyarrow"),
        "kk",
        ["join_rows", "sampled_keys", "sampled_join_rows"],
    )[1]
    exact, skeys, srows = (int(v) for v in tot)
    est = mod * srows
    err = 1000 * abs(est - exact) // exact if exact else 0
    return pa.table(
        {
            "join_rows": pa.array([exact], pa.int64()),
            "sampled_keys": pa.array([skeys], pa.int64()),
            "sampled_join_rows": pa.array([srows], pa.int64()),
            "est_join_rows": pa.array([est], pa.int64()),
            "err_permille": pa.array([err], pa.int64()),
        }
    )


SAMPLE_JOIN_ESTIMATOR_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS n_o
  FROM orders GROUP BY 1
),
l AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_l
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.k, o.n_o * l.n_l AS rows_k
  FROM o JOIN l ON l.k = o.k
),
s AS (
  SELECT CAST(sum(rows_k) AS BIGINT) AS join_rows,
         CAST(sum(CASE WHEN k % {JOIN_SAMPLE_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS sampled_keys,
         CAST(sum(CASE WHEN k % {JOIN_SAMPLE_MOD} = 0 THEN rows_k ELSE 0 END)
              AS BIGINT) AS sampled_join_rows
  FROM j
)
SELECT join_rows, sampled_keys, sampled_join_rows,
       CAST({JOIN_SAMPLE_MOD} * sampled_join_rows AS BIGINT) AS est_join_rows,
       CAST(CASE WHEN join_rows > 0
                 THEN 1000 * abs({JOIN_SAMPLE_MOD} * sampled_join_rows
                                 - join_rows) // join_rows
                 ELSE 0 END AS BIGINT) AS err_permille
FROM s
"""


# ---------------------------------------------------------------------------
# Bullwhip-effect audit (weekly demand vs shipment variance ratio)
# ---------------------------------------------------------------------------

def orders_bullwhip_audit(sf_dir: str):
    """Bullwhip audit: squared coefficient of variation of WEEKLY
    shipment counts over weekly order counts — the supply-chain
    variance-amplification diagnostic (ratio > 1: the fulfillment
    stage amplifies demand noise).  Weeks are ISO-Monday indices
    ((epoch_days + 3) // 7, identical arithmetic both engines);
    CV^2 = (n*Sxx - Sx^2) / Sx^2 per series and the ratio is one
    integer rational in micro.

    Scale shape: two calendar-bounded week-histogram folds — the
    cheapest possible shape (no join: the two series are compared as
    aggregates, not row-matched)."""
    orders = _read(sf_dir, "orders", columns=["o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_shipdate"])

    def week_hist(col: str):
        def f(t: pa.Table) -> pa.Table:
            d = pc.cast(pc.cast(t[col], pa.date32()), pa.int32())
            wk = pc.divide(pc.add(d, 3), 7)  # arrow int division truncates; +3 >= 0 always here
            g = pa.TableGroupBy(pa.table({"week": wk}), ["week"]).aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {"week": g["week"], "n": pc.cast(g["count_all"], pa.int64())}
            )

        return f

    ho = fold_partials(
        orders.map_batches(week_hist("o_orderdate"), batch_format="pyarrow"),
        "week",
        "n",
    )
    hs = fold_partials(
        li.map_batches(week_hist("l_shipdate"), batch_format="pyarrow"),
        "week",
        "n",
    )

    def stats(h: dict):
        n = len(h)
        sx = sum(h.values())
        sxx = sum(v * v for v in h.values())
        return n, sx, n * sxx - sx * sx

    no, so, sso = stats(ho)
    ns, ss, sss = stats(hs)
    ratio = (1_000_000 * sss * so * so) // (sso * ss * ss) if sso else 0
    return pa.table(
        {
            "n_weeks_orders": pa.array([no], pa.int64()),
            "n_weeks_ship": pa.array([ns], pa.int64()),
            "cv2_num_orders": pa.array([sso], pa.int64()),
            "cv2_num_ship": pa.array([sss], pa.int64()),
            "bullwhip_micro": pa.array([ratio], pa.int64()),
        }
    )


ORDERS_BULLWHIP_SQL = """
WITH wo AS (
  SELECT (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 3) // 7
           AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
ws AS (
  SELECT (date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 3) // 7
           AS week,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
),
so AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(n) AS HUGEINT) AS sx,
         CAST(sum(n * n) AS HUGEINT) AS sxx
  FROM wo
),
ss AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(n) AS HUGEINT) AS sx,
         CAST(sum(n * n) AS HUGEINT) AS sxx
  FROM ws
)
SELECT CAST(so.n AS BIGINT) AS n_weeks_orders,
       CAST(ss.n AS BIGINT) AS n_weeks_ship,
       CAST(so.n * so.sxx - so.sx * so.sx AS BIGINT) AS cv2_num_orders,
       CAST(ss.n * ss.sxx - ss.sx * ss.sx AS BIGINT) AS cv2_num_ship,
       CAST(CASE WHEN so.n * so.sxx - so.sx * so.sx = 0 THEN 0
                 ELSE (1000000::HUGEINT * (ss.n * ss.sxx - ss.sx * ss.sx)
                       * so.sx * so.sx)
                      // ((so.n * so.sxx - so.sx * so.sx) * ss.sx * ss.sx)
            END AS BIGINT) AS bullwhip_micro
FROM so, ss
"""


# ---------------------------------------------------------------------------
# Hot-key salting plan (partition-size bound per key)
# ---------------------------------------------------------------------------

SALT_ROW_BOUND = 64


def salt_plan_audit(sf_dir: str, bound: int = SALT_ROW_BOUND):
    """Skew-salting plan for the event stream keyed on user_id: every
    user whose row count exceeds the per-partition bound gets
    ceil(n/bound) salt suffixes — the concrete remediation a shuffle
    planner applies after key_skew_audit flags the distribution.
    Emits one row per user needing >= 2 salts.

    Scale shape: one key-per-row bucketed count; the >= 2-salt filter
    runs inside blocks, so only the (small) hot-key plan reaches the
    driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id"])

    def one(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    counts = bucketed_agg(
        ds.map_batches(one, batch_format="pyarrow"),
        ["user_id"],
        [("n", "sum", "n_events")],
    )

    def plan(t: pa.Table) -> pa.Table:
        n = t["n_events"].to_numpy(zero_copy_only=False)
        salts = (n + bound - 1) // bound
        m = salts >= 2
        return pa.table(
            {
                "user_id": pa.array(
                    t["user_id"].to_numpy(zero_copy_only=False)[m], pa.int64()
                ),
                "n_events": pa.array(n[m], pa.int64()),
                "n_salts": pa.array(salts[m], pa.int64()),
            }
        )

    return counts.map_batches(plan, batch_format="pyarrow").sort("user_id")


SALT_PLAN_SQL = f"""
WITH c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT user_id, n_events,
       CAST((n_events + {SALT_ROW_BOUND} - 1) // {SALT_ROW_BOUND} AS BIGINT)
         AS n_salts
FROM c
WHERE (n_events + {SALT_ROW_BOUND} - 1) // {SALT_ROW_BOUND} >= 2
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Kaplan-Meier survival of order->first-shipment latency (censored)
# ---------------------------------------------------------------------------

KM_CUTOFF = "2001-06-30"
_KM_SENTINEL = (1 << 62)


def ship_survival_km(sf_dir: str, cutoff: str = KM_CUTOFF):
    """Kaplan-Meier product-limit curve of order -> FIRST-shipment
    latency with right censoring at the observation cutoff: orders
    placed by the cutoff whose first line ships after it are censored
    at (cutoff - orderdate) — the estimator that reads open orders
    correctly where a naive latency histogram silently drops them
    (churn_hazard_curve's calendar sibling, different estimand and
    censoring).  The survival product is the exact integer recursion
    S_i = S_{i-1} * (n_i - d_i) // n_i in micro (floor at every step,
    replayed identically by the SQL recursion).

    Scale shape: NO hash join — orders and lineitem rows union into
    ONE co-partitioned bucketed min-aggregate (the join_size_exact
    trick), each resolved key collapses to a day-bounded (t, event)
    histogram inside its block, and the driver recursion walks ~|days|
    steps."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    cutoff_days = int(pd.Timestamp(cutoff).value // (86400 * 10**9))

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def tag_o(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32()),
            pa.int64(),
        )
        return pa.table(
            {
                "k": t["o_orderkey"],
                "od": d,
                "sd": pa.array(
                    np.full(t.num_rows, _KM_SENTINEL, np.int64), pa.int64()
                ),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32()),
            pa.int64(),
        )
        return pa.table(
            {
                "k": t["l_orderkey"],
                "od": pa.array(
                    np.full(t.num_rows, _KM_SENTINEL, np.int64), pa.int64()
                ),
                "sd": d,
            }
        )

    merged = bucketed_agg(
        o.map_batches(tag_o, batch_format="pyarrow").union(
            li.map_batches(tag_l, batch_format="pyarrow")
        ),
        ["k"],
        [("od", "min", "od"), ("sd", "min", "sd")],
    )

    def hist(t: pa.Table) -> pa.Table:
        od = t["od"].to_numpy(zero_copy_only=False)
        sd = t["sd"].to_numpy(zero_copy_only=False)
        keep = (od < _KM_SENTINEL) & (od <= cutoff_days)
        od, sd = od[keep], sd[keep]
        ev = sd <= cutoff_days
        tt = np.where(ev, sd - od, cutoff_days - od)
        g = pa.TableGroupBy(
            pa.table(
                {"t": pa.array(tt, pa.int64()), "ev": pa.array(ev, pa.bool_())}
            ),
            ["t", "ev"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "t": g["t"],
                "ev": g["ev"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        merged.map_batches(hist, batch_format="pyarrow"), ["t", "ev"], "n"
    )
    # at-risk counts from the (t, ev) histogram, then the KM recursion
    event_t = sorted({t for (t, ev) in cells if ev})
    total = sum(cells.values())
    # obs with t_obs >= t, walked in ascending t order
    all_t = sorted({t for (t, _) in cells})
    below = 0
    risk_at: dict[int, int] = {}
    idx = 0
    for t in event_t:
        while idx < len(all_t) and all_t[idx] < t:
            below += cells.get((all_t[idx], True), 0) + cells.get(
                (all_t[idx], False), 0
            )
            idx += 1
        risk_at[t] = total - below
    s = 1_000_000
    rows = []
    for t in event_t:
        d = cells.get((t, True), 0)
        n_r = risk_at[t]
        s = s * (n_r - d) // n_r
        rows.append((t, n_r, d, s))
    return pa.table(
        {
            "t_days": pa.array([r[0] for r in rows], pa.int64()),
            "n_risk": pa.array([r[1] for r in rows], pa.int64()),
            "n_events": pa.array([r[2] for r in rows], pa.int64()),
            "s_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SHIP_SURVIVAL_KM_SQL = f"""
WITH RECURSIVE fs AS MATERIALIZED (
  SELECT l_orderkey AS k, min(CAST(l_shipdate AS DATE)) AS sd
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS od
  FROM orders WHERE CAST(o_orderdate AS DATE) <= DATE '{KM_CUTOFF}'
),
obs AS MATERIALIZED (
  SELECT CASE WHEN fs.sd IS NOT NULL AND fs.sd <= DATE '{KM_CUTOFF}'
              THEN date_diff('day', o.od, fs.sd)
              ELSE date_diff('day', o.od, DATE '{KM_CUTOFF}') END AS t,
         (fs.sd IS NOT NULL AND fs.sd <= DATE '{KM_CUTOFF}') AS ev
  FROM o LEFT JOIN fs USING (k)
),
et AS MATERIALIZED (
  SELECT t, CAST(count(*) AS BIGINT) AS d
  FROM obs WHERE ev GROUP BY t
),
rk AS MATERIALIZED (
  SELECT et.t, et.d,
         (SELECT CAST(count(*) AS BIGINT) FROM obs WHERE obs.t >= et.t)
           AS n_risk,
         row_number() OVER (ORDER BY et.t) AS i
  FROM et
),
km(i, t, n_risk, d, s) AS (
  SELECT i, t, n_risk, d, 1000000 * (n_risk - d) // n_risk
  FROM rk WHERE i = 1
  UNION ALL
  SELECT rk.i, rk.t, rk.n_risk, rk.d,
         km.s * (rk.n_risk - rk.d) // rk.n_risk
  FROM km JOIN rk ON rk.i = km.i + 1
)
SELECT t AS t_days, n_risk, d AS n_events, CAST(s AS BIGINT) AS s_micro
FROM km ORDER BY t
"""


# ---------------------------------------------------------------------------
# Wilson lower-bound return-rate ranking per part brand
# ---------------------------------------------------------------------------

def brand_return_wilson(sf_dir: str):
    """Return-rate ranking per part brand by the Wilson score LOWER
    bound (z = 2, floor-isqrt convention): the confidence-adjusted
    rate that stops a 3-line brand with one return outranking a
    10k-line brand at 8% — the correct "worst offenders" sort.
    wilson_lb_micro = 1e6*(n*(r+2) - 2*isqrt((r*(n-r)+n)*n))
    // (n*(n+4)), integer-exact with the one-step-corrected isqrt.

    Scale shape: the part dim broadcasts once (ray.put +
    worker-cached lookup); per-block brand partials are
    |brands|-bounded and fold on the driver."""
    import math

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
        ret = pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"brand": t["p_brand"], "r": ret}), ["brand"]
        ).aggregate([("r", "sum"), ([], "count_all")])
        return pa.table(
            {
                "brand": g["brand"],
                "r": g["r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_returnflag"])
    acc = fold_partials(
        li.map_batches(partial, batch_format="pyarrow"), "brand", ["r", "n"]
    )
    rows = []
    for brand in acc:
        r, n = (int(v) for v in acc[brand])
        lb = (1_000_000 * (n * (r + 2) - 2 * math.isqrt((r * (n - r) + n) * n))) // (
            n * (n + 4)
        )
        rows.append((brand, n, r, lb))
    rows.sort(key=lambda x: (-x[3], x[0]))
    return pa.table(
        {
            "brand": pa.array([x[0] for x in rows], pa.string()),
            "n_lines": pa.array([x[1] for x in rows], pa.int64()),
            "n_returned": pa.array([x[2] for x in rows], pa.int64()),
            "wilson_lb_micro": pa.array([x[3] for x in rows], pa.int64()),
        }
    )


BRAND_RETURN_WILSON_SQL = """
WITH g AS (
  SELECT p.p_brand AS brand,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
),
q AS (
  SELECT brand, r, n,
         CAST((r * (n - r) + n) AS HUGEINT) * n AS arg,
         CAST(floor(sqrt(CAST(CAST((r * (n - r) + n) AS HUGEINT) * n
                              AS DOUBLE))) AS HUGEINT) AS s0
  FROM g
),
w AS (
  SELECT brand, r, n,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= arg THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > arg THEN 1 ELSE 0 END) AS rt
  FROM q
)
SELECT brand, n AS n_lines, r AS n_returned,
       CAST((1000000::HUGEINT * (n::HUGEINT * (r + 2) - 2 * rt))
            // (n::HUGEINT * (n + 4)) AS BIGINT) AS wilson_lb_micro
FROM w
ORDER BY wilson_lb_micro DESC, brand
"""


# ---------------------------------------------------------------------------
# Dictionary-encoding benefit audit over categorical string columns
# ---------------------------------------------------------------------------

_DICT_ENC_COLS = (
    ("documents", "lang"),
    ("documents", "source"),
    ("events", "event_type"),
    ("orders", "o_orderpriority"),
)


def dict_encoding_audit(sf_dir: str):
    """Dictionary-encoding benefit estimate for the categorical string
    columns: raw char mass vs (dictionary chars + n * index bytes)
    with index width ceil(bit_length(d-1)/8) — the decision table for
    forcing dict encoding on a rewrite (complements
    encoding_size_audit's numeric delta widths with the string side).

    Scale shape: one (column, value) histogram fold per column —
    legitimate ONLY for bounded-cardinality categoricals like these
    (an unbounded string column must route through bucketed_agg
    instead; that is the audit's own precondition)."""
    rows = []
    for table, col in _DICT_ENC_COLS:
        ds = _read(sf_dir, table, columns=[col])

        def hist(t: pa.Table, _c=col) -> pa.Table:
            g = pa.TableGroupBy(t, [_c]).aggregate([([], "count_all")])
            return pa.table(
                {"v": g[_c], "n": pc.cast(g["count_all"], pa.int64())}
            )

        h = fold_partials(ds.map_batches(hist, batch_format="pyarrow"), "v", "n")
        n = sum(h.values())
        d = len(h)
        raw = sum(cnt * len(v) for v, cnt in h.items())
        dict_chars = sum(len(v) for v in h)
        bits = max(1, (d - 1).bit_length())
        idx_bytes = (bits + 7) // 8
        est = dict_chars + n * idx_bytes
        rows.append(
            (
                f"{table}.{col}",
                n,
                d,
                raw,
                est,
                1000 * (raw - est) // raw if raw else 0,
            )
        )
    rows.sort()
    return pa.table(
        {
            "column_name": pa.array([r[0] for r in rows], pa.string()),
            "n_values": pa.array([r[1] for r in rows], pa.int64()),
            "n_distinct": pa.array([r[2] for r in rows], pa.int64()),
            "raw_chars": pa.array([r[3] for r in rows], pa.int64()),
            "dict_est_chars": pa.array([r[4] for r in rows], pa.int64()),
            "savings_permille": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


def _dict_enc_one_sql(table: str, col: str) -> str:
    return f"""
  SELECT '{table}.{col}' AS column_name,
         CAST(sum(n) AS BIGINT) AS n_values,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(n * length(v)) AS BIGINT) AS raw_chars,
         CAST(sum(length(v))
              + sum(n) * ((CASE WHEN count(*) <= 1 THEN 1
                                ELSE length(bin(count(*) - 1)) END + 7) // 8)
              AS BIGINT) AS dict_est_chars,
         CAST(1000 * (sum(n * length(v))
                      - (sum(length(v))
                         + sum(n) * ((CASE WHEN count(*) <= 1 THEN 1
                                           ELSE length(bin(count(*) - 1)) END
                                      + 7) // 8)))
              // sum(n * length(v)) AS BIGINT) AS savings_permille
  FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) AS n
        FROM {table} GROUP BY 1)"""


DICT_ENCODING_AUDIT_SQL = (
    "\nUNION ALL\n".join(
        _dict_enc_one_sql(t, c) for t, c in sorted(_DICT_ENC_COLS)
    )
    + "\nORDER BY column_name"
)


# ---------------------------------------------------------------------------
# Shipping priority-inversion audit (SLA fairness)
# ---------------------------------------------------------------------------

def priority_inversion_audit(sf_dir: str):
    """Priority-inversion rate of fulfillment: among same-day order
    pairs with STRICTLY different priorities, how often did the more
    urgent order ship LATER (first-line ship lag in days)?  The SLA
    fairness audit behind q4's per-priority counts — a high inversion
    permille says priority is ignored on the floor.

    Scale shape: the ship_survival_km union min-aggregate supplies
    per-order (day, priority, lag) with no hash join; a second
    hash-bucket shuffle on day groups whole days, each day's pair
    census runs vectorized from its per-priority lag arrays
    (searchsorted, not pair enumeration), and one constant-key fold
    sums the three counters."""
    from document_extractor_ray.functions.bucketing import bucketed_agg, fold_partials

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def tag_o(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32()), pa.int64()
        )
        prio = pc.cast(pc.utf8_slice_codeunits(t["o_orderpriority"], 0, 1), pa.int64())
        return pa.table(
            {
                "k": t["o_orderkey"],
                "od": d,
                "prio": prio,
                "sd": pa.array(np.full(t.num_rows, _KM_SENTINEL, np.int64), pa.int64()),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32()), pa.int64()
        )
        sent = pa.array(np.full(t.num_rows, _KM_SENTINEL, np.int64), pa.int64())
        return pa.table({"k": t["l_orderkey"], "od": sent, "prio": sent, "sd": d})

    merged = bucketed_agg(
        o.map_batches(tag_o, batch_format="pyarrow").union(
            li.map_batches(tag_l, batch_format="pyarrow")
        ),
        ["k"],
        [("od", "min", "od"), ("prio", "min", "prio"), ("sd", "min", "sd")],
    )
    n_parts = _n_blocks()

    def day_rows(t: pa.Table) -> pa.Table:
        od = t["od"].to_numpy(zero_copy_only=False)
        sd = t["sd"].to_numpy(zero_copy_only=False)
        prio = t["prio"].to_numpy(zero_copy_only=False)
        keep = (od < _KM_SENTINEL) & (sd < _KM_SENTINEL)
        od, sd, prio = od[keep], sd[keep], prio[keep]
        h = (od.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return pa.table(
            {
                "day": pa.array(od, pa.int64()),
                "prio": pa.array(prio, pa.int64()),
                "lag": pa.array(sd - od, pa.int64()),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int32)),
            }
        )

    def census(g: pd.DataFrame) -> pa.Table:
        comparable = inversions = ties = 0
        days = set()
        for day, gd in g.groupby("day", sort=False):
            days.add(int(day))
            lags = {
                int(p): np.sort(sub["lag"].to_numpy())
                for p, sub in gd.groupby("prio", sort=True)
            }
            ps = sorted(lags)
            for i, a in enumerate(ps):
                la = lags[a]
                for b in ps[i + 1 :]:
                    lb = lags[b]
                    comparable += len(la) * len(lb)
                    # inversions: urgent (a) shipped later than lax (b)
                    lo = np.searchsorted(lb, la, side="left")
                    hi = np.searchsorted(lb, la, side="right")
                    inversions += int(lo.sum())
                    ties += int((hi - lo).sum())
        return pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "n_days": pa.array([len(days)], pa.int64()),
                "n_comparable": pa.array([comparable], pa.int64()),
                "n_inversions": pa.array([inversions], pa.int64()),
                "n_ties": pa.array([ties], pa.int64()),
            }
        )

    tot = fold_partials(
        merged.map_batches(day_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(census, batch_format="pandas"),
        "k",
        ["n_days", "n_comparable", "n_inversions", "n_ties"],
    )[1]
    n_days, comp, inv, ties = (int(v) for v in tot)
    return pa.table(
        {
            "n_days": pa.array([n_days], pa.int64()),
            "n_comparable": pa.array([comp], pa.int64()),
            "n_inversions": pa.array([inv], pa.int64()),
            "n_ties": pa.array([ties], pa.int64()),
            "inversion_permille": pa.array(
                [1000 * inv // comp if comp else 0], pa.int64()
            ),
        }
    )


PRIORITY_INVERSION_SQL = """
WITH fs AS MATERIALIZED (
  SELECT l_orderkey AS k, min(CAST(l_shipdate AS DATE)) AS sd
  FROM lineitem GROUP BY 1
),
j AS MATERIALIZED (
  SELECT CAST(o.o_orderdate AS DATE) AS day,
         CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS prio,
         date_diff('day', CAST(o.o_orderdate AS DATE), fs.sd) AS lag
  FROM orders o JOIN fs ON fs.k = o.o_orderkey
),
p AS (
  SELECT CAST(count(*) AS BIGINT) AS comp,
         CAST(sum(CASE WHEN a.lag > b.lag THEN 1 ELSE 0 END) AS BIGINT)
           AS inv,
         CAST(sum(CASE WHEN a.lag = b.lag THEN 1 ELSE 0 END) AS BIGINT)
           AS ties
  FROM j a JOIN j b ON a.day = b.day AND a.prio < b.prio
)
SELECT CAST((SELECT count(DISTINCT day) FROM j) AS BIGINT) AS n_days,
       comp AS n_comparable, inv AS n_inversions, ties AS n_ties,
       CAST(CASE WHEN comp > 0 THEN 1000 * inv // comp ELSE 0 END AS BIGINT)
         AS inversion_permille
FROM p
"""


# ---------------------------------------------------------------------------
# Month-end open-order backlog aging report
# ---------------------------------------------------------------------------

BACKLOG_FIRST_MONTH = "1995-01-01"
BACKLOG_LAST_MONTH = "2001-11-01"
_BACKLOG_BUCKETS = ((30, "0-30"), (90, "31-90"), (365, "91-365"))


def backlog_aging_snapshot(sf_dir: str):
    """Month-end open-order aging report: at each month end, orders
    placed but not yet fully shipped (close = LAST line shipment;
    never-shipped orders stay open), bucketed by age in days
    (0-30 / 31-90 / 91-365 / 365+) — the AR-style aging table that
    shipping_open_orders' daily in-flight count can't give (it has no
    order age and no orderdate).

    Scale shape: the union min/max co-partitioned aggregate (no hash
    join) produces slim per-order (orderdate, close); each block then
    scans the fixed ~83 month-end calendar vectorized and emits
    (month, bucket)-bounded partials for the driver fold."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    # date_range(freq="ME") keeps only month-ends INSIDE the range, so
    # extend the right edge past the last month's end day.
    month_ends = (
        pd.date_range(
            BACKLOG_FIRST_MONTH,
            pd.Timestamp(BACKLOG_LAST_MONTH) + pd.offsets.MonthEnd(1),
            freq="ME",
        )
        .to_numpy()
        .astype("datetime64[D]")
        .astype(np.int64)
    )
    lims = np.array([hi for hi, _ in _BACKLOG_BUCKETS], np.int64)
    names = [nm for _, nm in _BACKLOG_BUCKETS] + ["365+"]

    def tag_o(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32()), pa.int64()
        )
        return pa.table(
            {
                "k": t["o_orderkey"],
                "od": d,
                "cd": pa.array(np.full(t.num_rows, -_KM_SENTINEL, np.int64)),
            }
        )

    def tag_l(t: pa.Table) -> pa.Table:
        d = pc.cast(
            pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32()), pa.int64()
        )
        return pa.table(
            {
                "k": t["l_orderkey"],
                "od": pa.array(np.full(t.num_rows, _KM_SENTINEL, np.int64)),
                "cd": d,
            }
        )

    merged = bucketed_agg(
        o.map_batches(tag_o, batch_format="pyarrow").union(
            li.map_batches(tag_l, batch_format="pyarrow")
        ),
        ["k"],
        [("od", "min", "od"), ("cd", "max", "cd")],
    )

    def snap(t: pa.Table) -> pa.Table:
        od = t["od"].to_numpy(zero_copy_only=False)
        cd = t["cd"].to_numpy(zero_copy_only=False)
        keep = od < _KM_SENTINEL  # real orders only
        od, cd = od[keep], cd[keep]
        never = cd == -_KM_SENTINEL  # no lines: never closes
        me_out, bk_out, n_out = [], [], []
        for m in month_ends:
            open_m = (od <= m) & (never | (cd > m))
            if not open_m.any():
                continue
            age = m - od[open_m]
            b = np.searchsorted(lims, age, side="left")
            for bi, cnt in zip(*np.unique(b, return_counts=True)):
                me_out.append(int(m))
                bk_out.append(names[int(bi)])
                n_out.append(int(cnt))
        return pa.table(
            {
                "me": pa.array(me_out, pa.int64()),
                "bucket": pa.array(bk_out, pa.string()),
                "n": pa.array(n_out, pa.int64()),
            }
        )

    cells = fold_partials(
        merged.map_batches(snap, batch_format="pyarrow"), ["me", "bucket"], "n"
    )
    keys = sorted(cells)
    ep = np.array([k[0] for k in keys], "datetime64[D]")
    return pa.table(
        {
            "month_end": pa.array(ep.astype("datetime64[us]"), pa.timestamp("us")),
            "bucket": pa.array([k[1] for k in keys], pa.string()),
            "n_open": pa.array([cells[k] for k in keys], pa.int64()),
        }
    )


BACKLOG_AGING_SQL = f"""
WITH w AS (
  SELECT l_orderkey AS k, max(CAST(l_shipdate AS DATE)) AS cd
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(o.o_orderdate AS DATE) AS od, w.cd
  FROM orders o LEFT JOIN w ON w.k = o.o_orderkey
),
m AS (
  SELECT CAST(last_day(CAST(d AS DATE)) AS DATE) AS me
  FROM (SELECT unnest(generate_series(DATE '{BACKLOG_FIRST_MONTH}',
                                      DATE '{BACKLOG_LAST_MONTH}',
                                      INTERVAL 1 MONTH)) AS d)
),
x AS (
  SELECT m.me,
         CASE WHEN date_diff('day', j.od, m.me) <= 30 THEN '0-30'
              WHEN date_diff('day', j.od, m.me) <= 90 THEN '31-90'
              WHEN date_diff('day', j.od, m.me) <= 365 THEN '91-365'
              ELSE '365+' END AS bucket
  FROM j JOIN m ON j.od <= m.me AND (j.cd IS NULL OR j.cd > m.me)
)
SELECT CAST(me AS TIMESTAMP) AS month_end, bucket,
       CAST(count(*) AS BIGINT) AS n_open
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Robust scale (pairwise-gap median) of the daily order count series
# ---------------------------------------------------------------------------

def daily_qn_scale(sf_dir: str):
    """Robust scale of the daily-order-count series: the median of all
    pairwise |y_i - y_j| (the Qn-family estimator at the median
    quantile) — daily_theil_sen's partner (that one estimates trend
    slope, this one robust volatility; outlier days move neither).
    Same doubled-middle integer-median rule.

    Scale shape: identical to daily_theil_sen — a calendar-bounded
    day-histogram fold, then numpy pairwise |gaps| bounded by days^2,
    never the data."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(t["o_orderdate"], pa.date32()), pa.int32())
        g = pa.TableGroupBy(pa.table({"day": d}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    y = np.array([hist[d] for d in sorted(hist)], np.int64)
    i, j = np.triu_indices(len(y), k=1)
    gaps = np.abs(y[j] - y[i])
    gaps.sort()
    n_pairs = len(gaps)
    lo = gaps[(n_pairs - 1) // 2]
    hi = gaps[n_pairs // 2]
    return pa.table(
        {
            "n_days": pa.array([len(y)], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "qn_gap_x2": pa.array([int(lo) + int(hi)], pa.int64()),
        }
    )


DAILY_QN_SCALE_SQL = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
p AS (
  SELECT abs(b.y - a.y) AS g
  FROM d a JOIN d b ON b.day > a.day
),
o AS (
  SELECT g, row_number() OVER (ORDER BY g) AS rn, count(*) OVER () AS n
  FROM p
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(any_value(n) AS BIGINT) AS n_pairs,
       CAST(sum(g) FILTER (WHERE rn = (n + 1) // 2)
            + sum(g) FILTER (WHERE rn = (n + 2) // 2) AS BIGINT) AS qn_gap_x2
FROM o
"""


# ---------------------------------------------------------------------------
# Process-capability index (Cpk) of ship lag per order priority
# ---------------------------------------------------------------------------

CPK_LSL_DAYS = 0
CPK_USL_DAYS = 100


def shiplag_cpk_by_priority(
    sf_dir: str, lsl: int = CPK_LSL_DAYS, usl: int = CPK_USL_DAYS
):
    """Process-capability Cpk of line-level ship lag (l_shipdate -
    o_orderdate, days) per order priority against the [0, 100]-day
    spec window: cpk_micro = 1e6 * min(n*USL - S, S - n*LSL) //
    (3 * isqrt(n*Sxx - S^2)) — exact with the corrected floor-isqrt;
    the ops-SLA statistic one level above the lag histogram (q12's
    banding says WHAT happened; Cpk says whether the process can hold
    the spec at all).

    Scale shape: one broadcast of the slim (orderkey -> priority,
    orderdate) pair set?  No — lineitem carries orderkey only, so the
    per-line lag needs the order row: the orders side is
    priority+date (two slim columns), broadcast via ray.put under the
    same budget discipline as the q3/q19 dimension attach; per-block
    (priority -> n, S, Sxx-split) moment partials fold on the
    driver."""
    import math

    from document_extractor_ray import state

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(
                    sf_dir,
                    "orders",
                    columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
                ).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim = pa.table(
        {
            "o_orderkey": dim["o_orderkey"],
            "od": pc.cast(
                pc.cast(pc.cast(dim["o_orderdate"], pa.date32()), pa.int32()),
                pa.int64(),
            ),
            "prio": dim["o_orderpriority"],
        }
    )
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = pa.table(
            {
                "k": t["l_orderkey"],
                "sd": pc.cast(
                    pc.cast(pc.cast(t["l_shipdate"], pa.date32()), pa.int32()),
                    pa.int64(),
                ),
            }
        )
        t = state.lookup_join(t, "k", d, "o_orderkey", ["od", "prio"])
        # inner-join semantics: drop orphan lines with no order row
        # (fk_orphan_audit's finding; the SQL oracle inner-joins too)
        t = t.filter(pc.is_valid(t["od"]))
        lag = pc.subtract(t["sd"], t["od"]).to_numpy(zero_copy_only=False)
        x2 = lag * lag
        g = pa.TableGroupBy(
            pa.table(
                {
                    "prio": t["prio"],
                    "x": pa.array(lag, pa.int64()),
                    "x2q": pa.array(x2 // 1_000_000, pa.int64()),
                    "x2r": pa.array(x2 % 1_000_000, pa.int64()),
                }
            ),
            ["prio"],
        ).aggregate(
            [("x", "sum"), ("x2q", "sum"), ("x2r", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "prio": g["prio"],
                "s": g["x_sum"],
                "s2q": g["x2q_sum"],
                "s2r": g["x2r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    acc = fold_partials(
        li.map_batches(partial, batch_format="pyarrow"),
        "prio",
        ["s", "s2q", "s2r", "n"],
    )
    rows = []
    for p in sorted(acc):
        s, s2q, s2r, n = (int(v) for v in acc[p])
        ss = n * (s2q * 1_000_000 + s2r) - s * s
        num = min(n * usl - s, s - n * lsl)
        cpk = (1_000_000 * num) // (3 * math.isqrt(ss)) if ss else 0
        rows.append((p, n, cpk))
    return pa.table(
        {
            "priority": pa.array([r[0] for r in rows], pa.string()),
            "n_lines": pa.array([r[1] for r in rows], pa.int64()),
            "cpk_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


SHIPLAG_CPK_SQL = f"""
WITH j AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
g AS (
  SELECT priority,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(lag) AS HUGEINT) AS s,
         CAST(sum(lag * lag) AS HUGEINT) AS sxx
  FROM j GROUP BY 1
),
q AS (
  SELECT priority, n, s,
         n * sxx - s * s AS ss,
         CAST(floor(sqrt(CAST(n * sxx - s * s AS DOUBLE))) AS HUGEINT) AS s0
  FROM g
),
w AS (
  SELECT priority, n, s, ss,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= ss THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > ss THEN 1 ELSE 0 END) AS rt
  FROM q
)
SELECT priority,
       CAST(n AS BIGINT) AS n_lines,
       CAST(CASE WHEN ss = 0 THEN 0
                 ELSE (num - (((num % den) + den) % den)) // den
            END AS BIGINT) AS cpk_micro
FROM (
  SELECT priority, n, ss,
         1000000::HUGEINT * least(n * {CPK_USL_DAYS} - s,
                                  s - n * {CPK_LSL_DAYS}) AS num,
         3 * rt AS den
  FROM w
) ORDER BY priority
"""


# ---------------------------------------------------------------------------
# Combiner-effectiveness audit: partial-aggregation reduction per key
# ---------------------------------------------------------------------------

PARTIAL_AGG_BLOCK_ROWS = 4096


def partial_agg_reduction_audit(sf_dir: str, block_rows: int = PARTIAL_AGG_BLOCK_ROWS):
    """Measures, per candidate grouping key of the events table, how
    much a map-side combiner would shrink the shuffle: rows into the
    exchange after per-block partial aggregation = the number of
    distinct (block, key) pairs, where a block is an ``event_id``
    id-range of ``block_rows`` rows (deterministic, storage-layout
    independent).  ``combiner_out_permille`` is that count as a
    permille of input rows — low means pre-aggregate inside
    map_batches (the PERF.md steps 20-24 rule quantified);
    ``global_key_permille`` is the floor any plan can reach.

    Scale shape: the audit practices what it measures.  The bounded
    keys (day, event_type: domain-limited, blocks x domain pairs) fold
    per-block distinct partials on the driver; the unbounded key
    (user_id) routes its pair set and its global-distinct through
    ``bucketed_agg`` + count — per-group cost never touches Ray's
    hash aggregate.  At 10^12 rows the block count itself grows, so
    the audit would run over a block sample; the per-key CHOICE it
    informs is unchanged."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type", "user_id"])

    def slim(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "blk": pa.array(ids // block_rows, pa.int64()),
                "day": pc.cast(pc.cast(t["ts"], pa.date32()), pa.int32()),
                "etype": t["event_type"],
                "user_id": t["user_id"],
            }
        )

    sds = ds.map_batches(slim, batch_format="pyarrow")

    # day / event_type: domain-bounded -> driver fold of per-block
    # distinct partials (the dict keys ARE the distinct pairs)
    stats = {}
    n_rows = n_blocks = 0
    for name, col in (("day", "day"), ("event_type", "etype")):
        def partial(t: pa.Table, col=col) -> pa.Table:
            key = (
                pc.cast(t[col], pa.int64()).cast(pa.string())
                if col == "day"
                else t[col]
            )
            g = pa.TableGroupBy(
                pa.table({"blk": t["blk"], "k": key}), ["blk", "k"]
            ).aggregate([([], "count_all")])
            return pa.table(
                {
                    "blk": g["blk"],
                    "k": g["k"],
                    "n": pc.cast(g["count_all"], pa.int64()),
                }
            )

        acc = fold_partials(
            sds.map_batches(partial, batch_format="pyarrow"), ["blk", "k"], "n"
        )
        n_rows = sum(acc.values())
        n_blocks = len({b for b, _ in acc})
        stats[name] = (len(acc), len({k for _, k in acc}))

    # user_id: cardinality grows with data -> bucketed distinct + count
    pairs = bucketed_agg(sds.select_columns(["blk", "user_id"]),
                         ["blk", "user_id"], [(None, "count", "n")])
    ndv = bucketed_agg(sds.select_columns(["user_id"]),
                       ["user_id"], [(None, "count", "n")])
    stats["user_id"] = (pairs.count(), ndv.count())

    names = sorted(stats)
    return pa.table(
        {
            "key_name": pa.array(names, pa.string()),
            "n_rows": pa.array([n_rows] * len(names), pa.int64()),
            "n_blocks": pa.array([n_blocks] * len(names), pa.int64()),
            "sum_block_ndv": pa.array([stats[n][0] for n in names], pa.int64()),
            "global_ndv": pa.array([stats[n][1] for n in names], pa.int64()),
            "combiner_out_permille": pa.array(
                [1000 * stats[n][0] // n_rows for n in names], pa.int64()
            ),
            "global_key_permille": pa.array(
                [1000 * stats[n][1] // n_rows for n in names], pa.int64()
            ),
        }
    )


PARTIAL_AGG_REDUCTION_SQL = f"""
WITH e AS (
  SELECT event_id // {PARTIAL_AGG_BLOCK_ROWS} AS blk, event_type,
         user_id, CAST(ts AS DATE) AS day
  FROM events
),
s AS (
  SELECT 'day' AS key_name,
         (SELECT count(*) FROM e) AS n_rows,
         (SELECT count(DISTINCT blk) FROM e) AS n_blocks,
         (SELECT count(*) FROM (SELECT DISTINCT blk, day FROM e)) AS sum_block_ndv,
         (SELECT count(DISTINCT day) FROM e) AS global_ndv
  UNION ALL
  SELECT 'event_type',
         (SELECT count(*) FROM e),
         (SELECT count(DISTINCT blk) FROM e),
         (SELECT count(*) FROM (SELECT DISTINCT blk, event_type FROM e)),
         (SELECT count(DISTINCT event_type) FROM e)
  UNION ALL
  SELECT 'user_id',
         (SELECT count(*) FROM e),
         (SELECT count(DISTINCT blk) FROM e),
         (SELECT count(*) FROM (SELECT DISTINCT blk, user_id FROM e)),
         (SELECT count(DISTINCT user_id) FROM e)
)
SELECT key_name,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(sum_block_ndv AS BIGINT) AS sum_block_ndv,
       CAST(global_ndv AS BIGINT) AS global_ndv,
       CAST(1000 * sum_block_ndv // n_rows AS BIGINT) AS combiner_out_permille,
       CAST(1000 * global_ndv // n_rows AS BIGINT) AS global_key_permille
FROM s ORDER BY key_name
"""


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank statistics of value across event types
# ---------------------------------------------------------------------------

def value_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis sufficient statistics of ``value`` across ALL
    event types — the k-group extension of length_mannwhitney's
    two-group screen: per type the count and twice the tie-midranked
    rank sum (``ranksum_x2``, integer by the doubled-midrank rule
    2*cum_lt + nt + 1), plus the global tie-correction term
    Σ(t³-t) every H-statistic consumer needs.  Emitting the exact
    integer sufficient statistics instead of a floated H keeps the
    oracle bit-exact (the 12/(N(N+1)) division is the consumer's).

    Scale shape: per-block (cents, type) histogram partials, driver
    fold bounded by value-domain x types (cents-quantized domain, NOT
    row count — value_ks_types' bound); one O(V) cumulative scan
    replaces the global rank sort.  Unbounded value domains would
    range-partition the cents axis and prefix-sum per-partition
    totals (the value_hdr escalation)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"cents": _to_cents(t["value"]), "etype": t["event_type"]}
            ),
            ["cents", "etype"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "cents": g["cents"],
                "etype": g["etype"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["cents", "etype"], "n"
    )
    vals = sorted({c for (c, _) in cells})
    v_idx = {v: i for i, v in enumerate(vals)}
    types = sorted({e for (_, e) in cells})
    nt = np.zeros(len(vals), np.int64)
    per_type = {e: np.zeros(len(vals), np.int64) for e in types}
    for (c, e), n in cells.items():
        per_type[e][v_idx[c]] += n
        nt[v_idx[c]] += n
    cum_lt = np.concatenate(([0], np.cumsum(nt)[:-1]))
    midrank_x2 = 2 * cum_lt + nt + 1
    tie_adj = int((nt.astype(object) ** 3 - nt.astype(object)).sum())
    rows = [
        (e, int(per_type[e].sum()), int((per_type[e] * midrank_x2).sum()))
        for e in types
    ]
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "ranksum_x2": pa.array([r[2] for r in rows], pa.int64()),
            "tie_adj": pa.array([tie_adj] * len(rows), pa.int64()),
        }
    )


VALUE_KRUSKAL_WALLIS_SQL = """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT cents, CAST(sum(n) AS BIGINT) AS nt,
         CAST(COALESCE(sum(sum(n)) OVER (
             ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS cum_lt
  FROM c GROUP BY cents
),
ta AS (SELECT CAST(sum(nt * nt * nt - nt) AS BIGINT) AS tie_adj FROM t)
SELECT c.event_type,
       CAST(sum(c.n) AS BIGINT) AS n,
       CAST(sum(c.n * (2 * t.cum_lt + t.nt + 1)) AS BIGINT) AS ranksum_x2,
       CAST(any_value(ta.tie_adj) AS BIGINT) AS tie_adj
FROM c JOIN t USING (cents) CROSS JOIN ta
GROUP BY c.event_type
ORDER BY c.event_type
"""


# ---------------------------------------------------------------------------
# Fagin Threshold-Algorithm early-stop depth for top-k users
# ---------------------------------------------------------------------------

TA_TOP_K = 10


def topk_threshold_audit(sf_dir: str, k: int = TA_TOP_K):
    """Fagin Threshold-Algorithm audit over the two per-user rankings
    (event count; total value cents): scanning both sorted lists in
    lockstep with random access for the other attribute, at what depth
    does the k-th best combined score (count + cents, the classic TA
    additive aggregate) certify top-k — i.e. how much of a 10^12-row
    ranking a distributed top-k join can SKIP.  ``savings_permille``
    is the un-scanned share of the ranking; deterministic tie-break
    (attribute DESC, user_id ASC) on both sides.

    Scale shape: the per-user (count, cents) aggregate routes through
    ``bucketed_agg`` (user cardinality grows with data); the TA sweep
    itself is a numpy scan over the bounded user catalog — bounded by
    entities, not events (heavy_hitter_coverage's documented bound);
    the audited SAVINGS is what a real distributed TA would exploit
    by reading sorted runs depth-first."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "cents": _to_cents(t["value"])}
        )

    per_user = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        [("cents", "sum", "sc"), (None, "count", "ne")],
    )
    tabs = [t for t in map(ray.get, per_user.to_arrow_refs()) if t.num_rows]
    u = pa.concat_tables(tabs).combine_chunks()
    uid = u["user_id"].to_numpy(zero_copy_only=False)
    ne = u["ne"].to_numpy(zero_copy_only=False).astype(np.int64)
    sc = u["sc"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(uid)
    k = min(k, n)
    order_a = np.lexsort((uid, -ne))  # ne DESC, user_id ASC
    order_b = np.lexsort((uid, -sc))
    rank_a = np.empty(n, np.int64)
    rank_a[order_a] = np.arange(1, n + 1)
    rank_b = np.empty(n, np.int64)
    rank_b[order_b] = np.arange(1, n + 1)
    md = np.minimum(rank_a, rank_b)
    score = ne + sc
    tau = ne[order_a] + sc[order_b]  # tau at depth d = 1..n
    stop = kth = seen = None
    for d in range(1, n + 1):
        seen_mask = md <= d
        if int(seen_mask.sum()) >= k:
            seen_scores = np.sort(score[seen_mask])[::-1]
            if seen_scores[k - 1] >= tau[d - 1]:
                stop, kth, seen = d, int(seen_scores[k - 1]), int(seen_mask.sum())
                break
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n_users": pa.array([n], pa.int64()),
            "stop_depth": pa.array([stop], pa.int64()),
            "kth_score": pa.array([kth], pa.int64()),
            "tau_at_stop": pa.array([int(tau[stop - 1])], pa.int64()),
            "n_seen": pa.array([seen], pa.int64()),
            "savings_permille": pa.array(
                [1000 * (n - stop) // n], pa.int64()
            ),
        }
    )


TOPK_THRESHOLD_SQL = f"""
WITH u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc
  FROM events GROUP BY 1
),
a AS (
  SELECT user_id, ne, sc, ne + sc AS score,
         row_number() OVER (ORDER BY ne DESC, user_id) AS ra,
         row_number() OVER (ORDER BY sc DESC, user_id) AS rb
  FROM u
),
m AS (SELECT user_id, score, least(ra, rb) AS md FROM a),
kk AS (SELECT least({TA_TOP_K}, (SELECT count(*) FROM u)) AS k),
tau AS (
  SELECT ea.ra AS d, ea.ne + eb.sc AS tau
  FROM a ea JOIN a eb ON eb.rb = ea.ra
),
cand AS (
  SELECT t.d, t.tau,
         (SELECT count(*) FROM m WHERE m.md <= t.d AND m.score >= t.tau) AS c_ok,
         (SELECT count(*) FROM m WHERE m.md <= t.d) AS seen
  FROM tau t
),
stop AS (
  SELECT d, tau, seen FROM cand, kk WHERE c_ok >= kk.k ORDER BY d LIMIT 1
),
kth AS (
  SELECT min(score) AS kth_score FROM (
    SELECT m.score, row_number() OVER (ORDER BY m.score DESC) AS rn
    FROM m, stop WHERE m.md <= stop.d
  ), kk WHERE rn <= kk.k
)
SELECT CAST(kk.k AS BIGINT) AS k,
       CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
       CAST(stop.d AS BIGINT) AS stop_depth,
       CAST(kth.kth_score AS BIGINT) AS kth_score,
       CAST(stop.tau AS BIGINT) AS tau_at_stop,
       CAST(stop.seen AS BIGINT) AS n_seen,
       CAST(1000 * ((SELECT count(*) FROM u) - stop.d)
            // (SELECT count(*) FROM u) AS BIGINT) AS savings_permille
FROM stop, kk, kth
"""


# ---------------------------------------------------------------------------
# Presortedness audit: how sorted is each column in event_id order?
# ---------------------------------------------------------------------------

def presortedness_audit(sf_dir: str):
    """How presorted each candidate sort column of the events table
    already is, in canonical ``event_id`` order: adjacent descents
    (prev > cur; equal counts as in-order), ascending-run count, the
    longest ascending run, and ``sorted_permille`` — the planner
    input that decides between a full range-shuffle sort and a cheap
    run-merge (a column at 990+ permille wants merge; ~500 wants the
    shuffle).  Columns audited: event timestamp, user_id, value cents.

    Scale shape: a textbook segmented scan.  Each block emits a
    15-int summary (n, descents, prefix/suffix run lengths, longest
    run, first/last value per column) after an in-block vectorized
    diff; the driver merges summaries in id order — the monoid merge
    handles runs spanning any number of blocks, so no row-level data
    ever leaves the blocks and block boundaries cannot change the
    answer."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    COLS = ("ts_us", "user_id", "cents")

    def summarize(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t["event_id"])
        t = t.take(idx)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        arrs = {
            "ts_us": pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "cents": _to_cents(t["value"]).to_numpy(zero_copy_only=False),
        }
        row = {
            "min_id": [int(ids[0])],
            "max_id": [int(ids[-1])],
            "n": [len(ids)],
        }
        for c in COLS:
            a = arrs[c]
            desc = np.flatnonzero(a[:-1] > a[1:])  # descent BEFORE index+1
            n_desc = len(desc)
            # run boundaries at each descent; prefix/suffix/longest runs
            bounds = np.concatenate(([0], desc + 1, [len(a)]))
            runs = np.diff(bounds)
            row[f"{c}_desc"] = [int(n_desc)]
            row[f"{c}_prefix"] = [int(runs[0])]
            row[f"{c}_suffix"] = [int(runs[-1])]
            row[f"{c}_longest"] = [int(runs.max())]
            row[f"{c}_first"] = [int(a[0])]
            row[f"{c}_last"] = [int(a[-1])]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    parts = [
        t
        for t in map(
            ray.get,
            ds.map_batches(summarize, batch_format="pyarrow").to_arrow_refs(),
        )
        if t.num_rows
    ]
    rows = pa.concat_tables(parts).to_pylist()
    rows.sort(key=lambda r: r["min_id"])
    for prev, cur in zip(rows, rows[1:]):
        if cur["min_id"] <= prev["max_id"]:
            raise ValueError("presortedness_audit: overlapping id ranges")
    out = []
    n_total = sum(r["n"] for r in rows)
    for c in COLS:
        n_desc = sum(r[f"{c}_desc"] for r in rows)
        longest = max(r[f"{c}_longest"] for r in rows)
        run = rows[0][f"{c}_suffix"]
        for prev, cur in zip(rows, rows[1:]):
            if prev[f"{c}_last"] > cur[f"{c}_first"]:
                n_desc += 1
                run = cur[f"{c}_suffix"]
            else:
                # ascending across the boundary: suffix run extends
                joined = run + cur[f"{c}_prefix"]
                if cur[f"{c}_desc"] == 0:
                    run = joined  # whole block ascends; keep extending
                else:
                    longest = max(longest, joined)
                    run = cur[f"{c}_suffix"]
                longest = max(longest, joined)
        longest = max(longest, run)
        out.append(
            (
                c,
                n_total,
                n_desc,
                n_desc + 1,
                longest,
                1000 * (n_total - 1 - n_desc) // (n_total - 1)
                if n_total > 1
                else 1000,
            )
        )
    out.sort(key=lambda r: r[0])
    return pa.table(
        {
            "col": pa.array([r[0] for r in out], pa.string()),
            "n_rows": pa.array([r[1] for r in out], pa.int64()),
            "n_descents": pa.array([r[2] for r in out], pa.int64()),
            "n_runs": pa.array([r[3] for r in out], pa.int64()),
            "longest_run": pa.array([r[4] for r in out], pa.int64()),
            "sorted_permille": pa.array([r[5] for r in out], pa.int64()),
        }
    )


PRESORTEDNESS_SQL = """
WITH e AS (
  SELECT event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(user_id AS BIGINT) AS user_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
cols AS (
  SELECT 'cents' AS col, event_id, cents AS v FROM e
  UNION ALL SELECT 'ts_us', event_id, ts_us FROM e
  UNION ALL SELECT 'user_id', event_id, user_id FROM e
),
w AS (
  SELECT col, event_id, v,
         CASE WHEN lag(v) OVER (PARTITION BY col ORDER BY event_id) > v
              THEN 1 ELSE 0 END AS is_desc
  FROM cols
),
r AS (
  SELECT col, is_desc,
         sum(is_desc) OVER (PARTITION BY col ORDER BY event_id) AS rid
  FROM w
),
runs AS (
  SELECT col, rid, CAST(count(*) AS BIGINT) AS run_len
  FROM r GROUP BY 1, 2
),
d AS (SELECT col, CAST(sum(is_desc) AS BIGINT) AS n_desc FROM w GROUP BY 1)
SELECT runs.col,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_rows,
       CAST(any_value(d.n_desc) AS BIGINT) AS n_descents,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS longest_run,
       CAST(1000 * ((SELECT count(*) FROM e) - 1 - any_value(d.n_desc))
            // ((SELECT count(*) FROM e) - 1) AS BIGINT) AS sorted_permille
FROM runs JOIN d ON d.col = runs.col
GROUP BY runs.col ORDER BY runs.col
"""


# ---------------------------------------------------------------------------
# Hash k-fold assignment balance audit (per-fold x per-lang contingency)
# ---------------------------------------------------------------------------

KFOLD_K = 5


def kfold_balance_audit(sf_dir: str, k: int = KFOLD_K):
    """Assign every document to one of ``k`` cross-validation folds by
    fmix64(doc_id) % k (train_val_test_split's hash discipline: no
    shuffle, stable under corpus growth, reproducible on any engine)
    and emit the fold x lang contingency cells with their marginals —
    the exact sufficient statistics for any fold-balance chi-square:
    cell chi2 contribution = (n_obs*n_total - n_fold*n_lang)^2 /
    (n_total * n_fold * n_lang), all from this table's integers.

    Scale shape: pure per-batch arithmetic + a (fold, lang) partial
    count, k x |langs| driver fold — no shuffle anywhere."""
    from document_extractor_ray.functions.textstats import _read_docs

    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        fold = (_hll_hash(u) % np.uint64(k)).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"fold": pa.array(fold, pa.int64()), "lang": t["lang"]}),
            ["fold", "lang"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "fold": g["fold"],
                "lang": g["lang"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["fold", "lang"], "n"
    )
    n_total = sum(cells.values())
    fold_n = {}
    lang_n = {}
    for (f, l), n in cells.items():
        fold_n[f] = fold_n.get(f, 0) + n
        lang_n[l] = lang_n.get(l, 0) + n
    keys = sorted(cells)
    return pa.table(
        {
            "fold": pa.array([f for f, _ in keys], pa.int64()),
            "lang": pa.array([l for _, l in keys], pa.string()),
            "n_obs": pa.array([cells[key] for key in keys], pa.int64()),
            "n_fold": pa.array([fold_n[f] for f, _ in keys], pa.int64()),
            "n_lang": pa.array([lang_n[l] for _, l in keys], pa.int64()),
            "n_total": pa.array([n_total] * len(keys), pa.int64()),
        }
    )


def _kfold_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _mulmod64

    two32 = 1 << 32

    def xs33(col: str) -> str:
        return (
            f"(({col} // {two32}) * {two32}"
            f" + xor(CAST({col} % {two32} AS BIGINT),"
            f" CAST({col} // {two32} // 2 AS BIGINT))::HUGEINT)"
        )

    return f"""
WITH h0 AS (
  SELECT doc_id, lang,
         (doc_id::HUGEINT + {HLL_SEED}::HUGEINT) % {1 << 64}::HUGEINT AS h
  FROM documents
),
h1 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h0),
h2 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C1)} AS h FROM h1),
h3 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h2),
h4 AS (SELECT doc_id, lang, {_mulmod64('h', HLL_C2)} AS h FROM h3),
h5 AS (SELECT doc_id, lang, {xs33('h')} AS h FROM h4),
cells AS (
  SELECT CAST(h % {KFOLD_K} AS BIGINT) AS fold, lang,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM h5 GROUP BY 1, 2
)
SELECT fold, lang, n_obs,
       CAST(sum(n_obs) OVER (PARTITION BY fold) AS BIGINT) AS n_fold,
       CAST(sum(n_obs) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
       CAST(sum(n_obs) OVER () AS BIGINT) AS n_total
FROM cells ORDER BY fold, lang
"""


KFOLD_BALANCE_SQL = _kfold_sql()


# ---------------------------------------------------------------------------
# Weekly top-k users by spend (windowed top-k materialization)
# ---------------------------------------------------------------------------

WEEKLY_TOP_K = 3
_WEEK_US_TOPK = 7 * 86_400_000_000


def weekly_top_users(sf_dir: str, k: int = WEEKLY_TOP_K):
    """Per epoch-week top-k users by summed value cents (ties broken
    by user_id ASC) with their dense rank — the windowed-leaderboard
    materialization (weekly heavy spenders) every engagement pipeline
    ships.

    Scale shape: the (week, user) spend aggregate routes through
    ``bucketed_agg`` (user cardinality grows with data); the top-k cut
    is a ``groupby(week).map_groups`` over the WEEK key — group COUNT
    is calendar-bounded (weeks), so Ray's per-group cost is safe here
    (the CLAUDE.md trap is key-per-row groupbys), and each group
    reduces to k rows before anything returns to the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"])

    def slim(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "week": pa.array(us // _WEEK_US_TOPK, pa.int64()),
                "user_id": t["user_id"],
                "cents": _to_cents(t["value"]),
            }
        )

    per = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["week", "user_id"],
        [("cents", "sum", "cents")],
    )

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[("cents", "descending"), ("user_id", "ascending")],
        )[:k]
        t = t.take(idx)
        return pa.table(
            {
                "week": t["week"],
                "rank": pa.array(range(1, t.num_rows + 1), pa.int64()),
                "user_id": t["user_id"],
                "cents": t["cents"],
            }
        )

    out = per.groupby("week").map_groups(topk, batch_format="pyarrow")
    tabs = [t for t in map(ray.get, out.to_arrow_refs()) if t.num_rows]
    res = pa.concat_tables(tabs).combine_chunks()
    return res.sort_by([("week", "ascending"), ("rank", "ascending")])


WEEKLY_TOP_USERS_SQL = f"""
WITH w AS (
  SELECT CAST(epoch_us(ts) // {_WEEK_US_TOPK} AS BIGINT) AS week,
         user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT week, user_id, cents,
         row_number() OVER (
           PARTITION BY week ORDER BY cents DESC, user_id) AS rank
  FROM w
)
SELECT week, CAST(rank AS BIGINT) AS rank, user_id, cents
FROM r WHERE rank <= {WEEKLY_TOP_K}
ORDER BY week, rank
"""


# ---------------------------------------------------------------------------
# Tukey median polish of the day-of-week x 6h-bucket event-count matrix
# ---------------------------------------------------------------------------

def events_median_polish(sf_dir: str):
    """Two full Tukey median-polish sweeps (row, col, row, col) over
    the 7 x 4 day-of-week x six-hour-bucket event-count matrix:
    robust additive decomposition count = row_effect + col_effect +
    residual whose effects outliers cannot drag (the median analogue
    of a two-way ANOVA fit) — the seasonality-vs-anomaly separator
    for traffic matrices.  All values carry a x4 integer scale: counts
    enter as 4n, every even-set median is the exact mid-pair average
    (multiples of 4 keep it integral), so residuals and effects are
    bit-exact integers and the DuckDB oracle unrolls the same four
    half-sweeps.

    Scale shape: ONE bounded (dow, hourq) partial-count fold (28
    cells); the polish itself is driver arithmetic on the 7 x 4
    matrix — at 10^12 rows the matrix is still 28 cells."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        dow = day % 7
        hourq = (us % 86_400_000_000) // (6 * 3_600_000_000)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "dow": pa.array(dow, pa.int64()),
                    "hourq": pa.array(hourq, pa.int64()),
                }
            ),
            ["dow", "hourq"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "dow": g["dow"],
                "hourq": g["hourq"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["dow", "hourq"], "n"
    )
    R, C = 7, 4
    counts = np.zeros((R, C), np.int64)
    for (d, h), n in cells.items():
        counts[int(d), int(h)] = n
    e = counts * 4
    row_eff = np.zeros(R, np.int64)
    col_eff = np.zeros(C, np.int64)

    def med_even(v):  # exact median of an even-sized int set (int result)
        s = np.sort(v)
        n = len(s)
        return int(s[n // 2 - 1] + s[n // 2]) // 2

    def med_odd(v):
        return int(np.sort(v)[len(v) // 2])

    for _ in range(2):
        d = np.array([med_even(e[i, :]) for i in range(R)], np.int64)
        e -= d[:, None]
        row_eff += d
        d = np.array([med_odd(e[:, j]) for j in range(C)], np.int64)
        e -= d[None, :]
        col_eff += d

    dows = np.repeat(np.arange(R), C)
    hqs = np.tile(np.arange(C), R)
    return pa.table(
        {
            "dow": pa.array(dows, pa.int64()),
            "hourq": pa.array(hqs, pa.int64()),
            "n_events": pa.array(counts.ravel(), pa.int64()),
            "row_effect_x4": pa.array(np.repeat(row_eff, C), pa.int64()),
            "col_effect_x4": pa.array(np.tile(col_eff, R), pa.int64()),
            "residual_x4": pa.array(e.ravel(), pa.int64()),
        }
    )


EVENTS_MEDIAN_POLISH_SQL = """
WITH grid AS (
  SELECT d.dow, h.hourq FROM range(0, 7) d(dow) CROSS JOIN range(0, 4) h(hourq)
),
obs AS (
  SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 21600000000 AS hourq,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
m0 AS (
  SELECT grid.dow, grid.hourq, COALESCE(obs.n, 0) AS n,
         4 * COALESCE(obs.n, 0) AS v
  FROM grid LEFT JOIN obs ON obs.dow = grid.dow AND obs.hourq = grid.hourq
),
-- half-sweep 1: row medians (4 cols, even set: exact mid-pair mean)
r1 AS (
  SELECT dow, CAST(sum(v) FILTER (WHERE rn IN (2, 3)) // 2 AS BIGINT) AS med
  FROM (SELECT dow, v, row_number() OVER (PARTITION BY dow ORDER BY v) AS rn
        FROM m0) GROUP BY dow
),
m1 AS (SELECT m0.dow, m0.hourq, m0.n, m0.v - r1.med AS v, r1.med AS r_acc
       FROM m0 JOIN r1 USING (dow)),
-- half-sweep 2: col medians (7 rows, odd set: exact middle)
c1 AS (
  SELECT hourq, CAST(sum(v) FILTER (WHERE rn = 4) AS BIGINT) AS med
  FROM (SELECT hourq, v, row_number() OVER (PARTITION BY hourq ORDER BY v) AS rn
        FROM m1) GROUP BY hourq
),
m2 AS (SELECT m1.dow, m1.hourq, m1.n, m1.v - c1.med AS v, m1.r_acc,
              c1.med AS c_acc
       FROM m1 JOIN c1 USING (hourq)),
-- half-sweep 3: row medians again
r2 AS (
  SELECT dow, CAST(sum(v) FILTER (WHERE rn IN (2, 3)) // 2 AS BIGINT) AS med
  FROM (SELECT dow, v, row_number() OVER (PARTITION BY dow ORDER BY v) AS rn
        FROM m2) GROUP BY dow
),
m3 AS (SELECT m2.dow, m2.hourq, m2.n, m2.v - r2.med AS v,
              m2.r_acc + r2.med AS r_acc, m2.c_acc
       FROM m2 JOIN r2 USING (dow)),
-- half-sweep 4: col medians again
c2 AS (
  SELECT hourq, CAST(sum(v) FILTER (WHERE rn = 4) AS BIGINT) AS med
  FROM (SELECT hourq, v, row_number() OVER (PARTITION BY hourq ORDER BY v) AS rn
        FROM m3) GROUP BY hourq
),
m4 AS (SELECT m3.dow, m3.hourq, m3.n, m3.v - c2.med AS v, m3.r_acc,
              m3.c_acc + c2.med AS c_acc
       FROM m3 JOIN c2 USING (hourq))
SELECT CAST(dow AS BIGINT) AS dow, CAST(hourq AS BIGINT) AS hourq,
       n AS n_events,
       CAST(r_acc AS BIGINT) AS row_effect_x4,
       CAST(c_acc AS BIGINT) AS col_effect_x4,
       CAST(v AS BIGINT) AS residual_x4
FROM m4 ORDER BY dow, hourq
"""


# ---------------------------------------------------------------------------
# Difference-in-differences of mean value: treated vs control type
# ---------------------------------------------------------------------------

DID_CUTOVER_DAY = 19_740  # 2024-01-18: split of the fixture window


def value_did_estimate(sf_dir: str):
    """Difference-in-differences of mean value cents, treated type
    ('purchase') vs control ('click'), pre vs post the fixed cutover
    day: DiD = (post_t - pre_t) - (post_c - pre_c) on group MEANS —
    the standard quasi-experimental readout when a change ships on a
    date.  The four (group, period) cells are emitted with exact
    integer sums/counts, and ``did_micro`` is the exact floor of 10^6
    x the rational DiD (Fraction arithmetic on the driver; the
    oracle's HUGEINT cross-multiplication + convention-proof floor
    reproduces it bit for bit).

    Scale shape: one filtered pass, 4-cell driver fold."""
    from fractions import Fraction
    from math import floor

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    treated, control = KS_TYPE_B, KS_TYPE_A

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array([treated, control])))
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        post = (us // 86_400_000_000 >= DID_CUTOVER_DAY).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "etype": t["event_type"],
                    "post": pa.array(post, pa.int64()),
                    "cents": _to_cents(t["value"]),
                }
            ),
            ["etype", "post"],
        ).aggregate([("cents", "sum"), ([], "count_all")])
        return pa.table(
            {
                "etype": g["etype"],
                "post": g["post"],
                "s": g["cents_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["etype", "post"], ["s", "n"]
    )
    mean = {k: Fraction(v[0], v[1]) for k, v in acc.items()}
    did = (
        mean[(treated, 1)]
        - mean[(treated, 0)]
        - (mean[(control, 1)] - mean[(control, 0)])
    )
    did_micro = floor(did * 1_000_000)
    keys = sorted(acc)
    return pa.table(
        {
            "event_type": pa.array([k[0] for k in keys], pa.string()),
            "post": pa.array([k[1] for k in keys], pa.int64()),
            "n": pa.array([acc[k][1] for k in keys], pa.int64()),
            "sum_cents": pa.array([acc[k][0] for k in keys], pa.int64()),
            "did_micro": pa.array([did_micro] * len(keys), pa.int64()),
        }
    )


VALUE_DID_SQL = f"""
WITH cells AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) // 86400000000 >= {DID_CUTOVER_DAY}
              THEN 1 ELSE 0 END AS post,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
  FROM events
  WHERE event_type IN ('{KS_TYPE_B}', '{KS_TYPE_A}')
  GROUP BY 1, 2
),
p AS (
  SELECT
    max(CASE WHEN event_type = '{KS_TYPE_B}' AND post = 1 THEN sum_cents END)::HUGEINT AS st1,
    max(CASE WHEN event_type = '{KS_TYPE_B}' AND post = 1 THEN n END)::HUGEINT AS nt1,
    max(CASE WHEN event_type = '{KS_TYPE_B}' AND post = 0 THEN sum_cents END)::HUGEINT AS st0,
    max(CASE WHEN event_type = '{KS_TYPE_B}' AND post = 0 THEN n END)::HUGEINT AS nt0,
    max(CASE WHEN event_type = '{KS_TYPE_A}' AND post = 1 THEN sum_cents END)::HUGEINT AS sc1,
    max(CASE WHEN event_type = '{KS_TYPE_A}' AND post = 1 THEN n END)::HUGEINT AS nc1,
    max(CASE WHEN event_type = '{KS_TYPE_A}' AND post = 0 THEN sum_cents END)::HUGEINT AS sc0,
    max(CASE WHEN event_type = '{KS_TYPE_A}' AND post = 0 THEN n END)::HUGEINT AS nc0
  FROM cells
),
d AS (
  SELECT 1000000::HUGEINT * (st1 * nt0 * nc1 * nc0 - st0 * nt1 * nc1 * nc0
                             - sc1 * nt1 * nt0 * nc0 + sc0 * nt1 * nt0 * nc1)
           AS num,
         nt1 * nt0 * nc1 * nc0 AS den
  FROM p
)
SELECT c.event_type, CAST(c.post AS BIGINT) AS post, c.n, c.sum_cents,
       CAST((d.num - ((d.num % d.den) + d.den) % d.den) // d.den AS BIGINT)
         AS did_micro
FROM cells c CROSS JOIN d
ORDER BY c.event_type, c.post
"""


# ---------------------------------------------------------------------------
# Broadcast-vs-partitioned-join plan audit over the dimension tables
# ---------------------------------------------------------------------------

# single source of truth for the byte model: fixed Arrow widths per
# type; strings cost 4 offset bytes + utf8 payload bytes
_BCAST_SCHEMAS = {
    "region": [("r_regionkey", 4), ("r_name", None)],
    "nation": [("n_nationkey", 4), ("n_name", None), ("n_regionkey", 4)],
    "supplier": [
        ("s_suppkey", 8),
        ("s_name", None),
        ("s_nationkey", 4),
        ("s_acctbal", 8),
    ],
    "customer": [
        ("c_custkey", 8),
        ("c_name", None),
        ("c_nationkey", 4),
        ("c_acctbal", 8),
        ("c_mktsegment", None),
    ],
    "part": [
        ("p_partkey", 8),
        ("p_name", None),
        ("p_brand", None),
        ("p_type", None),
        ("p_size", 4),
        ("p_retailprice", 8),
    ],
}
BCAST_LIMIT_BYTES = 64 << 20  # the repo's documented broadcast budget


def broadcast_plan_audit(sf_dir: str, limit: int = BCAST_LIMIT_BYTES):
    """The broadcast-or-shuffle decision, made measurable: for every
    dimension table, its exact Arrow-model byte size (fixed column
    widths + per-string 4-byte offset + utf8 payload) and the
    resulting plan — ``broadcast`` when the table fits the 64 MB
    ray.put budget every dim attach in this repo assumes, else
    ``partitioned_join``.  This is the audit behind the
    state.lookup_join / _join_partitions split (q3/q14/q19's attach
    vs order_revenue_by_nation's hash join); at 10^12 rows the fact
    tables stay streaming either way, only dims are ever weighed.

    Scale shape: per-table column-pruned read, per-batch (rows,
    bytes) partials, 1-row fold per table — the audit never holds a
    table, only its size."""
    rows_out = []
    for table in sorted(_BCAST_SCHEMAS):
        cols = _BCAST_SCHEMAS[table]
        ds = _read(sf_dir, table, columns=[c for c, _ in cols])

        def partial(t: pa.Table, cols=cols) -> pa.Table:
            n = t.num_rows
            b = 0
            for c, width in cols:
                if width is None:
                    b += 4 * n + int(
                        pc.sum(pc.binary_length(t[c])).as_py() or 0
                    )
                else:
                    b += width * n
            return pa.table(
                {
                    "one": pa.array([1], pa.int64()),
                    "n": pa.array([n], pa.int64()),
                    "bytes": pa.array([b], pa.int64()),
                }
            )

        acc = fold_partials(
            ds.map_batches(partial, batch_format="pyarrow"), "one", ["n", "bytes"]
        )
        n, est = acc[1]
        rows_out.append(
            (
                table,
                n,
                est,
                est // max(n, 1),
                "broadcast" if est <= limit else "partitioned_join",
            )
        )
    return pa.table(
        {
            "table_name": pa.array([r[0] for r in rows_out], pa.string()),
            "n_rows": pa.array([r[1] for r in rows_out], pa.int64()),
            "est_bytes": pa.array([r[2] for r in rows_out], pa.int64()),
            "bytes_per_row": pa.array([r[3] for r in rows_out], pa.int64()),
            "plan": pa.array([r[4] for r in rows_out], pa.string()),
        }
    )


def _broadcast_plan_sql() -> str:
    selects = []
    for table in sorted(_BCAST_SCHEMAS):
        terms = []
        for c, width in _BCAST_SCHEMAS[table]:
            if width is None:
                terms.append(f"4 * count(*) + sum(strlen({c}))")
            else:
                terms.append(f"{width} * count(*)")
        expr = " + ".join(terms)
        selects.append(
            f"""SELECT '{table}' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({expr} AS BIGINT) AS est_bytes,
       CAST(({expr}) // greatest(count(*), 1) AS BIGINT) AS bytes_per_row,
       CASE WHEN {expr} <= {BCAST_LIMIT_BYTES} THEN 'broadcast'
            ELSE 'partitioned_join' END AS plan
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY table_name"


BROADCAST_PLAN_SQL = _broadcast_plan_sql()


# ---------------------------------------------------------------------------
# Per-nation weighted median of customer balance (weights = order counts)
# ---------------------------------------------------------------------------

def nation_weighted_median_acctbal(sf_dir: str):
    """Per-nation WEIGHTED median of customer account balance, each
    customer weighted by their order count — the grouped
    weighted-median primitive (robust center where entities matter by
    activity, not per capita).  Doubled-middle rule on weights:
    wmedian_cents_x2 = (first v with 2·cumw ≥ W) + (first v with
    2·cumw > W), so exact integer ties never float.  Customers with
    no orders carry weight 0 and drop out (inner-join semantics, like
    the SQL).

    Scale shape: the per-customer weight aggregate routes through
    ``bucketed_agg`` (customer cardinality grows with data); the slim
    customer dim (custkey -> nation, cents) broadcasts once via
    ray.put; the median scan is ``groupby(nation).map_groups`` over
    the 25-nation key — bounded groups, each reduced to one row
    before leaving the task."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    per_cust = bucketed_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"],
        [(None, "count", "w")],
    )

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(
                    sf_dir,
                    "customer",
                    columns=["c_custkey", "c_nationkey", "c_acctbal"],
                ).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim = pa.table(
        {
            "c_custkey": dim["c_custkey"],
            "nk": pc.cast(dim["c_nationkey"], pa.int64()),
            "cents": _to_cents(dim["c_acctbal"]),
        }
    )
    dim_ref = state.broadcast(dim)

    def attach(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["nk", "cents"])
        return t.filter(pc.is_valid(t["nk"]))

    def med_scan(t: pa.Table) -> pa.Table:
        cents = t["cents"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(cents, kind="stable")
        cents, w = cents[order], w[order]
        cw = np.cumsum(w)
        W = int(cw[-1])
        lo = int(cents[np.searchsorted(2 * cw, W, side="left")])
        hi = int(cents[np.searchsorted(2 * cw, W, side="right")])
        return pa.table(
            {
                "nk": pa.array([int(t["nk"][0].as_py())], pa.int64()),
                "n_customers": pa.array([t.num_rows], pa.int64()),
                "total_weight": pa.array([W], pa.int64()),
                "wmedian_cents_x2": pa.array([lo + hi], pa.int64()),
            }
        )

    out = (
        per_cust.map_batches(attach, batch_format="pyarrow")
        .groupby("nk")
        .map_groups(med_scan, batch_format="pyarrow")
    )
    tabs = [t for t in map(ray.get, out.to_arrow_refs()) if t.num_rows]
    res = pa.concat_tables(tabs).combine_chunks()
    names = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_arrow_refs(),
            )
            if t.num_rows
        ]
    )
    name_of = dict(
        zip(
            pc.cast(names["n_nationkey"], pa.int64()).to_pylist(),
            names["n_name"].to_pylist(),
        )
    )
    rows = sorted(
        (
            name_of[r["nk"]],
            r["n_customers"],
            r["total_weight"],
            r["wmedian_cents_x2"],
        )
        for r in res.to_pylist()
    )
    return pa.table(
        {
            "nation": pa.array([r[0] for r in rows], pa.string()),
            "n_customers": pa.array([r[1] for r in rows], pa.int64()),
            "total_weight": pa.array([r[2] for r in rows], pa.int64()),
            "wmedian_cents_x2": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


NATION_WEIGHTED_MEDIAN_SQL = """
WITH w AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS w
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_nationkey AS nk,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents, w.w
  FROM w JOIN customer c ON c.c_custkey = w.k
),
cum AS (
  SELECT nk, cents, w,
         CAST(sum(w) OVER (PARTITION BY nk ORDER BY cents, w
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
         CAST(sum(w) OVER (PARTITION BY nk) AS BIGINT) AS tw
  FROM j
),
lo AS (SELECT nk, min(cents) AS v FROM cum WHERE 2 * cw >= tw GROUP BY 1),
hi AS (SELECT nk, min(cents) AS v FROM cum WHERE 2 * cw > tw GROUP BY 1),
agg AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(w) AS BIGINT) AS total_weight
  FROM j GROUP BY 1
)
SELECT n.n_name AS nation, agg.n_customers, agg.total_weight,
       CAST(lo.v + hi.v AS BIGINT) AS wmedian_cents_x2
FROM agg JOIN lo USING (nk) JOIN hi USING (nk)
JOIN nation n ON n.n_nationkey = agg.nk
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Price realization vs retail per brand (lineitem x part broadcast)
# ---------------------------------------------------------------------------

def brand_price_realization(sf_dir: str):
    """Per-brand price realization: each line's achieved unit price as
    a permille of the part's retail price — realization_permille =
    floor(1000·extprice_cents / (qty·retail_cents)) per LINE, then
    per-brand count / sum / min / max — the discount-depth control
    chart that catches a brand selling systematically under list.

    Scale shape: the part dim slims to (partkey -> brand,
    retail_cents) and broadcasts once via ray.put (q14's attach
    discipline); per-block (brand -> 4 counters) partials fold on the
    bounded brand domain.  The per-line division happens INSIDE the
    block in int64 — nothing row-shaped shuffles."""
    from document_extractor_ray import state

    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(
                    sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice"]
                ).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim = pa.table(
        {
            "p_partkey": dim["p_partkey"],
            "brand": dim["p_brand"],
            "retail_cents": _to_cents(dim["p_retailprice"]),
        }
    )
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = pa.table(
            {
                "k": t["l_partkey"],
                "ext_cents": _to_cents(t["l_extendedprice"]),
                "qty": pc.cast(
                    pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )
        t = state.lookup_join(t, "k", d, "p_partkey", ["brand", "retail_cents"])
        t = t.filter(pc.is_valid(t["brand"]))
        ext = t["ext_cents"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        ret = t["retail_cents"].to_numpy(zero_copy_only=False)
        r = (1000 * ext) // (qty * ret)
        g = pa.TableGroupBy(
            pa.table({"brand": t["brand"], "r": pa.array(r, pa.int64())}),
            ["brand"],
        ).aggregate([("r", "sum"), ("r", "min"), ("r", "max"), ([], "count_all")])
        return pa.table(
            {
                "brand": g["brand"],
                "s": g["r_sum"],
                "mn": g["r_min"],
                "mx": g["r_max"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_quantity"]
    )
    parts = [
        t
        for t in map(
            ray.get, li.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    t = pa.concat_tables(parts)
    g = pa.TableGroupBy(t, ["brand"]).aggregate(
        [("s", "sum"), ("mn", "min"), ("mx", "max"), ("n", "sum")]
    )
    idx = pc.sort_indices(g["brand"])
    g = g.take(idx)
    return pa.table(
        {
            "brand": g["brand"],
            "n_lines": g["n_sum"],
            "sum_realization_permille": g["s_sum"],
            "min_realization_permille": g["mn_min"],
            "max_realization_permille": g["mx_max"],
        }
    )


BRAND_PRICE_REALIZATION_SQL = """
WITH j AS (
  SELECT p.p_brand AS brand,
         (1000 * CAST(round(l.l_extendedprice * 100) AS BIGINT))
         // (CAST(round(l.l_quantity) AS BIGINT)
             * CAST(round(p.p_retailprice * 100) AS BIGINT)) AS r
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(r) AS BIGINT) AS sum_realization_permille,
       CAST(min(r) AS BIGINT) AS min_realization_permille,
       CAST(max(r) AS BIGINT) AS max_realization_permille
FROM j GROUP BY brand ORDER BY brand
"""


# ---------------------------------------------------------------------------
# One-hit-wonder rate per week (cache-admission statistic)
# ---------------------------------------------------------------------------

def one_hit_wonder_rate(sf_dir: str):
    """Per epoch-week: distinct users, users seen exactly once, and
    the one-hit-wonder rate (permille of distinct) — the cache-
    admission statistic (TinyLFU's motivating measurement): a high
    one-hit share means admit-on-second-touch beats admit-always for
    any per-user cache or state store sized off this feed.

    Scale shape: (week, user) counts via ``bucketed_agg`` (user
    cardinality grows with data); the per-week reduction is a
    ``groupby(week).map_groups`` over the calendar-bounded week key,
    each group collapsing to one row inside the task."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def slim(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "week": pa.array(us // _WEEK_US_TOPK, pa.int64()),
                "user_id": t["user_id"],
            }
        )

    per = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["week", "user_id"],
        [(None, "count", "n")],
    )

    def reduce_week(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        distinct = len(n)
        one = int((n == 1).sum())
        return pa.table(
            {
                "week": pa.array([int(t["week"][0].as_py())], pa.int64()),
                "n_events": pa.array([int(n.sum())], pa.int64()),
                "n_users": pa.array([distinct], pa.int64()),
                "n_one_hit": pa.array([one], pa.int64()),
                "one_hit_permille": pa.array(
                    [1000 * one // distinct], pa.int64()
                ),
            }
        )

    out = per.groupby("week").map_groups(reduce_week, batch_format="pyarrow")
    tabs = [t for t in map(ray.get, out.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tabs).combine_chunks().sort_by("week")


ONE_HIT_WONDER_SQL = f"""
WITH c AS (
  SELECT CAST(epoch_us(ts) // {7 * 86_400_000_000} AS BIGINT) AS week,
         user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT week,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_one_hit,
       CAST(1000 * count(*) FILTER (WHERE n = 1) // count(*) AS BIGINT)
         AS one_hit_permille
FROM c GROUP BY week ORDER BY week
"""


# ---------------------------------------------------------------------------
# SLO error-budget burn rate over the event feed
# ---------------------------------------------------------------------------

SLO_ERROR_PERMILLE = 210  # fixture error share ~1/5; budget just under it


def slo_burn_rate(sf_dir: str, slo_permille: int = SLO_ERROR_PERMILLE):
    """Daily SLO error-budget accounting over the event feed: per day
    the event/error counts, the exact error permille, the day's budget
    delta in event-units x1000 (1000·errors − slo·events: positive
    burns budget, negative refills) and its running total — the SRE
    burn-rate table that pages BEFORE the month's budget is gone.
    All integer: no rate is ever floated.

    Scale shape: calendar-bounded (day -> 2 counters) fold, driver
    cumsum over ~30 rows."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "day": pa.array(us // 86_400_000_000, pa.int64()),
                    "err": pc.cast(
                        pc.equal(t["event_type"], "error"), pa.int64()
                    ),
                }
            ),
            ["day"],
        ).aggregate([("err", "sum"), ([], "count_all")])
        return pa.table(
            {
                "day": g["day"],
                "e": g["err_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", ["e", "n"]
    )
    days = sorted(acc)
    run = 0
    rows = []
    for d in days:
        e, n = acc[d]
        delta = 1000 * e - slo_permille * n
        run += delta
        rows.append((d, n, e, 1000 * e // n, delta, run))
    return pa.table(
        {
            "day": pa.array([r[0] for r in rows], pa.int64()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "n_errors": pa.array([r[2] for r in rows], pa.int64()),
            "err_permille": pa.array([r[3] for r in rows], pa.int64()),
            "budget_delta_x1000": pa.array([r[4] for r in rows], pa.int64()),
            "budget_spent_x1000": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


SLO_BURN_SQL = f"""
WITH d AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
           AS n_errors
  FROM events GROUP BY 1
)
SELECT day, n_events, n_errors,
       CAST(1000 * n_errors // n_events AS BIGINT) AS err_permille,
       CAST(1000 * n_errors - {SLO_ERROR_PERMILLE} * n_events AS BIGINT)
         AS budget_delta_x1000,
       CAST(sum(1000 * n_errors - {SLO_ERROR_PERMILLE} * n_events)
            OVER (ORDER BY day) AS BIGINT) AS budget_spent_x1000
FROM d ORDER BY day
"""


# ---------------------------------------------------------------------------
# Kendall tau-b ingredients: hour of day x value band
# ---------------------------------------------------------------------------

KENDALL_BAND_CENTS = 2500
KENDALL_BAND_CAP = 19


def hour_value_kendall(sf_dir: str):
    """Kendall tau-b sufficient statistics between hour-of-day and the
    event's value band ($25 bands, capped at 19): concordant /
    discordant / tie pair counts, all exact integers computed from the
    24 x 20 contingency table — the rank-correlation family's third
    member (Mann-Whitney: 2-group, Kruskal-Wallis: k-group, Kendall:
    ordinal x ordinal).  tau_b = (C - D) / sqrt((T - Tx)(T - Ty)) is
    the consumer's one irrational step.

    Scale shape: bounded (hour, band) partial counts fold on the
    driver; C/D come from 2-D suffix sums over the 480-cell grid —
    pair counts without pairs, at any corpus size."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = (us % 86_400_000_000) // 3_600_000_000
        cents = _to_cents(t["value"]).to_numpy(zero_copy_only=False)
        band = np.minimum(cents // KENDALL_BAND_CENTS, KENDALL_BAND_CAP)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "h": pa.array(hour, pa.int64()),
                    "b": pa.array(band, pa.int64()),
                }
            ),
            ["h", "b"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "h": g["h"],
                "b": g["b"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["h", "b"], "n"
    )
    N = np.zeros((24, KENDALL_BAND_CAP + 1), dtype=object)
    for (h, b), n in cells.items():
        N[int(h), int(b)] = n
    # suffix sums: S[i][j] = sum over i'>i, j'>j
    n_total = int(N.sum())
    flip = N[::-1, ::-1]
    suffix = flip.cumsum(axis=0).cumsum(axis=1)[::-1, ::-1]
    gt = np.zeros_like(N)
    gt[:-1, :-1] = suffix[1:, 1:]
    C = int((N * gt).sum())
    # discordant: i'>i, j'<j -> flip bands only
    Nf = N[:, ::-1]
    flip2 = Nf[::-1, ::-1]
    suffix2 = flip2.cumsum(axis=0).cumsum(axis=1)[::-1, ::-1]
    lt = np.zeros_like(Nf)
    lt[:-1, :-1] = suffix2[1:, 1:]
    D = int((Nf * lt).sum())
    row = N.sum(axis=1)
    col = N.sum(axis=0)
    c2 = lambda x: int(x) * (int(x) - 1) // 2
    both = int(sum(c2(v) for v in N.ravel()))
    ties_x = int(sum(c2(v) for v in row)) - both
    ties_y = int(sum(c2(v) for v in col)) - both
    return pa.table(
        {
            "n": pa.array([n_total], pa.int64()),
            "concordant": pa.array([C], pa.int64()),
            "discordant": pa.array([D], pa.int64()),
            "ties_x_only": pa.array([ties_x], pa.int64()),
            "ties_y_only": pa.array([ties_y], pa.int64()),
            "ties_both": pa.array([both], pa.int64()),
        }
    )


HOUR_VALUE_KENDALL_SQL = f"""
WITH c AS (
  SELECT (epoch_us(ts) % 86400000000) // 3600000000 AS h,
         least(CAST(round(value * 100) AS BIGINT) // {KENDALL_BAND_CENTS},
               {KENDALL_BAND_CAP}) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT
    CAST(sum(a.n * x.n)
         FILTER (WHERE x.h > a.h AND x.b > a.b) AS BIGINT) AS concordant,
    CAST(sum(a.n * x.n)
         FILTER (WHERE x.h > a.h AND x.b < a.b) AS BIGINT) AS discordant
  FROM c a JOIN c x ON true
),
rows_h AS (SELECT h, sum(n) AS rn FROM c GROUP BY 1),
cols_b AS (SELECT b, sum(n) AS cn FROM c GROUP BY 1),
t AS (
  SELECT
    CAST((SELECT sum(n) FROM c) AS BIGINT) AS n,
    CAST((SELECT sum(n * (n - 1) // 2) FROM c) AS BIGINT) AS both,
    CAST((SELECT sum(rn * (rn - 1) // 2) FROM rows_h) AS BIGINT) AS tx,
    CAST((SELECT sum(cn * (cn - 1) // 2) FROM cols_b) AS BIGINT) AS ty
)
SELECT t.n, pairs.concordant, pairs.discordant,
       CAST(t.tx - t.both AS BIGINT) AS ties_x_only,
       CAST(t.ty - t.both AS BIGINT) AS ties_y_only,
       t.both AS ties_both
FROM pairs, t
"""


# ---------------------------------------------------------------------------
# Functional-dependency violation audit (data-profiling primitive)
# ---------------------------------------------------------------------------

_FD_CANDIDATES = [
    # (table, lhs, rhs) — candidate "lhs determines rhs" rules
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("events", "user_id", "event_type"),
]


def fd_violation_audit(sf_dir: str):
    """Functional-dependency profiling over a fixed candidate list:
    for each "lhs -> rhs" rule the distinct-lhs group count, how many
    groups bind MORE than one rhs (violations), and the max rhs
    variety — the schema-discovery primitive that tells a pipeline
    which columns are safe join/dedup keys and which 'constant per
    entity' assumptions are lies.  holds = violations == 0.

    Scale shape: per rule, ONE bucketed exchange partitioned by
    hash(lhs) — each partition then holds complete lhs groups, so the
    distinct-(lhs, rhs) merge, the per-lhs variety count and the
    (groups, violations, max) reduction all happen inside the
    partition and only a per-block stats row reaches the driver (the
    earlier two-chained-``bucketed_agg`` shape re-executed the whole
    pipeline for the max and cost 9.5 s at sf0.1; this one-exchange
    plan is the same semantics in one pass)."""
    from document_extractor_ray.functions.bucketing import (
        agg_apply,
        key_part_column,
        n_shuffle_parts,
    )

    n_parts = n_shuffle_parts()
    rows = []
    for table, lhs, rhs in _FD_CANDIDATES:
        ds = _read(sf_dir, table, columns=[lhs, rhs])

        def partial(t: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            out = agg_apply(t, [lhs, rhs], [(None, "count", "n")], merge=False)
            return out.append_column(
                "part", key_part_column(out, [lhs], n_parts)
            )

        def resolve(t: pa.Table, lhs=lhs, rhs=rhs) -> pa.Table:
            m = agg_apply(
                t.drop_columns(["part"]), [lhs, rhs], [(None, "count", "n")],
                merge=True,
            )
            g = pa.TableGroupBy(m.select([lhs]), [lhs]).aggregate(
                [([], "count_all")]
            )
            k = pc.cast(g["count_all"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "groups": pa.array([len(k)], pa.int64()),
                    "viol": pa.array([int((k > 1).sum())], pa.int64()),
                    "mx": pa.array(
                        [int(k.max()) if len(k) else 0], pa.int64()
                    ),
                }
            )

        out = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(resolve, batch_format="pyarrow")
        )
        tabs = [t for t in map(ray.get, out.to_arrow_refs()) if t.num_rows]
        groups = sum(int(pc.sum(t["groups"]).as_py()) for t in tabs)
        viol = sum(int(pc.sum(t["viol"]).as_py()) for t in tabs)
        mx = max(int(pc.max(t["mx"]).as_py()) for t in tabs)
        rows.append((f"{table}.{lhs}->{rhs}", groups, viol, mx, viol == 0))
    rows.sort()
    return pa.table(
        {
            "fd": pa.array([r[0] for r in rows], pa.string()),
            "n_groups": pa.array([r[1] for r in rows], pa.int64()),
            "n_violating": pa.array([r[2] for r in rows], pa.int64()),
            "max_rhs_variety": pa.array([r[3] for r in rows], pa.int64()),
            "holds": pa.array([r[4] for r in rows], pa.bool_()),
        }
    )


def _fd_sql() -> str:
    selects = []
    for table, lhs, rhs in _FD_CANDIDATES:
        selects.append(
            f"""SELECT '{table}.{lhs}->{rhs}' AS fd,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE k > 1) AS BIGINT) AS n_violating,
       CAST(max(k) AS BIGINT) AS max_rhs_variety,
       count(*) FILTER (WHERE k > 1) = 0 AS holds
FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS k FROM {table} GROUP BY 1)"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY fd"


FD_VIOLATION_SQL = _fd_sql()


# ---------------------------------------------------------------------------
# Lorenz concentration table of user spend (decile cumulative shares)
# ---------------------------------------------------------------------------

def user_spend_lorenz(sf_dir: str):
    """Lorenz-curve table of user spend concentration: users ranked by
    total value cents ASC (user_id tie-break), cut into rank deciles
    d = (10·(rank−1)) // n, each row the decile's user count, spend,
    and the exact cumulative spend share (permille) — the
    concentration table behind "the top 10% of users drive X% of
    value" (user_type_gini's scalar, made inspectable).

    Scale shape: per-user spend routes through ``bucketed_agg``; the
    ranked decile cut runs on the driver over the entity-bounded
    per-user table (the heavy_hitter_coverage bound: users, never
    events; at 10^9 users the cut becomes a distributed sort + range
    partition — same math)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "cents": _to_cents(t["value"])}
        )

    per = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["user_id"],
        [("cents", "sum", "cents")],
    )
    tabs = [t for t in map(ray.get, per.to_arrow_refs()) if t.num_rows]
    u = pa.concat_tables(tabs).combine_chunks()
    uid = u["user_id"].to_numpy(zero_copy_only=False)
    cents = u["cents"].to_numpy(zero_copy_only=False)
    order = np.lexsort((uid, cents))  # cents ASC, user_id ASC
    cents = cents[order]
    n = len(cents)
    total = int(cents.sum())
    decile = (10 * np.arange(n)) // n
    rows = []
    cum = 0
    for d in range(10):
        sel = cents[decile == d]
        if len(sel) == 0:
            continue
        cum += int(sel.sum())
        rows.append((d, len(sel), int(sel.sum()), 1000 * cum // total))
    return pa.table(
        {
            "decile": pa.array([r[0] for r in rows], pa.int64()),
            "n_users": pa.array([r[1] for r in rows], pa.int64()),
            "spend_cents": pa.array([r[2] for r in rows], pa.int64()),
            "cum_share_permille": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


USER_SPEND_LORENZ_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
r AS (
  SELECT cents,
         (10 * (row_number() OVER (ORDER BY cents, user_id) - 1))
           // (SELECT count(*) FROM u) AS decile
  FROM u
),
g AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(cents) AS BIGINT) AS spend_cents
  FROM r GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile, n_users, spend_cents,
       CAST(1000 * sum(spend_cents) OVER (ORDER BY decile)
            // (SELECT sum(cents) FROM u) AS BIGINT) AS cum_share_permille
FROM g ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Repeat-customer rate per market segment with Wilson lower bound
# ---------------------------------------------------------------------------

def segment_repeat_wilson(sf_dir: str):
    """Repeat-customer rate per market segment (customers with >= 2
    orders among customers with >= 1) ranked by the Wilson score
    LOWER bound (z = 2, the brand_return_wilson convention with the
    one-step-corrected floor isqrt) — the loyalty metric that doesn't
    let a 12-customer segment outrank a 10k-customer one on luck.

    Scale shape: per-customer order counts via ``bucketed_agg``; the
    segment dim broadcasts once; (segment -> repeat, n) partials fold
    on the bounded segment domain."""
    import math

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    per_cust = bucketed_agg(
        _read(sf_dir, "orders", columns=["o_custkey"]),
        ["o_custkey"],
        [(None, "count", "k")],
    )
    dim = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(
                    sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
                ).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim_ref = state.broadcast(dim)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["c_mktsegment"])
        t = t.filter(pc.is_valid(t["c_mktsegment"]))
        rep = pc.cast(pc.greater_equal(t["k"], 2), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"seg": t["c_mktsegment"], "r": rep}), ["seg"]
        ).aggregate([("r", "sum"), ([], "count_all")])
        return pa.table(
            {
                "seg": g["seg"],
                "r": g["r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        per_cust.map_batches(partial, batch_format="pyarrow"), "seg", ["r", "n"]
    )
    rows = []
    for seg in acc:
        r, n = (int(v) for v in acc[seg])
        lb = (
            1_000_000 * (n * (r + 2) - 2 * math.isqrt((r * (n - r) + n) * n))
        ) // (n * (n + 4))
        rows.append((seg, n, r, lb))
    rows.sort(key=lambda x: (-x[3], x[0]))
    return pa.table(
        {
            "segment": pa.array([r[0] for r in rows], pa.string()),
            "n_customers": pa.array([r[1] for r in rows], pa.int64()),
            "n_repeat": pa.array([r[2] for r in rows], pa.int64()),
            "wilson_lb_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


SEGMENT_REPEAT_WILSON_SQL = """
WITH pc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
  FROM orders GROUP BY 1
),
g AS (
  SELECT c.c_mktsegment AS segment,
         CAST(sum(CASE WHEN pc.k >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS r,
         CAST(count(*) AS BIGINT) AS n
  FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey
  GROUP BY 1
),
q AS (
  SELECT segment, r, n,
         CAST((r * (n - r) + n) AS HUGEINT) * n AS arg,
         CAST(floor(sqrt(CAST(CAST((r * (n - r) + n) AS HUGEINT) * n
                              AS DOUBLE))) AS HUGEINT) AS s0
  FROM g
),
w AS (
  SELECT segment, r, n,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= arg THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > arg THEN 1 ELSE 0 END) AS rt
  FROM q
)
SELECT segment, n AS n_customers, r AS n_repeat,
       CAST((1000000::HUGEINT * (n::HUGEINT * (r + 2) - 2 * rt))
            // (n::HUGEINT * (n + 4)) AS BIGINT) AS wilson_lb_micro
FROM w
ORDER BY wilson_lb_micro DESC, segment
"""


# ---------------------------------------------------------------------------
# Pettitt rank-based changepoint test on the daily event-count series
# ---------------------------------------------------------------------------


def pettitt_changepoint(sf_dir: str):
    """Pettitt (1979) rank-based changepoint test over the daily
    event-count series — the nonparametric companion of
    events_top_changepoint (which assumes an SSE/mean-shift model):
    U_t = Σ_{i≤t} Σ_{j>t} sgn(x_i − x_j) via the recurrence
    U_t = U_{t−1} + V_t with V_t = Σ_j sgn(x_t − x_j); the statistic
    is K = max_{1≤t<n} |U_t| with the EARLIEST day on ties, and the
    0.05-level decision is taken by the exact integer inequality
    60000000·K² > 36888795·(n³ + n²)  (2·exp(−6K²/(n³+n²)) < 0.05 ⇔
    6K² > ln(40)·(n³+n²); ln(40)·10⁷ rounded UP so both engines share
    one integer constant and no transcendental is evaluated).

    Scale shape: one calendar-bounded daily fold (fold_partials), then
    the O(n²) sign matrix vectorized on the driver over the bounded
    series — the orders_mann_kendall shape."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = np.array([series[d] for d in days], dtype=np.int64)
    n = len(y)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([], pa.int64()),
                "k_stat": pa.array([], pa.int64()),
                "u_at_star": pa.array([], pa.int64()),
                "day_star": pa.array([], pa.timestamp("us")),
                "significant": pa.array([], pa.int64()),
            }
        )
    diff = np.sign(y[:, None] - y[None, :]).astype(np.int64)
    v = diff.sum(axis=1)
    u = np.cumsum(v)[:-1]  # U_t for t = 1..n-1
    star = int(np.argmax(np.abs(u)))  # earliest day on ties
    k = int(abs(u[star]))
    sig = 1 if 60_000_000 * k * k > 36_888_795 * (n**3 + n**2) else 0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "k_stat": pa.array([k], pa.int64()),
            "u_at_star": pa.array([int(u[star])], pa.int64()),
            "day_star": pa.array([days[star]], pa.timestamp("us")),
            "significant": pa.array([sig], pa.int64()),
        }
    )


PETTITT_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
v AS (
  SELECT a.day,
         CAST(sum(CASE WHEN a.n > b.n THEN 1
                       WHEN a.n < b.n THEN -1 ELSE 0 END) AS BIGINT) AS v
  FROM daily a CROSS JOIN daily b
  GROUP BY 1
),
u AS (
  SELECT day,
         CAST(sum(v) OVER (ORDER BY day) AS BIGINT) AS u,
         row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS m
  FROM v
),
k AS (
  SELECT day, u, m FROM u WHERE i < m
  ORDER BY abs(u) DESC, day LIMIT 1
)
SELECT CAST(m AS BIGINT) AS n_days,
       CAST(abs(u) AS BIGINT) AS k_stat,
       u AS u_at_star,
       day AS day_star,
       CAST(CASE WHEN 60000000::HUGEINT * u::HUGEINT * u::HUGEINT
                      > 36888795::HUGEINT
                        * (m::HUGEINT * m * m + m::HUGEINT * m)
                 THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM k
"""


# ---------------------------------------------------------------------------
# Simpson's-paradox audit: pooled vs per-segment covariance sign
# ---------------------------------------------------------------------------


def simpson_paradox_audit(sf_dir: str):
    """Simpson's-paradox audit of the account-balance → total-spend
    association: the SIGN of the exact covariance numerator
    S = n·Σxy − Σx·Σy (x = c_acctbal cents, y = the customer's total
    order spend cents, customers with ≥1 order) pooled across all
    customers vs within each market segment, plus the per-pair
    magnitude |S| // (n·(n−1)) and a flip flag marking segments whose
    association sign CONTRADICTS the pooled sign — the aggregation
    trap every cohorted metric dashboard needs to surface.

    Scale shape: per-customer spend via ``bucketed_agg``; the customer
    dim (acctbal, segment) broadcasts once; per-batch int64 partial
    sums (n, Σx, Σy, Σxy) fold on the 5-segment domain (at 10⁹
    customers the Σxy partial moves to decimal128 — same fold)."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"o_custkey": t["o_custkey"], "y": _to_cents(t["o_totalprice"])}
        )

    spend = bucketed_agg(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        ["o_custkey"],
        [("y", "sum", "y")],
    )
    dim_t = pa.concat_tables(
        [
            t
            for t in map(
                ray.get,
                _read(
                    sf_dir,
                    "customer",
                    columns=["c_custkey", "c_acctbal", "c_mktsegment"],
                ).to_arrow_refs(),
            )
            if t.num_rows
        ]
    ).combine_chunks()
    dim_t = pa.table(
        {
            "c_custkey": dim_t["c_custkey"],
            "x": _to_cents(dim_t["c_acctbal"]),
            "segment": dim_t["c_mktsegment"],
        }
    )
    dim_ref = state.broadcast(dim_t)

    def partial(t: pa.Table) -> pa.Table:
        d = state.cached_get(dim_ref)
        t = state.lookup_join(t, "o_custkey", d, "c_custkey", ["x", "segment"])
        t = t.filter(pc.is_valid(t["segment"]))  # inner-join semantics
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        yv = t["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "segment": t["segment"],
                    "x": x,
                    "y": yv,
                    "xy": x * yv,
                }
            ),
            ["segment"],
        ).aggregate([("x", "sum"), ("y", "sum"), ("xy", "sum"), ([], "count_all")])
        return pa.table(
            {
                "segment": g["segment"],
                "sx": g["x_sum"],
                "sy": g["y_sum"],
                "sxy": g["xy_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        spend.map_batches(partial, batch_format="pyarrow"),
        "segment",
        ["sx", "sy", "sxy", "n"],
    )
    per = {seg: tuple(int(v) for v in vals) for seg, vals in acc.items()}
    pooled = tuple(sum(v[i] for v in per.values()) for i in range(4))
    per["ALL"] = pooled

    def s_num(vals) -> int:
        sx, sy, sxy, n = vals
        return n * sxy - sx * sy

    psign = (lambda s: 1 if s > 0 else (-1 if s < 0 else 0))(s_num(pooled))
    rows = []
    for seg in sorted(per):
        sx, sy, sxy, n = per[seg]
        s = s_num(per[seg])
        sign = 1 if s > 0 else (-1 if s < 0 else 0)
        pp = abs(s) // (n * (n - 1)) if n > 1 else 0
        flip = 1 if (sign != 0 and psign != 0 and sign != psign) else 0
        rows.append((seg, n, sign, pp, flip))
    return pa.table(
        {
            "segment": pa.array([r[0] for r in rows], pa.string()),
            "n_cust": pa.array([r[1] for r in rows], pa.int64()),
            "cov_sign": pa.array([r[2] for r in rows], pa.int64()),
            "cov_abs_pp": pa.array([r[3] for r in rows], pa.int64()),
            "flip": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SIMPSON_PARADOX_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_mktsegment AS segment,
         CAST(round(c.c_acctbal * 100.0) AS BIGINT) AS x, s.y
  FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
),
g AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM j GROUP BY 1
  UNION ALL
  SELECT 'ALL', CAST(count(*) AS BIGINT),
         CAST(sum(x) AS HUGEINT), CAST(sum(y) AS HUGEINT),
         sum(CAST(x AS HUGEINT) * y)
  FROM j
),
s AS (
  SELECT segment, n, CAST(n AS HUGEINT) * sxy - sx * sy AS cov_num FROM g
),
p AS (
  SELECT CASE WHEN cov_num > 0 THEN 1
              WHEN cov_num < 0 THEN -1 ELSE 0 END AS psign
  FROM s WHERE segment = 'ALL'
)
SELECT segment, n AS n_cust,
       CAST(CASE WHEN cov_num > 0 THEN 1
                 WHEN cov_num < 0 THEN -1 ELSE 0 END AS BIGINT) AS cov_sign,
       CAST(CASE WHEN n > 1
                 THEN abs(cov_num) // (CAST(n AS HUGEINT) * (n - 1))
                 ELSE 0 END AS BIGINT) AS cov_abs_pp,
       CAST(CASE WHEN cov_num <> 0 AND (SELECT psign FROM p) <> 0
                 AND (CASE WHEN cov_num > 0 THEN 1 ELSE -1 END)
                     <> (SELECT psign FROM p)
                 THEN 1 ELSE 0 END AS BIGINT) AS flip
FROM s ORDER BY segment
"""


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing of daily order revenue (integer fixed-point)
# ---------------------------------------------------------------------------


def holt_linear_forecast(sf_dir: str):
    """Holt double-exponential smoothing of the daily order-revenue
    series in exact integer fixed-point (milli-cents; α = 1/5,
    β = 1/10 as floor-divided rationals): l_t = ⌊(2·1000·y_t +
    8·(l+b)) / 10⌋, b_t = ⌊((l_t − l) + 9·b) / 10⌋, initialised
    l_1 = 1000·y_1, b_1 = 1000·(y_2 − y_1) — the trend-aware
    companion of events_ewma (level only) and q6_forecast_revenue.
    Emits the final state, the one-step-ahead sum of absolute errors
    (the in-sample fit the α/β choice is judged by), and the h = 1
    and h = 7 linear forecasts l_n + h·b_n.  Every division is FLOOR
    division on both engines (b_t can be negative; the mann_kendall
    convention).

    Scale shape: one calendar-bounded daily fold (fold_partials); the
    O(n) recurrence runs on the driver over the bounded series — the
    recursion is inherently sequential, so it belongs on the bounded
    day domain, never on rows."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64())
        )
        g = pa.TableGroupBy(
            pa.table({"day": day, "cents": _to_cents(t["o_totalprice"])}), ["day"]
        ).aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "cents"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([], pa.int64()),
                "level_milli": pa.array([], pa.int64()),
                "trend_milli": pa.array([], pa.int64()),
                "sae_milli": pa.array([], pa.int64()),
                "f1_milli": pa.array([], pa.int64()),
                "f7_milli": pa.array([], pa.int64()),
            }
        )
    lev = 1000 * y[0]
    tr = 1000 * (y[1] - y[0])
    sae = 0
    for t in range(1, n):
        pred = lev + tr
        sae += abs(1000 * y[t] - pred)
        new_lev = (2000 * y[t] + 8 * pred) // 10
        tr = ((new_lev - lev) + 9 * tr) // 10
        lev = new_lev
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "level_milli": pa.array([lev], pa.int64()),
            "trend_milli": pa.array([tr], pa.int64()),
            "sae_milli": pa.array([sae], pa.int64()),
            "f1_milli": pa.array([lev + tr], pa.int64()),
            "f7_milli": pa.array([lev + 7 * tr], pa.int64()),
        }
    )


HOLT_LINEAR_FORECAST_SQL = """
WITH RECURSIVE d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
idx AS (
  SELECT row_number() OVER (ORDER BY day) AS i, y FROM d
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
r AS (
  SELECT CAST(2 AS BIGINT) AS i,
         1000 * a.y AS lev,
         1000 * (b.y - a.y) AS tr,
         CAST(0 AS BIGINT) AS sae
  FROM idx a, idx b WHERE a.i = 1 AND b.i = 2
  UNION ALL
  SELECT r.i + 1,
         -- new_lev = floor((2000*y + 8*(lev+tr)) / 10)
         (v.num - ((v.num % 10 + 10) % 10)) // 10,
         -- tr' = floor(((new_lev - lev) + 9*tr) / 10)
         (((v.num - ((v.num % 10 + 10) % 10)) // 10 - r.lev) + 9 * r.tr
          - (((((v.num - ((v.num % 10 + 10) % 10)) // 10 - r.lev) + 9 * r.tr)
              % 10 + 10) % 10)) // 10,
         r.sae + abs(1000 * x.y - (r.lev + r.tr))
  FROM r
  JOIN idx x ON x.i = r.i
  CROSS JOIN LATERAL (SELECT 2000 * x.y + 8 * (r.lev + r.tr) AS num) v
  WHERE r.i <= (SELECT n FROM n)
),
fin AS (
  SELECT lev, tr, sae FROM r ORDER BY i DESC LIMIT 1
)
SELECT (SELECT n FROM n) AS n_days,
       lev AS level_milli, tr AS trend_milli, sae AS sae_milli,
       lev + tr AS f1_milli, lev + 7 * tr AS f7_milli
FROM fin
"""


# ---------------------------------------------------------------------------
# L-moment profile (Hosking 1990) of event values per type
# ---------------------------------------------------------------------------


def l_moments_profile(sf_dir: str):
    """L-moment profile of the event-value distribution per type:
    λ1 (L-location), λ2 (L-scale), and the dimensionless L-skewness
    τ3 = λ3/λ2 and L-kurtosis τ4 = λ4/λ2 (Hosking 1990) — the
    robust alternative to moment skew/kurtosis (value_winsorized_stats
    family): L-moments are LINEAR in the order statistics, so every
    quantity here is an exact integer rational of the rank-weighted
    sums S_k = Σ (i−1)(i−2)…(i−k) x_(i), reported in micro units via
    portable floor division.

    Scale shape: NO per-group sort — ranks come from the (type,
    value-cents) HISTOGRAM: within an equal-value run the rank weights
    sum in closed form (Σ j, Σ j(j−1) = J(J−1)(J−2)/3, Σ j(j−1)(j−2)
    = J(J−1)(J−2)(J−3)/4 telescoped over cumulative counts), so one
    ``bucketed_agg`` histogram fold replaces the all-data sort — the
    hour_value_kendall 'pair counts without pairs' trick applied to
    order statistics.  Driver math in unbounded Python ints (S3 ~ n³·x
    exceeds int64; SQL side uses HUGEINT)."""

    from document_extractor_ray.functions.bucketing import bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": _to_cents(t["value"]),
            }
        )

    hist_ds = bucketed_agg(
        _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        ["event_type", "cents"],
        [(None, "count", "m")],
    )
    hist = fold_partials(hist_ds, ["event_type", "cents"], "m", max_keys=500_000)

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    def g3(j: int) -> int:
        return j * (j - 1) * (j - 2) // 3

    def g4(j: int) -> int:
        return j * (j - 1) * (j - 2) * (j - 3) // 4

    types = sorted({et for et, _ in hist})
    rows = []
    for et in types:
        blocks = sorted((c, int(hist[(et, c)])) for _, c in hist if _ == et)
        n = sum(m for _, m in blocks)
        if n < 4:
            continue
        s0 = s1 = s2 = s3 = 0
        c = 0  # cumulative count before this value block
        for x, m in blocks:
            x = int(x)
            s0 += m * x
            s1 += x * (m * c + m * (m - 1) // 2)
            s2 += x * (g3(c + m) - g3(c))
            s3 += x * (g4(c + m) - g4(c))
            c += m
        l2num = 2 * s1 - (n - 1) * s0
        l3num = 6 * s2 - 6 * (n - 2) * s1 + (n - 1) * (n - 2) * s0
        l4num = (
            20 * s3
            - 30 * (n - 3) * s2
            + 12 * (n - 2) * (n - 3) * s1
            - (n - 1) * (n - 2) * (n - 3) * s0
        )
        rows.append(
            (
                et,
                n,
                fdiv(1_000_000 * s0, n),
                fdiv(1_000_000 * l2num, n * (n - 1)),
                # l2num == 0 (all values in the group identical) makes the
                # tau ratios 0/0 — emit 0 on both engines (ADVICE r4).
                fdiv(1_000_000 * l3num, l2num * (n - 2)) if l2num > 0 else 0,
                fdiv(1_000_000 * l4num, l2num * (n - 2) * (n - 3))
                if l2num > 0
                else 0,
            )
        )
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "l1_micro": pa.array([r[2] for r in rows], pa.int64()),
            "l2_micro": pa.array([r[3] for r in rows], pa.int64()),
            "tau3_micro": pa.array([r[4] for r in rows], pa.int64()),
            "tau4_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


L_MOMENTS_PROFILE_SQL = """
WITH v AS (
  SELECT event_type,
         CAST(round(value * 100.0) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS i
  FROM events
),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(x AS HUGEINT)) AS s0,
         sum(CAST(i AS HUGEINT) * x) AS s1,
         sum(CAST(i AS HUGEINT) * (i - 1) * x) AS s2,
         sum(CAST(i AS HUGEINT) * (i - 1) * (i - 2) * x) AS s3
  FROM v GROUP BY 1
),
lm AS (
  SELECT event_type, n, s0,
         2 * s1 - (n - 1) * s0 AS l2num,
         6 * s2 - 6 * (n - 2) * s1
           + CAST(n - 1 AS HUGEINT) * (n - 2) * s0 AS l3num,
         20 * s3 - 30 * (n - 3) * s2
           + 12 * CAST(n - 2 AS HUGEINT) * (n - 3) * s1
           - CAST(n - 1 AS HUGEINT) * (n - 2) * (n - 3) * s0 AS l4num
  FROM g WHERE n >= 4
)
SELECT event_type, n,
       CAST((1000000 * s0 - ((1000000 * s0 % n + n) % n)) // n
            AS BIGINT) AS l1_micro,
       CAST((1000000 * l2num
             - ((1000000 * l2num % (CAST(n AS HUGEINT) * (n - 1))
                 + CAST(n AS HUGEINT) * (n - 1))
                % (CAST(n AS HUGEINT) * (n - 1))))
            // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) AS l2_micro,
       CAST(CASE WHEN l2num > 0 THEN
            (1000000 * l3num
             - ((1000000 * l3num % (l2num * (n - 2)) + l2num * (n - 2))
                % (l2num * (n - 2))))
            // (l2num * (n - 2)) ELSE 0 END AS BIGINT) AS tau3_micro,
       CAST(CASE WHEN l2num > 0 THEN
            (1000000 * l4num
             - ((1000000 * l4num % (l2num * (n - 2) * (n - 3))
                 + l2num * (n - 2) * (n - 3))
                % (l2num * (n - 2) * (n - 3))))
            // (l2num * (n - 2) * (n - 3)) ELSE 0 END AS BIGINT) AS tau4_micro
FROM lm ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test: finished-order rate across order years
# ---------------------------------------------------------------------------


def cochran_armitage_trend(sf_dir: str):
    """Cochran–Armitage test for TREND in a binary rate across ordered
    groups — here the rate of o_orderstatus = 'F' across order years
    with equally-spaced scores w = 0, 1, … (the ordered-alternative
    companion of the unordered value_type_chi2 / mktseg contingency
    family).  Everything is an exact integer: T·N = Σ w·(r_i·N − n_i·R),
    Var·N³ = R·(N−R)·(N·Σw²n − (Σwn)²), and the squared z-score in
    micro units z² = T²·N / Var·N³-normalised via one portable floor
    division (Python ints / HUGEINT — Var·N³ exceeds int64 beyond
    sf0.01, so only the bounded z² crosses the wire).

    Scale shape: one year-bounded (yr → n, r) fold; the weighted sums
    run on the driver over the bounded year series."""
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        yr = pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us")))
        g = pa.TableGroupBy(
            pa.table(
                {
                    "yr": pc.cast(yr, pa.int64()),
                    "r": pc.cast(pc.equal(t["o_orderstatus"], "F"), pa.int64()),
                }
            ),
            ["yr"],
        ).aggregate([("r", "sum"), ([], "count_all")])
        return pa.table(
            {
                "yr": g["yr"],
                "r": g["r_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "yr", ["r", "n"]
    )
    years = sorted(acc)
    k = len(years)
    nn = sum(int(acc[y][1]) for y in years)
    rr = sum(int(acc[y][0]) for y in years)
    t_n = sum(
        w * (int(acc[y][0]) * nn - int(acc[y][1]) * rr)
        for w, y in enumerate(years)
    )
    sw2n = sum(w * w * int(acc[y][1]) for w, y in enumerate(years))
    swn = sum(w * int(acc[y][1]) for w, y in enumerate(years))
    var_n3 = rr * (nn - rr) * (nn * sw2n - swn * swn)
    z2_micro = (1_000_000 * t_n * t_n * nn) // var_n3 if var_n3 > 0 else 0
    return pa.table(
        {
            "n_groups": pa.array([k], pa.int64()),
            "n_total": pa.array([nn], pa.int64()),
            "r_total": pa.array([rr], pa.int64()),
            "t_n": pa.array([t_n], pa.int64()),
            "z2_micro": pa.array([z2_micro], pa.int64()),
        }
    )


COCHRAN_ARMITAGE_SQL = """
WITH g AS (
  SELECT year(o_orderdate) AS yr, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS r
  FROM orders GROUP BY 1
),
w AS (SELECT yr, n, r, row_number() OVER (ORDER BY yr) - 1 AS w FROM g),
tot AS (
  SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(r) AS HUGEINT) AS rr,
         CAST(count(*) AS BIGINT) AS k
  FROM w
),
st AS (
  SELECT sum(CAST(w AS HUGEINT)
             * (r * (SELECT nn FROM tot) - n * (SELECT rr FROM tot))) AS t_n,
         sum(CAST(w AS HUGEINT) * w * n) AS sw2n,
         sum(CAST(w AS HUGEINT) * n) AS swn
  FROM w
),
v AS (
  SELECT t_n,
         (SELECT rr FROM tot) * ((SELECT nn FROM tot) - (SELECT rr FROM tot))
           * ((SELECT nn FROM tot) * sw2n - swn * swn) AS var_n3
  FROM st
)
SELECT (SELECT k FROM tot) AS n_groups,
       CAST((SELECT nn FROM tot) AS BIGINT) AS n_total,
       CAST((SELECT rr FROM tot) AS BIGINT) AS r_total,
       CAST(t_n AS BIGINT) AS t_n,
       CAST(CASE WHEN var_n3 > 0
                 THEN (1000000 * t_n * t_n * (SELECT nn FROM tot)) // var_n3
                 ELSE 0 END AS BIGINT) AS z2_micro
FROM v
"""


# ---------------------------------------------------------------------------
# Bloom-filter size sweep: measured FPP on the order-customer key set
# ---------------------------------------------------------------------------


def bloom_fpp_sweep(sf_dir: str):
    """Measured Bloom-filter false-positive sweep: insert the distinct
    order custkeys into k=2 multiplicative-hash Bloom filters of m ∈
    {4096, 16384, 65536} bits (h = x·odd mod 2³² mod m, Knuth
    constants) and probe with one deterministic UNSEEN key per
    customer (c_custkey·1000003 + 7, filtered against the member set —
    every customer has an order in this data, so the natural anti-join
    probe population is empty) — the sizing table behind
    lineitem_semi_bloom's fixed filter: which m buys which measured
    FPP on THIS key distribution (measured, not the e^{-kn/m}
    formula — no transcendental crosses the wire).

    Scale shape: the filter state is m-BOUNDED — per-batch partials
    emit distinct (m, bit-position) rows (≤ 86k keys total) and the
    probe pass reads the broadcast member-key array (bounded by the
    customer dimension, the customers_without_orders convention);
    probe false-positive counts fold per m."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ms = [4096, 16384, 65536]
    A1, A2, M32 = 2654435761, 2246822507, 1 << 32

    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def pos_partial(t: pa.Table) -> pa.Table:
        x = pc.unique(t["o_custkey"]).to_numpy(zero_copy_only=False).astype(np.uint64)
        mm, pp = [], []
        for m in ms:
            for a in (A1, A2):
                pos = np.unique(((x * a) & (M32 - 1)) % m)
                mm.append(np.full(len(pos), m, np.int64))
                pp.append(pos.astype(np.int64))
        return pa.table(
            {"m": pa.array(np.concatenate(mm)), "pos": pa.array(np.concatenate(pp))}
        )

    bits_tbl = fold_partials(
        orders.map_batches(pos_partial, batch_format="pyarrow"),
        ["m", "pos"],
        [],
        max_keys=200_000,
    )
    bit_sets = {m: set() for m in ms}
    for m, pos in bits_tbl:
        bit_sets[int(m)].add(int(pos))

    # distinct member keys (probe-population filter; customer-bounded)
    def key_partial(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.unique(t["o_custkey"])})

    distinct = bucketed_agg(
        orders.map_batches(key_partial, batch_format="pyarrow"),
        ["o_custkey"],
        [(None, "count", "_n")],
    )
    keys = pa.concat_tables(
        [t for t in map(ray.get, distinct.to_arrow_refs()) if t.num_rows]
    )["o_custkey"].combine_chunks()
    n_members = len(keys)
    member_ref = state.broadcast(keys)
    bits_ref = state.broadcast({m: np.array(sorted(s), np.int64) for m, s in bit_sets.items()})

    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def probe_partial(t: pa.Table) -> pa.Table:
        members = state.cached_get(member_ref)
        barr = state.cached_get(bits_ref)
        shifted = pc.add(
            pc.multiply(t["c_custkey"], pa.scalar(1_000_003, pa.int64())),
            pa.scalar(7, pa.int64()),
        )
        is_member = pc.is_in(shifted, value_set=members)
        x = (
            shifted.filter(pc.invert(is_member))
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        rows_m, rows_p, rows_f = [], [], []
        for m in ms:
            p1 = ((x * A1) & (M32 - 1)) % m
            p2 = ((x * A2) & (M32 - 1)) % m
            hit = np.isin(p1.astype(np.int64), barr[m]) & np.isin(
                p2.astype(np.int64), barr[m]
            )
            rows_m.append(m)
            rows_p.append(len(x))
            rows_f.append(int(hit.sum()))
        return pa.table(
            {
                "m": pa.array(rows_m, pa.int64()),
                "probes": pa.array(rows_p, pa.int64()),
                "fp": pa.array(rows_f, pa.int64()),
            }
        )

    acc = fold_partials(
        cust.map_batches(probe_partial, batch_format="pyarrow"), "m", ["probes", "fp"]
    )
    rows = []
    for m in ms:
        probes, fp = (int(v) for v in acc[m])
        rows.append(
            (
                m,
                n_members,
                len(bit_sets[m]),
                probes,
                fp,
                1_000_000 * fp // probes if probes else 0,
            )
        )
    return pa.table(
        {
            "m_bits": pa.array([r[0] for r in rows], pa.int64()),
            "n_members": pa.array([r[1] for r in rows], pa.int64()),
            "bits_set": pa.array([r[2] for r in rows], pa.int64()),
            "n_probes": pa.array([r[3] for r in rows], pa.int64()),
            "n_false_pos": pa.array([r[4] for r in rows], pa.int64()),
            "fpp_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


BLOOM_FPP_SWEEP_SQL = """
WITH members AS (SELECT DISTINCT o_custkey AS x FROM orders),
probes AS (
  SELECT c_custkey * 1000003 + 7 AS x FROM customer
  WHERE c_custkey * 1000003 + 7 NOT IN (SELECT x FROM members)
),
ms AS (SELECT CAST(unnest([4096, 16384, 65536]) AS BIGINT) AS m),
bits AS (
  SELECT m, pos FROM (
    SELECT ms.m AS m, (x * 2654435761) % 4294967296 % ms.m AS pos
    FROM members CROSS JOIN ms
    UNION
    SELECT ms.m, (x * 2246822507) % 4294967296 % ms.m
    FROM members CROSS JOIN ms
  )
),
fp AS (
  SELECT ms.m AS m, CAST(count(*) AS BIGINT) AS n_probes,
         CAST(sum(CASE WHEN b1.pos IS NOT NULL AND b2.pos IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
  FROM probes CROSS JOIN ms
  LEFT JOIN bits b1 ON b1.m = ms.m
        AND b1.pos = (probes.x * 2654435761) % 4294967296 % ms.m
  LEFT JOIN bits b2 ON b2.m = ms.m
        AND b2.pos = (probes.x * 2246822507) % 4294967296 % ms.m
  GROUP BY 1
)
SELECT m AS m_bits,
       (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
       (SELECT CAST(count(*) AS BIGINT) FROM bits b WHERE b.m = fp.m)
         AS bits_set,
       n_probes, n_fp AS n_false_pos,
       CAST(CASE WHEN n_probes > 0 THEN 1000000 * n_fp // n_probes
                 ELSE 0 END AS BIGINT) AS fpp_micro
FROM fp ORDER BY m_bits
"""


# ---------------------------------------------------------------------------
# Haar wavelet energy decomposition of the daily revenue series
# ---------------------------------------------------------------------------


def haar_energy_daily(sf_dir: str):
    """Unnormalized Haar wavelet detail-energy spectrum of the daily
    order-revenue series: truncate to the first 2^L days, and for each
    level ℓ (block of 2^ℓ days) the detail coefficient of block j is
    (first-half sum − second-half sum) — computed straight from PREFIX
    SUMS, no pyramid recursion — with per-level energy Σ d² reported
    as the integer permille share of total detail energy.  Level 1 =
    day-to-day noise, level L = half-series-vs-half-series shift: the
    multi-resolution view next to events_trend_slope (one slope) and
    the changepoint family (one split).

    Scale shape: one calendar-bounded daily fold; prefix sums and the
    O(n log n) coefficient grid run on the driver over the bounded
    series (squares exceed int64 — Python ints here, HUGEINT in SQL)."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64())
        )
        g = pa.TableGroupBy(
            pa.table({"day": day, "cents": _to_cents(t["o_totalprice"])}), ["day"]
        ).aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "cents"
    )
    days = sorted(series)
    n = len(days)
    if n < 2:
        return pa.table(
            {
                "level": pa.array([], pa.int64()),
                "block_days": pa.array([], pa.int64()),
                "n_coeffs": pa.array([], pa.int64()),
                "energy_permille": pa.array([], pa.int64()),
            }
        )
    lmax = n.bit_length() - 1
    use = [int(series[d]) for d in days[: 1 << lmax]]
    cum = [0]
    for v in use:
        cum.append(cum[-1] + v)
    energies = []
    for lv in range(1, lmax + 1):
        block, half = 1 << lv, 1 << (lv - 1)
        e = 0
        for j in range(len(use) // block):
            s = j * block
            a = cum[s + half] - cum[s]
            b = cum[s + block] - cum[s + half]
            e += (a - b) ** 2
        energies.append((lv, block, len(use) // block, e))
    te = sum(e for _, _, _, e in energies)
    return pa.table(
        {
            "level": pa.array([r[0] for r in energies], pa.int64()),
            "block_days": pa.array([r[1] for r in energies], pa.int64()),
            "n_coeffs": pa.array([r[2] for r in energies], pa.int64()),
            "energy_permille": pa.array(
                [1000 * r[3] // te if te else 0 for r in energies], pa.int64()
            ),
        }
    )


HAAR_ENERGY_SQL = """
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
o AS (
  SELECT y, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS n
  FROM d
),
lm AS (SELECT CAST(floor(log2(n)) AS BIGINT) AS lmax FROM o LIMIT 1),
u AS (SELECT y, i FROM o WHERE i < (1 << (SELECT lmax FROM lm))),
cum AS (SELECT i, sum(y) OVER (ORDER BY i) AS c FROM u),
lv AS (
  SELECT unnest(generate_series(1, (SELECT lmax FROM lm))) AS l
),
pos AS (
  SELECT l,
         unnest(generate_series(
           0, (1 << ((SELECT lmax FROM lm) - l)) - 1)) AS j
  FROM lv
),
coeff AS (
  SELECT p.l,
         (coalesce(ch.c, 0) - coalesce(cs.c, 0))
           - (ce.c - coalesce(ch.c, 0)) AS diff
  FROM pos p
  LEFT JOIN cum cs ON cs.i = p.j * (1 << p.l) - 1
  JOIN cum ch ON ch.i = p.j * (1 << p.l) + (1 << (p.l - 1)) - 1
  JOIN cum ce ON ce.i = (p.j + 1) * (1 << p.l) - 1
),
energy AS (
  SELECT l, CAST(count(*) AS BIGINT) AS n_coeffs,
         sum(CAST(diff AS HUGEINT) * diff) AS e
  FROM coeff GROUP BY 1
),
tot AS (SELECT sum(e) AS te FROM energy)
SELECT CAST(l AS BIGINT) AS level,
       CAST(1 << l AS BIGINT) AS block_days,
       n_coeffs,
       CAST(CASE WHEN (SELECT te FROM tot) > 0
                 THEN 1000 * e // (SELECT te FROM tot) ELSE 0 END
            AS BIGINT) AS energy_permille
FROM energy ORDER BY level
"""


# ---------------------------------------------------------------------------
# Chapman capture–recapture estimate of the distinct-user population
# ---------------------------------------------------------------------------


def capture_recapture_users(sf_dir: str):
    """Chapman capture–recapture estimate of the distinct-user
    population from two event-time windows (days ≤ calendar midpoint
    vs after): N̂ = ⌊(n1+1)(n2+1)/(m+1)⌋ − 1 with the Seber variance
    floor — the "how many users exist that we never logged" estimator
    (same math a corpus-overlap or dedup-coverage estimate uses), made
    auditable here because the TRUE population is observable:
    coverage_permille = 1000·N̂ // N_true.

    Scale shape: per-user window flags reduce through ``bucketed_agg``
    (max of two 0/1 flags per user — one bounded-width shuffle), then
    per-block count partials fold to four scalars; no user list ever
    lands on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    # calendar midpoint: fold min/max day first (cheap, bounded)
    def day_partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "lo": pa.array([pc.min(day).as_py()], pa.int64()),
                "hi": pa.array([pc.max(day).as_py()], pa.int64()),
            }
        )

    span = [
        t
        for t in map(
            ray.get,
            ds.map_batches(day_partial, batch_format="pyarrow").to_arrow_refs(),
        )
        if t.num_rows
    ]
    lo = min(int(pc.min(t["lo"]).as_py()) for t in span)
    hi = max(int(pc.max(t["hi"]).as_py()) for t in span)
    mid = (lo + hi) // 2

    def flag_partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        in_a = pc.cast(pc.less_equal(day, mid), pa.int64())
        g = pa.TableGroupBy(
            pa.table(
                {
                    "user_id": t["user_id"],
                    "a": in_a,
                    "b": pc.subtract(pa.scalar(1, pa.int64()), in_a),
                }
            ),
            ["user_id"],
        ).aggregate([("a", "max"), ("b", "max")])
        return pa.table(
            {"user_id": g["user_id"], "a": g["a_max"], "b": g["b_max"]}
        )

    per_user = bucketed_agg(
        ds.map_batches(flag_partial, batch_format="pyarrow"),
        ["user_id"],
        [("a", "max", "a"), ("b", "max", "b")],
    )

    def count_partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n1": pa.array([int(a.sum())], pa.int64()),
                "n2": pa.array([int(b.sum())], pa.int64()),
                "m": pa.array([int((a & b).sum())], pa.int64()),
                "tot": pa.array([t.num_rows], pa.int64()),
            }
        )

    acc = fold_partials(
        per_user.map_batches(count_partial, batch_format="pyarrow"),
        "k",
        ["n1", "n2", "m", "tot"],
    )
    n1, n2, m, tot = (int(v) for v in acc[0])
    est = (n1 + 1) * (n2 + 1) // (m + 1) - 1
    var_fl = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)) // (
        (m + 1) * (m + 1) * (m + 2)
    )
    return pa.table(
        {
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "m_both": pa.array([m], pa.int64()),
            "chapman_est": pa.array([est], pa.int64()),
            "var_floor": pa.array([var_fl], pa.int64()),
            "n_true": pa.array([tot], pa.int64()),
            "coverage_permille": pa.array([1000 * est // tot], pa.int64()),
        }
    )


CAPTURE_RECAPTURE_SQL = """
WITH d AS (
  SELECT user_id, epoch_us(date_trunc('day', ts)) // 86400000000 AS day
  FROM events
),
mid AS (SELECT (min(day) + max(day)) // 2 AS m FROM d),
u AS (
  SELECT user_id,
         max(CASE WHEN day <= (SELECT m FROM mid) THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN day > (SELECT m FROM mid) THEN 1 ELSE 0 END) AS b
  FROM d GROUP BY 1
),
c AS (
  SELECT CAST(sum(a) AS BIGINT) AS n1, CAST(sum(b) AS BIGINT) AS n2,
         CAST(sum(a * b) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS tot
  FROM u
)
SELECT n1, n2, m AS m_both,
       CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman_est,
       CAST(((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m))
            // ((m + 1) * (m + 1) * (m + 2)) AS BIGINT) AS var_floor,
       tot AS n_true,
       CAST(1000 * ((n1 + 1) * (n2 + 1) // (m + 1) - 1) // tot AS BIGINT)
         AS coverage_permille
FROM c
"""


# ---------------------------------------------------------------------------
# Dominant-period detection via integer autocovariance argmax
# ---------------------------------------------------------------------------


def acf_peak_period(sf_dir: str):
    """Periodicity scan of the daily event-count series: for every lag
    k = 2..14 the exact integer autocovariance numerator
    c_k = Σ_t (n·y_t − S)(n·y_{t+k} − S) over the n−k overlapping
    pairs (S = Σy — global centering scaled by n so no division ever
    happens), with the dominant period flagged by the cross-multiplied
    per-pair comparison c_k·(n−k') > c_k'·(n−k) (earliest lag on
    ties) — the "is there a weekly cycle" detector next to
    orders_dow_profile's assumed-7 pivot.

    Scale shape: one calendar-bounded daily fold; the lag scan is a
    handful of vectorized dot products on the driver over the bounded
    series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    s = sum(y)
    z = [n * v - s for v in y]  # scaled centered series (exact ints)
    lags = [k for k in range(2, 15) if k < n]
    rows = []
    for k in lags:
        c = sum(z[t] * z[t + k] for t in range(n - k))
        rows.append([k, n - k, c, 0])
    # cross-multiplied argmax: compare c_k/(n-k) without division
    best = 0
    for i in range(1, len(rows)):
        ki, ni, ci, _ = rows[i]
        kb, nb, cb, _ = rows[best]
        if ci * nb > cb * ni:
            best = i
    rows[best][3] = 1
    return pa.table(
        {
            "lag": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "acov_num": pa.array([r[2] for r in rows], pa.int64()),
            "is_peak": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ACF_PEAK_PERIOD_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
o AS (
  SELECT y, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS n, sum(y) OVER () AS s
  FROM daily
),
z AS (SELECT i, n * y - s AS z, n FROM o),
lag AS (SELECT unnest(generate_series(2, 14)) AS k),
c AS (
  SELECT lag.k AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.z * b.z) AS BIGINT) AS acov_num
  FROM lag
  JOIN z a ON TRUE
  JOIN z b ON b.i = a.i + lag.k
  WHERE lag.k < (SELECT max(n) FROM o)
  GROUP BY 1
),
best AS (
  SELECT lag FROM c a
  WHERE NOT EXISTS (
    SELECT 1 FROM c b
    WHERE b.acov_num * a.n_pairs > a.acov_num * b.n_pairs
       OR (b.acov_num * a.n_pairs = a.acov_num * b.n_pairs
           AND b.lag < a.lag)
  )
)
SELECT lag, n_pairs, acov_num,
       CAST(CASE WHEN lag = (SELECT lag FROM best) THEN 1 ELSE 0 END
            AS BIGINT) AS is_peak
FROM c ORDER BY lag
"""


# ---------------------------------------------------------------------------
# Wald SPRT walked over the day-ordered event stream
# ---------------------------------------------------------------------------


def sprt_daily_decision(sf_dir: str):
    """Wald sequential probability ratio test on the day-ordered event
    stream: H0: P(value ≥ 30) = 1/2 vs H1: p = 11/20, α = β = 0.05 —
    the sequential A/B decision rule that stops INGESTING data the day
    the evidence suffices, in the exact integer-log convention: the
    per-day LLR increment is k·(L(11)−L(10)) + (n−k)·(L(9)−L(10))
    micro-nats (L(v) = round(ln(v)·1e6), all on INTEGER arguments),
    thresholds ±L(19) = ±ln(0.95/0.05).  Emits the decision, the
    crossing day (earliest), and the final/crossing LLR.

    Scale shape: one calendar-bounded (day → n, k) fold; the
    sequential walk is a cumulative sum over the bounded day series on
    the driver."""
    import math

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        k = pc.cast(pc.greater_equal(t["value"], 30.0), pa.int64())
        g = pa.TableGroupBy(pa.table({"day": day, "k": k}), ["day"]).aggregate(
            [("k", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "day": g["day"],
                "k": g["k_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", ["k", "n"]
    )

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    up, dn, thr = L(11) - L(10), L(9) - L(10), L(19)
    days = sorted(acc)
    cum = 0
    decision, dec_day, dec_idx = "continue", days[-1], len(days)
    n_succ = n_trials = 0
    llr_at_decision = None
    for i, d in enumerate(days):
        k, n = (int(v) for v in acc[d])
        cum += k * up + (n - k) * dn
        n_succ += k
        n_trials += n
        if llr_at_decision is None and cum >= thr:
            decision, dec_day, dec_idx, llr_at_decision = "accept_h1", d, i + 1, cum
        elif llr_at_decision is None and cum <= -thr:
            decision, dec_day, dec_idx, llr_at_decision = "accept_h0", d, i + 1, cum
    if llr_at_decision is None:
        llr_at_decision = cum
    return pa.table(
        {
            "n_days": pa.array([len(days)], pa.int64()),
            "n_trials": pa.array([n_trials], pa.int64()),
            "n_success": pa.array([n_succ], pa.int64()),
            "decision": pa.array([decision], pa.string()),
            "decision_day": pa.array([dec_day], pa.timestamp("us")),
            "days_to_decision": pa.array([dec_idx], pa.int64()),
            "llr_micro": pa.array([llr_at_decision], pa.int64()),
        }
    )


SPRT_DAILY_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(sum(CASE WHEN value >= 30.0 THEN 1 ELSE 0 END) AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
consts AS (
  SELECT CAST(round(ln(11) * 1000000) AS BIGINT)
           - CAST(round(ln(10) * 1000000) AS BIGINT) AS up,
         CAST(round(ln(9) * 1000000) AS BIGINT)
           - CAST(round(ln(10) * 1000000) AS BIGINT) AS dn,
         CAST(round(ln(19) * 1000000) AS BIGINT) AS thr
),
walk AS (
  SELECT day, k, n,
         sum(k * (SELECT up FROM consts)
             + (n - k) * (SELECT dn FROM consts)) OVER (ORDER BY day) AS cum,
         row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS m
  FROM daily
),
crossing AS (
  SELECT day, cum, i,
         CASE WHEN cum >= (SELECT thr FROM consts) THEN 'accept_h1'
              ELSE 'accept_h0' END AS decision
  FROM walk
  WHERE abs(cum) >= (SELECT thr FROM consts)
  ORDER BY i LIMIT 1
),
fallback AS (
  SELECT day, cum, i, 'continue' AS decision
  FROM walk ORDER BY i DESC LIMIT 1
),
pick AS (
  SELECT * FROM crossing
  UNION ALL
  SELECT * FROM fallback WHERE NOT EXISTS (SELECT 1 FROM crossing)
)
SELECT (SELECT CAST(max(m) AS BIGINT) FROM walk) AS n_days,
       (SELECT CAST(sum(n) AS BIGINT) FROM daily) AS n_trials,
       (SELECT CAST(sum(k) AS BIGINT) FROM daily) AS n_success,
       decision,
       day AS decision_day,
       CAST(i AS BIGINT) AS days_to_decision,
       CAST(cum AS BIGINT) AS llr_micro
FROM pick
"""


# ---------------------------------------------------------------------------
# Freedman–Diaconis histogram-bin plan for the event-value column
# ---------------------------------------------------------------------------


def fd_bin_width_plan(sf_dir: str):
    """Freedman–Diaconis histogram plan for the event-value column:
    bin width h = 2·IQR/∛n with the quartiles taken as DISCRETE order
    statistics (index ⌈q·n⌉−1 — quantile_disc parity) over the
    value-cents histogram and ∛n as the EXACT integer cube root
    (floor-pow seed ± one correction step against exact cubes, the
    Wilson-isqrt trick) — the bin plan a profiler or zonemap builder
    computes before histogramming a 10¹² -row column; h in milli-cents
    and the implied bin count ⌈range/h⌉ in pure integers.

    Scale shape: the value-cents histogram fold is the only exchange
    (bounded by distinct cents); quantiles come from cumulative counts
    over that bounded histogram on the driver."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"cents": _to_cents(t["value"])}), ["cents"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"cents": g["cents"], "m": pc.cast(g["count_all"], pa.int64())}
        )

    hist = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "cents", "m",
        max_keys=500_000,
    )
    vals = sorted(hist)
    n = sum(int(hist[v]) for v in vals)

    def order_stat(idx: int) -> int:
        c = 0
        for v in vals:
            c += int(hist[v])
            if c > idx:
                return int(v)
        return int(vals[-1])

    # quantile_disc convention: index = ceil(q*n) - 1
    q1 = order_stat((n + 3) // 4 - 1)
    q3 = order_stat((3 * n + 3) // 4 - 1)
    iqr = q3 - q1
    c = int(round(n ** (1.0 / 3.0)))
    while (c + 1) ** 3 <= n:
        c += 1
    while c**3 > n:
        c -= 1
    rng = int(vals[-1]) - int(vals[0])
    h_milli = (2000 * iqr) // c
    n_bins = (rng * c + 2 * iqr - 1) // (2 * iqr) if iqr > 0 else 1
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "q1_cents": pa.array([q1], pa.int64()),
            "q3_cents": pa.array([q3], pa.int64()),
            "iqr_cents": pa.array([iqr], pa.int64()),
            "cbrt_n": pa.array([c], pa.int64()),
            "h_milli": pa.array([h_milli], pa.int64()),
            "n_bins": pa.array([n_bins], pa.int64()),
        }
    )


FD_BIN_WIDTH_SQL = """
WITH v AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS cents FROM events),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.75) AS q3,
         min(cents) AS lo, max(cents) AS hi
  FROM v
),
cb0 AS (
  SELECT *, CAST(round(pow(n, 1.0 / 3.0)) AS BIGINT) AS c0 FROM st
),
cb AS (
  SELECT *, c0 + (CASE WHEN (c0 + 1) * (c0 + 1) * (c0 + 1) <= n
                       THEN 1 ELSE 0 END)
              - (CASE WHEN c0 * c0 * c0 > n THEN 1 ELSE 0 END) AS c
  FROM cb0
)
SELECT n, q1 AS q1_cents, q3 AS q3_cents, q3 - q1 AS iqr_cents,
       c AS cbrt_n,
       CAST((2000 * (q3 - q1)) // c AS BIGINT) AS h_milli,
       CAST(CASE WHEN q3 - q1 > 0
                 THEN ((hi - lo) * c + 2 * (q3 - q1) - 1) // (2 * (q3 - q1))
                 ELSE 1 END AS BIGINT) AS n_bins
FROM cb
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test: first half vs second half of daily counts
# ---------------------------------------------------------------------------


def wilcoxon_signed_rank(sf_dir: str):
    """Wilcoxon signed-rank test pairing the i-th day of the first
    half of the calendar with the i-th day of the second half (odd
    middle day dropped; zero differences dropped, the standard
    convention): ranks of |d| as DOUBLED midranks (tie block spanning
    min-rank a..b contributes a+b = 2·rank + ties − 1, so everything
    stays integer), W⁺ and W⁻ in the ×2 scale with the exact identity
    W⁺ + W⁻ = n_eff(n_eff+1) — the paired companion of
    length_mannwhitney's two-sample test: "did the second month shift
    the daily level, matched day-for-day".

    Scale shape: one calendar-bounded daily fold; the rank math is
    O(n log n) driver work on the bounded pair list."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    h = len(y) // 2
    first, second = y[:h], y[len(y) - h :]
    diffs = [b - a for a, b in zip(first, second)]
    nz = [d for d in diffs if d != 0]
    n_zero = len(diffs) - len(nz)
    n_eff = len(nz)
    order = sorted(range(n_eff), key=lambda i: abs(nz[i]))
    # doubled midranks over |d| ties
    mid2 = [0] * n_eff
    i = 0
    while i < n_eff:
        j = i
        while j < n_eff and abs(nz[order[j]]) == abs(nz[order[i]]):
            j += 1
        a, b = i + 1, j  # min and max rank of the tie block (1-based)
        for t in range(i, j):
            mid2[order[t]] = a + b
        i = j
    w_plus2 = sum(m for d, m in zip(nz, mid2) if d > 0)
    w_minus2 = sum(m for d, m in zip(nz, mid2) if d < 0)
    return pa.table(
        {
            "n_pairs": pa.array([len(diffs)], pa.int64()),
            "n_zero": pa.array([n_zero], pa.int64()),
            "n_eff": pa.array([n_eff], pa.int64()),
            "w_plus2": pa.array([w_plus2], pa.int64()),
            "w_minus2": pa.array([w_minus2], pa.int64()),
        }
    )


WILCOXON_SIGNED_RANK_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
o AS (
  SELECT n, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS m
  FROM daily
),
h AS (SELECT max(m) // 2 AS h, max(m) AS m FROM o),
pairs AS (
  SELECT b.n - a.n AS d
  FROM o a
  JOIN o b ON b.i = a.i + (SELECT m - h FROM h)
  WHERE a.i < (SELECT h FROM h)
),
nz AS (SELECT d, abs(d) AS ad FROM pairs WHERE d <> 0),
rk AS (
  SELECT d,
         2 * rank() OVER (ORDER BY ad)
           + count(*) OVER (PARTITION BY ad) - 1 AS mid2
  FROM nz
)
SELECT (SELECT CAST(h AS BIGINT) FROM h) AS n_pairs,
       CAST((SELECT h FROM h) - (SELECT count(*) FROM nz) AS BIGINT)
         AS n_zero,
       CAST((SELECT count(*) FROM nz) AS BIGINT) AS n_eff,
       CAST(coalesce(sum(CASE WHEN d > 0 THEN mid2 END), 0) AS BIGINT)
         AS w_plus2,
       CAST(coalesce(sum(CASE WHEN d < 0 THEN mid2 END), 0) AS BIGINT)
         AS w_minus2
FROM rk
"""


# ---------------------------------------------------------------------------
# Holt–Winters additive seasonal smoothing (period 7, no trend)
# ---------------------------------------------------------------------------


def holt_winters_seasonal(sf_dir: str):
    """Holt–Winters additive SEASONAL smoothing of daily order revenue
    (period 7, no trend; α = 1/5, γ = 1/10 as floor-divided
    rationals in milli-cents): l_t = ⌊(2·(1000·y_t − s_{t−7}) +
    8·l)/10⌋, s_t = ⌊((1000·y_t − l_t) + 9·s_{t−7})/10⌋, seeded with
    l = ⌊Σ_{i<7} 1000·y_i / 7⌋ and s_i = 1000·y_i − l — the weekly-
    seasonality companion of holt_linear_forecast, emitting the final
    level, the one-step-ahead SAE, and the seven fitted day-of-week
    seasonal offsets (slot = offset from the first calendar day).
    Every division floors identically on both engines; the SQL twin
    carries the 7-slot seasonal state as a list through a recursive
    CTE.

    Scale shape: one calendar-bounded daily fold; the inherently
    sequential recurrence runs on the driver over the bounded day
    series."""
    day_us = 86_400_000_000
    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(t["o_orderdate"], pa.int64()), pa.scalar(day_us, pa.int64())
        )
        g = pa.TableGroupBy(
            pa.table({"day": day, "cents": _to_cents(t["o_totalprice"])}), ["day"]
        ).aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "cents"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    cols = ["n_days", "level_milli", "sae_milli"] + [
        f"s{k}_milli" for k in range(7)
    ]
    if n < 8:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})

    def fdiv(a: int, m: int) -> int:
        return (a - ((a % m + m) % m)) // m

    lev = fdiv(1000 * sum(y[:7]), 7)
    st = [1000 * y[i] - lev for i in range(7)]
    sae = 0
    for t in range(7, n):
        sm7 = st[0]
        sae += abs(1000 * y[t] - (lev + sm7))
        lnew = fdiv(2 * (1000 * y[t] - sm7) + 8 * lev, 10)
        snew = fdiv((1000 * y[t] - lnew) + 9 * sm7, 10)
        st = st[1:] + [snew]
        lev = lnew
    # st[j] is the seasonal fitted at time (n-7+j); slot = that mod 7
    slot_val = {(n - 7 + j) % 7: st[j] for j in range(7)}
    vals = [n, lev, sae] + [slot_val[k] for k in range(7)]
    return pa.table({c: pa.array([v], pa.int64()) for c, v in zip(cols, vals)})


HOLT_WINTERS_SEASONAL_SQL = """
WITH RECURSIVE d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
idx AS (SELECT y, row_number() OVER (ORDER BY day) - 1 AS i FROM d),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
init AS (
  SELECT CAST((s.t - ((s.t % 7 + 7) % 7)) // 7 AS BIGINT) AS l
  FROM (SELECT sum(1000 * y) AS t FROM idx WHERE i < 7) s
),
walk AS (
  SELECT CAST(7 AS BIGINT) AS t,
         (SELECT l FROM init) AS lev,
         CAST(0 AS BIGINT) AS sae,
         (SELECT list(CAST(1000 * y - (SELECT l FROM init) AS BIGINT)
                      ORDER BY i)
          FROM idx WHERE i < 7) AS st
  UNION ALL
  SELECT w.t + 1,
         v.lnew,
         w.sae + abs(1000 * x.y - (w.lev + w.st[1])),
         w.st[2:7]
           || [CAST((z.num2 - ((z.num2 % 10 + 10) % 10)) // 10 AS BIGINT)]
  FROM walk w
  JOIN idx x ON x.i = w.t
  CROSS JOIN LATERAL (
    SELECT 2 * (1000 * x.y - w.st[1]) + 8 * w.lev AS num1
  ) u
  CROSS JOIN LATERAL (
    SELECT CAST((u.num1 - ((u.num1 % 10 + 10) % 10)) // 10 AS BIGINT) AS lnew
  ) v
  CROSS JOIN LATERAL (
    SELECT (1000 * x.y - v.lnew) + 9 * w.st[1] AS num2
  ) z
  WHERE w.t < (SELECT n FROM nn)
),
fin AS (SELECT * FROM walk ORDER BY t DESC LIMIT 1)
SELECT (SELECT n FROM nn) AS n_days,
       lev AS level_milli, sae AS sae_milli,
       st[((((0 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s0_milli,
       st[((((1 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s1_milli,
       st[((((2 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s2_milli,
       st[((((3 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s3_milli,
       st[((((4 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s4_milli,
       st[((((5 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s5_milli,
       st[((((6 - ((SELECT n FROM nn) - 7)) % 7 + 7) % 7) + 1)] AS s6_milli
FROM fin
"""


# ---------------------------------------------------------------------------
# Friedman rank test: day-of-week effect across complete weeks
# ---------------------------------------------------------------------------


def friedman_dow_test(sf_dir: str):
    """Friedman k-related-samples rank test of a day-of-week effect:
    each COMPLETE calendar week (all 7 epoch-day slots present) is a
    block, the 7 daily counts are ranked within the week as DOUBLED
    midranks (ties exact), and the per-slot rank sums R2_j feed the
    uncorrected Friedman statistic Q = 3·Σ(R2_j − 8n)² / (56n) in
    micro units (k = 7; doubled ranks scale the classic 12/(nk(k+1))
    constant to 3/…) — the nonparametric "is there a weekly rhythm"
    test next to orders_dow_profile's raw pivot and acf_peak_period's
    autocovariance scan.

    Scale shape: one calendar-bounded daily fold; week blocking and
    ranking run on the driver over the bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    weeks: dict = {}
    for d in series:
        weeks.setdefault(int(d) // 7, {})[int(d) % 7] = int(series[d])
    complete = {w: m for w, m in weeks.items() if len(m) == 7}
    n = len(complete)
    r2 = [0] * 7
    for m in complete.values():
        vals = [(m[s], s) for s in range(7)]
        byv = sorted(vals)
        i = 0
        while i < 7:
            j = i
            while j < 7 and byv[j][0] == byv[i][0]:
                j += 1
            mid2 = (i + 1) + j  # doubled midrank: min-rank + max-rank
            for t in range(i, j):
                r2[byv[t][1]] += mid2
            i = j
    if n == 0:
        q_micro = 0
    else:
        num = 3 * sum((r - 8 * n) ** 2 for r in r2)
        q_micro = (1_000_000 * num) // (56 * n)
    cols = {"n_weeks": [n]}
    for j in range(7):
        cols[f"r2_dow{j}"] = [r2[j]]
    cols["q_micro"] = [q_micro]
    return pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()})


FRIEDMAN_DOW_SQL = """
WITH d AS (
  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
wk AS (SELECT day // 7 AS w, day % 7 AS dow, n FROM d),
complete AS (
  SELECT w FROM wk GROUP BY w HAVING count(*) = 7
),
rk AS (
  SELECT w, dow,
         2 * rank() OVER (PARTITION BY w ORDER BY n)
           + count(*) OVER (PARTITION BY w, n) - 1 AS mid2
  FROM wk WHERE w IN (SELECT w FROM complete)
),
sums AS (
  SELECT dow, CAST(sum(mid2) AS BIGINT) AS r2 FROM rk GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM complete),
q AS (
  SELECT CAST(CASE WHEN (SELECT n FROM nn) > 0 THEN
           (1000000 * 3 * sum((r2 - 8 * (SELECT n FROM nn))
                              * (r2 - 8 * (SELECT n FROM nn))))
           // (56 * (SELECT n FROM nn))
         ELSE 0 END AS BIGINT) AS q_micro
  FROM sums
)
SELECT (SELECT n FROM nn) AS n_weeks,
       coalesce((SELECT r2 FROM sums WHERE dow = 0), 0) AS r2_dow0,
       coalesce((SELECT r2 FROM sums WHERE dow = 1), 0) AS r2_dow1,
       coalesce((SELECT r2 FROM sums WHERE dow = 2), 0) AS r2_dow2,
       coalesce((SELECT r2 FROM sums WHERE dow = 3), 0) AS r2_dow3,
       coalesce((SELECT r2 FROM sums WHERE dow = 4), 0) AS r2_dow4,
       coalesce((SELECT r2 FROM sums WHERE dow = 5), 0) AS r2_dow5,
       coalesce((SELECT r2 FROM sums WHERE dow = 6), 0) AS r2_dow6,
       q_micro
FROM q
"""


# ---------------------------------------------------------------------------
# Bartels rank von Neumann ratio: serial randomness of daily counts
# ---------------------------------------------------------------------------


def bartels_rank_vn(sf_dir: str):
    """Bartels' rank version of the von Neumann ratio on the daily
    event-count series: with doubled midranks R2_i over the whole
    series, NM = Σ (R2_i − R2_{i+1})² and DEN = Σ (R2_i − (n+1))²
    (n+1 is the exact doubled-rank mean), RVN = NM/DEN in micro via
    one floor division — ≈2 under serial randomness, <2 for positive
    autocorrelation — the rank-robust cousin of daily_runs_test (runs)
    and events_corr_stats (moment autocorrelation).

    Scale shape: one calendar-bounded daily fold; ranking and the two
    quadratic sums are O(n log n) driver work on the bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    order = sorted(range(n), key=lambda i: y[i])
    r2 = [0] * n
    i = 0
    while i < n:
        j = i
        while j < n and y[order[j]] == y[order[i]]:
            j += 1
        mid2 = (i + 1) + j
        for t in range(i, j):
            r2[order[t]] = mid2
        i = j
    nm = sum((a - b) ** 2 for a, b in zip(r2, r2[1:]))
    den = sum((r - (n + 1)) ** 2 for r in r2)
    rvn_micro = (1_000_000 * nm) // den if den else 0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "nm": pa.array([nm], pa.int64()),
            "den": pa.array([den], pa.int64()),
            "rvn_micro": pa.array([rvn_micro], pa.int64()),
        }
    )


BARTELS_RANK_VN_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
rk AS (
  SELECT row_number() OVER (ORDER BY day) AS i,
         2 * rank() OVER (ORDER BY n) + count(*) OVER (PARTITION BY n) - 1
           AS r2,
         count(*) OVER () AS m
  FROM daily
),
nm AS (
  SELECT CAST(sum((a.r2 - b.r2) * (a.r2 - b.r2)) AS BIGINT) AS nm
  FROM rk a JOIN rk b ON b.i = a.i + 1
),
dn AS (
  SELECT CAST(sum((r2 - (m + 1)) * (r2 - (m + 1))) AS BIGINT) AS den,
         CAST(max(m) AS BIGINT) AS n
  FROM rk
)
SELECT dn.n AS n_days, nm.nm AS nm, dn.den AS den,
       CAST(CASE WHEN dn.den > 0 THEN (1000000 * nm.nm) // dn.den
                 ELSE 0 END AS BIGINT) AS rvn_micro
FROM nm, dn
"""


# ---------------------------------------------------------------------------
# Economic order quantity (EOQ) plan per part (exact integer sqrt)
# ---------------------------------------------------------------------------


def eoq_plan(sf_dir: str, k: int = 20):
    """Wilson economic-order-quantity plan for the top-k parts by
    total demand: D = Σ l_quantity per part, EOQ = √(2·D·K/h) with
    K = 100 (order cost) and h = 1 (holding) ⇒ ⌊√(200·D)⌋ — the
    integer square root computed exactly on both engines (floor-sqrt
    seed in doubles, one ± correction step against exact squares, the
    brand_return_wilson idiom), plus the implied order count
    ⌈D/EOQ⌉ — the classic inventory-policy table, exact to the unit.

    Scale shape: per-part demand routes through ``bucketed_agg`` (part
    keys grow with the catalog); top-k via distributed sort + limit on
    the slim (part, demand) table."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "q": pc.cast(
                    pc.round(t["l_quantity"], round_mode="half_towards_infinity"),
                    pa.int64(),
                ),
            }
        )

    per_part = bucketed_agg(
        ds.map_batches(slim, batch_format="pyarrow"),
        ["l_partkey"],
        [("q", "sum", "d")],
    )
    top = (
        per_part.sort(["d", "l_partkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    import math

    rows = []
    for pk, d in zip(top["l_partkey"], top["d"]):
        d = int(d)
        arg = 200 * d
        s0 = int(math.isqrt(arg))
        eoq = s0  # exact already; SQL mirrors with seed + correction
        orders = (d + eoq - 1) // eoq if eoq else 0
        rows.append((int(pk), d, eoq, orders))
    return pa.table(
        {
            "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "d_total": pa.array([r[1] for r in rows], pa.int64()),
            "eoq": pa.array([r[2] for r in rows], pa.int64()),
            "n_orders": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


EOQ_PLAN_SQL = """
WITH d AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1
  ORDER BY d DESC, l_partkey LIMIT 20
),
s AS (
  SELECT l_partkey, d, 200 * d AS arg,
         CAST(floor(sqrt(CAST(200 * d AS DOUBLE))) AS BIGINT) AS s0
  FROM d
),
e AS (
  SELECT l_partkey, d,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= arg THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > arg THEN 1 ELSE 0 END) AS eoq
  FROM s
)
SELECT l_partkey AS p_partkey, d AS d_total, eoq,
       CAST(CASE WHEN eoq > 0 THEN (d + eoq - 1) // eoq ELSE 0 END
            AS BIGINT) AS n_orders
FROM e ORDER BY d_total DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# Page's L test: monotone trend across weeks within day-of-week blocks
# ---------------------------------------------------------------------------


def page_trend_weeks(sf_dir: str):
    """Page's L test for a MONOTONE ordered alternative: blocks are
    the 7 day-of-week slots, treatments are the k complete calendar
    weeks in week order, each block's counts ranked across weeks as
    DOUBLED midranks; L2 = Σ_j j·R2_j (j = week position) against the
    exact null mean E[L2] = 7·k(k+1)²/2 — Friedman asks "do weeks
    differ", Page asks "do they RISE (or fall) in calendar order",
    the right test for steady growth.  Only epoch-weeks present for
    all 7 slots participate (the friedman_dow_test blocking).

    Scale shape: one calendar-bounded daily fold; the rank table is
    7×k driver work."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    weeks: dict = {}
    for d in series:
        weeks.setdefault(int(d) // 7, {})[int(d) % 7] = int(series[d])
    complete = sorted(w for w, m in weeks.items() if len(m) == 7)
    k = len(complete)
    l2 = 0
    for dow in range(7):
        vals = [(weeks[w][dow], j + 1) for j, w in enumerate(complete)]
        byv = sorted(vals)
        i = 0
        while i < k:
            j = i
            while j < k and byv[j][0] == byv[i][0]:
                j += 1
            mid2 = (i + 1) + j
            for t in range(i, j):
                l2 += byv[t][1] * mid2
            i = j
    mean_l2 = 7 * k * (k + 1) * (k + 1) // 2  # 7 blocks · k(k+1)²/2
    return pa.table(
        {
            "n_weeks": pa.array([k], pa.int64()),
            "l2_stat": pa.array([l2], pa.int64()),
            "l2_null_mean": pa.array([mean_l2], pa.int64()),
            "rising": pa.array([1 if l2 > mean_l2 else 0], pa.int64()),
        }
    )


PAGE_TREND_WEEKS_SQL = """
WITH d AS (
  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
wk AS (SELECT day // 7 AS w, day % 7 AS dow, n FROM d),
complete AS (SELECT w FROM wk GROUP BY w HAVING count(*) = 7),
pos AS (
  SELECT w, row_number() OVER (ORDER BY w) AS j FROM complete
),
rk AS (
  SELECT wk.dow, pos.j,
         2 * rank() OVER (PARTITION BY wk.dow ORDER BY wk.n)
           + count(*) OVER (PARTITION BY wk.dow, wk.n) - 1 AS mid2
  FROM wk JOIN pos ON pos.w = wk.w
),
st AS (
  SELECT CAST(sum(j * mid2) AS BIGINT) AS l2,
         CAST((SELECT count(*) FROM complete) AS BIGINT) AS k
  FROM rk
)
SELECT k AS n_weeks, l2 AS l2_stat,
       CAST(7 * k * (k + 1) * (k + 1) // 2 AS BIGINT) AS l2_null_mean,
       CAST(CASE WHEN l2 > 7 * k * (k + 1) * (k + 1) // 2
                 THEN 1 ELSE 0 END AS BIGINT) AS rising
FROM st
"""


# ---------------------------------------------------------------------------
# Bowley quartile skewness per event type (discrete order statistics)
# ---------------------------------------------------------------------------


def bowley_skew_by_type(sf_dir: str):
    """Bowley's quartile skewness per event type:
    (q3 + q1 − 2·q2) / (q3 − q1) over value cents with the quartiles
    as DISCRETE order statistics (index ⌈q·n⌉−1, quantile_disc
    parity — the fd_bin_width_plan convention) in micro units — the
    outlier-immune skew next to value_winsorized_stats' moment view:
    which event types have a heavy right tail that a mean-based
    monitor would misread.

    Scale shape: one (type, cents) histogram fold (bounded by type ×
    distinct cents); quartiles from cumulative counts on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "cents": _to_cents(t["value"])}
        )

    hist_ds = bucketed_agg(
        _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        ["event_type", "cents"],
        [(None, "count", "m")],
    )
    hist = fold_partials(
        hist_ds, ["event_type", "cents"], "m", max_keys=500_000
    )
    by_type: dict = {}
    for (et, c), m in hist.items():
        by_type.setdefault(et, []).append((int(c), int(m)))

    def fdiv(a: int, m: int) -> int:
        return (a - ((a % m + m) % m)) // m

    rows = []
    for et in sorted(by_type):
        blocks = sorted(by_type[et])
        n = sum(m for _, m in blocks)

        def order_stat(idx: int) -> int:
            cum = 0
            for v, m in blocks:
                cum += m
                if cum > idx:
                    return v
            return blocks[-1][0]

        # quantile_disc convention: index = ceil(q*n) - 1
        q1 = order_stat((n + 3) // 4 - 1)
        q2 = order_stat((n + 1) // 2 - 1)
        q3 = order_stat((3 * n + 3) // 4 - 1)
        iqr = q3 - q1
        skew = fdiv(1_000_000 * (q3 + q1 - 2 * q2), iqr) if iqr else 0
        rows.append((et, n, q1, q2, q3, skew))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "q1_cents": pa.array([r[2] for r in rows], pa.int64()),
            "q2_cents": pa.array([r[3] for r in rows], pa.int64()),
            "q3_cents": pa.array([r[4] for r in rows], pa.int64()),
            "bowley_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


BOWLEY_SKEW_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
q AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.50) AS q2,
         quantile_disc(cents, 0.75) AS q3
  FROM v GROUP BY 1
)
SELECT event_type, n, q1 AS q1_cents, q2 AS q2_cents, q3 AS q3_cents,
       CAST(CASE WHEN q3 - q1 > 0 THEN
              (1000000 * (q3 + q1 - 2 * q2)
               - ((1000000 * (q3 + q1 - 2 * q2) % (q3 - q1) + (q3 - q1))
                  % (q3 - q1))) // (q3 - q1)
            ELSE 0 END AS BIGINT) AS bowley_micro
FROM q ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Early- vs late-materialization scan cost audit over lineitem filters
# ---------------------------------------------------------------------------


def late_materialization_audit(sf_dir: str):
    """Early- vs late-materialization byte audit for three canonical
    lineitem predicates: with fixed per-column in-memory widths
    (int64/double = 8, date32 = 4 — constants both engines share),
    early = every row pays filter + payload columns, late = every row
    pays the filter column and only PASSING rows pay the payload
    (l_extendedprice, l_discount, l_partkey = 24 bytes); the
    selectivity, both byte counts and the saving in permille — the
    column-store scan-planning arithmetic (zonemap_prune_audit's
    row-skipping cousin at the materialization stage).

    Scale shape: three per-batch predicate-count partials folded to
    scalars; no shuffle, the byte math is driver constants."""
    W_FILTER = {"l_shipdate": 4, "l_discount": 8, "l_quantity": 8}
    W_PAYLOAD = 24  # l_extendedprice + l_discount + l_partkey

    ds = _read(
        sf_dir, "lineitem", columns=["l_shipdate", "l_discount", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ship = pc.cast(t["l_shipdate"], pa.timestamp("us"))
        p1 = pc.greater_equal(
            pc.year(ship), pa.scalar(1997, pa.int32())
        )
        p2 = pc.and_(
            pc.greater_equal(t["l_discount"], 0.05),
            pc.less_equal(t["l_discount"], 0.07),
        )
        p3 = pc.less(t["l_quantity"], 25.0)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n": pa.array([t.num_rows], pa.int64()),
                "c1": pa.array([int(pc.sum(pc.cast(p1, pa.int64())).as_py() or 0)], pa.int64()),
                "c2": pa.array([int(pc.sum(pc.cast(p2, pa.int64())).as_py() or 0)], pa.int64()),
                "c3": pa.array([int(pc.sum(pc.cast(p3, pa.int64())).as_py() or 0)], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "k",
        ["n", "c1", "c2", "c3"],
    )
    n, c1, c2, c3 = (int(v) for v in acc[0])
    preds = [
        ("l_shipdate>=1997", "l_shipdate", c1),
        ("l_discount in [0.05,0.07]", "l_discount", c2),
        ("l_quantity<25", "l_quantity", c3),
    ]
    rows = []
    for name, fcol, passing in preds:
        wf = W_FILTER[fcol]
        early = n * (wf + W_PAYLOAD)
        late = n * wf + passing * W_PAYLOAD
        saving = 1000 * (early - late) // early if early else 0
        rows.append(
            (name, n, passing, 1000 * passing // n if n else 0, early, late, saving)
        )
    rows.sort()
    return pa.table(
        {
            "predicate": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_pass": pa.array([r[2] for r in rows], pa.int64()),
            "selectivity_permille": pa.array([r[3] for r in rows], pa.int64()),
            "early_bytes": pa.array([r[4] for r in rows], pa.int64()),
            "late_bytes": pa.array([r[5] for r in rows], pa.int64()),
            "saving_permille": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


LATE_MATERIALIZATION_SQL = """
WITH c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN year(l_shipdate) >= 1997 THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(sum(CASE WHEN l_discount >= 0.05 AND l_discount <= 0.07
                       THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN l_quantity < 25.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS c3
  FROM lineitem
),
p AS (
  SELECT 'l_shipdate>=1997' AS predicate, n, c1 AS n_pass,
         CAST(4 AS BIGINT) AS wf FROM c
  UNION ALL
  SELECT 'l_discount in [0.05,0.07]', n, c2, 8 FROM c
  UNION ALL
  SELECT 'l_quantity<25', n, c3, 8 FROM c
)
SELECT predicate, n AS n_rows, n_pass,
       CAST(CASE WHEN n > 0 THEN 1000 * n_pass // n ELSE 0 END AS BIGINT)
         AS selectivity_permille,
       CAST(n * (wf + 24) AS BIGINT) AS early_bytes,
       CAST(n * wf + n_pass * 24 AS BIGINT) AS late_bytes,
       CAST(CASE WHEN n > 0
                 THEN 1000 * (n * (wf + 24) - (n * wf + n_pass * 24))
                      // (n * (wf + 24))
                 ELSE 0 END AS BIGINT) AS saving_permille
FROM p ORDER BY predicate
"""


# ---------------------------------------------------------------------------
# Siegel repeated-medians robust slope of the daily event-count series
# ---------------------------------------------------------------------------


def siegel_repeated_medians(sf_dir: str):
    """Siegel's repeated-medians slope of the daily event-count
    series: for each day i the MEDIAN over j≠i of the pairwise slope
    (y_j − y_i)/(x_j − x_i), then the median of those per-day medians
    — a 50% breakdown-point robust trend (Theil–Sen, daily_theil_sen,
    breaks down at 29%).  Slopes are floored micro ints
    ⌊10⁶·Δy/Δx⌋ (portable floor division) and both median layers use
    the probed quantile_disc convention (sorted index ⌈n/2⌉−1), so
    the oracle reproduces every intermediate integer.

    Scale shape: one calendar-bounded daily fold; the O(n²) slope
    grid is driver work over the bounded series (the
    orders_mann_kendall bound)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    x = [int(d) for d in days]
    y = [int(series[d]) for d in days]
    n = len(x)

    def fdiv(a: int, m: int) -> int:
        return (a - ((a % m + m) % m)) // m

    def disc_median(vals) -> int:
        v = sorted(vals)
        return v[(len(v) + 1) // 2 - 1]  # quantile_disc: ceil(n/2)-1

    med_i = []
    for i in range(n):
        slopes = [
            fdiv(1_000_000 * (y[j] - y[i]), x[j] - x[i])
            for j in range(n)
            if j != i
        ]
        med_i.append(disc_median(slopes))
    slope = disc_median(med_i)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "slope_micro_per_day": pa.array([slope], pa.int64()),
            "min_day_median": pa.array([min(med_i)], pa.int64()),
            "max_day_median": pa.array([max(med_i)], pa.int64()),
        }
    )


SIEGEL_REPEATED_MEDIANS_SQL = """
WITH d AS (
  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
s AS (
  SELECT a.x AS xi,
         (1000000 * (b.y - a.y)
          - ((1000000 * (b.y - a.y) % (b.x - a.x) + (b.x - a.x))
             % (b.x - a.x))) // (b.x - a.x) AS slope
  FROM d a JOIN d b ON b.x <> a.x
),
m AS (
  SELECT xi, quantile_disc(slope, 0.5) AS med FROM s GROUP BY 1
)
SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
       CAST(quantile_disc(med, 0.5) AS BIGINT) AS slope_micro_per_day,
       CAST(min(med) AS BIGINT) AS min_day_median,
       CAST(max(med) AS BIGINT) AS max_day_median
FROM m
"""


# ---------------------------------------------------------------------------
# Retention half-life fit from the cohort matrix diagonals
# ---------------------------------------------------------------------------


def retention_halflife_fit(sf_dir: str):
    """Retention half-life from the cohort triangle: sum the cohort
    matrix along offset diagonals (retained_k = users active k weeks
    after their cohort week, all cohorts pooled), fit ln(retained_k)
    vs k by exact least squares in micro-log integers (k ≥ 1), and
    convert the weekly decay slope to a half-life L(2)/(−slope) weeks
    in micro — retention_cohort_matrix's triangle compressed to the
    one number a growth model wants.

    Scale shape: reuses the bitmask cohort fold (no joins); the
    diagonal sums and the fit are driver work over the ≤63-week
    catalog."""
    import math

    tri = retention_cohort_matrix(sf_dir)
    retained: dict = {}
    wmax = 0
    for cw, w, n in zip(
        tri["cohort_week"].to_pylist(),
        tri["week"].to_pylist(),
        tri["n_users"].to_pylist(),
    ):
        k = int(w) - int(cw)
        retained[k] = retained.get(k, 0) + int(n)
        wmax = max(wmax, int(w))

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    pts = [(k, L(retained[k])) for k in sorted(retained) if k >= 1 and retained[k] > 0]
    m = len(pts)

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    if m < 2:
        slope = 0
    else:
        sx = sum(k for k, _ in pts)
        sy = sum(y for _, y in pts)
        num = sum((m * k - sx) * (m * y - sy) for k, y in pts)
        den = sum((m * k - sx) ** 2 for k, _ in pts)
        slope = fdiv(1_000_000 * num, den) if den else 0
    halflife = fdiv(1_000_000 * L(2), -slope) if slope < 0 else 0
    return pa.table(
        {
            "n_points": pa.array([m], pa.int64()),
            "retained_week0": pa.array([retained.get(0, 0)], pa.int64()),
            "slope_micro": pa.array([slope], pa.int64()),
            "halflife_micro_weeks": pa.array([halflife], pa.int64()),
        }
    )


RETENTION_HALFLIFE_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS w
  FROM events
),
w0 AS (SELECT min(w) AS w0 FROM uw),
rel AS (SELECT user_id, CAST(uw.w - w0.w0 AS BIGINT) AS w FROM uw, w0),
cohort AS (SELECT user_id, min(w) AS cw FROM rel GROUP BY user_id),
diag AS (
  SELECT rel.w - cohort.cw AS k, CAST(count(*) AS BIGINT) AS retained
  FROM rel JOIN cohort USING (user_id)
  GROUP BY 1
),
xy AS (
  SELECT k AS x, CAST(round(ln(retained) * 1000000) AS BIGINT) AS y
  FROM diag WHERE k >= 1 AND retained > 0
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy
  FROM xy
),
fit AS (
  SELECT sum(CAST((SELECT m FROM st) * x - (SELECT sx FROM st) AS HUGEINT)
             * ((SELECT m FROM st) * y - (SELECT sy FROM st))) AS num,
         sum(CAST((SELECT m FROM st) * x - (SELECT sx FROM st) AS HUGEINT)
             * ((SELECT m FROM st) * x - (SELECT sx FROM st))) AS den
  FROM xy
),
sl AS (
  SELECT CAST(CASE WHEN (SELECT m FROM st) >= 2 AND den > 0 THEN
           (1000000 * num - ((1000000 * num % den + den) % den)) // den
         ELSE 0 END AS BIGINT) AS slope
  FROM fit
)
SELECT (SELECT m FROM st) AS n_points,
       CAST(coalesce((SELECT retained FROM diag WHERE k = 0), 0) AS BIGINT)
         AS retained_week0,
       slope AS slope_micro,
       CAST(CASE WHEN slope < 0 THEN
              (1000000 * CAST(round(ln(2) * 1000000) AS BIGINT)
               - ((1000000 * CAST(round(ln(2) * 1000000) AS BIGINT)
                   % (-slope) + (-slope)) % (-slope))) // (-slope)
            ELSE 0 END AS BIGINT) AS halflife_micro_weeks
FROM sl
"""


# ---------------------------------------------------------------------------
# Seasonal Mann–Kendall trend test (day-of-week seasons)
# ---------------------------------------------------------------------------


def seasonal_mann_kendall(sf_dir: str):
    """Seasonal Mann–Kendall (Hirsch–Slack) trend test of the daily
    event-count series with day-of-week seasons: the pairwise sign
    statistic runs WITHIN each of the 7 dow sub-series (so a weekly
    cycle can't masquerade as trend), S_total = Σ S_dow and the
    tie-corrected variance numerators add — the calendar-aware
    companion of orders_mann_kendall, all exact integers.

    Scale shape: one calendar-bounded daily fold; seven small O(n²)
    sign sums on the driver."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.divide(
                pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64()),
                pa.scalar(86_400_000_000, pa.int64()),
            ),
            pa.int64(),
        )
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    by_dow: dict = {}
    for d in sorted(series):
        by_dow.setdefault(int(d) % 7, []).append(int(series[d]))
    s_total = 0
    var_total = 0
    n_used = 0
    for dow in range(7):
        y = by_dow.get(dow, [])
        n = len(y)
        if n < 2:
            continue
        n_used += 1
        s_total += sum(
            (y[j] > y[i]) - (y[j] < y[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties: dict = {}
        for v in y:
            ties[v] = ties.get(v, 0) + 1
        var_total += n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1
        )
    return pa.table(
        {
            "n_seasons": pa.array([n_used], pa.int64()),
            "s_total": pa.array([s_total], pa.int64()),
            "var18_total": pa.array([var_total], pa.int64()),
        }
    )


SEASONAL_MANN_KENDALL_SQL = """
WITH d AS (
  SELECT epoch_us(date_trunc('day', ts)) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
dw AS (SELECT day % 7 AS dow, day, n FROM d),
s AS (
  SELECT a.dow,
         CAST(sum(CASE WHEN b.n > a.n THEN 1
                       WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM dw a JOIN dw b ON b.dow = a.dow AND b.day > a.day
  GROUP BY 1
),
cnt AS (SELECT dow, CAST(count(*) AS BIGINT) AS n FROM dw GROUP BY 1),
tie AS (
  SELECT dow, CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tsum
  FROM (SELECT dow, n, count(*) AS t FROM dw GROUP BY 1, 2)
  WHERE t > 1 GROUP BY 1
),
v AS (
  SELECT c.dow, c.n * (c.n - 1) * (2 * c.n + 5)
           - coalesce(t.tsum, 0) AS var18
  FROM cnt c LEFT JOIN tie t USING (dow)
  WHERE c.n >= 2
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_seasons,
       CAST((SELECT coalesce(sum(s.s), 0) FROM s
             JOIN v ON v.dow = s.dow) AS BIGINT) AS s_total,
       CAST((SELECT coalesce(sum(var18), 0) FROM v) AS BIGINT)
         AS var18_total
"""


# ---------------------------------------------------------------------------
# Hoover (Robin Hood) index of user spend concentration
# ---------------------------------------------------------------------------


def hoover_index_users(sf_dir: str):
    """Hoover (Robin Hood) index of user spend: ½·Σ_u |share_u − 1/n|
    — the fraction of total spend that would have to move to equalize
    users, exact as hoover_permille = ⌊500·Σ|c_u·n − T| / (T·n)⌋ (all
    integers; the transfer-interpretation scalar next to
    user_spend_lorenz's curve and user_type_gini's Gini).

    Scale shape: per-user cents via ``bucketed_agg``; the absolute
    deviation reduces per block against the broadcast (T, n) scalars
    and folds as one integer — no user list on the driver."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": t["user_id"], "cents": _to_cents(t["value"])}
        )

    per = bucketed_agg(
        _read(sf_dir, "events", columns=["user_id", "value"]).map_batches(
            slim, batch_format="pyarrow"
        ),
        ["user_id"],
        [("cents", "sum", "cents")],
    ).materialize()

    def tot_partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "t": pa.array([int(c.sum())], pa.int64()),
                "n": pa.array([len(c)], pa.int64()),
            }
        )

    acc = fold_partials(
        per.map_batches(tot_partial, batch_format="pyarrow"), "k", ["t", "n"]
    )
    total, n = (int(v) for v in acc[0])

    def dev_partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False).astype(object)
        dev = sum(abs(int(v) * n - total) for v in c)
        return pa.table(
            {"k": pa.array([0], pa.int64()), "d": pa.array([dev], pa.int64())}
        )

    dacc = fold_partials(
        per.map_batches(dev_partial, batch_format="pyarrow"), "k", "d"
    )
    dev = int(dacc[0])
    hoover = (500 * dev) // (total * n) if total and n else 0
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "hoover_permille": pa.array([hoover], pa.int64()),
        }
    )


HOOVER_INDEX_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
t AS (
  SELECT CAST(sum(cents) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n
  FROM u
),
d AS (
  SELECT CAST(sum(abs(CAST(cents AS HUGEINT) * (SELECT n FROM t)
                      - (SELECT total FROM t))) AS HUGEINT) AS dev
  FROM u
)
SELECT (SELECT n FROM t) AS n_users,
       (SELECT total FROM t) AS total_cents,
       CAST((500 * dev)
            // (CAST((SELECT total FROM t) AS HUGEINT) * (SELECT n FROM t))
            AS BIGINT) AS hoover_permille
FROM d
"""


# ---------------------------------------------------------------------------
# Mood's median test of event value across types
# ---------------------------------------------------------------------------


def mood_median_test(sf_dir: str):
    """Mood's median test: are the per-type event-value distributions
    centered at the same point?  Counts above / not-above the POOLED
    lower median (the daily_runs_test tie rule) per event type, plus
    the exact chi-square numerator Σ (a_i·T − n_i·A)² / (n_i) scaled
    — reported as chi2_scaled = Σ fdiv((a_i·T − n_i·A)², n_i), with
    the T²·A·(T−A) denominator left to the consumer — the
    median-centred companion of value_kruskal_wallis (rank sums) and
    value_anova_by_type (means).

    Scale shape: one (type, cents) histogram fold; pooled median and
    the per-type counts come off the bounded histogram."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    def slim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"event_type": t["event_type"], "cents": _to_cents(t["value"])}
        )

    hist = fold_partials(
        bucketed_agg(
            _read(sf_dir, "events", columns=["event_type", "value"]).map_batches(
                slim, batch_format="pyarrow"
            ),
            ["event_type", "cents"],
            [(None, "count", "m")],
        ),
        ["event_type", "cents"],
        "m",
        max_keys=500_000,
    )
    pooled: dict = {}
    by_type: dict = {}
    for (et, c), m in hist.items():
        c, m = int(c), int(m)
        pooled[c] = pooled.get(c, 0) + m
        by_type.setdefault(et, {})[c] = m
    total = sum(pooled.values())
    # pooled lower median: value at sorted index (total-1)//2
    idx = (total - 1) // 2
    cum = 0
    med = None
    for v in sorted(pooled):
        cum += pooled[v]
        if cum > idx:
            med = v
            break
    a_tot = sum(m for v, m in pooled.items() if v > med)
    rows = []
    chi2 = 0

    def fdiv(a: int, d: int) -> int:
        return (a - ((a % d + d) % d)) // d

    for et in sorted(by_type):
        n_i = sum(by_type[et].values())
        a_i = sum(m for v, m in by_type[et].items() if v > med)
        chi2 += fdiv((a_i * total - n_i * a_tot) ** 2, n_i)
        rows.append((et, n_i, a_i))
    out = [(r[0], r[1], r[2], 0) for r in rows]
    out.append(("__chi2__", total, a_tot, chi2))
    out.sort()  # the SQL twin ORDER BY event_type; '_' sorts first
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in out], pa.string()),
            "n": pa.array([r[1] for r in out], pa.int64()),
            "n_above_median": pa.array([r[2] for r in out], pa.int64()),
            "chi2_scaled": pa.array([r[3] for r in out], pa.int64()),
        }
    )


MOOD_MEDIAN_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT quantile_disc(cents, 0.5) AS med,
         CAST(count(*) AS BIGINT) AS total
  FROM v
),
pertype AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN cents > (SELECT med FROM med)
                       THEN 1 ELSE 0 END) AS BIGINT) AS a
  FROM v GROUP BY 1
),
atot AS (SELECT CAST(sum(a) AS BIGINT) AS a FROM pertype),
chi AS (
  SELECT CAST(sum(
           ((a * (SELECT total FROM med) - n * (SELECT a FROM atot))
            * (a * (SELECT total FROM med) - n * (SELECT a FROM atot))
            - (((a * (SELECT total FROM med) - n * (SELECT a FROM atot))
                * (a * (SELECT total FROM med) - n * (SELECT a FROM atot))
                % n + n) % n)) // n) AS BIGINT) AS chi2
  FROM pertype
)
SELECT event_type, n, a AS n_above_median,
       CAST(0 AS BIGINT) AS chi2_scaled
FROM pertype
UNION ALL
SELECT '__chi2__', (SELECT total FROM med), (SELECT a FROM atot),
       (SELECT chi2 FROM chi)
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Runs-up-and-down (difference-sign) randomness test on daily counts
# ---------------------------------------------------------------------------


def runs_up_down_test(sf_dir: str):
    """Runs-up-and-down test of the daily event-count series: drop
    zero differences, count maximal monotone runs R in the remaining
    up/down sign sequence, and report the exact null moments for a
    random ordering — E[R]·3 = 2n−1 and Var[R]·90 = 16n−29 as
    integer numerators (n = #non-zero differences + 1) — the
    turning-point cousin of daily_runs_test (which runs on
    above/below-median, blind to local zig-zag).

    Scale shape: one calendar-bounded daily fold; the sign scan is a
    single pass over the bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    signs = [
        1 if b > a else -1 for a, b in zip(y, y[1:]) if b != a
    ]
    n = len(signs) + 1
    runs = 0
    prev = 0
    for s in signs:
        if s != prev:
            runs += 1
            prev = s
    return pa.table(
        {
            "n_eff": pa.array([n], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "e_runs_x3": pa.array([2 * n - 1], pa.int64()),
            "var_runs_x90": pa.array([16 * n - 29], pa.int64()),
        }
    )


RUNS_UP_DOWN_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
o AS (SELECT n, row_number() OVER (ORDER BY day) AS i FROM daily),
d AS (
  SELECT CASE WHEN b.n > a.n THEN 1 ELSE -1 END AS s,
         a.i
  FROM o a JOIN o b ON b.i = a.i + 1
  WHERE b.n <> a.n
),
seq AS (SELECT s, row_number() OVER (ORDER BY i) AS j FROM d),
runs AS (
  SELECT CAST(1 + count(*) AS BIGINT) AS runs
  FROM (
    SELECT a.s FROM seq a JOIN seq b ON b.j = a.j + 1 AND b.s <> a.s
  )
),
nn AS (SELECT CAST(count(*) + 1 AS BIGINT) AS n FROM seq)
SELECT (SELECT n FROM nn) AS n_eff,
       CAST(CASE WHEN (SELECT count(*) FROM seq) = 0 THEN 0
                 ELSE (SELECT runs FROM runs) END AS BIGINT) AS n_runs,
       CAST(2 * (SELECT n FROM nn) - 1 AS BIGINT) AS e_runs_x3,
       CAST(16 * (SELECT n FROM nn) - 29 AS BIGINT) AS var_runs_x90
FROM nn
"""


# ---------------------------------------------------------------------------
# Record-count test: running maxima of the daily series vs harmonic null
# ---------------------------------------------------------------------------


def record_count_test(sf_dir: str):
    """Record statistics of the daily event-count series: the number
    of RUNNING RECORDS (days strictly exceeding every earlier day)
    against the distribution-free null expectation Σ_{k=1..n} 1/k —
    under exchangeability, day k is a record with probability exactly
    1/k regardless of the distribution, so records ≫ harmonic says
    trend.  Expected value reported as the exact floored micro
    harmonic sum Σ ⌊10⁶/k⌋-style per-term floor (both engines share
    the per-term convention).

    Scale shape: one calendar-bounded daily fold; the record scan is
    one pass over the bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    records = 0
    best = None
    for v in y:
        if best is None or v > best:
            records += 1
            best = v
    exp_micro = sum(1_000_000 // k for k in range(1, n + 1))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "n_records": pa.array([records], pa.int64()),
            "expected_micro": pa.array([exp_micro], pa.int64()),
            "excess_micro": pa.array(
                [1_000_000 * records - exp_micro], pa.int64()
            ),
        }
    )


RECORD_COUNT_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
o AS (SELECT n, row_number() OVER (ORDER BY day) AS i FROM daily),
flags AS (
  SELECT CASE WHEN n > coalesce(
           max(n) OVER (ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           -1) THEN 1 ELSE 0 END AS is_rec
  FROM o
),
rec AS (SELECT CAST(sum(is_rec) AS BIGINT) AS records FROM flags),
h AS (
  SELECT CAST(sum(1000000 // k) AS BIGINT) AS exp_micro
  FROM (SELECT unnest(generate_series(1,
          (SELECT CAST(count(*) AS BIGINT) FROM daily))) AS k)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       (SELECT records FROM rec) AS n_records,
       (SELECT exp_micro FROM h) AS expected_micro,
       CAST(1000000 * (SELECT records FROM rec)
            - (SELECT exp_micro FROM h) AS BIGINT) AS excess_micro
"""


# ---------------------------------------------------------------------------
# Ljung–Box portmanteau test on the daily event-count series
# ---------------------------------------------------------------------------


def ljung_box_test(sf_dir: str, h: int = 7):
    """Ljung–Box portmanteau autocorrelation test at lags 1..h of the
    daily event-count series: with the exact integer autocovariance
    numerators c_k = Σ (n·y_t − S)(n·y_{t+k} − S) over n−k pairs and
    c_0 the full sum of squares, Q = n(n+2)·Σ_k r_k²/(n−k) with the
    plain estimator r_k = c_k/c_0 is reported as
    q_micro = Σ_k ⌊10⁶·n·(n+2)·c_k² / (c_0²·(n−k))⌋, the per-term
    floor shared by both engines — "is there ANY linear memory in the
    first
    week of lags", the portmanteau companion of acf_peak_period's
    argmax.

    Scale shape: one calendar-bounded daily fold; h vectorized dot
    products on the driver (Python ints — c_k² exceeds int64;
    HUGEINT in SQL)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table({"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())})

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    y = [int(series[d]) for d in days]
    n = len(y)
    s = sum(y)
    z = [n * v - s for v in y]
    c0 = sum(v * v for v in z)

    def fdiv(a: int, d: int) -> int:
        return (a - ((a % d + d) % d)) // d

    q_micro = 0
    used = 0
    for k in range(1, h + 1):
        if k >= n or c0 == 0:
            break
        used += 1
        ck = sum(z[t] * z[t + k] for t in range(n - k))
        q_micro += fdiv(1_000_000 * n * (n + 2) * ck * ck, c0 * c0 * (n - k))
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "h_lags": pa.array([used], pa.int64()),
            "q_micro": pa.array([q_micro], pa.int64()),
        }
    )


LJUNG_BOX_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
o AS (
  SELECT n AS y, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS n, sum(n) OVER () AS s
  FROM daily
),
z AS (SELECT i, n * y - s AS z, n FROM o),
c0 AS (SELECT CAST(sum(z * z) AS HUGEINT) AS c0, max(n) AS n FROM z),
lag AS (SELECT unnest(generate_series(1, 7)) AS k),
ck AS (
  SELECT lag.k, CAST(sum(a.z * b.z) AS HUGEINT) AS ck
  FROM lag
  JOIN z a ON TRUE
  JOIN z b ON b.i = a.i + lag.k
  WHERE lag.k < (SELECT n FROM c0)
  GROUP BY 1
),
terms AS (
  SELECT CAST(sum(
    (1000000 * (SELECT n FROM c0) * ((SELECT n FROM c0) + 2) * ck * ck
     - ((1000000 * (SELECT n FROM c0) * ((SELECT n FROM c0) + 2) * ck * ck
         % ((SELECT c0 FROM c0) * (SELECT c0 FROM c0)
            * ((SELECT n FROM c0) - k))
         + (SELECT c0 FROM c0) * (SELECT c0 FROM c0)
           * ((SELECT n FROM c0) - k))
        % ((SELECT c0 FROM c0) * (SELECT c0 FROM c0)
           * ((SELECT n FROM c0) - k))))
    // ((SELECT c0 FROM c0) * (SELECT c0 FROM c0)
        * ((SELECT n FROM c0) - k))) AS BIGINT) AS q_micro,
         CAST(count(*) AS BIGINT) AS used
  FROM ck
)
SELECT CAST((SELECT n FROM c0) AS BIGINT) AS n_days,
       used AS h_lags, q_micro
FROM terms
"""
