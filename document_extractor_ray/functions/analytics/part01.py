"""analytics submodule part01 (mechanical split of the former functions/analytics.py — see __init__.py)."""

from __future__ import annotations
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum
from document_extractor_ray.functions.bucketing import fold_partials
from document_extractor_ray.functions.analytics.part00 import HLL_C1, HLL_C2, HLL_SEED, _fmix64_sql, _hll_hash, _join_partitions, _n_blocks, _read, _to_cents, _ts_us  # noqa: E501



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
