"""analytics submodule part02 (mechanical split of the former functions/analytics.py — see __init__.py)."""

from __future__ import annotations
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum
from document_extractor_ray.functions.bucketing import fold_partials
from document_extractor_ray.functions.analytics.part00 import EVENT_TRANSITIONS_SQL, HLL_DAILY_REGISTERS_SQL, HLL_M, _hdr_bucket, _join_partitions, _n_blocks, _read, _to_cents, _ts_us, event_transitions, hdr_bucket_bounds, hll_daily_registers  # noqa: E501
from document_extractor_ray.functions.analytics.part01 import Q8_PART_TYPE, _settle_nonempty  # noqa: E501



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
