"""analytics submodule part04 (mechanical split of the former functions/analytics.py — see __init__.py)."""

from __future__ import annotations
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum
from document_extractor_ray.functions.bucketing import fold_partials
from document_extractor_ray.functions.analytics.part00 import HLL_C1, HLL_C2, HLL_SEED, KS_TYPE_A, KS_TYPE_B, _hll_hash, _join_partitions, _n_blocks, _read, _to_cents  # noqa: E501



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
