"""analytics submodule part05 (mechanical split of the former functions/analytics.py — see __init__.py)."""

from __future__ import annotations
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum
from document_extractor_ray.functions.bucketing import fold_partials
from document_extractor_ray.functions.analytics.part00 import _read, _to_cents  # noqa: E501
from document_extractor_ray.functions.analytics.part01 import retention_cohort_matrix  # noqa: E501



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
