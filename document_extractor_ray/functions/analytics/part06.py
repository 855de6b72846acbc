"""analytics submodule part06 — round-5 additions (new operators, not
part of the mechanical part00-05 split).

Five integer-exact oracled operators rounding out the drift/diversity
families: vocabulary spectrum (Yule/Sichel/hapax), CUSUM changepoint,
Lo-MacKinlay variance ratio, Benford first-digit audit, and per-nation
order-value Gini — each with the scale shapes of its family
(bucketed vocab folds, calendar-bounded daily folds, price-book-bounded
cents histograms).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from document_extractor_ray.functions.analytics.part00 import (
    _n_blocks,
    _read,
    _to_cents,
)
from document_extractor_ray.functions.bucketing import fold_partials


def _read_docs(sf_dir: str, columns):
    from document_extractor_ray.sources import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=columns,
        override_num_blocks=_n_blocks(),
    )


# ---------------------------------------------------------------------------
# Vocabulary spectrum per source: Yule's K, Sichel's S, hapax share
# ---------------------------------------------------------------------------

def yule_sichel_by_source(sf_dir: str):
    """Classical vocabulary-richness spectrum per SOURCE: Yule's
    characteristic K = 10^4·(S2 − N)/N² (S2 = Σ c² over token counts —
    the repeat-rate statistic), Sichel's S = V2/V (dis-legomena share)
    and the hapax share V1/V, all exact integer micro via one floor
    division — the register/contamination fingerprint that separates
    template-heavy sources from organic prose (Yule 1944; Sichel 1975).
    Complements chao1_richness (lang-keyed unseen-mass estimate): same
    spectrum fold, different statistics and key.

    Scale shape: (source, token) → count through ``bucketed_agg``
    (vocabulary is key-per-row — never a native Ray groupby); the
    spectrum reduction to (N, V, V1, V2, S2) is a per-block pyarrow
    partial folded on the source-bounded domain."""
    from document_extractor_ray.functions.bucketing import bucketed_agg
    from document_extractor_ray.functions.textstats import _DF_SPLIT_RE

    ds = _read_docs(sf_dir, ["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = pc.take(t["source"], parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("c_part", "sum", "c")],
    )

    def spectrum(t: pa.Table) -> pa.Table:
        c = t["c"]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "source": t["source"],
                    "n": c,
                    "s2": pc.multiply(c, c),
                    "v1": pc.cast(pc.equal(c, 1), pa.int64()),
                    "v2": pc.cast(pc.equal(c, 2), pa.int64()),
                }
            ),
            ["source"],
        ).aggregate(
            [("n", "sum"), ("s2", "sum"), ("v1", "sum"), ("v2", "sum"), ([], "count_all")]
        )
        return pa.table(
            {
                "source": g["source"],
                "n": g["n_sum"],
                "s2": g["s2_sum"],
                "v1": g["v1_sum"],
                "v2": g["v2_sum"],
                "v": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        vocab.map_batches(spectrum, batch_format="pyarrow"),
        "source",
        ["n", "s2", "v1", "v2", "v"],
    )
    rows = []
    for src in sorted(acc):
        n, s2, v1, v2, v = (int(x) for x in acc[src])
        rows.append(
            (
                src,
                n,
                v,
                v1,
                v2,
                (10_000_000_000 * (s2 - n)) // (n * n) if n else 0,
                (1_000_000 * v2) // v if v else 0,
                (1_000_000 * v1) // v if v else 0,
            )
        )
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
            "v_types": pa.array([r[2] for r in rows], pa.int64()),
            "v1": pa.array([r[3] for r in rows], pa.int64()),
            "v2": pa.array([r[4] for r in rows], pa.int64()),
            "yule_k_micro": pa.array([r[5] for r in rows], pa.int64()),
            "sichel_micro": pa.array([r[6] for r in rows], pa.int64()),
            "hapax_micro": pa.array([r[7] for r in rows], pa.int64()),
        }
    )


YULE_SICHEL_SQL = """
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
  FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
cnt AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2
),
sp AS (
  SELECT source,
         CAST(sum(c) AS HUGEINT) AS n,
         CAST(count(*) AS BIGINT) AS v,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM cnt GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_tokens,
       v AS v_types, v1, v2,
       CAST(CASE WHEN n > 0
            THEN (10000000000::HUGEINT * (s2 - n)) // (n * n)
            ELSE 0 END AS BIGINT) AS yule_k_micro,
       CAST(CASE WHEN v > 0 THEN (1000000 * v2) // v ELSE 0 END
            AS BIGINT) AS sichel_micro,
       CAST(CASE WHEN v > 0 THEN (1000000 * v1) // v ELSE 0 END
            AS BIGINT) AS hapax_micro
FROM sp ORDER BY source
"""


# ---------------------------------------------------------------------------
# CUSUM changepoint on the daily event-count series
# ---------------------------------------------------------------------------

def cusum_changepoint(sf_dir: str):
    """Value-based CUSUM changepoint on the daily event-count series —
    the mean-shift companion of the rank-based pettitt_changepoint:
    scaled cumulative sum C_t = n·Σ_{i≤t} x_i − t·Σx (an exact integer
    — n times the usual CUSUM against the global mean), statistic
    K = max_{1≤t<n} |C_t| with the earliest day on ties, plus the
    normalized k_permille = 1000·K // (n·Σx).

    Scale shape: one calendar-bounded daily fold; the O(n) scan runs
    on the driver over the bounded series (the pettitt shape minus its
    O(n²) sign matrix)."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    x = [int(series[d]) for d in days]
    n = len(x)
    tot = sum(x)
    if n < 2 or tot == 0:
        return pa.table(
            {
                "n_days": pa.array([], pa.int64()),
                "k_stat": pa.array([], pa.int64()),
                "c_at_star": pa.array([], pa.int64()),
                "day_star": pa.array([], pa.timestamp("us")),
                "k_permille": pa.array([], pa.int64()),
            }
        )
    run = 0
    best_abs, best_c, best_t = -1, 0, 0
    for t_i in range(n - 1):
        run += x[t_i]
        c = n * run - (t_i + 1) * tot
        if abs(c) > best_abs:
            best_abs, best_c, best_t = abs(c), c, t_i
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "k_stat": pa.array([best_abs], pa.int64()),
            "c_at_star": pa.array([best_c], pa.int64()),
            "day_star": pa.array([days[best_t]], pa.timestamp("us")),
            "k_permille": pa.array([(1000 * best_abs) // (n * tot)], pa.int64()),
        }
    )


CUSUM_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT day,
         CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS run,
         row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS m,
         CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM daily
),
c AS (
  SELECT day, m, tot, CAST(m * run - i * tot AS BIGINT) AS c
  FROM w WHERE i < m
),
k AS (
  SELECT day, m, tot, c FROM c ORDER BY abs(c) DESC, day LIMIT 1
)
SELECT CAST(m AS BIGINT) AS n_days,
       CAST(abs(c) AS BIGINT) AS k_stat,
       c AS c_at_star,
       day AS day_star,
       CAST((1000 * abs(c)) // (m * tot) AS BIGINT) AS k_permille
FROM k
"""


# ---------------------------------------------------------------------------
# Lo-MacKinlay variance ratio of the daily event-count series
# ---------------------------------------------------------------------------

VR_K = 5


def variance_ratio_test(sf_dir: str, k: int = VR_K):
    """Lo-MacKinlay variance-ratio statistic on daily event counts:
    VR(k) = Var(overlapping k-day sums)/ (k · Var(daily)) with both
    variances as exact population forms — a random (i.i.d.) series
    gives VR ≈ 1, positive autocorrelation pushes it above 1,
    mean-reversion below.  Reported as one exact integer:
    vr_micro = 10^6·(m·Σy²−(Σy)²)·n² // (k·(n·Σx²−(Σx)²)·m²)
    with y the m = n−k+1 overlapping window sums (Python bigints /
    HUGEINT carry the products).

    Scale shape: daily fold, then O(n) driver arithmetic on the
    calendar-bounded series."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), ["day"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"day": g["day"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    series = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "day", "n"
    )
    days = sorted(series)
    x = [int(series[d]) for d in days]
    n = len(x)
    if n < k + 1:
        return pa.table(
            {
                "n_days": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "var1_num": pa.array([], pa.int64()),
                "vark_num": pa.array([], pa.int64()),
                "vr_micro": pa.array([], pa.int64()),
            }
        )
    sx, sx2 = sum(x), sum(v * v for v in x)
    y = [sum(x[j : j + k]) for j in range(n - k + 1)]
    m = len(y)
    sy, sy2 = sum(y), sum(v * v for v in y)
    var1_num = n * sx2 - sx * sx  # n^2 * population variance
    vark_num = m * sy2 - sy * sy
    vr_micro = (
        (1_000_000 * vark_num * n * n) // (k * var1_num * m * m)
        if var1_num > 0
        else 0
    )
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "k": pa.array([k], pa.int64()),
            "var1_num": pa.array([var1_num], pa.int64()),
            "vark_num": pa.array([vark_num], pa.int64()),
            "vr_micro": pa.array([vr_micro], pa.int64()),
        }
    )


VARIANCE_RATIO_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
d AS (
  SELECT n, row_number() OVER (ORDER BY day) AS i,
         count(*) OVER () AS nn
  FROM daily
),
x AS (
  SELECT CAST(max(nn) AS BIGINT) AS n,
         CAST(sum(n) AS HUGEINT) AS sx,
         CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sx2
  FROM d
),
y AS (
  SELECT a.i, CAST(sum(b.n) AS BIGINT) AS yv
  FROM d a JOIN d b ON b.i BETWEEN a.i AND a.i + {VR_K} - 1
  WHERE a.i <= a.nn - {VR_K} + 1
  GROUP BY a.i HAVING count(*) = {VR_K}
),
ys AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(yv) AS HUGEINT) AS sy,
         CAST(sum(CAST(yv AS HUGEINT) * yv) AS HUGEINT) AS sy2
  FROM y
)
SELECT x.n AS n_days,
       CAST({VR_K} AS BIGINT) AS k,
       CAST(x.n * x.sx2 - x.sx * x.sx AS BIGINT) AS var1_num,
       CAST(ys.m * ys.sy2 - ys.sy * ys.sy AS BIGINT) AS vark_num,
       CAST(CASE WHEN x.n * x.sx2 - x.sx * x.sx > 0 THEN
            (1000000::HUGEINT * (ys.m * ys.sy2 - ys.sy * ys.sy)
             * x.n * x.n)
            // ({VR_K} * (x.n * x.sx2 - x.sx * x.sx) * ys.m * ys.m)
            ELSE 0 END AS BIGINT) AS vr_micro
FROM x, ys
WHERE x.n >= {VR_K} + 1
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit of order values
# ---------------------------------------------------------------------------

# floor(log10(1+1/d) * 1e6) — shared constants on both engines so no
# transcendental is evaluated at query time.
BENFORD_MICRO = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)


def benford_cents_audit(sf_dir: str):
    """Benford first-significant-digit audit of o_totalprice cents:
    per digit 1-9 the observed count, the observed share (micro), the
    Benford expectation (micro, fixed integer constants) and the
    signed deviation — the classic fabricated-data / synthetic-corpus
    fingerprint (synthetic uniform-ish prices fail Benford loudly,
    which is itself the interesting audit finding on this corpus).

    Scale shape: first digit per batch via numpy digit-count math (no
    string round-trip), 9-bin partial folded on the driver."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = _to_cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        cents = cents[cents > 0]
        if cents.size == 0:
            return pa.table(
                {"digit": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        mag = np.power(
            10, np.floor(np.log10(cents.astype(np.float64))).astype(np.int64)
        )
        # float log10 can misplace exact powers of 10: correct the
        # boundary exactly in integers
        mag = np.where(mag * 10 <= cents, mag * 10, mag)
        mag = np.where(mag > cents, mag // 10, mag)
        first = cents // mag
        cnt = np.bincount(first, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "digit", "n"
    )
    total = sum(int(v) for v in acc.values())
    rows = []
    for d in range(1, 10):
        n_d = int(acc.get(d, 0))
        obs = (1_000_000 * n_d) // total if total else 0
        exp = BENFORD_MICRO[d - 1]
        rows.append((d, n_d, obs, exp, obs - exp))
    return pa.table(
        {
            "digit": pa.array([r[0] for r in rows], pa.int64()),
            "n_obs": pa.array([r[1] for r in rows], pa.int64()),
            "obs_micro": pa.array([r[2] for r in rows], pa.int64()),
            "benford_micro": pa.array([r[3] for r in rows], pa.int64()),
            "dev_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


BENFORD_SQL = f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
  WHERE CAST(round(o_totalprice * 100.0) AS BIGINT) > 0
),
f AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g),
grid AS (SELECT unnest(generate_series(1, 9)) AS digit),
bf AS (
  SELECT unnest(generate_series(1, 9)) AS digit,
         unnest([{", ".join(str(v) for v in BENFORD_MICRO)}]) AS e
)
SELECT CAST(grid.digit AS BIGINT) AS digit,
       coalesce(g.n, 0) AS n_obs,
       CAST(CASE WHEN tot.t > 0 THEN (1000000 * coalesce(g.n, 0)) // tot.t
            ELSE 0 END AS BIGINT) AS obs_micro,
       CAST(bf.e AS BIGINT) AS benford_micro,
       CAST(CASE WHEN tot.t > 0 THEN (1000000 * coalesce(g.n, 0)) // tot.t
            ELSE 0 END - bf.e AS BIGINT) AS dev_micro
FROM grid
LEFT JOIN g ON g.digit = grid.digit
JOIN bf ON bf.digit = grid.digit
CROSS JOIN tot
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Per-nation order-value Gini coefficient
# ---------------------------------------------------------------------------

def order_value_gini_by_nation(sf_dir: str):
    """Exact Gini coefficient of order value per customer nation:
    G = Σ_i (2i − n − 1)·x_(i) / (n·Σx) over ascending sorted cents,
    computed from the per-(nation, cents) HISTOGRAM (a value block at
    sorted position c+1..c+m contributes v·(m·(2c+m+1) − m·(n+1))) —
    the inequality summary of revenue concentration per market.

    Scale shape: the order_value_pct_by_nation pattern — nation attach
    via broadcast customer dim, per-(nation, cents) count partials
    folded on the driver (bounded by the price book, not order count),
    O(distinct values) Gini arithmetic."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].combine_chunks()
    nk = pc.cast(cust["c_nationkey"], pa.int64()).combine_chunks()
    dim_ref = state.broadcast({"ck": ck, "nk": nk})

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def attach_hist(t: pa.Table) -> pa.Table:
        st = state.cached_get(dim_ref)
        idx = pc.index_in(t["o_custkey"], value_set=st["ck"])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "nation": st["nk"].take(idx),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["nation", "cents"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "nation": g["nation"],
                "cents": g["cents"],
                "m": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(attach_hist, batch_format="pyarrow"),
        ["nation", "cents"],
        "m",
        max_keys=2_000_000,
    )
    by_nation: dict = {}
    for (nation, cents), m in acc.items():
        by_nation.setdefault(int(nation), []).append((int(cents), int(m)))
    rows = []
    for nation in sorted(by_nation):
        blocks = sorted(by_nation[nation])
        n = sum(m for _, m in blocks)
        sx = sum(v * m for v, m in blocks)
        gnum = 0
        c = 0
        for v, m in blocks:
            gnum += v * (m * (2 * c + m + 1) - m * (n + 1))
            c += m
        gini = (1_000_000 * gnum) // (n * sx) if n and sx else 0
        rows.append((nation, n, sx, gini))
    return pa.table(
        {
            "nation": pa.array([r[0] for r in rows], pa.int64()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "sum_cents": pa.array([r[2] for r in rows], pa.int64()),
            "gini_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ORDER_VALUE_GINI_SQL = """
WITH o AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
         CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
  SELECT nation, cents,
         row_number() OVER (PARTITION BY nation ORDER BY cents) AS i,
         count(*) OVER (PARTITION BY nation) AS n
  FROM o
),
g AS (
  SELECT nation,
         CAST(max(n) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum((2 * CAST(i AS HUGEINT) - n - 1) * cents) AS HUGEINT)
           AS gnum
  FROM r GROUP BY 1
)
SELECT nation, n_orders, sum_cents,
       CAST(CASE WHEN n_orders > 0 AND sum_cents > 0 THEN
            (1000000::HUGEINT * gnum)
            // (CAST(n_orders AS HUGEINT) * sum_cents)
            ELSE 0 END AS BIGINT) AS gini_micro
FROM g ORDER BY nation
"""
