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


# ---------------------------------------------------------------------------
# ABC/XYZ inventory classification of parts
# ---------------------------------------------------------------------------

# XYZ thresholds on the relative demand-variability ratio
# var_num/(mean_num)^2 scaled to permille (CV^2 in exact integers):
# X <= 100 (steady), Y <= 400, Z above.
XYZ_X_PERMILLE = 100
XYZ_Y_PERMILLE = 400


def abc_xyz_classification(sf_dir: str):
    """Classic ABC/XYZ inventory matrix over parts: ABC from the
    cumulative revenue share of parts sorted by revenue (A to 70%,
    B to 90%, C the tail — ties broken toward the lower partkey), XYZ
    from demand variability across ship MONTHS as the exact integer
    CV² in permille: 1000·(m·Σq² − (Σq)²) // (Σq)² with q the
    per-month quantity over the m observed calendar months.  Output:
    the 3x3 class matrix with part counts and revenue shares — the
    planning segmentation every supply-chain dashboard starts from.

    Scale shape: per-(part, month) partials pre-combine inside
    map_batches, fold on the part-catalog-bounded domain (parts are a
    CATALOG, not an event stream — the top_customers boundedness
    argument); the ABC cumulation is one driver pass over the sorted
    catalog."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        month = pc.floor_temporal(t["l_shipdate"], unit="month")
        qty = pc.cast(t["l_quantity"], pa.int64())
        g = pa.TableGroupBy(
            pa.table(
                {
                    "part": t["l_partkey"],
                    "month": month,
                    "q": qty,
                    "rev": _to_cents(t["l_extendedprice"]),
                }
            ),
            ["part", "month"],
        ).aggregate([("q", "sum"), ("rev", "sum")])
        return pa.table(
            {
                "part": g["part"],
                "month": g["month"],
                "q": g["q_sum"],
                "rev": g["rev_sum"],
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["part", "month"],
        ["q", "rev"],
        max_keys=2_000_000,
    )
    by_part: dict = {}
    for (part, _month), (q, rev) in acc.items():
        s = by_part.setdefault(int(part), [0, 0, 0, 0])  # sq, sq2, m, rev
        s[0] += int(q)
        s[1] += int(q) * int(q)
        s[2] += 1
        s[3] += int(rev)
    total_rev = sum(s[3] for s in by_part.values())
    order = sorted(by_part, key=lambda p: (-by_part[p][3], p))
    abc: dict = {}
    cum = 0
    for p in order:
        cum += by_part[p][3]
        share_pm = (1000 * cum) // total_rev if total_rev else 0
        abc[p] = "A" if share_pm <= 700 else ("B" if share_pm <= 900 else "C")
    cells: dict = {}
    for p, (sq, sq2, m, rev) in by_part.items():
        var_num = m * sq2 - sq * sq
        cv2_pm = (1000 * var_num) // (sq * sq) if sq else 0
        xyz = (
            "X"
            if cv2_pm <= XYZ_X_PERMILLE
            else ("Y" if cv2_pm <= XYZ_Y_PERMILLE else "Z")
        )
        key = abc[p] + xyz
        c = cells.setdefault(key, [0, 0])
        c[0] += 1
        c[1] += rev
    rows = []
    for a in "ABC":
        for x in "XYZ":
            n, rev = cells.get(a + x, (0, 0))
            rows.append(
                (a + x, n, rev, (1_000_000 * rev) // total_rev if total_rev else 0)
            )
    return pa.table(
        {
            "klass": pa.array([r[0] for r in rows], pa.string()),
            "n_parts": pa.array([r[1] for r in rows], pa.int64()),
            "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
            "revenue_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


ABC_XYZ_SQL = f"""
WITH pm AS (
  SELECT l_partkey AS part, date_trunc('month', l_shipdate) AS month,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1, 2
),
p AS (
  SELECT part,
         CAST(sum(q) AS HUGEINT) AS sq,
         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sq2,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(rev) AS BIGINT) AS rev
  FROM pm GROUP BY 1
),
tot AS (SELECT CAST(sum(rev) AS BIGINT) AS t FROM p),
a AS (
  SELECT part, rev, sq, sq2, m,
         CAST(sum(rev) OVER (ORDER BY rev DESC, part) AS BIGINT) AS cum
  FROM p
),
cls AS (
  SELECT part, rev, sq, sq2, m,
         CASE WHEN (1000 * cum) // (SELECT t FROM tot) <= 700 THEN 'A'
              WHEN (1000 * cum) // (SELECT t FROM tot) <= 900 THEN 'B'
              ELSE 'C' END AS abc,
         CASE WHEN sq > 0 AND (1000 * (m * sq2 - sq * sq)) // (sq * sq)
                   <= {XYZ_X_PERMILLE} THEN 'X'
              WHEN sq > 0 AND (1000 * (m * sq2 - sq * sq)) // (sq * sq)
                   <= {XYZ_Y_PERMILLE} THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM a
),
grid AS (
  SELECT a.k || x.k AS klass
  FROM (VALUES ('A'), ('B'), ('C')) a(k), (VALUES ('X'), ('Y'), ('Z')) x(k)
),
g AS (
  SELECT abc || xyz AS klass, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(rev) AS BIGINT) AS revenue_cents
  FROM cls GROUP BY 1
)
SELECT grid.klass,
       coalesce(g.n_parts, 0) AS n_parts,
       coalesce(g.revenue_cents, 0) AS revenue_cents,
       CAST((1000000 * coalesce(g.revenue_cents, 0))
            // (SELECT t FROM tot) AS BIGINT) AS revenue_micro
FROM grid LEFT JOIN g ON g.klass = grid.klass
ORDER BY grid.klass
"""


# ---------------------------------------------------------------------------
# Hubness audit of the embedding space (k-occurrence distribution)
# ---------------------------------------------------------------------------

HUB_K = 10


def hubness_audit(sf_dir: str, k: int = HUB_K):
    """k-occurrence (hubness) audit of the embedding space: for every
    vector, how many OTHER vectors list it in their cosine top-k —
    high-dimensional spaces grow 'hub' vectors that pollute ANN
    results (Radovanović et al. 2010), and the k-occurrence histogram
    is the standard diagnostic.  Reports occurrence-count buckets
    (0..19, 20+ clipped) with vector counts, plus max occurrence —
    rank ties broken toward the lower vec_id (the knn_brute
    convention, so the oracle reproduces ranks exactly).

    Scale shape: normalized corpus broadcast once; per-batch matmul +
    per-row top-k (argpartition) emits k slim (neighbor) rows per
    vector; the occurrence fold is per-vector-bounded here and becomes
    a bucketed count at 10^9+ vectors (documented boundary)."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.similarity import (
        _normalize_rows,
        _read_embeddings,
        embedding_matrix,
    )

    ds = _read_embeddings(sf_dir)
    tabs = [t for t in map(ray.get, ds.to_arrow_refs()) if t.num_rows]
    corpus = pa.concat_tables(tabs).combine_chunks()
    c_ids = corpus["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    c_mat = _normalize_rows(
        embedding_matrix(corpus["embedding"]).astype(np.float64)
    )
    ref = state.broadcast({"ids": c_ids, "mat": c_mat})

    def topk_partial(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not ids.size:
            return pa.table(
                {"nbr": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        mat = _normalize_rows(
            embedding_matrix(t["embedding"]).astype(np.float64)
        )
        sims = mat @ st["mat"].T
        # exclude self
        self_mask = ids[:, None] == st["ids"][None, :]
        sims[self_mask] = -np.inf
        counts = np.zeros(st["ids"].size, dtype=np.int64)
        kk = min(k, st["ids"].size - 1)
        for i in range(sims.shape[0]):
            row = sims[i]
            # full (score desc, vec_id asc) lexsort: argpartition can
            # split boundary TIES arbitrarily, which would break the
            # deterministic rank the oracle reproduces.  The corpus is
            # broadcast whole anyway, so the exact sort is the honest
            # cost; at 10^9+ vectors the audit itself moves to an
            # LSH-bucketed estimate.
            order = np.lexsort((st["ids"], -row))[:kk]
            counts[order] += 1
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "nbr": pa.array(nz.astype(np.int64), pa.int64()),
                "c": pa.array(counts[nz], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(topk_partial, batch_format="pyarrow"),
        "nbr",
        "c",
        max_keys=2_000_000,
    )
    occ = np.zeros(c_ids.size, dtype=np.int64)
    for idx, c in acc.items():
        occ[int(idx)] = int(c)
    bucket = np.minimum(occ, 20)
    hist = np.bincount(bucket, minlength=21)
    rows = [(b, int(hist[b])) for b in range(21)]
    return pa.table(
        {
            "occ_bucket": pa.array([r[0] for r in rows], pa.int64()),
            "n_vectors": pa.array([r[1] for r in rows], pa.int64()),
            "max_occ": pa.array([int(occ.max())] * 21, pa.int64()),
        }
    )


HUBNESS_SQL = f"""
WITH s AS (
  SELECT a.vec_id AS q, b.vec_id AS nbr,
         list_cosine_similarity(a.embedding::DOUBLE[],
                                b.embedding::DOUBLE[]) AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT q, nbr,
         row_number() OVER (PARTITION BY q ORDER BY score DESC, nbr)
           AS rank
  FROM s
),
occ AS (
  SELECT e.vec_id,
         CAST(coalesce(k.c, 0) AS BIGINT) AS c
  FROM embeddings e
  LEFT JOIN (
    SELECT nbr, count(*) AS c FROM r WHERE rank <= {HUB_K} GROUP BY 1
  ) k ON k.nbr = e.vec_id
),
b AS (
  SELECT least(c, 20) AS occ_bucket, CAST(count(*) AS BIGINT) AS n_vectors
  FROM occ GROUP BY 1
),
grid AS (SELECT unnest(generate_series(0, 20)) AS occ_bucket),
mx AS (SELECT CAST(max(c) AS BIGINT) AS m FROM occ)
SELECT CAST(grid.occ_bucket AS BIGINT) AS occ_bucket,
       coalesce(b.n_vectors, 0) AS n_vectors,
       (SELECT m FROM mx) AS max_occ
FROM grid LEFT JOIN b ON b.occ_bucket = grid.occ_bucket
ORDER BY occ_bucket
"""


# ---------------------------------------------------------------------------
# One-way day-of-week ANOVA effect size on daily event counts
# ---------------------------------------------------------------------------

def dow_anova_eta(sf_dir: str):
    """One-way ANOVA effect size eta² of day-of-week on the daily
    event-count series, EXACT: with S_g / n_g the per-dow sum / day
    count, S / n the totals, and P = Π n_g, every term of
    eta² = SSB/SST = (Σ S_g²/n_g − S²/n) / (Σx² − S²/n) clears to an
    integer after multiplying by n·P —
    eta2_micro = 10⁶·(n·Σ (P/n_g)·S_g² − P·S²) // (P·(n·Σx² − S²)).
    The variance-decomposition 'how much of daily traffic is weekly
    seasonality' number that orders_dow_profile (means) and
    friedman_dow_test (ranks) bracket.

    Scale shape: one calendar-bounded daily fold; 7-group driver
    arithmetic in Python bigints (HUGEINT in the oracle)."""
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
    if not series:
        return pa.table(
            {
                "n_days": pa.array([], pa.int64()),
                "ssb_scaled": pa.array([], pa.int64()),
                "sst_scaled": pa.array([], pa.int64()),
                "eta2_micro": pa.array([], pa.int64()),
            }
        )
    groups: dict = {}
    sx = sx2 = n = 0
    for day, cnt in series.items():
        # epoch day number -> dow (1970-01-01 was a Thursday = 3 in
        # the Monday=0 convention DuckDB's isodow-1 matches).  Use the
        # proleptic ordinal, NOT datetime.timestamp() (tz-dependent).
        if hasattr(day, "toordinal"):
            epoch_day = day.toordinal() - 719163  # date(1970,1,1).toordinal()
        else:
            epoch_day = int(day) // 86_400_000_000
        dow = (epoch_day + 3) % 7
        g = groups.setdefault(dow, [0, 0])
        g[0] += int(cnt)
        g[1] += 1
        sx += int(cnt)
        sx2 += int(cnt) * int(cnt)
        n += 1
    P = 1
    for _, (_, ng) in sorted(groups.items()):
        P *= ng
    ssb_scaled = n * sum((P // ng) * sg * sg for sg, ng in groups.values()) - P * sx * sx
    sst_scaled = P * (n * sx2 - sx * sx)
    eta2 = (1_000_000 * ssb_scaled) // sst_scaled if sst_scaled > 0 else 0
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "ssb_scaled": pa.array([ssb_scaled], pa.int64()),
            "sst_scaled": pa.array([sst_scaled], pa.int64()),
            "eta2_micro": pa.array([eta2], pa.int64()),
        }
    )


DOW_ANOVA_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
g AS (
  SELECT (isodow(day) - 1) AS dow,
         CAST(sum(x) AS HUGEINT) AS sg, CAST(count(*) AS BIGINT) AS ng
  FROM daily GROUP BY 1
),
tot AS (
  SELECT CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2,
         CAST(count(*) AS BIGINT) AS n
  FROM daily
),
p AS (SELECT CAST(product(CAST(ng AS DOUBLE)) AS HUGEINT) AS pp FROM g),
ssb AS (
  SELECT (SELECT n FROM tot)
           * sum(((SELECT pp FROM p) // ng) * sg * sg)
         - (SELECT pp FROM p) * (SELECT sx FROM tot) * (SELECT sx FROM tot)
           AS ssb_scaled
  FROM g
)
SELECT tot.n AS n_days,
       CAST(ssb.ssb_scaled AS BIGINT) AS ssb_scaled,
       CAST((SELECT pp FROM p) * (tot.n * tot.sx2 - tot.sx * tot.sx)
            AS BIGINT) AS sst_scaled,
       CAST(CASE WHEN (SELECT pp FROM p) * (tot.n * tot.sx2 - tot.sx * tot.sx) > 0
            THEN (1000000::HUGEINT * ssb.ssb_scaled)
                 // ((SELECT pp FROM p) * (tot.n * tot.sx2 - tot.sx * tot.sx))
            ELSE 0 END AS BIGINT) AS eta2_micro
FROM tot, ssb
"""


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension recall audit
# ---------------------------------------------------------------------------

MRL_PREFIX_DIM = 16  # fixture embeddings are 64-dim; quarter-truncation
MRL_K = 10


def mrl_prefix_recall(sf_dir: str, prefix_dim: int = MRL_PREFIX_DIM, k: int = MRL_K):
    """Matryoshka-style prefix-dimension quality audit: for the 8
    deterministic query vectors, the overlap between the cosine top-k
    computed on FULL vectors and on the first ``prefix_dim``
    dimensions — 'how much recall do we keep if we truncate stored
    vectors 4x' (Kusupati et al. 2022), the decision number behind
    shrinking an embedding index.  Ranks tie-break on vec_id (the
    knn_brute convention); output per query: overlap count and
    Jaccard micro of the two top-k sets.

    Scale shape: corpus broadcast once with BOTH normalizations
    (full + prefix); per-batch two matmuls + bounded per-block top-k
    partials — the knn_brute shape twice."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.similarity import (
        _normalize_rows,
        _read_embeddings,
        default_queries,
        embedding_matrix,
    )

    q = default_queries(sf_dir)
    qm = embedding_matrix(q["embedding"]).astype(np.float64)
    qids = [int(x) for x in q["vec_id"].to_pylist()]
    qf = _normalize_rows(qm)
    qp = _normalize_rows(qm[:, :prefix_dim].copy())
    ref = state.broadcast({"qf": qf, "qp": qp})

    ds = _read_embeddings(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        st = state.cached_get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not ids.size:
            return pa.table(
                {
                    "qi": pa.array([], pa.int64()),
                    "which": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        m = embedding_matrix(t["embedding"]).astype(np.float64)
        mf = _normalize_rows(m)
        mp = _normalize_rows(m[:, : st["qp"].shape[1]].copy())
        out_q, out_w, out_v, out_s = [], [], [], []
        for which, (qm_, mm) in enumerate(((st["qf"], mf), (st["qp"], mp))):
            sims = qm_ @ mm.T
            kk = min(MRL_K, ids.size)
            for qi in range(qm_.shape[0]):
                row = sims[qi]
                sel = np.lexsort((ids, -row))[:kk]
                out_q.extend([qi] * len(sel))
                out_w.extend([which] * len(sel))
                out_v.extend(ids[sel].tolist())
                out_s.extend(row[sel].tolist())
        return pa.table(
            {
                "qi": pa.array(out_q, pa.int64()),
                "which": pa.array(out_w, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    best: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for r in b.to_pylist():
            best.setdefault((r["qi"], r["which"]), []).append(
                (-r["score"], r["vec_id"])
            )
    import heapq

    rows = []
    for qi, qid in enumerate(qids):
        tops = {}
        for which in (0, 1):
            cand = best.get((qi, which), [])
            tops[which] = {v for _, v in heapq.nsmallest(k, sorted(cand))}
        inter = len(tops[0] & tops[1])
        union = len(tops[0] | tops[1])
        rows.append(
            (qid, inter, (1_000_000 * inter) // union if union else 0)
        )
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "overlap_at_k": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


MRL_PREFIX_SQL = f"""
WITH qy AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
full_r AS (
  SELECT qy.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY qy.query_id
           ORDER BY list_cosine_similarity(qy.qe, e.embedding::DOUBLE[])
                      DESC, e.vec_id) AS rank
  FROM qy CROSS JOIN embeddings e
),
pref_r AS (
  SELECT qy.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY qy.query_id
           ORDER BY list_cosine_similarity(qy.qe[1:{MRL_PREFIX_DIM}],
                      (e.embedding::DOUBLE[])[1:{MRL_PREFIX_DIM}])
                      DESC, e.vec_id) AS rank
  FROM qy CROSS JOIN embeddings e
),
f AS (SELECT query_id, vec_id FROM full_r WHERE rank <= {MRL_K}),
p AS (SELECT query_id, vec_id FROM pref_r WHERE rank <= {MRL_K}),
ov AS (
  SELECT f.query_id, CAST(count(*) AS BIGINT) AS inter
  FROM f JOIN p ON p.query_id = f.query_id AND p.vec_id = f.vec_id
  GROUP BY 1
),
un AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS uni FROM (
    SELECT query_id, vec_id FROM f
    UNION
    SELECT query_id, vec_id FROM p
  ) GROUP BY 1
)
SELECT qy.query_id,
       coalesce(ov.inter, 0) AS overlap_at_k,
       CAST(CASE WHEN coalesce(un.uni, 0) > 0
            THEN (1000000 * coalesce(ov.inter, 0)) // un.uni
            ELSE 0 END AS BIGINT) AS jaccard_micro
FROM qy
LEFT JOIN ov ON ov.query_id = qy.query_id
LEFT JOIN un ON un.query_id = qy.query_id
ORDER BY qy.query_id
"""


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank test: first vs second half of the daily series
# ---------------------------------------------------------------------------

def wilcoxon_halves_test(sf_dir: str):
    """Wilcoxon signed-rank test pairing day i of the FIRST half of
    the daily event-count series with day i of the SECOND half (the
    paired companion of length_mannwhitney's unpaired U): differences
    d_i = x_{i+h} − x_i, zero differences dropped (Wilcoxon's rule),
    |d| ranked with doubled midranks (the friedman/bartels tie idiom),
    W⁺ = Σ ranks of positive d reported doubled (w2_plus) so ties stay
    integer-exact, plus the exact integer inequality for the normal-
    approximation two-sided 0.05 decision:
    (4·W⁺ − m(m+1))² · 10⁶ > 3.8416·10⁶·(2m(m+1)(2m+1)/3) with every
    factor integer (3.8416e6 = 1.96² · 10⁶).

    Scale shape: daily fold, O(h log h) driver arithmetic on the
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
    h = len(x) // 2
    diffs = [x[i + h] - x[i] for i in range(h)]
    nz = [d for d in diffs if d != 0]
    m = len(nz)
    if m == 0:
        return pa.table(
            {
                "n_pairs": pa.array([0], pa.int64()),
                "m_nonzero": pa.array([0], pa.int64()),
                "w2_plus": pa.array([0], pa.int64()),
                "significant": pa.array([0], pa.int64()),
            }
        )
    order = sorted(range(m), key=lambda i: abs(nz[i]))
    r2 = [0] * m
    i = 0
    while i < m:
        j = i
        while j < m and abs(nz[order[j]]) == abs(nz[order[i]]):
            j += 1
        mid2 = (i + 1) + j  # doubled midrank
        for t_ in range(i, j):
            r2[order[t_]] = mid2
        i = j
    w2_plus = sum(r for r, d in zip(r2, nz) if d > 0)
    # z² test with exact integers: (2·W2+ − m(m+1))² vs
    # 1.96² · (2/3)·m(m+1)(2m+1)  — both sides ×10⁶ after clearing /3
    lhs = 3 * 1_000_000 * (2 * w2_plus - m * (m + 1)) ** 2
    rhs = 3_841_600 * 2 * m * (m + 1) * (2 * m + 1)
    return pa.table(
        {
            "n_pairs": pa.array([h], pa.int64()),
            "m_nonzero": pa.array([m], pa.int64()),
            "w2_plus": pa.array([w2_plus], pa.int64()),
            "significant": pa.array([1 if lhs > rhs else 0], pa.int64()),
        }
    )


WILCOXON_HALVES_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
idx AS (
  SELECT n, row_number() OVER (ORDER BY day) - 1 AS i,
         count(*) OVER () AS nn
  FROM daily
),
d AS (
  SELECT b.n - a.n AS d
  FROM idx a JOIN idx b ON b.i = a.i + a.nn // 2
  WHERE a.i < a.nn // 2
),
nz AS (SELECT d FROM d WHERE d <> 0),
rk AS (
  SELECT d,
         2 * rank() OVER (ORDER BY abs(d))
           + count(*) OVER (PARTITION BY abs(d)) - 1 AS r2,
         count(*) OVER () AS m
  FROM nz
),
agg AS (
  SELECT CAST(coalesce(sum(CASE WHEN d > 0 THEN r2 END), 0) AS BIGINT)
           AS w2_plus,
         CAST(coalesce(max(m), 0) AS BIGINT) AS m
  FROM rk
),
np_ AS (SELECT CAST(max(nn) // 2 AS BIGINT) AS h FROM idx)
SELECT np_.h AS n_pairs,
       agg.m AS m_nonzero,
       agg.w2_plus,
       CAST(CASE WHEN agg.m > 0 AND
            3::HUGEINT * 1000000
              * (2 * agg.w2_plus - agg.m * (agg.m + 1))
              * (2 * agg.w2_plus - agg.m * (agg.m + 1))
            > 3841600::HUGEINT * 2 * agg.m * (agg.m + 1) * (2 * agg.m + 1)
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM np_, agg
"""


# ---------------------------------------------------------------------------
# Nation revenue rank stability across years (Kendall tau distance)
# ---------------------------------------------------------------------------

def nation_rank_stability(sf_dir: str):
    """Kendall rank-distance audit of per-nation order revenue between
    consecutive order YEARS: for each adjacent year pair, the number
    of discordant nation pairs between the two revenue rankings
    (ranks by cents desc, ties broken by nationkey — fully
    deterministic) and the normalized tau distance in permille
    (discordant / C(n,2)).  The 'did the league table reshuffle'
    stability metric for any cohorted ranking dashboard.

    Scale shape: per-(year, nation) cents via broadcast customer dim +
    bounded fold (years × 25 nations); the rank-distance is driver
    arithmetic over a tiny matrix."""
    import pyarrow.parquet as pq

    from document_extractor_ray import state

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].combine_chunks()
    nk = pc.cast(cust["c_nationkey"], pa.int64()).combine_chunks()
    dim_ref = state.broadcast({"ck": ck, "nk": nk})

    ds = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"]
    )

    def partial(t: pa.Table) -> pa.Table:
        st = state.cached_get(dim_ref)
        idx = pc.index_in(t["o_custkey"], value_set=st["ck"])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "year": pc.year(t["o_orderdate"]),
                    "nation": st["nk"].take(idx),
                    "cents": _to_cents(t["o_totalprice"]),
                }
            ),
            ["year", "nation"],
        ).aggregate([("cents", "sum")])
        return pa.table(
            {
                "year": pc.cast(g["year"], pa.int64()),
                "nation": g["nation"],
                "cents": g["cents_sum"],
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["year", "nation"],
        "cents",
    )
    by_year: dict = {}
    for (year, nation), cents in acc.items():
        by_year.setdefault(int(year), {})[int(nation)] = int(cents)
    years = sorted(by_year)
    rows = []
    for y0, y1 in zip(years, years[1:]):
        nations = sorted(set(by_year[y0]) | set(by_year[y1]))
        n = len(nations)

        def rank_of(year):
            order = sorted(
                nations, key=lambda nat: (-by_year[year].get(nat, 0), nat)
            )
            return {nat: r for r, nat in enumerate(order)}

        ra, rb = rank_of(y0), rank_of(y1)
        disc = 0
        for i in range(n):
            for j in range(i + 1, n):
                a, b = nations[i], nations[j]
                if (ra[a] - ra[b]) * (rb[a] - rb[b]) < 0:
                    disc += 1
        pairs = n * (n - 1) // 2
        rows.append(
            (y0, y1, n, disc, (1000 * disc) // pairs if pairs else 0)
        )
    return pa.table(
        {
            "year_from": pa.array([r[0] for r in rows], pa.int64()),
            "year_to": pa.array([r[1] for r in rows], pa.int64()),
            "n_nations": pa.array([r[2] for r in rows], pa.int64()),
            "discordant": pa.array([r[3] for r in rows], pa.int64()),
            "tau_dist_permille": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


NATION_RANK_STABILITY_SQL = """
WITH yn AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS year,
         CAST(c.c_nationkey AS BIGINT) AS nation,
         CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
years AS (SELECT DISTINCT year FROM yn),
pairs AS (
  SELECT a.year AS y0, b.year AS y1
  FROM years a JOIN years b ON b.year = (
    SELECT min(c.year) FROM years c WHERE c.year > a.year
  )
),
nations AS (
  SELECT p.y0, p.y1, n.nation
  FROM pairs p JOIN (SELECT DISTINCT nation FROM yn) n ON TRUE
),
rk AS (
  SELECT ns.y0, ns.y1, ns.nation,
         row_number() OVER (
           PARTITION BY ns.y0, ns.y1
           ORDER BY coalesce(a.cents, 0) DESC, ns.nation) AS ra,
         row_number() OVER (
           PARTITION BY ns.y0, ns.y1
           ORDER BY coalesce(b.cents, 0) DESC, ns.nation) AS rb
  FROM nations ns
  LEFT JOIN yn a ON a.year = ns.y0 AND a.nation = ns.nation
  LEFT JOIN yn b ON b.year = ns.y1 AND b.nation = ns.nation
),
dd AS (
  SELECT x.y0, x.y1,
         CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS discordant
  FROM rk x
  JOIN rk y ON y.y0 = x.y0 AND y.y1 = x.y1 AND y.nation > x.nation
  GROUP BY 1, 2
),
nn AS (
  SELECT y0, y1, CAST(count(*) AS BIGINT) AS n_nations
  FROM rk GROUP BY 1, 2
)
SELECT nn.y0 AS year_from, nn.y1 AS year_to, nn.n_nations,
       coalesce(dd.discordant, 0) AS discordant,
       CAST(CASE WHEN nn.n_nations > 1
            THEN (1000 * coalesce(dd.discordant, 0))
                 // (nn.n_nations * (nn.n_nations - 1) // 2)
            ELSE 0 END AS BIGINT) AS tau_dist_permille
FROM nn LEFT JOIN dd ON dd.y0 = nn.y0 AND dd.y1 = nn.y1
ORDER BY year_from
"""


# ---------------------------------------------------------------------------
# Late-arrival (out-of-orderness) audit over the event stream
# ---------------------------------------------------------------------------

LATE_N_BUCKETS = 2048


def late_arrival_audit(sf_dir: str):
    """Out-of-orderness profile of the event stream in INGEST order
    (event_id): an event is LATE iff its ts is strictly below the
    running max ts of all earlier-ingested events — exactly the rows a
    watermark-based streaming window would have to re-open.  Per event
    type: event count, late count, late permille, and the maximum
    lateness in microseconds.  The number that sizes a streaming
    pipeline's allowed-lateness / watermark delay.

    Scale shape: a running max is sequential, but distributes exactly
    in two passes over id-RANGE buckets: (1) per-bucket max-ts
    partials fold on the driver into an exclusive prefix max per
    bucket (bucket count fixed at 2048 — driver state is O(buckets));
    (2) one bucket-grouped exchange where each bucket sorts its own
    rows by id, runs a vectorized cumulative max seeded with the
    prefix, and emits per-type partials.  No global sort ever runs."""
    from document_extractor_ray import state

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    # pass 0: max event id (cheap column-stat fold)
    def id_max(t: pa.Table) -> pa.Table:
        m = pc.max(t["event_id"]).as_py()
        return pa.table({"k": pa.array([1], pa.int64()),
                         "m": pa.array([m if m is not None else -1], pa.int64())})

    id_parts = [
        r["m"]
        for b in ds.map_batches(id_max, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for r in b.to_pylist()
    ]
    max_id = max(id_parts) if id_parts else 0
    bucket_w = max(1, (max_id + LATE_N_BUCKETS) // LATE_N_BUCKETS)

    def bmax_partial(t: pa.Table) -> pa.Table:
        b = pc.divide(t["event_id"], bucket_w)
        g = pa.TableGroupBy(
            pa.table({"b": b, "ts": pc.cast(t["ts"], pa.int64())}), ["b"]
        ).aggregate([("ts", "max")])
        return pa.table({"b": g["b"], "mx": g["ts_max"]})

    # fold_partials SUMS values; this merge needs MAX — plain
    # dict-max over the bounded per-block partials instead
    bmax: dict = {}
    for tb in map(
        ray.get,
        ds.map_batches(bmax_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        for r in tb.to_pylist():
            b = int(r["b"])
            bmax[b] = max(bmax.get(b, -(1 << 62)), int(r["mx"]))
    prefix: dict = {}
    run = -(1 << 62)
    for b in sorted(bmax):
        prefix[b] = run
        run = max(run, bmax[b])
    ref = state.broadcast({"prefix": prefix, "w": bucket_w})

    def late_partial(g: pd.DataFrame) -> pd.DataFrame:
        st = state.cached_get(ref)
        g = g.sort_values("event_id")
        ts = g["ts"].astype("int64").to_numpy()
        b = int(g["event_id"].iloc[0]) // st["w"]
        seed = st["prefix"].get(b, -(1 << 62))
        run_max = np.maximum.accumulate(np.concatenate(([seed], ts)))[:-1]
        late = ts < run_max
        lateness = np.where(late, run_max - ts, 0)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "late": late.astype("int64"),
                "lateness": lateness.astype("int64"),
            }
        )
        agg = out.groupby("event_type", as_index=False).agg(
            n=("late", "size"), n_late=("late", "sum"), mx=("lateness", "max")
        )
        return agg

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.divide(t["event_id"], bucket_w)
        ).set_column(
            t.schema.get_field_index("ts"),
            "ts",
            pc.cast(t["ts"], pa.int64()),
        )

    partials = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(late_partial, batch_format="pandas")
    )
    tot: dict = {}
    for tb in map(ray.get, partials.to_arrow_refs()):
        for r in tb.to_pylist():
            et = r["event_type"]
            c = tot.setdefault(et, [0, 0, 0])
            c[0] += int(r["n"])
            c[1] += int(r["n_late"])
            c[2] = max(c[2], int(r["mx"]))
    rows = []
    for et in sorted(tot):
        n, nl, mx = tot[et]
        rows.append((et, n, nl, (1000 * nl) // n if n else 0, mx))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "n_late": pa.array([r[2] for r in rows], pa.int64()),
            "late_permille": pa.array([r[3] for r in rows], pa.int64()),
            "max_lateness_us": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


LATE_ARRIVAL_SQL = """
WITH w AS (
  SELECT event_type, epoch_us(ts) AS ts,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prev_max IS NOT NULL AND ts < prev_max
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST((1000 * sum(CASE WHEN prev_max IS NOT NULL AND ts < prev_max
                        THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         AS late_permille,
       CAST(coalesce(max(CASE WHEN prev_max IS NOT NULL AND ts < prev_max
                         THEN prev_max - ts END), 0) AS BIGINT)
         AS max_lateness_us
FROM w GROUP BY 1 ORDER BY 1
"""
