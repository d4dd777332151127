"""PACF and autoregressive fit via an unrolled Durbin-Levinson
recursion — generated ONCE as portable SQL expression text and
evaluated by BOTH engines.

Why a timeseries engine needs this: the ACF (stats.autocorr_lags)
answers "is there correlation at lag k?", but every lag echoes the
lags before it (an AR(1) series has nonzero ACF at ALL lags). The
PARTIAL autocorrelation removes the shorter-lag explanation, so the
model-order question "how many lags actually matter?" reads directly
off where the PACF cuts — the Box-Jenkins identification step. The
same recursion's final level IS the Yule-Walker AR(p) coefficient
vector, so one pass yields both the diagnostic and the fitted model
(with the innovation-variance ratio as the fit quality).

The determinism trick (this module's reason to exist as a separate
file): Durbin-Levinson is a sequential recursion —

    phi[1][1] = rho_1
    num_k = rho_k - sum_j phi[k-1][j] * rho_{k-j}
    den_k = 1 - sum_j phi[k-1][j] * rho_j
    phi[k][k] = num_k / den_k
    phi[k][j] = phi[k-1][j] - phi[k][k] * phi[k-1][k-j]

— float arithmetic whose VALUE depends on the operation order, which
would normally force a Python UDF here and an unverifiable oracle
there. Instead `dl_layers` unrolls the recursion for a fixed max_lag
into layers of scalar SQL expressions (left-associated sums, one
division per level), as plain dialect-portable text. The Spark
operator applies each layer with `F.expr`; the DuckDB oracle chains
the SAME strings as CTE projections. Both engines then evaluate the
IDENTICAL IEEE-754 expression tree on identical double inputs —
bit-equal results, no epsilon, same contract as the rest of the repo.

The inputs are themselves exact: the lag-covariances are carried as
the scaled integers C_k = n^2*S_k - n*Sx*(A_k+B_k) + (n-k)*Sx^2
(decimal(38,0) here, HUGEINT in the oracle — the module-standard
overflow-proof moment sums), and rho_k = C_k/C_0 is one correctly-
rounded double division. The biased (divide-by-n) autocovariance is
used, as Durbin-Levinson requires (it keeps the Toeplitz system
positive semidefinite).

Indexing is POSITIONAL (row_number over bucket order): the series is
assumed dense at the tier's grain — gap-fill first if it is not (the
rollup-family convention; a gap would otherwise silently splice
non-adjacent buckets into adjacent positions).

Scale shape: ONE exchange on the series key feeds one window sort
producing the K row-lags, then a single map-side-combined aggregate
to one row per series; the unrolled recursion is a few hundred scalar
column ops on that tiny table — free at any corpus size. max_lag is
capped at 12 because each inlined level roughly doubles the collapsed
expression tree (2^12 leaf terms per column is still cheap; 2^30 is
not) — PACF beyond lag 12 on a tier series is not a real diagnostic
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dl_layers", "dl_sql_ctes", "innov_layers", "pacf", "dominant_period", "effective_sample_size", "ess_tau_sql"]

MAX_LAG_CAP = 12


def dl_layers(max_lag: int) -> list[dict[str, str]]:
    """Unrolled Durbin-Levinson as ordered projection layers.

    Each layer maps new column name -> portable SQL scalar expression
    over columns defined by earlier layers (or the rho_k inputs).
    Sums are emitted left-associated so every engine adds in the same
    order; each level introduces exactly one division (num_k/den_k).
    """
    if not 1 <= max_lag <= MAX_LAG_CAP:
        raise ValueError(
            f"max_lag must be in [1, {MAX_LAG_CAP}], got {max_lag}"
        )
    layers: list[dict[str, str]] = [{"phi_1_1": "rho_1"}]
    for k in range(2, max_lag + 1):
        num = " + ".join(
            f"phi_{k-1}_{j} * rho_{k-j}" for j in range(1, k)
        )
        den = " + ".join(
            f"phi_{k-1}_{j} * rho_{j}" for j in range(1, k)
        )
        layers.append(
            {
                f"num_{k}": f"rho_{k} - ({num})",
                f"den_{k}": f"1.0 - ({den})",
            }
        )
        layers.append({f"phi_{k}_{k}": f"num_{k} / den_{k}"})
        layers.append(
            {
                f"phi_{k}_{j}": (
                    f"phi_{k-1}_{j} - phi_{k}_{k} * phi_{k-1}_{k-j}"
                )
                for j in range(1, k)
            }
        )
    return layers


def dl_sql_ctes(max_lag: int, src: str) -> tuple[str, str]:
    """The oracle half: chain dl_layers over CTE projections.

    Returns (cte_text, final_name): `cte_text` is a fragment
    `, dl_1 AS (SELECT *, ... FROM src), dl_2 AS (...)...` to splice
    after an existing WITH list whose last CTE is `src` (one row per
    series, columns rho_1..rho_K); `final_name` selects the fully
    recursed relation.
    """
    parts = []
    prev = src
    for i, layer in enumerate(dl_layers(max_lag), start=1):
        cols = ", ".join(f"{expr} AS {name}" for name, expr in layer.items())
        parts.append(f", dl_{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"dl_{i}"
    return "".join(parts), prev


def innov_layers(max_lag: int) -> dict[str, str]:
    """Innovation-variance-ratio columns: left-associated running
    product of (1 - phi_k_k^2), shared text for both engines."""
    out: dict[str, str] = {}
    prev = None
    for k in range(1, max_lag + 1):
        term = f"(1.0 - phi_{k}_{k} * phi_{k}_{k})"
        out[f"innov_{k}"] = term if prev is None else f"{prev} * {term}"
        prev = f"innov_{k}"
    return out


def pacf(
    rolled: DataFrame,
    value_col: str,
    max_lag: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
    min_points: int | None = None,
) -> DataFrame:
    """Partial autocorrelation AND Yule-Walker AR(max_lag) fit per
    series, long format: one row per (series, k), k = 1..max_lag.

    Returns (by..., k, n, rho, pacf, ar_coef, innov_ratio):
      rho         biased sample autocorrelation at lag k
      pacf        phi[k][k] — the lag-k partial autocorrelation
      ar_coef     phi[max_lag][k] — the AR(max_lag) coefficient
      innov_ratio prod_{i<=k} (1 - pacf_i^2) — innovation variance
                  over c_0 after fitting k lags (1 = nothing
                  explained, -> 0 = deterministic), emitted per k so
                  the order-selection curve is one query.

    Series shorter than min_points (default max_lag + 4) or with zero
    variance are dropped.
    """
    if min_points is None:
        min_points = max_lag + 4
    if min_points <= max_lag + 1:
        raise ValueError("min_points must exceed max_lag + 1")
    layers = dl_layers(max_lag)  # validates max_lag

    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*by).orderBy(
        F.col(bucket_col).cast("timestamp")
    )
    lagged = rolled.select(
        *by,
        v.alias("__x"),
        *[F.lag(v, k).over(w).alias(f"__l{k}") for k in range(1, max_lag + 1)],
    )

    def d(c):
        # module-standard exact moment sums: decimal(38,0), never
        # silently wrapping int64 (stats._pearson_from_sums)
        return c.cast("decimal(38,0)")

    x = F.col("__x")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(d(x) * d(x)).alias("s0"),
    ]
    for k in range(1, max_lag + 1):
        lk = F.col(f"__l{k}")
        aggs += [
            F.sum(d(x) * d(lk)).alias(f"s{k}"),
            F.sum(F.when(lk.isNotNull(), x)).alias(f"b{k}"),
            F.sum(lk).alias(f"a{k}"),
        ]
    g = lagged.groupBy(*by).agg(*aggs)

    n, sx = d(F.col("n")), d(F.col("sx"))
    c0 = n * n * F.col("s0") - n * sx * (sx + sx) + n * sx * sx
    g = g.withColumn("c_0", c0)
    for k in range(1, max_lag + 1):
        ck = (
            n * n * F.col(f"s{k}")
            - n * sx * (d(F.col(f"a{k}")) + d(F.col(f"b{k}")))
            + (n - F.lit(k)) * sx * sx
        )
        g = g.withColumn(
            f"rho_{k}",
            ck.cast("double") / F.col("c_0").cast("double"),
        )
    g = g.where(
        (F.col("n") >= F.lit(int(min_points)))
        & (F.col("c_0") > F.lit(0))
    )

    for layer in layers:
        g = g.withColumns({name: F.expr(expr) for name, expr in layer.items()})

    for name, expr in innov_layers(max_lag).items():
        g = g.withColumns({name: F.expr(expr)})

    K = max_lag
    out = g.select(
        *by,
        F.col("n").cast("long").alias("n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.col(f"rho_{k}").alias("rho"),
                        F.col(f"phi_{k}_{k}").alias("pacf"),
                        F.col(f"phi_{K}_{k}").alias("ar_coef"),
                        F.col(f"innov_{k}").alias("innov_ratio"),
                    )
                    for k in range(1, K + 1)
                ]
            )
        ).alias("__p"),
    )
    return out.select(
        *by, "n", "__p.k", "__p.rho", "__p.pacf", "__p.ar_coef",
        "__p.innov_ratio",
    )



def _cov_table(
    rolled: DataFrame,
    value_col: str,
    lags: list[int],
    by: tuple[str, ...],
    bucket_col: str,
) -> DataFrame:
    """Shared lag-covariance builder (dominant_period /
    effective_sample_size): one window emitting the lag columns, one
    map-combined aggregate, then the module's exact decimal(38,0)
    C_k = n^2*S_k - n*Sx*(A_k+B_k) + (n-k)*Sx^2 per requested lag,
    plus c_0. Returns one row per series with (by..., n, c_0,
    c_<k>...)."""
    v = F.col(value_col).cast("long")
    w = Window.partitionBy(*by).orderBy(
        F.col(bucket_col).cast("timestamp")
    )
    lagged = rolled.select(
        *by,
        v.alias("__x"),
        *[F.lag(v, k).over(w).alias(f"__l{k}") for k in lags],
    )

    def d(c):
        return c.cast("decimal(38,0)")

    x = F.col("__x")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(d(x) * d(x)).alias("s0"),
    ]
    for k in lags:
        lk = F.col(f"__l{k}")
        aggs += [
            F.sum(d(x) * d(lk)).alias(f"s{k}"),
            F.sum(F.when(lk.isNotNull(), x)).alias(f"b{k}"),
            F.sum(lk).alias(f"a{k}"),
        ]
    g = lagged.groupBy(*by).agg(*aggs)
    n, sx = d(F.col("n")), d(F.col("sx"))
    g = g.withColumn(
        "c_0", n * n * F.col("s0") - n * sx * (sx + sx) + n * sx * sx
    )
    for k in lags:
        g = g.withColumn(
            f"c_{k}",
            n * n * F.col(f"s{k}")
            - n * sx * (d(F.col(f"a{k}")) + d(F.col(f"b{k}")))
            + (n - F.lit(k)) * sx * sx,
        )
    return g


def dominant_period(
    rolled: DataFrame,
    value_col: str,
    min_lag: int,
    max_lag: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
    min_points: int | None = None,
) -> DataFrame:
    """Dominant-period detection: per series, the bucket lag in
    ``[min_lag, max_lag]`` with the LARGEST biased autocovariance —
    "does this user breathe daily or weekly?" answered as an argmax
    over the same exact scaled-integer C_k the PACF path carries
    (module docstring formula), so the winning lag is decided by pure
    integer comparison: NO float argmax, no cross-engine ulp coin
    flips at near-ties. Ties break to the SMALLEST lag (the
    fundamental beats its harmonics when they measure equal).

    ``min_lag`` exists because C_1 (plain persistence) dominates any
    autocorrelated series; a seasonality hunt starts past the
    short-lag shoulder (e.g. 2..36 on an hourly tier to find the
    24-bucket day).

    The reported strength is rho = C_best / C_0 — the one double
    division, after the argmax is already settled in integers.

    Positional lags over observed buckets (dense-spine convention of
    this module): gap-fill first if the tier has holes, or adjacent
    positions splice across gaps.

    Scale shape: identical to pacf — one exchange on the series key,
    one window sort emitting the K lag columns, one map-side-combined
    aggregate to a row per series; the argmax is a scalar array_max
    over K struct literals on that tiny table. No unrolled recursion,
    so max_lag is NOT capped at 12 here — K only widens one window
    projection and one aggregate, 3 columns per lag.

    Returns (by..., n, best_lag, rho_u is round(1e6*rho)).
    """
    if not 1 <= min_lag <= max_lag:
        raise ValueError("need 1 <= min_lag <= max_lag")
    if min_points is None:
        min_points = max_lag + 4
    if min_points <= max_lag + 1:
        raise ValueError("min_points must exceed max_lag + 1")

    lags = list(range(min_lag, max_lag + 1))
    g = _cov_table(rolled, value_col, lags, by, bucket_col)
    g = g.where(
        (F.col("n") >= F.lit(int(min_points))) & (F.col("c_0") > F.lit(0))
    )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"c_{k}").alias("c"),
                    F.lit(-k).alias("nk"),
                )
                for k in lags
            ]
        )
    ).alias("__best")
    out = g.select(*by, F.col("n").cast("long").alias("n"), "c_0", best)
    return out.select(
        *by,
        "n",
        (-F.col("__best.nk")).cast("long").alias("best_lag"),
        F.round(
            F.col("__best.c").cast("double")
            / F.col("c_0").cast("double")
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("rho_u"),
    )


def effective_sample_size(
    rolled: DataFrame,
    value_col: str,
    max_lag: int,
    by: tuple[str, ...] = ("conv_id",),
    bucket_col: str = "bucket_ts",
    min_points: int | None = None,
) -> DataFrame:
    """Effective sample size under autocorrelation: a series of n
    correlated points carries the statistical information of only
    n / tau points, tau = 1 + 2*sum_{k<=K} rho_k (the integrated
    autocorrelation time, truncated at max_lag and floored at 1 —
    anti-correlated series don't get to claim MORE than n). This is
    the honesty factor every confidence interval on a tier aggregate
    needs: hourly averages of a sticky metric are nowhere near
    independent, and a dashboard that pretends otherwise draws error
    bars 5x too tight.

    Determinism: rho_k = C_k/C_0 are double divisions of the module's
    exact decimal(38,0) covariances, and tau's sum is GENERATED as one
    left-associated scalar expression over the K rho columns — a
    fixed-order tree, identical text in any engine; no aggregate
    float sum anywhere.

    Scale shape: identical to dominant_period — one exchange, one
    window emitting K lag columns, one map-combined aggregate, then
    scalar math on one row per series.

    Returns (by..., n, tau_u, ess_u) in 1e-6 units.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    if min_points is None:
        min_points = max_lag + 4
    if min_points <= max_lag + 1:
        raise ValueError("min_points must exceed max_lag + 1")

    lags = list(range(1, max_lag + 1))
    g = _cov_table(rolled, value_col, lags, by, bucket_col)
    for k in lags:
        g = g.withColumn(
            f"rho_{k}",
            F.col(f"c_{k}").cast("double") / F.col("c_0").cast("double"),
        )
    g = g.where(
        (F.col("n") >= F.lit(int(min_points))) & (F.col("c_0") > F.lit(0))
    )
    # fixed-order left-associated sum: identical text in any engine
    g = g.withColumn("tau", F.expr(ess_tau_sql(max_lag)))
    return g.select(
        *by,
        F.col("n").cast("long").alias("n"),
        F.round(F.col("tau") * 1e6, 0).cast("long").alias("tau_u"),
        F.round(
            F.col("n").cast("double") / F.col("tau") * 1e6, 0
        )
        .cast("long")
        .alias("ess_u"),
    )


def ess_tau_sql(max_lag: int) -> str:
    """Integrated autocorrelation time over rho_1..rho_K columns as a
    fixed-order scalar expression: greatest(1.0, 1.0 + 2.0*(((rho_1)
    + rho_2) + ...)) — shared text for Spark and any oracle."""
    chain = "rho_1"
    for k in range(2, max_lag + 1):
        chain = f"({chain} + rho_{k})"
    return f"greatest(cast(1.0 as double), 1.0 + 2.0 * ({chain}))"
