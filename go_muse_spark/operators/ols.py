"""Multi-feature OLS per series via exact normal equations and an
unrolled Cramer solve — shared expression text, both engines.

linear_fit (stats.py) regresses y on time alone; real panels want the
seasonal nuisance REMOVED while the trend is fit: y ~ b0 + b1*t +
b2*x with x a covariate such as a weekend flag ("is usage growing,
after accounting for weekends?"). That is a 3x3 normal-equation
system — small enough that Cramer's rule is a closed form, which
makes it oracle-verifiable the same way arfit handles Durbin-
Levinson: the four 3x3 determinants expand into polynomial
expressions over the EXACT integer moment sums (decimal(38,0) here,
HUGEINT in DuckDB), emitted once as portable SQL text (`ols3_layers`)
and evaluated verbatim by both engines; each coefficient is ONE
double division of two exact integers, and SSE/R^2 follow as a fixed
left-associated double expression over those coefficients. No
epsilon, bit-equal cross-engine.

Conditioning note (why the caller supplies small integers): the
moment matrix cubes the feature scale — epoch-second times would
overflow even int128 inside a 3x3 determinant (1e19^3). The contract
query therefore regresses on the per-series DAY INDEX (t - min t),
which also gives b0 the natural "level at series start" reading.

Scale shape: ONE exchange — a single map-side-combined aggregate
collects the 10 moments per series; the solve is a handful of scalar
column ops on one row per series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ols3_layers", "ols_fit3"]

# moment column names the layers expect:
#   m_n, m_t, m_x, m_y, m_tt, m_tx, m_xx, m_ty, m_xy, m_yy
OLS3_MOMENTS = (
    "m_n", "m_t", "m_x", "m_y", "m_tt",
    "m_tx", "m_xx", "m_ty", "m_xy", "m_yy",
)


def ols3_layers() -> list[dict[str, str]]:
    """Cramer's rule for [1, t, x] -> y as ordered projection layers
    of portable SQL text over the exact moment columns.

    X'X = [[n,  St,  Sx ],      X'y = [Sy, Sty, Sxy]
           [St, Stt, Stx],
           [Sx, Stx, Sxx]]

    det    = |X'X|  (exact integer expression)
    det_i  = |X'X with column i replaced by X'y|
    b_i    = cast(det_i as double) / cast(det as double)
    sse    = Syy - b'X'y   (left-associated double text)
    """

    def det3(c0, c1, c2):
        # columns given as (top, mid, bot) triples of column names;
        # cofactor expansion along the first row, fixed order
        (a, d, g), (b, e, h), (c, f, i) = c0, c1, c2
        return (
            f"{a} * ({e} * {i} - {f} * {h})"
            f" - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g})"
        )

    one = ("m_n", "m_t", "m_x")
    t = ("m_t", "m_tt", "m_tx")
    x = ("m_x", "m_tx", "m_xx")
    y = ("m_y", "m_ty", "m_xy")
    return [
        {
            "det": det3(one, t, x),
            "det0": det3(y, t, x),
            "det1": det3(one, y, x),
            "det2": det3(one, t, y),
        },
        {
            "b0": "cast(det0 AS double) / cast(det AS double)",
            "b1": "cast(det1 AS double) / cast(det AS double)",
            "b2": "cast(det2 AS double) / cast(det AS double)",
        },
        {
            "sse": (
                "cast(m_yy AS double)"
                " - (b0 * cast(m_y AS double)"
                " + b1 * cast(m_ty AS double)"
                " + b2 * cast(m_xy AS double))"
            ),
            "sst": (
                "cast(m_yy AS double)"
                " - cast(m_y AS double) * cast(m_y AS double)"
                " / cast(m_n AS double)"
            ),
        },
        {"r2": "1.0 - sse / sst"},
    ]


def ols_fit3(
    rolled: DataFrame,
    y_col: str,
    t_col: str,
    x_col: str,
    by: tuple[str, ...] = ("conv_id",),
    min_points: int = 6,
) -> DataFrame:
    """Per-series OLS of y on [1, t, x] (integer-valued t and x; see
    module docstring for the conditioning contract). Series with
    n < min_points, a singular moment matrix (det == 0 exactly — e.g.
    x constant), or zero y-variance are dropped.

    Returns (by..., n, b0, b1, b2, sse, r2).
    """

    def d(c):
        return c.cast("decimal(38,0)")

    t, x, y = (
        d(F.col(t_col)), d(F.col(x_col)), d(F.col(y_col)),
    )
    g = rolled.groupBy(*by).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m_n"),
        F.sum(t).alias("m_t"),
        F.sum(x).alias("m_x"),
        F.sum(y).alias("m_y"),
        F.sum(t * t).alias("m_tt"),
        F.sum(t * x).alias("m_tx"),
        F.sum(x * x).alias("m_xx"),
        F.sum(t * y).alias("m_ty"),
        F.sum(x * y).alias("m_xy"),
        F.sum(y * y).alias("m_yy"),
    )
    g = g.where(
        (F.col("m_n") >= F.lit(int(min_points)))
        & (F.col("m_n") * F.col("m_yy") - F.col("m_y") * F.col("m_y") > 0)
    )
    layers = ols3_layers()
    g = g.withColumns(
        {name: F.expr(expr) for name, expr in layers[0].items()}
    ).where(F.col("det") != 0)
    for layer in layers[1:]:
        g = g.withColumns({name: F.expr(expr) for name, expr in layer.items()})
    return g.select(
        *by,
        F.col("m_n").cast("long").alias("n"),
        "b0", "b1", "b2", "sse", "r2",
    )
