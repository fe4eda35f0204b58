"""Per-group linear trend (OLS slope/intercept) from EXACT integer
sums — the timeseries-drift staple (per-user engagement trend, per-host
crawl-rate trend) as one aggregation.

Float sums are shuffle-order-dependent, so a naive ``sum(x*y)`` over
doubles can never sit under a cross-engine value hash. This operator
instead requires INTEGER inputs (callers quantize, e.g. cents instead
of dollars, epoch seconds instead of timestamps): all five sufficient
statistics (n, Σx, Σy, Σxy, Σx²) are exact int64 arithmetic —
order-independent, partitioning-independent — and only the final slope
/ intercept perform IEEE double divisions on those exact integers, so
the result is bit-identical on any engine evaluating the same closed
form. Spark's ANSI mode turns int64 overflow into a loud error rather
than silent wrap; x is centered per group (x - min(x)) first, which
keeps Σxy and n·Σxy far from the boundary for epoch-scale inputs.

Scale shape: one window (min-x per group, hash-partitioned by group) +
one map-side-combined groupBy on the SAME key — the second exchange
reuses the first's partitioning. No joins, no collects; constant state
per group through the shuffle.

Reference parity: the pandas ``DataFrame.rolling``/polyfit trend checks
landlensdb users run over per-source image-count timeseries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_trend(
    df: DataFrame, x: str, y: str, group: str
) -> DataFrame:
    """``(group, n, slope, intercept)`` per group — OLS fit of integer
    ``y`` against integer ``x``. ``intercept`` is the fitted value AT
    THE GROUP'S MINIMUM x (the centered frame the statistics are
    computed in) — the natural anchor for per-entity timeseries, where
    an x=0 intercept would be a meaningless epoch-1970 extrapolation;
    the x=0 form is ``intercept - slope * min(x)`` if a caller wants
    it. ``slope`` / ``intercept`` are NULL for degenerate groups (all x
    equal, incl. n = 1). ``x`` and ``y`` must already be integral
    columns (quantize floats first — that is what makes the statistics
    exact)."""
    w = Window.partitionBy(group)
    xc = (F.col(x) - F.min(x).over(w)).alias("_xc")
    c = df.select(group, xc, F.col(y).alias("_y"))
    s = c.groupBy(group).agg(
        F.count("*").alias("n"),
        F.sum("_xc").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_xc") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_xc") * F.col("_xc")).alias("_sxx"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(den != 0, num.cast("double") / den.cast("double"))
    intercept = F.when(
        den != 0,
        (F.col("_sy").cast("double") - slope * F.col("_sx").cast("double"))
        / F.col("n").cast("double"),
    )
    return s.select(
        group, "n", slope.alias("slope"), intercept.alias("intercept")
    )
