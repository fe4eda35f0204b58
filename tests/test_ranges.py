"""SFC range decomposition (operators/ranges.py) — completeness vs the
numpy Hilbert twin, maximality/disjointness, guard."""

from __future__ import annotations

import numpy as np
import pytest

from landlensdb_spark.geo.cells import _RES_SHIFT, np_hilbert_d
from landlensdb_spark.operators import ranges as R


def _np_ranges(x0, x1, y0, y1, level):
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    d = np.sort(
        (np.int64(level) << _RES_SHIFT)
        | np_hilbert_d(xs.ravel(), ys.ravel(), level)
    )
    isl = d - np.arange(1, len(d) + 1)
    out = []
    for i in np.unique(isl):
        run = d[isl == i]
        out.append((int(run.min()), int(run.max()), len(run)))
    return sorted(out)


def _bounds(spark, x0, x1, y0, y1):
    return spark.createDataFrame([(x0, x1, y0, y1)], "x0 long, x1 long, y0 long, y1 long")


@pytest.mark.parametrize("box", [(3, 9, 2, 12), (0, 15, 0, 15), (5, 5, 7, 7)])
def test_matches_numpy_islands(spark, box):
    x0, x1, y0, y1 = box
    got = sorted(
        (r["range_start"], r["range_end"], r["n_cells"])
        for r in R.hilbert_ranges(_bounds(spark, x0, x1, y0, y1), 4).collect()
    )
    assert got == _np_ranges(x0, x1, y0, y1, 4)


def test_ranges_are_maximal_disjoint_complete(spark):
    rows = R.hilbert_ranges(_bounds(spark, 10, 25, 40, 51), 6).collect()
    rs = sorted((r["range_start"], r["range_end"], r["n_cells"]) for r in rows)
    # complete: total cells = bbox area; each run dense (distinct keys)
    assert sum(n for _, _, n in rs) == 16 * 12
    for lo, hi, n in rs:
        assert hi - lo + 1 == n  # contiguous
    # disjoint AND maximal: gap of at least 2 between consecutive runs
    for (_, hi_a, _), (lo_b, _, _) in zip(rs, rs[1:]):
        assert lo_b > hi_a + 1
    # full-square special case: ONE range (Hilbert visits a 2^k square
    # contiguously)
    one = R.hilbert_ranges(_bounds(spark, 0, 31, 0, 31), 5).collect()
    assert len(one) == 1 and one[0]["n_cells"] == 1024


def test_cover_budget_guard(spark):
    with pytest.raises(Exception, match="max_cells"):
        R.hilbert_ranges(_bounds(spark, 0, 999, 0, 999), 10, max_cells=1000).collect()


def test_morton_order_and_guard(spark):
    got = sorted(
        (r["range_start"], r["range_end"], r["n_cells"])
        for r in R.sfc_ranges(_bounds(spark, 3, 9, 2, 12), 4, order="morton").collect()
    )
    # completeness + contiguity under the Z-order keys
    assert sum(n for _, _, n in got) == 7 * 11
    for lo, hi, n in got:
        assert hi - lo + 1 == n
    # morton fragments more than hilbert on the same bbox
    h = R.hilbert_ranges(_bounds(spark, 3, 9, 2, 12), 4).count()
    assert len(got) >= h
    with pytest.raises(ValueError, match="order must be"):
        R.sfc_ranges(_bounds(spark, 0, 1, 0, 1), 4, order="peano")


def test_no_unpartitioned_window(spark):
    """r08: the islands row_number is two-level (bucket window + bounded
    offset join) — no single-task global WindowExec anywhere in the plan."""
    df = R.hilbert_ranges(_bounds(spark, 10, 25, 40, 51), 6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            # every window spec must carry a partition column
            assert "_p" in line, f"unpartitioned window: {line}"
