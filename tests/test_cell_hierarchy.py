"""Multi-resolution cell hierarchy (geo/cells.py): parent/children,
compact/uncompact — footprint preservation, minimality, idempotence."""
from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from landlensdb_spark.geo.cells import (
    _RES_SHIFT,
    _X_SHIFT,
    cell_children,
    cell_parent,
    compact_cells,
    np_bbox_cover,
    uncompact_cells,
)


def _cells_df(spark, cells, group=None):
    if group is None:
        return spark.createDataFrame([(int(c),) for c in cells], "cell long")
    return spark.createDataFrame(
        [(g, int(c)) for g, cs in cells.items() for c in cs], "g int, cell long"
    )


def _mk(res, x, y):
    return (res << _RES_SHIFT) | (x << _X_SHIFT) | y


def test_parent_children_roundtrip(spark):
    df = spark.createDataFrame([( _mk(10, 513, 224),)], "cell long")
    kids = df.select(F.explode(cell_children("cell")).alias("c"))
    back = kids.select(cell_parent("c").alias("p")).distinct().collect()
    assert [r["p"] for r in back] == [_mk(10, 513, 224)]
    ks = sorted(r["c"] for r in kids.collect())
    assert ks == sorted(
        _mk(11, 513 * 2 + dx, 224 * 2 + dy) for dx in (0, 1) for dy in (0, 1)
    )
    # multi-step parent
    g = df.select(cell_parent("cell", 3).alias("p")).collect()[0]["p"]
    assert g == _mk(7, 513 >> 3, 224 >> 3)


def test_compact_full_block_collapses_recursively(spark):
    """A complete 4^3-descendant block of one res-5 cell must compact to
    exactly that single res-5 cell."""
    base = _mk(5, 9, 22)
    cells = []
    for dx in range(8):
        for dy in range(8):
            cells.append(_mk(8, (9 << 3) + dx, (22 << 3) + dy))
    out = compact_cells(_cells_df(spark, cells)).collect()
    assert [r["cell"] for r in out] == [base]


def test_compact_uncompact_preserves_footprint(spark):
    """Random res-8 cover: uncompact(compact(S), 8) == S exactly, and the
    compact form is no larger (minimality is exercised by the full-block
    test; here the footprint equality is the contract)."""
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 64, 400)
    ys = rng.integers(0, 64, 400)
    cells = sorted({int(_mk(8, int(x), int(y))) for x, y in zip(xs, ys)})
    df = _cells_df(spark, cells)
    comp = compact_cells(df)
    n_comp = comp.count()
    assert n_comp <= len(cells)
    back = uncompact_cells(comp, res=8).collect()
    assert sorted(r["cell"] for r in back) == cells
    # idempotence
    twice = compact_cells(comp).collect()
    assert sorted(r["cell"] for r in twice) == sorted(
        r["cell"] for r in comp.collect()
    )


def test_compact_grouped_isolates_groups(spark):
    """Two groups covering the same parent's children must NOT merge
    across groups."""
    kids = [_mk(6, 2 * 7 + dx, 2 * 3 + dy) for dx in (0, 1) for dy in (0, 1)]
    data = {1: kids, 2: kids[:3]}  # group 2 is one short of a full block
    out = compact_cells(_cells_df(spark, data, group=True), group="g")
    got = {
        g: sorted(r["cell"] for r in rows)
        for g, rows in (
            (1, out.filter("g = 1").collect()),
            (2, out.filter("g = 2").collect()),
        )
    }
    assert got[1] == [_mk(5, 7, 3)]
    assert got[2] == sorted(kids[:3])


def test_compact_global_merges_across_prefix_groups(spark):
    """group=None is the two-phase global compact (round-6 verdict #5):
    phase 1 compacts within res-5 prefix groups in parallel, phase 2
    merges the bounded res<=5 residue across groups. A complete 4^3 block
    at res 7 under ONE res-4 cell spans 4 distinct res-5 prefix groups,
    so the final res5->res4 collapse can only happen in phase 2."""
    base4 = _mk(4, 3, 6)
    cells = [
        _mk(7, (3 << 3) + dx, (6 << 3) + dy) for dx in range(8) for dy in range(8)
    ]
    out = compact_cells(_cells_df(spark, cells)).collect()
    assert [r["cell"] for r in out] == [base4]
    # mixed coarse input: three res-3 siblings + the fourth arriving as
    # its complete res-4 block -> everything collapses to the res-2 parent
    sibs3 = [_mk(3, 2 * 5 + dx, 2 * 9 + dy) for dx, dy in ((0, 0), (0, 1), (1, 0))]
    fourth = [_mk(4, 2 * (2 * 5 + 1) + dx, 2 * (2 * 9 + 1) + dy)
              for dx in (0, 1) for dy in (0, 1)]
    out2 = compact_cells(_cells_df(spark, sibs3 + fourth)).collect()
    assert sorted(r["cell"] for r in out2) == [_mk(2, 5, 9)]


def test_uncompact_rejects_finer_input(spark):
    df = _cells_df(spark, [_mk(9, 5, 5)])
    with pytest.raises(Exception, match="finer"):
        uncompact_cells(df, res=8).collect()


def test_bbox_cover_compacts_and_restores(spark):
    cover = np_bbox_cover(-74.05, 40.65, -73.95, 40.75, res=15)
    df = _cells_df(spark, cover.tolist())
    comp = compact_cells(df)
    back = uncompact_cells(comp, res=15).collect()
    assert sorted(r["cell"] for r in back) == sorted(int(c) for c in cover)
    # a solid rectangle spanning >= 3 cells per axis always contains
    # aligned 2x2 blocks in its interior -> must compress
    assert len(cover) > 100 and comp.count() < len(cover)
