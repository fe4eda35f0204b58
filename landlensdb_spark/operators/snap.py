"""Snap-to-network join: within-distance candidates -> nearest-1 -> interpolate.

Reproduces the semantics of the reference's ``snap_to_road_network``
(/root/reference/landlensdb/process/snap.py:157-251) as a distributed,
fully-vectorized operator:

- distances in EPSG:3857 meters (snap.py:190,201),
- candidate = probe bbox ±tolerance against segment bounds (snap.py:203-204),
- keep ``dist <= tolerance`` (snap.py:216-217),
- nearest-1 with the reference's stable tie-break: min by (dist, line order)
  (sort + group-first, snap.py:218-221),
- snapped point by linear referencing (project + interpolate,
  snap.py:223-224), back-projected to 4326 (snap.py:226-227),
- unmatched points kept with NULL snap columns (snap.py:230-239),
- optional compass realignment: nearest-segment bearing vs compass, pick
  forward/reverse (snap.py:241-249 -> _get_heading :147-153).

Spark shape: the (small) network is flattened driver-side into plain numpy
segment arrays and broadcast; each executor lazily builds a mercator-grid
bucket table over segment bboxes (the R-tree stand-in, snap.py:19-31). The
point side is processed in one ``mapInPandas`` pass — candidate pairs come
from a vectorized pandas hash-merge of point-cells vs bucket-cells (the
np.repeat/np.concatenate pair expansion of snap.py:206-211, but C-speed), and
ALL pair distances are computed in one vectorized call. No shuffle at all:
the job is scan -> mapInPandas -> sink.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from landlensdb_spark.geo.geometry import align_heading, bearing, point_segment_t
from landlensdb_spark.geo.mercator import R, np_inv_merc, np_merc_x, np_merc_y

WORLD = 2.0 * math.pi * R  # mercator world width in meters

SNAP_COLS = (
    "(line_id bigint, snap_dist double, snapped_lon double, snapped_lat double, "
    "snap_pos double, seg_bearing double)"
)

#: driver-side memo of prepared+broadcast networks, keyed on the network
#: DataFrame identity + snap params (strong ref kept; bounded at 8 entries).
_net_cache: dict[tuple, tuple] = {}

#: executor-side memo of unpacked segment arrays + bucket tables, keyed on the
#: driver token. Lives in the (reused) python worker process across tasks.
_worker_cache: dict[tuple, tuple] = {}


def _flatten_network(rows) -> dict[str, np.ndarray]:
    """(line_id, coords[[lon,lat],...]) rows -> flat per-segment arrays in
    3857 meters + lon/lat endpoints (for great-circle bearings) + cumulative
    arc positions (linear referencing measure base)."""
    xs0, ys0, xs1, ys1 = [], [], [], []
    lon0, lat0, lon1, lat1 = [], [], [], []
    line_ids, cum0 = [], []
    for line_id, coords in rows:
        c = np.asarray(coords, dtype=np.float64)
        if len(c) < 2:
            continue
        mx = np_merc_x(c[:, 0])
        my = np_merc_y(c[:, 1])
        seg_len = np.sqrt((mx[1:] - mx[:-1]) ** 2 + (my[1:] - my[:-1]) ** 2)
        cum = np.concatenate([[0.0], np.cumsum(seg_len)])[:-1]
        xs0.append(mx[:-1]); ys0.append(my[:-1])
        xs1.append(mx[1:]); ys1.append(my[1:])
        lon0.append(c[:-1, 0]); lat0.append(c[:-1, 1])
        lon1.append(c[1:, 0]); lat1.append(c[1:, 1])
        line_ids.append(np.full(len(c) - 1, line_id, dtype=np.int64))
        cum0.append(cum)
    return {
        "x0": np.concatenate(xs0), "y0": np.concatenate(ys0),
        "x1": np.concatenate(xs1), "y1": np.concatenate(ys1),
        "lon0": np.concatenate(lon0), "lat0": np.concatenate(lat0),
        "lon1": np.concatenate(lon1), "lat1": np.concatenate(lat1),
        "line_id": np.concatenate(line_ids), "cum0": np.concatenate(cum0),
    }


def _grid_res_for_tolerance(tolerance_m: float) -> int:
    """Finest mercator-grid res whose cell side >= 2*tolerance, so a probe
    bbox (side 2*tol) intersects at most 2 cells per axis."""
    res = int(math.floor(math.log2(WORLD / (2.0 * tolerance_m))))
    return max(1, min(res, 28))


def _bucket_segments(net: dict[str, np.ndarray], res: int, tol: float) -> pd.DataFrame:
    """Bucket table (cell_key, seg_idx) of segment bboxes, fully vectorized
    (no per-segment Python loop — this runs once per executor worker and its
    cost is pure fixed overhead, so it must be O(total cells) C-speed)."""
    cell = WORLD / (1 << res)
    minx = np.minimum(net["x0"], net["x1"]) - tol
    maxx = np.maximum(net["x0"], net["x1"]) + tol
    miny = np.minimum(net["y0"], net["y1"]) - tol
    maxy = np.maximum(net["y0"], net["y1"]) + tol
    cx0 = np.floor((minx + WORLD / 2) / cell).astype(np.int64)
    cx1 = np.floor((maxx + WORLD / 2) / cell).astype(np.int64)
    cy0 = np.floor((miny + WORLD / 2) / cell).astype(np.int64)
    cy1 = np.floor((maxy + WORLD / 2) / cell).astype(np.int64)
    nx = cx1 - cx0 + 1
    ny = cy1 - cy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    seg_idx = np.repeat(np.arange(len(cx0), dtype=np.int64), counts)
    # local rank of each emitted cell within its segment's nx*ny grid
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    gx = cx0[seg_idx] + local % nx[seg_idx]
    gy = cy0[seg_idx] + local // nx[seg_idx]
    return pd.DataFrame({"cell_key": (gx << 28) | gy, "seg_idx": seg_idx})


def snap_to_network(
    points: DataFrame,
    network: DataFrame,
    tolerance_m: float = 100.0,
    lon: str = "lon",
    lat: str = "lat",
    compass: str | None = None,
    line_id_col: str = "line_id",
    coords_col: str = "coords",
    round_merc: int | None = None,
) -> DataFrame:
    """Left-join each point to its nearest network line within tolerance.

    Appends: ``line_id`` (NULL if unmatched), ``snap_dist`` (3857 meters),
    ``snapped_lon``/``snapped_lat`` (4326), ``snap_pos`` (linear-referencing
    measure along the line, meters), ``seg_bearing`` (forward azimuth of the
    matched segment, deg) and — when ``compass`` is given — ``snapped_angle``
    (reference realignment semantics).

    ``round_merc``: optionally round projected coords to N decimals before
    distance math (cross-engine float-parity mode used by the oracle checks).
    """
    spark = points.sparkSession
    res = _grid_res_for_tolerance(tolerance_m)
    # memoized driver-side prep: collect + flatten + broadcast once per
    # (network, tolerance) — repeated snaps against the same network (the
    # common production shape: one road network, many probe batches) pay the
    # index build once, like the reference's persistent R-tree (snap.py:19-31).
    # The cache holds a strong ref to the network DataFrame so the id() key
    # cannot be recycled while its entry lives.
    import uuid

    ck = (id(network), line_id_col, coords_col, tolerance_m, round_merc)
    hit = _net_cache.get(ck)
    if hit is None:
        net_rows = [
            (r[0], r[1]) for r in network.select(line_id_col, coords_col).collect()
        ]
        net = _flatten_network(net_rows)
        bc = spark.sparkContext.broadcast((net, res, tolerance_m, round_merc))
        # worker-cache token: unique PER PREP, never id()-derived — after this
        # dict evicts an entry, CPython may recycle the DataFrame id, and an
        # id-based token would make long-lived python workers serve the OLD
        # network's index for the new broadcast
        token = uuid.uuid4().hex
        if len(_net_cache) >= 8:
            # destroy the evicted broadcast: executors otherwise keep its
            # blocks forever (the Broadcast ref dies, the blocks don't)
            _evicted = _net_cache.pop(next(iter(_net_cache)))
            _evicted[1].destroy()
        _net_cache[ck] = (network, bc, token)
    else:
        bc, token = hit[1], hit[2]

    in_cols = points.columns
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in points.schema)
    out_schema += (
        ", line_id bigint, snap_dist double, snapped_lon double, snapped_lat double,"
        " snap_pos double, seg_bearing double"
    )

    # executor-local cache: bucket table built once per python worker. Keyed
    # on the driver-generated per-prep token (NOT id(bc): each task unpickles
    # a fresh Broadcast proxy, so id() would miss every task; and NOT the
    # id(network)-based memo key, which can be recycled after eviction). The
    # token stays stable across repeated snaps thanks to the memo above.
    key = token

    def _get_index():
        if key not in _worker_cache:
            net_, res_, tol_, rm = bc.value
            seg = {kk: np.asarray(v) for kk, v in net_.items()}
            if rm is not None:
                for kk in ("x0", "y0", "x1", "y1"):
                    seg[kk] = np.round(seg[kk], rm)
            if len(_worker_cache) >= 8:
                _worker_cache.pop(next(iter(_worker_cache)))
            _worker_cache[key] = (seg, _bucket_segments(seg, res_, tol_), res_, tol_, rm)
        return _worker_cache[key]

    def _snap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seg, buckets, res_, tol_, rm = _get_index()
        cellsz = WORLD / (1 << res_)
        for pdf in batches:
            n = len(pdf)
            out = pdf.reset_index(drop=True).copy()
            for c in ("line_id",):
                out[c] = pd.array([None] * n, dtype="Int64")
            for c in ("snap_dist", "snapped_lon", "snapped_lat", "snap_pos", "seg_bearing"):
                out[c] = np.nan
            if n == 0 or len(seg["x0"]) == 0:
                yield out
                continue
            px = np_merc_x(pdf[lon].to_numpy(dtype=np.float64))
            py = np_merc_y(pdf[lat].to_numpy(dtype=np.float64))
            if rm is not None:
                px, py = np.round(px, rm), np.round(py, rm)
            pcx = np.floor((px + WORLD / 2) / cellsz).astype(np.int64)
            pcy = np.floor((py + WORLD / 2) / cellsz).astype(np.int64)
            pt_keys = pd.DataFrame(
                {
                    "pt_idx": np.arange(n, dtype=np.int64),
                    "cell_key": (pcx << 28) | pcy,
                }
            )
            pairs = pt_keys.merge(buckets, on="cell_key", how="inner")
            if len(pairs) == 0:
                yield out
                continue
            pi = pairs["pt_idx"].to_numpy()
            si = pairs["seg_idx"].to_numpy()
            # vectorized distance over ALL candidate pairs at once
            dx0, dy0 = seg["x0"][si], seg["y0"][si]
            dx1, dy1 = seg["x1"][si], seg["y1"][si]
            t = point_segment_t(px[pi], py[pi], dx0, dy0, dx1, dy1)
            nx = dx0 + t * (dx1 - dx0)
            ny = dy0 + t * (dy1 - dy0)
            dist = np.sqrt((px[pi] - nx) ** 2 + (py[pi] - ny) ** 2)
            ok = dist <= tol_
            if not ok.any():
                yield out
                continue
            pi, si, t, nx, ny, dist = pi[ok], si[ok], t[ok], nx[ok], ny[ok], dist[ok]
            lid = seg["line_id"][si]
            # argmin per point with stable (dist, line_id) tie-break
            order = np.lexsort((lid, dist, pi))
            pi_s = pi[order]
            first = np.ones(len(pi_s), dtype=bool)
            first[1:] = pi_s[1:] != pi_s[:-1]
            sel = order[first]
            bi, bs = pi[sel], si[sel]
            seg_len = np.sqrt(
                (seg["x1"][bs] - seg["x0"][bs]) ** 2 + (seg["y1"][bs] - seg["y0"][bs]) ** 2
            )
            s_lon, s_lat = np_inv_merc(nx[sel], ny[sel])
            brg = bearing(seg["lon0"][bs], seg["lat0"][bs], seg["lon1"][bs], seg["lat1"][bs])
            out.loc[bi,"line_id"] = seg["line_id"][bs]
            out.loc[bi,"snap_dist"] = dist[sel]
            out.loc[bi,"snapped_lon"] = s_lon
            out.loc[bi,"snapped_lat"] = s_lat
            out.loc[bi,"snap_pos"] = seg["cum0"][bs] + t[sel] * seg_len
            out.loc[bi,"seg_bearing"] = brg
            yield out

    result = points.mapInPandas(_snap, out_schema)
    if compass is not None:
        # realignment: forward or reverse segment bearing, whichever is
        # angularly closer to the compass angle (snap.py:147-153)
        b, a = F.col("seg_bearing"), F.col(compass)
        rev = (b + F.lit(180.0)) % F.lit(360.0)
        d_fwd = F.abs(((b - a + F.lit(180.0)) % F.lit(360.0)) - F.lit(180.0))
        d_rev = F.abs(((rev - a + F.lit(180.0)) % F.lit(360.0)) - F.lit(180.0))
        result = result.withColumn(
            "snapped_angle",
            F.when(F.col("seg_bearing").isNull(), F.lit(None).cast("double"))
            .when(d_fwd <= d_rev, b)
            .otherwise(rev),
        )
    _ = in_cols, align_heading  # numpy twin used in tests
    return result
