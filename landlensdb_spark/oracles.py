"""DuckDB oracle SQL generators for the non-trivially-SQL operators.

Each generator unrolls an iterative/bit-twiddling algorithm into plain ANSI
SQL so DuckDB can recompute the engine's output INDEPENDENTLY (true
cross-engine check — same rows+schema+hash discipline as the relational
oracles, no Python fixture in the loop):

- :func:`hilbert_sql` — the 13-step Hilbert xy->d rotation loop, unrolled
  into chained CTEs of integer CASE math.
- :func:`s2_sql` — the full canonical S2 construction: lon/lat -> cube face
  -> quadratic ST -> 30 unrolled face-Hilbert steps with the public
  orientation tables -> parent(level) -> sortable signed long. (Trig parity
  numpy vs DuckDB verified bit-identical on this platform; the clamped
  ``trunc`` mirrors numpy's C-cast truncation.)
- :func:`simhash_sql` — md5-based 64-bit sign-vote simhash: DuckDB's
  ``md5_number_upper`` is the little-endian first-8-bytes value, so an
  arithmetic byteswap recovers the kernel's big-endian hash; bit votes are
  HUGEINT divides (no engine-specific bit ops on 64-bit+ needed).
- :func:`fingerprint_sql` — the rolling polynomial hash as ``list_reduce``
  in HUGEINT; ``(acc * B + byte) & (2^61-1)`` == ``mod 2^61`` exactly, so
  the uint64 wraparound in the numpy kernel is immaterial.
- :func:`lsh_ann_sql` / :func:`ivf_ann_sql` — approximate-NN made
  oracle-checkable by design: the hyperplanes / trained centroids are
  deterministic constants, embedded as SQL literals; bucket signs,
  assignments and re-rank scores are sequential-dot reproductions of the
  engine's (deliberately sequential) float math.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Hilbert curve (geo/cells.py np_hilbert_d), unrolled
# --------------------------------------------------------------------------


def hilbert_sql(pts_sql: str, tile_x_sql: str, tile_y_sql: str, level: int) -> str:
    """SQL computing ``(level << 58) | hilbert_d(x, y)`` for each pts row."""
    ctes = [
        f"pts AS ({pts_sql})",
        f"h0 AS (SELECT key, {tile_x_sql} AS x, {tile_y_sql} AS y,"
        f" CAST(0 AS BIGINT) AS d FROM pts)",
    ]
    step = 0
    s = 1 << (level - 1)
    while s > 0:
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        # d += s*s * ((3*rx) XOR ry): (rx,ry) -> 0,1,3,2
        dinc = (
            f"(CASE {rx} * 2 + {ry} WHEN 0 THEN 0 WHEN 1 THEN 1"
            f" WHEN 2 THEN 3 ELSE 2 END)"
        )
        # rotate: if ry==0 { if rx==1 flip both; swap x,y }
        newx = (
            f"(CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {s - 1} - y ELSE y END) ELSE x END)"
        )
        newy = (
            f"(CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {s - 1} - x ELSE x END) ELSE y END)"
        )
        ctes.append(
            f"h{step + 1} AS (SELECT key, {newx} AS x, {newy} AS y,"
            f" d + {s * s} * {dinc} AS d FROM h{step})"
        )
        step += 1
        s >>= 1
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT key, {level * (1 << 58)} + d AS hilbert_cell FROM h{step}"
    )


# --------------------------------------------------------------------------
# Canonical S2 (geo/s2.py np_s2_cell), unrolled
# --------------------------------------------------------------------------

# _IJ_TO_POS[orientation][ij] flattened to orientation*4 + ij (inverse of the
# public _POS_TO_IJ traversal tables; see geo/s2.py:43-51)
_IJ2P_FLAT = [0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0]
_TWO61 = 1 << 61
_TWO63 = 1 << 63
_TWO64 = 1 << 64


def _st_case(u: str) -> str:
    """S2 quadratic UV->ST projection."""
    return (
        f"(CASE WHEN {u} >= 0 THEN 0.5 * sqrt(greatest(1.0 + 3.0 * {u}, 0.0))"
        f" ELSE 1.0 - 0.5 * sqrt(greatest(1.0 - 3.0 * {u}, 0.0)) END)"
    )


def s2_sql(pts_sql: str, level: int) -> str:
    max_level = 30
    ctes = [
        f"pts AS ({pts_sql})",
        # unit-sphere xyz (trig bit-parity with numpy verified on-platform)
        "c0 AS (SELECT key,"
        " cos(radians(lat)) * cos(radians(lon)) AS cx,"
        " cos(radians(lat)) * sin(radians(lon)) AS cy,"
        " sin(radians(lat)) AS cz FROM pts)",
        # largest-abs component -> face (strict >, later axis wins ties)
        "c1 AS (SELECT key, cx, cy, cz,"
        " (CASE WHEN abs(cx) > abs(cy) THEN"
        "   (CASE WHEN abs(cx) > abs(cz) THEN 0 ELSE 2 END)"
        "  ELSE (CASE WHEN abs(cy) > abs(cz) THEN 1 ELSE 2 END) END) AS f0"
        " FROM c0)",
        "c2 AS (SELECT key, cx, cy, cz,"
        " f0 + (CASE WHEN (CASE f0 WHEN 0 THEN cx WHEN 1 THEN cy ELSE cz END) < 0"
        " THEN 3 ELSE 0 END) AS face FROM c1)",
        # per-face (u, v)
        "c3 AS (SELECT key, face,"
        " (CASE face WHEN 0 THEN cy/cx WHEN 1 THEN -cx/cy WHEN 2 THEN -cx/cz"
        "  WHEN 3 THEN cz/cx WHEN 4 THEN cz/cy ELSE -cy/cz END) AS u,"
        " (CASE face WHEN 0 THEN cz/cx WHEN 1 THEN cz/cy WHEN 2 THEN -cy/cz"
        "  WHEN 3 THEN cy/cx WHEN 4 THEN -cx/cy ELSE -cx/cz END) AS v"
        " FROM c2)",
        # ST -> leaf ij (trunc = numpy's C-cast toward zero, then clip)
        "c4 AS (SELECT key, face,"
        f" least(greatest(CAST(trunc({_st_case('u')} * 1073741824.0) AS BIGINT),"
        " 0), 1073741823) AS i,"
        f" least(greatest(CAST(trunc({_st_case('v')} * 1073741824.0) AS BIGINT),"
        " 0), 1073741823) AS j"
        " FROM c3)",
        "s0 AS (SELECT key, face, i, j, CAST(0 AS BIGINT) AS pos,"
        " face % 2 AS o FROM c4)",
    ]
    ij2p = " ".join(
        f"WHEN {idx} THEN {p}" for idx, p in enumerate(_IJ2P_FLAT)
    )
    n = 0
    for k in range(max_level - 1, -1, -1):
        ij = f"(((i >> {k}) & 1) * 2 + ((j >> {k}) & 1))"
        ctes.append(
            f"t{n} AS (SELECT key, face, i, j, pos, o,"
            f" (CASE o * 4 + {ij} {ij2p} ELSE 0 END) AS stp FROM s{n})"
        )
        ctes.append(
            f"s{n + 1} AS (SELECT key, face, i, j, pos * 4 + stp AS pos,"
            " (CASE WHEN stp = 0 THEN xor(o, 1) WHEN stp = 3 THEN xor(o, 3)"
            f" ELSE o END) AS o FROM t{n})"
        )
        n += 1
    lsb = 1 << (2 * (max_level - level))
    ctes.append(
        f"leafed AS (SELECT key, CAST(face AS HUGEINT) * {_TWO61}"
        f" + CAST(pos AS HUGEINT) * 2 + 1 AS leaf FROM s{n})"
    )
    # parent(level) = clear bits 0..(2*(30-level)) THEN set the lsb bit:
    # modulus 2*lsb zeroes through the lsb position so the +lsb never carries
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT key,
  CAST((leaf - (leaf % {2 * lsb}) + {lsb}) - {_TWO63} AS BIGINT) AS s2_cell
FROM leafed"""
    )


# --------------------------------------------------------------------------
# SimHash (operators/dedup.py _np_simhash)
# --------------------------------------------------------------------------


def simhash_sql(n: int = 2) -> str:
    """Bigram-shingle 64-bit simhash over ``documents`` — md5 upper half,
    big-endian, sign-voted per bit."""
    # arithmetic byteswap: md5_number_upper is little-endian first-8-bytes;
    # the kernel uses big-endian, i.e. byte b gains weight 2^(8*(7-b))
    swap_terms = " + ".join(
        f"((hle // {1 << (8 * b)}) % 256) * CAST({1 << (8 * (7 - b))} AS HUGEINT)"
        for b in range(8)
    )
    pow_rows = ", ".join(f"({b}, CAST({1 << b} AS HUGEINT))" for b in range(64))
    shingle_expr = " || ' ' || ".join(f"w[i+{d + 1}]" for d in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(0, len(w) - {n - 1}), i -> {shingle_expr}
         ))) AS shingle
  FROM toks WHERE len(w) >= {n}
),
hb AS (
  SELECT doc_id, {swap_terms} AS h
  FROM (SELECT doc_id, CAST(md5_number_upper(shingle) AS HUGEINT) AS hle FROM sh)
),
pows(b, p) AS (VALUES {pow_rows}),
votes AS (
  SELECT doc_id, b, p,
         SUM(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM hb CROSS JOIN pows GROUP BY 1, 2, 3
),
sim AS (
  SELECT doc_id, SUM(CASE WHEN v > 0 THEN p ELSE CAST(0 AS HUGEINT) END) AS uval
  FROM votes GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(
         CASE WHEN s.uval >= {_TWO63} THEN s.uval - {_TWO64} ELSE s.uval END,
         0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sim s ON d.doc_id = s.doc_id
"""


# --------------------------------------------------------------------------
# Rolling-hash fingerprint (operators/textstats.py np_fingerprint)
# --------------------------------------------------------------------------


def fingerprint_sql(base: int = 1000003) -> str:
    """``acc = (acc * B + byte) mod 2^61`` over the utf-8 bytes — documents
    text is ASCII so ``ascii(substr(...))`` IS the byte sequence. The numpy
    kernel's uint64 wrap then 61-bit mask equals a straight mod 2^61
    (2^61 divides 2^64), so HUGEINT arithmetic reproduces it exactly."""
    return f"""
SELECT doc_id,
  CAST(list_reduce(
    list_prepend(CAST(0 AS HUGEINT),
      list_transform(range(1, length(coalesce(text, '')) + 1),
                     i -> CAST(ascii(substr(coalesce(text, ''), i, 1)) AS HUGEINT))),
    (acc, b) -> (acc * {base} + b) % {1 << 61}
  ) AS BIGINT) AS fingerprint
FROM documents
"""


# --------------------------------------------------------------------------
# ANN oracles: hyperplane-LSH and IVF-Flat with literal constants
# --------------------------------------------------------------------------

_EMB = "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"


def _vec_lit(vec: np.ndarray) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def lsh_ann_sql(planes: np.ndarray, k: int, n_probes_id_below: int) -> str:
    """Same-bucket hyperplane-LSH top-k with the engine's planes inlined as
    literals: bucket bit b = sign of the (sequential) plane dot."""
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_vec_lit(planes[b])}) > 0"
        f" THEN {1 << b} ELSE 0 END)"
        for b in range(planes.shape[0])
    )
    return f"""
WITH e AS ({_EMB}),
b AS (SELECT vec_id, v, {bucket} AS bkt FROM e),
prb AS (SELECT vec_id AS probe_id, v AS pv, bkt FROM b WHERE vec_id < {n_probes_id_below}),
pairs AS (
  SELECT probe_id, vec_id,
         list_dot_product(pv, v)
           / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))) AS score
  FROM prb JOIN b USING (bkt)
)
SELECT probe_id, vec_id, round(score, 6) AS score, rank FROM (
  SELECT probe_id, vec_id, score,
         row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, vec_id) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


def ivf_ann_sql(centroids: np.ndarray, k: int, n_probe: int, n_probes_id_below: int) -> str:
    """IVF-Flat top-k with the trained (unit) centroids inlined: points take
    their argmax-dot cell (ties -> smallest id), probes scan their n_probe
    best cells, exact re-rank inside."""
    cent_rows = ", ".join(
        f"({cid}, {_vec_lit(centroids[cid])})" for cid in range(len(centroids))
    )
    return f"""
WITH e AS ({_EMB}),
cent(cid, c) AS (VALUES {cent_rows}),
pa AS (
  SELECT vec_id, v, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY list_dot_product(v, c) DESC, cid) AS rn
  FROM e CROSS JOIN cent
),
pcell AS (SELECT vec_id, v, cid FROM pa WHERE rn = 1),
prb AS (SELECT vec_id AS probe_id, v AS pv, cid FROM pa
        WHERE vec_id < {n_probes_id_below} AND rn <= {n_probe}),
pairs AS (
  SELECT probe_id, p.vec_id,
         list_dot_product(pv, p.v)
           / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(p.v, p.v))) AS score
  FROM prb JOIN pcell p USING (cid)
)
SELECT probe_id, vec_id, round(score, 6) AS score, rank FROM (
  SELECT probe_id, vec_id, score,
         row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, vec_id) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


# --------------------------------------------------------------------------
# Hex cell index (geo/hex.py hex_encode), axial + cube rounding unrolled
# --------------------------------------------------------------------------


def hex_sql(pts_sql: str, res: int) -> str:
    """DuckDB twin of :func:`landlensdb_spark.geo.hex.hex_encode` plus the
    q/r decode — same mercator projection, same fractional-axial formulas,
    same floor(v+0.5) rounding and largest-error cube repair, same 64-bit
    packing. floor() ties and the strict-inequality repair order must match
    the Spark build exactly; both engines evaluate them on IEEE doubles in
    the same order, which the driver's value-hash verifies."""
    import math

    from landlensdb_spark.geo.hex import SQRT3, _BIAS, _Q_SHIFT, _RES_SHIFT, hex_edge_m
    from landlensdb_spark.geo.mercator import R

    e = hex_edge_m(res)
    return f"""
WITH pts AS ({pts_sql}),
m AS (SELECT key,
        LEAST(GREATEST(radians(lon) * {R!r}, -{math.pi * R!r}), {math.pi * R!r}) AS x,
        LEAST(GREATEST({R!r} * ln(tan(pi()/4 + radians(lat)/2)),
                       -{math.pi * R!r}), {math.pi * R!r}) AS y
      FROM pts),
f AS (SELECT key,
        (x * {SQRT3 / 3.0!r} - y / 3.0) / {e!r} AS fq,
        (y * {2.0 / 3.0!r}) / {e!r} AS fr
      FROM m),
c AS (SELECT key, fq, fr, -fq - fr AS fy,
        CAST(floor(fq + 0.5) AS BIGINT) AS rx,
        CAST(floor(-fq - fr + 0.5) AS BIGINT) AS ry,
        CAST(floor(fr + 0.5) AS BIGINT) AS rz
      FROM f),
d AS (SELECT key, rx, ry, rz,
        abs(rx - fq) AS dx, abs(ry - fy) AS dy, abs(rz - fr) AS dz
      FROM c),
a AS (SELECT key,
        LEAST(GREATEST(
          CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END,
          -{_BIAS}), {_BIAS - 1}) AS q,
        LEAST(GREATEST(
          CASE WHEN dx > dy AND dx > dz THEN rz
               WHEN dy > dz THEN rz
               ELSE -rx - ry END,
          -{_BIAS}), {_BIAS - 1}) AS r
      FROM d)
SELECT key,
       CAST({res} AS BIGINT) * {1 << _RES_SHIFT} + (q + {_BIAS}) * {1 << _Q_SHIFT}
         + (r + {_BIAS}) AS hex,
       CAST(q AS INTEGER) AS hq,
       CAST(r AS INTEGER) AS hr
FROM a
"""


def hex_polyfill_sql(res: int, q_span: int, r_span: int) -> str:
    """DuckDB twin of ``hex_polyfill`` over the synthetic 24x16 PARCEL grid
    (``synth.parcel_polygons`` — offset so no hex center sits on a
    boundary; the admin grid is commensurate with the hex center lattice
    and therefore rounding-ambiguous, see synth.py): enumerate a superset
    (q, r) rectangle of res-``res`` axial coordinates, compute each cell
    center with the SAME double formulas as ``np_hex_center_xy`` +
    ``np_inv_merc`` (constants pre-multiplied in Python so both engines
    see identical IEEE operands), keep centers in the half-open parcel
    block, and bin them with the closed-open ``parcel_bin_sql`` floor —
    which is exactly what the engine's half-open even-odd ray-cast
    computes for axis-aligned rectangle rings (proven in
    tests/test_geometry.py). ``q_span``/``r_span`` must enclose every
    center in the parcel block (res 6 needs |q| <= 40, |r| <= 25; callers
    pass a margin)."""
    import math

    from landlensdb_spark import synth
    from landlensdb_spark.geo.hex import (
        SQRT3,
        _BIAS,
        _Q_SHIFT,
        _RES_SHIFT,
        hex_edge_m,
    )
    from landlensdb_spark.geo.mercator import R

    e = hex_edge_m(res)
    return f"""
WITH qr AS (
  SELECT qq.q AS q, rr.r AS r
  FROM (SELECT unnest(generate_series({-q_span}, {q_span})) AS q) qq
  CROSS JOIN (SELECT unnest(generate_series({-r_span}, {r_span})) AS r) rr
),
c AS (SELECT q, r,
        {e!r} * ({SQRT3!r} * q + {SQRT3 / 2.0!r} * r) AS cx,
        {e * 1.5!r} * r AS cy
      FROM qr),
g AS (SELECT q, r,
        degrees(cx / {R!r}) AS lon,
        degrees(2.0 * atan(exp(cy / {R!r})) - {math.pi / 2.0!r}) AS lat
      FROM c)
SELECT CAST({synth.parcel_bin_sql('lon', 'lat')} AS BIGINT) AS parcel_id,
       CAST({res} AS BIGINT) * {1 << _RES_SHIFT} + (q + {_BIAS}) * {1 << _Q_SHIFT}
         + (r + {_BIAS}) AS cell
FROM g
WHERE lon >= {synth.PARCEL_X0!r} AND lon < {synth.PARCEL_X1!r}
  AND lat >= {synth.PARCEL_Y0!r} AND lat < {synth.PARCEL_Y1!r}
"""


# --------------------------------------------------------------------------
# Cell-cover compaction (geo/cells.py compact_cells), levels unrolled
# --------------------------------------------------------------------------


def compact_cover_sql(pts_sql: str, res: int, levels: int) -> str:
    """DuckDB twin of bbox-cover -> ``compact_cells``: the solid tile cover
    of the point field's bounds at ``res``, then ``levels`` unrolled
    sibling-collapse steps (complete 4-blocks -> parent; ``levels`` must
    exceed the deepest possible collapse, log4(|cover|), so the unroll
    reaches the same fixed point as the engine's loop-to-fixed-point)."""
    from landlensdb_spark import synth
    from landlensdb_spark.geo.cells import _RES_SHIFT, _X_SHIFT

    ctes = [
        f"pts AS ({pts_sql})",
        "b AS (SELECT min(lon) AS minlon, max(lon) AS maxlon,"
        " min(lat) AS minlat, max(lat) AS maxlat FROM pts)",
        f"r AS (SELECT {synth.tile_x_sql('minlon', res)} AS x0,"
        f" {synth.tile_x_sql('maxlon', res)} AS x1,"
        f" {synth.tile_y_sql('maxlat', res)} AS y0,"
        f" {synth.tile_y_sql('minlat', res)} AS y1 FROM b)",
        "xs AS (SELECT unnest(generate_series(x0, x1)) AS x FROM r)",
        "ys AS (SELECT unnest(generate_series(y0, y1)) AS y FROM r)",
        f"l{res} AS (SELECT CAST({res} AS BIGINT) AS res, x, y"
        " FROM xs CROSS JOIN ys)",
    ]
    keeps = []
    for n in range(res, res - levels, -1):
        ctes.append(
            f"p{n} AS (SELECT CAST({n - 1} AS BIGINT) AS res,"
            f" x // 2 AS x, y // 2 AS y FROM l{n}"
            " GROUP BY x // 2, y // 2 HAVING count(*) = 4)"
        )
        ctes.append(
            f"k{n} AS (SELECT l.res, l.x, l.y FROM l{n} l"
            f" LEFT JOIN p{n} p ON p.x = l.x // 2 AND p.y = l.y // 2"
            " WHERE p.x IS NULL)"
        )
        ctes.append(f"l{n - 1} AS (SELECT res, x, y FROM p{n})")
        keeps.append(f"SELECT res, x, y FROM k{n}")
    keeps.append(f"SELECT res, x, y FROM l{res - levels}")
    union = " UNION ALL ".join(keeps)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT res * {1 << _RES_SHIFT} + x * {1 << _X_SHIFT} + y AS cell
FROM ({union})
"""
    )


def hull_sql(limit_key: int = 128, groups: int = 4) -> str:
    """Caratheodory extreme-point oracle for :func:`operators.hull.
    convex_hull` — deliberately NOT a SQL transcription of the monotone
    chain. In the plane, p lies in conv(S \\ {p}) iff some closed
    NON-degenerate triangle of three other points contains it, or it lies
    on a closed segment between two other points (the affinely-dependent
    case); p is extreme iff neither witness exists. Both witness tests
    are pure sign arithmetic on integer-lattice coordinates (< 2^10), so
    every product is exact in IEEE doubles in BOTH engines regardless of
    expression-evaluation order — no epsilon anywhere. O(n^4) per group,
    which is exactly why it lives in the oracle (32 points/group here)
    and the engine runs Andrew's chain instead."""
    pts = (
        f"SELECT DISTINCT (o_orderkey % {groups}) AS g,"
        " CAST((o_orderkey * 2654435761) % 1009 AS DOUBLE) AS x,"
        " CAST(((o_orderkey + 13) * 2246822519) % 1013 AS DOUBLE) AS y"
        f" FROM orders WHERE o_orderkey < {limit_key}"
    )
    return f"""
WITH pts AS ({pts})
SELECT p.g, p.x, p.y
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts a, pts b, pts c
  WHERE a.g = p.g AND b.g = p.g AND c.g = p.g
    AND NOT (a.x = p.x AND a.y = p.y)
    AND NOT (b.x = p.x AND b.y = p.y)
    AND NOT (c.x = p.x AND c.y = p.y)
    AND (b.x - a.x) * (c.y - a.y) - (b.y - a.y) * (c.x - a.x) > 0
    AND (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) >= 0
    AND (c.x - b.x) * (p.y - b.y) - (c.y - b.y) * (p.x - b.x) >= 0
    AND (a.x - c.x) * (p.y - c.y) - (a.y - c.y) * (p.x - c.x) >= 0
)
AND NOT EXISTS (
  SELECT 1 FROM pts a, pts b
  WHERE a.g = p.g AND b.g = p.g
    AND NOT (a.x = p.x AND a.y = p.y)
    AND NOT (b.x = p.x AND b.y = p.y)
    AND (b.x - a.x) * (p.y - a.y) - (b.y - a.y) * (p.x - a.x) = 0
    AND (a.x - p.x) * (b.x - p.x) + (a.y - p.y) * (b.y - p.y) <= 0
)
"""


def hull_diameter_sql(limit_key: int = 512, groups: int = 4) -> str:
    """Brute-force farthest-pair oracle for :func:`operators.hull.
    group_diameter` — the O(n^2) max the engine's hull pruning avoids,
    affordable in DuckDB at oracle scale. Squared distances on
    integer-lattice coordinates are exact in IEEE doubles, so the
    engine's hull-vertex pairwise max must match bit-for-bit."""
    pts = (
        f"SELECT DISTINCT (o_orderkey % {groups}) AS g,"
        " CAST((o_orderkey * 2654435761) % 1009 AS DOUBLE) AS x,"
        " CAST(((o_orderkey + 13) * 2246822519) % 1013 AS DOUBLE) AS y"
        f" FROM orders WHERE o_orderkey < {limit_key}"
    )
    return f"""
WITH pts AS ({pts})
SELECT a.g,
       MAX((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS diam2
FROM pts a JOIN pts b ON a.g = b.g
GROUP BY a.g
"""
