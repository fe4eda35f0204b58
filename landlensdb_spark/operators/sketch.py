"""Deterministic, engine-exact sketches: HyperLogLog (distinct count),
Count-Min (frequency / heavy hitters) and KMV (distinct count + set
overlap). All three share the repo's arithmetic hash family so Spark and
the DuckDB oracle produce bit-identical sketch values.

``approx_count_distinct`` exists in both Spark and DuckDB but their
sketches differ (different hashes, different register layouts), so their
estimates can never be cross-checked value-exactly. This HLL is built on
the repo's own deterministic arithmetic hashes with an INTEGER-EXACT
register sum, so Spark and the DuckDB oracle produce bit-identical
estimates — the same "deterministic twin over engine builtin" trade
every operator in this repo makes (SURVEY §4; cf. the reference's
DB-side counts, /root/reference/landlensdb/handlers/db.py aggregates).

Standard HLL (Flajolet-Fuchs-Gandouet-Meunier 2007, public), in the
two-independent-hash form: hash A's leading-zero rank feeds the register
max, hash B picks the register — independence of (bucket, rho) is what
the estimator needs, and splitting one linear multiply-mod hash into
(low bits, high bits) does NOT provide it (measured: 50-80% error on
sequential keys). Each hash is a multiply-mod base with a murmur-style
xor-shift-multiply finalizer, all inside [0, MIX_MOD) so every product
fits int64 under ANSI overflow checking in BOTH engines.

Determinism details that make the oracle exact:

- the harmonic sum is computed as an integer — ``sum_j 2^(SHIFT - M_j)``
  with ``SHIFT = 31 >= max rho`` fits BIGINT (``<= m * 2^31``) — so no
  float summation order can differ between engines; the final division
  is one correctly-rounded double op in both;
- ``rho`` uses ``length(bin(h))`` — Spark and DuckDB both render
  minimal binary strings (pinned in tests) — not ``floor(log2())``,
  whose libm rounding at exact powers of two is not portable;
- the only transcendental (``ln`` in the linear-counting branch) is one
  call on identical operands; the estimate is rounded to 6 decimals to
  absorb a potential 1-ulp libm difference.

MEASURED accuracy at p=8 (m=256, theoretical sigma 1.04/sqrt(m) = 6.5%):
mean |rel err| 6.7% over twenty 1k-key sequential windows (max 18%),
8.8% over five 50k windows, 1.1% at 1M — standard HLL behavior with a
mild high-cardinality over-bias from the 30-bit hash space; raise p for
tighter estimates. The point of this operator over the builtin is
DETERMINISM: identical output across engines, reruns, partitionings and
cluster sizes, so sketch values can be stored, diffed and oracle-checked.

Scale: two aggregations — (group, bucket) with map-side combine (at most
``m`` rows per group per partition cross the shuffle, regardless of row
count), then ``m``-row register folds per group. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from landlensdb_spark.operators.sampling import (
    MIX_MOD,
    MIX_MUL,
    mix_key_sql,
    str_mix,
    str_mix_sql,
)

#: xor-shift-multiply finalizer constants (odd multipliers < 2^31 — the
#: xorshift* / murmur-finalizer construction, public; values are xxHash/
#: murmur-family primes). Two parameter sets give the two independent
#: hashes HLL needs.
_FIN_A = (1099087573, 2246822519)
_FIN_B = (2654435761, 1299709)
#: additive tweak separating hash B's input stream from hash A's.
_TWEAK = 777_767_777
#: max rho: bitlen(MIX_MOD - 1) + 1 — registers and the integer harmonic
#: sum are bounded by 2^31 and m * 2^31 respectively.
_SHIFT = (MIX_MOD - 1).bit_length() + 1


def _alpha(m: int) -> float:
    """Flajolet et al. bias-correction constants."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _fin(h: Column, muls: tuple[int, int]) -> Column:
    """Murmur-style finalizer in [0, MIX_MOD): every product stays under
    2^30 * 2^31.5 < 2^62 — no ANSI overflow in either engine."""
    h = F.pmod(h.bitwiseXOR(F.shiftright(h, 15)) * F.lit(muls[0]), F.lit(MIX_MOD))
    h = F.pmod(h.bitwiseXOR(F.shiftright(h, 13)) * F.lit(muls[1]), F.lit(MIX_MOD))
    return h.bitwiseXOR(F.shiftright(h, 16))


def _fin_sql(expr: str, muls: tuple[int, int]) -> str:
    s1 = f"(xor(({expr}), ({expr}) >> 15) * {muls[0]}) % {MIX_MOD}"
    s2 = f"(xor(({s1}), ({s1}) >> 13) * {muls[1]}) % {MIX_MOD}"
    return f"xor(({s2}), ({s2}) >> 16)"


def _base(key: str, key_kind: str) -> Column:
    if key_kind == "long":
        return F.pmod(
            F.pmod(F.col(key).cast("long"), F.lit(MIX_MOD)) * F.lit(MIX_MUL),
            F.lit(MIX_MOD),
        )
    if key_kind == "string":
        return str_mix(key)
    raise ValueError(f"hll: key_kind must be long|string, got {key_kind!r}")


def _base_sql(key_expr: str, key_kind: str) -> str:
    return (
        mix_key_sql(key_expr) if key_kind == "long" else str_mix_sql(key_expr)
    )


def hll_distinct(
    df: DataFrame,
    key: str,
    group: str | None = None,
    p: int = 8,
    key_kind: str = "long",
    out: str = "hll_distinct",
) -> DataFrame:
    """Estimated distinct ``key`` count (per ``group`` if given), as one
    double column rounded to 6 decimals. ``key_kind`` picks the base
    hash: ``"long"`` (Weyl mix) or ``"string"`` (codepoint fold)."""
    if not 2 <= p <= 12:
        raise ValueError(f"hll: p must be in [2, 12], got {p}")
    m = 1 << p
    base = _base(key, key_kind)
    ha = _fin(base, _FIN_A)
    hb = _fin(F.pmod(base + F.lit(_TWEAK), F.lit(MIX_MOD)), _FIN_B)
    bucket = F.pmod(hb, F.lit(m))
    rho = F.lit(_SHIFT) - F.when(ha > 0, F.length(F.bin(ha))).otherwise(F.lit(0))
    gcols = [group] if group is not None else []
    regs = (
        df.select(*gcols, bucket.alias("_b"), rho.alias("_rho"))
        .groupBy(*gcols, "_b")
        .agg(F.max("_rho").alias("_M"))
    )
    return _hll_fold(regs, gcols, m, out)


def _hll_fold(regs: DataFrame, gcols: list, m: int, out: str) -> DataFrame:
    """Registers ``(gcols..., _b, _M)`` -> per-group estimate (the shared
    last mile of :func:`hll_distinct` and :func:`hll_pyramid`)."""
    folded = regs.groupBy(*gcols).agg(
        F.sum(F.expr(f"cast(shiftleft(1, {_SHIFT} - _M) as bigint)")).alias("_s"),
        F.count("*").alias("_n"),
    )
    num = _alpha(m) * m * m * float(1 << _SHIFT)
    sum_int = F.col("_s") + (F.lit(m) - F.col("_n")) * F.lit(1 << _SHIFT)
    v = (F.lit(m) - F.col("_n")).cast("double")
    raw = F.lit(num) / sum_int.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return folded.select(*gcols, F.round(est, 6).alias(out))


#: zoom / x / y packing for hll_pyramid's group key (x, y < 2^26).
_PYR_Z_SHIFT, _PYR_X_SHIFT = 52, 26


def hll_pyramid(
    df: DataFrame,
    key: str,
    x: str = "tile_x",
    y: str = "tile_y",
    zoom: int = 12,
    min_zoom: int = 8,
    p: int = 8,
    key_kind: str = "long",
    out: str = "hll_distinct",
) -> DataFrame:
    """Distinct-count tile pyramid WITHOUT rescanning: per-tile HLL
    registers are computed ONCE at ``zoom`` from the input rows
    ``(x, y, key)``, then merged up the ancestor chain (register max per
    bucket — HLL's mergeability is the whole point of a sketch at
    100 TB: the rollup touches ``m`` register rows per tile, never the
    data again). Because max is associative, the estimate at EVERY
    level is bit-identical to running :func:`hll_distinct` directly on
    that level's groups — which is exactly what the driver oracle
    asserts. Output: ``(g, <out>)`` for every zoom in
    [``min_zoom``, ``zoom``], with ``g = zoom << 52 | x << 26 | y``."""
    if not 0 <= min_zoom <= zoom:
        raise ValueError(f"hll_pyramid: need 0 <= min_zoom <= zoom, got {min_zoom}/{zoom}")
    if zoom > 26:
        # g packs zoom<<52 | x<<26 | y: slippy coords at zoom z satisfy
        # x, y < 2^z, so zoom > 26 would silently collide group keys (and
        # the per-level int cast below would truncate) — refuse loudly,
        # same discipline as cluster._cell_key / sfc_ranges max_cells.
        raise ValueError(f"hll_pyramid: zoom must be <= 26 (key packs y into 26 bits), got {zoom}")
    if not 2 <= p <= 12:
        raise ValueError(f"hll: p must be in [2, 12], got {p}")
    m = 1 << p
    base = _base(key, key_kind)
    ha = _fin(base, _FIN_A)
    hb = _fin(F.pmod(base + F.lit(_TWEAK), F.lit(MIX_MOD)), _FIN_B)
    bucket = F.pmod(hb, F.lit(m))
    rho = F.lit(_SHIFT) - F.when(ha > 0, F.length(F.bin(ha))).otherwise(F.lit(0))
    regs = (
        df.select(
            F.col(x).cast("long").alias("_x"),
            F.col(y).cast("long").alias("_y"),
            bucket.alias("_b"),
            rho.alias("_rho"),
        )
        .groupBy("_x", "_y", "_b")
        .agg(F.max("_rho").alias("_M"))
    )
    levels = []
    for z in range(zoom, min_zoom - 1, -1):
        if z < zoom:  # merge one level up: register max over the 4 children
            regs = (
                regs.select(
                    F.shiftright(F.col("_x").cast("int"), 1).cast("long").alias("_x"),
                    F.shiftright(F.col("_y").cast("int"), 1).cast("long").alias("_y"),
                    "_b",
                    "_M",
                )
                .groupBy("_x", "_y", "_b")
                .agg(F.max("_M").alias("_M"))
            )
            regs = regs.localCheckpoint(eager=True)  # truncate the chain
        g = (
            F.lit(z) * F.lit(1 << _PYR_Z_SHIFT)
            + F.col("_x") * F.lit(1 << _PYR_X_SHIFT)
            + F.col("_y")
        )
        levels.append(_hll_fold(regs.withColumn("g", g), ["g"], m, out))
    res = levels[0]
    for lv in levels[1:]:
        res = res.unionByName(lv)
    return res


def hll_distinct_sql(
    table_sql: str,
    key_expr: str,
    group_expr: str | None = None,
    p: int = 8,
    key_kind: str = "long",
    out: str = "hll_distinct",
) -> str:
    """The exact DuckDB twin of :func:`hll_distinct` (same hashes, same
    integer register sum, same branch and rounding). NOTE DuckDB's ``^``
    is exponentiation — bitwise xor is the ``xor()`` function."""
    if not 2 <= p <= 12:
        raise ValueError(f"hll: p must be in [2, 12], got {p}")
    m = 1 << p
    num = _alpha(m) * m * m * float(1 << _SHIFT)
    base = _base_sql(key_expr, key_kind)
    g_sel = f"{group_expr} AS g, " if group_expr is not None else ""
    g_cols = "g, " if group_expr is not None else ""
    g_by_regs = "GROUP BY g, _b" if group_expr is not None else "GROUP BY _b"
    g_by_fold = "GROUP BY g" if group_expr is not None else ""
    g_out = "g, " if group_expr is not None else ""
    return f"""
WITH based AS (
  SELECT {g_sel}CAST(({base}) AS BIGINT) AS h0 FROM {table_sql}
),
hashed AS (
  SELECT {g_cols}{_fin_sql('h0', _FIN_A)} AS ha,
         {_fin_sql(f'(h0 + {_TWEAK}) % {MIX_MOD}', _FIN_B)} AS hb
  FROM based
),
rows_ AS (
  SELECT {g_cols}hb % {m} AS _b,
         {_SHIFT} - CASE WHEN ha > 0 THEN length(bin(ha)) ELSE 0 END AS _rho
  FROM hashed
),
regs AS (
  SELECT {g_cols}_b, max(_rho) AS _M FROM rows_ {g_by_regs}
),
folded AS (
  SELECT {g_cols}sum(CAST(1 AS BIGINT) << ({_SHIFT} - _M)) AS _s,
         count(*) AS _n
  FROM regs {g_by_fold}
)
SELECT {g_out}round(
  CASE WHEN ({num!r} / CAST(_s + ({m} - _n) * {1 << _SHIFT} AS DOUBLE)) <= {2.5 * m!r}
        AND CAST({m} - _n AS DOUBLE) > 0
       THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - _n AS DOUBLE))
       ELSE {num!r} / CAST(_s + ({m} - _n) * {1 << _SHIFT} AS DOUBLE)
  END, 6) AS {out}
FROM folded
"""


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode-Muthukrishnan 2005, public): d x w counter
# matrix; est(key) = min over depths of counter[d][bucket_d(key)]. Never
# underestimates (every counter the key touches holds its true count plus
# non-negative collision mass); overestimate is bounded by the collision
# mass in the key's LEAST loaded row. Counters are plain integer counts,
# so Spark and the oracle agree EXACTLY, not just approximately.
#
# Scale: the build is one groupBy((depth, bucket)) with map-side combine —
# at most d*w counter rows leave each partition REGARDLESS of input rows,
# and the finished sketch (d*w rows) is broadcast to probe. This is the
# standard pre-join skew profile: estimate candidate-key frequencies in
# one cheap pass, then salt/isolate the heavy keys (cf. the bench's urban
# tile cells and ARCHITECTURE.md's salting notes).
# ---------------------------------------------------------------------------

#: per-depth input-stream separation for the Count-Min bucket hashes (the
#: same additive construction that separates HLL's hash B from hash A).
_CM_STEP = 514_229_017


def _cm_bucket(base: Column, depth: int, w: int) -> Column:
    return F.pmod(
        _fin(F.pmod(base + F.lit(depth * _CM_STEP), F.lit(MIX_MOD)), _FIN_B),
        F.lit(w),
    )


def _cm_bucket_sql(base_expr: str, depth: int, w: int) -> str:
    return f"({_fin_sql(f'(({base_expr}) + {depth * _CM_STEP}) % {MIX_MOD}', _FIN_B)}) % {w}"


def cm_counts(
    df: DataFrame,
    key: str,
    probes: DataFrame,
    d: int = 4,
    w: int = 1024,
    key_kind: str = "long",
    out: str = "cm_count",
) -> DataFrame:
    """Count-Min frequency estimate of each ``probes`` row's ``key`` over
    ``df``. Returns ``probes``' key column plus ``out`` (bigint; >= the
    true count, exactly equal when no depth collides). ``probes`` must be
    small enough to broadcast — it is the candidate-key list (heavy-hitter
    suspects, join keys to salt), not the data."""
    if not 1 <= d <= 8:
        raise ValueError(f"cm: d must be in [1, 8], got {d}")
    if w < 2:
        raise ValueError(f"cm: w must be >= 2, got {w}")
    base = _base(key, key_kind)
    sk = (
        df.select(
            F.posexplode(
                F.array(*[_cm_bucket(base, i, w) for i in range(d)])
            ).alias("_d", "_b")
        )
        .groupBy("_d", "_b")
        .agg(F.count("*").alias("_c"))
    )
    pbase = _base(key, key_kind)
    pe = probes.select(
        key,
        F.posexplode(F.array(*[_cm_bucket(pbase, i, w) for i in range(d)])).alias(
            "_d", "_b"
        ),
    )
    return (
        pe.join(F.broadcast(sk), ["_d", "_b"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("_c"), F.lit(0))).alias(out))
    )


def cm_counts_sql(
    table_sql: str,
    key_expr: str,
    probes_sql: str,
    d: int = 4,
    w: int = 1024,
    key_kind: str = "long",
    out: str = "cm_count",
    key_out: str = "key",
) -> str:
    """Exact DuckDB twin of :func:`cm_counts`. ``probes_sql`` must yield
    one column named ``key_out`` holding the probe keys; ``key_expr`` is
    evaluated against ``table_sql`` rows (and ``key_out`` against the
    probe rows) before hashing."""
    if not 1 <= d <= 8:
        raise ValueError(f"cm: d must be in [1, 8], got {d}")
    if w < 2:
        raise ValueError(f"cm: w must be >= 2, got {w}")
    base = _base_sql(key_expr, key_kind)
    pbase = _base_sql(key_out, key_kind)
    build_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS _d, {_cm_bucket_sql('h0', i, w)} AS _b FROM based"
        for i in range(d)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT {key_out}, {i} AS _d, {_cm_bucket_sql('p0', i, w)} AS _b FROM pbased"
        for i in range(d)
    )
    return f"""
WITH based AS (SELECT CAST(({base}) AS BIGINT) AS h0 FROM {table_sql}),
sk AS (SELECT _d, _b, count(*) AS _c FROM ({build_rows}) GROUP BY _d, _b),
pbased AS (SELECT {key_out}, CAST(({pbase}) AS BIGINT) AS p0 FROM ({probes_sql})),
pe AS ({probe_rows})
SELECT pe.{key_out}, min(coalesce(sk._c, 0)) AS {out}
FROM pe LEFT JOIN sk USING (_d, _b)
GROUP BY pe.{key_out}
"""


# ---------------------------------------------------------------------------
# KMV / bottom-k sketch (Bar-Yossef et al. 2002 "Counting distinct
# elements in a data stream"; Beyer et al. 2007 for the set-operation
# estimators — both public): keep the k SMALLEST distinct hash values;
# with hashes uniform on [0, MIX_MOD) the k-th smallest is around
# k*MOD/n, so est = (k-1) * MOD / h_(k). Unlike HLL, the sketch retains
# actual hash values, so two sketches support UNION / INTERSECTION /
# Jaccard estimates: merge-then-truncate is again a KMV sketch of the
# union, and the fraction of its survivors present in both input sketches
# estimates the Jaccard coefficient.
#
# Scale: dedup is a map-side-combined groupBy on (group, hash); the
# top-k selection is TWO bounded windows — first within (group,
# hash % buckets) so at most buckets*k rows per group reach the final
# per-group window — never a global sort, never a single task.
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    key: str,
    group: str | None = None,
    k: int = 64,
    key_kind: str = "long",
    buckets: int = 8,
) -> DataFrame:
    """The k smallest distinct key-hash values (per ``group`` if given):
    rows ``(group?, _h)`` with ``_h`` ascending-dense in [0, MIX_MOD)."""
    if k < 2:
        raise ValueError(f"kmv: k must be >= 2, got {k}")
    gcols = [group] if group is not None else []
    h = _fin(_base(key, key_kind), _FIN_A)
    dedup = df.select(*gcols, h.alias("_h")).distinct()
    w1 = Window.partitionBy(
        *gcols, F.pmod(F.col("_h"), F.lit(buckets))
    ).orderBy("_h")
    w2 = Window.partitionBy(*gcols).orderBy("_h")
    return (
        dedup.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select(*gcols, "_h")
    )


def _kmv_est(n: Column, hk: Column, k: int) -> Column:
    # fewer than k distinct hashes -> the sketch IS the full set (exact);
    # the estimate is rounded to 6 decimals (one double divide in both
    # engines, but rounding also absorbs any future estimator tweak).
    return F.round(
        F.when(n < k, n.cast("double")).otherwise(
            F.lit(float((k - 1) * MIX_MOD)) / hk.cast("double")
        ),
        6,
    )


def kmv_distinct(
    df: DataFrame,
    key: str,
    group: str | None = None,
    k: int = 64,
    key_kind: str = "long",
    out: str = "kmv_distinct",
) -> DataFrame:
    """Estimated distinct ``key`` count per ``group`` from a KMV sketch
    (exact below k distinct values)."""
    gcols = [group] if group is not None else []
    sk = kmv_sketch(df, key, group, k, key_kind)
    return sk.groupBy(*gcols).agg(
        _kmv_est(F.count("*"), F.max("_h"), k).alias(out)
    )


def kmv_overlap(
    df: DataFrame,
    key: str,
    group: str,
    k: int = 64,
    key_kind: str = "long",
) -> DataFrame:
    """Pairwise set-overlap estimates between every two ``group`` values
    (g_a < g_b): ``jaccard_est`` (fraction of the merged sketch's
    survivors present in both sides), ``union_est`` (KMV estimate on the
    merged sketch) and ``inter_est = round(jaccard * union, 6)``. The
    number of groups is assumed small (it is the comparison axis, not the
    data axis); each pair's merge handles at most 2k sketch rows."""
    sk = kmv_sketch(df, key, group, k, key_kind)
    # pair table: tiny (groups x groups), broadcast into two equi-joins —
    # no OR-condition nested-loop join anywhere.
    gs = sk.select(F.col(group).alias("_g")).distinct()
    pairs = (
        gs.select(F.col("_g").alias("g_a"))
        .crossJoin(gs.select(F.col("_g").alias("g_b")))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    side_a = sk.withColumnRenamed(group, "g_a").join(
        F.broadcast(pairs), "g_a"
    ).select("g_a", "g_b", "_h")
    side_b = sk.withColumnRenamed(group, "g_b").join(
        F.broadcast(pairs), "g_b"
    ).select("g_a", "g_b", "_h")
    merged = (
        side_a.union(side_b)
        .groupBy("g_a", "g_b", "_h")
        .agg(F.count("*").alias("_sides"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("g_a", "g_b").orderBy("_h")
            ),
        )
        .filter(F.col("_rn") <= k)
    )
    agg = merged.groupBy("g_a", "g_b").agg(
        F.count("*").alias("_n"),
        F.max("_h").alias("_hk"),
        F.sum(F.when(F.col("_sides") == 2, 1).otherwise(0)).alias("_hits"),
    )
    union_est = _kmv_est(F.col("_n"), F.col("_hk"), k)
    jacc = F.round(F.col("_hits") / F.col("_n"), 6)
    return agg.select(
        "g_a",
        "g_b",
        jacc.alias("jaccard_est"),
        union_est.alias("union_est"),
        F.round(jacc * union_est, 6).alias("inter_est"),
    )


def kmv_overlap_sql(
    table_sql: str,
    key_expr: str,
    group_expr: str,
    k: int = 64,
    key_kind: str = "long",
) -> str:
    """Exact DuckDB twin of :func:`kmv_overlap` (same hash, same merge,
    same rounding). The two-level bucket window is a Spark-side
    scale tactic only — the k survivors are identical, so the twin uses
    one window per group/pair."""
    h = _fin_sql(f"CAST(({_base_sql(key_expr, key_kind)}) AS BIGINT)", _FIN_A)
    return f"""
WITH dedup AS (
  SELECT DISTINCT {group_expr} AS g, CAST(({h}) AS BIGINT) AS _h FROM {table_sql}
),
sk AS (
  SELECT g, _h FROM (
    SELECT g, _h, row_number() OVER (PARTITION BY g ORDER BY _h) AS _rn
    FROM dedup
  ) WHERE _rn <= {k}
),
pairs AS (
  SELECT a.g AS g_a, b.g AS g_b
  FROM (SELECT DISTINCT g FROM sk) a, (SELECT DISTINCT g FROM sk) b
  WHERE a.g < b.g
),
merged AS (
  SELECT g_a, g_b, _h, _sides FROM (
    SELECT p.g_a, p.g_b, s._h, count(*) AS _sides,
           row_number() OVER (PARTITION BY p.g_a, p.g_b ORDER BY s._h) AS _rn
    FROM pairs p JOIN sk s ON s.g = p.g_a OR s.g = p.g_b
    GROUP BY p.g_a, p.g_b, s._h
  ) WHERE _rn <= {k}
),
agg AS (
  SELECT g_a, g_b, count(*) AS _n, max(_h) AS _hk,
         sum(CASE WHEN _sides = 2 THEN 1 ELSE 0 END) AS _hits
  FROM merged GROUP BY g_a, g_b
)
SELECT g_a, g_b,
  round(CAST(_hits AS DOUBLE) / _n, 6) AS jaccard_est,
  round(CASE WHEN _n < {k} THEN CAST(_n AS DOUBLE)
             ELSE {float((k - 1) * MIX_MOD)!r} / CAST(_hk AS DOUBLE) END, 6)
    AS union_est,
  round(round(CAST(_hits AS DOUBLE) / _n, 6) *
        round(CASE WHEN _n < {k} THEN CAST(_n AS DOUBLE)
                   ELSE {float((k - 1) * MIX_MOD)!r} / CAST(_hk AS DOUBLE) END, 6), 6)
    AS inter_est
FROM agg
"""


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantiles: the mergeable, deterministic quantile
# estimate. approx_percentile (Greenwald-Khanna in Spark, t-digest in
# DuckDB) is merge-order-dependent and engine-specific, so its output can
# never sit under a cross-engine value hash; a fixed [lo, hi) grid makes
# the sketch a plain integer histogram — bins rows per group through a
# map-side-combined shuffle at ANY input size, trivially mergeable across
# partitions/days/tables, and identical in both engines. Error is bounded
# by one bin width (plus the clamp at the grid edges); exact quantiles
# need a full sort, this is the 100 TB path.
# ---------------------------------------------------------------------------


def hist_quantiles(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
    group: str | None = None,
) -> DataFrame:
    """Histogram-estimated quantiles of ``col`` (per ``group`` if given):
    rows ``(group?, q, est)`` where ``est`` is the UPPER EDGE of the first
    bin whose cumulative count reaches ``ceil(q * n)`` (type-1 quantile at
    bin granularity; true quantile <= est < true + bin width when in
    range). Values outside [lo, hi) clamp into the edge bins — pick the
    grid from domain knowledge or a prior min/max pass. The bucket math is
    IEEE mul/div/floor only (no libm), so Spark and the DuckDB twin agree
    bit-for-bit."""
    if not bins >= 2:
        raise ValueError(f"hist_quantiles: bins must be >= 2, got {bins}")
    if not hi > lo:
        raise ValueError(f"hist_quantiles: need hi > lo, got [{lo}, {hi})")
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"hist_quantiles: qs must be in (0, 1], got {qs}")
    gcols = [group] if group is not None else []
    width = (hi - lo) / bins
    b = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    hist = (
        df.select(*gcols, b.alias("_b"))
        .groupBy(*gcols, "_b")
        .agg(F.count("*").alias("_c"))
    )
    wcum = (
        Window.partitionBy(*gcols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*gcols)
    cum = hist.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(wtot)
    )
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = (
        cum.select(*gcols, "_b", "_cum", "_n")
        .select(*gcols, "_b", "_cum", "_n", qdf)
        .filter(F.col("_cum") >= F.ceil(F.col("q") * F.col("_n")))
        .groupBy(*gcols, "q")
        .agg(F.min("_b").alias("_qb"))
    )
    est = F.round(F.lit(lo) + (F.col("_qb") + 1) * F.lit(width), 6)
    return hit.select(*gcols, "q", est.alias("est"))


def hist_quantiles_sql(
    table_sql: str,
    col_expr: str,
    lo: float,
    hi: float,
    bins: int,
    qs: list[float],
    group_expr: str | None = None,
) -> str:
    """Exact DuckDB twin of :func:`hist_quantiles` (same grid, same
    clamp, same type-1 rule, same rounding)."""
    if not bins >= 2:
        raise ValueError(f"hist_quantiles: bins must be >= 2, got {bins}")
    if not hi > lo:
        raise ValueError(f"hist_quantiles: need hi > lo, got [{lo}, {hi})")
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"hist_quantiles: qs must be in (0, 1], got {qs}")
    width = (hi - lo) / bins
    g_sel = f"{group_expr} AS g, " if group_expr is not None else ""
    g_cols = "g, " if group_expr is not None else ""
    g_part = "PARTITION BY g" if group_expr is not None else ""
    g_by = "GROUP BY g, _b" if group_expr is not None else "GROUP BY _b"
    g_by_q = "GROUP BY g, q" if group_expr is not None else "GROUP BY q"
    # bare 0.5 parses as DECIMAL in DuckDB; the engine emits double
    qvals = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
WITH raw AS (
  SELECT {g_sel}least(greatest(
           floor((CAST(({col_expr}) AS DOUBLE) - {lo!r}) / {width!r}), 0),
           {bins - 1}) AS _b
  FROM {table_sql}
),
hist AS (SELECT {g_cols}_b, count(*) AS _c FROM raw {g_by}),
cum AS (
  SELECT {g_cols}_b,
         sum(_c) OVER ({g_part} ORDER BY _b
                       ROWS UNBOUNDED PRECEDING) AS _cum,
         sum(_c) OVER ({g_part}) AS _n
  FROM hist
)
SELECT {g_cols}q, round({lo!r} + (min(_b) + 1) * {width!r}, 6) AS est
FROM cum, unnest([{qvals}]) AS t(q)
WHERE _cum >= ceil(q * _n)
{g_by_q}
"""
