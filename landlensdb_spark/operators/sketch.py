"""HyperLogLog distinct-count sketch — deterministic, engine-exact.

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

from pyspark.sql import Column, DataFrame
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
