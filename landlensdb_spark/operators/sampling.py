"""Deterministic corpus sampling — reproducible subsets at any scale.

Training-data pipelines need samples that are (a) stable across reruns and
engines (no RNG state, no partition-order dependence), (b) cheap (no extra
shuffle for rate sampling), and (c) stratifiable (N docs per language /
source / domain). Both operators key on an arithmetic mix of a BIGINT key
— Weyl-style multiply-mod, identical in Spark and ANSI SQL — rather than
an engine hash, so the oracle reproduces the exact row set.

The reference's sampling story is LIMIT-based paging
(/root/reference/landlensdb/handlers/cloud.py:48,963 page caps); these are
the corpus-scale generalizations: rate sampling is a pure filter (no
shuffle, pushes below wide operators when Catalyst can), stratified
sampling is one window over the (group, mixed-key) order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Weyl-ish odd multiplier (golden-ratio derived); modulus keeps the
#: product within BIGINT under ANSI overflow checking for keys < 2^31.
MIX_MUL = 2_654_435_761
MIX_MOD = 1_000_000_007


def mix_key(key: Column) -> Column:
    """Deterministic pseudo-uniform value in [0, MIX_MOD) from a bigint key.

    ``pmod(key, MIX_MOD)`` first so the multiply never exceeds ~2^61 (ANSI
    mode would throw on bigint overflow at corpus-scale ids otherwise).
    """
    return F.pmod(F.pmod(key.cast("long"), F.lit(MIX_MOD)) * F.lit(MIX_MUL), F.lit(MIX_MOD))


def mix_key_sql(key_expr: str) -> str:
    """The same mix as ANSI SQL (DuckDB oracle)."""
    return f"((({key_expr}) % {MIX_MOD}) * {MIX_MUL}) % {MIX_MOD}"


def hash_sample(df: DataFrame, key: str, rate_ppm: int) -> DataFrame:
    """Keep ~rate_ppm/1e6 of rows, deterministically by key.

    A pure filter: no shuffle, no RNG, stable under repartitioning and
    reruns — the property `df.sample()` does NOT have. Rows keep their
    columns untouched.
    """
    threshold = int(rate_ppm * MIX_MOD // 1_000_000)
    return df.filter(mix_key(F.col(key)) < F.lit(threshold))


def stratified_sample(
    df: DataFrame, group: str, key: str, n_per_group: int
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by mixed-key order.

    One window (single shuffle on the group column); sample_rank is the
    1-based position within the group's mixed order — stable across
    engines, reruns, and cluster sizes. Skewed groups: the window
    partitions by group, so a giant group serializes into one task — for
    heavy-hitter strata at corpus scale, pre-filter with
    :func:`hash_sample` at a few x the target rate, then stratify the
    survivors (documented two-step; exactness of 'top-n by mixed order' is
    preserved because mix order is stable under the pre-filter only when
    the pre-filter keeps >= n rows per group — use a generous rate).
    """
    w = Window.partitionBy(group).orderBy(mix_key(F.col(key)).asc(), F.col(key).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n_per_group)
    )


def balance_sources(
    df: DataFrame, group: str, fractions: dict[str, float], key: str = "doc_id"
) -> DataFrame:
    """Per-group deterministic rate sampling — corpus mixing weights.

    ``fractions`` maps group value -> keep fraction in [0, 1]; groups not
    listed are kept whole. Pure filter against the mixed key (no RNG, no
    shuffle, rerun/partition invariant — the same guarantees as
    :func:`hash_sample`, per group). The standard use is source balancing:
    downweight an over-represented crawl to target mixture proportions.
    """
    thresholds = {g: int(f * MIX_MOD) for g, f in fractions.items()}
    expr = F.lit(MIX_MOD)  # default: keep everything
    for g, t in sorted(thresholds.items()):
        expr = F.when(F.col(group) == g, F.lit(t)).otherwise(expr)
    return df.filter(mix_key(F.col(key)) < expr)


#: per-character multiplier of the string mix; 131 keeps every fold step
#: (acc * 131 + codepoint) under MIX_MOD * 131 + 2^21 << 2^63, so the fold
#: is plain bigint arithmetic in BOTH engines (no overflow, no ANSI throw).
STR_MIX_MUL = 131


def str_mix(col: Column | str) -> Column:
    """Deterministic pseudo-uniform value in [0, MIX_MOD) from a STRING —
    the string twin of :func:`mix_key`. A per-character polynomial fold
    ``acc = (acc * 131 + codepoint) mod MIX_MOD``, entirely JVM-side
    higher-order column math (``aggregate`` over a char sequence — no
    Python, stays in codegen'd expressions). NULL and '' both fold to 0.
    """
    col = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(col, F.lit(""))
    return F.when(F.length(c) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.length(c)),
            F.lit(0).cast("long"),
            lambda acc, i: F.pmod(
                acc * F.lit(STR_MIX_MUL) + F.ascii(F.substring(c, i, F.lit(1))),
                F.lit(MIX_MOD),
            ),
        )
    )


def str_mix_sql(col_expr: str) -> str:
    """The same string fold as DuckDB SQL (``list_reduce`` over the
    codepoint sequence, seed prepended — same shape as the fingerprint
    oracle)."""
    c = f"coalesce({col_expr}, '')"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, length({c}) + 1), "
        f"i -> CAST(unicode(substr({c}, i, 1)) AS BIGINT))), "
        f"(acc, b) -> (acc * {STR_MIX_MUL} + b) % {MIX_MOD})"
    )


def group_split(
    df: DataFrame,
    group: str,
    splits: dict[str, float],
    out: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test assignment: every row of a GROUP (host,
    source, domain...) lands in the SAME split, because the label is a
    pure function of the group string — near-duplicate documents from one
    site can never straddle the train/eval boundary (the standard
    web-corpus split hygiene; doc-level random splits leak).

    ``splits`` maps label -> fraction in insertion order; fractions must
    sum to <= 1 and the LAST label absorbs rounding remainder (so the
    labels partition every row). Pure per-row column math: no shuffle, no
    RNG, stable under repartitioning, reruns and cluster sizes — at 100 TB
    this is a free extra column on the scan, not a job. Split sizes are
    binomial around the fractions at the granularity of GROUPS (a giant
    host drags its whole mass into one split — that is the point).
    """
    if not splits:
        raise ValueError("group_split: splits must be non-empty")
    if any(f < 0 for f in splits.values()) or sum(splits.values()) > 1.0 + 1e-9:
        raise ValueError("group_split: fractions must be >= 0 and sum to <= 1")
    bucket = str_mix(group)
    names = list(splits)
    cum = 0.0
    expr = F.lit(names[-1])
    conds: list[tuple[int, str]] = []
    for name in names[:-1]:
        cum += splits[name]
        conds.append((int(cum * MIX_MOD), name))
    for threshold, name in reversed(conds):
        expr = F.when(bucket < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(out, expr)


def group_split_sql(group_expr: str, splits: dict[str, float]) -> str:
    """The CASE expression twin of :func:`group_split` for the oracle."""
    names = list(splits)
    b = str_mix_sql(group_expr)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += splits[name]
        arms.append(f"WHEN ({b}) < {int(cum * MIX_MOD)} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"
