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
