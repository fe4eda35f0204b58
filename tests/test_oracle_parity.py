"""Cross-engine parity: every driver-contract query with an oracle is run on
Spark AND DuckDB at sf0.001, comparing exact sorted values (columns sorted by
name) — the north rule's 'identical join output rows / tile assignments /
kNN result sets' gate, in-suite."""

from __future__ import annotations

import math

import duckdb
import pytest

from landlensdb_spark.entry_queries import ORACLES, QUERIES


def test_every_query_has_an_oracle():
    """The every-query-has-an-oracle invariant, enforced loudly: lazy
    oracles (data-derived constants) must BUILD, not silently vanish."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(os_), (
        f"queries without oracle: {sorted(set(qs) - set(os_))}; "
        f"oracles without query: {sorted(set(os_) - set(qs))}"
    )
    assert all(isinstance(s, str) and s.strip() for s in os_.values())

# The round-8 rotation, pinned VERBATIM so a refactor can't silently restore
# build order (r07 verdict #1): the 16 round-7 rows that never carried the
# driver's hard signal lead, then the full 20-row rotate-back set whose
# last driver check was round 5 (the r07 window comment's promise), then
# 13 two-rounds-stale r06 rows prioritized by round-8 changed paths
# (fetch pacing fix, mapInArrow extraction family, repartition-gated
# corpus path, until_converged graph module, streaming tiles, plus the
# verdict-named hex_cells/localized_iso), closing with the north-star
# extract_text canary. The 32 remaining r06 rows rotate back next round.
_R08_WINDOW = [
    "core_users",
    "dissolve_parcels",
    "focal_hotspots",
    "funnel_depths",
    "grid_cluster_pts",
    "grid_routes",
    "hilbert_scan_ranges",
    "hotspot_zscores",
    "hull_diameter",
    "morton_scan_ranges",
    "od_tile_flows",
    "retention_cohorts",
    "tile_hll_pyramid",
    "track_resample",
    "user_trends",
    "zonal_stats",
    "bloom_anti",
    "coverage_ingest",
    "embed_ann_ivf",
    "embed_ann_lsh",
    "embed_near_dup",
    "embed_topk",
    "gopher_stats",
    "hilbert_cells",
    "host_stats",
    "knn_self",
    "lang_pred",
    "minhash_lsh",
    "pip_admin_named",
    "quad_leaves",
    "s2_cells",
    "sessionize_events",
    "snap_full",
    "tile_bounds",
    "tile_pyramid",
    "url_normalize",
    "fetch_local",
    "fetch_plan",
    "extract_geotags",
    "tile_assign",
    "tile_stats",
    "salted_tile_counts",
    "snap_nearest",
    "token_shards",
    "pii_redact",
    "stream_tiles",
    "pagerank_hosts",
    "hex_cells",
    "localized_iso",
    "extract_text",
]


def test_driver_window_ordering():
    """The driver hashes the FIRST 50 registered queries; pin the round-8
    rotation list verbatim so neither a new registration nor a refactor can
    silently push a window row back out of the hard signal."""
    from landlensdb_spark.entry_queries import _DRIVER_WINDOW_FIRST

    assert _DRIVER_WINDOW_FIRST == _R08_WINDOW
    names = list(QUERIES)
    assert names[: len(_DRIVER_WINDOW_FIRST)] == _DRIVER_WINDOW_FIRST
    assert len(_DRIVER_WINDOW_FIRST) == 50


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the fast, structurally-distinct subset (the full all-queries sweep runs
# via tools/check_oracle.py at sf0.01, with dtype checks)
SUBSET = [
    "tile_assign",
    "pip_admin",
    "snap_full",
    "knn_points",
    "extract_geotags",
    "embed_topk",
    "quality_docs",
    "lang_pred",
    "minhash_sigs",
    "ngram_jaccard",
    "window_events",
    "upsert_orders",
    "pii_redact",
    "token_shards",
    "bm25_docs",
    "warc_scan",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            elif hasattr(v, "isoformat"):
                v = v.isoformat()[:26]
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = QUERIES[name](spark, sf_dir)
    got = canon([tuple(r) for r in df.collect()], df.columns)
    res = duck.execute(ORACLES[name])
    want = canon(res.fetchall(), [d[0] for d in res.description])
    assert sorted(df.columns) == sorted(d[0] for d in duck.execute(ORACLES[name]).description)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert got == want, f"{name}: value mismatch"


def test_full_sweep_all_queries():
    """The enforced exact-value check for rotated-OUT window rows (the
    round-4 ADVICE trade-off, made one-command per round-5 verdict #8):
    EVERY registered query vs its DuckDB oracle at sf0.01 through the
    driver-gate replica, exact values + dtypes. Heavy (~3-4 min), so it
    only arms when SPARK_GRAFT_FULL_SWEEP=1; the documented pre-round
    command (also in COVERAGE.md) is

        SPARK_GRAFT_FULL_SWEEP=1 python -m pytest \
            tests/test_oracle_parity.py::test_full_sweep_all_queries -q

    (equivalently: ``python tools/check_oracle.py`` and check exit 0)."""
    import os
    import subprocess
    import sys

    if not os.environ.get("SPARK_GRAFT_FULL_SWEEP"):
        pytest.skip("set SPARK_GRAFT_FULL_SWEEP=1 to run the full sweep")
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py")],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + "\n" + proc.stderr[-2000:]
