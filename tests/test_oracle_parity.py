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

# The round-5 rotation, pinned VERBATIM so a refactor can't silently restore
# build order: 3 never-driver-checked rows first (pipeline_lineage is the
# north rule's resumable-lineage criterion), then 6 canaries on paths that
# change in round 5 (BPE re-architecture, kNN fallback bound, north-star
# extract_text), then the 41 rows whose last driver check was round 3.
_R05_WINDOW = [
    "pipeline_lineage", "geojson_roundtrip", "gpkg_roundtrip",
    "extract_text", "pip_admin", "knn_points", "knn_self",
    "bpe_merges", "corpus_tokenize",
    "coverage_ingest", "extract_pip", "extract_date_filter",
    "extract_exif_real", "bbox_scan", "filter_dsl", "distinct_priority",
    "anti_join", "agg_doc_stats", "bounds_agg", "argmin_lineitem",
    "upsert_orders", "window_events", "dedup_exact", "ngram_jaccard",
    "minhash_sigs", "minhash_lsh", "simhash_docs", "fingerprint_docs",
    "line_dedup", "token_stats", "quality_docs", "lang_pred",
    "embed_topk", "embed_ann_lsh", "embed_near_dup", "tile_bounds",
    "pip_admin_named", "snap_full", "hilbert_cells", "s2_cells",
    "quad_leaves", "sessionize_events", "embed_ann_ivf",
    "tile_pyramid", "gopher_stats", "url_normalize", "host_stats",
    "bloom_anti",
    # late-r05 swap: the new codec oracles displace localized_iso /
    # geohash_cells (unchanged pure column math, r03 hash-green) — never
    # driver-checked outranks stale-but-stable
    "gif_roundtrip", "tiff_roundtrip",
]


def test_driver_window_ordering():
    """The driver hashes the FIRST 50 registered queries; pin the round-5
    rotation list verbatim so neither a new registration nor a refactor can
    silently push a window row back out of the hard signal."""
    from landlensdb_spark.entry_queries import _DRIVER_WINDOW_FIRST

    assert _DRIVER_WINDOW_FIRST == _R05_WINDOW
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
