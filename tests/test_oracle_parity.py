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

def test_driver_window_ordering():
    """The driver hashes the FIRST 50 registered queries; pin that the
    never-driver-checked set occupies the front of the window so a future
    registration can't silently push them back out of the hard signal."""
    from landlensdb_spark.entry_queries import _DRIVER_WINDOW_FIRST

    names = list(QUERIES)
    assert names[: len(_DRIVER_WINDOW_FIRST)] == _DRIVER_WINDOW_FIRST
    assert len(_DRIVER_WINDOW_FIRST) <= 50


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
