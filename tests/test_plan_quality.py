"""Physical-plan assertions: the plans we ship are the plans we designed.

Correctness tests prove the operators return the right rows; these prove
the *execution shape* survives Catalyst — filter pushdown reaches the
parquet scan, small sides broadcast instead of shuffling, map-only
operators stay map-only, and expensive Python stages are evaluated exactly
once. A regression here is a 100TB-scale incident that no row-level test
would catch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from landlensdb_spark import synth, tables
from landlensdb_spark.extract import extract_geotags
from landlensdb_spark.operators.knn import knn_join
from landlensdb_spark.operators.pip_join import pip_join
from landlensdb_spark.operators.snap import snap_to_network
from landlensdb_spark.operators.tiles import assign_tiles


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _n_nodes(plan: str, name: str) -> int:
    """Count physical-plan nodes by their '(k) Name' detail headers (the
    tree section repeats each node name, so plain .count overcounts)."""
    import re

    return len(re.findall(rf"\(\d+\) {name}\b", plan))


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages.parquet")
    tables.pages(spark, 2000, num_partitions=4).write.parquet(path)
    return path


def test_warc_ts_filter_pushes_to_parquet_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(
        F.col("warc_ts") >= "2022-06-01"
    ).select("url", "warc_ts")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(warc_ts), GreaterThanOrEqual(warc_ts" in plan
    # column pruning: html must NOT be read for a url/warc_ts projection
    assert "html" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_extraction_plan_has_single_python_stage(spark, pages_parquet):
    """A filter above the extraction must not duplicate the Python UDF
    (the double-ArrowEvalPython plan the naive formulation produces)."""
    pages = spark.read.parquet(pages_parquet)
    out = extract_geotags(pages).filter(F.col("lat") > 0.0)
    plan = _plan(out)
    n_python_stages = (
        _n_nodes(plan, "MapInPandas")
        + _n_nodes(plan, "MapInArrow")
        + _n_nodes(plan, "ArrowEvalPython")
    )
    assert n_python_stages == 1, plan


def test_pip_join_broadcasts_cover_and_never_shuffles_points(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    geo = extract_geotags(pages).select("url", "lon", "lat")
    joined = pip_join(geo, synth.admin_polygons(spark))
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchange allowed is the broadcast of the tiny cover table
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"unexpected shuffle of the point side: {line}")


def test_tile_assignment_is_pure_codegen(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    geo = extract_geotags(pages).select("url", "lon", "lat")
    tiled = assign_tiles(geo)
    plan = _plan(tiled)
    # tile math must not add any Python stage beyond the extraction itself
    assert (
        _n_nodes(plan, "MapInPandas")
        + _n_nodes(plan, "MapInArrow")
        + _n_nodes(plan, "ArrowEvalPython")
    ) == 1
    assert "codegen id" in plan


def test_snap_is_map_only(spark):
    probes = spark.range(100).select(
        F.col("id").alias("key"),
        synth.probe_lon_col(F.col("id")).alias("lon"),
        synth.probe_lat_col(F.col("id")).alias("lat"),
    )
    snapped = snap_to_network(probes, synth.road_network(spark), tolerance_m=100.0)
    plan = _plan(snapped)
    assert "Exchange" not in plan, plan


def test_knn_candidate_join_is_broadcast(spark):
    pts = spark.range(500).select(
        F.col("id").alias("point_id"),
        synth.probe_lon_col(F.col("id")).alias("lon"),
        synth.probe_lat_col(F.col("id")).alias("lat"),
    )
    prb = spark.range(20).select(
        F.col("id").alias("probe_id"),
        synth.probe_lon_col(F.col("id") * 7).alias("lon"),
        synth.probe_lat_col(F.col("id") * 7).alias("lat"),
    )
    out = knn_join(prb, pts, k=3)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_fused_pipeline_pushdown_and_single_stage(spark, pages_parquet):
    """The fused extract+PIP op is a plan barrier, but a date filter applied
    BEFORE it must still reach the parquet scan, and the whole html->admin_id
    chain must be exactly one python stage."""
    from landlensdb_spark.operators.fused import extract_pip

    pages = spark.read.parquet(pages_parquet).filter(
        F.col("warc_ts") >= F.lit("2022-03-01")
    )
    polys = synth.admin_polygons(spark)
    out = extract_pip(pages, polys, keep=["url"])
    plan = _plan(out.groupBy("admin_id").count())
    assert "PushedFilters: [IsNotNull(warc_ts), GreaterThanOrEqual(warc_ts" in plan
    assert _n_nodes(plan, "MapInArrow") == 1
    assert _n_nodes(plan, "ArrowEvalPython") == 0


def test_bloom_anti_probe_side_filters_before_join(spark):
    """The corpus side must reach the residual join only AFTER the bloom bit
    test: the definite-miss branch is join-free, and the bloom build side
    shuffles compact (chunk, bits) longs, never raw keys to the probe."""
    from landlensdb_spark.operators.bloom import bloom_anti_join

    corpus = spark.range(5000).select(F.col("id").alias("key"))
    seen = spark.range(0, 5000, 7).select(F.col("id").alias("key"))
    plan = _plan(bloom_anti_join(corpus, seen, "key"))
    # exactly one anti-join (the residual), fed by a Filter on the bit test
    assert _n_nodes(plan, "BroadcastHashJoin") + _n_nodes(plan, "SortMergeJoin") >= 1
    assert "_might" not in plan.split("LeftAnti")[0].split("Filter")[0], (
        "bit-test filter must precede the anti join"
    )
    # the might-test is pure column math: no python/pandas UDF anywhere
    assert _n_nodes(plan, "BatchEvalPython") == 0
    assert _n_nodes(plan, "ArrowEvalPython") == 0


def test_tile_pyramid_single_aggregation_shuffle(spark):
    from landlensdb_spark.operators.tiles import tile_pyramid

    pts = spark.range(500).select(
        F.col("id").alias("rec_id"),
        (F.col("id") % 360 - 180.0 + 0.5).alias("lon"),
        (F.col("id") % 160 - 80.0 + 0.5).alias("lat"),
    )
    plan = _plan(tile_pyramid(pts, min_zoom=0, max_zoom=6))
    assert _n_nodes(plan, "Exchange") == 1, plan
    # partial aggregation must sit below the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_line_dedup_hot_side_not_force_broadcast(spark):
    """The df>threshold hot-line set is unbounded on web corpora, so the
    anti-join must NOT carry a mandatory broadcast hint — strategy is left
    to AQE (round-2 VERDICT #3). The logical plan therefore has no
    ResolvedHint; with AQE on, small inputs may still broadcast at runtime
    (that is the point)."""
    from landlensdb_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "a\nnav\nb"), (2, "nav\nc")], "doc_id long, text string"
    )
    out = line_dedup(df)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "BROADCAST" not in logical
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got == {1: "a\nb", 2: "c"}


def test_knn_fixed_ring_skips_histogram_stages(spark):
    """The fixed-ring fast path must contain NO aggregation (histogram or
    ring-selection groupBy) — certification rides the candidate join's own
    window. Three stage boundaries fewer than the adaptive path."""
    from pyspark.sql import functions as F

    from landlensdb_spark import synth
    from landlensdb_spark.operators.knn import knn_join

    k = F.col("id")
    pts = spark.range(5000).select(
        k.alias("point_id"),
        synth.probe_lon_col(k).alias("lon"),
        synth.probe_lat_col(k).alias("lat"),
    )
    prb = spark.range(50).select(
        k.alias("probe_id"),
        synth.probe_lon_col(k * 7).alias("lon"),
        synth.probe_lat_col(k * 7).alias("lat"),
    )
    fixed = _plan(knn_join(prb, pts, k=5, res=18, fixed_ring=1))
    assert _n_nodes(fixed, "HashAggregate") == 0
    adaptive = _plan(knn_join(prb, pts, k=5, res=18))
    assert _n_nodes(adaptive, "HashAggregate") > 0  # histogram + ring groupBy


def _broadcast_subtrees(tree: str) -> list[str]:
    """Each BroadcastExchange node with its full subtree, cut by the tree
    markers' column position (deeper nodes indent further right)."""
    lines = tree.splitlines()
    subs = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        depth = max(ln.find("+- "), ln.find(":- "))
        sub = [ln]
        for nxt in lines[i + 1 :]:
            d2 = max(nxt.find("+- "), nxt.find(":- "))
            if d2 <= depth:
                break
            sub.append(nxt)
        subs.append("\n".join(sub))
    return subs


def test_bm25_broadcast_side_is_query_bounded(spark):
    """bm25_search must never broadcast the raw full-vocabulary term_stats
    (billions of rows on a web corpus): any broadcast subtree derived from
    the corpus tokenization (Generate explode) must ALSO contain the
    query-terms relation — i.e. stats were joined down to the query's
    terms BEFORE the broadcast (round-3 VERDICT #2)."""
    import re

    from landlensdb_spark.operators.search import bm25_search

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox " + "jumps " * (i % 3 + 1)) for i in range(50)],
        "doc_id long, text string",
    )
    out = bm25_search(corpus, ["quick", "jumps"], top=5)
    tree = out._jdf.queryExecution().executedPlan().toString()
    subs = _broadcast_subtrees(tree)
    assert subs, tree
    for sub in subs:
        if "Generate explode" in sub:  # derived from the corpus vocabulary
            assert re.search(r"ExistingRDD\[term#\d+\]", sub), (
                "vocabulary-derived broadcast without query-terms restriction:\n"
                + sub
            )


def test_bm25_top_none_rank_is_two_level(spark):
    """``top=None`` must never compile to a single-task global sort: every
    Window node in the executed plan must carry the ``_pid`` partition spec
    (the two-level rank), and the plan must contain the range exchange that
    makes partition-local ranks globally consistent (round-5 verdict #4).
    The two-level ranks must also equal the reference top-k ranks."""
    from landlensdb_spark.operators.search import bm25_search

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox " + "jumps " * (i % 3 + 1)) for i in range(60)],
        "doc_id long, text string",
    )
    out = bm25_search(corpus, ["quick", "jumps"], top=None)
    tree = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in tree.lower(), tree
    for ln in tree.splitlines():
        if "Window [" in ln:
            assert "_pid" in ln, (
                "unpartitioned WindowExec in top=None plan:\n" + ln
            )
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out.collect()}
    ref = bm25_search(corpus, ["quick", "jumps"], top=len(got)).collect()
    assert got == {r["doc_id"]: (r["score"], r["rank"]) for r in ref}


def test_repeated_spans_shuffles_hash_not_window_string(spark):
    """The corpus-wide window count must shuffle the 8-byte xxhash64 of
    each window, never the window STRING (~win tokens of text per row —
    the string key multiplies shuffle bytes by the window length at
    corpus scale; round-3 VERDICT #3)."""
    from landlensdb_spark.operators.spans import repeated_spans

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x a b c d e y")], "doc_id long, text string"
    )
    out = repeated_spans(df, win=3, min_count=2)
    tree = out._jdf.queryExecution().executedPlan().toString()
    exchanges = [l for l in tree.splitlines() if "Exchange hashpartitioning" in l]
    assert any("_h#" in l for l in exchanges), tree
    assert not any("(w#" in l or " w#" in l for l in exchanges), (
        "window string used as a shuffle key:\n" + "\n".join(exchanges)
    )


def test_snapshot_diff_shuffles_fingerprints_not_rows(spark, tmp_path):
    """Both sides must be projected to (key, 8-byte fingerprint) BEFORE
    the full-outer join — the shuffle carries 16 bytes/row regardless of
    table width."""
    import re

    from landlensdb_spark.catalog import snapshot_diff, snapshot_write

    path = str(tmp_path / "snap")
    wide = spark.range(100).select(
        F.col("id").alias("k"),
        F.repeat(F.lit("x"), 1000).alias("big"),
        (F.col("id") * 2).alias("n"),
    )
    snapshot_write(wide, path, "v1")
    snapshot_write(wide.withColumn("n", F.col("n") + 1), path, "v2")
    out = snapshot_diff(spark, path, "k", 1, 2)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("xxhash64") == 2, opt
    # each join input is a 2-column (key, fingerprint) projection — the
    # wide 'big' column must not survive past the per-side Project
    assert re.search(r"Project \[k#\d+L, xxhash64\(.*\) AS _ofp#\d+L\]", opt), opt
    assert re.search(r"Project \[k#\d+L, xxhash64\(.*\) AS _nfp#\d+L\]", opt), opt
    assert "FullOuter" in opt


def test_spatial_cluster_candidates_are_equi_join(spark):
    """The neighbor-pair generation must plan as a cell equi-join — a
    cartesian/nested-loop fallback here is the quadratic 100TB killer."""
    from landlensdb_spark.operators.cluster import neighbor_pairs

    pts = spark.range(500).select(
        F.col("id").alias("point_id"),
        synth.probe_lon_col(F.col("id")).alias("lon"),
        synth.probe_lat_col(F.col("id")).alias("lat"),
    )
    plan = _plan(neighbor_pairs(pts, eps_m=250.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert _n_nodes(plan, "SortMergeJoin") + _n_nodes(plan, "BroadcastHashJoin") == 1


def test_bpe_word_table_map_side_combined(spark):
    """learn_bpe's single corpus pass (the word-type groupBy) must
    partial-aggregate before its exchange — the shuffle carries combined
    (word, freq) rows, not one row per corpus token occurrence."""
    from landlensdb_spark.operators.bpe import _words

    docs = spark.createDataFrame(
        [(1, "low low newest"), (2, "newest widest")], "doc_id long, text string"
    )
    import re

    plan = _plan(_words(docs, "text"))
    assert "partial_count" in plan, plan
    assert re.search(r"Exchange \(\d+\)\n\s*\+- HashAggregate", plan), plan


def test_apply_bpe_plan_depth_independent_of_merge_count(spark):
    """The encode path must be ONE Arrow python stage whose plan does not
    grow with the merge table: at real vocab sizes (30k-50k merges) a
    per-merge expression chain would blow Catalyst analysis/codegen limits
    long before data scale matters."""
    from landlensdb_spark.operators.bpe import apply_bpe

    docs = spark.createDataFrame([(1, "low lower")], "doc_id long, text string")
    few = _plan(apply_bpe(docs, [(1, "l", "o", 9), (2, "lo", "w", 9)]))
    many_merges = [(i + 1, f"x{i}", f"y{i}", 1) for i in range(2000)]
    many = _plan(apply_bpe(docs, many_merges))
    for plan in (few, many):
        assert _n_nodes(plan, "ArrowEvalPython") == 1, plan
        assert "aggregate(" not in plan, plan  # no higher-order fold chain
    # the merge table rides in the UDF closure, not the plan tree
    assert abs(len(many) - len(few)) < 200, (len(few), len(many))


def test_pack_token_shards_single_data_shuffle(spark):
    """The distributed prefix sum must shuffle the corpus exactly ONCE
    (hash on the literal-quantile bucket id); the offsets side joins as a
    broadcast. A second data-sized Exchange here doubles the dominant cost
    of the 100TB sharding pass."""
    from pyspark.sql import functions as F

    from landlensdb_spark.operators.shards import pack_token_shards

    df = spark.range(2000).select(
        F.col("id").alias("key"), (F.col("id") % 11 + 1).alias("toks")
    )
    out = pack_token_shards(df, "toks", "key", 100, num_partitions=8)
    plan = _plan(out)
    n_exchanges = _n_nodes(plan, "Exchange")
    # one hash Exchange for the window; the broadcast side appears as
    # BroadcastExchange (counted separately by its node name)
    assert n_exchanges == 1, f"expected 1 shuffle Exchange, got {n_exchanges}\n{plan}"
    assert _n_nodes(plan, "BroadcastExchange") == 1


def test_hex_distance_pairs_driver_query_plan(spark, sf_dir):
    """The REGISTERED hex_distance_pairs query (not just the operator)
    must stay a cell equi-join: no CartesianProduct / nested-loop join
    can sneak in via a refactor, and the hex encode stays codegen (no
    python UDF stage anywhere — the whole query is column math)."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["hex_distance_pairs"](spark, sf_dir))
    assert _n_nodes(plan, "CartesianProduct") == 0, plan
    assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
    assert _n_nodes(plan, "ArrowEvalPython") == 0, plan
    assert _n_nodes(plan, "BatchEvalPython") == 0, plan


def test_compact_cover_driver_query_plan(spark, sf_dir):
    """compact_cover (global compact, round-6 verdict #5): exactly the
    two-phase shape — phase 1's PARALLEL per-prefix-group kernel (ONE
    physical instance, persisted and shared by both union branches via
    InMemoryRelation) plus phase 2's bounded (<= 1365-row) residual
    kernel = exactly two distinct FlatMapGroupsInPandas nodes — and no
    cartesian anywhere; the cover expansion is column math (explode of
    sequence), not Python."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["compact_cover"](spark, sf_dir))
    assert _n_nodes(plan, "FlatMapGroupsInPandas") == 2, plan
    # the persist pin: phase 1 must NOT execute once per union branch
    assert "InMemoryRelation" in plan, plan
    assert _n_nodes(plan, "CartesianProduct") == 0, plan
    assert _n_nodes(plan, "ArrowEvalPython") == 0, plan


def test_hull_driver_queries_plan(spark, sf_dir):
    """hull_extremes / hull_diameter: exactly ONE FlatMapGroupsInPandas
    (the per-group chain kernel) and no cartesian / nested-loop join —
    the hull never degrades into a pairwise point join."""
    from landlensdb_spark.entry_queries import QUERIES

    for name in ("hull_extremes", "hull_diameter"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert _n_nodes(plan, "FlatMapGroupsInPandas") == 1, (name, plan)
        assert _n_nodes(plan, "CartesianProduct") == 0, (name, plan)
        assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0, (name, plan)


def test_grid_cluster_driver_query_plan(spark, sf_dir):
    """grid_cluster_pts: the cell adjacency is a constant-fan-out
    explode + EQUI-join (never a range/theta join materializing cell
    pairs), the component propagation is equi-joins, and the whole
    query is column math — no Python stage, no cartesian, no
    nested-loop join anywhere."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["grid_cluster_pts"](spark, sf_dir))
    assert _n_nodes(plan, "CartesianProduct") == 0, plan
    assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
    assert _n_nodes(plan, "ArrowEvalPython") == 0, plan
    assert _n_nodes(plan, "BatchEvalPython") == 0, plan
    assert _n_nodes(plan, "FlatMapGroupsInPandas") == 0, plan


def test_zonal_stats_driver_query_plan(spark, sf_dir):
    """zonal_stats: the zone<->pixel match must be the tile EQUI-join +
    bounds refine — never a nested-loop/range join against the pixel
    table (the data-sized side); the only Python stages are the two
    codec boundaries (PNG render + decode)."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["zonal_stats"](spark, sf_dir))
    assert _n_nodes(plan, "CartesianProduct") == 0, plan
    assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan


def test_focal_hotspots_driver_query_plan(spark, sf_dir):
    """focal_hotspots: the window match is the constant 9-offset explode
    + global-coordinate EQUI-join — the Chebyshev theta-join lives only
    in the oracle."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["focal_hotspots"](spark, sf_dir))
    assert _n_nodes(plan, "CartesianProduct") == 0, plan
    assert _n_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan


def test_tile_hll_pyramid_driver_query_plan(spark, sf_dir):
    """tile_hll_pyramid: the whole sketch pipeline is JVM column math —
    no Python stage, no cartesian; rollup steps are plain aggregations."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["tile_hll_pyramid"](spark, sf_dir))
    assert _n_nodes(plan, "ArrowEvalPython") == 0, plan
    assert _n_nodes(plan, "BatchEvalPython") == 0, plan
    assert _n_nodes(plan, "CartesianProduct") == 0, plan


def test_user_trends_single_shuffle(spark, sf_dir):
    """group_trend's claim that the groupBy reuses the min-x window's
    hash partitioning: exactly ONE Exchange in the whole plan."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["user_trends"](spark, sf_dir))
    assert _n_nodes(plan, "Exchange") == 1, plan


def test_funnel_depths_single_shuffle(spark, sf_dir):
    """funnel: chained windows + same-key groupBy ride one entity
    exchange; no joins anywhere."""
    from landlensdb_spark.entry_queries import QUERIES

    plan = _plan(QUERIES["funnel_depths"](spark, sf_dir))
    assert _n_nodes(plan, "Exchange") == 1, plan
    assert _n_nodes(plan, "Join") == 0, plan
