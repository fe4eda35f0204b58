"""landlensdb_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
(landlensdb/landlensdb, a single-node geopandas/PostGIS image-location store)
as idiomatic Spark: DataFrame ops + vectorized pandas/Arrow UDFs, H3/S2-style
sortable-long cell indexing, two-phase spatial joins (cell equi-join + exact
numpy refinement), kNN via k-ring expansion, slippy-map tile math as pure
column expressions, a ``table().filter(field__op=...)`` DSL, skew salting,
and an idempotent per-partition checkpoint/lineage table.

No geometry native libraries are required: all exact-geometry kernels
(point-in-polygon ray casting, point-to-segment distance, linear referencing,
bearing) are vectorized numpy executed inside Arrow batches.
"""

__version__ = "0.1.0"

from landlensdb_spark.session import get_spark  # noqa: F401
