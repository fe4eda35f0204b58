"""Pure geometry/indexing kernels: Spark column math + vectorized numpy.

Submodules:
- ``mercator``: EPSG:4326 <-> EPSG:3857 forward/inverse as column expressions
  (reference computes all snap distances in 3857, snap.py:190).
- ``tiles``: slippy-map XYZ tile + quadkey math, column expressions matching
  the reference formulas (cloud.py:860-911) exactly.
- ``cells``: sortable-long spatial cell ids (Morton 'H3-slot' and Hilbert
  'S2-slot' encodings), k-ring, polygon covers. Pure numpy, UDF-wrapped.
- ``hex``: hexagonal cell index with real H3 semantics (axial coords, cube
  rounding, 6-neighborhoods, isotropic k-rings) as pure column math.
- ``geometry``: exact-geometry numpy kernels (ray-cast PIP, point-segment
  distance, linear referencing, bearing, grid spatial index).
"""
