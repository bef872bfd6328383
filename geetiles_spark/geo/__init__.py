"""Pure-numpy geospatial kernels (projection, geometry, hashing, raster,
cell index) — the vectorized building blocks the Spark operators call from
Arrow-batched pandas UDFs."""

from . import cells, geom, hashing, maps, raster, utm, wkt  # noqa: F401
