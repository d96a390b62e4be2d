"""Pure-NumPy geospatial kernels (no Spark imports here).

These are the vectorized building blocks called from pandas/Arrow UDFs:
hierarchical cell index, point-in-polygon, scanline region algebra,
anti-meridian handling.
"""
