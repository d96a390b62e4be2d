"""DataFrame operators: tile grid, spatial join, cutline, compositing,
dedup, similarity, as-of joins, lineage."""
