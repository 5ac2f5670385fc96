"""Column-level functions: geohash columns, planar distance, portable hashes."""
