"""Data layer: synthetic generators, DataRecord-style columnar batches, feeds."""
