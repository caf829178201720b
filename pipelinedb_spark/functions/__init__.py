"""Scalar function surface mirroring PipelineDB's SQL functions."""
