"""Stateless per-batch kernels (pure functions over Arrow batches)."""
