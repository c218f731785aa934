"""Pure exactness kernels (no Spark imports)."""
