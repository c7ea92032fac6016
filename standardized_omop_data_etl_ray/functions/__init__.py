"""Pure, vectorized per-batch kernels (Arrow in → Arrow out)."""
