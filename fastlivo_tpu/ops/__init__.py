"""Batched compute kernels (pure JAX + Pallas) for the estimation core."""
from . import so3  # noqa: F401
