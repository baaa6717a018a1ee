"""Pallas TPU kernels for the hot ops (BVH traversal)."""
