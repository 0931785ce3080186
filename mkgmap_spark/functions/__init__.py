"""Vectorized kernels (numpy over packed coordinate arrays) and Spark
Column helpers. All kernels are batch-oriented: they take numpy arrays /
pandas Series and never loop per row in Python unless the algorithm is
inherently sequential per feature (e.g. Douglas-Peucker recursion), in
which case the loop is per-feature over packed arrays, not per-point.
"""
