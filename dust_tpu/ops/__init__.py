"""Numerical building blocks: pairwise distances, bandwidth heuristics, and
RBF kernel Gram/gradient evaluations (jnp reference path + Pallas TPU path).
"""
