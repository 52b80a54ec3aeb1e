"""Geometry: shape math, AABBs, mass properties, narrowphase manifolds.

TPU-native replacement for the Parry collision backend the reference
delegates to (SURVEY.md §2b): analytic primitive-pair manifolds and batched
fixed-iteration kernels instead of recursive/branching native code.
"""
