"""Reusable DataFrame → DataFrame operators.

Each operator is a plain function over DataFrames (never collects, never
caches driver-side state) so partitioning composes across operators and
Catalyst sees a single logical plan.
"""
