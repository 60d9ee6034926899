"""Deterministic text/scalar function library.

Every function exists as a *pure Catalyst expression* (Spark SQL string →
``F.expr``) so the hot path is JVM whole-stage-codegen with zero per-row
Python, and as a DuckDB SQL twin used by the driver's correctness oracle.
"""
