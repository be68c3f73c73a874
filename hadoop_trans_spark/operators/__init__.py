"""Reusable operator implementations that Spark lacks as built-ins.

Each is a composition of DataFrame primitives (preferred) or an
Arrow-batched pandas UDF — never a row-at-a-time Python UDF in a hot path.
"""
