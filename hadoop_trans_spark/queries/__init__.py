"""Declared query surface (SURVEY §2B) with DuckDB oracles.

Each submodule registers queries via ``base.query``; importing this package
populates the global registries consumed by ``__spark_entry__``.
"""

from __future__ import annotations

from . import (  # noqa: F401  (import for registration side effects)
    dedup,
    llm_text,
    multimodal,
    pipelines,
    relational,
    scalar_functions,
    similarity,
    sources_io,
    streaming,
    udf,
    windows,
)
from .base import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
