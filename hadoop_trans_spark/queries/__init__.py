"""Declared query surface (SURVEY §2B) with DuckDB oracles.

Each submodule registers queries via ``base.query``; importing this package
populates the global registries consumed by ``__spark_entry__``.
"""

from __future__ import annotations

# Registration order = the order a time-capped correctness sweep visits
# queries, so modules register cheapest-first: the relational/scalar/window
# surface costs ~0.3 s/query while the dedup/pipeline/streaming families
# each run multi-second Spark jobs. (Within a module, decorator order.)
from . import (  # noqa: F401  (import for registration side effects)
    relational,
    scalar_functions,
    windows,
    timeseries,
    maintenance,
    udf,
    llm_text,
    curation,
    multimodal,
    similarity,
    sources_io,
    dedup,
    pipelines,
    streaming,
)
from .base import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
