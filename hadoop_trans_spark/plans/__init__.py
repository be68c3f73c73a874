"""Physical-plan introspection (SURVEY §4).

The engine's optimizer obligation is configuration + verification, not
implementation (Catalyst does the work): these helpers turn "did the
filter reach the scan / did the small side broadcast / is the hot path
codegen'd" into assertable properties, used by tests/test_plans.py and
available to users tuning jobs for the 100 TB target.
"""

from .explain import (
    broadcast_joins,
    codegen_subtrees,
    explain_formatted,
    pushed_filters,
    read_schemas,
    scan_partition_filters,
)

__all__ = [
    "explain_formatted",
    "pushed_filters",
    "read_schemas",
    "scan_partition_filters",
    "broadcast_joins",
    "codegen_subtrees",
]
