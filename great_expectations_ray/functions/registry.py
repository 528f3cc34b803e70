"""Expectation registry introspection — the reference's
``expectations/registry.py`` analog (auto-registration happens in our kernel
modules via ``register_condition`` / ``register_table_rule``; this module
answers "what's supported and how is it executed")."""

from __future__ import annotations


def list_expectations() -> dict[str, list[str]]:
    """Supported expectation_types grouped by execution family."""
    from great_expectations_ray.engine import (
        CRAMERS_TYPES,
        CROSS_TABLE_TYPES,
        DIST_TYPES,
        KS_TYPES,
        ORDERED_TYPES,
        PAIRED_STAT_TYPES,
        STUB_TYPES,
        TWO_PHASE_TYPES,
        UNIQUE_TYPES,
        VALUE_COUNT_TYPES,
    )
    from great_expectations_ray.functions.aggregates import AGG_EXPECTATIONS
    from great_expectations_ray.functions.column_map import CONDITION_KERNELS
    from great_expectations_ray.functions.queried import QUERIED_TYPES
    from great_expectations_ray.functions.table import TABLE_RULES

    families = {
        "map (fused vectorized pass)": sorted(
            set(CONDITION_KERNELS) - TWO_PHASE_TYPES
        ),
        "aggregate (associative partials)": sorted(AGG_EXPECTATIONS),
        "table/schema": sorted(TABLE_RULES),
        "two-phase": sorted(TWO_PHASE_TYPES),
        "wide: global uniqueness (shuffle)": sorted(UNIQUE_TYPES),
        "wide: value-count backed": sorted(VALUE_COUNT_TYPES),
        "ordered (partition_by/order_by)": sorted(ORDERED_TYPES),
        "distributional": sorted(DIST_TYPES | CRAMERS_TYPES),
        "cross-table": sorted(CROSS_TABLE_TYPES),
        "wide: KS tests (sort + offset-linear summaries)": sorted(KS_TYPES),
        "queried (shared stream->DuckDB pass)": sorted(QUERIED_TYPES),
        "paired-column statistical tests": sorted(PAIRED_STAT_TYPES),
        "stubs (stub in reference too)": sorted(STUB_TYPES),
    }
    return families


def supported_expectation_types() -> set[str]:
    out: set[str] = set()
    for types in list_expectations().values():
        out.update(types)
    return out
