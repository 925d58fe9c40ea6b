"""auto_featurs_ray — a Ray-Data-native automatic feature-engineering engine.

From-scratch re-creation of the capabilities of ``t-ded/auto-featurs``
(reference at ``/root/reference``, read-only) on idiomatic Ray Data:
``read_parquet -> map_batches over zero-copy Arrow batches -> hash-partitioned
sorted window stages -> write_parquet``, with point-in-time-correct expanding
/ rolling / lag features, an as-of join, sessionization, backfill, feature
selection, and large-scale data-pipeline utilities (dedup, similarity search,
text analysis).
"""

from auto_featurs_ray.base.column_specification import (
    ColumnRole,
    ColumnSelector,
    ColumnSpecification,
    ColumnType,
    ColumnTypeSelector,
    NameContains,
    NameEndsWith,
    NameRegex,
    NameStartsWith,
    name_contains,
    name_ends_with,
    name_matches,
    name_starts_with,
)
from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.expressions import Expr, col, lit
from auto_featurs_ray.pipeline.optimizer import OptimizationLevel
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.base import CumulativeOptions

__all__ = [
    'ColumnRole', 'ColumnSelector', 'ColumnSpecification', 'ColumnType', 'ColumnTypeSelector',
    'NameContains', 'NameEndsWith', 'NameRegex', 'NameStartsWith',
    'name_contains', 'name_ends_with', 'name_matches', 'name_starts_with',
    'Schema', 'Dataset', 'Expr', 'col', 'lit', 'OptimizationLevel', 'Pipeline', 'CumulativeOptions',
]
