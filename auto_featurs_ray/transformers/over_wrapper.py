"""OverWrapper: apply any aggregating transformer per group.

The reference implements this as ``expr.over(keys)``
(``/root/reference/src/auto_featurs/transformers/over_wrapper.py:28-30``).  In
this engine the wrapper is *the partitioning step*: the planner uses the
outermost wrapper's ``over_columns`` as the shuffle key (hash-partition +
in-partition sort), and at compute time the wrapper refines the group codes
and delegates to the inner transformer — so nested ``over`` composes the same
way polars windows do (inner evaluated within the outer group).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np

from auto_featurs_ray.base.column_specification import ColumnType, get_names_from_column_specs
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.transformers.base import AggregatingTransformer


class OverWrapper(AggregatingTransformer):
    def __init__(self, inner_transformer: AggregatingTransformer,
                 over_columns: Iterable, *args: Any) -> None:
        self._inner_transformer = inner_transformer
        self._over_columns: list = get_names_from_column_specs(over_columns)

    @property
    def inner_transformer(self) -> AggregatingTransformer:
        return self._inner_transformer

    @property
    def over_columns(self) -> list:
        return self._over_columns

    def input_type(self):
        return self._inner_transformer.input_type()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self) -> ColumnType:
        return self._inner_transformer.output_column_specification.column_type

    def _output_name(self) -> str:
        return self._inner_transformer.output_name + '_over_' + '_and_'.join(self._over_columns)

    def compute(self, frame: AggFrame, codes: Optional[np.ndarray]):
        combined = frame.group_codes(self._over_columns, base=codes)
        return self._inner_transformer.compute(frame, combined)
