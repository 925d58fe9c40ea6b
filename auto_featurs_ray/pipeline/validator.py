"""Input-type validation for generated transformers (ref pipeline/validator.py)."""

from __future__ import annotations

from datetime import timedelta
from typing import Optional, Sequence, Union

from auto_featurs_ray.base.column_specification import (
    ColumnSpecification,
    ColumnType,
    ColumnTypeSelector,
)
from auto_featurs_ray.transformers.aggregating import CountTransformer
from auto_featurs_ray.transformers.base import Transformer
from auto_featurs_ray.transformers.over_wrapper import OverWrapper
from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper


class Validator:
    @staticmethod
    def validate_time_window_index_column(time_windows: Sequence, index_column: Optional[ColumnSpecification]) -> None:
        if time_windows and time_windows[0] is not None and index_column is None:
            raise ValueError('Time window specified without index column.')
        if index_column is not None and index_column.column_type != ColumnType.DATETIME:
            raise ValueError(
                f'Currently only {ColumnType.DATETIME} columns are supported for rolling aggregation '
                f'but {index_column.column_type} was passed for {index_column.name}.')

    @staticmethod
    def validate_transformer_against_input_columns(transformer: Transformer, input_columns: tuple) -> None:
        if isinstance(transformer, (RollingWrapper, OverWrapper, CountTransformer)):
            return

        expected = transformer.input_type()
        selectors = (expected,) if isinstance(expected, ColumnTypeSelector) else tuple(expected)

        if len(input_columns) != len(selectors):
            raise ValueError(
                f'Transformer {transformer} expected {len(selectors)} input columns, '
                f'but received {len(input_columns)}.')

        for column, selector in zip(input_columns, selectors):
            if not selector.matches(column):
                raise ValueError(
                    f"Column '{column.name}' has type '{column.column_type}', "
                    f"but transformer {transformer} expected one of '{selector.types}'.")
