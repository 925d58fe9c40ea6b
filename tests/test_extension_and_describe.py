"""User-extension surface: custom transformers plug into the pipeline the same
way the reference documents (README.md:394-426 — subclass, implement
input_type/is_commutative/return type/kernel/naming), plus describe() and
cached collect_plan behaviors."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from auto_featurs_ray import ColumnType, Pipeline
from auto_featurs_ray.base.column_specification import ColumnTypeSelector
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.transformers.base import AggregatingTransformer, RowLocalTransformer
from auto_featurs_ray.transformers.over_wrapper import OverWrapper

from tests.fixtures import assert_column, basic_dataset


class ClippedTransformer(RowLocalTransformer):
    """Custom row-local kernel: clip a numeric column to [lo, hi]."""

    def __init__(self, column: str, lo: float, hi: float) -> None:
        self._column = column
        self._lo = lo
        self._hi = hi

    def input_type(self):
        return ColumnType.NUMERIC.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self):
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column}_clipped_{self._lo}_{self._hi}'

    def apply(self, table: pa.Table):
        x = table.column(self._column).cast(pa.float64())
        return pc.min_element_wise(pc.max_element_wise(x, self._lo), self._hi)


class RangeTransformer(AggregatingTransformer):
    """Custom segmented aggregate: max - min per group, broadcast."""

    def __init__(self, column: str) -> None:
        self._column = column

    def input_type(self):
        return ColumnType.NUMERIC.as_selector()

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def _return_type(self):
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column}_range'

    def compute(self, frame: AggFrame, codes):
        import pandas as pd
        from auto_featurs_ray.transformers.aggregating import _codes_or_zeros
        codes = _codes_or_zeros(codes, frame.num_rows)
        x = pd.Series(frame.numeric(self._column))
        grouped = x.groupby(codes)
        return grouped.transform('max') - grouped.transform('min')


class TestCustomTransformers:
    def test_custom_row_local_via_init_layers(self):
        df = Pipeline(basic_dataset(),
                      transformers=[[ClippedTransformer('NUMERIC_FEATURE', 1.0, 3.0)]]).collect()
        assert_column(df, 'NUMERIC_FEATURE_clipped_1.0_3.0', [1.0, 1.0, 2.0, 3.0, 3.0, 3.0])

    def test_custom_aggregate_with_over(self):
        custom = OverWrapper(RangeTransformer('NUMERIC_FEATURE'), ['GROUPING_FEATURE_NUM'])
        df = Pipeline(basic_dataset(), transformers=[[custom]]).collect()
        # groups: ZERO {0}, ODD {1,3,5}, EVEN {2,4}
        assert_column(df, 'NUMERIC_FEATURE_range_over_GROUPING_FEATURE_NUM',
                      [0.0, 4.0, 2.0, 4.0, 2.0, 4.0])


class TestDescribeAndCaching:
    def test_describe(self):
        description = (Pipeline(basic_dataset())
                       .with_polynomial('NUMERIC_FEATURE', degrees=[2], auxiliary=True)
                       .with_new_layer()
                       .with_log('NUMERIC_FEATURE', bases=[10])
                       .describe())
        assert 'Pipeline Breakdown' in description
        assert 'NUMERIC_FEATURE_pow_2' in description
        assert '[AUXILIARY]' in description
        assert 'NUMERIC_FEATURE_log10' in description
        assert 'Initial Column Count:' in description
        assert 'Total Features Created (of which auxiliary):' in description

    def test_cached_collect_plan(self):
        plan = (Pipeline(basic_dataset())
                .with_polynomial('NUMERIC_FEATURE', degrees=[2])
                .collect_plan(cache_computation=True))
        df = plan.collect()
        assert_column(df, 'NUMERIC_FEATURE_pow_2', [0, 1, 4, 9, 16, 25])
        # cached dataset is materialized: collecting twice is stable
        df2 = plan.collect()
        assert df.equals(df2)
