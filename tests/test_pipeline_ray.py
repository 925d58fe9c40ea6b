"""End-to-end pipeline conformance on a multi-block Ray Dataset.

The 6-row BASIC_FRAME is split across 3 Arrow blocks and 4 hash partitions to
prove that block boundaries and the partition shuffle do not affect
correctness (reference behaviour: pipeline/tests/test_pipeline.py).
"""

import numpy as np
import pytest

from auto_featurs_ray import CumulativeOptions, OptimizationLevel, Pipeline, col
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations, Scaling
from auto_featurs_ray.transformers.comparison import Comparisons
from auto_featurs_ray.transformers.datetime import SeasonalOperation
from auto_featurs_ray.transformers.numeric import ArithmeticOperation
from auto_featurs_ray.transformers.text import TextExtraction, TextSimilarity

from tests.fixtures import assert_column, basic_dataset


class TestRowLocalLayer:
    def test_fused_map_stage(self):
        df = (Pipeline(basic_dataset())
              .with_polynomial('NUMERIC_FEATURE', degrees=[2, 3])
              .with_log('NUMERIC_FEATURE', bases=[10])
              .with_arithmetic(['NUMERIC_FEATURE'], ['NUMERIC_FEATURE_2'],
                               operations=[ArithmeticOperation.ADD, ArithmeticOperation.DIVIDE])
              .with_comparison(['NUMERIC_FEATURE'], ['NUMERIC_FEATURE_2'], comparisons=[Comparisons.GREATER_THAN])
              .with_seasonal('DATE_FEATURE', operations=[SeasonalOperation.DAY_OF_WEEK])
              .with_text_extraction(['TEXT_FEATURE_2'], text_extractions=[TextExtraction.LENGTH])
              .with_text_similarity(['TEXT_FEATURE'], ['TEXT_FEATURE_2'], text_similarities=[TextSimilarity.JARO])
              .collect())
        assert_column(df, 'NUMERIC_FEATURE_pow_2', [0, 1, 4, 9, 16, 25])
        assert_column(df, 'NUMERIC_FEATURE_pow_3', [0, 1, 8, 27, 64, 125])
        assert_column(df, 'NUMERIC_FEATURE_log10', [-np.inf, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897])
        assert_column(df, 'NUMERIC_FEATURE_add_NUMERIC_FEATURE_2', [0] * 6)
        assert_column(df, 'NUMERIC_FEATURE_divide_NUMERIC_FEATURE_2', [None, -1.0, -1.0, -1.0, -1.0, -1.0])
        assert_column(df, 'NUMERIC_FEATURE_greater_than_NUMERIC_FEATURE_2', [False, True, True, True, True, True])
        # 2000-01-01 was a Saturday (ISO 6)
        assert_column(df, 'DATE_FEATURE_day_of_week', [6, 7, 1, 2, 3, 4])
        assert_column(df, 'TEXT_FEATURE_2_length_chars', [7, 7, 7, 14, 3, 8])
        assert_column(df, 'TEXT_FEATURE_jaro_text_similarity_TEXT_FEATURE_2',
                      [1.0, 0.428571, 0.809524, 0.690476, 0.809524, 0.958333])


class TestGlobalAggregates:
    def test_two_pass_broadcast(self):
        df = (Pipeline(basic_dataset())
              .with_scaling('NUMERIC_FEATURE', scalings=[Scaling.STANDARD, Scaling.MIN_MAX])
              .with_arithmetic_aggregation('NUMERIC_FEATURE',
                                           aggregations=[ArithmeticAggregations.SUM, ArithmeticAggregations.MEAN,
                                                         ArithmeticAggregations.STD, ArithmeticAggregations.MEDIAN])
              .with_count()
              .collect())
        assert_column(df, 'NUMERIC_FEATURE_standard_scaled',
                      [-1.336306, -0.801784, -0.267261, 0.267261, 0.801784, 1.336306])
        assert_column(df, 'NUMERIC_FEATURE_minmax_scaled', [0.0, 0.2, 0.4, 0.6, 0.8, 1.0])
        assert_column(df, 'NUMERIC_FEATURE_sum', [15.0] * 6)
        assert_column(df, 'NUMERIC_FEATURE_mean', [2.5] * 6)
        assert_column(df, 'NUMERIC_FEATURE_std', [1.870829] * 6)
        assert_column(df, 'NUMERIC_FEATURE_median', [2.5] * 6)
        assert_column(df, 'count', [6] * 6)

    def test_filtered_global(self):
        df = (Pipeline(basic_dataset())
              .with_arithmetic_aggregation('NUMERIC_FEATURE', aggregations=[ArithmeticAggregations.MAX],
                                           filtering_condition=col('BOOL_FEATURE'))
              .collect())
        assert_column(df, 'NUMERIC_FEATURE_max_where_BOOL_FEATURE', [4.0] * 6)


class TestWindowStages:
    def test_over_and_rolling_combined(self):
        df = (Pipeline(basic_dataset())
              .with_count(over_columns_combinations=[[], ['GROUPING_FEATURE_NUM']],
                          cumulative=CumulativeOptions.INCLUSIVE)
              .with_arithmetic_aggregation('NUMERIC_FEATURE', aggregations=[ArithmeticAggregations.SUM],
                                           over_columns_combinations=[[], ['GROUPING_FEATURE_NUM']],
                                           time_windows=[None, '2d1h'], index_column_name='DATE_FEATURE')
              .with_lagged('NUMERIC_FEATURE', lags=[1], over_columns_combinations=[['GROUPING_FEATURE_NUM']])
              .collect())
        assert_column(df, 'inclusive_cum_count', [1, 2, 3, 4, 5, 6])
        assert_column(df, 'inclusive_cum_count_over_GROUPING_FEATURE_NUM', [1, 1, 1, 2, 2, 3])
        assert_column(df, 'NUMERIC_FEATURE_sum', [15.0] * 6)
        assert_column(df, 'NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM', [0.0, 9.0, 6.0, 9.0, 6.0, 9.0])
        assert_column(df, 'NUMERIC_FEATURE_sum_in_the_last_2d1h', [0.0, 1.0, 3.0, 6.0, 9.0, 12.0])
        assert_column(df, 'NUMERIC_FEATURE_sum_in_the_last_2d1h_over_GROUPING_FEATURE_NUM',
                      [0.0, 1.0, 2.0, 4.0, 6.0, 8.0])
        assert_column(df, 'NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM', [None, None, None, 1, 2, 3])

    def test_exclusive_cumulative_no_leakage(self):
        df = (Pipeline(basic_dataset())
              .with_arithmetic_aggregation('NUMERIC_FEATURE', aggregations=[ArithmeticAggregations.MEAN],
                                           over_columns_combinations=[['GROUPING_FEATURE_NUM']],
                                           cumulative=CumulativeOptions.EXCLUSIVE)
              .collect())
        # EVEN group rows (idx 2,4): exclusive means no self-inclusion
        assert_column(df, 'NUMERIC_FEATURE_exclusive_cum_mean_over_GROUPING_FEATURE_NUM',
                      [None, None, None, 1.0, 2.0, 2.0])


class TestLayering:
    def test_new_layer_and_auxiliary(self):
        df = (Pipeline(basic_dataset())
              .with_polynomial('NUMERIC_FEATURE', degrees=[2], auxiliary=True)
              .with_new_layer()
              .with_arithmetic(['NUMERIC_FEATURE_pow_2'], ['NUMERIC_FEATURE'], operations=[ArithmeticOperation.ADD])
              .collect())
        assert 'NUMERIC_FEATURE_pow_2' not in df.columns
        assert_column(df, 'NUMERIC_FEATURE_pow_2_add_NUMERIC_FEATURE', [0, 2, 6, 12, 20, 30])

    def test_immutability(self):
        base = Pipeline(basic_dataset())
        derived = base.with_polynomial('NUMERIC_FEATURE', degrees=[2])
        assert base._transformers[-1] == []
        assert len(derived._transformers[-1]) == 1

    def test_unknown_column_raises(self):
        with pytest.raises(KeyError):
            Pipeline(basic_dataset()).with_polynomial('MISSING', degrees=[2])


class TestOptimizationLevels:
    def _pipeline(self, level):
        return Pipeline(basic_dataset(), optimization_level=level).with_arithmetic(
            ['NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'], ['NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'],
            operations=[ArithmeticOperation.ADD, ArithmeticOperation.SUBTRACT])

    def test_level_none_full_product(self):
        p = self._pipeline(OptimizationLevel.NONE)
        assert len(p._transformers[-1]) == 8

    def test_skip_self(self):
        p = self._pipeline(OptimizationLevel.SKIP_SELF)
        names = [t.output_name for t in p._transformers[-1]]
        assert len(names) == 4
        assert 'NUMERIC_FEATURE_add_NUMERIC_FEATURE' not in names

    def test_dedupe_commutative(self):
        p = self._pipeline(OptimizationLevel.DEDUPLICATE_COMMUTATIVE)
        names = [t.output_name for t in p._transformers[-1]]
        # add keeps one ordering, subtract keeps both
        assert names == ['NUMERIC_FEATURE_add_NUMERIC_FEATURE_2',
                         'NUMERIC_FEATURE_subtract_NUMERIC_FEATURE_2',
                         'NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE']


class TestSinkParquet:
    def test_round_trip(self, tmp_path):
        out = tmp_path / 'out'
        (Pipeline(basic_dataset())
         .with_polynomial('NUMERIC_FEATURE', degrees=[2])
         .sink_parquet(out))
        import pyarrow.dataset as pads
        table = pads.dataset(str(out)).to_table()
        assert table.num_rows == 6
        assert 'NUMERIC_FEATURE_pow_2' in table.column_names
