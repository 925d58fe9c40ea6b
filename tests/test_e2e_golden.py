"""The reference's end-to-end conformance corpus: one pipeline invoking every
``with_*`` family over BASIC_FRAME with the expected output columns copied
verbatim from ``pipeline/tests/test_pipeline.py:204-441``.

Runs on a 3-block / 4-partition Ray Dataset so the whole engine path (fused
map stage, multiple window shuffles, global two-pass broadcast) is exercised.
"""

import math
from datetime import timedelta

import numpy as np
import pytest

from auto_featurs_ray import ColumnRole, ColumnType, CumulativeOptions, col
from auto_featurs_ray.pipeline.pipeline import Pipeline
from auto_featurs_ray.transformers.aggregating import ArithmeticAggregations, Scaling
from auto_featurs_ray.transformers.comparison import Comparisons
from auto_featurs_ray.transformers.datetime import SeasonalOperation
from auto_featurs_ray.transformers.numeric import ArithmeticOperation, Goniometric
from auto_featurs_ray.transformers.text import TextExtraction, TextSimilarity

from tests.fixtures import assert_column, basic_dataset

INF = float('inf')


@pytest.fixture(scope='module')
def e2e_result():
    pipeline = (
        Pipeline(basic_dataset())
        .with_seasonal(subset=ColumnType.DATETIME & ~ColumnRole.TIME_INFO, operations=[SeasonalOperation.HOUR_OF_DAY])
        .with_seasonal(subset='DATE_FEATURE', operations=[SeasonalOperation.HOUR_OF_DAY])
        .with_seasonal(subset='DATE_FEATURE', operations=[SeasonalOperation.DAY_OF_WEEK])
        .with_seasonal(subset='DATE_FEATURE', operations=[SeasonalOperation.MONTH_OF_YEAR])
        .with_seasonal(subset='DATE_FEATURE',
                       operations=[SeasonalOperation.HOUR_OF_DAY, SeasonalOperation.DAY_OF_WEEK,
                                   SeasonalOperation.MONTH_OF_YEAR], periodic=True)
        .with_time_diff(left_subset='DATE_FEATURE', right_subset='DATE_FEATURE', unit='s')
        .with_time_diff(left_subset='DATE_FEATURE', right_subset='DATE_FEATURE', unit='h')
        .with_time_diff(left_subset='DATE_FEATURE', right_subset='DATE_FEATURE', unit='d')
        .with_polynomial(subset=ColumnType.NUMERIC, degrees=[2, 3])
        .with_log(subset='NUMERIC_FEATURE', bases=[math.e, 10])
        .with_goniometric(subset='NUMERIC_FEATURE', functions=[Goniometric.SIN, Goniometric.COS])
        .with_scaling(subset='NUMERIC_FEATURE', scalings=[Scaling.STANDARD, Scaling.MIN_MAX])
        .with_arithmetic(left_subset=ColumnType.NUMERIC, right_subset=ColumnType.NUMERIC,
                         operations=[ArithmeticOperation.ADD, ArithmeticOperation.SUBTRACT,
                                     ArithmeticOperation.MULTIPLY, ArithmeticOperation.DIVIDE])
        .with_comparison(left_subset=ColumnType.NUMERIC, right_subset=ColumnType.NUMERIC,
                         comparisons=[Comparisons.EQUAL, Comparisons.GREATER_THAN, Comparisons.GREATER_OR_EQUAL])
        .with_comparison(
            left_subset=(ColumnType.ORDINAL | ColumnType.NOMINAL) & ~ColumnRole.IDENTIFIER,
            right_subset=(ColumnType.ORDINAL | ColumnType.NOMINAL) & ~ColumnRole.IDENTIFIER,
            comparisons=[Comparisons.EQUAL, Comparisons.GREATER_THAN, Comparisons.GREATER_OR_EQUAL])
        .with_count(over_columns_combinations=[[], ['GROUPING_FEATURE_NUM'],
                                               ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']])
        .with_count(over_columns_combinations=[['GROUPING_FEATURE_NUM']], cumulative=CumulativeOptions.INCLUSIVE)
        .with_count(over_columns_combinations=[[], ['GROUPING_FEATURE_NUM']],
                    time_windows=['2d', timedelta(days=2, hours=1)], index_column_name='DATE_FEATURE')
        .with_count(over_columns_combinations=[['GROUPING_FEATURE_NUM']], filtering_condition=col('BOOL_FEATURE'))
        .with_lagged(subset=ColumnType.NUMERIC, lags=[1],
                     over_columns_combinations=[[], ['GROUPING_FEATURE_NUM'],
                                                ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']], fill_value=0)
        .with_lagged(subset=(ColumnType.ORDINAL | ColumnType.NOMINAL) & ~ColumnRole.IDENTIFIER,
                     lags=[1, 2], fill_value='missing')
        .with_first_value(subset=(ColumnType.NUMERIC | ColumnType.ORDINAL) & ~ColumnRole.IDENTIFIER,
                          over_columns_combinations=[[], ['GROUPING_FEATURE_NUM'],
                                                     ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']])
        .with_mode(subset=[ColumnType.BOOLEAN], over_columns_combinations=[[], ['GROUPING_FEATURE_NUM']])
        .with_num_unique(subset=[ColumnType.BOOLEAN],
                         over_columns_combinations=[[], ['GROUPING_FEATURE_NUM'],
                                                    ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']])
        .with_entity_entropy(source_subset='TEXT_FEATURE', target_subset='TEXT_FEATURE_2')
        .with_entity_entropy(source_subset='TEXT_FEATURE_2', target_subset='TEXT_FEATURE')
        .with_pointwise_mutual_information(column_a_subset='GROUPING_FEATURE_NUM',
                                           column_b_subset='GROUPING_FEATURE_CAT_2')
        .with_arithmetic_aggregation(
            subset=ColumnType.NUMERIC,
            aggregations=[ArithmeticAggregations.MIN, ArithmeticAggregations.MAX, ArithmeticAggregations.SUM,
                          ArithmeticAggregations.MEAN, ArithmeticAggregations.STD, ArithmeticAggregations.ZSCORE],
            over_columns_combinations=[['GROUPING_FEATURE_NUM'],
                                       ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']])
        .with_arithmetic_aggregation(subset='NUMERIC_FEATURE', aggregations=[ArithmeticAggregations.QUANTILE],
                                     quantiles=[0.25, 0.5, 0.75])
        .with_argmin(value_subset='NUMERIC_FEATURE_2', arg_subset='CATEGORICAL_FEATURE',
                     over_columns_combinations=[['GROUPING_FEATURE_NUM']])
        .with_argmax(value_subset='NUMERIC_FEATURE', arg_subset='CATEGORICAL_FEATURE',
                     over_columns_combinations=[['GROUPING_FEATURE_NUM']])
        .with_text_similarity(left_subset='TEXT_FEATURE', right_subset='TEXT_FEATURE_2',
                              text_similarities=[TextSimilarity.DAMERAU_LEVENSHTEIN, TextSimilarity.JACCARD,
                                                 TextSimilarity.JARO, TextSimilarity.JARO_WINKLER],
                              substr_size=3, weight=0.2)
        .with_text_extraction(subset='TEXT_FEATURE_3',
                              text_extractions=[TextExtraction.LENGTH, TextExtraction.EMAIL_DOMAIN,
                                                TextExtraction.CHARACTER_ENTROPY])
        .with_text_count_matches(subset='TEXT_FEATURE_3', patterns=[r'\d', r'[A-Z]'])
    )
    return pipeline.collect()


EXPECTED = {
    'DATE_FEATURE_hour_of_day': [0, 0, 0, 0, 0, 0],
    'DATE_FEATURE_day_of_week': [6, 7, 1, 2, 3, 4],
    'DATE_FEATURE_month_of_year': [1, 1, 1, 1, 1, 1],
    'DATE_FEATURE_hour_of_day_angular_sin': [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    'DATE_FEATURE_hour_of_day_angular_cos': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    'DATE_FEATURE_day_of_week_angular_sin': [-0.974928, -0.781831, 0.0, 0.781831, 0.974928, 0.433884],
    'DATE_FEATURE_day_of_week_angular_cos': [-0.222521, 0.62349, 1.0, 0.62349, -0.222521, -0.900969],
    'DATE_FEATURE_month_of_year_angular_sin': [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    'DATE_FEATURE_month_of_year_angular_cos': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    'DATE_FEATURE_total_seconds_diff_DATE_FEATURE': [0, 0, 0, 0, 0, 0],
    'DATE_FEATURE_total_hours_diff_DATE_FEATURE': [0, 0, 0, 0, 0, 0],
    'DATE_FEATURE_total_days_diff_DATE_FEATURE': [0, 0, 0, 0, 0, 0],
    'NUMERIC_FEATURE_pow_2': [0, 1, 4, 9, 16, 25],
    'NUMERIC_FEATURE_pow_3': [0, 1, 8, 27, 64, 125],
    'NUMERIC_FEATURE_2_pow_2': [0, 1, 4, 9, 16, 25],
    'NUMERIC_FEATURE_2_pow_3': [0, -1, -8, -27, -64, -125],
    'NUMERIC_FEATURE_ln': [-INF, 0.0, 0.69314718, 1.09861229, 1.38629436, 1.60943791],
    'NUMERIC_FEATURE_log10': [-INF, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897],
    'NUMERIC_FEATURE_sin': [0.0, 0.84147098, 0.90929743, 0.14112001, -0.7568025, -0.95892427],
    'NUMERIC_FEATURE_cos': [1.0, 0.54030231, -0.41614684, -0.9899925, -0.65364362, 0.28366219],
    'NUMERIC_FEATURE_standard_scaled': [-1.336306, -0.801784, -0.267261, 0.267261, 0.801784, 1.336306],
    'NUMERIC_FEATURE_minmax_scaled': [0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
    'NUMERIC_FEATURE_add_NUMERIC_FEATURE': [0, 2, 4, 6, 8, 10],
    'NUMERIC_FEATURE_add_NUMERIC_FEATURE_2': [0, 0, 0, 0, 0, 0],
    'NUMERIC_FEATURE_2_add_NUMERIC_FEATURE': [0, 0, 0, 0, 0, 0],
    'NUMERIC_FEATURE_2_add_NUMERIC_FEATURE_2': [0, -2, -4, -6, -8, -10],
    'NUMERIC_FEATURE_subtract_NUMERIC_FEATURE': [0, 0, 0, 0, 0, 0],
    'NUMERIC_FEATURE_subtract_NUMERIC_FEATURE_2': [0, 2, 4, 6, 8, 10],
    'NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE': [0, -2, -4, -6, -8, -10],
    'NUMERIC_FEATURE_2_subtract_NUMERIC_FEATURE_2': [0, 0, 0, 0, 0, 0],
    'NUMERIC_FEATURE_multiply_NUMERIC_FEATURE': [0, 1, 4, 9, 16, 25],
    'NUMERIC_FEATURE_multiply_NUMERIC_FEATURE_2': [0, -1, -4, -9, -16, -25],
    'NUMERIC_FEATURE_2_multiply_NUMERIC_FEATURE': [0, -1, -4, -9, -16, -25],
    'NUMERIC_FEATURE_2_multiply_NUMERIC_FEATURE_2': [0, 1, 4, 9, 16, 25],
    'NUMERIC_FEATURE_divide_NUMERIC_FEATURE': [None, 1.0, 1.0, 1.0, 1.0, 1.0],
    'NUMERIC_FEATURE_divide_NUMERIC_FEATURE_2': [None, -1.0, -1.0, -1.0, -1.0, -1.0],
    'NUMERIC_FEATURE_2_divide_NUMERIC_FEATURE': [None, -1.0, -1.0, -1.0, -1.0, -1.0],
    'NUMERIC_FEATURE_2_divide_NUMERIC_FEATURE_2': [None, 1.0, 1.0, 1.0, 1.0, 1.0],
    'NUMERIC_FEATURE_equal_NUMERIC_FEATURE': [True] * 6,
    'NUMERIC_FEATURE_equal_NUMERIC_FEATURE_2': [True, False, False, False, False, False],
    'NUMERIC_FEATURE_2_equal_NUMERIC_FEATURE': [True, False, False, False, False, False],
    'NUMERIC_FEATURE_2_equal_NUMERIC_FEATURE_2': [True] * 6,
    'NUMERIC_FEATURE_greater_than_NUMERIC_FEATURE': [False] * 6,
    'NUMERIC_FEATURE_greater_than_NUMERIC_FEATURE_2': [False, True, True, True, True, True],
    'NUMERIC_FEATURE_2_greater_than_NUMERIC_FEATURE': [False] * 6,
    'NUMERIC_FEATURE_2_greater_than_NUMERIC_FEATURE_2': [False] * 6,
    'NUMERIC_FEATURE_greater_or_equal_NUMERIC_FEATURE': [True] * 6,
    'NUMERIC_FEATURE_greater_or_equal_NUMERIC_FEATURE_2': [True] * 6,
    'NUMERIC_FEATURE_2_greater_or_equal_NUMERIC_FEATURE': [True, False, False, False, False, False],
    'NUMERIC_FEATURE_2_greater_or_equal_NUMERIC_FEATURE_2': [True] * 6,
    'CATEGORICAL_FEATURE_equal_CATEGORICAL_FEATURE': [True] * 6,
    'CATEGORICAL_FEATURE_equal_CATEGORICAL_FEATURE_2': [False] * 6,
    'CATEGORICAL_FEATURE_2_equal_CATEGORICAL_FEATURE': [False] * 6,
    'CATEGORICAL_FEATURE_2_equal_CATEGORICAL_FEATURE_2': [True] * 6,
    'CATEGORICAL_FEATURE_greater_than_CATEGORICAL_FEATURE': [False] * 6,
    'CATEGORICAL_FEATURE_greater_than_CATEGORICAL_FEATURE_2': [False, False, False, True, True, True],
    'CATEGORICAL_FEATURE_2_greater_than_CATEGORICAL_FEATURE': [True, True, True, False, False, False],
    'CATEGORICAL_FEATURE_2_greater_than_CATEGORICAL_FEATURE_2': [False] * 6,
    'CATEGORICAL_FEATURE_greater_or_equal_CATEGORICAL_FEATURE': [True] * 6,
    'CATEGORICAL_FEATURE_greater_or_equal_CATEGORICAL_FEATURE_2': [False, False, False, True, True, True],
    'CATEGORICAL_FEATURE_2_greater_or_equal_CATEGORICAL_FEATURE': [True, True, True, False, False, False],
    'CATEGORICAL_FEATURE_2_greater_or_equal_CATEGORICAL_FEATURE_2': [True] * 6,
    'count': [6] * 6,
    'count_over_GROUPING_FEATURE_NUM': [1, 3, 2, 3, 2, 3],
    'count_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [1, 2, 2, 1, 2, 2],
    'inclusive_cum_count_over_GROUPING_FEATURE_NUM': [1, 1, 1, 2, 2, 3],
    'count_in_the_last_2d': [1, 2, 2, 2, 2, 2],
    'count_in_the_last_2d1h': [1, 2, 3, 3, 3, 3],
    'count_in_the_last_2d_over_GROUPING_FEATURE_NUM': [1, 1, 1, 1, 1, 1],
    'count_in_the_last_2d1h_over_GROUPING_FEATURE_NUM': [1, 1, 1, 2, 2, 2],
    'count_where_BOOL_FEATURE_over_GROUPING_FEATURE_NUM': [1, 0, 2, 0, 2, 0],
    'NUMERIC_FEATURE_lagged_1': [0, 0, 1, 2, 3, 4],
    'NUMERIC_FEATURE_2_lagged_1': [0, 0, -1, -2, -3, -4],
    'NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM': [0, 0, 0, 1, 2, 3],
    'NUMERIC_FEATURE_lagged_1_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 0, 0, 0, 2, 1],
    'NUMERIC_FEATURE_2_lagged_1_over_GROUPING_FEATURE_NUM': [0, 0, 0, -1, -2, -3],
    'NUMERIC_FEATURE_2_lagged_1_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 0, 0, 0, -2, -1],
    'CATEGORICAL_FEATURE_lagged_1': ['missing', 'A', 'B', 'C', 'D', 'E'],
    'CATEGORICAL_FEATURE_lagged_2': ['missing', 'missing', 'A', 'B', 'C', 'D'],
    'CATEGORICAL_FEATURE_2_lagged_1': ['missing', 'F', 'E', 'D', 'C', 'B'],
    'CATEGORICAL_FEATURE_2_lagged_2': ['missing', 'missing', 'F', 'E', 'D', 'C'],
    'CATEGORICAL_FEATURE_first_value': ['A'] * 6,
    'NUMERIC_FEATURE_first_value': [0] * 6,
    'NUMERIC_FEATURE_2_first_value': [0] * 6,
    'CATEGORICAL_FEATURE_first_value_over_GROUPING_FEATURE_NUM': ['A', 'B', 'C', 'B', 'C', 'B'],
    'CATEGORICAL_FEATURE_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': ['A', 'B', 'C', 'D', 'C', 'B'],
    'NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM': [0, 1, 2, 1, 2, 1],
    'NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 1, 2, 3, 2, 1],
    'NUMERIC_FEATURE_2_first_value_over_GROUPING_FEATURE_NUM': [0, -1, -2, -1, -2, -1],
    'NUMERIC_FEATURE_2_first_value_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, -1, -2, -3, -2, -1],
    'BOOL_FEATURE_mode': [True] * 6,
    'BOOL_FEATURE_mode_over_GROUPING_FEATURE_NUM': [True, False, True, False, True, False],
    'BOOL_FEATURE_num_unique': [2] * 6,
    'BOOL_FEATURE_num_unique_over_GROUPING_FEATURE_NUM': [1] * 6,
    'BOOL_FEATURE_num_unique_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [1] * 6,
    'TEXT_FEATURE_2_by_TEXT_FEATURE_entropy': [2.584963] * 6,
    'TEXT_FEATURE_by_TEXT_FEATURE_2_entropy': [0.0] * 6,
    'GROUPING_FEATURE_NUM_GROUPING_FEATURE_CAT_2_pmi': [0.584963, 1.0, 0.584963, -1.0, 0.584963, 1.0],
    'NUMERIC_FEATURE_min_over_GROUPING_FEATURE_NUM': [0, 1, 2, 1, 2, 1],
    'NUMERIC_FEATURE_min_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 1, 2, 3, 2, 1],
    'NUMERIC_FEATURE_2_min_over_GROUPING_FEATURE_NUM': [0, -5, -4, -5, -4, -5],
    'NUMERIC_FEATURE_2_min_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, -5, -4, -3, -4, -5],
    'NUMERIC_FEATURE_max_over_GROUPING_FEATURE_NUM': [0, 5, 4, 5, 4, 5],
    'NUMERIC_FEATURE_max_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 5, 4, 3, 4, 5],
    'NUMERIC_FEATURE_2_max_over_GROUPING_FEATURE_NUM': [0, -1, -2, -1, -2, -1],
    'NUMERIC_FEATURE_2_max_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, -1, -2, -3, -2, -1],
    'NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM': [0, 9, 6, 9, 6, 9],
    'NUMERIC_FEATURE_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, 6, 6, 3, 6, 6],
    'NUMERIC_FEATURE_2_sum_over_GROUPING_FEATURE_NUM': [0, -9, -6, -9, -6, -9],
    'NUMERIC_FEATURE_2_sum_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0, -6, -6, -3, -6, -6],
    'NUMERIC_FEATURE_mean_over_GROUPING_FEATURE_NUM': [0.0, 3.0, 3.0, 3.0, 3.0, 3.0],
    'NUMERIC_FEATURE_mean_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0.0, 3.0, 3.0, 3.0, 3.0, 3.0],
    'NUMERIC_FEATURE_2_mean_over_GROUPING_FEATURE_NUM': [0.0, -3.0, -3.0, -3.0, -3.0, -3.0],
    'NUMERIC_FEATURE_2_mean_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [0.0, -3.0, -3.0, -3.0, -3.0, -3.0],
    'NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM': [None, 2.0, 1.414214, 2.0, 1.414214, 2.0],
    'NUMERIC_FEATURE_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [None, 2.828427, 1.414214, None, 1.414214, 2.828427],
    'NUMERIC_FEATURE_2_std_over_GROUPING_FEATURE_NUM': [None, 2.0, 1.414214, 2.0, 1.414214, 2.0],
    'NUMERIC_FEATURE_2_std_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [None, 2.828427, 1.414214, None, 1.414214, 2.828427],
    'NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM': [None, -1.0, -0.707107, 0.0, 0.707107, 1.0],
    'NUMERIC_FEATURE_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [None, -0.707107, -0.707107, None, 0.707107, 0.707107],
    'NUMERIC_FEATURE_2_z_score_over_GROUPING_FEATURE_NUM': [None, 1.0, 0.707107, 0.0, -0.707107, -1.0],
    'NUMERIC_FEATURE_2_z_score_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2': [None, 0.707107, 0.707107, None, -0.707107, -0.707107],
    'NUMERIC_FEATURE_quantile_25': [1.25] * 6,
    'NUMERIC_FEATURE_median': [2.5] * 6,
    'NUMERIC_FEATURE_quantile_75': [3.75] * 6,
    'argmin_of_NUMERIC_FEATURE_2_by_CATEGORICAL_FEATURE_over_GROUPING_FEATURE_NUM': ['A', 'F', 'E', 'F', 'E', 'F'],
    'argmax_of_NUMERIC_FEATURE_by_CATEGORICAL_FEATURE_over_GROUPING_FEATURE_NUM': ['A', 'F', 'E', 'F', 'E', 'F'],
    'TEXT_FEATURE_damerau_levenshtein_text_similarity_TEXT_FEATURE_2': [1.0, 0.142857, 0.714286, 0.5, 0.428571, 0.875],
    'TEXT_FEATURE_jaccard_text_similarity_TEXT_FEATURE_2': [1.0, 0.25, 0.111111, 0.307692, 0.2, 0.375],
    'TEXT_FEATURE_jaro_text_similarity_TEXT_FEATURE_2': [1.0, 0.428571, 0.809524, 0.690476, 0.809524, 0.958333],
    'TEXT_FEATURE_jaro_winkler_text_similarity_TEXT_FEATURE_2': [1.0, 0.428571, 0.809524, 0.690476, 0.92381, 0.983333],
    'TEXT_FEATURE_3_length_chars': [20, 10, 9, 14, 17, 0],
    'TEXT_FEATURE_3_email_domain': ['example.com', None, None, None, 'co.gov.uk', None],
    'TEXT_FEATURE_3_character_entropy': [3.64644, 2.84644, 1.58496, 3.52164, 3.49923, 0.0],
    'TEXT_FEATURE_3_count_digits': [0, 3, 3, 2, 0, 0],
    'TEXT_FEATURE_3_count_uppercase': [0, 4, 3, 0, 0, 0],
}


class TestEndToEndGolden:
    def test_all_expected_columns_present(self, e2e_result):
        missing = [name for name in EXPECTED if name not in e2e_result.columns]
        assert not missing, f'missing columns: {missing}'

    @pytest.mark.parametrize('name', sorted(EXPECTED))
    def test_column(self, e2e_result, name):
        assert_column(e2e_result, name, EXPECTED[name], atol=1e-4)
