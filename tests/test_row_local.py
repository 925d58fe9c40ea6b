"""Row-local kernel conformance vs reference golden literals.

Goldens from /root/reference/src/auto_featurs/transformers/tests/
test_numeric_transformers.py, test_datetime_transformers.py,
test_text_transformers.py, test_comparison_transformers.py.
"""

from datetime import datetime

import pyarrow as pa
import pytest

from auto_featurs_ray.transformers.comparison import (
    EqualTransformer,
    GreaterOrEqualTransformer,
    GreaterThanTransformer,
)
from auto_featurs_ray.transformers.datetime import (
    DayOfWeekTransformer,
    HourOfDayTransformer,
    MonthOfYearTransformer,
    TimeDiffTransformer,
)
from auto_featurs_ray.transformers.numeric import (
    AddTransformer,
    CosTransformer,
    DivideTransformer,
    LogTransformer,
    MultiplyTransformer,
    PolynomialTransformer,
    SinTransformer,
    SubtractTransformer,
)
from auto_featurs_ray.transformers.text import (
    CharacterEntropyTransformer,
    CommonPatterns,
    DamerauLevenshteinSimilarityTransformer,
    EmailDomainExtractionTransformer,
    JaccardSimilarityTransformer,
    JaroSimilarityTransformer,
    JaroWinklerSimilarityTransformer,
    TextCountMatchesTransformer,
    TextLengthTransformer,
)

from tests.fixtures import BASIC_TABLE
from tests.test_aggregating_kernels import close, _norm

INF = float('inf')


def run(t, table=None):
    arr = t.apply(table if table is not None else BASIC_TABLE)
    return [_norm(v) for v in arr.to_pylist()]


class TestNumeric:
    @pytest.mark.parametrize(('t', 'want'), [
        (PolynomialTransformer('NUMERIC_FEATURE', degree=2), [0, 1, 4, 9, 16, 25]),
        (PolynomialTransformer('NUMERIC_FEATURE_2', degree=3), [0, -1, -8, -27, -64, -125]),
        (LogTransformer('NUMERIC_FEATURE'), [-INF, 0.0, 0.69314718, 1.09861229, 1.38629436, 1.60943791]),
        (LogTransformer('NUMERIC_FEATURE', base=10), [-INF, 0.0, 0.30103, 0.47712125, 0.60205999, 0.69897]),
        (SinTransformer('NUMERIC_FEATURE'), [0.0, 0.84147098, 0.90929743, 0.14112001, -0.7568025, -0.95892427]),
        (CosTransformer('NUMERIC_FEATURE'), [1.0, 0.54030231, -0.41614684, -0.9899925, -0.65364362, 0.28366219]),
        (AddTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'), [0] * 6),
        (SubtractTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'), [0, 2, 4, 6, 8, 10]),
        (MultiplyTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'), [0, -1, -4, -9, -16, -25]),
        (AddTransformer('NUMERIC_FEATURE', 'BOOL_FEATURE'), [1, 1, 3, 3, 5, 5]),
        (SubtractTransformer('NUMERIC_FEATURE', 'BOOL_FEATURE'), [-1, 1, 1, 3, 3, 5]),
        (MultiplyTransformer('NUMERIC_FEATURE', 'BOOL_FEATURE'), [0, 0, 2, 0, 4, 0]),
        (DivideTransformer('NUMERIC_FEATURE', 'BOOL_FEATURE'), [0.0, INF, 2.0, INF, 4.0, INF]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)

    def test_divide_zero_by_zero_is_nan(self):
        got = run(DivideTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'))
        assert got[0] is None  # NaN normalised to None by the comparator
        close(got[1:], [-1.0] * 5)

    def test_names(self):
        assert PolynomialTransformer('X', degree=2).output_name == 'X_pow_2'
        assert LogTransformer('X').output_name == 'X_ln'
        assert LogTransformer('X', base=10).output_name == 'X_log10'
        assert DivideTransformer('A', 'B').output_name == 'A_divide_B'


class TestComparison:
    def test_golden(self):
        close(run(EqualTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2')), [True, False, False, False, False, False])
        close(run(GreaterThanTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2')), [False, True, True, True, True, True])
        close(run(GreaterOrEqualTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2')), [True] * 6)
        # lexicographic string comparison
        close(run(GreaterThanTransformer('CATEGORICAL_FEATURE', 'CATEGORICAL_FEATURE_2')),
              [False, False, False, True, True, True])


DT_TABLE = pa.table({
    'DATE_FEATURE': pa.array([datetime(2018, 1, 1, 0), datetime(2018, 2, 2, 6),
                              datetime(2018, 6, 15, 12), datetime(2018, 12, 31, 23)], pa.timestamp('us')),
    'DATE_FEATURE_2': pa.array([datetime(2018, 1, 2, 1, 0, 1), datetime(2018, 2, 3, 7, 0, 1),
                                datetime(2018, 6, 16, 13, 0, 1), datetime(2019, 1, 2, 0, 0, 1)], pa.timestamp('us')),
})


class TestDatetime:
    def test_seasonal(self):
        close(run(HourOfDayTransformer('DATE_FEATURE'), DT_TABLE), [0, 6, 12, 23])
        close(run(MonthOfYearTransformer('DATE_FEATURE'), DT_TABLE), [1, 2, 6, 12])
        # 2018-01-01 was a Monday (ISO 1)
        close(run(DayOfWeekTransformer('DATE_FEATURE'), DT_TABLE), [1, 5, 5, 1])

    def test_seasonal_angular(self):
        import math
        got = run(HourOfDayTransformer('DATE_FEATURE', angular=True), DT_TABLE)
        close(got, [0.0, 6 * 2 * math.pi / 24, 12 * 2 * math.pi / 24, 23 * 2 * math.pi / 24])
        got = run(HourOfDayTransformer('DATE_FEATURE', angular=True, gon_transformation='sin'), DT_TABLE)
        close(got, [math.sin(h * 2 * math.pi / 24) for h in (0, 6, 12, 23)])

    def test_angular_requires_flag(self):
        with pytest.raises(ValueError):
            HourOfDayTransformer('DATE_FEATURE', angular=False, gon_transformation='sin')

    def test_time_diff(self):
        # diffs are 1d1h1s = 90001 s -> 25 h -> 1 d (truncated)
        close(run(TimeDiffTransformer('DATE_FEATURE_2', 'DATE_FEATURE', unit='s'), DT_TABLE), [90001.0] * 4)
        close(run(TimeDiffTransformer('DATE_FEATURE_2', 'DATE_FEATURE', unit='h'), DT_TABLE), [25.0] * 4)
        close(run(TimeDiffTransformer('DATE_FEATURE_2', 'DATE_FEATURE', unit='d'), DT_TABLE), [1.0] * 4)

    def test_names(self):
        assert HourOfDayTransformer('D', angular=True, gon_transformation='sin').output_name == 'D_hour_of_day_angular_sin'
        assert TimeDiffTransformer('L', 'R', unit='h').output_name == 'L_total_hours_diff_R'


TEXT_TABLE = pa.table({
    'TEXT_FEATURE': ['john.doe@example.com', 'USER123!!!', 'aaaBBB111', 'straße café 42'],
    'EMAIL': ['louis@gmail.com', 'user@seznam.cz', 'john.doe@email.com', 'london@gov.co.uk'],
})


class TestTextExtraction:
    def test_length(self):
        close(run(TextLengthTransformer('TEXT_FEATURE'), TEXT_TABLE), [20, 10, 9, 14])

    def test_email_domain(self):
        close(run(EmailDomainExtractionTransformer('EMAIL'), TEXT_TABLE),
              ['gmail.com', 'seznam.cz', 'email.com', 'gov.co.uk'])

    def test_character_entropy(self):
        close(run(CharacterEntropyTransformer('TEXT_FEATURE'), TEXT_TABLE),
              [3.64644, 2.84644, 1.58496, 3.52164], atol=1e-4)

    @pytest.mark.parametrize(('pattern', 'name', 'want'), [
        (r'\d', 'TEXT_FEATURE_count_digits', [0, 3, 3, 2]),
        (CommonPatterns.CONSECUTIVE_DIGITS, 'TEXT_FEATURE_count_consecutive_digits', [0, 1, 1, 0]),
        (r'[A-Z]', 'TEXT_FEATURE_count_uppercase', [0, 4, 3, 0]),
        (r'[^A-Za-z0-9]', 'TEXT_FEATURE_count_non_alphanumeric', [3, 3, 0, 4]),
        (r'\s', 'TEXT_FEATURE_count_whitespace', [0, 0, 0, 2]),
        (r'[^\x00-\x7F]', 'TEXT_FEATURE_count_non_ascii', [0, 0, 0, 2]),
    ])
    def test_count_matches(self, pattern, name, want):
        t = TextCountMatchesTransformer('TEXT_FEATURE', pattern)
        assert t.output_name == name
        close(run(t, TEXT_TABLE), want)


class TestTextSimilarity:
    @pytest.mark.parametrize(('t', 'want'), [
        (DamerauLevenshteinSimilarityTransformer('TEXT_FEATURE', 'TEXT_FEATURE_2'),
         [1.0, 0.142857, 0.714286, 0.5, 0.428571, 0.875]),
        (JaccardSimilarityTransformer('TEXT_FEATURE', 'TEXT_FEATURE_2'),
         [1.0, 0.5, 0.333333, 0.461538, 0.333333, 0.625]),
        (JaroSimilarityTransformer('TEXT_FEATURE', 'TEXT_FEATURE_2'),
         [1.0, 0.428571, 0.809524, 0.690476, 0.809524, 0.958333]),
        (JaroWinklerSimilarityTransformer('TEXT_FEATURE', 'TEXT_FEATURE_2'),
         [1.0, 0.428571, 0.809524, 0.690476, 0.866667, 0.970833]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)

    def test_symmetric(self, ):
        close(run(DamerauLevenshteinSimilarityTransformer('TEXT_FEATURE_2', 'TEXT_FEATURE')),
              [1.0, 0.142857, 0.714286, 0.5, 0.428571, 0.875])


class TestSeasonalExtras:
    """DayOfMonth / WeekOfYear / Quarter / IsWeekend (engine extensions)."""

    def test_extractions(self):
        import pyarrow as pa
        from datetime import datetime

        from auto_featurs_ray.engine.aggframe import AggFrame  # noqa: F401 (parity import)
        from auto_featurs_ray.transformers.datetime import (
            DayOfMonthTransformer,
            IsWeekendTransformer,
            QuarterTransformer,
            WeekOfYearTransformer,
        )
        # 2021-01-01 was a Friday; 2021-01-02 Saturday; 2021-01-03 Sunday
        t = pa.table({'d': pa.array([datetime(2021, 1, 1), datetime(2021, 1, 2),
                                     datetime(2021, 1, 3), datetime(2021, 7, 15)],
                                    pa.timestamp('us'))})
        assert DayOfMonthTransformer('d').apply(t).to_pylist() == [1, 2, 3, 15]
        assert WeekOfYearTransformer('d').apply(t).to_pylist() == [53, 53, 53, 28]
        assert QuarterTransformer('d').apply(t).to_pylist() == [1, 1, 1, 3]
        assert IsWeekendTransformer('d').apply(t).to_pylist() == [0, 1, 1, 0]
        assert IsWeekendTransformer('d').output_name == 'd_is_weekend'

    def test_is_weekend_rejects_angular(self):
        import pytest

        from auto_featurs_ray.transformers.datetime import IsWeekendTransformer
        with pytest.raises(ValueError, match='angular'):
            IsWeekendTransformer('d', angular=True)


class TestExpressionColumns:
    def test_apply_and_name(self):
        import pyarrow as pa

        from auto_featurs_ray.expressions import col
        from auto_featurs_ray.transformers.numeric import ExpressionTransformer
        t = pa.table({'a': [1.0, 2.0], 'b': [10.0, 20.0]})
        e = ExpressionTransformer((col('a') * col('b')).alias('ab'))
        assert e.output_name == 'ab'
        assert e.apply(t).to_pylist() == [10.0, 40.0]

    def test_non_expr_rejected_and_name_propagates(self):
        import pytest

        from auto_featurs_ray.expressions import col
        from auto_featurs_ray.transformers.numeric import ExpressionTransformer
        with pytest.raises(TypeError, match='Expr'):
            ExpressionTransformer('not an expr')
        # a bare combinator inherits the source column's name; alias overrides
        assert ExpressionTransformer(col('a') * 2.0).output_name == 'a'
        assert ExpressionTransformer((col('a') * 2.0).alias('a2')).output_name == 'a2'
