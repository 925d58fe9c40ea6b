"""Segmented-kernel conformance vs the reference's golden literals.

Golden values ported from
/root/reference/src/auto_featurs/transformers/tests/test_aggregating_transformers.py
and test_over_wrapper.py / test_rolling_wrapper.py (hard-coded expected lists).
These run the kernels directly on an AggFrame (no Ray session needed).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.engine.aggframe import AggFrame
from auto_featurs_ray.expressions import col
from auto_featurs_ray.transformers.aggregating import (
    ArgMaxTransformer,
    AutocorrTransformer,
    CorrelationTransformer,
    CovarianceTransformer,
    ArgMinTransformer,
    CountTransformer,
    DiffTransformer,
    EntityEntropyTransformer,
    EwmMeanTransformer,
    FirstValueTransformer,
    GeometricMeanTransformer,
    HarmonicMeanTransformer,
    LaggedTransformer,
    MaxTransformer,
    MeanTransformer,
    MedianTransformer,
    MinMaxScaler,
    MinTransformer,
    ModeTransformer,
    NumUniqueTransformer,
    PercentRankTransformer,
    RankTransformer,
    DenseRankTransformer,
    NtileTransformer,
    KurtosisTransformer,
    PctChangeTransformer,
    PointwiseMutualInformationTransformer,
    StreakTransformer,
    EqualWidthBinTransformer,
    QuantileBinTransformer,
    RegressionInterceptTransformer,
    RegressionSlopeTransformer,
    RobustScaler,
    RobustZscoreTransformer,
    ShareTransformer,
    StandardScaler,
    StdTransformer,
    SkewTransformer,
    SumTransformer,
    TargetEncodingTransformer,
    WeightedMeanTransformer,
    WinsorizeTransformer,
    ZscoreTransformer,
)
from auto_featurs_ray.transformers.base import CumulativeOptions as C
from auto_featurs_ray.transformers.over_wrapper import OverWrapper
from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper

from tests.fixtures import BASIC_TABLE

INF = float('inf')


def run(transformer, table=None):
    return list(_norm(v) for v in np.asarray(
        transformer.compute(AggFrame(table if table is not None else BASIC_TABLE), None), dtype=object))


def _norm(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    if isinstance(v, np.generic):
        return v.item()
    return v


def close(got, want, atol=1e-5):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        w = _norm(w)
        if w is None or g is None:
            assert g is None and w is None, (got, want)
        elif isinstance(w, float) and np.isinf(w):
            assert np.isinf(g), (got, want)
        elif isinstance(w, float):
            assert abs(g - w) <= atol, (got, want)
        else:
            assert g == w, (got, want)


GE2 = (col('NUMERIC_FEATURE') >= 2).alias('NUMERIC_FEATURE_GE_2')
BOOL = col('BOOL_FEATURE')


class TestCount:
    def test_names(self):
        assert CountTransformer().output_name == 'count'
        assert CountTransformer(C.EXCLUSIVE).output_name == 'exclusive_cum_count'
        assert CountTransformer(C.INCLUSIVE, GE2).output_name == 'inclusive_cum_count_where_NUMERIC_FEATURE_GE_2'

    @pytest.mark.parametrize(('t', 'want'), [
        (CountTransformer(), [6] * 6),
        (CountTransformer(C.EXCLUSIVE), [0, 1, 2, 3, 4, 5]),
        (CountTransformer(C.INCLUSIVE), [1, 2, 3, 4, 5, 6]),
        (CountTransformer(filtering_condition=GE2), [4] * 6),
        (CountTransformer(C.EXCLUSIVE, GE2), [0, 0, 0, 1, 2, 3]),
        (CountTransformer(C.INCLUSIVE, GE2), [0, 0, 1, 2, 3, 4]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)


class TestLagged:
    def test_golden(self):
        close(run(LaggedTransformer(CS.ordinal(name='CATEGORICAL_FEATURE'), 1)), [None, 'A', 'B', 'C', 'D', 'E'])
        close(run(LaggedTransformer(CS.numeric(name='NUMERIC_FEATURE'), 2)), [None, None, 0, 1, 2, 3])
        close(run(LaggedTransformer(CS.numeric(name='NUMERIC_FEATURE'), 2, fill_value=0)), [0, 0, 0, 1, 2, 3])
        close(run(LaggedTransformer(CS.numeric(name='NUMERIC_FEATURE'), -1)), [1, 2, 3, 4, 5, None])


class TestFirstValue:
    def test_golden(self):
        close(run(FirstValueTransformer(CS.ordinal(name='CATEGORICAL_FEATURE'))), ['A'] * 6)
        not_bool = (~col('BOOL_FEATURE')).alias('NOT_BOOL_FEATURE')
        t = FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE'), not_bool)
        assert t.output_name == 'NUMERIC_FEATURE_first_value_where_NOT_BOOL_FEATURE'
        close(run(t), [1] * 6)


class TestMode:
    def test_golden(self):
        close(run(ModeTransformer(CS.ordinal(name='GROUPING_FEATURE_NUM'))), ['ODD'] * 6)
        close(run(ModeTransformer(CS.boolean(name='BOOL_FEATURE'))), [True] * 6)
        close(run(ModeTransformer(CS.ordinal(name='GROUPING_FEATURE_NUM'), filtering_condition=BOOL)), ['EVEN'] * 6)
        close(run(ModeTransformer(CS.ordinal(name='GROUPING_FEATURE_NUM'), C.INCLUSIVE, BOOL)),
              ['ZERO', 'ZERO', 'EVEN', 'EVEN', 'EVEN', 'EVEN'])


class TestNumUnique:
    def test_golden(self):
        close(run(NumUniqueTransformer('GROUPING_FEATURE_NUM')), [3] * 6)
        close(run(NumUniqueTransformer('NUMERIC_FEATURE')), [6] * 6)
        close(run(NumUniqueTransformer('GROUPING_FEATURE_NUM', filtering_condition=BOOL)), [2] * 6)
        close(run(NumUniqueTransformer('GROUPING_FEATURE_NUM', C.INCLUSIVE, BOOL)), [1, 1, 2, 2, 2, 2])


ENTROPY_TABLE = pa.table({
    'ID': [1, 1, 1, 2, 2, 2, 3, 3, 3, None],
    'LOC': ['CZ', 'CZ', 'CZ', 'CZ', 'CZ', 'SK', 'CZ', 'SK', 'PL', None],
    'BOOL': [True, True, False, True, True, False, True, True, False, True],
})


class TestEntityEntropy:
    def test_golden(self):
        close(run(EntityEntropyTransformer('ID', 'LOC'), ENTROPY_TABLE),
              [0.0, 0.0, 0.0, 0.918296, 0.918296, 0.918296, 1.584963, 1.584963, 1.584963, 0.0])
        close(run(EntityEntropyTransformer('ID', 'LOC', C.INCLUSIVE), ENTROPY_TABLE),
              [0.0, 0.0, 0.0, 0.0, 0.0, 0.918296, 0.0, 1.0, 1.584963, 0.0])

    def test_names(self):
        assert EntityEntropyTransformer('ID', 'LOC').output_name == 'LOC_by_ID_entropy'
        assert EntityEntropyTransformer('ID', 'LOC', C.INCLUSIVE).output_name == 'LOC_by_ID_inclusive_cum_entropy'


class TestPMI:
    def test_golden(self):
        close(run(PointwiseMutualInformationTransformer('ID', 'LOC'), ENTROPY_TABLE),
              [0.736966, 0.736966, 0.736966, 0.152003, 0.152003, 0.736966, -0.847997, 0.736966, 1.736966, 3.321928])
        close(run(PointwiseMutualInformationTransformer('ID', 'LOC', C.INCLUSIVE), ENTROPY_TABLE),
              [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.222392, 1.0, 1.584963, 3.321928])
        close(run(PointwiseMutualInformationTransformer('ID', 'LOC', C.INCLUSIVE, col('BOOL')), ENTROPY_TABLE),
              [0.0, 0.0, 0.0, 0.0, 0.0, None, 0.0, 1.584963, None, 2.807355])


class TestArithmeticAggregations:
    @pytest.mark.parametrize(('t', 'want'), [
        (MinTransformer('NUMERIC_FEATURE'), [0] * 6),
        (MaxTransformer('NUMERIC_FEATURE'), [5] * 6),
        (SumTransformer('NUMERIC_FEATURE'), [15] * 6),
        (MedianTransformer('NUMERIC_FEATURE'), [2.5] * 6),
        (MeanTransformer('NUMERIC_FEATURE'), [2.5] * 6),
        (StdTransformer('NUMERIC_FEATURE'), [1.870829] * 6),
        (ZscoreTransformer('NUMERIC_FEATURE'),
         [-1.3363059905528512, -0.8017835943317106, -0.2672611981105702, 0.2672611981105702, 0.8017835943317106, 1.3363059905528512]),
        (SumTransformer('BOOL_FEATURE'), [3] * 6),
        (MedianTransformer('BOOL_FEATURE'), [0.5] * 6),
        (StdTransformer('BOOL_FEATURE'), [0.547723] * 6),
        (ZscoreTransformer('BOOL_FEATURE'), [0.912871, -0.912871, 0.912871, -0.912871, 0.912871, -0.912871]),
        (MinTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [None, 0, 0, 0, 0, 0]),
        (MaxTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [None, 0, 1, 2, 3, 4]),
        (SumTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [0, 0, 1, 3, 6, 10]),
        (MedianTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [None, 0.0, 0.5, 1.0, 1.5, 2.0]),
        (MeanTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [None, 0.0, 0.5, 1.0, 1.5, 2.0]),
        (StdTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [0.0, 0.0, 1.0, 1.802776, 2.692582, 3.674235]),
        (ZscoreTransformer('NUMERIC_FEATURE', C.EXCLUSIVE), [None, INF, 1.5, 1.1094, 0.928477, 0.816497]),
        (MinTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0] * 6),
        (MaxTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0, 1, 2, 3, 4, 5]),
        (SumTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0, 1, 3, 6, 10, 15]),
        (MedianTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]),
        (MeanTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0.0, 0.5, 1.0, 1.5, 2.0, 2.5]),
        (StdTransformer('NUMERIC_FEATURE', C.INCLUSIVE), [0.0, 0.5, 1.118034, 1.870829, 2.738613, 3.708099]),
        (ZscoreTransformer('NUMERIC_FEATURE', C.INCLUSIVE),
         [None, 1.0, 0.8944271819998318, 0.8017835943317106, 0.7302966866804473, 0.6741999067446689]),
        (MinTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [0] * 6),
        (MaxTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [4] * 6),
        (SumTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [6] * 6),
        (MedianTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [2.0] * 6),
        (MeanTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [2.0] * 6),
        (StdTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [2.0] * 6),
        (ZscoreTransformer('NUMERIC_FEATURE', filtering_condition=BOOL), [-1.0, -0.5, 0.0, 0.5, 1.0, 1.5]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)


class TestPercentRank:
    """PercentRankTransformer (engine extension, SQL percent_rank semantics)."""

    def test_ungrouped(self):
        close(run(PercentRankTransformer('NUMERIC_FEATURE')), [0.0, 0.2, 0.4, 0.6, 0.8, 1.0])

    def test_ties_min_rank(self):
        t = pa.table({'NUMERIC_FEATURE': [5.0, 1.0, 3.0, 3.0, 2.0]})
        close(run(PercentRankTransformer('NUMERIC_FEATURE'), t), [1.0, 0.0, 0.5, 0.5, 0.25])

    def test_filtered_rows_are_nan(self):
        close(run(PercentRankTransformer('NUMERIC_FEATURE', filtering_condition=BOOL)),
              [0.0, None, 0.5, None, 1.0, None])

    def test_grouped(self):
        close(run(OverWrapper(PercentRankTransformer('NUMERIC_FEATURE'), ['GROUPING_FEATURE_NUM'])),
              [0.0, 0.0, 0.0, 0.5, 1.0, 1.0])

    def test_single_value_group_is_zero(self):
        t = pa.table({'NUMERIC_FEATURE': [7.0]})
        close(run(PercentRankTransformer('NUMERIC_FEATURE'), t), [0.0])

    def test_rolling_ranks_window_anchor(self):
        close(run(RollingWrapper(PercentRankTransformer('NUMERIC_FEATURE'), DATE, '2d1h')),
              [0.0, 1.0, 1.0, 1.0, 1.0, 1.0])

    def test_cumulative_rejected(self):
        with pytest.raises(ValueError, match='percent_rank'):
            PercentRankTransformer('NUMERIC_FEATURE', C.INCLUSIVE)


class TestCorrelation:
    """CorrelationTransformer (engine extension, DuckDB corr() semantics)."""

    PAIR_TABLE = pa.table({'X': [1.0, 2.0, 4.0, 5.0, 7.0, 9.0],
                           'Y': [2.0, 5.0, 7.0, 4.0, 11.0, 13.0]})

    def test_ungrouped_matches_numpy(self):
        got = run(CorrelationTransformer('X', 'Y'), self.PAIR_TABLE)
        want = float(np.corrcoef([1, 2, 4, 5, 7, 9], [2, 5, 7, 4, 11, 13])[0, 1])
        close(got, [want] * 6)

    def test_perfect_anticorrelation(self):
        close(run(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2')), [-1.0] * 6)

    def test_grouped_with_degenerate_group(self):
        # ZERO group has a single row -> NaN; ODD/EVEN are exactly linear.
        close(run(OverWrapper(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'),
                              ['GROUPING_FEATURE_NUM'])),
              [None, -1.0, -1.0, -1.0, -1.0, -1.0])

    def test_cumulative(self):
        close(run(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2', C.INCLUSIVE)),
              [None, -1.0, -1.0, -1.0, -1.0, -1.0])
        close(run(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2', C.EXCLUSIVE)),
              [None, None, -1.0, -1.0, -1.0, -1.0])

    def test_cumulative_matches_pandas_expanding(self):
        x = pd.Series([1.0, 2.0, 4.0, 5.0, 7.0, 9.0])
        y = pd.Series([2.0, 5.0, 7.0, 4.0, 11.0, 13.0])
        want = [_norm(v) if not np.isnan(v) else None for v in x.expanding(2).corr(y)]
        close(run(CorrelationTransformer('X', 'Y', C.INCLUSIVE), self.PAIR_TABLE), want)

    def test_rolling(self):
        close(run(RollingWrapper(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2'),
                                 DATE, '2d1h')),
              [None, -1.0, -1.0, -1.0, -1.0, -1.0])

    def test_filtered_broadcast(self):
        close(run(CorrelationTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2',
                                         filtering_condition=BOOL)), [-1.0] * 6)

    def test_zero_variance_is_nan(self):
        t = pa.table({'X': [1.0, 1.0, 1.0], 'Y': [2.0, 5.0, 7.0]})
        close(run(CorrelationTransformer('X', 'Y'), t), [None] * 3)

    def test_nan_pairs_excluded(self):
        t = pa.table({'X': [1.0, 2.0, None, 4.0], 'Y': [2.0, None, 7.0, 8.0]})
        want = float(np.corrcoef([1, 4], [2, 8])[0, 1])  # rows 1/2 dropped pairwise
        close(run(CorrelationTransformer('X', 'Y'), t), [want] * 4)


class TestLinearRegression:
    """Regression slope/intercept (DuckDB regr_slope/regr_intercept semantics:
    first column is the dependent y, second the regressor x)."""

    T = pa.table({'Y': [2.0, 5.0, 7.0], 'X': [1.0, 2.0, 4.0]})

    def test_slope_intercept_match_polyfit(self):
        slope, intercept = np.polyfit([1, 2, 4], [2, 5, 7], 1)
        close(run(RegressionSlopeTransformer('Y', 'X'), self.T), [float(slope)] * 3)
        close(run(RegressionInterceptTransformer('Y', 'X'), self.T), [float(intercept)] * 3)

    def test_constant_regressor_is_nan(self):
        t = pa.table({'Y': [2.0, 5.0, 7.0], 'X': [1.0, 1.0, 1.0]})
        close(run(RegressionSlopeTransformer('Y', 'X'), t), [None] * 3)
        close(run(RegressionInterceptTransformer('Y', 'X'), t), [None] * 3)

    def test_cumulative_rolling(self):
        # y = NUMERIC_FEATURE_2 = -x exactly: slope -1, intercept 0
        close(run(RegressionSlopeTransformer('NUMERIC_FEATURE_2', 'NUMERIC_FEATURE', C.INCLUSIVE)),
              [None, -1.0, -1.0, -1.0, -1.0, -1.0])
        close(run(RollingWrapper(RegressionInterceptTransformer('NUMERIC_FEATURE_2', 'NUMERIC_FEATURE'),
                                 DATE, '2d1h')),
              [None, 0.0, 0.0, 0.0, 0.0, 0.0])


class TestShapeMoments:
    """Skew/Kurtosis (bias-corrected G1/G2 = pandas .skew()/.kurt() =
    DuckDB skewness()/kurtosis())."""

    X = pd.Series([2.0, 5.0, 7.0, 11.0, 13.0, 13.5])
    T = pa.table({'X': X.tolist()})

    def test_none_matches_pandas(self):
        close(run(SkewTransformer('X'), self.T), [self.X.skew()] * 6)
        close(run(KurtosisTransformer('X'), self.T), [self.X.kurt()] * 6)

    def test_cumulative(self):
        close(run(SkewTransformer('X', C.INCLUSIVE), self.T),
              self.X.expanding(1).skew().tolist())
        close(run(KurtosisTransformer('X', C.EXCLUSIVE), self.T),
              [None] + self.X.expanding(1).kurt().tolist()[:-1])

    def test_rolling(self):
        close(run(RollingWrapper(SkewTransformer('NUMERIC_FEATURE'), DATE, '2d1h')),
              pd.Series([0.0, 1, 2, 3, 4, 5]).rolling(3, min_periods=1).skew().tolist())

    def test_degenerate_is_nan(self):
        t = pa.table({'X': [3.0, 3.0, 3.0, 3.0]})
        close(run(SkewTransformer('X'), t), [None] * 4)
        close(run(KurtosisTransformer('X'), t), [None] * 4)

    def test_global_two_pass_matches_compute(self):
        t = SkewTransformer('X')
        state = t.global_partial(self.T.slice(0, 3))
        state = t.global_combine(state, t.global_partial(self.T.slice(3)))
        close(list(t.global_finalize(state, self.T)), [self.X.skew()] * 6)
        k = KurtosisTransformer('X')
        state = k.global_combine(k.global_partial(self.T.slice(0, 2)), k.global_partial(self.T.slice(2)))
        close(list(k.global_finalize(state, self.T)), [self.X.kurt()] * 6)


class TestEwmMean:
    """EwmMeanTransformer (pandas ewm(adjust=True, ignore_na=False) semantics)."""

    def test_inclusive_matches_pandas(self):
        want = pd.Series([0.0, 1, 2, 3, 4, 5]).ewm(alpha=0.5, adjust=True).mean().tolist()
        close(run(EwmMeanTransformer('NUMERIC_FEATURE', 0.5)), want)

    def test_exclusive_is_shifted(self):
        want = [None] + pd.Series([0.0, 1, 2, 3, 4, 5]).ewm(alpha=0.5, adjust=True).mean().tolist()[:-1]
        close(run(EwmMeanTransformer('NUMERIC_FEATURE', 0.5, C.EXCLUSIVE)), want)

    def test_none_broadcasts_group_final(self):
        final = pd.Series([0.0, 1, 2, 3, 4, 5]).ewm(alpha=0.5, adjust=True).mean().iloc[-1]
        close(run(EwmMeanTransformer('NUMERIC_FEATURE', 0.5, C.NONE)), [final] * 6)

    def test_grouped(self):
        # ODD group rows (1,3,5) values 1,3,5; EVEN rows (2,4) values 2,4
        odd = pd.Series([1.0, 3.0, 5.0]).ewm(alpha=0.5, adjust=True).mean().tolist()
        even = pd.Series([2.0, 4.0]).ewm(alpha=0.5, adjust=True).mean().tolist()
        close(run(OverWrapper(EwmMeanTransformer('NUMERIC_FEATURE', 0.5), ['GROUPING_FEATURE_NUM'])),
              [0.0, odd[0], even[0], odd[1], even[1], odd[2]])

    def test_nan_keeps_positional_weights(self):
        t = pa.table({'X': [1.0, None, 3.0]})
        want = pd.Series([1.0, np.nan, 3.0]).ewm(alpha=0.5, adjust=True, ignore_na=False).mean().tolist()
        close(run(EwmMeanTransformer('X', 0.5), t), want)

    def test_alpha_validated(self):
        with pytest.raises(ValueError, match='alpha'):
            EwmMeanTransformer('NUMERIC_FEATURE', 0.0)


class TestArgExtremes:
    def test_argmin(self):
        args = dict(value_column='NUMERIC_FEATURE_2', arg_column=CS.ordinal(name='CATEGORICAL_FEATURE'))
        close(run(ArgMinTransformer(**args, filtering_condition=BOOL)), ['E'] * 6)
        close(run(ArgMinTransformer(**args, cumulative=C.EXCLUSIVE, filtering_condition=BOOL)),
              [None, 'A', 'A', 'C', 'C', 'E'])
        close(run(ArgMinTransformer(**args, cumulative=C.INCLUSIVE, filtering_condition=BOOL)),
              ['A', 'A', 'C', 'C', 'E', 'E'])

    def test_argmax(self):
        args = dict(value_column='NUMERIC_FEATURE', arg_column=CS.ordinal(name='CATEGORICAL_FEATURE'))
        close(run(ArgMaxTransformer(**args, filtering_condition=BOOL)), ['E'] * 6)
        close(run(ArgMaxTransformer(**args, cumulative=C.EXCLUSIVE, filtering_condition=BOOL)),
              [None, 'A', 'A', 'C', 'C', 'E'])
        close(run(ArgMaxTransformer(**args, cumulative=C.INCLUSIVE, filtering_condition=BOOL)),
              ['A', 'A', 'C', 'C', 'E', 'E'])

    def test_names(self):
        t = ArgMinTransformer('V', CS.ordinal(name='A'), C.EXCLUSIVE, BOOL)
        assert t.output_name == 'exclusive_cum_argmin_of_V_by_A_where_BOOL_FEATURE'


class TestScalers:
    def test_golden(self):
        close(run(StandardScaler('NUMERIC_FEATURE')), [-1.336306, -0.801784, -0.267261, 0.267261, 0.801784, 1.336306])
        close(run(MinMaxScaler('NUMERIC_FEATURE')), [0.0, 0.2, 0.4, 0.6, 0.8, 1.0])


class TestOverWrapper:
    NUM = ['GROUPING_FEATURE_NUM']
    NUM_CAT = ['GROUPING_FEATURE_NUM', 'GROUPING_FEATURE_CAT_2']

    @pytest.mark.parametrize(('t', 'want'), [
        (OverWrapper(CountTransformer(), NUM), [1, 3, 2, 3, 2, 3]),
        (OverWrapper(CountTransformer(), NUM_CAT), [1, 2, 2, 1, 2, 2]),
        (OverWrapper(CountTransformer(C.INCLUSIVE), NUM), [1, 1, 1, 2, 2, 3]),
        (OverWrapper(CountTransformer(C.INCLUSIVE), NUM_CAT), [1, 1, 1, 1, 2, 2]),
        (OverWrapper(LaggedTransformer(CS.numeric(name='NUMERIC_FEATURE'), 1), NUM), [None, None, None, 1, 2, 3]),
        (OverWrapper(LaggedTransformer(CS.numeric(name='NUMERIC_FEATURE'), 1), NUM_CAT), [None, None, None, None, 2, 1]),
        (OverWrapper(FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE')), NUM), [0, 1, 2, 1, 2, 1]),
        (OverWrapper(FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE')), NUM_CAT), [0, 1, 2, 3, 2, 1]),
        (OverWrapper(ModeTransformer(CS.boolean(name='BOOL_FEATURE')), NUM), [True, False, True, False, True, False]),
        (OverWrapper(NumUniqueTransformer(CS.ordinal(name='GROUPING_FEATURE_NUM')), ['BOOL_FEATURE']), [2, 1, 2, 1, 2, 1]),
        (OverWrapper(SumTransformer('NUMERIC_FEATURE'), NUM), [0, 9, 6, 9, 6, 9]),
        (OverWrapper(SumTransformer('NUMERIC_FEATURE'), NUM_CAT), [0, 6, 6, 3, 6, 6]),
        (OverWrapper(MeanTransformer('NUMERIC_FEATURE'), NUM), [0.0, 3.0, 3.0, 3.0, 3.0, 3.0]),
        (OverWrapper(StdTransformer('NUMERIC_FEATURE'), NUM), [None, 2.0, 1.414214, 2.0, 1.414214, 2.0]),
        (OverWrapper(StdTransformer('NUMERIC_FEATURE'), NUM_CAT), [None, 2.828427, 1.414214, None, 1.414214, 2.828427]),
        (OverWrapper(ZscoreTransformer('NUMERIC_FEATURE'), NUM), [None, -1.0, -0.707107, 0.0, 0.707107, 1.0]),
        (OverWrapper(SumTransformer('NUMERIC_FEATURE', C.INCLUSIVE), NUM), [0, 1, 2, 4, 6, 9]),
        (OverWrapper(MeanTransformer('NUMERIC_FEATURE', C.INCLUSIVE), NUM), [0.0, 1.0, 2.0, 2.0, 3.0, 3.0]),
        (OverWrapper(StdTransformer('NUMERIC_FEATURE', C.INCLUSIVE), NUM), [0.0, 0.0, 0.0, 1.0, 1.0, 2.236068]),
        (OverWrapper(ZscoreTransformer('NUMERIC_FEATURE', C.INCLUSIVE), NUM), [None, None, None, 1.0, 1.0, 0.894427]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)

    def test_name(self):
        t = OverWrapper(CountTransformer(), self.NUM_CAT)
        assert t.output_name == 'count_over_GROUPING_FEATURE_NUM_and_GROUPING_FEATURE_CAT_2'


DATE = CS.datetime(name='DATE_FEATURE')


class TestRollingWrapper:
    @pytest.mark.parametrize(('t', 'want'), [
        (RollingWrapper(CountTransformer(), DATE, '2d1h'), [1, 2, 3, 3, 3, 3]),
        (RollingWrapper(FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE')), DATE, '2d1h'), [0, 0, 0, 1, 2, 3]),
        (RollingWrapper(ModeTransformer(CS.ordinal(name='GROUPING_FEATURE_CAT_2')), DATE, '2d1h'),
         ['CONSONANT', 'VOWEL', 'CONSONANT', 'CONSONANT', 'CONSONANT', 'CONSONANT']),
        (RollingWrapper(NumUniqueTransformer(CS.numeric(name='GROUPING_FEATURE_NUM')), DATE, '2d1h'), [1, 2, 3, 2, 2, 2]),
        (RollingWrapper(SumTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [0, 1, 3, 6, 9, 12]),
        (RollingWrapper(MeanTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [0.0, 0.5, 1.0, 2.0, 3.0, 4.0]),
        (RollingWrapper(StdTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [None, 0.707107, 1.0, 1.0, 1.0, 1.0]),
        (RollingWrapper(ZscoreTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [None, 0.707107, 1.0, 1.0, 1.0, 1.0]),
        (RollingWrapper(MinTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [0, 0, 0, 1, 2, 3]),
        (RollingWrapper(MaxTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [0, 1, 2, 3, 4, 5]),
        (RollingWrapper(MedianTransformer('NUMERIC_FEATURE'), DATE, '2d1h'), [0.0, 0.5, 1.0, 2.0, 3.0, 4.0]),
    ])
    def test_golden(self, t, want):
        close(run(t), want)

    def test_rolling_over_composition(self):
        # Rolling(Over(first_value)) — test_rolling_wrapper.py:93-104
        t = RollingWrapper(OverWrapper(FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE')),
                                       ['GROUPING_FEATURE_NUM']), DATE, '2d1h')
        close(run(t), [0, 1, 2, 1, 2, 3])
        assert t.output_name == 'NUMERIC_FEATURE_first_value_over_GROUPING_FEATURE_NUM_in_the_last_2d1h'

    def test_over_rolling_composition(self):
        # Over(Rolling(first_value)) — test_over_wrapper.py:214-225; the runtime
        # sorts the partition by (keys, order) before computing.
        t = OverWrapper(RollingWrapper(FirstValueTransformer(CS.numeric(name='NUMERIC_FEATURE')), DATE, '2d1h'),
                        ['GROUPING_FEATURE_NUM'])
        idx = pc.sort_indices(BASIC_TABLE, sort_keys=[('GROUPING_FEATURE_NUM', 'ascending'),
                                                      ('DATE_FEATURE', 'ascending')])
        sorted_table = BASIC_TABLE.take(idx)
        res = np.asarray(t.compute(AggFrame(sorted_table), None), dtype=object)
        out = np.empty(6, dtype=object)
        out[idx.to_numpy()] = res
        close([_norm(v) for v in out], [0, 1, 2, 1, 2, 3])
        assert t.output_name == 'NUMERIC_FEATURE_first_value_in_the_last_2d1h_over_GROUPING_FEATURE_NUM'


class TestTargetEncoding:
    """TargetEncodingTransformer (engine extension): smoothed / leave-one-out
    encodings with a global-mean prior read from the ``{col}_mean`` column."""

    # X grouped by G: a -> [1, 3], b -> [5]; global mean = 3.0
    T = pa.table({'X': [1.0, 3.0, 5.0], 'G': ['a', 'a', 'b'], 'X_mean': [3.0] * 3})
    CODES = np.array([0, 0, 1])

    def _run(self, t, codes=None):
        return [_norm(v) for v in np.asarray(
            t.compute(AggFrame(self.T), self.CODES if codes is None else codes), dtype=object)]

    def test_unsmoothed_equals_group_mean(self):
        close(self._run(TargetEncodingTransformer('X')), [2.0, 2.0, 5.0])

    def test_smoothed_shrinks_toward_prior(self):
        # (S_g + m*prior)/(n_g + m), m=2, prior=3: a=(4+6)/4=2.5, b=(5+6)/3=11/3
        close(self._run(TargetEncodingTransformer('X', smoothing=2.0)), [2.5, 2.5, 11 / 3])

    def test_leave_one_out(self):
        # a rows: (4-1)/1=3, (4-3)/1=1; b singleton: 0/0 -> NaN
        close(self._run(TargetEncodingTransformer('X', leave_one_out=True)), [3.0, 1.0, None])

    def test_loo_smoothed_singleton_falls_back_to_prior(self):
        # b: (5-5+2*3)/(0+2) = 3.0 (pure prior)
        close(self._run(TargetEncodingTransformer('X', smoothing=2.0, leave_one_out=True)),
              [(3 + 6) / 3, (1 + 6) / 3, 3.0])

    def test_exclusive_is_leakage_free(self):
        # a: first row NaN (m=0), second (1)/(1)=1; b first row NaN
        close(self._run(TargetEncodingTransformer('X', cumulative=C.EXCLUSIVE)),
              [None, 1.0, None])

    def test_exclusive_smoothed_first_row_is_prior(self):
        close(self._run(TargetEncodingTransformer('X', smoothing=2.0, cumulative=C.EXCLUSIVE)),
              [3.0, (1 + 6) / 3, 3.0])

    def test_windowed_with_loo(self):
        t = TargetEncodingTransformer('X', leave_one_out=True)
        lo = np.array([0, 0, 2])
        hi = np.array([1, 2, 3])
        got = t.compute_windowed(AggFrame(self.T), lo, hi)
        close([_norm(v) for v in got], [None, 1.0, None])

    def test_null_target_rows_do_not_contribute(self):
        t = pa.table({'X': [1.0, None, 3.0], 'X_mean': [2.0] * 3})
        close([_norm(v) for v in np.asarray(
            TargetEncodingTransformer('X').compute(AggFrame(t), None), dtype=object)],
            [2.0, 2.0, 2.0])

    def test_validation(self):
        with pytest.raises(ValueError, match='smoothing'):
            TargetEncodingTransformer('X', smoothing=-1.0)
        with pytest.raises(ValueError, match='leave_one_out'):
            TargetEncodingTransformer('X', leave_one_out=True, cumulative=C.EXCLUSIVE)

    def test_missing_prior_column_raises(self):
        t = pa.table({'X': [1.0, 2.0]})
        with pytest.raises(KeyError, match='with_target_encoding'):
            TargetEncodingTransformer('X', smoothing=1.0).compute(AggFrame(t), None)

    def test_output_names(self):
        assert TargetEncodingTransformer('X').output_name == 'X_target_enc'
        assert TargetEncodingTransformer('X', smoothing=0.5).output_name == 'X_target_enc_s0p5'
        assert (TargetEncodingTransformer('X', smoothing=10, leave_one_out=True).output_name
                == 'X_target_enc_loo_s10')
        assert (TargetEncodingTransformer('X', smoothing=10, cumulative=C.EXCLUSIVE).output_name
                == 'X_exclusive_cum_target_enc_s10')


class TestRobustScalerAndBinning:
    """RobustScaler / QuantileBin / EqualWidthBin (engine extensions)."""

    X = pd.Series([1.0, 2.0, 3.0, 4.0, 5.0, 100.0])
    T = pa.table({'X': X.tolist()})

    def test_robust_scaler_global_compute(self):
        med, q1, q3 = self.X.quantile(.5), self.X.quantile(.25), self.X.quantile(.75)
        want = ((self.X - med) / (q3 - q1)).tolist()
        close([_norm(v) for v in np.asarray(
            RobustScaler('X').compute(AggFrame(self.T), None), dtype=object)], want)

    def test_robust_scaler_two_pass_matches_compute(self):
        t = RobustScaler('X')
        state = t.global_combine(t.global_partial(self.T.slice(0, 2)),
                                 t.global_partial(self.T.slice(2)))
        direct = np.asarray(t.compute(AggFrame(self.T), None), dtype=np.float64)
        np.testing.assert_allclose(np.asarray(t.global_finalize(state, self.T)), direct)

    def test_robust_scaler_zero_iqr_is_nan(self):
        t = pa.table({'X': [2.0, 2.0, 2.0]})
        got = RobustScaler('X').compute(AggFrame(t), None)
        assert all(np.isnan(np.asarray(got, dtype=np.float64)))

    def test_quantile_bins_are_equal_frequency(self):
        got = QuantileBinTransformer('X', 4).compute(AggFrame(self.T), None)
        edges = np.round([self.X.quantile(q) for q in (.25, .5, .75)], 6)
        want = (self.X.to_numpy()[:, None] > edges[None, :]).sum(1).astype(float)
        np.testing.assert_array_equal(np.asarray(got, dtype=np.float64), want)

    def test_equal_width_bins(self):
        got = EqualWidthBinTransformer('X', 4).compute(AggFrame(self.T), None)
        # span 1..100: edges 25.75, 50.5, 75.25 -> first five rows bin 0, last bin 3
        np.testing.assert_array_equal(np.asarray(got, dtype=np.float64),
                                      [0, 0, 0, 0, 0, 3])

    def test_bins_two_pass_matches_compute(self):
        for cls in (QuantileBinTransformer, EqualWidthBinTransformer):
            t = cls('X', 4)
            state = t.global_combine(t.global_partial(self.T.slice(0, 3)),
                                     t.global_partial(self.T.slice(3)))
            direct = np.asarray(t.compute(AggFrame(self.T), None), dtype=np.float64)
            np.testing.assert_array_equal(np.asarray(t.global_finalize(state, self.T)), direct)

    def test_grouped_bins(self):
        t = pa.table({'X': [1.0, 10.0, 2.0, 20.0]})
        codes = np.array([0, 1, 0, 1])
        got = QuantileBinTransformer('X', 2).compute(AggFrame(t), codes)
        # per-group median edges: g0 -> 1.5, g1 -> 15
        np.testing.assert_array_equal(np.asarray(got, dtype=np.float64), [0, 0, 1, 1])

    def test_nan_rows_stay_nan(self):
        t = pa.table({'X': [1.0, None, 3.0]})
        got = np.asarray(QuantileBinTransformer('X', 2).compute(AggFrame(t), None),
                         dtype=np.float64)
        assert np.isnan(got[1]) and not np.isnan(got[0])

    def test_validation_and_names(self):
        with pytest.raises(ValueError, match='num_bins'):
            QuantileBinTransformer('X', 1)
        assert QuantileBinTransformer('X', 4).output_name == 'X_qbin_4'
        assert EqualWidthBinTransformer('X', 8).output_name == 'X_wbin_8'
        assert RobustScaler('X').output_name == 'X_robust_scaled'


class TestCovarianceAndAutocorr:
    """CovarianceTransformer (covar_samp) / AutocorrTransformer."""

    def test_covariance_matches_pandas(self):
        x = pd.Series([0.0, 1, 2, 3, 4, 5])
        y = pd.Series([0.0, -1, -2, -3, -4, -5])
        t = CovarianceTransformer('NUMERIC_FEATURE', 'NUMERIC_FEATURE_2')
        close(run(t), [x.cov(y)] * 6)
        assert t.output_name == 'NUMERIC_FEATURE_NUMERIC_FEATURE_2_covar'

    def test_covariance_degenerate_is_nan(self):
        t = pa.table({'A': [1.0], 'B': [2.0]})
        got = CovarianceTransformer('A', 'B').compute(AggFrame(t), None)
        assert np.isnan(np.asarray(got, dtype=np.float64)).all()

    def test_autocorr_lag1_matches_pandas(self):
        rng = np.random.default_rng(7)
        x = pd.Series(rng.normal(size=50))
        t = pa.table({'X': x.tolist()})
        got = AutocorrTransformer('X', 1).compute(AggFrame(t), None)
        want = x.autocorr(lag=1)
        np.testing.assert_allclose(np.asarray(got, dtype=np.float64), want, rtol=1e-10)

    def test_autocorr_grouped_respects_boundaries(self):
        # groups [1,2,3] and [10,30]: lag pairs never cross groups
        t = pa.table({'X': [1.0, 2.0, 3.0, 10.0, 30.0]})
        codes = np.array([0, 0, 0, 1, 1])
        got = np.asarray(AutocorrTransformer('X', 1).compute(AggFrame(t), codes),
                         dtype=np.float64)
        np.testing.assert_allclose(got[:3], 1.0)        # perfectly linear
        assert np.isnan(got[3:]).all()                  # single pair, zero variance
        name = AutocorrTransformer('X', 2).output_name
        assert name == 'X_autocorr_2'

    def test_autocorr_validation(self):
        with pytest.raises(ValueError, match='lag'):
            AutocorrTransformer('X', 0)
        with pytest.raises(ValueError, match='NONE'):
            AutocorrTransformer('X', 1, cumulative=C.INCLUSIVE)


class TestRankFamily:
    """Rank / DenseRank / Ntile (engine extensions)."""

    T = pa.table({'X': [10.0, 20.0, 20.0, 30.0, 5.0]})
    CODES = np.array([0, 0, 0, 0, 1])

    def _run(self, t):
        return [_norm(v) for v in np.asarray(
            t.compute(AggFrame(self.T), self.CODES), dtype=object)]

    def test_rank_min_with_gaps(self):
        close(self._run(RankTransformer('X')), [1.0, 2.0, 2.0, 4.0, 1.0])

    def test_dense_rank_no_gaps(self):
        close(self._run(DenseRankTransformer('X')), [1.0, 2.0, 2.0, 3.0, 1.0])

    def test_ntile_even_and_uneven(self):
        # group0 n=4, k=2 -> buckets 1,1,2,2 (ties 20,20 straddle? min-rank 2
        # maps both to bucket 1's [0,2) ? p=1 < cut... n=4,k=2: base=2,big=0,
        # cut=0 -> p>=cut: bucket=floor(p/2): p=0,1->1; p=1(tie shares
        # min-rank 2 => p=1)->1; p=3->2
        close(self._run(NtileTransformer('X', 2)), [1.0, 1.0, 1.0, 2.0, 1.0])

    def test_ntile_more_buckets_than_rows(self):
        t = pa.table({'X': [3.0, 1.0, 2.0]})
        got = [_norm(v) for v in np.asarray(
            NtileTransformer('X', 5).compute(AggFrame(t), None), dtype=object)]
        close(got, [3.0, 1.0, 2.0])

    def test_nan_rows_rank_nan(self):
        t = pa.table({'X': [1.0, None, 2.0]})
        got = [_norm(v) for v in np.asarray(
            RankTransformer('X').compute(AggFrame(t), None), dtype=object)]
        close(got, [1.0, None, 2.0])

    def test_validation_and_names(self):
        with pytest.raises(ValueError, match='NONE'):
            RankTransformer('X', cumulative=C.INCLUSIVE)
        with pytest.raises(ValueError, match='num_buckets'):
            NtileTransformer('X', 0)
        assert RankTransformer('X').output_name == 'X_rank'
        assert DenseRankTransformer('X').output_name == 'X_dense_rank'
        assert NtileTransformer('X', 4).output_name == 'X_ntile_4'


class TestWinsorize:
    """WinsorizeTransformer (engine extension): quantile clipping."""

    X = pd.Series([1.0, 2.0, 3.0, 4.0, 100.0])
    T = pa.table({'X': X.tolist()})

    def test_clips_to_group_quantiles(self):
        lo, hi = self.X.quantile(.05), self.X.quantile(.95)
        got = WinsorizeTransformer('X', 0.05, 0.95).compute(AggFrame(self.T), None)
        np.testing.assert_allclose(np.asarray(got, dtype=np.float64),
                                   np.clip(self.X.to_numpy(), lo, hi))

    def test_two_pass_matches_compute(self):
        t = WinsorizeTransformer('X', 0.1, 0.9)
        state = t.global_combine(t.global_partial(self.T.slice(0, 2)),
                                 t.global_partial(self.T.slice(2)))
        direct = np.asarray(t.compute(AggFrame(self.T), None), dtype=np.float64)
        np.testing.assert_allclose(np.asarray(t.global_finalize(state, self.T)), direct)

    def test_nan_stays_nan(self):
        t = pa.table({'X': [1.0, None, 3.0]})
        got = np.asarray(WinsorizeTransformer('X').compute(AggFrame(t), None),
                         dtype=np.float64)
        assert np.isnan(got[1]) and not np.isnan(got[0])

    def test_validation_and_name(self):
        with pytest.raises(ValueError, match='lower_q'):
            WinsorizeTransformer('X', 0.9, 0.1)
        assert WinsorizeTransformer('X', 0.05, 0.95).output_name == 'X_winsor_5_95'
        assert WinsorizeTransformer('X', 0.025, 0.975).output_name == 'X_winsor_2p5_97p5'


class TestDiffPctStreak:
    """Diff / PctChange / Streak (engine extensions)."""

    def test_diff_and_pct_change(self):
        t = pa.table({'X': [1.0, 2.0, 4.0, 3.0]})
        codes = np.array([0, 0, 0, 1])
        d = np.asarray(DiffTransformer('X', 1).compute(AggFrame(t), codes), dtype=np.float64)
        close([_norm(v) for v in d.astype(object)], [None, 1.0, 2.0, None])
        p = np.asarray(PctChangeTransformer('X', 1).compute(AggFrame(t), codes),
                       dtype=np.float64)
        close([_norm(v) for v in p.astype(object)], [None, 1.0, 1.0, None])

    def test_pct_change_zero_denominator_is_nan(self):
        t = pa.table({'X': [0.0, 5.0]})
        p = np.asarray(PctChangeTransformer('X', 1).compute(AggFrame(t), None),
                       dtype=np.float64)
        assert np.isnan(p).all()

    def test_streak_resets_on_false_and_null(self):
        t = pa.table({'B': [True, True, False, True, None, True]})
        got = StreakTransformer(col('B')).compute(AggFrame(t), None)
        assert list(got) == [1, 2, 0, 1, 0, 1]

    def test_streak_grouped(self):
        t = pa.table({'B': [True, True, True, True]})
        codes = np.array([0, 0, 1, 1])
        got = StreakTransformer(col('B')).compute(AggFrame(t), codes)
        assert list(got) == [1, 2, 1, 2]

    def test_validation_and_names(self):
        with pytest.raises(ValueError, match='non-zero'):
            DiffTransformer('X', 0)
        assert DiffTransformer('X', 2).output_name == 'X_diff_2'
        assert PctChangeTransformer('X', 1).output_name == 'X_pct_change_1'


class TestWeightedMeanAndShare:
    """WeightedMean / Share (engine extensions)."""

    T = pa.table({'X': [10.0, 20.0, 30.0], 'W': [1.0, 3.0, 0.0]})

    def test_weighted_mean(self):
        got = WeightedMeanTransformer('X', 'W').compute(AggFrame(self.T), None)
        close([_norm(v) for v in np.asarray(got, dtype=object)], [70 / 4] * 3)
        assert WeightedMeanTransformer('X', 'W').output_name == 'X_W_wmean'

    def test_weighted_mean_zero_weight_sum_is_nan(self):
        t = pa.table({'X': [1.0], 'W': [0.0]})
        got = np.asarray(WeightedMeanTransformer('X', 'W').compute(AggFrame(t), None),
                         dtype=np.float64)
        assert np.isnan(got).all()

    def test_share_modes(self):
        t = pa.table({'X': [1.0, 3.0, 4.0]})
        got = ShareTransformer('X').compute(AggFrame(t), None)
        close([_norm(v) for v in np.asarray(got, dtype=object)], [1 / 8, 3 / 8, 4 / 8])
        ex = ShareTransformer('X', C.EXCLUSIVE).compute(AggFrame(t), None)
        close([_norm(v) for v in np.asarray(ex, dtype=object)], [None, 3.0, 1.0])
        inc = ShareTransformer('X', C.INCLUSIVE).compute(AggFrame(t), None)
        close([_norm(v) for v in np.asarray(inc, dtype=object)], [1.0, 0.75, 0.5])

    def test_share_windowed(self):
        t = pa.table({'X': [2.0, 2.0, 6.0]})
        lo = np.array([0, 0, 1])
        hi = np.array([1, 2, 3])
        got = ShareTransformer('X').compute_windowed(AggFrame(t), lo, hi)
        close([_norm(v) for v in np.asarray(got, dtype=object)], [1.0, 0.5, 0.75])


class TestGeoHarmonicMeans:
    """GeometricMean / HarmonicMean (positive-value aggregates)."""

    T = pa.table({'X': [1.0, 4.0, 16.0, -5.0, None]})

    def _run(self, t):
        return [_norm(v) for v in np.asarray(t.compute(AggFrame(self.T), None), dtype=object)]

    def test_geometric(self):
        want = float(np.exp(np.mean(np.log([1.0, 4.0, 16.0]))))
        close(self._run(GeometricMeanTransformer('X')), [want] * 5)

    def test_harmonic(self):
        want = 3.0 / (1.0 + 0.25 + 1 / 16)
        close(self._run(HarmonicMeanTransformer('X')), [want] * 5)

    def test_cumulative_exclusive(self):
        got = self._run(GeometricMeanTransformer('X', C.EXCLUSIVE))
        assert got[0] is None and abs(got[1] - 1.0) < 1e-9 and abs(got[2] - 2.0) < 1e-9
        # non-positive row keeps the previous prefix value
        assert abs(got[3] - got[4 - 1]) < 1e-9 if got[3] is not None else True

    def test_windowed(self):
        t = GeometricMeanTransformer('X')
        lo = np.array([0, 0, 2, 3, 3])
        hi = np.array([1, 2, 3, 4, 5])
        got = t.compute_windowed(AggFrame(self.T), lo, hi)
        out = [_norm(v) for v in np.asarray(got, dtype=object)]
        assert abs(out[0] - 1.0) < 1e-9 and abs(out[1] - 2.0) < 1e-9
        assert abs(out[2] - 16.0) < 1e-9 and out[3] is None and out[4] is None

    def test_two_pass_matches_compute(self):
        for cls in (GeometricMeanTransformer, HarmonicMeanTransformer):
            t = cls('X')
            state = t.global_combine(t.global_partial(self.T.slice(0, 2)),
                                     t.global_partial(self.T.slice(2)))
            direct = np.asarray(t.compute(AggFrame(self.T), None), dtype=np.float64)
            np.testing.assert_allclose(np.asarray(t.global_finalize(state, self.T)),
                                       direct, rtol=1e-12)


class TestRobustZscore:
    def test_outlier_immune(self):
        t = pa.table({'X': [1.0, 2.0, 3.0, 100.0]})
        got = np.asarray(RobustZscoreTransformer('X').compute(AggFrame(t), None),
                         dtype=np.float64)
        x = np.array([1.0, 2.0, 3.0, 100.0])
        med = np.median(x)
        mad = np.median(np.abs(x - med))
        np.testing.assert_allclose(got, (x - med) / mad)

    def test_zero_mad_is_nan(self):
        t = pa.table({'X': [5.0, 5.0, 5.0, 9.0]})
        got = np.asarray(RobustZscoreTransformer('X').compute(AggFrame(t), None),
                         dtype=np.float64)
        assert np.isnan(got).all()   # MAD = 0 (majority at the median)

    def test_grouped_and_validation(self):
        t = pa.table({'X': [1.0, 3.0, 10.0, 30.0]})
        codes = np.array([0, 0, 1, 1])
        got = np.asarray(RobustZscoreTransformer('X').compute(AggFrame(t), codes),
                         dtype=np.float64)
        np.testing.assert_allclose(got, [-1.0, 1.0, -1.0, 1.0])
        with pytest.raises(ValueError, match='NONE'):
            RobustZscoreTransformer('X', cumulative=C.INCLUSIVE)
        assert RobustZscoreTransformer('X').output_name == 'X_robust_zscore'


class TestCumeDist:
    def test_grouped_matches_sql_semantics(self):
        from auto_featurs_ray.engine.aggframe import AggFrame
        from auto_featurs_ray.transformers.aggregating import CumeDistTransformer

        vals = np.array([1.0, 2.0, 2.0, 5.0, np.nan, 3.0])
        codes = np.array([0, 0, 0, 0, 0, 1])
        frame = AggFrame(pa.table({'v': pa.array(vals, from_pandas=True)}))
        out = np.asarray(CumeDistTransformer('v').compute(frame, codes), dtype=np.float64)
        # group 0 valid values [1,2,2,5]: cume_dist = [.25, .75, .75, 1.0], NaN row NaN
        np.testing.assert_allclose(out[:5], [0.25, 0.75, 0.75, 1.0, np.nan],
                                   equal_nan=True)
        assert out[5] == 1.0  # singleton group

    def test_rolling_anchor_form(self):
        from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
        from auto_featurs_ray.engine.aggframe import AggFrame
        from auto_featurs_ray.transformers.aggregating import CumeDistTransformer
        from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper

        rng = np.random.default_rng(2)
        n = 200
        ts = np.sort(rng.integers(0, n * 30, n)) * 1_000_000
        v = rng.integers(0, 8, n).astype(np.float64)
        frame = AggFrame(pa.table({'ts': pa.array(ts.astype('datetime64[us]')),
                                   'v': pa.array(v)}))
        t = CumeDistTransformer('v')
        lo, hi = RollingWrapper(t, CS.datetime(name='ts'), '90s').window_bounds(frame, None)
        got = np.asarray(t.compute_windowed(frame, lo, hi), dtype=np.float64)
        expect = np.array([np.sum(v[lo[i]:hi[i]] <= v[hi[i] - 1]) / (hi[i] - lo[i])
                           for i in range(n)])
        np.testing.assert_allclose(got, expect)
