"""Immutable feature-pipeline builder over a Ray Data Dataset.

API-compatible with the reference builder
(``/root/reference/src/auto_featurs/pipeline/pipeline.py``): each ``with_*``
method resolves column selections against the declared schema, takes the
cartesian product of factories x column combinations x keyword grids, prunes
via the optimizer, wraps aggregates in Rolling then Over, dedups against
already-present output columns and returns a NEW pipeline.  Layers
(``with_new_layer``) let generated columns feed later steps.

Execution (``collect_plan``) is where this engine departs from the reference:
instead of folding polars expressions, each layer is planned into Ray Data
stages — one fused row-local ``map_batches``, one hash-partitioned window
stage per distinct over-key set, and broadcast two-pass stages for global
aggregates (see ``engine/runtime.py``).
"""

from __future__ import annotations

from datetime import timedelta
from itertools import product
from pathlib import Path
from typing import Any, List, Literal, Mapping, Optional, Sequence, Union

from auto_featurs_ray.base.column_specification import ColumnNameOrSpec, ColumnSpecification
from auto_featurs_ray.base.schema import ColumnSelection, Schema
from auto_featurs_ray.dataset.dataset import Dataset
from auto_featurs_ray.engine.runtime import apply_layer
from auto_featurs_ray.expressions import Expr
from auto_featurs_ray.pipeline.optimizer import OptimizationLevel, Optimizer
from auto_featurs_ray.pipeline.validator import Validator
from auto_featurs_ray.transformers.aggregating import (
    ArgMaxTransformer,
    ArgMinTransformer,
    ArithmeticAggregations,
    AutocorrTransformer,
    Binning,
    CorrelationTransformer,
    CovarianceTransformer,
    CountTransformer,
    EwmMeanTransformer,
    EntityEntropyTransformer,
    FirstValueTransformer,
    LaggedTransformer,
    ModeTransformer,
    NumUniqueTransformer,
    PointwiseMutualInformationTransformer,
    RegressionInterceptTransformer,
    RegressionSlopeTransformer,
    Scaling,
    TargetEncodingTransformer,
)
from auto_featurs_ray.transformers.base import CumulativeOptions, Transformer
from auto_featurs_ray.transformers.comparison import Comparisons
from auto_featurs_ray.transformers.datetime import SeasonalOperation, TimeDiffTransformer
from auto_featurs_ray.transformers.numeric import (
    ArithmeticOperation,
    Goniometric,
    LogTransformer,
    PolynomialTransformer,
)
from auto_featurs_ray.transformers.over_wrapper import OverWrapper
from auto_featurs_ray.transformers.rolling_wrapper import RollingWrapper
from auto_featurs_ray.transformers.text import (
    TextCountMatchesTransformer,
    TextExtraction,
    TextSimilarity,
)
from auto_featurs_ray.utils import get_valid_param_options, order_preserving_unique

TransformerLayers = List[List[Transformer]]


class Pipeline:
    def __init__(self, dataset: Dataset, transformers: Optional[TransformerLayers] = None,
                 optimization_level: OptimizationLevel = OptimizationLevel.NONE,
                 auxiliary_columns: Optional[list] = None) -> None:
        self._dataset = dataset
        self._transformers: TransformerLayers = transformers if transformers is not None else [[]]
        self._auxiliary_columns: list = auxiliary_columns if auxiliary_columns is not None else []
        self._optimizer = Optimizer(optimization_level)
        self._validator = Validator()

    # ------------------------------------------------------------------
    # row-local generators
    # ------------------------------------------------------------------
    def with_seasonal(self, subset: ColumnSelection, operations: Sequence[SeasonalOperation],
                      angular: bool = False, periodic: bool = False, auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        factories = [op.value for op in order_preserving_unique(operations)]
        transformers = self._build_transformers(
            transformer_factory=factories,
            input_columns=input_columns,
            angular=True if periodic else angular,
            kw_params={'gon_transformation': ('sin', 'cos')} if periodic else None,
        )
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_columns(self, expressions: Sequence[Expr],
                     column_types: Optional[Sequence] = None,
                     auxiliary: bool = False) -> 'Pipeline':
        """Arbitrary aliased expression columns (engine extension): each
        :class:`Expr` combinator tree becomes a vectorized row-local kernel
        fused into the layer's single map_batches stage.  ``column_types``
        declares output types positionally (NUMERIC default — pass BOOLEAN
        for comparisons)."""
        from auto_featurs_ray.base.column_specification import ColumnType
        from auto_featurs_ray.transformers.numeric import ExpressionTransformer
        expressions = list(expressions)
        types = list(column_types) if column_types is not None             else [ColumnType.NUMERIC] * len(expressions)
        if len(types) != len(expressions):
            raise ValueError(f'{len(expressions)} expressions but {len(types)} column_types')
        transformers = [ExpressionTransformer(e, t) for e, t in zip(expressions, types)]
        for t in transformers:
            self._validator.validate_transformer_against_input_columns(t, ())
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_time_diff(self, left_subset: ColumnSelection, right_subset: ColumnSelection,
                       unit: Literal['s', 'h', 'd'] = 'd', auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(left_subset, right_subset)
        transformers = self._build_transformers(
            transformer_factory=TimeDiffTransformer, input_columns=input_columns, unit=unit)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_polynomial(self, subset: ColumnSelection, degrees: Sequence[int], auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        transformers = self._build_transformers(
            transformer_factory=PolynomialTransformer, input_columns=input_columns,
            kw_params={'degree': degrees})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_log(self, subset: ColumnSelection, bases: Sequence[float], auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        transformers = self._build_transformers(
            transformer_factory=LogTransformer, input_columns=input_columns, kw_params={'base': bases})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_goniometric(self, subset: ColumnSelection, functions: Sequence[Goniometric],
                         auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        factories = [op.value for op in order_preserving_unique(functions)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_scaling(self, subset: ColumnSelection, scalings: Sequence[Scaling], auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        factories = [op.value for op in order_preserving_unique(scalings)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_arithmetic(self, left_subset: ColumnSelection, right_subset: ColumnSelection,
                        operations: Sequence[ArithmeticOperation], auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(left_subset, right_subset)
        factories = [op.value for op in order_preserving_unique(operations)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_comparison(self, left_subset: ColumnSelection, right_subset: ColumnSelection,
                        comparisons: Sequence[Comparisons], auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(left_subset, right_subset)
        factories = [op.value for op in order_preserving_unique(comparisons)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_text_similarity(self, left_subset: ColumnSelection, right_subset: ColumnSelection,
                             text_similarities: Sequence[TextSimilarity], auxiliary: bool = False,
                             **kwargs: Any) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(left_subset, right_subset)
        factories = [op.value for op in order_preserving_unique(text_similarities)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns, **kwargs)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_text_extraction(self, subset: ColumnSelection, text_extractions: Sequence[TextExtraction],
                             auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        factories = [op.value for op in order_preserving_unique(text_extractions)]
        transformers = self._build_transformers(transformer_factory=factories, input_columns=input_columns)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_text_count_matches(self, subset: ColumnSelection, patterns: list, auxiliary: bool = False) -> 'Pipeline':
        input_columns = self._dataset.get_combinations_from_selections(subset)
        transformers = self._build_transformers(
            transformer_factory=TextCountMatchesTransformer, input_columns=input_columns,
            kw_params={'pattern': patterns})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    # ------------------------------------------------------------------
    # aggregating generators (over / rolling / cumulative / filtered)
    # ------------------------------------------------------------------
    def with_count(self, over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                   time_windows: Sequence = (), index_column_name: Optional[str] = None,
                   cumulative: CumulativeOptions = CumulativeOptions.NONE,
                   filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        """Row counts: plain, filtered, expanding (EXCLUSIVE/INCLUSIVE), per
        group (``over_columns_combinations``; an empty combo adds the
        ungrouped variant) and over trailing time windows."""
        transformers = self._build_aggregated_transformers(
            transformer_factory=CountTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_lagged(self, subset: ColumnSelection, lags: Sequence[int],
                    over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                    fill_value: Any = None, auxiliary: bool = False) -> 'Pipeline':
        """Lag (positive) / lead (negative) features per ordered group — the
        point-in-time building block; order comes from Dataset.order_by."""
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=LaggedTransformer,
            over_columns_combinations=over_columns_combinations,
            kw_params={'lag': lags}, fill_value=fill_value)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_diff(self, subset: ColumnSelection, lags: Sequence[int] = (1,),
                  over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                  filtering_condition: Optional[Expr] = None,
                  auxiliary: bool = False) -> 'Pipeline':
        """k-step differences ``x - x.shift(lag)`` within the ordered group
        (engine extension); negative lags difference against future rows."""
        from auto_featurs_ray.transformers.aggregating import DiffTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=DiffTransformer,
            over_columns_combinations=over_columns_combinations,
            filtering_condition=filtering_condition,
            kw_params={'lag': [int(l) for l in lags]})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_pct_change(self, subset: ColumnSelection, lags: Sequence[int] = (1,),
                        over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                        filtering_condition: Optional[Expr] = None,
                        auxiliary: bool = False) -> 'Pipeline':
        """k-step relative changes ``x / x.shift(lag) - 1`` within the
        ordered group (engine extension); zero denominators yield null."""
        from auto_featurs_ray.transformers.aggregating import PctChangeTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=PctChangeTransformer,
            over_columns_combinations=over_columns_combinations,
            filtering_condition=filtering_condition,
            kw_params={'lag': [int(l) for l in lags]})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_streak(self, conditions: Sequence[Expr],
                    over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                    auxiliary: bool = False) -> 'Pipeline':
        """Current consecutive-run length of each boolean condition within
        the ordered group (engine extension): 1, 2, 3... while it holds, 0
        on false rows."""
        from auto_featurs_ray.transformers.aggregating import StreakTransformer
        transformers = self._build_aggregated_transformers(
            transformer_factory=StreakTransformer,
            over_columns_combinations=over_columns_combinations,
            kw_params={'condition': list(conditions)})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_first_value(self, subset: ColumnSelection,
                         over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                         time_windows: Sequence = (), index_column_name: Optional[str] = None,
                         filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=FirstValueTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_mode(self, subset: ColumnSelection,
                  over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                  time_windows: Sequence = (), index_column_name: Optional[str] = None,
                  cumulative: CumulativeOptions = CumulativeOptions.NONE,
                  filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=ModeTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_num_unique(self, subset: ColumnSelection,
                        over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                        time_windows: Sequence = (), index_column_name: Optional[str] = None,
                        cumulative: CumulativeOptions = CumulativeOptions.NONE,
                        filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=NumUniqueTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_entity_entropy(self, source_subset: ColumnSelection, target_subset: ColumnSelection,
                            time_windows: Sequence = (), index_column_name: Optional[str] = None,
                            cumulative: CumulativeOptions = CumulativeOptions.NONE,
                            auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            source_subset, target_subset, transformer_factory=EntityEntropyTransformer,
            time_windows=time_windows, index_column_name=index_column_name, cumulative=cumulative)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_pointwise_mutual_information(self, column_a_subset: ColumnSelection,
                                          column_b_subset: ColumnSelection,
                                          over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                                          time_windows: Sequence = (), index_column_name: Optional[str] = None,
                                          cumulative: CumulativeOptions = CumulativeOptions.NONE,
                                          filtering_condition: Optional[Expr] = None,
                                          auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            column_a_subset, column_b_subset, transformer_factory=PointwiseMutualInformationTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_correlation(self, column_a_subset: ColumnSelection,
                         column_b_subset: ColumnSelection,
                         over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                         time_windows: Sequence = (), index_column_name: Optional[str] = None,
                         cumulative: CumulativeOptions = CumulativeOptions.NONE,
                         filtering_condition: Optional[Expr] = None,
                         auxiliary: bool = False) -> 'Pipeline':
        """Pairwise sample Pearson correlation features (engine extension):
        per-group, running (cumulative), or rolling-window ``corr(a, b)``."""
        transformers = self._build_aggregated_transformers(
            column_a_subset, column_b_subset, transformer_factory=CorrelationTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_covariance(self, column_a_subset: ColumnSelection,
                        column_b_subset: ColumnSelection,
                        over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                        time_windows: Sequence = (), index_column_name: Optional[str] = None,
                        cumulative: CumulativeOptions = CumulativeOptions.NONE,
                        filtering_condition: Optional[Expr] = None,
                        auxiliary: bool = False) -> 'Pipeline':
        """Pairwise sample covariance features (engine extension, DuckDB
        ``covar_samp`` semantics): per-group, running, or rolling."""
        transformers = self._build_aggregated_transformers(
            column_a_subset, column_b_subset, transformer_factory=CovarianceTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_autocorrelation(self, subset: ColumnSelection, lags: Sequence[int] = (1,),
                             over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                             filtering_condition: Optional[Expr] = None,
                             auxiliary: bool = False) -> 'Pipeline':
        """Lag-k serial correlation of each entity's ordered series (engine
        extension): the momentum / mean-reversion signal, broadcast to every
        row of the group."""
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=AutocorrTransformer,
            over_columns_combinations=over_columns_combinations,
            filtering_condition=filtering_condition,
            kw_params={'lag': [int(l) for l in lags]})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_weighted_mean(self, value_subset: ColumnSelection,
                           weight_subset: ColumnSelection,
                           over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                           time_windows: Sequence = (), index_column_name: Optional[str] = None,
                           cumulative: CumulativeOptions = CumulativeOptions.NONE,
                           filtering_condition: Optional[Expr] = None,
                           auxiliary: bool = False) -> 'Pipeline':
        """Weight-weighted mean ``sum(x*w)/sum(w)`` features (engine
        extension): per-group, running, or rolling."""
        from auto_featurs_ray.transformers.aggregating import WeightedMeanTransformer
        transformers = self._build_aggregated_transformers(
            value_subset, weight_subset, transformer_factory=WeightedMeanTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_share(self, subset: ColumnSelection,
                   over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                   time_windows: Sequence = (), index_column_name: Optional[str] = None,
                   cumulative: CumulativeOptions = CumulativeOptions.NONE,
                   filtering_condition: Optional[Expr] = None,
                   auxiliary: bool = False) -> 'Pipeline':
        """Row's share of the group / running / rolling valid-value total
        (engine extension): the contribution-fraction feature."""
        from auto_featurs_ray.transformers.aggregating import ShareTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=ShareTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_ewm(self, subset: ColumnSelection, alphas: Sequence[float],
                 over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                 time_windows: Sequence = (), index_column_name: Optional[str] = None,
                 cumulative: CumulativeOptions = CumulativeOptions.INCLUSIVE,
                 filtering_condition: Optional[Expr] = None,
                 auxiliary: bool = False) -> 'Pipeline':
        """Exponentially weighted moving-average features (engine extension):
        one running EWM column per (column, alpha); ``cumulative`` defaults
        to INCLUSIVE — the natural mode for a recency-weighted mean."""
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=EwmMeanTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition,
            kw_params={'alpha': list(alphas)})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_winsorize(self, subset: ColumnSelection,
                       limits: Sequence[Sequence[float]] = ((0.05, 0.95),),
                       over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                       auxiliary: bool = False) -> 'Pipeline':
        """Clip numeric columns to per-group (or corpus, via mergeable
        sketch states) interpolated-quantile limits (engine extension)."""
        from auto_featurs_ray.transformers.aggregating import WinsorizeTransformer
        pairs = [(float(lo), float(hi)) for lo, hi in limits]
        transformers = []
        for lo, hi in pairs:
            transformers.extend(self._build_aggregated_transformers(
                subset, transformer_factory=WinsorizeTransformer,
                over_columns_combinations=over_columns_combinations,
                kw_params={'lower_q': [lo], 'upper_q': [hi]}))
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_binning(self, subset: ColumnSelection, strategies: Sequence[Binning],
                     num_bins: Sequence[int] = (4,),
                     over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                     auxiliary: bool = False) -> 'Pipeline':
        """Discretize numeric columns into ordinal bin codes 0..k-1 (engine
        extension): ``QUANTILE`` fits equal-frequency edges, ``EQUAL_WIDTH``
        evenly spaced ones — per ``over`` group, or globally via mergeable
        broadcast states (quantile sketch / min-max) when no grouping is
        given."""
        factories = [op.value for op in order_preserving_unique(strategies)]
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=factories,
            over_columns_combinations=over_columns_combinations,
            kw_params={'num_bins': [int(b) for b in num_bins]})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_target_encoding(self, subset: ColumnSelection,
                             over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                             smoothing: Union[float, Sequence[float]] = 0.0,
                             leave_one_out: bool = False,
                             time_windows: Sequence = (), index_column_name: Optional[str] = None,
                             cumulative: CumulativeOptions = CumulativeOptions.NONE,
                             filtering_condition: Optional[Expr] = None,
                             auxiliary: bool = False) -> 'Pipeline':
        """Smoothed / leave-one-out target encoding of the ``over`` key sets
        by a numeric target column (engine extension):
        ``(S_g + m * prior) / (n_g + m)`` with the global target mean as the
        prior.  ``cumulative=EXCLUSIVE`` gives the leakage-free expanding
        encoding, a time window the rolling one.  When any ``smoothing > 0``
        a preceding layer computing the global prior mean (broadcast
        two-pass, auxiliary ``{column}_mean``) is planned automatically — so
        this method may add one layer to the pipeline.
        """
        smoothings = [float(s) for s in
                      (smoothing if isinstance(smoothing, (list, tuple)) else [smoothing])]
        p = self
        if any(s > 0 for s in smoothings):
            p = p.with_arithmetic_aggregation(
                subset, [ArithmeticAggregations.MEAN],
                filtering_condition=filtering_condition, auxiliary=True)
            p = p.with_new_layer()
        transformers = p._build_aggregated_transformers(
            subset, transformer_factory=TargetEncodingTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition,
            kw_params={'smoothing': smoothings, 'leave_one_out': [leave_one_out]})
        return p._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_linear_regression(self, y_subset: ColumnSelection, x_subset: ColumnSelection,
                               statistics: Sequence[str] = ('slope', 'intercept'),
                               over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                               time_windows: Sequence = (), index_column_name: Optional[str] = None,
                               cumulative: CumulativeOptions = CumulativeOptions.NONE,
                               filtering_condition: Optional[Expr] = None,
                               auxiliary: bool = False) -> 'Pipeline':
        """Least-squares ``y ~ x`` features (engine extension): per-group,
        running (cumulative), or rolling-window slope / intercept with DuckDB
        ``regr_slope`` / ``regr_intercept`` semantics."""
        fmap = {'slope': RegressionSlopeTransformer, 'intercept': RegressionInterceptTransformer}
        unknown = [s for s in statistics if s not in fmap]
        if unknown:
            raise ValueError(f'unknown regression statistics {unknown}; choose from {sorted(fmap)}')
        factories = [fmap[s] for s in order_preserving_unique(statistics)]
        transformers = self._build_aggregated_transformers(
            y_subset, x_subset, transformer_factory=factories,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_arithmetic_aggregation(self, subset: ColumnSelection,
                                    aggregations: Sequence[ArithmeticAggregations],  # min/max/sum/quantile/median/mean/std/zscore
                                    over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                                    time_windows: Sequence = (), index_column_name: Optional[str] = None,
                                    cumulative: CumulativeOptions = CumulativeOptions.NONE,
                                    filtering_condition: Optional[Expr] = None,
                                    auxiliary: bool = False, **kwargs: Any) -> 'Pipeline':
        factories = [op.value for op in order_preserving_unique(aggregations)]
        quantiles = kwargs.pop('quantiles', None)
        kw_params = {'quantile': quantiles} if quantiles else None
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=factories,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition, kw_params=kw_params)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_ntile(self, subset: ColumnSelection, num_buckets: Sequence[int] = (4,),
                   over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                   time_windows: Sequence = (), index_column_name: Optional[str] = None,
                   filtering_condition: Optional[Expr] = None,
                   auxiliary: bool = False) -> 'Pipeline':
        """Rank-based equal-count buckets 1..k per group (engine extension,
        SQL NTILE split with value-deterministic tie handling)."""
        from auto_featurs_ray.transformers.aggregating import NtileTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=NtileTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            filtering_condition=filtering_condition,
            kw_params={'num_buckets': [int(b) for b in num_buckets]})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_argmin(self, value_subset: ColumnSelection, arg_subset: ColumnSelection,
                    over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                    time_windows: Sequence = (), index_column_name: Optional[str] = None,
                    cumulative: CumulativeOptions = CumulativeOptions.NONE,
                    filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            value_subset, arg_subset, transformer_factory=ArgMinTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_argmax(self, value_subset: ColumnSelection, arg_subset: ColumnSelection,
                    over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                    time_windows: Sequence = (), index_column_name: Optional[str] = None,
                    cumulative: CumulativeOptions = CumulativeOptions.NONE,
                    filtering_condition: Optional[Expr] = None, auxiliary: bool = False) -> 'Pipeline':
        transformers = self._build_aggregated_transformers(
            value_subset, arg_subset, transformer_factory=ArgMaxTransformer,
            over_columns_combinations=over_columns_combinations,
            time_windows=time_windows, index_column_name=index_column_name,
            cumulative=cumulative, filtering_condition=filtering_condition)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    # ------------------------------------------------------------------
    # temporal extensions (sessionize / backfill / recency — north rule)
    # ------------------------------------------------------------------
    def with_sessionization(self, subset: ColumnSelection, gaps: Sequence,
                            over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                            auxiliary: bool = False) -> 'Pipeline':
        from auto_featurs_ray.transformers.temporal import SessionIdTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=SessionIdTransformer,
            over_columns_combinations=over_columns_combinations,
            kw_params={'gap': gaps})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_time_since_last(self, subset: ColumnSelection,
                             over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                             auxiliary: bool = False) -> 'Pipeline':
        from auto_featurs_ray.transformers.temporal import TimeSinceLastTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=TimeSinceLastTransformer,
            over_columns_combinations=over_columns_combinations)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_time_to_next(self, subset: ColumnSelection,
                          over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                          auxiliary: bool = False) -> 'Pipeline':
        """Seconds until the group's next row (engine extension): the
        forward-recency / inactivity-label counterpart of time_since_last."""
        from auto_featurs_ray.transformers.temporal import TimeToNextTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=TimeToNextTransformer,
            over_columns_combinations=over_columns_combinations)
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    def with_fill(self, subset: ColumnSelection, strategies: Sequence,
                  over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                  auxiliary: bool = False) -> 'Pipeline':
        from auto_featurs_ray.transformers.temporal import FillTransformer
        transformers = self._build_aggregated_transformers(
            subset, transformer_factory=FillTransformer,
            over_columns_combinations=over_columns_combinations,
            kw_params={'strategy': list(strategies)})
        return self._with_added_to_current_layer(transformers, auxiliary=auxiliary)

    # ------------------------------------------------------------------
    # layering / execution
    # ------------------------------------------------------------------
    def with_new_layer(self) -> 'Pipeline':
        new_layer_schema = self._get_schema_from_transformers(self._current_layer())
        return Pipeline(
            dataset=self._dataset.with_schema(new_schema=new_layer_schema),
            transformers=self._transformers + [[]],
            optimization_level=self._optimizer.optimization_level,
            auxiliary_columns=self._auxiliary_columns,
        )

    def collect_plan(self, cache_computation: bool = False) -> Dataset:
        """Plan every layer into Ray Data stages (see engine/runtime.apply_layer)
        and return the lazily-transformed Dataset; auxiliary columns dropped."""
        current_layer_schema = self._get_schema_from_transformers(self._current_layer())
        dataset = self._dataset.with_schema(new_schema=current_layer_schema)
        data = dataset.data
        for layer in self._transformers:
            if layer:
                data = apply_layer(data, layer, order_by=dataset.order_by,
                                   num_partitions=dataset.num_partitions,
                                   broadcast_agg_keys=dataset.broadcast_agg_keys)
        dataset = dataset.with_data(data)
        dataset = dataset.drop(self._auxiliary_columns)
        if cache_computation:
            return dataset.with_cached_computation()
        return dataset

    def collect(self):
        return self.collect_plan().collect()

    def sink_parquet(self, path: Union[str, Path]) -> None:
        self.collect_plan().sink_parquet(path)

    def describe(self) -> str:
        result = self.collect_plan_schema()
        width = max(len(c.name) for c in result.columns) + 10

        lines: list = []
        lines.append('\n\n\nPipeline Breakdown')
        lines.append('=' * 80)
        initial = result.drop(
            t.output_column_specification for t in self._all_transformers()
            if t.output_column_specification not in self._auxiliary_columns)
        lines.append(f'\nInitial Schema: {len(initial.columns)} columns')
        for c in initial.columns:
            lines.append(f'  - {c.name:<{width + 1}} | {c.column_type.name:<10} | {c.column_role.name}')
        lines.append('')
        lines.append('-' * 80)
        total = 0
        for i, layer in enumerate(self._transformers):
            current = i == len(self._transformers) - 1
            lines.append(f'Layer {i + 1}{" [Current]" if current else ""}: {len(layer)} transformer{"s" if len(layer) > 1 else ""}')
            if not layer:
                lines.append('  (Empty layer)')
            for t in layer:
                spec = t.output_column_specification
                aux = ' [AUXILIARY]' if spec in self._auxiliary_columns else ''
                lines.append(f'  -> {spec.name:<{width}} | Type: {spec.column_type.name}{aux}')
                total += 1
            if not current:
                lines.append('-' * 40)
        lines.append('-' * 80)
        lines.append('')
        lines.append(f'Final Schema: {len(result.columns)} columns')
        for c in result.columns:
            lines.append(f'  - {c.name:<{width + 1}} | {c.column_type.name:<10} | {c.column_role.name}')
        lines.append('')
        lines.append('-' * 80)
        lines.append('')
        lines.append('Summary:')
        lines.append(f'  Total Layers:                                  {len(self._transformers)}\n')
        lines.append(f'  Initial Column Count:                          {len(initial.columns)}')
        lines.append(f'  Total Features Created (of which auxiliary):   {total} ({len(self._auxiliary_columns)})\n')
        lines.append(f'  Final Column Count:                            {len(result.columns)}\n')
        lines.append('=' * 80)
        return '\n'.join(lines)

    def collect_plan_schema(self) -> Schema:
        """The final logical schema without triggering any execution."""
        schema = self._dataset.schema + self._get_schema_from_transformers(self._current_layer())
        return schema.drop(self._auxiliary_columns)

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------
    def _all_transformers(self):
        for layer in self._transformers:
            yield from layer

    def _with_added_to_current_layer(self, transformers, auxiliary: bool = False) -> 'Pipeline':
        additions = [transformers] if isinstance(transformers, Transformer) else list(transformers)
        # dedup against the declared schema AND the current layer's outputs: polars
        # with_columns would silently overwrite a duplicate alias, Arrow append_column
        # would duplicate it — so the engine drops repeats eagerly.
        present = self._dataset.schema + self._get_schema_from_transformers(self._current_layer())
        additions = self._optimizer.deduplicate_transformers_against_layers(present, additions)

        auxiliary_columns = self._auxiliary_columns
        if auxiliary:
            auxiliary_columns.extend(t.output_column_specification for t in additions)

        return Pipeline(
            dataset=self._dataset,
            transformers=self._transformers[:-1] + [self._current_layer() + additions],
            optimization_level=self._optimizer.optimization_level,
            auxiliary_columns=auxiliary_columns,
        )

    def _current_layer(self) -> list:
        return self._transformers[-1]

    @staticmethod
    def _get_schema_from_transformers(transformers: Sequence[Transformer]) -> Schema:
        return Schema([t.output_column_specification for t in transformers])

    def _build_aggregated_transformers(self, *subsets: ColumnSelection, transformer_factory,
                                       over_columns_combinations: Sequence[Sequence[ColumnNameOrSpec]] = (),
                                       time_windows: Sequence = (),
                                       index_column_name: Optional[str] = None,
                                       **kwargs: Any) -> list:
        over_columns_combinations = [
            self._dataset.get_columns_from_selection(combo) if combo else []
            for combo in over_columns_combinations
        ]
        index_column = self._dataset.get_column_by_name(index_column_name) if index_column_name else None
        self._validator.validate_time_window_index_column(time_windows, index_column)
        input_columns = self._dataset.get_combinations_from_selections(*subsets) if subsets is not None else None

        aggregating = self._build_transformers(
            transformer_factory=transformer_factory, input_columns=input_columns, **kwargs)

        rolling = self._wrap_rolling(aggregating, index_column, time_windows)
        return self._wrap_over(rolling, over_columns_combinations)

    def _wrap_over(self, aggregating: Sequence, over_columns_combinations: Sequence) -> list:
        if not over_columns_combinations:
            return list(aggregating)
        out: list = []
        valid, all_valid = get_valid_param_options(over_columns_combinations)
        if not all_valid:
            out.extend(aggregating)
        if valid:
            out.extend(self._build_transformers(
                transformer_factory=OverWrapper, input_columns=None,
                kw_params={'inner_transformer': aggregating, 'over_columns': valid}))
        return out

    def _wrap_rolling(self, aggregating: Sequence, index_column: Optional[ColumnSpecification],
                      time_windows: Sequence) -> list:
        if index_column is None or not time_windows:
            return list(aggregating)
        out: list = []
        valid, all_valid = get_valid_param_options(time_windows)
        if not all_valid:
            out.extend(aggregating)
        if valid:
            out.extend(self._build_transformers(
                transformer_factory=RollingWrapper, input_columns=None,
                kw_params={'inner_transformer': aggregating, 'time_window': valid},
                index_column=index_column))
        return out

    def _build_transformers(self, *, transformer_factory, input_columns=None,
                            kw_params: Optional[Mapping[str, Sequence]] = None, **kwargs: Any) -> list:
        transformers: list = []
        factories = transformer_factory if isinstance(transformer_factory, list) else [transformer_factory]
        input_columns = input_columns or []
        kw_params = kw_params or {}

        column_combinations = list(product(*input_columns))
        kw_keys = list(kw_params.keys())
        kw_combinations = list(product(*kw_params.values()))

        for factory in factories:
            pruned = self._optimizer.optimize_input_columns(factory, column_combinations)
            for column_combination in pruned:
                for kw_combination in kw_combinations:
                    transformer_kwargs = dict(zip(kw_keys, kw_combination)) | kwargs
                    transformer = factory(*column_combination, **transformer_kwargs)
                    self._validator.validate_transformer_against_input_columns(transformer, column_combination)
                    transformers.append(transformer)
        return transformers
