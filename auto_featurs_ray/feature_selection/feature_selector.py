"""Feature selection: correlation / Welch t-test / chi-squared vs the label.

Statistics match the reference
(``/root/reference/src/auto_featurs/feature_selection/feature_selector.py``):

* CORRELATION — |Pearson r| of each feature vs the label over non-null pairs,
  NaN -> 0 (ref :85-87).  Label NUMERIC/BOOLEAN.
* T_TEST — Welch-style ``|mu1 - mu0| / sqrt(var1/n1 + var0/n0)`` where ``var``
  is the sample variance of non-null feature values but ``n`` is the *group
  row count* (ref :103-125 divides by the group len), NaN -> 0; boolean label.
* CHI_SQUARED — Pearson chi² statistic of the feature x label contingency
  table (golden: x3=4.0, z1=2.0 on the reference's fixture).
* ``select_features`` — sort by statistic desc, name asc tie-break, top-k or
  ``int(frac*n)`` (ref :52-61).

All three run as a single vectorized ``map_batches`` partial pass over the Ray
Dataset (sufficient statistics / contingency dicts) + tiny driver math — no
shuffle, no materialization.
"""

from __future__ import annotations

import math
import pickle
from collections import Counter
from dataclasses import dataclass
from enum import Enum
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from auto_featurs_ray.base.column_specification import ColumnSpecification, ColumnType
from auto_featurs_ray.base.schema import ColumnSelection
from auto_featurs_ray.dataset.dataset import Dataset


class SelectionMethod(Enum):
    CORRELATION = 'Correlation'
    T_TEST = 'T-Test'
    CHI_SQUARED = 'Chi-Squared'


SUPPORTED_COLUMN_TYPES = {
    SelectionMethod.CORRELATION: [ColumnType.NUMERIC, ColumnType.BOOLEAN, ColumnType.ORDINAL],
    SelectionMethod.T_TEST: [ColumnType.NUMERIC, ColumnType.BOOLEAN, ColumnType.ORDINAL],
    SelectionMethod.CHI_SQUARED: [ColumnType.BOOLEAN, ColumnType.ORDINAL, ColumnType.NOMINAL],
}

SUPPORTED_LABEL_COLUMN_TYPES = {
    SelectionMethod.CORRELATION: [ColumnType.NUMERIC, ColumnType.BOOLEAN],
    SelectionMethod.T_TEST: [ColumnType.BOOLEAN],
    SelectionMethod.CHI_SQUARED: [ColumnType.BOOLEAN, ColumnType.ORDINAL, ColumnType.NOMINAL],
}


@dataclass(kw_only=True, frozen=True)
class SelectionReport:
    feature_names: list
    stat_values: list
    method: SelectionMethod
    p_values: Optional[list] = None

    def to_frame(self) -> pd.DataFrame:
        data = {'Feature Name': self.feature_names, f'{self.method.value} Value': self.stat_values}
        if self.p_values is not None:
            data['P-Value'] = self.p_values
        return pd.DataFrame(data)


def _numeric(table: pa.Table, name: str) -> np.ndarray:
    col = table.column(name)
    if pa.types.is_boolean(col.type) or not pa.types.is_floating(col.type):
        col = col.cast(pa.float64())
    return col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


class FeatureSelector:
    def select_features(self, report: SelectionReport, top_k: Optional[int] = None,
                        frac: Optional[float] = None) -> list:
        k = self._num_to_select(top_k, frac, len(report.feature_names))
        order = sorted(range(len(report.feature_names)),
                       key=lambda i: (-report.stat_values[i], report.feature_names[i]))
        return [report.feature_names[i] for i in order[:k]]

    def get_report(self, dataset: Dataset, feature_subset: ColumnSelection,
                   method: SelectionMethod) -> SelectionReport:
        label = dataset.get_label_column()
        features = dataset.get_columns_from_selection(feature_subset)
        self._check_valid_types(features, label, method)
        names = [f.name for f in features]

        if method == SelectionMethod.CORRELATION:
            stats = self._correlation(dataset, names, label.name)
        elif method == SelectionMethod.T_TEST:
            stats = self._t_test(dataset, names, label.name)
        else:
            stats = self._chi_squared(dataset, names, label.name)
        return SelectionReport(feature_names=names, stat_values=[stats[n] for n in names], method=method)

    # -- statistics ---------------------------------------------------------
    @staticmethod
    def _reduce(ds, partial_fn, combine_fn):
        def batch_fn(table: pa.Table) -> pa.Table:
            return pa.table({'s': [pickle.dumps(partial_fn(table))]})

        rows = ds.map_batches(batch_fn, batch_format='pyarrow').take_all()
        acc = None
        for row in rows:
            state = pickle.loads(row['s'])
            acc = state if acc is None else combine_fn(acc, state)
        return acc

    def _correlation(self, dataset: Dataset, names: list, label_name: str) -> dict:
        def partial(table: pa.Table):
            y = _numeric(table, label_name)
            out = {}
            for n in names:
                x = _numeric(table, n)
                ok = ~(np.isnan(x) | np.isnan(y))
                xs, ys = x[ok], y[ok]
                out[n] = (len(xs), xs.sum(), ys.sum(), (xs * ys).sum(), (xs * xs).sum(), (ys * ys).sum())
            return out

        def combine(a, b):
            return {n: tuple(p + q for p, q in zip(a[n], b[n])) for n in a}

        sums = self._reduce(dataset.data, partial, combine)
        stats = {}
        for n, (cnt, sx, sy, sxy, sxx, syy) in sums.items():
            with np.errstate(divide='ignore', invalid='ignore'):
                cov = sxy - sx * sy / cnt if cnt else np.nan
                denom = math.sqrt(max(sxx - sx * sx / cnt, 0.0)) * math.sqrt(max(syy - sy * sy / cnt, 0.0)) if cnt else np.nan
                r = cov / denom if denom else np.nan
            stats[n] = 0.0 if (r is None or np.isnan(r)) else abs(float(r))
        return stats

    def _t_test(self, dataset: Dataset, names: list, label_name: str) -> dict:
        def partial(table: pa.Table):
            y = _numeric(table, label_name)
            out = {}
            for flag in (0.0, 1.0):
                mask = y == flag
                group = {'__len': int(mask.sum())}
                for n in names:
                    x = _numeric(table, n)[mask]
                    x = x[~np.isnan(x)]
                    group[n] = (len(x), x.sum(), (x * x).sum())
                out[flag] = group
            return out

        def combine(a, b):
            merged = {}
            for flag in (0.0, 1.0):
                g = {'__len': a[flag]['__len'] + b[flag]['__len']}
                for n in names:
                    g[n] = tuple(p + q for p, q in zip(a[flag][n], b[flag][n]))
                merged[flag] = g
            return merged

        groups = self._reduce(dataset.data, partial, combine)
        stats = {}
        for n in names:
            parts = {}
            for flag in (0.0, 1.0):
                cnt, s, sq = groups[flag][n]
                total = groups[flag]['__len']  # reference divides var by the group ROW count
                var = (sq - s * s / cnt) / (cnt - 1) if cnt > 1 else float('nan')
                mean = s / cnt if cnt else float('nan')
                parts[flag] = (mean, var, total)
            mean_diff = abs(parts[1.0][0] - parts[0.0][0])
            with np.errstate(divide='ignore', invalid='ignore'):
                denom = math.sqrt(parts[1.0][1] / parts[1.0][2] + parts[0.0][1] / parts[0.0][2]) \
                    if parts[1.0][2] and parts[0.0][2] else float('nan')
                t = mean_diff / denom if denom == denom else float('nan')
            if t != t:  # NaN -> 0 (ref :129)
                t = 0.0
            stats[n] = float(t)
        return stats

    def _chi_squared(self, dataset: Dataset, names: list, label_name: str) -> dict:
        def partial(table: pa.Table):
            y = table.column(label_name).to_pandas()
            out = {}
            for n in names:
                x = table.column(n).to_pandas()
                counts = (pd.DataFrame({'x': x, 'y': y}).dropna()
                          .groupby(['x', 'y'], sort=False).size())
                out[n] = Counter({tuple(k): int(v) for k, v in counts.items()})
            return out

        def combine(a, b):
            return {n: a[n] + b[n] for n in a}

        tables = self._reduce(dataset.data, partial, combine)
        stats = {}
        for n, counts in tables.items():
            rows = sorted({k[0] for k in counts})
            cols = sorted({k[1] for k in counts})
            obs = np.array([[counts.get((r, c), 0) for c in cols] for r in rows], dtype=np.float64)
            total = obs.sum()
            expected = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / total
            with np.errstate(divide='ignore', invalid='ignore'):
                chi2 = np.nansum(np.where(expected > 0, (obs - expected) ** 2 / expected, 0.0))
            stats[n] = float(chi2)
        return stats

    # -- validation ---------------------------------------------------------
    @staticmethod
    def _check_valid_types(features: list, label: ColumnSpecification, method: SelectionMethod) -> None:
        ok_label = SUPPORTED_LABEL_COLUMN_TYPES[method]
        if label.column_type not in ok_label:
            raise ValueError(
                f"{method.value} can only be computed with label column of type "
                f"{', '.join(t.value for t in ok_label)}, but {label.name} is of type {label.column_type}.")
        ok = SUPPORTED_COLUMN_TYPES[method]
        for col in features:
            if col.column_type not in ok:
                raise ValueError(
                    f"{method.value} can only be computed for {', '.join(t.value for t in ok)} columns, "
                    f'but {col.name} is of type {col.column_type}.')

    @staticmethod
    def _num_to_select(top_k: Optional[int], frac: Optional[float], num_cols: int) -> int:
        if (top_k is None) == (frac is None):
            raise ValueError('Exactly one of k or frac must be specified')
        if top_k is not None:
            if top_k < 1:
                raise ValueError(f'k must be at least 1 but {top_k} was given.')
            return top_k
        if not (0 <= frac <= 1):
            raise ValueError(f'frac must be between 0 and 1 but {frac} was given.')
        return int(frac * num_cols)
