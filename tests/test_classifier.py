"""Distributed logistic regression: gradient-partial parity with a
single-process reference implementation, and deterministic scoring."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from auto_featurs_ray.datapipe.classifier import (
    logistic_regression_fit,
    logistic_score,
)


def _data(n=600, dim=5, seed=4):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim)) * np.array([1.0, 3.0, 0.5, 2.0, 1.5])
    w_true = np.array([1.5, -0.8, 0.0, 0.6, -1.2])
    p = 1 / (1 + np.exp(-(x @ w_true + 0.3)))
    y = (rng.random(n) < p).astype(np.int32)
    return x, y


def _reference_fit(x, y, iterations, lr, l2):
    n, dim = x.shape
    mean = x.mean(axis=0)
    var = np.maximum((x * x).mean(axis=0) - mean ** 2, 0.0)
    std = np.where(var > 0, np.sqrt(var), 1.0)
    xs = (x - mean) / std
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iterations):
        p = 1 / (1 + np.exp(-(xs @ w + b)))
        gw = xs.T @ (p - y) / n + l2 * w
        gb = (p - y).sum() / n
        w -= lr * gw
        b -= lr * gb
    return w / std, b - float((w * (mean / std)).sum())


class TestLogisticRegression:
    def test_matches_single_process_reference(self):
        x, y = _data()
        tbl = pa.table({'vec_id': pa.array(range(len(y)), pa.int64()),
                        'embedding': pa.array(list(x), pa.list_(pa.float64())),
                        'label': pa.array(y, pa.int32())})
        blocks = [tbl.slice(i, 113) for i in range(0, len(y), 113)]
        fit = logistic_regression_fit(rd.from_arrow(blocks), label_column='label',
                                      embedding_column='embedding',
                                      iterations=25, lr=0.5, l2=1e-3)
        w_ref, b_ref = _reference_fit(x, y.astype(np.float64), 25, 0.5, 1e-3)
        np.testing.assert_allclose(fit['weights'], w_ref, rtol=1e-8)
        np.testing.assert_allclose(fit['bias'], b_ref, rtol=1e-8)
        # loss decreases
        assert fit['loss_history'][-1] < fit['loss_history'][0]
        # the model separates: training accuracy well above chance
        scores = logistic_score(rd.from_arrow(blocks), fit,
                                embedding_column='embedding').to_pandas()
        scores = scores.sort_values('vec_id').reset_index(drop=True)
        acc = ((scores['score'] > 0.5).to_numpy().astype(int) == y).mean()
        assert acc > 0.8

    def test_scalar_feature_columns(self):
        rng = np.random.default_rng(9)
        n = 300
        a = rng.standard_normal(n)
        b = rng.standard_normal(n)
        y = ((a - b) > 0).astype(np.int32)
        tbl = pa.table({'vec_id': pa.array(range(n), pa.int64()),
                        'a': pa.array(a), 'b': pa.array(b),
                        'label': pa.array(y, pa.int32())})
        fit = logistic_regression_fit(rd.from_arrow(tbl), label_column='label',
                                      feature_columns=['a', 'b'], iterations=40)
        assert fit['weights'][0] > 0 > fit['weights'][1]

    def test_validation(self):
        tbl = pa.table({'a': pa.array([1.0]), 'label': pa.array([1], pa.int32())})
        with pytest.raises(ValueError, match='exactly one'):
            logistic_regression_fit(rd.from_arrow(tbl), label_column='label')
        with pytest.raises(ValueError, match='>= 2 rows'):
            logistic_regression_fit(rd.from_arrow(tbl), label_column='label',
                                    feature_columns=['a'])
