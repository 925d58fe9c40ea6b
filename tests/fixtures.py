"""Shared conformance fixtures, ported from the reference's golden test data.

``BASIC_FRAME``: /root/reference/src/auto_featurs/utils/utils_for_tests.py:8-22
(values copied verbatim; the golden expected columns in each test file are the
reference's own hard-coded literals, so conformance does not require importing
the 3.13-only reference package).
"""

from datetime import datetime
from typing import Optional

import numpy as np
import pyarrow as pa

from auto_featurs_ray import ColumnRole, Schema
from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
from auto_featurs_ray.dataset.dataset import Dataset

BASIC_TABLE = pa.table({
    'NUMERIC_FEATURE': [0, 1, 2, 3, 4, 5],
    'NUMERIC_FEATURE_2': [0, -1, -2, -3, -4, -5],
    'CATEGORICAL_FEATURE': ['A', 'B', 'C', 'D', 'E', 'F'],
    'CATEGORICAL_FEATURE_2': ['F', 'E', 'D', 'C', 'B', 'A'],
    'GROUPING_FEATURE_NUM': ['ZERO', 'ODD', 'EVEN', 'ODD', 'EVEN', 'ODD'],
    'GROUPING_FEATURE_CAT_2': ['CONSONANT', 'VOWEL', 'CONSONANT', 'CONSONANT', 'CONSONANT', 'VOWEL'],
    'DATE_FEATURE': pa.array([datetime(2000, 1, i) for i in range(1, 7)], pa.timestamp('us')),
    'BOOL_FEATURE': [True, False, True, False, True, False],
    'TEXT_FEATURE': ['foo bar'] * 6,
    'TEXT_FEATURE_2': ['foo bar', 'bar foo', 'Foo Bar', 'foo insert bar', 'foo', 'foos bar'],
    'TEXT_FEATURE_3': ['john.doe@example.com', 'USER123!!!', 'aaaBBB111', 'straße café 42', 'foo-bar@co.gov.uk', ''],
})

BASIC_SCHEMA = Schema([
    CS.numeric(name='NUMERIC_FEATURE'),
    CS.numeric(name='NUMERIC_FEATURE_2'),
    CS.ordinal(name='CATEGORICAL_FEATURE'),
    CS.nominal(name='CATEGORICAL_FEATURE_2'),
    CS.nominal(name='GROUPING_FEATURE_NUM', role=ColumnRole.IDENTIFIER),
    CS.nominal(name='GROUPING_FEATURE_CAT_2', role=ColumnRole.IDENTIFIER),
    CS.datetime(name='DATE_FEATURE', role=ColumnRole.TIME_INFO),
    CS.boolean(name='BOOL_FEATURE'),
    CS.text(name='TEXT_FEATURE'),
    CS.text(name='TEXT_FEATURE_2'),
    CS.text(name='TEXT_FEATURE_3'),
])


def basic_dataset(num_blocks: int = 3, num_partitions: int = 4) -> Dataset:
    """BASIC_FRAME split across multiple Arrow blocks to prove order/partition handling."""
    return Dataset.from_arrow(BASIC_TABLE, BASIC_SCHEMA, order_by=['DATE_FEATURE'],
                              num_blocks=num_blocks, num_partitions=num_partitions)


def assert_column(df, name: str, expected, atol: float = 1e-6) -> None:
    """Value comparison treating None/NaN as equal-null, floats with tolerance."""
    assert name in df.columns, f'missing column {name}; have {list(df.columns)}'
    got = list(df[name])
    assert len(got) == len(expected), (name, got, expected)
    for i, (g, e) in enumerate(zip(got, expected)):
        g = _normalize(g)
        e = _normalize(e)
        if g is None or e is None:
            assert g is None and e is None, f'{name}[{i}]: {g!r} != {e!r}'
        elif isinstance(e, float) and not isinstance(e, bool):
            if np.isinf(e):
                assert np.isinf(float(g)) and np.sign(float(g)) == np.sign(e), f'{name}[{i}]: {g!r} != {e!r}'
            else:
                assert abs(float(g) - e) <= atol, f'{name}[{i}]: {g!r} != {e!r}'
        else:
            assert g == e, f'{name}[{i}]: {g!r} != {e!r}'


def _normalize(value):
    if value is None:
        return None
    if isinstance(value, float) and np.isnan(value):
        return None
    if isinstance(value, np.generic):
        return value.item()
    return value
