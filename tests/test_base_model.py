"""Base-model conformance: selector algebra, schema resolution, validator.

Behaviors ported from the reference's base/tests and pipeline/tests/test_validator.py.
"""

import pytest

from auto_featurs_ray import (
    ColumnRole,
    ColumnType,
    Schema,
    name_contains,
    name_ends_with,
    name_matches,
    name_starts_with,
)
from auto_featurs_ray.base.column_specification import (
    ColumnSpecification as CS,
    ColumnTypeSelector,
)
from auto_featurs_ray.pipeline.validator import Validator
from auto_featurs_ray.transformers.numeric import AddTransformer, PolynomialTransformer
from auto_featurs_ray.transformers.text import TextLengthTransformer

NUM = CS.numeric(name='num')
NUM2 = CS.numeric(name='num_extra')
TXT = CS.text(name='text_col')
LABEL = CS.boolean(name='y', role=ColumnRole.LABEL)
TS = CS.datetime(name='ts', role=ColumnRole.TIME_INFO)
SCHEMA = Schema([NUM, NUM2, TXT, LABEL, TS])


class TestSelectors:
    def test_type_and_role_algebra(self):
        sel = (ColumnType.NUMERIC | ColumnType.BOOLEAN) & ~ColumnRole.LABEL
        assert sel.matches(NUM)
        assert not sel.matches(LABEL)   # boolean but LABEL
        assert not sel.matches(TXT)

    def test_invert_type(self):
        sel = ~ColumnType.TEXT
        assert sel.matches(NUM)
        assert not sel.matches(TXT)

    def test_name_selectors(self):
        assert name_contains('extra').matches(NUM2)
        assert name_starts_with('num').matches(NUM)
        assert name_ends_with('_col').matches(TXT)
        assert name_matches(r'^y$').matches(LABEL)
        assert not name_matches(r'^z').matches(LABEL)

    def test_selector_or_with_role(self):
        sel = ColumnRole.TIME_INFO | ColumnType.TEXT
        assert sel.matches(TS)
        assert sel.matches(TXT)
        assert not sel.matches(NUM)

    def test_type_selector_exclude(self):
        sel = ColumnTypeSelector.exclude(ColumnType.NUMERIC, ColumnType.DATETIME)
        assert sel.matches(TXT)
        assert not sel.matches(NUM)


class TestSchema:
    def test_selection_by_everything(self):
        assert SCHEMA.get_columns_from_selection('num') == [NUM]
        assert SCHEMA.get_columns_from_selection(ColumnType.NUMERIC) == [NUM, NUM2]
        assert SCHEMA.get_columns_from_selection(ColumnRole.LABEL) == [LABEL]
        assert SCHEMA.get_columns_from_selection(NUM) == [NUM]
        assert SCHEMA.get_columns_from_selection(['num', 'text_col']) == [NUM, TXT]
        got = SCHEMA.get_columns_from_selection({'text_col', 'num'})
        assert got == [NUM, TXT]  # sets resolve sorted by name

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            SCHEMA.get_columns_from_selection('missing')

    def test_add_and_drop(self):
        extra = CS.numeric(name='added')
        grown = SCHEMA + Schema([extra])
        assert grown.num_columns == SCHEMA.num_columns + 1
        shrunk = grown.drop([extra])
        assert shrunk == SCHEMA

    def test_label_column(self):
        assert SCHEMA.label_column == LABEL
        with pytest.raises(ValueError):
            Schema([NUM]).label_column

    def test_from_dict(self):
        schema = Schema.from_dict({ColumnType.NUMERIC: ['a', 'b'], ColumnType.BOOLEAN: ['y']},
                                  label_col='y')
        assert schema.label_column.name == 'y'
        with pytest.raises(ValueError):
            Schema.from_dict({ColumnType.NUMERIC: ['a']}, label_col='nope')

    def test_subset_not_in_schema(self):
        with pytest.raises(ValueError):
            SCHEMA.get_columns_of_type(ColumnType.NUMERIC, subset=[CS.numeric(name='ghost')])


class TestValidator:
    def test_wrong_arity(self):
        with pytest.raises(ValueError, match='expected 2 input columns'):
            Validator.validate_transformer_against_input_columns(
                AddTransformer('num', 'num_extra'), (NUM,))

    def test_wrong_type(self):
        with pytest.raises(ValueError, match="has type"):
            Validator.validate_transformer_against_input_columns(
                PolynomialTransformer('text_col', degree=2), (TXT,))

    def test_text_ok(self):
        Validator.validate_transformer_against_input_columns(
            TextLengthTransformer('text_col'), (TXT,))

    def test_time_window_requires_index(self):
        with pytest.raises(ValueError, match='without index column'):
            Validator.validate_time_window_index_column(['1d'], None)
        with pytest.raises(ValueError, match='DATETIME'):
            Validator.validate_time_window_index_column(['1d'], NUM)
        Validator.validate_time_window_index_column(['1d'], TS)


class TestCsvJsonSources:
    def test_csv_and_jsonl_round_trip(self, tmp_path):
        import json as _json

        import pandas as pd

        from auto_featurs_ray.base.column_specification import ColumnSpecification as CS
        from auto_featurs_ray.base.schema import Schema
        from auto_featurs_ray.dataset.dataset import Dataset
        from auto_featurs_ray.pipeline.pipeline import Pipeline

        df = pd.DataFrame({'x': [1.0, 2.0, 3.0]})
        csv_path = tmp_path / 'd.csv'
        df.to_csv(csv_path, index=False)
        jsonl_path = tmp_path / 'd.json'
        with open(jsonl_path, 'w') as f:
            for _, r in df.iterrows():
                f.write(_json.dumps({'x': r.x}) + '\n')
        schema = Schema([CS.numeric(name='x')])
        for ds in (Dataset.from_csv(csv_path, schema, order_by=[]),
                   Dataset.from_json(jsonl_path, schema, order_by=[])):
            out = Pipeline(ds).with_polynomial('x', degrees=[2]).collect()
            assert sorted(out['x_pow_2'].tolist()) == [1.0, 4.0, 9.0]
