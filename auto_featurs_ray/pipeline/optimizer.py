"""Combination pruning and output-column deduplication.

Same three levels as the reference (``pipeline/optimizer.py:10-13``):
``NONE`` keeps the full cartesian product including ``(x, x)``; ``SKIP_SELF``
drops tuples with repeated columns; ``DEDUPLICATE_COMMUTATIVE`` additionally
keeps one ordering per commutative transformer.  Name-collision dedup against
the present schema is always on (ref optimizer.py:24-35).
"""

from __future__ import annotations

from enum import IntEnum
from typing import Iterable, Iterator

from auto_featurs_ray.base.schema import Schema
from auto_featurs_ray.transformers.base import Transformer


class OptimizationLevel(IntEnum):
    NONE = 0
    SKIP_SELF = 1
    DEDUPLICATE_COMMUTATIVE = 2


class Optimizer:
    def __init__(self, optimization_level: OptimizationLevel) -> None:
        self._optimization_level = optimization_level

    @property
    def optimization_level(self) -> OptimizationLevel:
        return self._optimization_level

    @staticmethod
    def deduplicate_transformers_against_layers(present_schema: Schema,
                                                additions: Iterable[Transformer]) -> list:
        present = set(present_schema.columns)
        kept = []
        for transformer in additions:
            spec = transformer.output_column_specification
            if spec not in present:
                kept.append(transformer)
                present.add(spec)
        return kept

    def optimize_input_columns(self, transformer_cls, combinations: Iterable[tuple]) -> Iterator[tuple]:
        result: Iterable[tuple] = combinations
        if self._optimization_level >= OptimizationLevel.SKIP_SELF:
            result = (c for c in result if len(set(c)) == len(c))
        if self._optimization_level >= OptimizationLevel.DEDUPLICATE_COMMUTATIVE and transformer_cls.is_commutative():
            result = self._dedupe_commutative(result)
        yield from result

    @staticmethod
    def _dedupe_commutative(combinations: Iterable[tuple]) -> Iterator[tuple]:
        seen: set = set()
        for combo in combinations:
            canonical = tuple(sorted(combo, key=lambda c: c.name))
            if canonical not in seen:
                seen.add(canonical)
                yield combo
