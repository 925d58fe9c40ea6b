"""Row-local text transformers: extraction, regex counts, string similarity.

The reference delegates similarity kernels to the ``polars_ds`` Rust plugin
(``/root/reference/src/auto_featurs/transformers/text_transformers.py:40-97``);
this engine implements the same measures (Damerau-Levenshtein, char-n-gram
Jaccard, Jaro, Jaro-Winkler) in pure Python/NumPy per batch, verified against
the reference's golden values.  Regex kernels are compiled once per
transformer and reused across batches.
"""

from __future__ import annotations

import math
import re
from abc import ABC
from dataclasses import dataclass
from enum import Enum
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from auto_featurs_ray.base.column_specification import (
    ColumnNameOrSpec,
    ColumnType,
    ColumnTypeSelector,
    parse_column_name,
)
from auto_featurs_ray.transformers.base import RowLocalTransformer

_STRINGY = ColumnTypeSelector(frozenset((ColumnType.TEXT, ColumnType.NOMINAL, ColumnType.ORDINAL)))

# Optional C-speed kernels: rapidfuzz implements the same unrestricted
# Damerau-Levenshtein and Jaro measures; when present (not in this sandbox)
# the O(len^2)/O(len*window) pure-Python DPs below are bypassed.  Jaro-Winkler
# is NOT gated: implementations disagree on the exact boost-threshold
# boundary (> vs >= 0.7), and the reference goldens pin ours.
try:  # pragma: no cover - not installed in the test environment
    from rapidfuzz.distance import DamerauLevenshtein as _rf_dl
    from rapidfuzz.distance import Jaro as _rf_jaro
except ImportError:
    _rf_dl = _rf_jaro = None


# ---------------------------------------------------------------------------
# similarity measures
# ---------------------------------------------------------------------------

def damerau_levenshtein_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (adjacent transpositions)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    inf = la + lb
    # DP with an extra border row/column for the transposition lookback
    score = [[inf] * (lb + 2) for _ in range(la + 2)]
    score[1] = [inf] + list(range(lb + 1))
    for i in range(1, la + 1):
        score[i + 1][1] = i
    last_row: dict = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            last = last_row.get(b[j - 1], 0)
            cost = 0 if a[i - 1] == b[j - 1] else 1
            score[i + 1][j + 1] = min(
                score[i][j] + cost,
                score[i + 1][j] + 1,
                score[i][j + 1] + 1,
                score[last][last_col] + (i - last - 1) + 1 + (j - last_col - 1),
            )
            if cost == 0:
                last_col = j
        last_row[a[i - 1]] = i
    return score[la + 1][lb + 1]


def damerau_levenshtein_similarity(a: str, b: str) -> float:
    longest = max(len(a), len(b))
    if longest == 0:
        return 1.0
    if _rf_dl is not None:  # pragma: no cover
        return _rf_dl.normalized_similarity(a, b)
    return 1.0 - damerau_levenshtein_distance(a, b) / longest


def ngram_set(s: str, n: int) -> set:
    if len(s) < n:
        return set()
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def jaccard_similarity(a: str, b: str, substr_size: int = 2) -> float:
    sa, sb = ngram_set(a, substr_size), ngram_set(b, substr_size)
    union = len(sa | sb)
    if union == 0:
        return 1.0
    return len(sa & sb) / union


def jaro_similarity(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    if _rf_jaro is not None:  # pragma: no cover
        return _rf_jaro.similarity(a, b)
    window = max(la, lb) // 2 - 1
    matched_a = [False] * la
    matched_b = [False] * lb
    matches = 0
    for i in range(la):
        start = max(0, i - window)
        end = min(i + window + 1, lb)
        for j in range(start, end):
            if not matched_b[j] and a[i] == b[j]:
                matched_a[i] = matched_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if matched_a[i]:
            while not matched_b[k]:
                k += 1
            if a[i] != b[k]:
                transpositions += 1
            k += 1
    transpositions //= 2
    return (matches / la + matches / lb + (matches - transpositions) / matches) / 3.0


def jaro_winkler_similarity(a: str, b: str, weight: float = 0.1) -> float:
    jaro = jaro_similarity(a, b)
    if jaro < 0.7:  # standard boost threshold (matches the reference's golden values)
        return jaro
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return jaro + prefix * weight * (1.0 - jaro)


def _pairwise(table: pa.Table, left: str, right: str, fn) -> pa.Array:
    ls = table.column(left).to_pylist()
    rs = table.column(right).to_pylist()
    out = [None if (a is None or b is None) else fn(a, b) for a, b in zip(ls, rs)]
    return pa.array(out, type=pa.float64())


class TextSimilarityTransformer(RowLocalTransformer, ABC):
    _dist_str = ''

    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec, **kwargs: Any) -> None:
        self._left_column = parse_column_name(left_column)
        self._right_column = parse_column_name(right_column)

    def input_type(self):
        return (_STRINGY, _STRINGY)

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._left_column}_{self._dist_str}_text_similarity_{self._right_column}'


class DamerauLevenshteinSimilarityTransformer(TextSimilarityTransformer):
    _dist_str = 'damerau_levenshtein'

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def apply(self, table: pa.Table):
        return _pairwise(table, self._left_column, self._right_column, damerau_levenshtein_similarity)


class JaccardSimilarityTransformer(TextSimilarityTransformer):
    _dist_str = 'jaccard'

    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec,
                 substr_size: int = 2, **kwargs: Any) -> None:
        super().__init__(left_column, right_column)
        self._substr_size = substr_size

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def apply(self, table: pa.Table):
        size = self._substr_size
        return _pairwise(table, self._left_column, self._right_column,
                         lambda a, b: jaccard_similarity(a, b, size))


class JaroSimilarityTransformer(TextSimilarityTransformer):
    _dist_str = 'jaro'

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def apply(self, table: pa.Table):
        return _pairwise(table, self._left_column, self._right_column, jaro_similarity)


class JaroWinklerSimilarityTransformer(TextSimilarityTransformer):
    _dist_str = 'jaro_winkler'

    def __init__(self, left_column: ColumnNameOrSpec, right_column: ColumnNameOrSpec,
                 weight: float = 0.1, **kwargs: Any) -> None:
        super().__init__(left_column, right_column)
        self._weight = weight

    @classmethod
    def is_commutative(cls) -> bool:
        return True

    def apply(self, table: pa.Table):
        weight = self._weight
        return _pairwise(table, self._left_column, self._right_column,
                         lambda a, b: jaro_winkler_similarity(a, b, weight))


class TextSimilarity(Enum):
    DAMERAU_LEVENSHTEIN = DamerauLevenshteinSimilarityTransformer
    JACCARD = JaccardSimilarityTransformer
    JARO = JaroSimilarityTransformer
    JARO_WINKLER = JaroWinklerSimilarityTransformer


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

class TextExtractionTransformer(RowLocalTransformer, ABC):
    def __init__(self, column: ColumnNameOrSpec) -> None:
        self._column = parse_column_name(column)

    def input_type(self) -> ColumnTypeSelector:
        return _STRINGY

    @classmethod
    def is_commutative(cls) -> bool:
        return True


class TextLengthTransformer(TextExtractionTransformer):
    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column}_length_chars'

    def apply(self, table: pa.Table):
        return pc.utf8_length(table.column(self._column))


class EmailDomainExtractionTransformer(TextExtractionTransformer):
    def _return_type(self) -> ColumnType:
        return ColumnType.NOMINAL

    def _output_name(self) -> str:
        return f'{self._column}_email_domain'

    def apply(self, table: pa.Table):
        struct = pc.extract_regex(table.column(self._column), pattern=r'@(?P<domain>.+)$')
        return pc.struct_field(struct, 'domain')


class CharacterEntropyTransformer(TextExtractionTransformer):
    """Shannon entropy (base 2) of each string's character distribution.

    Matches the reference's ``split('') -> unique_counts -> entropy`` chain
    (ref text_transformers.py:141-158); an empty string yields 0.0 (golden:
    pipeline e2e TEXT_FEATURE_3 row 6), null input yields null.
    """

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column}_character_entropy'

    def apply(self, table: pa.Table):
        texts = table.column(self._column).to_pylist()
        n = len(texts)
        # vectorized: one UTF-32 decode of the whole batch -> (row, codepoint)
        # run counts via lexsort -> per-row entropy from sum(c*log2 c)
        lengths = np.fromiter((0 if t is None else len(t) for t in texts), dtype=np.int64, count=n)
        joined = ''.join(t for t in texts if t)
        codes = np.frombuffer(joined.encode('utf-32-le'), dtype=np.uint32)
        row_of = np.repeat(np.arange(n), lengths)
        order = np.lexsort((codes, row_of))
        sr, sc = row_of[order], codes[order]
        run_start = np.concatenate(([True], (sr[1:] != sr[:-1]) | (sc[1:] != sc[:-1]))) \
            if len(sr) else np.zeros(0, bool)
        starts = np.flatnonzero(run_start)
        run_counts = np.diff(np.append(starts, len(sr))).astype(np.float64)
        clogc = run_counts * np.log2(run_counts)
        # sum of c*log2(c) per row over its runs
        run_rows = sr[starts]
        sum_clogc = np.bincount(run_rows, weights=clogc, minlength=n) if len(starts) else np.zeros(n)
        with np.errstate(divide='ignore', invalid='ignore'):
            out = np.where(lengths > 0, np.log2(np.maximum(lengths, 1)) - sum_clogc / np.maximum(lengths, 1),
                           0.0)
        mask = np.fromiter((t is None for t in texts), dtype=bool, count=n)
        return pa.array(out, type=pa.float64(), mask=mask)


class TextExtraction(Enum):
    LENGTH = TextLengthTransformer
    EMAIL_DOMAIN = EmailDomainExtractionTransformer
    CHARACTER_ENTROPY = CharacterEntropyTransformer


# ---------------------------------------------------------------------------
# regex match counting
# ---------------------------------------------------------------------------

class CommonPatterns(Enum):
    DIGITS = r'\d'
    LETTER = r'[A-Za-z]'
    UPPERCASE = r'[A-Z]'
    LOWERCASE = r'[a-z]'
    NON_ALPHANUMERIC = r'[^A-Za-z0-9]'
    WHITESPACE = r'\s'

    CONSECUTIVE_DIGITS = r'\d{3,}'
    CONSECUTIVE_LETTERS = r'[A-Za-z]{5,}'

    SPECIAL_SYMBOLS = r'[!@#$%^&*_=+|~<>]'
    PUNCTUATION = r'[.,;:!?]'

    DOT = r'\.'
    SLASH = r'/'
    AT_SIGN = r'@'
    HYPHEN = r'-'
    UNDERSCORE = r'_'

    NON_ASCII = r'[^\x00-\x7F]'
    ZERO_WIDTH = '[​-‍﻿]'


@dataclass(frozen=True)
class _ResolvedPattern:
    regex: str
    name: str


def _resolve_pattern(pattern) -> _ResolvedPattern:
    if isinstance(pattern, CommonPatterns):
        return _ResolvedPattern(pattern.value, pattern.name.lower())
    if isinstance(pattern, tuple):
        regex, name = pattern
        return _ResolvedPattern(regex, name)
    if isinstance(pattern, str):
        for common in CommonPatterns:
            if common.value == pattern:
                return _ResolvedPattern(common.value, common.name.lower())
        return _ResolvedPattern(pattern, pattern)
    raise TypeError(f'Unsupported pattern type: {type(pattern)}')


class TextCountMatchesTransformer(TextExtractionTransformer):
    def __init__(self, column: ColumnNameOrSpec, pattern) -> None:
        super().__init__(column)
        resolved = _resolve_pattern(pattern)
        self._regex = resolved.regex
        self._human_readable = resolved.name

    def _return_type(self) -> ColumnType:
        return ColumnType.NUMERIC

    def _output_name(self) -> str:
        return f'{self._column}_count_{self._human_readable}'

    def apply(self, table: pa.Table):
        return pc.count_substring_regex(table.column(self._column), pattern=self._regex)


PatternInput = Any
