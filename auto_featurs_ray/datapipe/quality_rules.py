"""Gopher-style document quality rules for training-data curation.

Implements the repetition-free subset of the heuristic document filters
published in the Gopher paper (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", Appendix A.1.1) as one
vectorized ``map_batches`` stage: word-count bounds, mean-word-length bounds,
symbol-to-word ratio, bullet-/ellipsis-line fractions, alphabetic-word
fraction and a required-stop-word containment count, plus the combined
``gopher_pass`` flag.  (The intra-document repetition rules from the same
appendix live in :mod:`auto_featurs_ray.datapipe.decontam`
``RepetitionStats``.)

Every statistic is one Arrow RE2 kernel pass or a bincount over the
flattened token / line layout — no per-row Python in the hot path.  The
class is stateless beyond its config, so it runs as a plain task-based
``map_batches`` stage; at 100 TB the filter is embarrassingly parallel
(per-document, no shuffle).

No counterpart exists in the reference repo (this is LLM-datapipe surface
beyond the reference's transformer catalog).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Gopher's required-word containment list (public, Appendix A.1.1).
GOPHER_STOP_WORDS: Tuple[str, ...] = ('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')

# Same token trim set the other text stages use, so SQL oracles share one rule.
_TRIM_CHARS = '.,;:!?"\'()'


def _per_row_counts(list_array: pa.ListArray, flat_mask, n_rows: int) -> np.ndarray:
    """Sum a boolean mask over the flattened values of ``list_array`` per row."""
    offsets = list_array.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(n_rows), np.diff(offsets))
    weights = np.asarray(flat_mask, dtype=np.float64)
    return np.bincount(row_of, weights=weights, minlength=n_rows)


class GopherRules:
    """Append Gopher quality-rule statistics and pass flags to each batch.

    Emitted columns: ``n_words``, ``mean_word_len``, ``symbol_word_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``stop_word_hits`` (distinct required stop words present) and one boolean
    flag per rule plus the conjunction ``gopher_pass``.  Existing columns with
    the same names are replaced, so the stage is idempotent and composes with
    :class:`auto_featurs_ray.datapipe.textstats.TextStats`.
    """

    def __init__(self, text_column: str = 'text', *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0, max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_line_frac: float = 0.9,
                 max_ellipsis_line_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_word_hits: int = 2,
                 stop_words: Sequence[str] = GOPHER_STOP_WORDS) -> None:
        self.text_column = text_column
        self.min_words, self.max_words = min_words, max_words
        self.min_mean_word_len, self.max_mean_word_len = min_mean_word_len, max_mean_word_len
        self.max_symbol_word_ratio = max_symbol_word_ratio
        self.max_bullet_line_frac = max_bullet_line_frac
        self.max_ellipsis_line_frac = max_ellipsis_line_frac
        self.min_alpha_word_frac = min_alpha_word_frac
        self.min_stop_word_hits = min_stop_word_hits
        self.stop_words = tuple(stop_words)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(self.text_column), '')
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            # dtypes must match the non-empty path or block schemas conflict
            zero_i, zero_f = np.zeros(0, np.int64), np.zeros(0, np.float64)
            return self._append(batch, {
                'n_words': zero_i, 'mean_word_len': zero_f, 'symbol_word_ratio': zero_f,
                'bullet_line_frac': zero_f, 'ellipsis_line_frac': zero_f,
                'alpha_word_frac': zero_f, 'stop_word_hits': zero_i})

        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(col, pattern=r'\s').to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = pc.count_substring_regex(col, pattern=r'\S+').to_numpy(zero_copy_only=False).astype(np.int64)
        # '#' plus non-overlapping '...' / U+2026 runs (Gopher's symbol set)
        n_symbols = pc.count_substring_regex(col, pattern=r'#|\.\.\.|…') \
            .to_numpy(zero_copy_only=False).astype(np.int64)

        with np.errstate(divide='ignore', invalid='ignore'):
            mean_word_len = np.where(n_words > 0, (n_chars - n_ws) / n_words, 0.0)
            symbol_word_ratio = np.where(n_words > 0, n_symbols / n_words, 0.0)

        # line-level fractions over '\n' splits ('' still counts as one line)
        lines = pc.split_pattern(col, pattern='\n')
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat_lines = lines.values
        n_lines = np.diff(lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        bullet = pc.match_substring_regex(flat_lines, pattern=r'^\s*[-*•]')
        ellipsis = pc.match_substring_regex(flat_lines, pattern=r'(\.\.\.|…)\s*$')
        bullet_line_frac = _per_row_counts(lines, bullet, n) / n_lines
        ellipsis_line_frac = _per_row_counts(lines, ellipsis, n) / n_lines

        # word-level: alphabetic fraction + distinct required-stop-word hits.
        # Split on RE2 \s+ (ASCII whitespace), the SAME class n_words counts
        # \S+ runs with — a Unicode-whitespace split would disagree with the
        # denominator on NBSP-like characters and push ratios past 1.0.
        tokens = pc.split_pattern_regex(col, pattern=r'\s+')
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.values
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        alpha = pc.and_(pc.match_substring_regex(flat, pattern='[A-Za-z]'), nonempty)
        with np.errstate(divide='ignore', invalid='ignore'):
            alpha_word_frac = np.where(n_words > 0, _per_row_counts(tokens, alpha, n) / n_words, 0.0)

        trimmed = pc.utf8_trim(pc.utf8_lower(flat), characters=_TRIM_CHARS)
        stop_hits = np.zeros(n, dtype=np.int64)
        for word in self.stop_words:
            present = _per_row_counts(tokens, pc.equal(trimmed, word), n) > 0
            stop_hits += present.astype(np.int64)

        return self._append(batch, {
            'n_words': n_words, 'mean_word_len': mean_word_len,
            'symbol_word_ratio': symbol_word_ratio, 'bullet_line_frac': bullet_line_frac,
            'ellipsis_line_frac': ellipsis_line_frac, 'alpha_word_frac': alpha_word_frac,
            'stop_word_hits': stop_hits})

    def _append(self, batch: pa.Table, stats: dict) -> pa.Table:
        nw = stats['n_words']
        flags = {
            'pass_word_count': (nw >= self.min_words) & (nw <= self.max_words),
            'pass_mean_word_len': (stats['mean_word_len'] >= self.min_mean_word_len)
                                  & (stats['mean_word_len'] <= self.max_mean_word_len),
            'pass_symbol_ratio': stats['symbol_word_ratio'] <= self.max_symbol_word_ratio,
            'pass_bullet_lines': stats['bullet_line_frac'] <= self.max_bullet_line_frac,
            'pass_ellipsis_lines': stats['ellipsis_line_frac'] <= self.max_ellipsis_line_frac,
            'pass_alpha_words': stats['alpha_word_frac'] >= self.min_alpha_word_frac,
            'pass_stop_words': stats['stop_word_hits'] >= self.min_stop_word_hits,
        }
        flags['gopher_pass'] = np.logical_and.reduce(list(flags.values()))
        out = batch
        for name, arr in {**stats, **flags}.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            if arr.dtype == np.bool_:
                out = out.append_column(name, pa.array(arr))
            elif np.issubdtype(arr.dtype, np.integer):
                out = out.append_column(name, pa.array(arr, pa.int64()))
            else:
                out = out.append_column(name, pa.array(arr, pa.float64()))
        return out


def gopher_filter(ds, text_column: str = 'text', **rule_kwargs):
    """Dataset -> Dataset keeping only documents that pass every Gopher rule."""
    rules = GopherRules(text_column, **rule_kwargs)

    def apply(batch: pa.Table) -> pa.Table:
        scored = rules(batch)
        return batch.filter(scored.column('gopher_pass'))

    return ds.map_batches(apply, batch_format='pyarrow', zero_copy_batch=True)
