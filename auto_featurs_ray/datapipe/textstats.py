"""Text analysis stages for large-scale training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex) and document
fingerprinting (rolling hash + winnowing).  Each is a callable CLASS meant for
``ds.map_batches(Cls, batch_format='pyarrow', concurrency=N)`` — regexes and
profiles compile once per actor in ``__init__``, work happens vectorized per
batch.
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Minimal high-frequency stopword profiles (public common-word lists).
_LANG_PROFILES = {
    'en': {'the', 'and', 'of', 'to', 'a', 'in', 'is', 'that', 'it', 'for', 'was', 'with', 'on', 'as', 'are'},
    'de': {'der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'mit', 'von', 'den', 'zu', 'sich', 'auf', 'für'},
    'fr': {'le', 'la', 'les', 'et', 'de', 'des', 'est', 'une', 'un', 'que', 'pour', 'dans', 'qui', 'pas'},
    'es': {'el', 'la', 'los', 'las', 'de', 'que', 'y', 'en', 'un', 'una', 'es', 'por', 'con', 'para'},
    'it': {'il', 'la', 'di', 'che', 'e', 'un', 'una', 'per', 'non', 'sono', 'con', 'del', 'si', 'le'},
    'nl': {'de', 'het', 'een', 'en', 'van', 'is', 'dat', 'op', 'te', 'zijn', 'met', 'voor', 'niet'},
}

_WORD_RE = re.compile(r'\S+')
# BPE-ish pre-tokenizer: contractions, words, numbers, punctuation runs (GPT-2 style, public)
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")
_PUNCT_RE = re.compile(r'[.,;:!?]')
_ALNUM_RE = re.compile(r'[A-Za-z0-9]')


def whitespace_token_count(text: str) -> int:
    return len(_WORD_RE.findall(text))


def bpe_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


def fingerprint64(text: str) -> int:
    """64-bit FNV-1a of the whitespace-normalized text (exact-dup fingerprint)."""
    normalized = ' '.join(text.split()).lower()
    h = 0xcbf29ce484222325
    for byte in normalized.encode('utf-8'):
        h = ((h ^ byte) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def winnowing_fingerprints(text: str, k: int = 8, window: int = 4) -> List[int]:
    """Winnowing (Schleimer et al. 2003): min hash per sliding window of k-gram
    rolling hashes — a compact document sketch for near-dup detection."""
    normalized = ' '.join(text.split()).lower()
    data = np.frombuffer(normalized.encode('utf-8'), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        # int64 view (not the raw unsigned value): the sketch column is
        # list<int64>, and an unsigned fingerprint > 2^63 cannot be stored
        return [int(np.uint64(fingerprint64(normalized)).astype(np.int64))] if normalized else []
    # vectorized polynomial k-gram hash mod 2^64 (deterministic across processes)
    powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    grams = (np.lib.stride_tricks.sliding_window_view(data, k) * powers).sum(axis=1)
    grams = (grams & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    if len(grams) <= window:
        return [int(grams.min())]
    mins = np.lib.stride_tricks.sliding_window_view(grams, window).min(axis=1)
    return sorted(int(v) for v in np.unique(mins))


class TextStats:
    """Per-document quality/statistics columns appended to the batch."""

    def __init__(self, text_column: str = 'text', stopwords: Optional[set] = None) -> None:
        self.text_column = text_column
        self.stopwords = stopwords or _LANG_PROFILES['en']
        self.word_re = _WORD_RE
        self.punct_re = _PUNCT_RE
        self.alnum_re = _ALNUM_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_column)
        col = pc.fill_null(col, '')
        n = len(col)
        # Arrow RE2 kernels: every count below is one vectorized C pass
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_words = pc.count_substring_regex(col, pattern=r'\S+').to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = pc.count_substring_regex(col, pattern=r'\s').to_numpy(zero_copy_only=False).astype(np.int64)
        n_punct = pc.count_substring_regex(col, pattern=r'[.,;:!?]').to_numpy(zero_copy_only=False)
        n_alnum = pc.count_substring_regex(col, pattern=r'[A-Za-z0-9]').to_numpy(zero_copy_only=False)
        # mean word length == (non-whitespace chars) / word count
        with np.errstate(divide='ignore', invalid='ignore'):
            mean_word_len = np.where(n_words > 0, (n_chars - n_ws) / n_words, 0.0)
            punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
            alnum_ratio = np.where(n_chars > 0, n_alnum / n_chars, 0.0)
        # stopword ratio: split -> lower -> trim -> hashed set membership,
        # summed per row with one bincount over the flattened token layout
        tokens = pc.utf8_split_whitespace(col).combine_chunks()
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.chunk(0) if tokens.num_chunks else pa.array([], pa.list_(pa.string()))
        flat = tokens.values
        trimmed = pc.utf8_trim(pc.utf8_lower(flat), characters='.,;:!?"\'()')
        is_stop = pc.is_in(trimmed, value_set=pa.array(sorted(self.stopwords)))
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        row_of = np.repeat(np.arange(n), np.diff(offsets))
        stop_hits = np.bincount(row_of, weights=np.asarray(pc.and_(is_stop, nonempty)).astype(np.float64),
                                minlength=n)
        with np.errstate(divide='ignore', invalid='ignore'):
            stop_ratio = np.where(n_words > 0, stop_hits / n_words, 0.0)
        # BPE-ish count: the pattern needs lookahead (unsupported by RE2), so
        # this one stays a compiled-Python finditer
        texts = col.to_pylist()
        n_bpe = np.fromiter((sum(1 for _ in _BPE_RE.finditer(t)) if t else 0 for t in texts),
                            dtype=np.int64, count=n)
        quality = np.clip(
            0.3 * np.clip(n_words / 100.0, 0, 1)
            + 0.3 * stop_ratio * 2.0
            + 0.2 * alnum_ratio
            + 0.2 * np.clip(mean_word_len / 8.0, 0, 1),
            0.0, 1.0)
        for name, arr in (('n_chars_computed', n_chars), ('n_words', n_words), ('n_tokens_bpe', n_bpe),
                          ('mean_word_len', mean_word_len), ('punct_ratio', punct_ratio),
                          ('alnum_ratio', alnum_ratio), ('stopword_ratio', stop_ratio),
                          ('quality_score', quality)):
            batch = batch.append_column(name, pa.array(arr))
        return batch


class LanguageId:
    """Stopword-profile language heuristic: argmax profile hit-rate, 'und' below floor."""

    def __init__(self, text_column: str = 'text', min_confidence: float = 0.05) -> None:
        self.text_column = text_column
        self.min_confidence = min_confidence
        self.word_re = re.compile(r"[a-zà-ÿäöüß']+")
        self.profiles = {lang: words for lang, words in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(self.text_column), '')
        n = len(col)
        # tokens = maximal runs of profile-alphabet chars; realized by
        # splitting the lowercased text on everything else (empties dropped)
        lowered = pc.utf8_lower(col)
        tokens = pc.split_pattern_regex(lowered, pattern=r"[^a-zà-ÿäöüß']+").combine_chunks()
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.chunk(0) if tokens.num_chunks else pa.array([], pa.list_(pa.string()))
        flat = tokens.values
        valid = np.asarray(pc.greater(pc.utf8_length(flat), 0))
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offsets)
        row_of = np.repeat(np.arange(n), counts)
        # cap at the first 200 valid tokens per row, like the per-doc loop did
        cum_valid = np.cumsum(valid)
        valid_before = np.concatenate(([0], cum_valid))  # exclusive prefix, len+1
        rank = cum_valid - np.repeat(valid_before[offsets[:-1]], counts)
        keep = valid & (rank <= 200)
        words_per_row = np.bincount(row_of, weights=keep.astype(np.float64), minlength=n) if len(flat) \
            else np.zeros(n)
        ratios = np.zeros((len(self.profiles), n))
        for li, (lang, profile) in enumerate(self.profiles.items()):
            hit = np.asarray(pc.is_in(flat, value_set=pa.array(sorted(profile)))) & keep
            hits = np.bincount(row_of, weights=hit.astype(np.float64), minlength=n) if len(flat) \
                else np.zeros(n)
            with np.errstate(divide='ignore', invalid='ignore'):
                ratios[li] = np.where(words_per_row > 0, hits / words_per_row, 0.0)
        best_idx = np.argmax(ratios, axis=0) if n else np.zeros(0, np.int64)
        best = ratios[best_idx, np.arange(n)] if n else np.zeros(0)
        names = np.asarray(list(self.profiles), dtype=object)
        langs = np.where((best >= self.min_confidence) & (best > 0), names[best_idx], 'und')
        batch = batch.append_column('lang_pred', pa.array(langs.astype(object), pa.string()))
        return batch.append_column('lang_score', pa.array(best, pa.float64()))


def winnowing_fingerprints_batch(texts, k: int = 8, window: int = 4) -> pa.ListArray:
    """Winnowing sketches for a whole batch, bit-identical per row to
    :func:`winnowing_fingerprints`, vectorized across documents: one flat
    byte buffer, k-gram polynomial hashes in k shifted passes, window minima
    as a 4-way ``np.minimum.reduce`` over global shifts (cross-document
    windows excluded by per-doc index gathering), per-doc sorted-unique via
    one lexsort."""
    normalized = [' '.join((t or '').split()).lower() for t in texts]
    bufs = [s.encode('utf-8') for s in normalized]
    n = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    per_doc: list = [None] * n

    short = lens < k
    for i in np.flatnonzero(short):
        per_doc[i] = (np.array([np.uint64(fingerprint64(normalized[i])).astype(np.int64)])
                      if normalized[i] else np.empty(0, dtype=np.int64))

    main = np.flatnonzero(~short)
    if len(main):
        mlens = lens[main]
        flat = np.frombuffer(b''.join(bufs[i] for i in main), dtype=np.uint8).astype(np.uint64)
        starts = np.concatenate(([0], np.cumsum(mlens)[:-1]))
        powers = np.full(k, 0x100000001b3, dtype=np.uint64) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        grams_all = np.zeros(len(flat) - k + 1, dtype=np.uint64)
        for j in range(k):
            grams_all += flat[j:len(flat) - k + 1 + j] * powers[j]
        gcounts = mlens - k + 1
        valid = np.concatenate([np.arange(s, s + c) for s, c in zip(starts, gcounts)])
        grams = (grams_all[valid] & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        gstarts = np.concatenate(([0], np.cumsum(gcounts)[:-1]))

        small = gcounts <= window
        for pos in np.flatnonzero(small):
            seg = grams[gstarts[pos]:gstarts[pos] + gcounts[pos]]
            per_doc[main[pos]] = np.array([seg.min()], dtype=np.int64)

        big = np.flatnonzero(~small)
        if len(big):
            # pairwise np.minimum chain: reduce() over a list would first
            # stack a (window, N) copy
            shifted = [grams[j:len(grams) - window + 1 + j] for j in range(window)]
            mins_all = np.minimum(np.minimum(shifted[0], shifted[1]),
                                  np.minimum(shifted[2], shifted[3])) if window == 4 else \
                __import__('functools').reduce(np.minimum, shifted)
            wcounts = gcounts[big] - window + 1
            widx = np.concatenate([np.arange(gstarts[pos], gstarts[pos] + wc)
                                   for pos, wc in zip(big, wcounts)])
            mins = mins_all[widx]
            doc_of = np.repeat(np.arange(len(big)), wcounts)
            order = np.lexsort((mins, doc_of))
            sm, sd = mins[order], doc_of[order]
            first = np.concatenate(([True], (sd[1:] != sd[:-1]) | (sm[1:] != sm[:-1])))
            sm, sd = sm[first], sd[first]
            bounds = np.concatenate(([0], np.flatnonzero(sd[1:] != sd[:-1]) + 1, [len(sd)]))
            for bi, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                per_doc[main[big[sd[s]]]] = sm[s:e]

    lengths = np.fromiter((len(a) for a in per_doc), dtype=np.int64, count=n)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    values = np.concatenate(per_doc) if n else np.empty(0, dtype=np.int64)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                    pa.array(values, pa.int64()))


def fnv1a64_batch(texts) -> np.ndarray:
    """Vectorized 64-bit FNV-1a of whitespace-normalized lowercased texts.

    Bit-identical to :func:`fingerprint64` per row.  FNV is sequential per
    document, so vectorization runs across documents by byte position: one
    numpy gather + xor-multiply pass per position, over the still-active
    (long-enough) docs only.  ~max_len passes total, each C-speed over the
    whole batch — vs the per-byte Python loop this replaces.
    """
    bufs = [(' '.join((t or '').split()).lower()).encode('utf-8') for t in texts]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    total = int(lens.sum())
    flat = np.frombuffer(b''.join(bufs), dtype=np.uint8) if total else np.empty(0, np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.empty(0, np.int64)
    h = np.full(len(bufs), 0xcbf29ce484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001b3)
    active = np.flatnonzero(lens > 0)
    pos = 0
    while len(active):
        b = flat[starts[active] + pos].astype(np.uint64)
        h[active] = (h[active] ^ b) * prime  # uint64 arithmetic wraps mod 2^64
        pos += 1
        active = active[lens[active] > pos]
    return h.view(np.int64)


class Fingerprinter:
    """Exact + winnowing fingerprints per document.

    The exact ``fingerprint`` column is 64-bit FNV-1a of the
    whitespace-normalized, lowercased text — the same documented hash family
    as :func:`fingerprint64` (bit-identical per row), vectorized across the
    batch by :func:`fnv1a64_batch`.  A library hash (pandas siphash) was
    deliberately NOT used here: persisted fingerprints must stay comparable
    across runs and dependency upgrades, so the hash family is pinned to
    this repo's own implementation.
    """

    def __init__(self, text_column: str = 'text') -> None:
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        exact = pa.array(fnv1a64_batch(texts))
        sketches = winnowing_fingerprints_batch(texts)
        batch = batch.append_column('fingerprint', exact)
        return batch.append_column('winnow_sketch', sketches)
