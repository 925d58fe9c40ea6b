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
from typing import List, Optional, Tuple

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


def _word_hashes(texts) -> Tuple[np.ndarray, np.ndarray]:
    """(flat 64-bit word hashes, per-doc word counts) for lowercased
    ``[a-z0-9]+`` word runs — RE2-compatible tokenization so a SQL oracle can
    reproduce it with ``regexp_extract_all``.  Hashing is pandas' siphash
    (C-vectorized, deterministic across processes)."""
    import pandas as pd
    import pyarrow.compute as _pc

    col = _pc.fill_null(pa.array(list(texts), pa.string()), '')
    lists = _pc.split_pattern_regex(_pc.utf8_lower(col), pattern='[^a-z0-9]+')
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.values
    nonempty = _pc.greater(_pc.utf8_length(flat), 0)
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(len(texts)), np.diff(offsets))
    keep = np.asarray(nonempty)
    words = flat.filter(nonempty)
    row_of = row_of[keep]
    hashes = pd.util.hash_pandas_object(words.to_pandas(), index=False).to_numpy()
    counts = np.bincount(row_of, minlength=len(texts)).astype(np.int64)
    return hashes.astype(np.uint64), counts


def _word_count_partition(table: pa.Table, _pid: int) -> pa.Table:
    """Per-word-hash counts for one exchange partition — shared reducer for
    the unigram and bigram vocabulary passes (extra columns are ignored)."""
    if table.num_rows == 0 or table.num_columns == 0:
        return pa.table({'w': pa.array([], pa.int64()), 'c': pa.array([], pa.int64())})
    grouped = table.select(['w']).group_by('w').aggregate([('w', 'count')])
    return pa.table({'w': grouped.column('w'), 'c': grouped.column('w_count').cast(pa.int64())})


def corpus_unigram_logprob(ds, *, text_column: str, id_column: str,
                           broadcast_threshold: int = 5_000_000,
                           num_partitions: int = 16):
    """Per-document mean unigram log2-probability under the CORPUS unigram
    distribution (the CCNet-style statistical quality signal: boilerplate and
    gibberish both score far from the corpus mean).

    Two passes:

    1. unigram counts — per-batch partial ``bincount`` over word hashes,
       hash-exchanged and reduced per word (the vocabulary, not the corpus,
       is what's left after this).
    2. scoring — vocabularies up to ``broadcast_threshold`` words broadcast
       once as two sorted arrays (``ray.put``) and each batch scores with one
       ``searchsorted``; larger vocabularies co-group the word-exploded docs
       with the count table on word hash and re-aggregate per doc — nothing
       ever lands on the driver.

    Returns a Dataset ``(id_column, n_words, unigram_logprob)``; documents
    with no words score null.
    """
    import ray
    import ray.data as rd

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    def explode(batch: pa.Table) -> pa.Table:
        hashes, counts = _word_hashes(batch.column(text_column).to_pylist())
        doc_of = np.repeat(np.arange(batch.num_rows), counts)
        return pa.table({'w': pa.array(hashes.view(np.int64)),
                         'doc': batch.column(id_column).take(pa.array(doc_of))})

    # materialized once: the word set feeds the count exchange AND (scale
    # path) the scoring cogroup — without this the corpus would be
    # re-tokenized per consumer; the object store spills it under pressure
    exploded = ds.map_batches(explode, batch_format='pyarrow').materialize()

    counts_ds = shuffle_map_partitions(exploded, ['w'], num_partitions,
                                       _word_count_partition).materialize()
    vocab = counts_ds.count()
    total = float(counts_ds.sum('c') or 0)

    def finish(batch: pa.Table) -> pa.Table:
        # runs AFTER per-doc (sum_log, n) are known; shared by both paths
        n = batch.column('n').to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column('s').to_numpy(zero_copy_only=False)
        with np.errstate(divide='ignore', invalid='ignore'):
            lp = np.where(n > 0, s / n, np.nan)
        return pa.table({id_column: batch.column('doc'),
                         'n_words': pa.array(n.astype(np.int64)),
                         'unigram_logprob': pa.array(lp, mask=~(n > 0))})

    if vocab <= broadcast_threshold:
        tbl = pa.concat_tables(ray.get(counts_ds.to_arrow_refs()), promote_options='permissive')
        w = tbl.column('w').to_numpy(zero_copy_only=False)
        c = tbl.column('c').to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(w)
        handle = ray.put((w[order], np.log2(c[order] / total)))

        def score(batch: pa.Table) -> pa.Table:
            wv, logp = ray.get(handle)
            hashes, counts = _word_hashes(batch.column(text_column).to_pylist())
            pos = np.searchsorted(wv, hashes.view(np.int64))
            # every word is in the vocabulary by construction (same corpus)
            doc_of = np.repeat(np.arange(batch.num_rows), counts)
            s = np.bincount(doc_of, weights=logp[np.minimum(pos, len(wv) - 1)],
                            minlength=batch.num_rows)
            return finish(pa.table({'doc': batch.column(id_column),
                                    'n': pa.array(counts), 's': pa.array(s)}))

        return ds.map_batches(score, batch_format='pyarrow')

    # scale path: co-group exploded words with the count table on word hash
    def attach(word_t: pa.Table, count_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'doc': pa.array([], pa.int64()), 's': pa.array([], pa.float64()),
                          'n': pa.array([], pa.int64())})
        if word_t.num_rows == 0 or word_t.num_columns == 0:
            return empty
        if count_t.num_rows == 0 or count_t.num_columns == 0:
            # both sides derive from the same exploded words under one key
            # hash, so a non-empty word side implies a non-empty count side —
            # but that invariant is non-local; guard rather than index cv[-1]
            return empty
        wv = count_t.column('w').to_numpy(zero_copy_only=False)
        cv = count_t.column('c').to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(wv)
        wv, cv = wv[order], cv[order]
        hw = word_t.column('w').to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wv, hw)
        logp = np.log2(cv[np.minimum(pos, len(wv) - 1)] / total)
        docs = word_t.column('doc').to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(docs, return_inverse=True)
        s = np.bincount(inv, weights=logp)
        n = np.bincount(inv)
        return pa.table({'doc': pa.array(uniq), 's': pa.array(s, pa.float64()),
                         'n': pa.array(n.astype(np.int64))})

    partials = cogroup_map_partitions(exploded, counts_ds, ['w'], num_partitions, attach)

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({id_column: pa.array([], pa.int64()),
                             'n_words': pa.array([], pa.int64()),
                             'unigram_logprob': pa.array([], pa.float64())})
        grouped = table.group_by('doc').aggregate([('s', 'sum'), ('n', 'sum')])
        return finish(pa.table({'doc': grouped.column('doc'),
                                's': grouped.column('s_sum'),
                                'n': grouped.column('n_sum')}))

    scored = shuffle_map_partitions(partials, ['doc'], num_partitions, combine)
    # docs with zero words never exploded: union them back with null scores
    def zeros(batch: pa.Table) -> pa.Table:
        _, counts = _word_hashes(batch.column(text_column).to_pylist())
        empty_mask = counts == 0
        sub = batch.filter(pa.array(empty_mask))
        return pa.table({id_column: sub.column(id_column),
                         'n_words': pa.array(np.zeros(sub.num_rows, np.int64)),
                         'unigram_logprob': pa.nulls(sub.num_rows, pa.float64())})

    return scored.union(ds.map_batches(zeros, batch_format='pyarrow'))


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
        from auto_featurs_ray.datapipe.dedup import flat_polynomial_grams
        raw, gcounts = flat_polynomial_grams(
            [np.frombuffer(bufs[i], dtype=np.uint8) for i in main], k)
        grams = (raw & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
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


def _bigram_hash(prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
    """64-bit mix of two word hashes (engine-internal key only — the SQL
    oracle joins on the word strings themselves, so this hash never needs
    SQL replication; collisions are ~2^-64 per pair)."""
    x = (prev ^ (cur * np.uint64(0x9E3779B97F4A7C15))) + np.uint64(0x2545F4914F6CDD1D)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    return x


def corpus_bigram_logprob(ds, *, text_column: str, id_column: str,
                          lam: float = 0.75, broadcast_threshold: int = 2_000_000,
                          num_partitions: int = 16):
    """Per-document mean log2 of the interpolated bigram probability under
    the CORPUS language model — the CCNet-style perplexity quality filter one
    order up from :func:`corpus_unigram_logprob`.

    Each document position scores ``log2(P)`` with

    * first word: ``P = c(w) / N`` (corpus unigram), and
    * later words: ``P = lam * (c(v,w) / c(v,.)) + (1-lam) * (c(w) / N)``
      (bigram interpolated with the unigram so unseen-in-context words never
      hit -inf; ``c(v,.)`` counts ``v`` as a LEFT context).

    Scale shape mirrors the unigram op: unigram and bigram count tables come
    from hash exchanges over the exploded corpus (the bigram exchange keys on
    the CONTEXT ``v`` so ``c(v,w)`` and ``c(v,.)`` reduce in one task).
    Scoring broadcasts both tables when the bigram vocabulary fits under
    ``broadcast_threshold``; above it the per-position rows chain through two
    cogroups (attach ``c(w)/N`` on the word key, then the bigram probability
    on the bigram key) and a per-doc combine — nothing corpus-sized ever
    lands on the driver.

    Returns ``(id_column, n_words, bigram_logprob)``; zero-word documents
    score null.
    """
    import ray

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    def explode(batch: pa.Table) -> pa.Table:
        """One row per word position: (doc, w, v, first)."""
        hashes, counts = _word_hashes(batch.column(text_column).to_pylist())
        doc_of = np.repeat(np.arange(batch.num_rows), counts)
        starts = np.cumsum(counts) - counts
        first = np.zeros(len(hashes), dtype=bool)
        first[starts[counts > 0]] = True
        prev = np.empty_like(hashes)
        prev[1:] = hashes[:-1]
        prev[first] = 0  # covers position 0 too (every doc start is first)
        return pa.table({
            'w': pa.array(hashes.view(np.int64)),
            'v': pa.array(prev.view(np.int64)),
            'first': pa.array(first),
            'doc': batch.column(id_column).take(pa.array(doc_of)),
        })

    occurrences = ds.map_batches(explode, batch_format='pyarrow').materialize()

    uni_ds = shuffle_map_partitions(occurrences, ['w'], num_partitions,
                                    _word_count_partition).materialize()
    total = float(uni_ds.sum('c') or 0)

    def bigram_probs(table: pa.Table, _pid: int) -> pa.Table:
        """(bh, p_bg) per distinct bigram: keyed on v, so c(v,w) and c(v,.)
        both reduce here; p_bg = c(v,w)/c(v,.) is computed ONCE at the count
        stage so the broadcast and cogroup paths share the same double."""
        empty = pa.table({'bh': pa.array([], pa.int64()), 'p_bg': pa.array([], pa.float64())})
        if table.num_rows == 0 or table.num_columns == 0:
            return empty
        sub = table.filter(pc.invert(table.column('first')))
        if sub.num_rows == 0:
            return empty
        v = sub.column('v').to_numpy(zero_copy_only=False).view(np.uint64)
        w = sub.column('w').to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((w, v))
        v, w = v[order], w[order]
        new_pair = np.concatenate(([True], (v[1:] != v[:-1]) | (w[1:] != w[:-1])))
        pair_id = np.cumsum(new_pair) - 1
        cvw = np.bincount(pair_id).astype(np.float64)
        new_ctx = np.concatenate(([True], (v[1:] != v[:-1])))
        row_ctx = np.cumsum(new_ctx) - 1
        cvdot = np.bincount(row_ctx).astype(np.float64)  # rows per context v
        p_bg = cvw / cvdot[row_ctx[new_pair]]
        return pa.table({'bh': pa.array(_bigram_hash(v[new_pair], w[new_pair]).view(np.int64)),
                         'p_bg': pa.array(p_bg, pa.float64())})

    bigram_ds = shuffle_map_partitions(occurrences, ['v'], num_partitions,
                                       bigram_probs).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column('n').to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch.column('s').to_numpy(zero_copy_only=False)
        with np.errstate(divide='ignore', invalid='ignore'):
            lp = np.where(n > 0, s / n, np.nan)
        return pa.table({id_column: batch.column('doc'),
                         'n_words': pa.array(n.astype(np.int64)),
                         'bigram_logprob': pa.array(lp, mask=~(n > 0))})

    def zeros(batch: pa.Table) -> pa.Table:
        _, counts = _word_hashes(batch.column(text_column).to_pylist())
        sub = batch.filter(pa.array(counts == 0))
        return pa.table({id_column: sub.column(id_column),
                         'n_words': pa.array(np.zeros(sub.num_rows, np.int64)),
                         'bigram_logprob': pa.nulls(sub.num_rows, pa.float64())})

    if bigram_ds.count() <= broadcast_threshold:
        uni_t = pa.concat_tables(ray.get(uni_ds.to_arrow_refs()), promote_options='permissive')
        uw = uni_t.column('w').to_numpy(zero_copy_only=False)
        uc = uni_t.column('c').to_numpy(zero_copy_only=False).astype(np.float64)
        uo = np.argsort(uw)
        big_t = pa.concat_tables(ray.get(bigram_ds.to_arrow_refs()), promote_options='permissive')
        bh = big_t.column('bh').to_numpy(zero_copy_only=False)
        bp = big_t.column('p_bg').to_numpy(zero_copy_only=False)
        bo = np.argsort(bh)
        handle = ray.put((uw[uo], uc[uo] / total, bh[bo], bp[bo]))

        def score(batch: pa.Table) -> pa.Table:
            wv, pw_tab, bhv, pbg_tab = ray.get(handle)
            hashes, counts = _word_hashes(batch.column(text_column).to_pylist())
            doc_of = np.repeat(np.arange(batch.num_rows), counts)
            starts = np.cumsum(counts) - counts
            first = np.zeros(len(hashes), dtype=bool)
            first[starts[counts > 0]] = True
            pw = pw_tab[np.minimum(np.searchsorted(wv, hashes.view(np.int64)), len(wv) - 1)] \
                if len(wv) else np.zeros(len(hashes))
            prev = np.empty_like(hashes)
            prev[1:] = hashes[:-1]
            if len(prev):
                prev[0] = 0
            key = _bigram_hash(prev, hashes).view(np.int64)  # first rows never read it
            pbg = np.zeros(len(hashes))
            if len(bhv):
                pos = np.minimum(np.searchsorted(bhv, key), len(bhv) - 1)
                hit = bhv[pos] == key
                pbg[hit] = pbg_tab[pos[hit]]
            with np.errstate(divide='ignore', invalid='ignore'):
                lp = np.where(first, np.log2(pw), np.log2(lam * pbg + (1.0 - lam) * pw))
            s = np.bincount(doc_of, weights=lp, minlength=batch.num_rows)
            return finish(pa.table({'doc': batch.column(id_column),
                                    'n': pa.array(counts), 's': pa.array(s)}))

        return ds.map_batches(score, batch_format='pyarrow')

    # scale path: two cogroup hops over the per-position rows
    def attach_uni(occ_t: pa.Table, count_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'doc': pa.array([], pa.int64()), 'bh': pa.array([], pa.int64()),
                          'first': pa.array([], pa.bool_()), 'pw': pa.array([], pa.float64())})
        if occ_t.num_rows == 0 or occ_t.num_columns == 0 \
                or count_t.num_rows == 0 or count_t.num_columns == 0:
            return empty
        wv = count_t.column('w').to_numpy(zero_copy_only=False)
        cv = count_t.column('c').to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(wv)
        wv, cv = wv[order], cv[order]
        hw = occ_t.column('w').to_numpy(zero_copy_only=False)
        pw = cv[np.minimum(np.searchsorted(wv, hw), len(wv) - 1)] / total
        v = occ_t.column('v').to_numpy(zero_copy_only=False).view(np.uint64)
        w = hw.view(np.uint64)
        return pa.table({'doc': occ_t.column('doc'),
                         'bh': pa.array(_bigram_hash(v, w).view(np.int64)),
                         'first': occ_t.column('first'),
                         'pw': pa.array(pw, pa.float64())})

    enriched = cogroup_map_partitions(occurrences, uni_ds, ['w'], num_partitions, attach_uni)

    def attach_big(occ_t: pa.Table, big_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'doc': pa.array([], pa.int64()), 's': pa.array([], pa.float64()),
                          'n': pa.array([], pa.int64())})
        if occ_t.num_rows == 0 or occ_t.num_columns == 0:
            return empty
        first = occ_t.column('first').to_numpy(zero_copy_only=False)
        pw = occ_t.column('pw').to_numpy(zero_copy_only=False)
        pbg = np.zeros(occ_t.num_rows)
        if big_t.num_rows and big_t.num_columns:
            bhv = big_t.column('bh').to_numpy(zero_copy_only=False)
            bp = big_t.column('p_bg').to_numpy(zero_copy_only=False)
            order = np.argsort(bhv)
            bhv, bp = bhv[order], bp[order]
            key = occ_t.column('bh').to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(bhv, key), len(bhv) - 1)
            hit = bhv[pos] == key
            pbg[hit] = bp[pos[hit]]
        with np.errstate(divide='ignore', invalid='ignore'):
            lp = np.where(first, np.log2(pw), np.log2(lam * pbg + (1.0 - lam) * pw))
        docs = occ_t.column('doc').to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(docs, return_inverse=True)
        return pa.table({'doc': pa.array(uniq),
                         's': pa.array(np.bincount(inv, weights=lp), pa.float64()),
                         'n': pa.array(np.bincount(inv).astype(np.int64))})

    partials = cogroup_map_partitions(enriched, bigram_ds, ['bh'], num_partitions, attach_big)

    def combine(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({id_column: pa.array([], pa.int64()),
                             'n_words': pa.array([], pa.int64()),
                             'bigram_logprob': pa.array([], pa.float64())})
        grouped = table.group_by('doc').aggregate([('s', 'sum'), ('n', 'sum')])
        return finish(pa.table({'doc': grouped.column('doc'),
                                's': grouped.column('s_sum'),
                                'n': grouped.column('n_sum')}))

    scored = shuffle_map_partitions(partials, ['doc'], num_partitions, combine)
    return scored.union(ds.map_batches(zeros, batch_format='pyarrow'))


def _explode_tf(batch: pa.Table, text_column: str, id_column: str) -> pa.Table:
    """Per-batch (doc_id, w, tf) term-frequency triples over the shared
    lowercased ``[a-z0-9]+`` tokenization (one Arrow group_by per batch)."""
    import pyarrow.compute as _pc

    col = _pc.fill_null(batch.column(text_column).cast(pa.string()), '')
    lists = _pc.split_pattern_regex(_pc.utf8_lower(col), pattern='[^a-z0-9]+')
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.values
    nonempty = _pc.greater(_pc.utf8_length(flat), 0)
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_of = np.repeat(np.arange(batch.num_rows), np.diff(offsets))[np.asarray(nonempty)]
    words = flat.filter(nonempty)
    pairs = pa.table({'doc': batch.column(id_column).take(pa.array(row_of)), 'w': words})
    grouped = pairs.group_by(['doc', 'w']).aggregate([('w', 'count')])
    return pa.table({'doc': grouped.column('doc'), 'w': grouped.column('w'),
                     'tf': grouped.column('w_count').cast(pa.int64())})


def _topk_terms(doc, w, score, k: int, id_column: str) -> pa.Table:
    """Per-doc top-``k`` (score desc, w asc) -> joined term string + best
    score; inputs are aligned arrays covering whole documents."""
    t = pa.table({'doc': doc, 'w': w, 's': score})
    t = t.take(pc.sort_indices(t, sort_keys=[('doc', 'ascending'), ('s', 'descending'),
                                             ('w', 'ascending')]))
    docs = t.column('doc').to_numpy(zero_copy_only=False)
    n = len(docs)
    if n == 0:
        return pa.table({id_column: pa.array([], pa.int64()),
                         'top_terms': pa.array([], pa.string()),
                         'top_score': pa.array([], pa.float64())})
    new_run = np.r_[True, docs[1:] != docs[:-1]]
    starts = np.flatnonzero(new_run)
    lengths = np.diff(np.r_[starts, n])
    rank = np.arange(n) - np.repeat(starts, lengths)
    keep = rank < k
    kept = t.filter(pa.array(keep))
    kept_counts = np.minimum(lengths, k)
    offsets = np.r_[0, np.cumsum(kept_counts)].astype(np.int32)
    terms = pa.ListArray.from_arrays(pa.array(offsets),
                                     kept.column('w').combine_chunks())
    joined = pc.binary_join(terms, ',')
    best = kept.column('s').to_numpy(zero_copy_only=False)[offsets[:-1]]
    return pa.table({id_column: t.column('doc').take(pa.array(starts)),
                     'top_terms': joined, 'top_score': pa.array(best)})


def tfidf_top_terms(ds, *, text_column: str, id_column: str, k: int = 3,
                    broadcast_threshold: int = 5_000_000,
                    num_partitions: int = 16):
    """Top-``k`` TF-IDF terms per document over the corpus vocabulary
    (engine extension; keyword extraction for curation/search).

    ``score(term, doc) = tf * ln((N + 1) / (df + 1))`` with ``N`` the corpus
    document count and ``df`` the term's document frequency; scores are
    rounded to 6 digits (with the repo's 1e-9 half-boundary shift) BEFORE
    ranking so the SQL oracle's libm cannot flip a 1-ulp ordering.  Ties
    break term-ascending.

    Scale shape mirrors :func:`corpus_unigram_logprob`: one (doc, term, tf)
    explode feeds a term-keyed exchange producing the DF table; vocabularies
    up to ``broadcast_threshold`` broadcast as two sorted arrays and each
    batch ranks its own intact documents in one pass, larger vocabularies
    co-group the tf triples with the DF table on term and re-rank per doc
    behind a doc-keyed exchange — the driver never holds corpus text.
    Documents with no ``[a-z0-9]+`` words get null terms/score.
    """
    import ray

    from auto_featurs_ray.engine.runtime import cogroup_map_partitions, shuffle_map_partitions

    tf_ds = ds.map_batches(lambda b: _explode_tf(b, text_column, id_column),
                           batch_format='pyarrow').materialize()

    def df_partition(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({'w': pa.array([], pa.string()), 'df': pa.array([], pa.int64())})
        grouped = table.select(['w']).group_by('w').aggregate([('w', 'count')])
        return pa.table({'w': grouped.column('w'),
                         'df': grouped.column('w_count').cast(pa.int64())})

    df_ds = shuffle_map_partitions(tf_ds, ['w'], num_partitions, df_partition).materialize()
    n_docs = float(ds.count())
    vocab = df_ds.count()

    def score_of(tf: np.ndarray, df: np.ndarray) -> np.ndarray:
        return np.round(tf.astype(np.float64) * np.log((n_docs + 1.0) / (df + 1.0))
                        + 1e-9, 6)

    def nulls_for_wordless(batch: pa.Table) -> pa.Table:
        tf_t = _explode_tf(batch, text_column, id_column)
        have = pc.is_in(batch.column(id_column), value_set=tf_t.column('doc').combine_chunks())
        sub = batch.filter(pc.invert(pc.fill_null(have, False)))
        return pa.table({id_column: sub.column(id_column),
                         'top_terms': pa.nulls(sub.num_rows, pa.string()),
                         'top_score': pa.nulls(sub.num_rows, pa.float64())})

    if vocab <= broadcast_threshold:
        tbl = pa.concat_tables(ray.get(df_ds.to_arrow_refs()), promote_options='permissive')
        words = tbl.column('w').to_numpy(zero_copy_only=False).astype(object)
        dfs = tbl.column('df').to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(words)
        handle = ray.put((words[order], dfs[order]))

        def rank_batch(batch: pa.Table) -> pa.Table:
            wv, dv = ray.get(handle)
            tf_t = _explode_tf(batch, text_column, id_column)
            bw = tf_t.column('w').to_numpy(zero_copy_only=False).astype(object)
            pos = np.searchsorted(wv, bw) if len(wv) else np.zeros(len(bw), np.int64)
            df = dv[np.minimum(pos, max(len(wv) - 1, 0))] if len(wv) else np.zeros(len(bw))
            s = score_of(tf_t.column('tf').to_numpy(zero_copy_only=False), df)
            out = _topk_terms(tf_t.column('doc'), tf_t.column('w'), pa.array(s), k, id_column)
            return pa.concat_tables([out, nulls_for_wordless(batch)],
                                    promote_options='permissive')

        return ds.map_batches(rank_batch, batch_format='pyarrow')

    # scale path: attach df behind a term-keyed cogroup, rank behind a
    # doc-keyed exchange
    def attach(tf_t: pa.Table, df_t: pa.Table, _pid: int) -> pa.Table:
        empty = pa.table({'doc': pa.array([], pa.int64()), 'w': pa.array([], pa.string()),
                          's': pa.array([], pa.float64())})
        if tf_t.num_rows == 0 or tf_t.num_columns == 0 \
                or df_t.num_rows == 0 or df_t.num_columns == 0:
            return empty
        wv = df_t.column('w').to_numpy(zero_copy_only=False).astype(object)
        dv = df_t.column('df').to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(wv)
        wv, dv = wv[order], dv[order]
        bw = tf_t.column('w').to_numpy(zero_copy_only=False).astype(object)
        pos = np.searchsorted(wv, bw)
        s = score_of(tf_t.column('tf').to_numpy(zero_copy_only=False),
                     dv[np.minimum(pos, len(wv) - 1)])
        return pa.table({'doc': tf_t.column('doc'), 'w': tf_t.column('w'),
                         's': pa.array(s)})

    scored = cogroup_map_partitions(tf_ds, df_ds, ['w'], num_partitions, attach)

    def rank_partition(table: pa.Table, _pid: int) -> pa.Table:
        if table.num_rows == 0 or table.num_columns == 0:
            return pa.table({id_column: pa.array([], pa.int64()),
                             'top_terms': pa.array([], pa.string()),
                             'top_score': pa.array([], pa.float64())})
        return _topk_terms(table.column('doc'), table.column('w'), table.column('s'),
                           k, id_column)

    ranked = shuffle_map_partitions(scored, ['doc'], num_partitions, rank_partition)
    return ranked.union(ds.map_batches(nulls_for_wordless, batch_format='pyarrow'))


def bm25_score(ds, *, text_column: str, id_column: str, query_terms: Sequence[str],
               k1: float = 1.2, b: float = 0.75, num_partitions: int = 16):
    """Okapi BM25 relevance of every document against one fixed query term
    set (engine extension; the batch-scoring half of retrieval-based
    curation).

    ``score(d) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1-b+b*|d|/avgdl))``
    with ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` (the Lucene
    non-negative form), ``|d|`` the document's word count and ``avgdl`` the
    corpus mean.  Tokenization is the shared lowercased ``[a-z0-9]+`` run
    split, so a SQL oracle reproduces it with ``regexp_extract_all``.

    Scale shape: document frequencies for the (tiny, fixed) query term set
    reduce from per-batch partials on the driver — O(|query|) state, no
    exchange; doc lengths ride the same pass; scoring is then one
    vectorized broadcast ``map_batches``.  Wordless documents score null.

    Returns a Dataset ``(id_column, n_words, bm25)``.
    """
    import ray

    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError('query_terms must be non-empty')
    term_arr = pa.array(terms, pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        tf_t = _explode_tf(batch, text_column, id_column)
        hit = tf_t.filter(pc.is_in(tf_t.column('w'), value_set=term_arr))
        # df partial: number of docs (rows of tf_t are unique per (doc, w))
        grouped = hit.select(['w']).group_by('w').aggregate([('w', 'count')])
        counts = np.zeros(len(terms), dtype=np.int64)
        idx = np.searchsorted(terms, np.asarray(grouped.column('w').to_pylist(), dtype=object))
        counts[idx] = grouped.column('w_count').to_numpy(zero_copy_only=False)
        n_words = (tf_t.group_by('doc').aggregate([('tf', 'sum')])
                   .column('tf_sum').to_numpy(zero_copy_only=False))
        return pa.table({'state': [pickle.dumps(
            (counts, int(batch.num_rows), float(n_words.sum())))]})

    import pickle
    rows = ds.map_batches(partial, batch_format='pyarrow').take_all()
    df = np.zeros(len(terms), dtype=np.int64)
    n_docs = 0
    total_words = 0.0
    for r in rows:
        c, n, w = pickle.loads(r['state'])
        df += c
        n_docs += n
        total_words += w
    if n_docs == 0:
        raise ValueError('bm25 over an empty dataset')
    avgdl = total_words / n_docs if n_docs else 0.0
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    handle = ray.put((np.asarray(terms, dtype=object), idf))

    def score(batch: pa.Table) -> pa.Table:
        tv, iv = ray.get(handle)
        tf_t = _explode_tf(batch, text_column, id_column)
        ids = batch.column(id_column)
        # doc lengths aligned with the batch rows
        doc_len = np.zeros(batch.num_rows, dtype=np.float64)
        lg = tf_t.group_by('doc').aggregate([('tf', 'sum')])
        pos = pc.index_in(lg.column('doc'), value_set=ids.combine_chunks())
        doc_len[pos.to_numpy(zero_copy_only=False)] = \
            lg.column('tf_sum').to_numpy(zero_copy_only=False)
        hit = tf_t.filter(pc.is_in(tf_t.column('w'), value_set=pa.array(list(tv), pa.string())))
        s = np.zeros(batch.num_rows, dtype=np.float64)
        if hit.num_rows:
            hw = np.asarray(hit.column('w').to_pylist(), dtype=object)
            ti = np.searchsorted(tv, hw)
            hd = pc.index_in(hit.column('doc'), value_set=ids.combine_chunks())
            hd = hd.to_numpy(zero_copy_only=False)
            tf = hit.column('tf').to_numpy(zero_copy_only=False).astype(np.float64)
            dl = doc_len[hd]
            contrib = iv[ti] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            np.add.at(s, hd, contrib)
        wordless = doc_len == 0
        return pa.table({id_column: ids,
                         'n_words': pa.array(doc_len.astype(np.int64)),
                         'bm25': pa.array(np.round(s + 1e-9, 6), mask=wordless)})

    return ds.map_batches(score, batch_format='pyarrow')


def normalize_text(ds, *, text_column: str = 'text', out_column: str = 'text_norm',
                   lowercase: bool = True, collapse_whitespace: bool = True,
                   strip_punctuation: bool = False):
    """CCNet-style text normalization as an explicit stage (the
    preprocessing most dedup/LM-scoring recipes assume): optional lowercase,
    punctuation stripping (ASCII punctuation -> space) and whitespace
    collapse+trim, appended as ``out_column``.  Pure Arrow compute kernels
    (``utf8_lower`` / ``replace_substring_regex``), stateless per batch — no
    shuffle, embarrassingly parallel; SQL replays with ``lower`` +
    ``regexp_replace`` + ``trim``.  Null text stays null.
    """
    import pyarrow.compute as _pc

    def normalize(batch: pa.Table) -> pa.Table:
        col = batch.column(text_column).cast(pa.string())
        if lowercase:
            col = _pc.utf8_lower(col)
        if strip_punctuation:
            col = _pc.replace_substring_regex(col, r'[!-/:-@\[-`{-~]', ' ')
        if collapse_whitespace:
            col = _pc.replace_substring_regex(col, r'\s+', ' ')
            col = _pc.utf8_trim_whitespace(col)
        return batch.append_column(out_column, col)

    return ds.map_batches(normalize, batch_format='pyarrow', zero_copy_batch=True)
