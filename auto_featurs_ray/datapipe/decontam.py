"""Benchmark decontamination, repetition signals and PII masking.

Three operations every large-scale training-data pipeline needs beyond
near-dup removal:

* :func:`ngram_contamination` — flag documents sharing character n-grams with
  a benchmark/eval set.  The benchmark side is SMALL by nature (eval sets are
  thousands of documents, the corpus is billions), so its gram-hash set is
  broadcast once via ``ray.put`` and each batch does one vectorized
  ``searchsorted`` membership test — zero shuffle, one corpus scan.
* :class:`RepetitionStats` — within-document duplicate n-gram fraction and
  max single-gram repeat (Gopher/RefinedWeb-style quality signals), computed
  batch-wide on one flat gram buffer.
* :class:`PIIMasker` — count + mask emails / IPv4 addresses / phone numbers
  with Arrow RE2 kernels (vectorized ``replace_substring_regex``), patterns
  compiled once per actor.

Gram hashing uses the same 64-bit polynomial as the dedup shinglers
(``dedup._shingle_hashes``); a false gram-hash collision needs ~2^32 distinct
grams per document to become likely and only ever flips one count by one.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: masking patterns, applied in THIS order (fixed order is part of the
#: contract: an email is masked before the phone pattern can eat its digits).
#: RE2 syntax — identical semantics in Arrow kernels and DuckDB.
PII_PATTERNS = (
    ('email', r'[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>'),
    ('ipv4', r'\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>'),
    ('phone', r'(?:\+?\d{1,3}[-. ]?)?[(]?\d{3}[)]?[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>'),
)


def _char_ngram_hashes(texts: Sequence, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(flat gram hashes, per-doc gram counts) for whitespace-normalized,
    lowercased texts.  Grams are windows of Unicode CODEPOINTS (utf-32
    units), not utf-8 bytes — so a character n-gram here corresponds 1:1 to
    ``substr(normalized, i, n)`` in any character-semantics SQL engine, which
    is what the DuckDB oracles compare against.  Documents shorter than ``n``
    characters contribute no grams (NO zero-padding — unlike the dedup
    shingler, a padded gram would fabricate cross-document matches here).
    One flat buffer, n shifted passes; grams are per-POSITION (not
    deduplicated)."""
    from auto_featurs_ray.datapipe.dedup import flat_polynomial_grams
    chunks = []
    for t in texts:
        normalized = ' '.join((t or '').split()).lower()
        chunks.append(np.frombuffer(normalized.encode('utf-32-le'), dtype=np.uint32))
    return flat_polynomial_grams(chunks, n)


def benchmark_gram_set(texts: Sequence, n: int = 8) -> np.ndarray:
    """Sorted unique gram-hash set of a benchmark corpus (the broadcast side)."""
    hashes, _ = _char_ngram_hashes(list(texts), n)
    return np.unique(hashes)


def ngram_contamination(ds, benchmark_texts: Sequence, *, text_column: str,
                        n: int = 8):
    """Append ``contaminated_ngrams`` (gram positions hitting the benchmark
    set) and ``contaminated`` (any hit) per document.

    The benchmark gram set broadcasts once (``ray.put``); each batch is one
    vectorized hash + ``searchsorted`` membership + ``bincount`` — the corpus
    streams through untouched otherwise.
    """
    import ray

    bench = benchmark_gram_set(benchmark_texts, n)
    bench_ref = ray.put(bench)

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        texts = batch.column(text_column).to_pylist()
        hashes, counts = _char_ngram_hashes(texts, n)
        if len(hashes):
            pos = np.searchsorted(bset, hashes)
            hit = (pos < len(bset)) & (bset[np.minimum(pos, len(bset) - 1)] == hashes)
            doc_of = np.repeat(np.arange(len(texts)), counts)
            overlap = np.bincount(doc_of, weights=hit.astype(np.float64),
                                  minlength=len(texts)).astype(np.int64)
        else:
            overlap = np.zeros(len(texts), dtype=np.int64)
        batch = batch.append_column('contaminated_ngrams', pa.array(overlap))
        return batch.append_column('contaminated', pa.array(overlap > 0))

    return ds.map_batches(flag, batch_format='pyarrow', zero_copy_batch=True)


class RepetitionStats:
    """Within-document repetition signals appended per batch:

    * ``total_ngrams`` — gram positions (0 for docs shorter than n)
    * ``distinct_ngrams`` — distinct gram hashes
    * ``dup_ngram_fraction`` — ``1 - distinct/total`` (0.0 when total == 0)
    * ``max_ngram_repeat`` — occurrences of the most repeated gram (0 when
      the doc has no grams)
    """

    def __init__(self, text_column: str = 'text', n: int = 8) -> None:
        self.text_column = text_column
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        m = len(texts)
        hashes, counts = _char_ngram_hashes(texts, self.n)
        total = counts
        distinct = np.zeros(m, dtype=np.int64)
        max_rep = np.zeros(m, dtype=np.int64)
        if len(hashes):
            doc_of = np.repeat(np.arange(m), counts)
            order = np.lexsort((hashes, doc_of))
            sh, sd = hashes[order], doc_of[order]
            first = np.concatenate(([True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])))
            run_ids = np.cumsum(first) - 1
            run_sizes = np.bincount(run_ids)
            distinct = np.bincount(sd[first], minlength=m).astype(np.int64)
            # max run size per doc: maximum.reduceat over runs grouped by doc
            run_docs = sd[first]
            doc_run_starts = np.concatenate(([0], np.flatnonzero(run_docs[1:] != run_docs[:-1]) + 1))
            maxes = np.maximum.reduceat(run_sizes, doc_run_starts)
            max_rep[run_docs[doc_run_starts]] = maxes
        with np.errstate(divide='ignore', invalid='ignore'):
            frac = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0)
        for name, arr in (('total_ngrams', pa.array(total)),
                          ('distinct_ngrams', pa.array(distinct)),
                          ('dup_ngram_fraction', pa.array(frac, pa.float64())),
                          ('max_ngram_repeat', pa.array(max_rep))):
            batch = batch.append_column(name, arr)
        return batch


class PIIMasker:
    """Count and mask PII spans (emails, IPv4, phone numbers).

    Counts come from ``pc.count_substring_regex`` and the masked text from a
    chain of ``pc.replace_substring_regex`` — all RE2 C kernels over the
    whole batch; the pattern order in :data:`PII_PATTERNS` is fixed and part
    of the contract.  Each pattern is counted on the PROGRESSIVELY masked
    text (after the earlier patterns replaced their spans), so counts always
    agree with what ``masked_text`` actually contains — a phone-looking
    digit run inside an email is counted as email only.
    """

    def __init__(self, text_column: str = 'text') -> None:
        self.text_column = text_column
        self.patterns = PII_PATTERNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        masked = pc.fill_null(batch.column(self.text_column), '')
        for name, pattern, replacement in self.patterns:
            count = pc.count_substring_regex(masked, pattern=pattern)
            batch = batch.append_column(f'{name}_count', pc.cast(count, pa.int64()))
            masked = pc.replace_substring_regex(masked, pattern=pattern,
                                                replacement=replacement)
        return batch.append_column('masked_text', masked)
