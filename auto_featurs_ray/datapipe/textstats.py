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
        return [fingerprint64(normalized)] if normalized else []
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
        texts = batch.column(self.text_column).to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, np.int64)
        n_words = np.zeros(n, np.int64)
        n_bpe = np.zeros(n, np.int64)
        mean_word_len = np.zeros(n, np.float64)
        punct_ratio = np.zeros(n, np.float64)
        alnum_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        for i, text in enumerate(texts):
            if not text:
                continue
            words = self.word_re.findall(text)
            n_chars[i] = len(text)
            n_words[i] = len(words)
            n_bpe[i] = bpe_token_count(text)
            if words:
                mean_word_len[i] = float(np.mean([len(w) for w in words]))
                lower = [w.lower().strip('.,;:!?"\'()') for w in words]
                stop_ratio[i] = sum(w in self.stopwords for w in lower) / len(words)
            punct_ratio[i] = len(self.punct_re.findall(text)) / len(text)
            alnum_ratio[i] = len(self.alnum_re.findall(text)) / len(text)
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
        texts = batch.column(self.text_column).to_pylist()
        langs = []
        scores = []
        for text in texts:
            words = self.word_re.findall((text or '').lower())[:200]
            if not words:
                langs.append('und')
                scores.append(0.0)
                continue
            best_lang, best = 'und', 0.0
            for lang, profile in self.profiles.items():
                hit = sum(w in profile for w in words) / len(words)
                if hit > best:
                    best_lang, best = lang, hit
            if best < self.min_confidence:
                best_lang = 'und'
            langs.append(best_lang)
            scores.append(best)
        batch = batch.append_column('lang_pred', pa.array(langs, pa.string()))
        return batch.append_column('lang_score', pa.array(scores, pa.float64()))


class Fingerprinter:
    """Exact + winnowing fingerprints per document."""

    def __init__(self, text_column: str = 'text') -> None:
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        exact = pa.array([np.uint64(fingerprint64(t or '')).astype(np.int64) for t in texts], pa.int64())
        sketches = pa.array([winnowing_fingerprints(t or '') for t in texts], pa.list_(pa.int64()))
        batch = batch.append_column('fingerprint', exact)
        return batch.append_column('winnow_sketch', sketches)
