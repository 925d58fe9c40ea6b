"""Document chunking for RAG / training-sequence preparation.

Splits each document into fixed-size character chunks with optional overlap
(stride < chunk size), emitting one output row per chunk with stable
``(id, chunk_index)`` lineage.  This is the standard retrieval/packing prep
stage; at 100 TB it is embarrassingly parallel (per-document, no shuffle)
and the output is strictly larger than the input, so the stage streams —
each batch expands independently and flows on without materialization.

Vectorization: chunk boundaries for a whole batch are computed with offset
arithmetic (no per-document Python loop); the chunk texts themselves are cut
with one ``pyarrow.compute.utf8_slice_codeunits`` call per batch over a
per-start-group gather.  Codepoint (not byte) offsets, so the SQL oracle's
``substr`` replays boundaries 1:1.

No counterpart exists in the reference repo (LLM-datapipe surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(ds, *, text_column: str = 'text', id_column: str = 'doc_id',
                    chunk_chars: int = 512, stride: int | None = None,
                    min_tail_chars: int = 1, keep_columns: tuple = ()):
    """Dataset -> Dataset with one row per chunk.

    Chunks start every ``stride`` codepoints (default: ``chunk_chars``, i.e.
    non-overlapping) and span ``chunk_chars`` codepoints (the last chunk may
    be shorter).  AT MOST ONE trailing chunk is dropped: the final raw chunk
    goes when it is shorter than ``min_tail_chars`` and not the document's
    only chunk (empty/short docs still emit one row, preserving lineage);
    with ``min_tail_chars > stride`` the chunk promoted to last after the
    drop may itself be shorter than ``min_tail_chars`` — the drop is a
    single-pass rule, not a loop.  Output columns: ``(id, chunk_index,
    chunk_text, chunk_start, chunk_len, *keep_columns)``.
    """
    if stride is None:
        stride = chunk_chars
    if chunk_chars <= 0 or stride <= 0:
        raise ValueError('chunk_chars and stride must be positive')
    if min_tail_chars < 1:
        raise ValueError('min_tail_chars must be >= 1')

    def explode(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_column), '')
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        lens = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        # chunks whose start < len qualify; tail-filter below; empty docs get 1
        n_chunks = np.maximum((lens + stride - 1) // stride, 1)
        # drop a short tail (start + min_tail > len) when it isn't chunk 0
        tail_start = (n_chunks - 1) * stride
        short_tail = (n_chunks > 1) & (tail_start + min_tail_chars > lens)
        n_chunks = n_chunks - short_tail.astype(np.int64)

        row_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_index = np.arange(int(n_chunks.sum()), dtype=np.int64) - first[row_of]
        starts = chunk_index * stride
        chunk_len = np.minimum(lens[row_of] - starts, chunk_chars)
        chunk_len = np.maximum(chunk_len, 0)  # empty doc: one zero-length chunk

        # Arrow's utf8_slice_codeunits takes scalar bounds, so slice one
        # distinct chunk position at a time (distinct starts ==
        # ceil(max_len/stride), << rows) and scatter back — still zero
        # per-row Python.  Each group takes its rows straight from ``col``
        # (never a full-text row replicated per chunk), so peak memory per
        # batch is one start-group of documents, not O(len^2 / stride).
        order = np.argsort(starts, kind='stable')
        sorted_starts = starts[order]
        pieces, backrefs = [], []
        for s in np.unique(starts):
            lo = np.searchsorted(sorted_starts, s)
            hi = np.searchsorted(sorted_starts, s, side='right')
            sel = order[lo:hi]
            cut = pc.utf8_slice_codeunits(col.take(pa.array(row_of[sel])),
                                          start=int(s), stop=int(s + chunk_chars))
            pieces.append(cut.combine_chunks() if isinstance(cut, pa.ChunkedArray) else cut)
            backrefs.append(sel)
        if pieces:
            flat = pa.concat_arrays(pieces)
            back = np.concatenate(backrefs)
            inverse = np.empty(len(back), dtype=np.int64)
            inverse[back] = np.arange(len(back))
            chunk_text = flat.take(pa.array(inverse))
        else:
            chunk_text = pa.array([], pa.string())

        cols = {
            id_column: batch.column(id_column).take(pa.array(row_of)),
            'chunk_index': pa.array(chunk_index, pa.int64()),
            'chunk_text': chunk_text,
            'chunk_start': pa.array(starts, pa.int64()),
            'chunk_len': pa.array(chunk_len, pa.int64()),
        }
        for name in keep_columns:
            if name not in cols:
                cols[name] = batch.column(name).take(pa.array(row_of))
        return pa.table(cols)

    return ds.map_batches(explode, batch_format='pyarrow', zero_copy_batch=True)
