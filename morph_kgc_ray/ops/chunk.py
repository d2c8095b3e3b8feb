"""Document chunking for training-sequence packing.

Splits each document into fixed-size token windows with a configurable
stride (overlap), the standard prepass before tokenizer packing: a 100-TB
corpus becomes context-window-sized training rows.  Output rows ≫ input
rows — a flat-map-shaped transform, still ONE ``map_batches`` pass per
block with no shuffle (chunks never cross documents, so blocks stay
independent at any scale).

Fully vectorized: RE2 tokenization (``text.regex_tokens``), chunk start
positions and token-gather indices built with numpy arithmetic over the
flat token array, chunk text re-assembled with ``pc.binary_join`` over a
LargeList view — no per-document Python.  Chunk text is the window's
tokens joined by a single space (the documented normalization — token
windows, not byte offsets — which the DuckDB oracle reproduces with
``list_slice`` + ``array_to_string``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .text import regex_tokens


def chunk_documents(ds: ray.data.Dataset, text_col: str = 'text',
                    id_col: str = 'doc_id', window: int = 128,
                    stride: int = 96,
                    token_rx: str = '[^0-9A-Za-z_]+') -> ray.data.Dataset:
    """One output row per (document, chunk): chunk ``c`` covers tokens
    ``[c*stride, c*stride + window)``; the last chunk may be shorter.
    Documents with zero tokens produce no rows.  Emits ``id_col``,
    ``chunk_id``, ``n_chunk_tokens``, ``chunk_text``."""
    if stride <= 0 or window <= 0:
        raise ValueError('window and stride must be positive')

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat, counts = regex_tokens(t[text_col] if n else
                                    pa.array([], pa.large_string()), token_rx)
        nchunks = -(-counts // stride)  # ceil: starts 0, stride, ... < count
        total = int(nchunks.sum())
        ids = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        if not total:
            return pa.table({id_col: ids.take(pa.array([], pa.int64())),
                             'chunk_id': pa.array([], pa.int64()),
                             'n_chunk_tokens': pa.array([], pa.int64()),
                             'chunk_text': pa.array([], flat.type)})
        toff = np.concatenate(([0], np.cumsum(counts)))
        chunk_doc = np.repeat(np.arange(n), nchunks)
        coff = np.concatenate(([0], np.cumsum(nchunks)))
        chunk_id = np.arange(total) - coff[chunk_doc]
        s = chunk_id * stride
        clen = np.minimum(counts[chunk_doc] - s, window)
        # flat-token gather indices: each chunk's [start, start+clen) range
        eoff = np.concatenate(([0], np.cumsum(clen)))
        idx = (np.repeat(toff[chunk_doc] + s, clen)
               + np.arange(int(eoff[-1])) - np.repeat(eoff[:-1], clen))
        vals = flat.take(pa.array(idx, pa.int64()))
        lst = pa.LargeListArray.from_arrays(pa.array(eoff, pa.int64()), vals)
        return pa.table({
            id_col: ids.take(pa.array(chunk_doc, pa.int64())),
            'chunk_id': pa.array(chunk_id, pa.int64()),
            'n_chunk_tokens': pa.array(clen, pa.int64()),
            'chunk_text': pc.binary_join(lst, ' ')})

    return ds.map_batches(fn, batch_format='pyarrow')
