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


def pack_sequences(ds: ray.data.Dataset, key: str = 'source',
                   id_col: str = 'doc_id', text_col: str = 'text',
                   capacity: int = 256, eos: str = '<eos>',
                   token_rx: str = '[^0-9A-Za-z_]+',
                   num_partitions: 'int | None' = None,
                   small: bool = False) -> ray.data.Dataset:
    """GPT-style sequence PACKING — the combine-side complement of
    :func:`chunk_documents`: within each ``key`` group, documents
    concatenate in ``id_col`` order with one ``eos`` token between them
    (and after the last), and the resulting token stream is cut into
    fixed ``capacity``-token bins.  One output row per (key, bin):
    ``n_tokens`` (== capacity except the final partial bin), ``n_docs``
    (documents STARTING in the bin) and the packed text (tokens joined
    by single spaces — the corpus-wide chunking normalization).

    Physical plan = the sessionize shape: ONE hash-keyed exchange
    co-locates each key's docs (partitioning assumption: one key's token
    stream fits a partition — shard the key upstream if a single source
    exceeds that), then a fully vectorized sorted scan: cumulative token
    offsets give every token its global bin (``offset // capacity``), and
    bins are contiguous after the sort, so assembly is one boundary scan
    + ``ListArray`` + ``binary_join``.  Deterministic on any layout."""
    from ..ops.window import _keyed_blocks

    def scan(t: pa.Table) -> pa.Table:
        ktype = (t.schema.field(key).type if key in t.column_names
                 else pa.string())
        empty = pa.table({key: pa.array([], ktype),
                          'bin_id': pa.array([], pa.int64()),
                          'n_tokens': pa.array([], pa.int64()),
                          'n_docs': pa.array([], pa.int64()),
                          'packed_text': pa.array([], pa.string())})
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        if t.num_rows == 0:
            return empty
        t = t.sort_by([(key, 'ascending'), (id_col, 'ascending')])
        flat, counts = regex_tokens(t[text_col], token_rx)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ndoc = t.num_rows
        kn = t[key].combine_chunks()
        kn_np = kn.to_numpy(zero_copy_only=False)
        # interleave each doc's tokens with one trailing eos: build the
        # combined stream via a gather index over [flat tokens..., eos]
        m = counts + 1  # tokens + eos per doc
        total = int(m.sum())
        doc_of = np.repeat(np.arange(ndoc), m)
        stream_off = np.concatenate(([0], np.cumsum(m)))[:-1]
        within = np.arange(total) - stream_off[doc_of]
        tok_off = np.concatenate(([0], np.cumsum(counts)))[:-1]
        is_eos = within == counts[doc_of]
        gather = np.where(is_eos, len(flat), tok_off[doc_of] + within)
        flat_s = pc.cast(flat, pa.string())
        if isinstance(flat_s, pa.ChunkedArray):
            flat_s = flat_s.combine_chunks()
        vocab = pa.concat_arrays([flat_s, pa.array([eos], pa.string())])
        stream = vocab.take(pa.array(gather))
        # per-key stream positions restart at 0: subtract each key's start
        new_key = np.empty(ndoc, bool)
        new_key[0] = True
        new_key[1:] = kn_np[1:] != kn_np[:-1]
        key_start_doc = np.maximum.accumulate(
            np.where(new_key, np.arange(ndoc), 0))
        key_stream_start = stream_off[key_start_doc]
        pos = np.arange(total) - key_stream_start[doc_of]
        bin_of = pos // capacity
        # bins are contiguous in stream order within each key
        bin_key = key_start_doc[doc_of]  # key-group id per token
        boundary = np.empty(total, bool)
        boundary[0] = True
        boundary[1:] = (bin_of[1:] != bin_of[:-1]) | \
                       (bin_key[1:] != bin_key[:-1])
        starts = np.nonzero(boundary)[0]
        ends = np.append(starts[1:], total)
        n_tokens = (ends - starts).astype(np.int64)
        # docs starting in each bin: map each doc's first stream position
        # to its output row via searchsorted over the bin starts
        row_of_doc = np.searchsorted(starts, stream_off, side='right') - 1
        n_docs = np.bincount(row_of_doc, minlength=len(starts)).astype(np.int64)
        offsets = pa.array(np.append(starts, total).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, stream)
        return pa.table({
            key: kn.take(pa.array(doc_of[starts])),
            'bin_id': pa.array(bin_of[starts].astype(np.int64)),
            'n_tokens': n_tokens,
            'n_docs': n_docs,
            'packed_text': pc.cast(pc.binary_join(lists, ' '), pa.string()),
        })

    return _keyed_blocks(ds.select_columns([key, id_col, text_col]), key,
                         num_partitions, small) \
        .map_batches(scan, batch_format='pyarrow', batch_size=None)
