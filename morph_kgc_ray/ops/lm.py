"""Unigram language-model scoring — a CCNet-style corpus-quality signal.

The reference engine (morph-kgc) has no statistical scoring; this belongs
to the training-data-pipeline suite (SURVEY.md §2 LLM-ops).  It is the
repo's one *trainable* operator: pass 1 fits corpus statistics, pass 2
scores every document against them — the same two-pass shape a KenLM /
fastText quality filter has at crawl scale.

Pass 1 (train): per-batch partial token counts (``value_counts`` inside
``map_batches``) followed by ONE vocab-keyed ``groupby().sum()`` — the
shuffle carries vocab-sized partials, never the token stream.  The fitted
model is VOCAB-sized, not corpus-sized; ``vocab_cap`` keeps the top-V
tokens (count desc, token asc tiebreak) and scores everything else with an
out-of-vocabulary floor of count=1, so at 100 TB the broadcast stays a few
hundred MB no matter the corpus.

Pass 2 (score): the model broadcasts once via ``ray.put``; a task-form
kernel with a per-worker-process cache (the web-pipeline idiom) gathers
precomputed per-token scores with one ``pc.index_in`` + numpy take per
batch — no per-row Python, and the stage fuses with the read.

Scores are **fixed-point integers** (micronats): per token
``floor(-ln(count/total) * 1e6)`` computed ONCE per vocab entry with libm
``math.log`` (bit-identical to DuckDB's ``ln`` on the same double), and the
per-document sum is an int64 sum — exact and addition-order-free, so the
oracle hash cannot drift on float summation order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_FP_SCALE = 1_000_000  # micronats


def _flat_tokens(col) -> 'tuple[pa.Array, np.ndarray]':
    """(flat whitespace tokens, tokens per row), mirroring ``token_count``
    and the DuckDB side ``regexp_split_to_array(trim(text), '\\s+')``
    exactly: unicode trim, RE2 split, zero tokens for null/empty/
    whitespace-only rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, ''))
    toks = pc.split_pattern_regex(trimmed, r'\s+')
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    empty = pc.equal(trimmed, '')
    if pc.any(empty).as_py():
        # an empty row still splits to one '' element; internal tokens can
        # never be '' (the text was trimmed first), so dropping zero-length
        # flat entries and zeroing those rows' counts is exact
        flat = flat.filter(pc.greater(pc.binary_length(flat), 0))
        counts[empty.to_numpy(zero_copy_only=False)] = 0
    return flat, counts


def train_unigram(ds: ray.data.Dataset, text_col: str = 'text',
                  vocab_cap: 'int | None' = None,
                  small: bool = False) -> dict:
    """Fit corpus unigram statistics; returns the model dict
    ``{tokens: pa.Array, nll_fp: int64 ndarray, oov_fp: int, total: int}``.

    ``nll_fp[i] = floor(-ln(count_i / total) * 1e6)`` — precomputed here
    (vocab-sized loop, libm log) so scoring is pure integer gather.
    ``small=True`` (plan-time knowledge) combines the vocab-sized partials
    in one task instead of spinning hash-shuffle aggregators."""
    from .agg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(t[text_col])
        vc = flat.value_counts()
        return pa.table({'token': vc.field('values'),
                         'partial': pc.cast(vc.field('counts'), pa.int64())})

    partials = ds.map_batches(partial, batch_format='pyarrow')
    counts = grouped_agg(partials, ['token'], [('partial', 'sum', 'cnt')],
                         small=small)
    vocab_df = counts.to_pandas()  # vocab-sized driver collect (see module doc)
    cnt_col = 'cnt'
    total = int(vocab_df[cnt_col].sum())
    if vocab_cap is not None and len(vocab_df) > vocab_cap:
        vocab_df = vocab_df.sort_values([cnt_col, 'token'],
                                        ascending=[False, True]).head(vocab_cap)
    tokens = vocab_df['token'].to_numpy()
    cnts = vocab_df[cnt_col].to_numpy().astype(np.int64)
    total_f = float(total) if total else 1.0
    # libm math.log per DISTINCT vocab entry (not per token occurrence):
    # bit-identical to DuckDB ln() for the identical exact-division double
    nll_fp = np.fromiter(
        (math.floor(-math.log(int(c) / total_f) * _FP_SCALE) for c in cnts),
        dtype=np.int64, count=len(cnts))
    return {
        'tokens': pa.array(tokens, pa.string()),
        'nll_fp': nll_fp,
        'oov_fp': math.floor(-math.log(1.0 / total_f) * _FP_SCALE),
        'total': total,
    }


class UnigramScoreKernel:
    """Per-batch scorer: tokens -> ``pc.index_in`` against the vocab ->
    int64 gather of precomputed per-token scores -> exact per-doc segment
    sums via one cumsum.  Appends ``n_tokens`` and ``nll_micronats``."""

    def __init__(self, model, text_col: str = 'text'):
        if not isinstance(model, dict):
            model = ray.get(model)
        self.vocab = model['tokens']
        self.nll_fp = model['nll_fp']
        self.oov_fp = np.int64(model['oov_fp'])
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(t[self.text_col])
        idx = pc.index_in(flat, options=pc.SetLookupOptions(value_set=self.vocab))
        idx_np = idx.to_numpy(zero_copy_only=False)
        tok_fp = np.full(len(idx_np), self.oov_fp, dtype=np.int64)
        if idx_np.dtype.kind == 'f':  # nulls (OOV) came back as NaN
            valid = ~np.isnan(idx_np)
            tok_fp[valid] = self.nll_fp[idx_np[valid].astype(np.int64)]
        else:
            tok_fp = self.nll_fp[idx_np]
        csum = np.concatenate([np.zeros(1, np.int64), np.cumsum(tok_fp)])
        ends = np.cumsum(counts)
        nll = csum[ends] - csum[ends - counts]
        return (t.append_column('n_tokens', pa.array(counts, pa.int64()))
                 .append_column('nll_micronats', pa.array(nll, pa.int64())))


_KERNEL_CACHE: dict = {}


def _score_fn(model_ref, text_col: str):
    """Task-form wrapper with a per-worker-process kernel cache: the model
    is fetched from the object store once per process (broadcast, not
    re-shipped per batch) and the stage stays a fusable task."""
    key = (model_ref.hex(), text_col)

    def fn(t: pa.Table) -> pa.Table:
        kernel = _KERNEL_CACHE.get(key)
        if kernel is None:
            kernel = UnigramScoreKernel(model_ref, text_col)
            _KERNEL_CACHE[key] = kernel
        return kernel(t)
    return fn


def unigram_lm_score(ds: ray.data.Dataset, text_col: str = 'text',
                     vocab_cap: 'int | None' = None,
                     model: 'dict | None' = None,
                     small: bool = False) -> ray.data.Dataset:
    """Two-pass unigram LM quality score: train (unless a fitted ``model``
    is passed) then append ``n_tokens`` + ``nll_micronats`` per document.
    Mean NLL in nats is ``nll_micronats / n_tokens / 1e6``; perplexity is
    ``exp`` of that — both monotone in the returned integers, which stay
    exact for the oracle hash."""
    if model is None:
        model = train_unigram(ds, text_col, vocab_cap, small=small)
    return ds.map_batches(_score_fn(ray.put(model), text_col),
                          batch_format='pyarrow')
