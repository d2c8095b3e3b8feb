"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` stages over Arrow batches:
no per-row Python in hot paths except cryptographic hashing (C-backed).
Designed for the ``documents`` table shape (doc_id:int64, text:string,
lang:string, source:string, n_chars:int64) but parameterized by column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# --------------------------------------------------------------------------
# token counting
# --------------------------------------------------------------------------

_BPEISH_RX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(ds: ray.data.Dataset, text_col: str = 'text', out_col: str = 'n_tokens',
                mode: str = 'whitespace') -> ray.data.Dataset:
    """Adds a token count column.  mode='whitespace' splits on runs of
    whitespace; mode='bpeish' counts letter-runs / digit-runs / punctuation
    (a cheap BPE-ish pre-tokenizer)."""

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if mode == 'whitespace':
            trimmed = pc.utf8_trim_whitespace(col)
            counts = pc.list_value_length(pc.split_pattern_regex(trimmed, r'\s+'))
            counts = pc.if_else(pc.equal(trimmed, ''), pa.scalar(0, pa.int64()),
                                pc.cast(counts, pa.int64()))
        else:
            counts = pc.cast(pc.count_substring_regex(col, _BPEISH_RX), pa.int64())
        return t.append_column(out_col, counts)

    return ds.map_batches(fn, batch_format='pyarrow')


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# applied IN ORDER, each pattern over the previous pattern's output (emails
# first so their digits never half-match the looser phone pattern; IPs
# before phones for the same reason)
PII_PATTERNS = (
    ('email', r'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>'),
    ('ipv4', r'\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>'),
    ('phone', r'\+?[0-9][0-9() \-]{6,}[0-9]', '<PHONE>'),
)


def redact_pii(ds: ray.data.Dataset, text_col: str = 'text',
               out_col: str = 'text_redacted',
               patterns=PII_PATTERNS, counts: bool = True) -> ray.data.Dataset:
    """Training-corpus PII scrubbing: sequential vectorized re2 passes
    replacing each pattern with its placeholder; ``counts=True`` adds an
    ``n_<name>`` match-count column per pattern (counted on the text as it
    stood BEFORE that pattern's replacement — the sequential semantics the
    SQL oracle mirrors with nested regexp_replace)."""

    def fn(t: pa.Table) -> pa.Table:
        col = pc.fill_null(t[text_col], '')
        for name, rx, repl in patterns:
            if counts:
                t = t.append_column(
                    f'n_{name}', pc.cast(pc.count_substring_regex(col, rx), pa.int64()))
            col = pc.replace_substring_regex(col, rx, repl)
        return t.append_column(out_col, col)

    return ds.map_batches(fn, batch_format='pyarrow')


# --------------------------------------------------------------------------
# paragraph-level boilerplate detection (CCNet-style)
# --------------------------------------------------------------------------

def paragraph_counts(ds: ray.data.Dataset, text_col: str = 'text',
                     sep: str = '\n', min_count: int = 2,
                     small: bool = False) -> ray.data.Dataset:
    """Cross-corpus repeated-paragraph detection: explode each document
    into paragraphs (vectorized split + flatten — one output row per
    paragraph), aggregate occurrence counts with block-local partials
    (ops.agg), keep paragraphs appearing >= ``min_count`` times.  The
    classic boilerplate-removal prepass (nav bars, cookie banners,
    newsletter footers repeat across pages; prose does not)."""
    from .agg import grouped_agg

    def explode(t: pa.Table) -> pa.Table:
        paras = pc.split_pattern(pc.fill_null(t[text_col], ''), sep)
        return pa.table({'paragraph': pc.list_flatten(paras)})

    agg = grouped_agg(ds.map_batches(explode, batch_format='pyarrow'),
                      ['paragraph'], [(None, 'count', 'n_occurrences')],
                      small=small)
    if min_count <= 1:
        return agg

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t['n_occurrences'],
                                         pa.scalar(min_count, pa.int64())))

    return agg.map_batches(keep, batch_format='pyarrow')


# --------------------------------------------------------------------------
# quality scoring
# --------------------------------------------------------------------------

def _class_luts():
    """256-entry byte LUTs replicating the RE2 character classes the quality
    heuristic counts — RE2's Perl classes are ASCII-only (\\w = [0-9A-Za-z_],
    \\s = [\\t\\n\\f\\r ]), so byte classification is EXACT on the utf8
    buffer: ASCII bytes classify directly, a non-ASCII lead byte (>= 0xC0)
    is one codepoint that is neither \\w nor \\s (it matches [^\\w\\s]), and
    continuation bytes (0x80-0xBF) are not codepoint starts."""
    luts = np.zeros((5, 256), dtype=np.int64)  # chars, punct, upper, digit, space
    w = set(b'0123456789_') | set(range(ord('a'), ord('z') + 1)) \
        | set(range(ord('A'), ord('Z') + 1))
    s = set(b'\t\n\f\r ')
    for b in range(0x80):
        luts[0, b] = 1
        luts[1, b] = int(b not in w and b not in s)
        luts[2, b] = int(ord('A') <= b <= ord('Z'))
        luts[3, b] = int(ord('0') <= b <= ord('9'))
        luts[4, b] = int(b in s)
    for b in range(0xC0, 256):  # non-ASCII codepoint start
        luts[0, b] = 1
        luts[1, b] = 1
    return luts


_CLASS_LUTS = _class_luts()

_CLASS_NAMES = ('n_chars', 'n_punct', 'n_upper', 'n_digit', 'n_space')

# Packed LUTs: all five class indicators in ONE int64 per byte, so the five
# per-row counts come out of a SINGLE gather + a SINGLE per-row segment sum
# (np.add.reduceat) instead of five full-buffer int64 cumsums (~7x less
# memory traffic on the hot path).  Field-overflow safety: reduceat sums
# WITHIN one row only, and every field's per-row sum is bounded by the row's
# byte length, so 12-bit fields are exact for rows < 4 KiB and 21-bit fields
# for rows < 2 MiB; longer rows fall back to the cumsum path below.
_PACK12 = (_CLASS_LUTS[0] | (_CLASS_LUTS[1] << 12) | (_CLASS_LUTS[2] << 24)
           | (_CLASS_LUTS[3] << 36) | (_CLASS_LUTS[4] << 48))
_PACK21A = (_CLASS_LUTS[0] | (_CLASS_LUTS[1] << 21) | (_CLASS_LUTS[2] << 42))
_PACK21B = (_CLASS_LUTS[3] | (_CLASS_LUTS[4] << 21))


def _segment_sums(vals: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-row sums of ``vals`` over [offs[i], offs[i+1]).  reduceat quirks
    handled: an empty segment returns vals[idx] instead of 0 (zeroed
    afterwards), and an index == len(vals) is rejected — trailing empty
    rows start exactly there, so the reduceat covers only rows up to the
    first EOF-offset row and the rest zero-fill (clipping those indices
    instead would silently truncate the last non-empty row's segment)."""
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.int64)
    if len(vals) == 0 or n == 0:
        return out
    m = int(np.searchsorted(offs[:-1], len(vals)))  # rows m.. start at EOF
    if m:
        s = np.add.reduceat(vals, offs[:m])
        s[offs[1:m + 1] == offs[:m]] = 0
        out[:m] = s
    return out


def char_class_counts(col) -> 'dict[str, np.ndarray]':
    """Per-row codepoint/punct/upper/digit/space counts over a string column
    in ONE pass over the raw utf8 buffer (replaces four re2 scans; exact
    per the _class_luts semantics proof).  Returns int64 numpy arrays."""
    arr = pc.fill_null(col, '')
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b'', dtype=np.uint8)[
        offs[0]:offs[-1]]
    offs = offs - offs[0]
    max_len = int(np.diff(offs).max()) if len(offs) > 1 else 0
    if max_len < (1 << 12):
        s = _segment_sums(_PACK12[data], offs)
        return {name: (s >> (12 * i)) & 0xFFF
                for i, name in enumerate(_CLASS_NAMES)}
    if max_len < (1 << 21):
        sa = _segment_sums(_PACK21A[data], offs)
        sb = _segment_sums(_PACK21B[data], offs)
        return {'n_chars': sa & 0x1FFFFF, 'n_punct': (sa >> 21) & 0x1FFFFF,
                'n_upper': (sa >> 42) & 0x1FFFFF, 'n_digit': sb & 0x1FFFFF,
                'n_space': (sb >> 21) & 0x1FFFFF}
    out = {}
    for i, name in enumerate(_CLASS_NAMES):
        # cumsum + gather is reduceat without its empty-segment quirk; kept
        # as the (rare) >=2 MiB-row fallback — per-field sums there could
        # overflow any packed width
        csum = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(_CLASS_LUTS[i][data], out=csum[1:])
        out[name] = csum[offs[1:]] - csum[offs[:-1]]
    return out


def quality_score_np(counts: 'dict[str, np.ndarray]') -> np.ndarray:
    """1 - min(1, (punct + digit + 0.5*upper) / max(chars, 1)) — float64 ops
    in the same association order as the previous pyarrow expression (and
    the SQL oracle), so results are bit-identical."""
    nz = np.maximum(counts['n_chars'], 1).astype(np.float64)
    mix = (counts['n_punct'].astype(np.float64) + counts['n_digit'].astype(np.float64)) \
        + counts['n_upper'].astype(np.float64) * 0.5
    return 1.0 - np.minimum(1.0, mix / nz)


def quality_stats(ds: ray.data.Dataset, text_col: str = 'text') -> ray.data.Dataset:
    """Adds length/punctuation/uppercase/digit counts and a simple
    quality_score in [0,1] (heuristics typical of web-corpus filtering)."""

    def fn(t: pa.Table) -> pa.Table:
        c = char_class_counts(t[text_col])
        nz = np.maximum(c['n_chars'], 1).astype(np.float64)
        score = 1.0 - np.minimum(
            1.0, (c['n_punct'] / nz + c['n_digit'] / nz) + (c['n_upper'] / nz) * 0.5)
        t = t.append_column('n_chars_computed', pa.array(c['n_chars']))
        t = t.append_column('n_punct', pa.array(c['n_punct']))
        t = t.append_column('n_upper', pa.array(c['n_upper']))
        t = t.append_column('n_digit', pa.array(c['n_digit']))
        t = t.append_column('n_space', pa.array(c['n_space']))
        return t.append_column('quality_score', pa.array(score))

    return ds.map_batches(fn, batch_format='pyarrow')


def quality_filter(ds: ray.data.Dataset, text_col: str = 'text', lang_col: str = 'lang',
                   min_score: float = 0.8, min_tokens: int = 5,
                   langs: 'tuple | list | None' = None) -> ray.data.Dataset:
    """Pre-training corpus filter: language allowlist + heuristic quality
    score threshold + minimum token count, all inside one vectorized
    map_batches (filters compose into a single mask; rows never leave the
    task).  The score is the same punctuation/digit/uppercase-density
    heuristic as ``quality_stats``."""
    lang_set = list(langs) if langs else None

    def fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        score = pa.array(quality_score_np(char_class_counts(col)))
        trimmed = pc.utf8_trim_whitespace(col)
        n_tok = pc.if_else(pc.equal(trimmed, ''), pa.scalar(0, pa.int64()),
                           pc.cast(pc.list_value_length(
                               pc.split_pattern_regex(trimmed, r'\s+')), pa.int64()))
        mask = pc.and_(pc.greater_equal(score, pa.scalar(float(min_score))),
                       pc.greater_equal(n_tok, pa.scalar(min_tokens, pa.int64())))
        if lang_set is not None:
            mask = pc.and_(mask, pc.is_in(t[lang_col], value_set=pa.array(lang_set)))
        return t.filter(mask)

    return ds.map_batches(fn, batch_format='pyarrow')


# --------------------------------------------------------------------------
# language identification (stopword n-gram heuristic)
# --------------------------------------------------------------------------

_LANG_MARKERS = {
    'en': (' the ', ' and ', ' of ', ' to ', ' is ', ' in ', ' that '),
    'de': (' der ', ' und ', ' die ', ' ist ', ' das ', ' nicht ', ' ein '),
    'fr': (' le ', ' la ', ' et ', ' les ', ' des ', ' est ', ' une '),
    'es': (' el ', ' los ', ' las ', ' es ', ' una ', ' que ', ' por '),
    'it': (' il ', ' che ', ' per ', ' non ', ' sono ', ' della ', ' anche '),
    'pt': (' não ', ' uma ', ' com ', ' para ', ' mais ', ' como ', ' dos '),
    'nl': (' het ', ' een ', ' van ', ' niet ', ' zijn ', ' voor ', ' ook '),
    # CJK has no word spacing: bare high-frequency function characters
    'zh': ('的', '是', '了', '在', '和', '不', '我'),
}


class LangIdKernel:
    """Actor-pool language-ID stage: marker lists prepared once per actor
    (__init__), vectorized substring counting per batch (__call__)."""

    def __init__(self, text_col: str = 'text', out_col: str = 'lang_pred',
                 sample_chars: 'int | None' = None):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = list(_LANG_MARKERS)
        # detection over the first N codepoints only: the standard
        # corpus-scale trade-off (the 56 marker scans dominate the web
        # pipeline's emit kernel on full page bodies; a prefix sample cuts
        # the scanned bytes ~6x with near-identical predictions).  None =
        # exact full-text counts (the documents-table oracle contract).
        self.sample_chars = sample_chars

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        if self.sample_chars:
            col = pc.utf8_slice_codeunits(col, 0, self.sample_chars)
        lowered = pc.utf8_lower(col)
        padded = pc.binary_join_element_wise(' ', lowered, ' ', '')
        scores = np.zeros((t.num_rows, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            for marker in _LANG_MARKERS[lang]:
                scores[:, j] += pc.count_substring(padded, marker).to_numpy(zero_copy_only=False)
        best = np.asarray(self.langs, dtype=object)[scores.argmax(axis=1)]
        best[scores.max(axis=1) == 0] = 'und'
        return t.append_column(self.out_col, pa.array(best, pa.string()))


def lang_id(ds: ray.data.Dataset, text_col: str = 'text',
            concurrency: 'int | None' = None) -> ray.data.Dataset:
    """``concurrency=None`` (default) runs the kernel in TASK form with a
    per-process instance cache — fuses with the read, no pool spin-up; the
    marker tables are tiny, so one copy per worker process is free.  Pass
    an int to use a bounded actor pool instead."""
    if concurrency is None:
        from .util import cached_kernel
        return ds.map_batches(cached_kernel(LangIdKernel, text_col=text_col),
                              batch_format='pyarrow', batch_size=8192)
    return ds.map_batches(LangIdKernel, fn_constructor_kwargs={'text_col': text_col},
                          batch_format='pyarrow',
                          concurrency=(1, concurrency), batch_size=8192)


# --------------------------------------------------------------------------
# document fingerprinting
# --------------------------------------------------------------------------

def fingerprint(ds: ray.data.Dataset, text_col: str = 'text', out_col: str = 'fingerprint') -> ray.data.Dataset:
    """SHA-256 hex fingerprint per document (C-backed hashlib per row)."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t[text_col].to_pylist()
        fps = [hashlib.sha256(v.encode('utf-8')).hexdigest() if v is not None else None for v in vals]
        return t.append_column(out_col, pa.array(fps, pa.string()))

    return ds.map_batches(fn, batch_format='pyarrow')


def rolling_hash_fingerprint(ds: ray.data.Dataset, text_col: str = 'text',
                             window: int = 64, out_col: str = 'winnow_fp') -> ray.data.Dataset:
    """Winnowing-style fingerprint: min of rolling polynomial hashes over
    byte windows — robust to local edits.

    Fully vectorized: the window hash h_i = sum_j d[i+j] * B^(w-1-j)
    (mod 2^64) is computed for ALL i at once via the modular-inverse prefix
    trick — B is odd, hence invertible mod 2^64, so with
    S_k = sum_{t<k} d[t] * B^(-t) each window hash is
    B^(i+w-1) * (S_{i+w} - S_i); numpy uint64 cumsum/cumprod wraparound IS
    mod-2^64 arithmetic.  One O(n) pass per document, no Python byte loop."""
    B = 1000003
    MOD = 1 << 64
    B_inv = pow(B, -1, MOD)
    w = window

    def one(text: str) -> int:
        data = np.frombuffer(text.encode('utf-8'), dtype=np.uint8).astype(np.uint64)
        n = len(data)
        if n == 0:
            return 0
        if n < w:  # single short window: plain polynomial fold
            h = 0
            for b in data.tolist():
                h = (h * B + b) % MOD
            return h
        with np.errstate(over='ignore'):
            inv_pow = np.empty(n, dtype=np.uint64)           # B^(-t) mod 2^64
            inv_pow[0] = 1
            np.cumprod(np.full(n - 1, B_inv, dtype=np.uint64), out=inv_pow[1:])
            S = np.zeros(n + 1, dtype=np.uint64)             # prefix of d[t]*B^(-t)
            np.cumsum(data * inv_pow, out=S[1:])
            fwd_pow = np.empty(n - w + 1, dtype=np.uint64)   # B^(i+w-1) mod 2^64
            fwd_pow[0] = pow(B, w - 1, MOD)
            np.cumprod(np.full(n - w, B, dtype=np.uint64), out=fwd_pow[1:])
            fwd_pow[1:] *= fwd_pow[0]
            h = fwd_pow * (S[w:] - S[:-w])
        return int(h.min())

    def fn(t: pa.Table) -> pa.Table:
        fps = [one(v) if v is not None else None for v in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(fps, pa.uint64()))

    return ds.map_batches(fn, batch_format='pyarrow')


# --------------------------------------------------------------------------
# shared regex tokenization
# --------------------------------------------------------------------------

def regex_tokens(col, token_rx: str = '[^0-9A-Za-z_]+'):
    """(flat token Array, tokens-per-row int64 counts): maximal runs NOT
    matching ``token_rx`` — i.e. for the default separator class, the exact
    matches DuckDB's ``regexp_extract_all(text, '[0-9A-Za-z_]+')`` returns
    (RE2 on both sides; boundary empty strings from the split dropped).
    Nulls count as empty text."""
    n = len(col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):  # all-null block
        col = pa.nulls(n, pa.large_string())
    col = pc.fill_null(col, '')
    toks = pc.split_pattern_regex(col, token_rx)
    tcounts = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    keep = pc.greater(pc.binary_length(flat), 0)
    if len(flat) and not pc.all(keep).as_py():
        tdoc = np.repeat(np.arange(n), tcounts)
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        tcounts = np.bincount(tdoc[mask], minlength=n).astype(np.int64)
    return flat, tcounts


# --------------------------------------------------------------------------
# repetition statistics (Gopher-style quality signals)
# --------------------------------------------------------------------------

def repetition_stats(ds: ray.data.Dataset, text_col: str = 'text',
                     line_sep: str = '\n',
                     token_rx: str = '[^0-9A-Za-z_]+') -> ray.data.Dataset:
    """Per-document repetition signals used by training-corpus quality
    filters (Gopher/Rae et al. 2021 'repetition' rules, public method):

    - ``n_lines`` / ``n_dup_lines``: line count and how many lines are
      repeats of an earlier identical line in the SAME document (templated
      or machine-generated pages repeat lines; prose does not),
    - ``n_2grams`` / ``top_2gram_count``: word-2-gram count and the
      occurrence count of the document's most frequent 2-gram (a high
      top-gram share marks keyword-stuffed / degenerate text).

    Exact and fully vectorized, no hashing: lines and tokens are
    ``pc.dictionary_encode``-d to int32 codes (C++ hash table, string
    equality — zero collision risk), 2-gram identity is the packed code
    pair, and the per-document distinct / mode counts are numpy
    lexsort + run-length passes over the flat code arrays.  Each batch is
    independent — no shuffle, scales linearly with the corpus.

    Tokens are maximal ``[0-9A-Za-z_]+`` runs (explicit ASCII class so the
    RE2 kernel and the DuckDB oracle's ``regexp_extract_all`` agree
    byte-for-byte)."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_null(col.type):  # all-null block
            col = pa.nulls(n, pa.large_string())
        col = pc.fill_null(col, '')

        # ---- duplicate lines within each document ----
        lines = pc.split_pattern(col, line_sep)
        lcounts = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        codes = pc.dictionary_encode(pc.list_flatten(lines)).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(n), lcounts)
        order = np.lexsort((codes, doc))
        cs, dcs = codes[order], doc[order]
        new = np.empty(len(cs), dtype=bool)
        if len(cs):
            new[0] = True
            new[1:] = (cs[1:] != cs[:-1]) | (dcs[1:] != dcs[:-1])
        # splitting '' yields [''], so every doc owns >= 1 line and every
        # reduceat segment below is non-empty
        starts = np.concatenate(([0], np.cumsum(lcounts)))[:-1]
        n_distinct = (np.add.reduceat(new, starts).astype(np.int64)
                      if len(cs) else np.zeros(n, np.int64))
        n_dup_lines = lcounts - n_distinct

        # ---- most frequent word 2-gram ----
        flat, tcounts = regex_tokens(col, token_rx)
        tcode = pc.dictionary_encode(flat).indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        toff = np.concatenate(([0], np.cumsum(tcounts)))
        # a 2-gram starts at every token except each doc's last
        valid = np.ones(len(tcode), dtype=bool)
        last = toff[1:][tcounts > 0] - 1
        if len(last):
            valid[last] = False
        gi = np.flatnonzero(valid)
        gram = (tcode[gi] << 32) | tcode[gi + 1]  # int32 codes: exact pack
        n_2grams = np.maximum(tcounts - 1, 0)
        gdoc = np.repeat(np.arange(n), n_2grams)
        top = np.zeros(n, dtype=np.int64)
        if len(gram):
            order = np.lexsort((gram, gdoc))
            gs, gds = gram[order], gdoc[order]
            newg = np.empty(len(gs), dtype=bool)
            newg[0] = True
            newg[1:] = (gs[1:] != gs[:-1]) | (gds[1:] != gds[:-1])
            run_starts = np.flatnonzero(newg)
            run_len = np.diff(np.concatenate((run_starts, [len(gs)])))
            run_doc = gds[run_starts]
            has = n_2grams > 0
            # run_doc is sorted and only has-docs own runs, so the first-run
            # indices of the has-docs partition run_len into per-doc segments
            first = np.searchsorted(run_doc, np.flatnonzero(has))
            top[has] = np.maximum.reduceat(run_len, first)
        return (t.append_column('n_lines', pa.array(lcounts))
                 .append_column('n_dup_lines', pa.array(n_dup_lines))
                 .append_column('n_2grams', pa.array(n_2grams))
                 .append_column('top_2gram_count', pa.array(top)))

    return ds.map_batches(fn, batch_format='pyarrow')


# --------------------------------------------------------------------------
# corpus n-gram statistics
# --------------------------------------------------------------------------

def _ngram_strings(col, n: int, token_rx: str, sep: str = ' '):
    """Flat Arrow array of the word n-gram strings of every row (tokens per
    ``regex_tokens``, joined by ``sep``) — fully vectorized: shifted takes
    of the flat token array joined element-wise, validity masked by
    same-document membership across all n positions."""
    flat, counts = regex_tokens(col, token_rx)
    total = len(flat)
    if total < n:
        return pa.array([], pa.large_string())
    doc = np.repeat(np.arange(len(counts)), counts)
    keep = np.ones(total - n + 1, dtype=bool)
    for j in range(1, n):
        keep &= doc[j:total - n + 1 + j] == doc[:total - n + 1]
    starts = np.flatnonzero(keep)
    if not len(starts):
        return pa.array([], pa.large_string())
    parts = [flat.take(pa.array(starts + j)) for j in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, sep)
    return joined


def top_ngrams(ds: ray.data.Dataset, text_col: str = 'text', n: int = 2,
               k: int = 20, token_rx: str = '[^0-9A-Za-z_]+',
               small: bool = False) -> ray.data.Dataset:
    """Corpus-wide top-``k`` word n-grams, deterministically tie-broken by
    (count DESC, ngram ASC).

    Scale shape: each block collapses to per-block (ngram, count) partials
    BEFORE the exchange (classic combiner), the global sum runs through
    ``grouped_agg`` (hash shuffle, or one task when the plan knows the
    input is small), then each summed block keeps only its local top-k so
    the final single-task merge sees at most ``blocks x k`` candidate rows
    — the global top-k is always a subset of the per-block top-k's under a
    total order, so the cap loses nothing."""
    from .agg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        grams = _ngram_strings(t[text_col], n, token_rx)
        g = pa.table({'ngram': grams}).group_by('ngram').aggregate([('ngram', 'count')])
        return pa.table({'ngram': pc.cast(g['ngram'], pa.string()),
                         'n': pc.cast(g['ngram_count'], pa.int64())})

    summed = grouped_agg(ds.map_batches(partial, batch_format='pyarrow'),
                         ['ngram'], [('n', 'sum', 'n')], small=small)

    def block_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[('n', 'descending'), ('ngram', 'ascending')])
        return t.take(idx[:k])

    candidates = summed.map_batches(block_topk, batch_format='pyarrow')
    return candidates.repartition(1).map_batches(block_topk, batch_format='pyarrow')


# regex classes shared byte-for-byte with the SQL oracle (RE2 both sides)
_CTRL_RX = r'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]'
_WS_RUN_RX = r'[ \t\n\r\f]+'
_EDGE_WS_RX = r'^ +| +$'


def nfc_normalize_array(arr):
    """Unicode NFC over an Arrow string array.  ASCII is NFC by definition,
    so a vectorized RE2 scan flags only rows containing a non-ASCII
    codepoint and the per-row ``unicodedata.normalize`` C call (with an
    ``is_normalized`` short-circuit) runs on just those — on web text the
    loop touches a small minority of rows."""
    import unicodedata
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    has_non_ascii = pc.match_substring_regex(arr, r'[^\x00-\x7F]')
    if not pc.any(pc.fill_null(has_non_ascii, False)).as_py():
        return arr
    mask = pc.fill_null(has_non_ascii, False).to_numpy(zero_copy_only=False)
    idx = np.nonzero(mask)[0]
    flagged = pc.take(arr, pa.array(idx)).to_pylist()
    fixed = [s if unicodedata.is_normalized('NFC', s)
             else unicodedata.normalize('NFC', s) for s in flagged]
    out = np.asarray(arr.to_pylist(), dtype=object)
    out[idx] = fixed
    return pa.array(out, pa.string())


def normalize_text(ds: ray.data.Dataset, text_col: str = 'text',
                   out_col: str = 'norm_text') -> ray.data.Dataset:
    """Canonical text cleanup for training corpora, SQL-replicable
    (DuckDB ``nfc_normalize`` + RE2 ``regexp_replace`` produce the same
    bytes): Unicode NFC -> control chars to spaces -> whitespace-run
    collapse -> edge trim.  One streaming map stage; appends ``out_col``
    and ``n_chars_norm``."""

    def fn(t: pa.Table) -> pa.Table:
        s = nfc_normalize_array(t[text_col])
        s = pc.replace_substring_regex(s, _CTRL_RX, ' ')
        s = pc.replace_substring_regex(s, _WS_RUN_RX, ' ')
        s = pc.replace_substring_regex(s, _EDGE_WS_RX, '')
        t = t.append_column(out_col, s)
        return t.append_column('n_chars_norm',
                               pc.cast(pc.utf8_length(s), pa.int64()))

    return ds.map_batches(fn, batch_format='pyarrow')


def inverted_index(ds: ray.data.Dataset, id_col: str = 'doc_id',
                   text_col: str = 'text', min_df: int = 2,
                   token_rx: str = '[^0-9A-Za-z_]+',
                   num_partitions: 'int | None' = None,
                   small: bool = False) -> ray.data.Dataset:
    """Distributed inverted index: one output row per token with document
    frequency, min/max doc id, and the full posting list (doc ids ascending,
    comma-joined — DuckDB ``string_agg(... ORDER BY doc_id)`` parity).

    Scale shape: per-batch tokenize -> per-doc DISTINCT (dictionary-encoded
    int lexsort, no string comparisons) -> ONE token-keyed exchange -> fully
    vectorized per-block assembly (boundary scan + ``ListArray`` +
    ``binary_join``; no per-token Python).  ``min_df`` prunes the long
    singleton tail BEFORE results ship.  Skew note: stopword-scale tokens
    concentrate their postings in one partition — raise ``min_df``, add a
    stopword filter, or shard hot tokens upstream when indexing raw web
    text at 100 TB."""
    def pairs_partial(t: pa.Table) -> pa.Table:
        flat, counts = regex_tokens(t[text_col], token_rx)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, counts)
        if len(doc) == 0:
            return pa.table({'token': pa.array([], pa.string()),
                             'doc_id': pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, doc))
        c_s, d_s = codes[order], doc[order]
        keep = np.empty(len(c_s), bool)
        keep[0] = True
        keep[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
        toks = enc.dictionary.take(pa.array(c_s[keep]))
        return pa.table({'token': pc.cast(toks, pa.string()),
                         'doc_id': pa.array(d_s[keep])})

    pairs = ds.map_batches(pairs_partial, batch_format='pyarrow')
    if small:
        pairs = pairs.repartition(1)
    else:
        from ..engine.dedup import _ray_cpus, ensure_hash_shuffle
        ensure_hash_shuffle()
        nparts = num_partitions or max(8, _ray_cpus())

        def add_bucket(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column('__bucket', pa.array([], pa.int64()))
            import polars as pl
            h = pl.from_arrow(t.select(['token'])).hash_rows(seed=3).to_numpy()
            return t.append_column(
                '__bucket', pa.array((h % nparts).astype('int64')))

        pairs = pairs.map_batches(add_bucket, batch_format='pyarrow') \
                     .repartition(nparts, keys=['__bucket'], sort=False)

    def assemble(t: pa.Table) -> pa.Table:
        empty = pa.table({'token': pa.array([], pa.string()),
                          'df': pa.array([], pa.int64()),
                          'min_doc': pa.array([], pa.int64()),
                          'max_doc': pa.array([], pa.int64()),
                          'postings': pa.array([], pa.string())})
        if t.num_rows == 0 or 'token' not in t.column_names:
            return empty
        if '__bucket' in t.column_names:
            t = t.drop_columns(['__bucket'])
        t = t.sort_by([('token', 'ascending'), ('doc_id', 'ascending')])
        tok = t['token'].combine_chunks()
        enc = pc.dictionary_encode(tok)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        n = len(codes)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], n)
        df = (ends - starts).astype(np.int64)
        doc = pc.cast(t['doc_id'], pa.int64()).combine_chunks()
        doc_np = doc.to_numpy(zero_copy_only=False)
        offsets = pa.array(np.append(starts, n).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, pc.cast(doc, pa.string()))
        out = pa.table({
            'token': pc.cast(tok.take(pa.array(starts)), pa.string()),
            'df': pa.array(df),
            'min_doc': pa.array(doc_np[starts]),
            'max_doc': pa.array(doc_np[ends - 1]),
            'postings': pc.cast(pc.binary_join(lists, ','), pa.string()),
        })
        return out.filter(pc.greater_equal(out['df'], min_df))

    return pairs.map_batches(assemble, batch_format='pyarrow',
                             batch_size=None)


def remove_boilerplate(ds: ray.data.Dataset, text_col: str = 'text',
                       sep: str = '\n', min_count: int = 2,
                       out_col: str = 'clean_text',
                       max_boiler: int = 2_000_000,
                       small: bool = False) -> ray.data.Dataset:
    """CCNet-style boilerplate REMOVAL — the rewrite half of
    :func:`paragraph_counts`: paragraphs occurring >= ``min_count`` times
    corpus-wide (nav bars, cookie banners, footers) are dropped from every
    document, kept paragraphs re-joined in order with ``sep``.

    Plan: pass 1 reuses ``paragraph_counts`` (partial-agg counts); the
    repeated-paragraph set is streamed to the driver and broadcast ONCE
    via ``ray.put`` (the decontamination pattern — boilerplate sets are
    small by nature since each entry must repeat; ``max_boiler`` bounds
    the broadcast and raises with guidance above it).  Pass 2 is one
    zero-shuffle map stage: vectorized split -> ``is_in`` against the
    broadcast set -> offset rebuild -> ``binary_join``.  Appends
    ``out_col`` and ``n_removed``."""
    import ray as _ray

    counts = paragraph_counts(ds, text_col, sep, min_count, small=small)
    parts, total = [], 0
    for t in counts.iter_batches(batch_format='pyarrow'):
        col = pc.cast(t['paragraph'], pa.string())
        parts.append(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                     else col)
        total += t.num_rows
        if total > max_boiler:
            raise ValueError(
                f'boilerplate set exceeds max_boiler={max_boiler}; raise '
                f'min_count or max_boiler (the set must fit one broadcast)')
    boiler = pa.concat_arrays(parts) if parts else pa.array([], pa.string())
    ref = _ray.put(boiler)

    def clean(t: pa.Table) -> pa.Table:
        b = _ray.get(ref)
        paras = pc.split_pattern(pc.fill_null(t[text_col], ''), sep)
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()
        flat = pc.list_flatten(paras)
        lens = pc.list_value_length(paras).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            keep = np.empty(0, bool)
        elif len(b) == 0:
            keep = np.ones(len(flat), bool)
        else:
            keep = pc.invert(pc.is_in(flat, value_set=b)).to_numpy(
                zero_copy_only=False)
        doc = np.repeat(np.arange(len(lens)), lens)
        kept_per_doc = np.bincount(doc[keep], minlength=len(lens)) \
            if len(doc) else np.zeros(len(lens), np.int64)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32))
        kept_flat = flat.filter(pa.array(keep)) if len(flat) else flat
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        lists = pa.ListArray.from_arrays(offsets, kept_flat)
        t = t.append_column(out_col,
                            pc.cast(pc.binary_join(lists, sep), pa.string()))
        return t.append_column(
            'n_removed', pa.array((lens - kept_per_doc).astype(np.int64)))

    return ds.map_batches(clean, batch_format='pyarrow')


def tfidf_top_terms(ds: ray.data.Dataset, id_col: str = 'doc_id',
                    text_col: str = 'text', k_top: int = 3,
                    token_rx: str = '[^0-9A-Za-z_]+',
                    num_docs: 'int | None' = None,
                    vocab_cap: int = 5_000_000,
                    small: bool = False) -> ray.data.Dataset:
    """Per-document top-``k_top`` TF-IDF terms with INTEGER-QUANTIZED idf:
    ``score = tf * (floor_log2(N // df) + 1)`` — exact int64 arithmetic on
    both sides (the SQL twin computes floor-log2 as ``length(bin(x)) - 1``),
    so ordering and values are hash-checkable with zero float drift.

    Plan: pass 1 aggregates document frequencies exactly like the unigram
    LM fit (per-doc distinct -> vocab-keyed partial sum; ``vocab_cap``
    bounds the broadcast); pass 2 broadcasts the (token, df) table via
    ``ray.put`` and each batch computes tf, gathers df with one
    ``pc.index_in``, scores, and takes the per-doc top-k from the
    (doc, score DESC, token ASC)-sorted block — one exchange total.
    Ties: (score DESC, token ASC), deterministic."""
    import ray as _ray

    from .agg import grouped_agg

    if num_docs is None:
        num_docs = ds.count()

    def df_partial(t: pa.Table) -> pa.Table:
        flat, counts = regex_tokens(t[text_col], token_rx)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table({'token': pa.array([], pa.string()),
                             '__df': pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(len(counts)), counts)
        order = np.lexsort((codes, doc))
        c_s, d_s = codes[order], doc[order]
        first = np.empty(len(c_s), bool)
        first[0] = True
        first[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
        uniq, cnt = np.unique(c_s[first], return_counts=True)
        return pa.table({
            'token': pc.cast(enc.dictionary.take(pa.array(uniq)), pa.string()),
            '__df': pa.array(cnt.astype(np.int64))})

    df_ds = grouped_agg(ds.map_batches(df_partial, batch_format='pyarrow'),
                        ['token'], [('__df', 'sum', 'df')], small=small)
    parts, total = [], 0
    for t in df_ds.iter_batches(batch_format='pyarrow'):
        parts.append(t.select(['token', 'df']).combine_chunks())
        total += t.num_rows
        if total > vocab_cap:
            raise ValueError(f'vocabulary exceeds vocab_cap={vocab_cap}')
    df_tab = pa.concat_tables(parts) if parts else pa.table(
        {'token': pa.array([], pa.string()), 'df': pa.array([], pa.int64())})
    ref = _ray.put(df_tab)

    def score(t: pa.Table) -> pa.Table:
        dft = _ray.get(ref)
        empty = pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                          'token': pa.array([], pa.string()),
                          'tf': pa.array([], pa.int64()),
                          'score': pa.array([], pa.int64())})
        flat, counts = regex_tokens(t[text_col], token_rx)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return empty
        ids = t[id_col].combine_chunks()
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(len(counts)), counts)
        order = np.lexsort((codes, doc))
        c_s, d_s = codes[order], doc[order]
        first = np.empty(len(c_s), bool)
        first[0] = True
        first[1:] = (c_s[1:] != c_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.nonzero(first)[0]
        tf = np.diff(np.append(starts, len(c_s))).astype(np.int64)
        code_u, doc_u = c_s[starts], d_s[starts]
        toks = enc.dictionary.take(pa.array(code_u))
        # idf gather: every corpus token is in the df table by construction
        pos = pc.index_in(toks, value_set=dft['token']).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dfv = dft['df'].to_numpy(zero_copy_only=False)[pos]
        # exact floor(log2(x)) for int x < 2^53: frexp exponent - 1
        idf = (np.frexp((num_docs // dfv).astype(np.float64))[1] - 1
               ).astype(np.int64) + 1
        sc = tf * idf
        # per-doc top-k by (score DESC, token ASC): arrow sort then a
        # segment-rank scan
        block = pa.table({'__doc': pa.array(doc_u),
                          'token': pc.cast(toks, pa.string()),
                          'tf': pa.array(tf), 'score': pa.array(sc)})
        block = block.sort_by([('__doc', 'ascending'), ('score', 'descending'),
                               ('token', 'ascending')])
        dd = block['__doc'].to_numpy(zero_copy_only=False)
        n = len(dd)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = dd[1:] != dd[:-1]
        seg_first = np.maximum.accumulate(np.where(new, np.arange(n), 0))
        rank = np.arange(n) - seg_first
        kept = block.filter(pa.array(rank < k_top))
        out_ids = ids.take(kept['__doc'])
        return pa.table({id_col: out_ids, 'token': kept['token'],
                         'tf': kept['tf'], 'score': kept['score']})

    return ds.map_batches(score, batch_format='pyarrow')
