"""Posting-list compression: docID delta + varbyte blocks with block-max
metadata. All encode/decode is vectorized numpy (runs inside Arrow UDFs).

The reference delegates postings entirely to Lucene (SURVEY.md §2.3 T9 — no
gofias code exists for this layer); this module is the native replacement.
Format per block (one row in the postings table):

    term        STRING   — the analyzed term
    block_id    INT      — ordinal within (term, doc_part, segment)
    n           INT      — postings in this block (<= block_size)
    base        BIGINT   — doc_id immediately before the block's first doc
    last        BIGINT   — last doc_id in the block (range pruning)
    docs        BINARY   — varbyte(delta(doc_ids) from ``base``), strictly > 0
    tfs         BINARY   — varbyte(term frequencies)
    dls         BINARY   — varbyte(document lengths)
    tf_max      BIGINT   — max tf in block   (block-max WAND bound)
    dl_min      BIGINT   — min dl in block   (block-max WAND bound)

Storing (tf_max, dl_min) instead of a precomputed max-score keeps the bound
valid when avgdl changes after incremental merges: the query-time upper bound
idf * (k1+1) * tf_max / (tf_max + k1*(1-b+b*dl_min/avgdl)) is monotone in tf
and anti-monotone in dl, hence >= every posting's true contribution.
"""

from __future__ import annotations

import numpy as np

# varbyte: 7 payload bits per byte, little-endian groups, high bit = continue.
_THRESHOLDS = (np.uint64(128) ** np.arange(1, 10, dtype=np.uint64)).astype(
    np.uint64
)


def _varbyte_sizes(v: np.ndarray) -> np.ndarray:
    """Encoded byte count per value — one binary search over the 9 thresholds
    instead of a v.size x 9 broadcast compare (no 2D temporary)."""
    return (np.searchsorted(_THRESHOLDS, v, side="right") + 1).astype(np.int64)


def varbyte_encode(values: np.ndarray, _sizes: np.ndarray | None = None) -> bytes:
    """Vectorized variable-byte encode of a uint64 array. ``_sizes`` lets a
    caller that already computed per-value byte counts (for offset slicing)
    avoid recomputing them here."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = _varbyte_sizes(v) if _sizes is None else _sizes
    if nbytes[-1] == 1 and nbytes.max() == 1:
        # all values < 128: the encoding IS the byte values (common for tf
        # and gap streams) — skip the scatter loop entirely
        return v.astype(np.uint8).tobytes()
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        pos = starts[mask] + j
        payload = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[pos] = payload.astype(np.uint8) | cont
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Vectorized variable-byte decode -> uint64 array."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = b < 128
    # group id of each byte: cumulative count of completed values before it
    group = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=group[1:])
    starts = np.flatnonzero(np.r_[True, is_last[:-1]])
    k = np.arange(b.size, dtype=np.int64) - starts[group]
    payload = (b.astype(np.uint64) & np.uint64(0x7F)) << (
        np.uint64(7) * k.astype(np.uint64)
    )
    return np.add.reduceat(payload, starts)


def delta_encode(doc_ids: np.ndarray, base: int) -> np.ndarray:
    """Strictly-increasing doc_ids -> positive gaps from ``base``."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.diff(ids, prepend=np.int64(base))
    if ids.size and gaps.min() <= 0:
        raise ValueError("doc_ids must be strictly increasing and > base")
    return gaps.astype(np.uint64)


def delta_decode(gaps: np.ndarray, base: int) -> np.ndarray:
    return (np.cumsum(gaps.astype(np.int64)) + np.int64(base)).astype(np.int64)


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
) -> list[dict]:
    """Split one term's sorted postings into compressed block rows.

    Returns plain dicts (block_id, n, base, last, docs, tfs, dls, tf_max,
    dl_min) — the caller adds term / doc_part / segment columns.
    """
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.uint64)
    dl = np.ascontiguousarray(dls, dtype=np.uint64)
    blocks: list[dict] = []
    for bid, lo in enumerate(range(0, ids.size, block_size)):
        hi = min(lo + block_size, ids.size)
        base = int(ids[lo] - 1) if lo == 0 else int(ids[lo - 1])
        bi = ids[lo:hi]
        blocks.append(
            {
                "block_id": bid,
                "n": int(hi - lo),
                "base": base,
                "last": int(bi[-1]),
                "docs": varbyte_encode(delta_encode(bi, base)),
                "tfs": varbyte_encode(tf[lo:hi]),
                "dls": varbyte_encode(dl[lo:hi]),
                "tf_max": int(tf[lo:hi].max()),
                "dl_min": int(dl[lo:hi].min()),
                "tf_sum": int(tf[lo:hi].sum()),
            }
        )
    return blocks


def _varbyte_nbytes(v: np.ndarray) -> np.ndarray:
    return _varbyte_sizes(v)


def encode_blocks_batch(
    terms: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
    _arrow: bool = False,
):
    """Encode ALL terms of a partition in one vectorized pass.

    Inputs are sorted by (term, doc_id). Semantically identical to calling
    ``encode_blocks`` per term (tested equal), but varbyte-encodes the whole
    gap/tf/dl arrays once and slices per-block byte ranges out of the three
    streams — O(3) numpy passes instead of O(3 * n_terms) tiny calls, the
    difference between 115us and ~1us per term in the index build's hot UDF.

    Returns a dict of column arrays/lists shaped like BLOCK_SCHEMA minus
    doc_part."""
    n = doc_ids.size
    if n == 0:
        return {
            "term": np.empty(0, dtype=terms.dtype if hasattr(terms, "dtype") else object),
            "block_id": np.empty(0, dtype=np.int64),
            "n": np.empty(0, dtype=np.int64),
            "base": np.empty(0, dtype=np.int64),
            "last": np.empty(0, dtype=np.int64),
            "docs": [], "tfs": [], "dls": [],
            "tf_max": np.empty(0, dtype=np.int64),
            "dl_min": np.empty(0, dtype=np.int64),
            "tf_sum": np.empty(0, dtype=np.int64),
        }
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tf = np.ascontiguousarray(tfs, dtype=np.uint64)
    dl = np.ascontiguousarray(dls, dtype=np.uint64)
    # inputs are sorted by (term, doc_id) — documented precondition — so
    # term runs are contiguous: run-detection replaces np.unique's re-sort
    terms_arr = np.asarray(terms)
    term_starts = np.flatnonzero(
        np.r_[True, terms_arr[1:] != terms_arr[:-1]]
    )
    uniq = terms_arr[term_starts]
    # within-term position of each posting
    term_of = np.zeros(n, dtype=np.int64)
    term_of[term_starts[1:]] = 1
    term_of = np.cumsum(term_of)
    p = np.arange(n, dtype=np.int64) - term_starts[term_of]
    # gaps: plain diffs, reset to 1 at each term's first posting
    gaps = np.empty(n, dtype=np.int64)
    if n:
        gaps[0] = 1
        gaps[1:] = ids[1:] - ids[:-1]
        gaps[term_starts] = 1
    if n and gaps.min() <= 0:
        raise ValueError("doc_ids must be strictly increasing per term")
    gaps_u = gaps.astype(np.uint64)

    # block boundaries: every posting with p % block_size == 0 starts a block
    block_starts = np.flatnonzero(p % block_size == 0)
    block_ends = np.append(block_starts[1:], n)
    block_term = term_of[block_starts]
    m = block_starts.size

    sz_docs = _varbyte_sizes(gaps_u)
    sz_tfs = _varbyte_sizes(tf)
    sz_dls = _varbyte_sizes(dl)
    enc_docs = varbyte_encode(gaps_u, _sizes=sz_docs)
    enc_tfs = varbyte_encode(tf, _sizes=sz_tfs)
    enc_dls = varbyte_encode(dl, _sizes=sz_dls)
    off_docs = np.zeros(n + 1, dtype=np.int64)
    off_tfs = np.zeros(n + 1, dtype=np.int64)
    off_dls = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sz_docs, out=off_docs[1:])
    np.cumsum(sz_tfs, out=off_tfs[1:])
    np.cumsum(sz_dls, out=off_dls[1:])

    first_of_term = p[block_starts] == 0
    base = np.where(
        first_of_term,
        ids[block_starts] - 1,
        ids[np.maximum(block_starts - 1, 0)],
    )
    return {
        "term": uniq[block_term],
        "block_id": (p[block_starts] // block_size).astype(np.int64),
        "n": (block_ends - block_starts).astype(np.int64),
        "base": base.astype(np.int64),
        "last": ids[block_ends - 1],
        # block byte ranges cover the streams contiguously (blocks are
        # consecutive postings), so boundary offsets describe them exactly
        "docs": (enc_docs, off_docs[np.append(block_starts, n)])
        if _arrow
        else [
            enc_docs[off_docs[s] : off_docs[e]]
            for s, e in zip(block_starts, block_ends)
        ],
        "tfs": (enc_tfs, off_tfs[np.append(block_starts, n)])
        if _arrow
        else [
            enc_tfs[off_tfs[s] : off_tfs[e]]
            for s, e in zip(block_starts, block_ends)
        ],
        "dls": (enc_dls, off_dls[np.append(block_starts, n)])
        if _arrow
        else [
            enc_dls[off_dls[s] : off_dls[e]]
            for s, e in zip(block_starts, block_ends)
        ],
        "tf_max": np.maximum.reduceat(tf, block_starts).astype(np.int64)
        if m
        else np.empty(0, dtype=np.int64),
        "dl_min": np.minimum.reduceat(dl, block_starts).astype(np.int64)
        if m
        else np.empty(0, dtype=np.int64),
        "tf_sum": np.add.reduceat(tf, block_starts).astype(np.int64)
        if m
        else np.empty(0, dtype=np.int64),
    }


def encode_blocks_arrow(
    terms: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
):
    """``encode_blocks_batch`` with zero-copy Arrow binary columns.

    The docs/tfs/dls byte streams are returned as ``pa.BinaryArray`` built
    directly over the contiguous varbyte streams with per-block offsets —
    no per-block Python ``bytes`` objects (~3 x n_blocks allocations saved
    in the build's hottest UDF). Returns (dict of numpy/pa columns).
    """
    import pyarrow as pa

    cols = encode_blocks_batch(terms, doc_ids, tfs, dls, block_size, _arrow=True)
    out = {}
    for k, v in cols.items():
        if isinstance(v, tuple):  # (stream bytes, boundary offsets int64[nb+1])
            stream, bounds = v
            if bounds[-1] > np.iinfo(np.int32).max:
                raise ValueError(
                    "posting stream > 2 GiB in one partition; raise n_buckets"
                )
            out[k] = pa.Array.from_buffers(
                pa.binary(),
                len(bounds) - 1,
                [
                    None,
                    pa.py_buffer(bounds.astype(np.int32).tobytes()),
                    pa.py_buffer(stream),
                ],
            )
        elif isinstance(v, list):  # n == 0 early-return path
            out[k] = pa.array(v, type=pa.binary())
        else:
            out[k] = v
    return out


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Block row (mapping with docs/tfs/dls/base) -> (doc_ids, tfs, dls)."""
    ids = delta_decode(varbyte_decode(row["docs"]), int(row["base"]))
    tf = varbyte_decode(row["tfs"]).astype(np.float64)
    dl = varbyte_decode(row["dls"]).astype(np.float64)
    return ids, tf, dl


def decode_blocks_concat(
    docs_bytes: list[bytes],
    tfs_bytes: list[bytes],
    dls_bytes: list[bytes],
    ns: np.ndarray,
    bases: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode MANY blocks in three vectorized passes (query hot path).

    Per-block ``decode_block`` costs ~35us of fixed numpy overhead; a hot
    term at scale spans thousands of blocks per partition, so the per-block
    loop dominates query latency (measured ~280ms for an 8k-block term).
    Here the three byte streams are concatenated once and varbyte-decoded in
    ONE pass each; absolute doc_ids come from a segmented cumsum: within the
    concatenated gap stream, each block's ids are cumsum(gaps) shifted so its
    first id lands at base_j + gap_j0.
    """
    ns = np.asarray(ns, dtype=np.int64)
    m = ns.size
    if m == 0:
        e = np.empty(0, dtype=np.float64)
        return np.empty(0, dtype=np.int64), e, e
    gaps = varbyte_decode(b"".join(docs_bytes)).astype(np.int64)
    tf = varbyte_decode(b"".join(tfs_bytes)).astype(np.float64)
    dl = varbyte_decode(b"".join(dls_bytes)).astype(np.float64)
    starts = np.zeros(m, dtype=np.int64)
    np.cumsum(ns[:-1], out=starts[1:])
    total = np.cumsum(gaps)
    # correction per block: base_j - (running total before block j)
    before = np.where(starts > 0, total[starts - 1], 0)
    corr = np.asarray(bases, dtype=np.int64) - before
    ids = total + np.repeat(corr, ns)
    return ids, tf, dl


# ---------------------------------------------------------------------------
# positional sidecar (opt-in, IndexConfig.positions=True)
#
# The positions table is SELF-CONTAINED and block-aligned with the postings
# table: rows carry the same (term, block_id, n, base, last, docs, tfs) the
# postings row does plus ``poss`` — the token positions of every posting in
# the block, per-posting delta-encoded (first position absolute, then gaps),
# varbyte-compressed. tf doubles as the per-posting position count, so the
# decode needs no extra length stream. Block boundaries are computed with
# the IDENTICAL run-detection as encode_blocks_batch, so the two tables'
# rows correspond 1:1 (tested in test_positions.py).


def encode_positions_stream(
    terms: np.ndarray,
    tfs: np.ndarray,
    positions: np.ndarray,
    block_size: int,
):
    """Positions of a partition's postings -> per-block byte ranges.

    ``terms``/``tfs`` are per-POSTING (sorted by term, doc_id — the same
    arrays fed to encode_blocks_batch); ``positions`` is the flat
    concatenation of each posting's ascending token positions (len ==
    tfs.sum()). Returns (stream bytes, boundary offsets int64[nb+1]) in
    encode_blocks_batch block order."""
    n = np.asarray(terms).shape[0]
    tf = np.ascontiguousarray(tfs, dtype=np.int64)
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    # per-posting gap encoding: first position absolute, then diffs
    p_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(tf[:-1], out=p_starts[1:])
    gaps = np.empty(pos.size, dtype=np.int64)
    if pos.size:
        gaps[0] = pos[0]
        gaps[1:] = pos[1:] - pos[:-1]
        gaps[p_starts] = pos[p_starts]
    if pos.size and gaps.min() < 0:
        raise ValueError("positions must be ascending within each posting")
    gaps_u = gaps.astype(np.uint64)
    sz = _varbyte_sizes(gaps_u)
    stream = varbyte_encode(gaps_u, _sizes=sz)
    byte_off = np.zeros(pos.size + 1, dtype=np.int64)
    np.cumsum(sz, out=byte_off[1:])
    # block boundaries: identical computation to encode_blocks_batch
    terms_arr = np.asarray(terms)
    term_starts = np.flatnonzero(np.r_[True, terms_arr[1:] != terms_arr[:-1]])
    term_of = np.zeros(n, dtype=np.int64)
    term_of[term_starts[1:]] = 1
    term_of = np.cumsum(term_of)
    p = np.arange(n, dtype=np.int64) - term_starts[term_of]
    block_starts = np.flatnonzero(p % block_size == 0)
    # a block's positions span [pos_start(first posting), pos_start(next
    # block's first posting)) in the token stream -> byte offsets
    tok_bounds = np.append(p_starts[block_starts], pos.size)
    return stream, byte_off[tok_bounds]


def decode_block_positions(
    poss: bytes, tf: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """One block's ``poss`` bytes + its tf array -> (flat absolute
    positions, per-posting start offsets int64[n]). Posting i's positions
    are ``flat[starts[i] : starts[i] + tf[i]]``, ascending."""
    tf = np.asarray(tf, dtype=np.int64)
    gaps = varbyte_decode(poss).astype(np.int64)
    starts = np.zeros(tf.size, dtype=np.int64)
    np.cumsum(tf[:-1], out=starts[1:])
    cs = np.cumsum(gaps)
    # rebase each posting's cumsum so its first element is the stored
    # absolute first position
    before = np.where(starts > 0, cs[starts - 1], 0)
    flat = cs - np.repeat(before, tf)
    return flat, starts
