"""Posting-list codec: delta + varint (LEB128) with Frame-of-Reference blocks.

The reference compresses positions and tag docID sets with delta+varint
(shibukawa/compints; call sites /root/reference/database.go:312,401).  We keep
those semantics (sorted uint sequence → per-element delta → 7-bit varint) and
extend them with a block layout the reference does not have: fixed-size blocks
with per-block (last_doc_id, byte_offset, max_tf, max_weight) sidecars, which
is what makes block-max WAND skipping possible at query time.

Everything is numpy-vectorized — encode/decode never loop per element, only
per byte-position (≤ 5 iterations for uint32), so the codec is safe to call
inside Arrow-batched pandas UDFs on the hot path.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128
# 10 septets cover full uint64 — absolute doc_ids at 10^12-doc scale exceed
# the 5-byte uint32 range, so the codec is 64-bit end to end.
_MAX_VARINT_BYTES = 10


# ------------------------------------------------------------------ varint

def _encode_varint_small(values) -> bytes:
    """Pure-Python fast path: beats numpy setup cost for tiny arrays
    (positions lists are typically 1-5 elements)."""
    out = bytearray()
    for v in values:
        v = int(v)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    return bytes(out)


def encode_varint(values) -> bytes:
    """LEB128-encode a non-negative uint array (vectorized)."""
    if len(values) <= 32:
        return _encode_varint_small(values)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: position of highest set bit / 7
    nbytes = np.ones(v.shape, dtype=np.int64)
    thresholds = np.array([1 << (7 * k) for k in range(1, _MAX_VARINT_BYTES)], dtype=np.uint64)
    for t in thresholds:
        nbytes += (v >= t).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    for k in range(_MAX_VARINT_BYTES):
        mask = nbytes > k
        if not mask.any():
            break
        byte = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[offsets[:-1][mask] + k] = byte | cont
    return out.tobytes()


def decode_varint(buf: bytes, out_dtype=np.uint64) -> np.ndarray:
    """Decode an LEB128 byte string into a uint array (vectorized)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=out_dtype)
    ends = np.nonzero(arr < 0x80)[0]
    if ends.size == 0 or ends[-1] != arr.size - 1:
        raise ValueError("truncated varint stream (missing terminator byte)")
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    vals = np.zeros(ends.shape, dtype=np.uint64)
    max_len = int(lengths.max())
    for k in range(max_len):
        mask = lengths > k
        vals[mask] |= (arr[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals.astype(out_dtype)


# ----------------------------------------------------------- sorted deltas

def encode_sorted(values) -> bytes:
    """Delta+varint for a sorted non-negative integer sequence (compints
    semantics: first element absolute, then gaps)."""
    n = len(values)
    if n == 0:
        return b""
    if n <= 32:
        prev = 0
        out = bytearray()
        for x in values:
            x = int(x)
            d = x - prev
            prev = x
            while d >= 0x80:
                out.append((d & 0x7F) | 0x80)
                d >>= 7
            out.append(d)
        return bytes(out)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    deltas = np.diff(v, prepend=np.uint64(0))
    return encode_varint(deltas)


_TF1_TABLE = [bytes((1, _p)) for _p in range(0x80)]


def encode_position_list(positions) -> bytes:
    """Self-delimiting per-posting positions: varint(count) + delta gaps.
    Concatenations of these are exactly the pos_blob format consumed by
    ``unpack_position_lists`` — so the index builder can join them
    byte-wise with no decode round trip.

    Fully inlined single loop: this is called once per (doc, term) on
    the build hot path (~50 per document), where the function-call and
    concat overhead of composing encode_varint + encode_sorted measured
    as the single largest kernel cost.  Zipf corpora make tf=1 the
    dominant case — small single positions come from a prebuilt table."""
    if len(positions) == 1:
        p = positions[0]
        if p < 0x80:
            return _TF1_TABLE[p]
    out = bytearray()
    d = len(positions)
    while d >= 0x80:
        out.append((d & 0x7F) | 0x80)
        d >>= 7
    out.append(d)
    prev = 0
    for x in positions:
        d = x - prev
        prev = x
        while d >= 0x80:
            out.append((d & 0x7F) | 0x80)
            d >>= 7
        out.append(d)
    return bytes(out)


def decode_sorted(buf: bytes, out_dtype=np.int64) -> np.ndarray:
    deltas = decode_varint(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=out_dtype)
    return np.cumsum(deltas).astype(out_dtype)


# --------------------------------------------------- blocked posting lists

def pack_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    weights: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
    dls: np.ndarray | None = None,
) -> dict:
    """Pack one term's postings (sorted by doc_id) into FoR blocks.

    Returns a dict of bytes fields:
      doc_blob   — per-block delta+varint doc-id gaps (first id in a block is
                   delta'd against 0, so blocks decode independently)
      tf_blob    — per-block varint tf values
      block_last — int64[] last doc_id per block        (skip pointers)
      block_off  — int64[] byte offset of each block in doc_blob
      block_tf_off — int64[] byte offset of each block in tf_blob
      block_max_tf — int32[] max tf per block
      block_max_w  — float32[] max pack-time weight per block (diagnostic)
      block_min_dl — int32[] min doc length per block — with block_max_tf
                     this yields a BM25 upper bound valid under ANY
                     query-time avgdl (weight is ↑ in tf, ↓ in dl), so
                     pruning stays sound when appends/removals drift avgdl
    plus ints: df (posting count), max_tf.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    n_blocks = (n + block_size - 1) // block_size
    doc_parts: list = []
    tf_parts: list = []
    block_last = np.empty(n_blocks, dtype=np.int64)
    block_off = np.empty(n_blocks, dtype=np.int64)
    block_tf_off = np.empty(n_blocks, dtype=np.int64)
    block_max_tf = np.empty(n_blocks, dtype=np.int32)
    block_max_w = np.zeros(n_blocks, dtype=np.float32)
    block_min_dl = np.zeros(n_blocks, dtype=np.int32)
    off = 0
    tf_off = 0
    for b in range(n_blocks):
        lo, hi = b * block_size, min((b + 1) * block_size, n)
        ids = doc_ids[lo:hi]
        part = encode_sorted(ids)
        tf_part = encode_varint(tfs[lo:hi])
        block_off[b] = off
        block_tf_off[b] = tf_off
        off += len(part)
        tf_off += len(tf_part)
        doc_parts.append(part)
        tf_parts.append(tf_part)
        block_last[b] = ids[-1]
        block_max_tf[b] = tfs[lo:hi].max()
        if weights is not None:
            block_max_w[b] = np.max(weights[lo:hi])
        if dls is not None:
            block_min_dl[b] = int(np.min(dls[lo:hi]))
    return {
        "doc_blob": b"".join(doc_parts),
        "tf_blob": b"".join(tf_parts),
        "block_last": block_last.tobytes(),
        "block_off": block_off.tobytes(),
        "block_tf_off": block_tf_off.tobytes(),
        "block_max_tf": block_max_tf.tobytes(),
        "block_max_w": block_max_w.tobytes(),
        "block_min_dl": block_min_dl.tobytes(),
        "df": int(n),
        "max_tf": int(tfs.max()) if n else 0,
    }


def decode_doc_blocks(doc_blob: bytes, block_off: np.ndarray, df: int,
                      blocks: np.ndarray, block_size: int = BLOCK_SIZE):
    """Decode only the selected blocks of a packed doc-id stream.

    Returns (doc_ids, posting_index) where posting_index gives each
    decoded id's global posting position (for tf/positions lookup).
    Blocks decode independently (each starts with an absolute id).
    """
    arr = np.frombuffer(doc_blob, dtype=np.uint8)
    ends = np.concatenate((block_off[1:], [arr.size])).astype(np.int64)
    out_ids = []
    out_idx = []
    for b in blocks:
        b = int(b)
        part = decode_sorted(arr[block_off[b]:ends[b]].tobytes())
        out_ids.append(part)
        lo = b * block_size
        out_idx.append(np.arange(lo, lo + part.size, dtype=np.int64))
    if not out_ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(out_ids), np.concatenate(out_idx)


def decode_tf_blocks(tf_blob: bytes, block_tf_off: np.ndarray, blocks: np.ndarray) -> dict:
    """Decode selected tf blocks → {block: tf_array}."""
    arr = np.frombuffer(tf_blob, dtype=np.uint8)
    ends = np.concatenate((block_tf_off[1:], [arr.size])).astype(np.int64)
    return {
        int(b): decode_varint(arr[block_tf_off[int(b)]:ends[int(b)]].tobytes(), out_dtype=np.int64)
        for b in blocks
    }


def decode_position_block(pos_blob: bytes, byte_start: int, byte_end: int,
                          n_lists: int) -> list:
    """Decode the position lists of one block (a byte span of pos_blob)."""
    return unpack_position_lists(pos_blob[byte_start:byte_end], n_lists)


def unpack_postings(row: dict, block_size: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """Full decode of a packed posting row → (doc_ids, tfs)."""
    block_off = np.frombuffer(row["block_off"], dtype=np.int64)
    doc_arr = np.frombuffer(row["doc_blob"], dtype=np.uint8)
    n = int(row["df"])
    doc_ids = np.empty(n, dtype=np.int64)
    ends = np.concatenate((block_off[1:], [doc_arr.size])).astype(np.int64)
    for b in range(block_off.size):
        lo = b * block_size
        part = decode_sorted(doc_arr[block_off[b]:ends[b]].tobytes())
        doc_ids[lo:lo + part.size] = part
    tfs = decode_varint(row["tf_blob"], out_dtype=np.int64)
    return doc_ids, tfs


# --------------------------------------------------------------- positions

def pack_position_lists(position_lists: list) -> bytes:
    """Concatenate per-posting position arrays: varint(count) + delta+varint
    payload each, in posting order.  Decoded lazily for phrase verification."""
    parts = []
    for pos in position_lists:
        arr = np.ascontiguousarray(pos, dtype=np.uint64)
        parts.append(encode_varint(np.array([arr.size], dtype=np.uint64)))
        parts.append(encode_sorted(arr))
    return b"".join(parts)


def unpack_position_lists(buf: bytes, n_postings: int) -> list:
    """Inverse of pack_position_lists → list of int64 arrays.

    One decode_varint pass, then ONE global cumsum over every delta with
    per-segment rebasing and a view-producing split — the former
    per-posting ``np.cumsum`` (tiny-array numpy setup × BLOCK_SIZE per
    block) dominated position-block decode on the phrase hot path.  The
    only remaining per-posting work is walking the self-delimiting
    headers (scalar indexing)."""
    all_vals = decode_varint(buf).astype(np.int64, copy=False)
    if n_postings == 0:
        return []
    hdr = np.empty(n_postings, dtype=np.int64)
    idx = 0
    for k in range(n_postings):
        hdr[k] = idx
        idx += int(all_vals[idx]) + 1
    counts = all_vals[hdr]
    keep = np.ones(all_vals.size, dtype=bool)
    keep[hdr] = False
    csum = np.cumsum(all_vals[keep])
    if csum.size == 0:  # every list empty (degenerate but legal)
        return [np.empty(0, dtype=np.int64)] * n_postings
    ends = np.cumsum(counts)
    starts = ends - counts
    offs = np.where(starts > 0, csum[starts - 1], 0)
    vals = csum - np.repeat(offs, counts)
    return np.split(vals, ends[:-1])
