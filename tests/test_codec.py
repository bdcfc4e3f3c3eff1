"""Codec round-trip tests: hand vectors + seeded hypothesis properties.

Mirrors the reference's compression semantics (delta+varint over sorted
uint sequences; /root/reference/database.go:312,401) and pins our block
layout extensions.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from watertower_spark.functions import codec


def test_varint_hand_vectors():
    assert codec.encode_varint(np.array([0], dtype=np.uint64)) == b"\x00"
    assert codec.encode_varint(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert codec.encode_varint(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert codec.encode_varint(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    out = codec.decode_varint(b"\x00\x7f\x80\x01\xac\x02")
    assert out.tolist() == [0, 127, 128, 300]


def test_varint_empty():
    assert codec.encode_varint(np.array([], dtype=np.uint64)) == b""
    assert codec.decode_varint(b"").tolist() == []


def test_sorted_roundtrip_simple():
    arr = [1, 5, 6, 100, 1000000]
    buf = codec.encode_sorted(arr)
    assert codec.decode_sorted(buf).tolist() == arr


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=500)
)
def test_sorted_roundtrip_property(values):
    arr = sorted(set(values))
    buf = codec.encode_sorted(arr)
    assert codec.decode_sorted(buf).tolist() == arr


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=1, max_size=200))
def test_varint_roundtrip_property(values):
    arr = np.array(values, dtype=np.uint64)
    assert codec.decode_varint(codec.encode_varint(arr)).tolist() == values


def test_pack_postings_roundtrip_and_blocks():
    rng = np.random.default_rng(42)
    n = 1000
    doc_ids = np.cumsum(rng.integers(1, 50, size=n))
    tfs = rng.integers(1, 30, size=n)
    weights = tfs / (tfs + 1.2)
    row = codec.pack_postings(doc_ids, tfs, weights, block_size=128)
    got_ids, got_tfs = codec.unpack_postings(row, block_size=128)
    assert got_ids.tolist() == doc_ids.tolist()
    assert got_tfs.tolist() == tfs.tolist()
    assert row["df"] == n
    block_last = np.frombuffer(row["block_last"], dtype=np.int64)
    assert block_last.size == (n + 127) // 128
    assert block_last[-1] == doc_ids[-1]
    block_max_tf = np.frombuffer(row["block_max_tf"], dtype=np.int32)
    assert block_max_tf[0] == tfs[:128].max()
    block_max_w = np.frombuffer(row["block_max_w"], dtype=np.float32)
    assert np.isclose(block_max_w[0], weights[:128].max())


def test_pack_postings_single():
    row = codec.pack_postings(np.array([7]), np.array([3]))
    ids, tfs = codec.unpack_postings(row)
    assert ids.tolist() == [7] and tfs.tolist() == [3]


def test_position_lists_roundtrip():
    lists = [[0, 1, 5], [], [2], list(range(0, 300, 3))]
    buf = codec.pack_position_lists(lists)
    out = codec.unpack_position_lists(buf, len(lists))
    assert [x.tolist() for x in out] == lists
