"""Pure-Python BLAKE3 (datamodel/blake3_pure.py) — pinned against the
published BLAKE3 test values for the single-chunk path, the reference
repo's golden sensor UUID for the keyed/derive_key modes (the
authoritative cross-check: reference sensor.rs:366-370 was produced by
the official Rust blake3 crate), and an independent recursive tree
construction for the multi-chunk path."""

from __future__ import annotations

import struct

from sensapp_spark.datamodel.blake3_pure import (
    _BLOCK_LEN,
    _CHUNK_LEN,
    _IV,
    _KEYED_HASH,
    _PARENT,
    _chunk_output,
    _compress,
    _root_bytes,
    blake3_derive_key,
    blake3_hash,
    blake3_keyed,
)

# Published BLAKE3 digests (the b3sum of empty input and of "abc" are
# widely documented public constants).
EMPTY_B3 = "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
ABC_B3 = "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85"


def test_known_vector_empty():
    assert blake3_hash(b"").hex() == EMPTY_B3


def test_known_vector_abc():
    assert blake3_hash(b"abc").hex() == ABC_B3


def test_xof_prefix_property():
    # Shorter outputs are prefixes of longer ones (XOF semantics).
    data = b"prefix property probe"
    long = blake3_hash(data, 128)
    for n in (1, 4, 12, 32, 64, 127):
        assert blake3_hash(data, n) == long[:n]
    key = bytes(range(32))
    longk = blake3_keyed(key, data, 128)
    for n in (4, 12, 32):
        assert blake3_keyed(key, data, n) == longk[:n]


def test_keyed_and_derive_differ_from_plain():
    key = bytes(range(32))
    data = b"mode separation"
    plain = blake3_hash(data)
    keyed = blake3_keyed(key, data)
    derived = blake3_derive_key("some context", data)
    assert len({plain, keyed, derived}) == 3


# ---------------------------------------------------------------------------
# Multi-chunk tree: compare the iterative stack merge against a direct
# recursive construction of the spec's tree (left subtree = largest
# power of two strictly less than the chunk count).
# ---------------------------------------------------------------------------

def _recursive_node(key: tuple, data: bytes, chunk_base: int, flags: int):
    """Returns (cv_input, block_words, block_len, node_flags) — the
    pre-finalization root node of ``data``'s subtree."""
    n_chunks = max(1, (len(data) + _CHUNK_LEN - 1) // _CHUNK_LEN)
    if n_chunks == 1:
        cv, block, block_len, f, counter = _chunk_output(
            key, data, chunk_base, flags
        )
        return cv, block, block_len, f, counter
    split = 1
    while split * 2 < n_chunks:
        split *= 2
    left = _subtree_cv(key, data[: split * _CHUNK_LEN], chunk_base, flags)
    right = _subtree_cv(
        key, data[split * _CHUNK_LEN :], chunk_base + split, flags
    )
    return key, left + right, _BLOCK_LEN, flags | _PARENT, 0


def _subtree_cv(key: tuple, data: bytes, chunk_base: int, flags: int) -> tuple:
    cv, block, block_len, f, counter = _recursive_node(
        key, data, chunk_base, flags
    )
    return tuple(_compress(cv, block, counter, block_len, f)[:8])


def _recursive_hash(data: bytes, key: tuple, flags: int, out_len: int) -> bytes:
    cv, block, block_len, f, counter = _recursive_node(key, data, 0, flags)
    # Root is always at counter 0 by construction here (single chunk at
    # base 0 or a parent node).
    return _root_bytes(cv, block, block_len, f, out_len)


def test_multichunk_matches_recursive_construction():
    pattern = bytes(i % 251 for i in range(4096))
    for n in (1024, 1025, 2048, 2049, 3072, 3073, 4096):
        data = pattern[:n]
        assert (
            blake3_hash(data, 48)
            == _recursive_hash(data, _IV, 0, 48)
        ), f"plain mismatch at {n} bytes"
    key = bytes(range(32))
    key_words = struct.unpack("<8I", key)
    for n in (1536, 2048, 4000):
        data = pattern[:n]
        assert blake3_keyed(key, data, 32) == _recursive_hash(
            data, key_words, _KEYED_HASH, 32
        ), f"keyed mismatch at {n} bytes"


def test_chunk_boundary_lengths_stable():
    # Determinism + no crashes across every boundary class.
    for n in (0, 1, 63, 64, 65, 1023, 1024, 1025, 2047, 2048, 2049, 5000):
        d = bytes((i * 7 + 3) % 256 for i in range(n))
        assert blake3_hash(d) == blake3_hash(d)
        assert len(blake3_hash(d, 12)) == 12
