"""Packed-stream and alphabet tests (oracle: direct NumPy counting).

Mirrors the reference's packedstream unit tests (SURVEY.md §5.1:
randomized inputs + scalar CPU oracle, exact equality).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.basic import (
    pack_2bit,
    unpack_2bit,
    popc_2bit_word,
    popc_2bit_prefix,
    encode_dna,
    decode_dna,
    reverse_complement,
)
from nvbio_tpu.basic.packed import get_symbol


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 15, 16, 17, 100, 1000, 4097]:
        syms = rng.integers(0, 4, n).astype(np.uint8)
        words = pack_2bit(syms)
        assert words.dtype == np.uint32
        out = unpack_2bit(words, n)
        np.testing.assert_array_equal(out, syms)


def test_pack_unpack_jax_matches_numpy():
    rng = np.random.default_rng(1)
    syms = rng.integers(0, 4, 333).astype(np.uint8)
    words = pack_2bit(syms)
    out_j = unpack_2bit(jnp.asarray(words), 333)
    np.testing.assert_array_equal(np.asarray(out_j), syms)


def test_get_symbol():
    rng = np.random.default_rng(2)
    syms = rng.integers(0, 4, 257).astype(np.uint8)
    words = pack_2bit(syms)
    idx = rng.integers(0, 257, 64)
    np.testing.assert_array_equal(get_symbol(words, idx), syms[idx])


@pytest.mark.parametrize("c", [0, 1, 2, 3])
def test_popc_2bit_word(c):
    rng = np.random.default_rng(3 + c)
    syms = rng.integers(0, 4, 16 * 50).astype(np.uint8)
    words = pack_2bit(syms)
    expect = (syms.reshape(-1, 16) == c).sum(axis=1)
    np.testing.assert_array_equal(popc_2bit_word(words, c), expect)
    np.testing.assert_array_equal(
        np.asarray(popc_2bit_word(jnp.asarray(words), c)), expect
    )


@pytest.mark.parametrize("c", [0, 1, 2, 3])
def test_popc_2bit_prefix(c):
    rng = np.random.default_rng(7 + c)
    syms = rng.integers(0, 4, 16 * 20).astype(np.uint8)
    words = pack_2bit(syms)
    ks = rng.integers(0, 17, words.shape[0])
    expect = np.array(
        [(syms[16 * w : 16 * w + k] == c).sum() for w, k in enumerate(ks)]
    )
    np.testing.assert_array_equal(popc_2bit_prefix(words, c, ks), expect)
    np.testing.assert_array_equal(
        np.asarray(popc_2bit_prefix(jnp.asarray(words), c, jnp.asarray(ks))), expect
    )


def test_encode_decode():
    s = "ACGTNacgtn"
    e = encode_dna(s)
    np.testing.assert_array_equal(e, [0, 1, 2, 3, 4, 0, 1, 2, 3, 4])
    assert decode_dna(e) == "ACGTNACGTN"


def test_reverse_complement():
    assert decode_dna(reverse_complement(encode_dna("AACGTN"))) == "NACGTT"
