"""SmallFloat norm quantization vs a literal scalar port of the reference
(`util/SmallFloat.java:103-167`)."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from lucene_spark.functions.smallfloat import (
    LENGTH_TABLE, NUM_FREE_VALUES, byte4_to_int, int_to_byte4,
)


def _long_to_int4_ref(i: int) -> int:
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long_ref(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    return bits if shift == -1 else (bits | 0x08) << shift


MAX_INT4 = _long_to_int4_ref(2**31 - 1)
NFV = 255 - MAX_INT4


def _int_to_byte4_ref(i: int) -> int:
    if i < NFV:
        return i
    return NFV + _long_to_int4_ref(i - NFV)


def _byte4_to_int_ref(b: int) -> int:
    if b < NFV:
        return b
    return NFV + _int4_to_long_ref(b - NFV)


def test_num_free_values_is_24():
    assert NUM_FREE_VALUES == 24 == NFV


def test_small_values_exact():
    vals = np.arange(24)
    assert np.array_equal(int_to_byte4(vals), vals.astype(np.uint8))
    assert np.array_equal(byte4_to_int(int_to_byte4(vals)), vals)


def test_matches_scalar_reference_exhaustive_small():
    vals = np.arange(100_000)
    got = int_to_byte4(vals)
    want = np.array([_int_to_byte4_ref(int(v)) for v in vals], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_decode_table_matches_reference():
    want = np.array([_byte4_to_int_ref(b) for b in range(256)], dtype=np.float32)
    assert np.array_equal(LENGTH_TABLE, want)


def test_monotonic_and_round_down():
    vals = np.unique(np.concatenate([
        np.arange(5000), 2 ** np.arange(31), 2 ** np.arange(31) - 1,
        2 ** np.arange(31) + 1, [2**31 - 1]]))
    enc = int_to_byte4(vals)
    dec = byte4_to_int(enc)
    assert np.all(np.diff(enc.astype(int)) >= 0)  # monotone
    assert np.all(dec <= vals)                     # truncating (round-down)


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_hypothesis_matches_reference(i):
    assert int(int_to_byte4(np.array([i]))[0]) == _int_to_byte4_ref(i)
