"""Native (C++) host-math tier: bit-identical to the pure-Python builders.

The native library is the plan-construction runtime (the reference's
const-eval layer runs in native Rust: src/prime.rs, src/roots.rs). Every
function must agree exactly with its Python twin; tests skip when the
toolchain is unavailable.
"""

import numpy as np
import pytest

from concrete_ntt_tpu import _native
from concrete_ntt_tpu.golden.ntt import negacyclic_twiddles
from concrete_ntt_tpu.ops import mxu32
from concrete_ntt_tpu.utils.prime import (
    is_prime64,
    largest_prime_in_arithmetic_progression64,
)
from concrete_ntt_tpu.utils.roots import find_primitive_root64

pytestmark = pytest.mark.skipif(_native.lib() is None, reason="no native toolchain")

P = 0x3F5A0001  # first hardcoded 30-bit table prime


def test_is_prime64_matches():
    for x in (0, 1, 2, 3, 4, 37, 1073479681, 2**61 - 1, 2**62, P, P + 2):
        assert _native.is_prime64(x) == is_prime64(x), x


def test_prime_search_matches():
    for factor, lo, hi in ((1 << 15, 0, 1 << 30), (1 << 16, 1 << 29, 1 << 30)):
        assert _native.prime_in_ap(
            factor, 1, lo, hi
        ) == largest_prime_in_arithmetic_progression64(factor, 1, lo, hi)


def test_primitive_root_matches():
    for p in (1073479681, P, 1062862849):
        for deg in (64, 1024, 4096):
            assert _native.find_primitive_root64(p, deg) == find_primitive_root64(
                p, deg
            )


def test_twiddles_match_golden():
    n = 512
    tw, itw = _native.twiddles(P, n)
    gtw, gitw = negacyclic_twiddles(P, n)
    np.testing.assert_array_equal(tw, np.array(gtw, dtype=np.uint64))
    np.testing.assert_array_equal(itw, np.array(gitw, dtype=np.uint64))


def test_fourstep_operators_match_python():
    n = 256
    n1 = 16
    nat = _native.fourstep_build(n, P, n1)
    gtw, gitw = negacyclic_twiddles(P, n)
    twid = np.array(gtw, dtype=np.uint64)
    invtw = np.array(gitw, dtype=np.uint64)
    np.testing.assert_array_equal(nat["A"], mxu32._col_matrix_fwd(n, n1, n // n1, twid, P))
    F, d = mxu32._row_ops_fwd(n, n1, n // n1, twid, P)
    np.testing.assert_array_equal(nat["F"], F)
    np.testing.assert_array_equal(nat["d"], d)
    G, e = mxu32._row_ops_inv(n, n1, n // n1, invtw, P)
    np.testing.assert_array_equal(nat["G"], G)
    np.testing.assert_array_equal(nat["e"], e)
    np.testing.assert_array_equal(
        nat["Ainv"], mxu32._col_matrix_inv(n, n1, n // n1, invtw, P)
    )


def test_prep_matrix_matches_python(rng):
    M = rng.integers(0, P, (16, 32), dtype=np.uint64)
    for eplanes in (4, 8):
        nat = _native.prep_matrix(M, P, eplanes)
        ref = mxu32._prep_matrix(np.ascontiguousarray(M), P, eplanes)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])
