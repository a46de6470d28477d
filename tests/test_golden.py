"""Golden-model self-consistency tests (SURVEY.md §4 patterns 1-3):
roundtrip inv(fwd(x)) == N*x, convolution theorem vs schoolbook oracle,
README parity vector, and CRT wrapping-truncation semantics."""

import numpy as np
import pytest

from concrete_ntt_tpu.golden import crt, ntt, polymul
from concrete_ntt_tpu.tables import (
    NATIVE32_PRIMES,
    NATIVE64_PRIMES,
    PRIMES32,
)

P_README = 1062862849  # README.md:30-51 example prime, N=32
P_EXAMPLE = 1073479681  # examples/mul_poly_prime.rs prime, N=1024


@pytest.mark.parametrize("n", [16, 32, 64, 256, 1024])
@pytest.mark.parametrize("p", [P_README, PRIMES32[0], PRIMES32[9]])
def test_roundtrip(n, p, rng):
    x = [int(v) for v in rng.integers(0, p, n)]
    back = ntt.inv(ntt.fwd(x, p), p)
    assert back == [v * n % p for v in x]


@pytest.mark.parametrize("n", [16, 64, 256])
def test_convolution_theorem(n, rng):
    p = P_EXAMPLE
    lhs = [int(v) for v in rng.integers(0, p, n)]
    rhs = [int(v) for v in rng.integers(0, p, n)]
    got = ntt.negacyclic_polymul(lhs, rhs, p)
    want = polymul.negacyclic_convolution_mod(lhs, rhs, p)
    assert got == want


def test_readme_vector():
    # The README quick-start (README.md:30-51): N=32, p=1062862849,
    # inv(fwd(x)) == N * x — the parity vector named in BASELINE.json.
    rng = np.random.default_rng(42)
    n = 32
    x = [int(v) for v in rng.integers(0, P_README, n)]
    fwd_x = ntt.fwd(x, P_README)
    assert all(0 <= v < P_README for v in fwd_x)
    back = ntt.inv(fwd_x, P_README)
    assert back == [v * n % P_README for v in x]


def test_fwd_is_negacyclic_dft():
    # Spectral ground truth: output[bit_rev(k)] must equal the polynomial
    # evaluated at ψ^(2k+1) — the defining property of the negacyclic NTT
    # with fused twist and bit-reversed output ordering.
    from concrete_ntt_tpu.utils.bitrev import bit_rev
    from concrete_ntt_tpu.utils.roots import find_primitive_root64

    n, p = 16, P_README
    psi = find_primitive_root64(p, 2 * n)
    rng = np.random.default_rng(7)
    x = [int(v) for v in rng.integers(0, p, n)]
    out = ntt.fwd(x, p)
    nbits = n.bit_length() - 1
    for k in range(n):
        root = pow(psi, 2 * k + 1, p)
        want = sum(x[j] * pow(root, j, p) for j in range(n)) % p
        assert out[bit_rev(nbits, k)] == want


@pytest.mark.parametrize("bits,primes", [(32, NATIVE32_PRIMES), (64, NATIVE64_PRIMES)])
def test_crt_polymul_wrapping(bits, primes, rng):
    # Native-plan contract: CRT over k prime NTTs + signed truncation equals
    # schoolbook negacyclic convolution in wrapping mod-2^bits arithmetic.
    n = 64
    lhs = [int(v) for v in rng.integers(0, 1 << bits, n, dtype=np.uint64)]
    rhs = [int(v) for v in rng.integers(0, 1 << bits, n, dtype=np.uint64)]
    chans_l = crt.residues(lhs, primes)
    chans_r = crt.residues(rhs, primes)
    prod_chans = [
        ntt.negacyclic_polymul(cl, cr, p)
        for cl, cr, p in zip(chans_l, chans_r, primes)
    ]
    got = crt.reconstruct_signed_wrapping(prod_chans, primes, bits)
    want = polymul.negacyclic_convolution_wrapping(lhs, rhs, bits)
    assert got == want


def test_wrapping_oracle_np_matches_bigint(rng):
    n = 128
    lhs = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    rhs = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    got = polymul.negacyclic_convolution_wrapping_np(lhs, rhs)
    want = polymul.negacyclic_convolution_wrapping(lhs.tolist(), rhs.tolist(), 64)
    assert got.tolist() == want
