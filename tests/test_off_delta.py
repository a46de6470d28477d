"""Host-level invariants of the round-3 sign-offset fold and plane diet.

The digit-plane engines add per-digit corrections delta (mxu32.off_delta)
into cvec so that the 2^27 operand-shift offset becomes a multiple of p:
sum_d (2^27 + delta_d) * 2^(8d) == 0 (mod p). These are pure host-side
number-theory facts (no device work) checked across every regime the
dispatchers can reach: the hardcoded CRT tables, all four prime32 bench
regimes, all five prime64 regimes (reference bench set ntt.rs:84-132),
and adversarial primes at the plane-count boundaries.
"""

import numpy as np
import pytest

from concrete_ntt_tpu.ops.mxu32 import _n_dplanes32, off_delta
from concrete_ntt_tpu.ops.mxu64 import _n_dplanes, _n_eplanes_lazy, _scale_mode
from concrete_ntt_tpu.tables import PRIMES32, PRIMES52
from concrete_ntt_tpu.utils.prime import (
    largest_prime_in_arithmetic_progression64 as lpap,
)

GOLDILOCKS = (1 << 64) - (1 << 32) + 1
N = 1 << 14

PRIMES_UNDER_TEST = sorted(
    set(PRIMES32)
    | set(PRIMES52)
    | {
        GOLDILOCKS,
        lpap(2 * N, 1, 0, 1 << 30),          # prime32 lt30
        lpap(2 * N, 1, 1 << 30, 1 << 31),    # prime32 lt31
        lpap(2 * N, 1, 1 << 31, 1 << 32),    # prime32 generic (5-plane)
        lpap(2 * N, 1, 0, 1 << 50),          # prime64 p50
        lpap(2 * N, 1, 0, 1 << 51),          # prime64 p51
        lpap(2 * N, 1, 0, 1 << 62),          # prime64 p62 (shoup boundary)
        lpap(2 * N, 1, 1 << 62, 1 << 63),    # prime64 mont regime
        lpap(2 * N, 1, 1 << 63, 1 << 64),    # prime64 top regime
    }
)


def _planes_for(p: int) -> int:
    return _n_dplanes32(p) if p < (1 << 32) else _n_dplanes(p)


@pytest.mark.parametrize("p", PRIMES_UNDER_TEST)
def test_off_delta_annihilates_the_sign_offset(p):
    n_d = _planes_for(p)
    delta = off_delta(p, n_d)
    assert delta.shape == (n_d,)
    assert (np.abs(delta) <= 128).all()
    total = sum((int((1 << 27) + delta[dd])) << (8 * dd) for dd in range(n_d))
    assert total % p == 0


@pytest.mark.parametrize("p", PRIMES_UNDER_TEST)
def test_matrix_plane_count_is_minimal_and_sufficient(p):
    n_d = _planes_for(p)
    cover = lambda d: 127 * ((1 << (8 * d)) - 1) // 255
    assert p // 2 <= cover(n_d), "planes do not cover the centered range"
    assert n_d == 1 or p // 2 > cover(n_d - 1), "plane diet missed a plane"


@pytest.mark.parametrize("p", [q for q in PRIMES_UNDER_TEST if q > (1 << 32)])
def test_lazy_operand_planes_cover_the_midpass_bound(p):
    n_e = _n_eplanes_lazy(p)
    if _scale_mode(p) != "shoup":
        assert n_e == 8  # arbitrary u64 representatives
    else:
        # scaled epilogue emits < 4p; the kept planes must cover it
        assert 4 * p <= (1 << (8 * n_e))
        assert n_e == 8 or 4 * p > (1 << (8 * (n_e - 1)))
