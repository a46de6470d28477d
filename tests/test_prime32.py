"""prime32 Plan tests: bit-exact parity vs the golden model across all three
modulus regimes, roundtrips, batching, and the README parity vector
(SURVEY.md §4 patterns 2-3)."""

import numpy as np
import pytest

from concrete_ntt_tpu import prime32
from concrete_ntt_tpu.golden import ntt as gold
from concrete_ntt_tpu.golden import polymul as gpoly
from concrete_ntt_tpu.tables import PRIMES32
from concrete_ntt_tpu.utils.prime import largest_prime_in_arithmetic_progression64

P_README = 1062862849
P_EXAMPLE = 1073479681  # < 2^30
P_LT31 = largest_prime_in_arithmetic_progression64(1 << 13, 1, 1 << 30, (1 << 31) - 1)
P_GE31 = largest_prime_in_arithmetic_progression64(1 << 13, 1, 1 << 31, (1 << 32) - 1)

ALL_REGIME_PRIMES = [PRIMES32[0], P_LT31, P_GE31]


def _rand(rng, p, shape):
    return rng.integers(0, p, shape).astype(np.uint32)


@pytest.mark.parametrize("p", ALL_REGIME_PRIMES)
@pytest.mark.parametrize("n", [16, 64, 256, 1024])
def test_fwd_matches_golden(p, n, rng):
    plan = prime32.Plan.new(n, p)
    assert plan.variant == ("lt30" if p < 2**30 else "lt31" if p < 2**31 else "generic")
    x = _rand(rng, p, n)
    got = np.asarray(plan.fwd(x))
    want = gold.fwd([int(v) for v in x], p)
    assert got.tolist() == want
    assert (got < p).all()


@pytest.mark.parametrize("p", ALL_REGIME_PRIMES)
@pytest.mark.parametrize("n", [16, 256])
def test_inv_matches_golden(p, n, rng):
    plan = prime32.Plan.new(n, p)
    x = _rand(rng, p, n)
    got = np.asarray(plan.inv(x))
    want = gold.inv([int(v) for v in x], p)
    assert got.tolist() == want


@pytest.mark.parametrize("p", ALL_REGIME_PRIMES)
def test_roundtrip_batched(p, rng):
    n, b = 128, 5
    plan = prime32.Plan.new(n, p)
    x = _rand(rng, p, (b, n))
    back = np.asarray(plan.inv(plan.fwd(x)))
    want = (x.astype(np.uint64) * n % p).astype(np.uint32)
    assert (back == want).all()


def test_readme_vector():
    # BASELINE.json config 1: N=32, p=1062862849 fwd+inv roundtrip.
    n = 32
    plan = prime32.Plan.new(n, P_README)
    rng = np.random.default_rng(42)
    x = _rand(rng, P_README, n)
    fwd_x = plan.fwd(x)
    back = np.asarray(plan.inv(fwd_x))
    assert (back == (x.astype(np.uint64) * n % P_README).astype(np.uint32)).all()
    # and matches golden bit-for-bit
    assert np.asarray(fwd_x).tolist() == gold.fwd([int(v) for v in x], P_README)


@pytest.mark.parametrize("p", ALL_REGIME_PRIMES)
def test_polymul_parity(p, rng):
    # mul_poly_prime.rs pattern: fwd both → mul_assign_normalize → inv ==
    # schoolbook negacyclic convolution.
    n = 256
    plan = prime32.Plan.new(n, p)
    lhs = _rand(rng, p, n)
    rhs = _rand(rng, p, n)
    got = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    want = gpoly.negacyclic_convolution_mod(lhs.tolist(), rhs.tolist(), p)
    assert got.tolist() == want


@pytest.mark.parametrize("p", ALL_REGIME_PRIMES)
def test_elementwise_ops(p, rng):
    n = 64
    plan = prime32.Plan.new(n, p)
    lhs = _rand(rng, p, n)
    rhs = _rand(rng, p, n)
    acc = _rand(rng, p, n)
    got = np.asarray(plan.mul_assign_normalize(lhs, rhs))
    want = gold.mul_assign_normalize(lhs.tolist(), rhs.tolist(), p, n)
    assert got.tolist() == want
    got_n = np.asarray(plan.normalize(lhs))
    assert got_n.tolist() == gold.normalize(lhs.tolist(), p, n)
    got_acc = np.asarray(plan.mul_accumulate(acc, lhs, rhs))
    assert got_acc.tolist() == gold.mul_accumulate(acc.tolist(), lhs.tolist(), rhs.tolist(), p)


def test_try_new_validation():
    assert prime32.Plan.try_new(31, P_README) is None  # not a power of two
    assert prime32.Plan.try_new(64, 15) is None  # not prime
    assert prime32.Plan.try_new(1 << 20, PRIMES32[0]) is None  # 2n ∤ p-1
    assert prime32.Plan.try_new(1 << 15, PRIMES32[0]) is not None  # max n


def test_large_n_matches_golden(rng):
    n, p = 4096, PRIMES32[0]
    plan = prime32.Plan.new(n, p)
    x = _rand(rng, p, n)
    got = np.asarray(plan.fwd(x))
    want = gold.fwd([int(v) for v in x], p)
    assert got.tolist() == want


def test_jit_and_vmap_compose():
    import jax
    import jax.numpy as jnp

    n, p = 64, PRIMES32[0]
    plan = prime32.Plan.new(n, p)
    x = jnp.arange(4 * n, dtype=jnp.uint32).reshape(4, n) % jnp.uint32(p)
    direct = plan.fwd(x)
    under_jit = jax.jit(plan.fwd)(x)
    vmapped = jax.vmap(plan.fwd)(x)
    assert (np.asarray(direct) == np.asarray(under_jit)).all()
    assert (np.asarray(direct) == np.asarray(vmapped)).all()
