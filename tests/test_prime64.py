"""prime64 Plan tests: bit-exact parity vs golden across all four regimes
(Goldilocks, Shoup<2^62 incl. PRIMES52, Shoup<2^63, generic Montgomery),
u64<->limb marshalling, and polymul parity (mul_poly_prime pattern)."""

import numpy as np
import pytest

from concrete_ntt_tpu import prime64
from concrete_ntt_tpu.golden import ntt as gold
from concrete_ntt_tpu.golden import polymul as gpoly
from concrete_ntt_tpu.tables import GOLDILOCKS, PRIMES52
from concrete_ntt_tpu.utils.prime import largest_prime_in_arithmetic_progression64

P62 = largest_prime_in_arithmetic_progression64(1 << 13, 1, 1 << 61, (1 << 62) - 1)
P63 = largest_prime_in_arithmetic_progression64(1 << 13, 1, 1 << 62, (1 << 63) - 1)
P64 = largest_prime_in_arithmetic_progression64(1 << 13, 1, 1 << 63, (1 << 64) - 1)

REGIME_PRIMES = [GOLDILOCKS, PRIMES52[0], P62, P63, P64]


def _rand(rng, p, shape):
    return (rng.integers(0, p, shape, dtype=np.uint64)).astype(np.uint64)


def test_variants():
    assert prime64.Plan.new(16, GOLDILOCKS).variant == "goldilocks"
    assert prime64.Plan.new(16, PRIMES52[0]).variant == "shoup62"
    assert prime64.Plan.new(16, P63).variant == "shoup63"
    assert prime64.Plan.new(16, P64).variant == "generic"
    assert prime64.Solinas == GOLDILOCKS


@pytest.mark.parametrize("p", REGIME_PRIMES)
@pytest.mark.parametrize("n", [16, 128])
def test_fwd_inv_match_golden(p, n, rng):
    plan = prime64.Plan.new(n, p)
    x = _rand(rng, p, n)
    got_f = plan.fwd(x)
    assert got_f.dtype == np.uint64
    want_f = gold.fwd([int(v) for v in x], p)
    assert got_f.tolist() == want_f
    got_i = plan.inv(x)
    want_i = gold.inv([int(v) for v in x], p)
    assert got_i.tolist() == want_i


@pytest.mark.parametrize("p", REGIME_PRIMES)
def test_roundtrip(p, rng):
    n = 64
    plan = prime64.Plan.new(n, p)
    x = _rand(rng, p, (3, n))
    back = plan.inv(plan.fwd(x))
    want = [(int(v) * n) % p for v in x.reshape(-1)]
    assert back.reshape(-1).tolist() == want


@pytest.mark.parametrize("p", [GOLDILOCKS, PRIMES52[0], P64])
def test_polymul_parity(p, rng):
    n = 128
    plan = prime64.Plan.new(n, p)
    lhs = _rand(rng, p, n)
    rhs = _rand(rng, p, n)
    got = plan.negacyclic_polymul(lhs, rhs)
    want = gpoly.negacyclic_convolution_mod(lhs.tolist(), rhs.tolist(), p)
    assert got.tolist() == want


@pytest.mark.parametrize("p", REGIME_PRIMES)
def test_elementwise_ops(p, rng):
    n = 32
    plan = prime64.Plan.new(n, p)
    lhs = _rand(rng, p, n)
    rhs = _rand(rng, p, n)
    acc = _rand(rng, p, n)
    got = plan.mul_assign_normalize(lhs, rhs)
    assert got.tolist() == gold.mul_assign_normalize(lhs.tolist(), rhs.tolist(), p, n)
    assert plan.normalize(lhs).tolist() == gold.normalize(lhs.tolist(), p, n)
    got_acc = plan.mul_accumulate(acc, lhs, rhs)
    assert got_acc.tolist() == gold.mul_accumulate(
        acc.tolist(), lhs.tolist(), rhs.tolist(), p
    )


def test_limb_form_api(rng):
    import jax.numpy as jnp

    n, p = 64, GOLDILOCKS
    plan = prime64.Plan.new(n, p)
    x = _rand(rng, p, n)
    from concrete_ntt_tpu.ops.u32 import limbs_to_np_u64, np_u64_to_limbs

    limbs = jnp.asarray(np_u64_to_limbs(x))
    out_limbs = plan.fwd(limbs)
    assert out_limbs.shape == (n, 2) and out_limbs.dtype == jnp.uint32
    assert (limbs_to_np_u64(out_limbs) == plan.fwd(x)).all()


def test_try_new_validation():
    assert prime64.Plan.try_new(48, GOLDILOCKS) is None
    assert prime64.Plan.try_new(64, (1 << 63) + 1) is None  # composite
    assert prime64.Plan.try_new(1 << 16, PRIMES52[0]) is None  # 2n ∤ p-1
    assert prime64.Plan.try_new(1 << 15, PRIMES52[0]) is not None
