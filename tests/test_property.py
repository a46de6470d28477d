"""Property-based randomized parity (hypothesis).

Extends the reference's fixed-seed randomized tests (SURVEY.md §4.1-4.3)
with adversarial coefficient generation: boundary values (0, 1, p-1,
2^w - 1), random sizes and regimes, and the algebraic laws every plan must
satisfy — linearity, roundtrip, wrapping-oracle parity on sparse operands.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from concrete_ntt_tpu import native64, prime32
from concrete_ntt_tpu.golden import ntt as gntt
from concrete_ntt_tpu.tables import PRIMES32

P = PRIMES32[0]
N = 64

coeff = st.one_of(
    st.integers(0, P - 1),
    st.sampled_from([0, 1, P - 1, P // 2, P // 2 + 1]),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(coeff, min_size=N, max_size=N))
def test_fwd_matches_golden_on_adversarial_inputs(xs):
    plan = prime32.Plan.new(N, P)
    x = np.array(xs, dtype=np.uint32)[None]
    got = np.asarray(plan.fwd(x))[0]
    want = np.array(gntt.fwd(xs, P, N), dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, P - 1), min_size=N, max_size=N),
    st.lists(st.integers(0, P - 1), min_size=N, max_size=N),
    st.integers(0, P - 1),
)
def test_transform_linearity(xs, ys, c):
    """fwd(a*x + y) == a*fwd(x) + fwd(y) (mod p) — the NTT is linear."""
    plan = prime32.Plan.new(N, P)
    x = np.array(xs, dtype=np.uint64)
    y = np.array(ys, dtype=np.uint64)
    combo = ((c * x + y) % P).astype(np.uint32)[None]
    fx = np.asarray(plan.fwd(x.astype(np.uint32)[None]))[0].astype(np.uint64)
    fy = np.asarray(plan.fwd(y.astype(np.uint32)[None]))[0].astype(np.uint64)
    lhs = np.asarray(plan.fwd(combo))[0].astype(np.uint64)
    rhs = (c * fx + fy) % P
    np.testing.assert_array_equal(lhs, rhs)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, (1 << 64) - 1),
    st.integers(0, N - 1),
    st.booleans(),
)
def test_native64_monomial_product_wraps_exactly(v, shift, negate):
    """lhs * (±x^s) is an exact rotation with sign wrap in Z/2^64[x]/(x^N+1)."""
    plan = native64.Plan32.try_new(N)
    lhs = np.full((1, N), v, dtype=np.uint64)
    lhs[0, ::3] = np.uint64(v ^ 0xDEADBEEF)
    rhs = np.zeros((1, N), dtype=np.uint64)
    rhs[0, shift] = np.uint64((1 << 64) - 1) if negate else np.uint64(1)
    got = np.asarray(plan.negacyclic_polymul(lhs, rhs))[0]
    rolled = np.zeros(N, dtype=np.uint64)
    rolled[shift:] = lhs[0, : N - shift]
    rolled[:shift] = (-lhs[0, N - shift :].astype(np.int64)).astype(np.uint64)
    want = (-rolled.astype(np.int64)).astype(np.uint64) if negate else rolled
    np.testing.assert_array_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 5))
def test_roundtrip_random_sizes(log_extra):
    n = 32 << log_extra  # 64..1024
    plan = prime32.Plan.try_new(n, P)
    assert plan is not None
    rng = np.random.default_rng(log_extra)
    x = rng.integers(0, P, (2, n), dtype=np.uint32)
    y = np.asarray(plan.inv(plan.fwd(x)))
    np.testing.assert_array_equal(
        y, (x.astype(np.uint64) * np.uint64(n) % np.uint64(P)).astype(np.uint32)
    )
