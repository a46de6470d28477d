"""Stage-split hybrid engine (ops/stagesplit.py): bit-exactness vs mxu64.

The hybrid must be indistinguishable from the direct four-step engine for
every prime regime, any-representative inputs (full u64 range — exercises
the wrap corrections in the prefix butterflies), both directions, folded
scales, and split depths ℓ = 1 and 2. Runs on the CPU backend (int8 dots
exact everywhere)."""

import numpy as np
import pytest

import jax.numpy as jnp

from concrete_ntt_tpu.ops import mxu64, stagesplit
from concrete_ntt_tpu.tables import GOLDILOCKS
from concrete_ntt_tpu.utils.prime import (
    largest_prime_in_arithmetic_progression64 as lpap,
)


def _regime_prime(n, tag):
    return {
        "p50": lambda: lpap(2 * n, 1, 0, 1 << 50),
        "p62": lambda: lpap(2 * n, 1, 1 << 61, 1 << 62),
        "p63": lambda: lpap(2 * n, 1, 1 << 62, 1 << 63),
        "gl": lambda: GOLDILOCKS,
        "p64": lambda: lpap(2 * n, 1, 1 << 63, (1 << 64) - 1),
    }[tag]()


def _limbs(rng, b, n):
    x = rng.integers(0, 1 << 64, (b, n), dtype=np.uint64)  # any representative
    return (
        jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


@pytest.mark.parametrize("tag", ["p50", "p62", "p63", "gl", "p64"])
@pytest.mark.parametrize("n,n_h", [(512, 256), (512, 128), (1024, 256)])
def test_hybrid_fwd_inv_match_mxu64(rng, n, n_h, tag):
    p = _regime_prime(n, tag)
    limbs = _limbs(rng, 2, n)
    got = stagesplit.fwd64(limbs, n=n, p=p, n_h=n_h)
    want = mxu64.fwd(limbs, n=n, p=p)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    got_i = stagesplit.inv64(limbs, n=n, p=p, n_h=n_h)
    want_i = mxu64.inv(limbs, n=n, p=p)
    for g, w in zip(got_i, want_i):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("tag", ["p50", "gl"])
def test_hybrid_inv_folded_scale(rng, tag):
    n, n_h = 512, 256
    p = _regime_prime(n, tag)
    s = pow(n, p - 2, p) * pow(2, 64, p) % p
    limbs = _limbs(rng, 2, n)
    got = stagesplit.inv64(limbs, n=n, p=p, scale=s, n_h=n_h)
    want = mxu64.inv(limbs, n=n, p=p, scale=s)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_dispatch_hybrid_at_2pow15_matches_direct(rng, monkeypatch):
    """The auto dispatch tier (n > 2^14, u64 pairs) is bit-identical to the
    direct four-step through the public dispatch entry points."""
    from concrete_ntt_tpu.ops import ntt_dispatch

    n = 1 << 15
    p = _regime_prime(n, "p50")
    limbs = _limbs(rng, 1, n)
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "0")
    want_f = ntt_dispatch.try_fwd64(limbs, n, p)
    want_i = ntt_dispatch.try_inv64(limbs, n, p, scale=7)
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "auto")
    got_f = ntt_dispatch.try_fwd64(limbs, n, p)
    got_i = ntt_dispatch.try_inv64(limbs, n, p, scale=7)
    for g, w in zip(got_f + got_i, want_f + want_i):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_hybrid_fused_pallas_interpret_matches_xla(rng, monkeypatch):
    """The fused-Pallas hybrid tier (prefix in XLA + per-block fused
    kernels with injected tables) in interpreter mode vs the XLA hybrid."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    n = 1 << 15
    p = _regime_prime(n, "p50")
    limbs = _limbs(rng, 2, n)
    got = stagesplit.fwd64_fused(limbs, n=n, p=p)
    want = stagesplit.fwd64(limbs, n=n, p=p)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    s = pow(n, p - 2, p) * pow(2, 64, p) % p
    got_i = stagesplit.inv64_fused(limbs, n=n, p=p, scale=s)
    want_i = stagesplit.inv64(limbs, n=n, p=p, scale=s)
    for g, w in zip(got_i, want_i):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize(
    "p",
    [
        (1 << 64) - (1 << 32) + 1,  # gl: c64 = 2^32-1, double wrap ~2^-32
        1125899904679937,           # ~2^50
        (1 << 62) - 57,             # large c64
        (1 << 63) + 29,             # p > 2^63 (c64 = 2^64 - p)
    ],
)
def test_rep_safe_add_sub64_adversarial(p):
    """_add_rep64/_sub_rep64 wrap corrections at the exact boundaries the
    random tests essentially never hit (second-wrap probability is
    c64/2^64 — 2^-32 for Goldilocks). Exhaustive over a boundary grid."""
    from concrete_ntt_tpu.ops.stagesplit import _add_rep64, _sub_rep64
    from concrete_ntt_tpu.ops.u32 import const64_like

    c64i = (1 << 64) % p
    c64 = const64_like(c64i)
    M = (1 << 64) - 1
    boundary = [0, 1, c64i - 1, c64i, c64i + 1, p - 1, p, p + 1,
                M - c64i - 1, M - c64i, M - c64i + 1, M - 1, M]
    boundary = sorted({v & M for v in boundary})
    a = np.array([x for x in boundary for _ in boundary], dtype=np.uint64)
    b = np.array([y for _ in boundary for y in boundary], dtype=np.uint64)
    pair = lambda v: (
        jnp.asarray((v & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
    )
    join = lambda t: np.asarray(t[0]).astype(np.uint64) | (
        np.asarray(t[1]).astype(np.uint64) << np.uint64(32)
    )
    got_add = join(_add_rep64(pair(a), pair(b), c64))
    got_sub = join(_sub_rep64(pair(a), pair(b), c64))
    for i in range(len(a)):
        assert int(got_add[i]) % p == (int(a[i]) + int(b[i])) % p
        assert int(got_sub[i]) % p == (int(a[i]) - int(b[i])) % p


@pytest.mark.parametrize("p", [1073479681, 2147352577, 4293918721])
def test_rep_safe_add_sub32_adversarial(p):
    from concrete_ntt_tpu.ops.stagesplit import _add_rep32, _sub_rep32

    c32i = (1 << 32) % p
    c32 = np.uint32(c32i)
    M = (1 << 32) - 1
    boundary = [0, 1, c32i - 1, c32i, c32i + 1, p - 1, p, p + 1,
                M - c32i - 1, M - c32i, M - c32i + 1, M - 1, M]
    boundary = sorted({v & M for v in boundary})
    a = np.array([x for x in boundary for _ in boundary], dtype=np.uint32)
    b = np.array([y for _ in boundary for y in boundary], dtype=np.uint32)
    got_add = np.asarray(_add_rep32(jnp.asarray(a), jnp.asarray(b), c32))
    got_sub = np.asarray(_sub_rep32(jnp.asarray(a), jnp.asarray(b), c32))
    for i in range(len(a)):
        assert int(got_add[i]) % p == (int(a[i]) + int(b[i])) % p
        assert int(got_sub[i]) % p == (int(a[i]) - int(b[i])) % p


def test_hybrid_hw_marker_gate(monkeypatch, tmp_path):
    """On real TPU the 'auto' hybrid tier requires the hardware parity
    marker; interpret/CPU and HYBRID=1 bypass it (ntt_dispatch)."""
    from concrete_ntt_tpu.ops import ntt_dispatch as nd

    monkeypatch.delenv("CONCRETE_NTT_TPU_HYBRID", raising=False)
    monkeypatch.delenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", raising=False)
    monkeypatch.setenv("CONCRETE_NTT_TPU_CACHE_DIR", str(tmp_path))
    # CPU: no Mosaic in the loop -> deployable
    assert nd._hybrid_deployable()
    # pretend we are on hardware: marker absent -> NOT deployable
    monkeypatch.setattr(nd, "_on_tpu", lambda: True)
    assert not nd._hybrid_deployable()
    # forcing overrides
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "1")
    assert nd._hybrid_deployable()
    monkeypatch.delenv("CONCRETE_NTT_TPU_HYBRID")
    # a marker for a DIFFERENT kernel tree does not count (round-4 advisor)
    with open(nd.hybrid_hw_verified_marker(), "w") as f:
        f.write("test\nkernels " + "0" * 64 + "\n")
    assert not nd._hybrid_deployable()
    # the parity run's marker (current kernel-tree hash) flips it on
    from concrete_ntt_tpu.ops.pallas_env import kernel_tree_hash

    with open(nd.hybrid_hw_verified_marker(), "w") as f:
        f.write(f"test\nkernels {kernel_tree_hash()}\n")
    assert nd._hybrid_deployable()


def _regime_prime32(n, tag):
    return {
        "lt30": lambda: lpap(2 * n, 1, 0, 1 << 30),
        "lt31": lambda: lpap(2 * n, 1, 1 << 30, 1 << 31),
        "gen": lambda: lpap(2 * n, 1, 1 << 31, (1 << 32) - 1),
    }[tag]()


@pytest.mark.parametrize("tag", ["lt30", "lt31", "gen"])
@pytest.mark.parametrize("n,n_h", [(512, 256), (512, 128), (1024, 256)])
def test_hybrid32_fwd_inv_match_mxu32(rng, n, n_h, tag):
    from concrete_ntt_tpu.ops import mxu32, stagesplit as ss

    p = _regime_prime32(n, tag)
    x = jnp.asarray(rng.integers(0, 1 << 32, (2, n), dtype=np.uint64)
                    .astype(np.uint32))  # any u32 representative
    np.testing.assert_array_equal(
        np.asarray(ss.fwd32(x, n=n, p=p, n_h=n_h)),
        np.asarray(mxu32.fwd(x, n=n, p=p)),
    )
    s = pow(n, p - 2, p) * pow(2, 32, p) % p
    np.testing.assert_array_equal(
        np.asarray(ss.inv32(x, n=n, p=p, scale=s, n_h=n_h)),
        np.asarray(mxu32.inv(x, n=n, p=p, scale=s)),
    )


def test_dispatch_hybrid32_at_2pow15_matches_direct(rng, monkeypatch):
    from concrete_ntt_tpu import prime32

    n = 1 << 15
    p = _regime_prime32(n, "lt30")
    x = rng.integers(0, p, (1, n), dtype=np.uint32)
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "0")
    plan = prime32.Plan.new(n, p)
    want_f = np.asarray(plan.fwd(x))
    want_i = np.asarray(plan.inv(x))
    # the 32-bit hybrid is off in 'auto' since round 5 (slower than the
    # direct fused kernels at every size on hardware); =1 forces it so the
    # tier stays bit-exactness-covered
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "1")
    np.testing.assert_array_equal(np.asarray(plan.fwd(x)), want_f)
    np.testing.assert_array_equal(np.asarray(plan.inv(x)), want_i)


def test_hybrid32_fused_pallas_interpret_matches_xla(rng, monkeypatch):
    from concrete_ntt_tpu.ops import stagesplit as ss

    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    n = 1 << 15
    p = _regime_prime32(n, "lt30")
    x = jnp.asarray(rng.integers(0, 1 << 32, (2, n), dtype=np.uint64)
                    .astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(ss.fwd32_fused(x, n=n, p=p)),
        np.asarray(ss.fwd32(x, n=n, p=p)),
    )
    s = pow(n, p - 2, p) * pow(2, 32, p) % p
    np.testing.assert_array_equal(
        np.asarray(ss.inv32_fused(x, n=n, p=p, scale=s)),
        np.asarray(ss.inv32(x, n=n, p=p, scale=s)),
    )


def test_channel_hybrid64_fwd_matches_per_channel(rng, monkeypatch):
    """Hybrid channel-grid forward (per-channel prefix + per-block grid
    kernels, interpret mode) vs the XLA engine per channel."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    from concrete_ntt_tpu.ops import stagesplit as ss
    from concrete_ntt_tpu.tables import PRIMES52

    n = 1 << 15
    primes = tuple(PRIMES52[:3])
    limbs = _limbs(rng, 2, n)
    lo, hi = ss.fwd_multi_hybrid64(limbs, primes, n=n)
    for i, p in enumerate(primes):
        want = mxu64.fwd(limbs, n=n, p=p)
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


def test_channel_hybrid64_pointwise_inv_matches_per_channel(rng, monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    from concrete_ntt_tpu.ops import stagesplit as ss
    from concrete_ntt_tpu.ops.u32 import mont_mul64, mont_neginv64
    from concrete_ntt_tpu.tables import PRIMES52

    n = 1 << 15
    primes = tuple(PRIMES52[:3])
    scales = tuple(pow(n, p - 2, p) * pow(2, 64, p) % p for p in primes)
    mk = lambda: jnp.asarray(
        rng.integers(0, 1 << 32, (3, 2, n), dtype=np.uint64).astype(np.uint32)
    )
    fl, fr = (mk(), mk()), (mk(), mk())
    lo, hi = ss.pointwise_inv_multi_hybrid64(fl, fr, primes, scales, n=n)
    for i, p in enumerate(primes):
        prod = mont_mul64(
            (fl[0][i], fl[1][i]), (fr[0][i], fr[1][i]), p, mont_neginv64(p)
        )
        want = mxu64.inv(prod, n=n, p=p, scale=scales[i])
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


def test_native52_polymul_hybrid_dispatch_bit_exact(rng, monkeypatch):
    """End-to-end native64.Plan52 polymul at n=2^15 through the dispatch
    layer: hybrid on vs off (interpret mode), bit-identical."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    from concrete_ntt_tpu import native64

    n = 1 << 15
    plan = native64.Plan52.try_new(n)
    assert plan is not None
    a = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "0")
    want = np.asarray(plan.negacyclic_polymul(a, b))
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "auto")
    got = np.asarray(plan.negacyclic_polymul(a, b))
    np.testing.assert_array_equal(got, want)


def test_channel_hybrid32_wide_fwd_matches_per_channel(rng, monkeypatch):
    """32-bit channel hybrid: u64-pair prefix per channel (split stays
    fused) + per-block wide perchannel kernels vs mxu32.fwd_wide."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    from concrete_ntt_tpu.ops import mxu32, stagesplit as ss
    from concrete_ntt_tpu.tables import PRIMES32

    n = 1 << 15
    primes = tuple(PRIMES32[:3])
    limbs = _limbs(rng, 2, n)
    out = ss.fwd_wide_multi_hybrid32(limbs, primes, n=n)
    for i, p in enumerate(primes):
        want = mxu32.fwd_wide(limbs, n=n, p=p)
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(want))


def test_channel_hybrid32_inv_matches_per_channel(rng, monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    from concrete_ntt_tpu.ops import mxu32, stagesplit as ss
    from concrete_ntt_tpu.tables import PRIMES32

    n = 1 << 15
    primes = tuple(PRIMES32[:3])
    scales = tuple(pow(n, p - 2, p) * pow(2, 32, p) % p for p in primes)
    x = jnp.asarray(
        rng.integers(0, 1 << 32, (3, 2, n), dtype=np.uint64).astype(np.uint32)
    )
    out = ss.inv_multi_hybrid32(x, primes, scales, n=n)
    for i, p in enumerate(primes):
        want = mxu32.inv(x[i], n=n, p=p, scale=scales[i])
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(want))


def test_native32ch_polymul_hybrid_dispatch_bit_exact(rng, monkeypatch):
    """End-to-end native64.Plan32 (the flagship family) polymul at n=2^15
    through the stacked dispatch fast path: hybrid on vs off, bit-exact."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    from concrete_ntt_tpu import native64

    n = 1 << 15
    plan = native64.Plan32.try_new(n)
    assert plan is not None
    a = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "0")
    want = np.asarray(plan.negacyclic_polymul(a, b))
    # forced: the 32-bit channel hybrid is off in 'auto' since round 5
    monkeypatch.setenv("CONCRETE_NTT_TPU_HYBRID", "1")
    got = np.asarray(plan.negacyclic_polymul(a, b))
    np.testing.assert_array_equal(got, want)


def test_hybrid_roundtrip_is_n_times_x(rng):
    n, n_h = 1024, 256
    p = _regime_prime(n, "p50")
    x = rng.integers(0, p, (2, n), dtype=np.uint64)
    limbs = (
        jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )
    y = stagesplit.inv64(
        stagesplit.fwd64(limbs, n=n, p=p, n_h=n_h), n=n, p=p, n_h=n_h
    )
    got = np.asarray(y[0]).astype(np.uint64) | (
        np.asarray(y[1]).astype(np.uint64) << np.uint64(32)
    )
    want = (x.astype(object) * n % p).astype(np.uint64)
    np.testing.assert_array_equal(got, want)
