"""Pallas production kernels under test: interpreter-mode bit-exactness.

Every Pallas kernel entry point (ops/pallas32.py, ops/mxu32_pallas.py,
ops/mxu64_pallas.py) runs here in Pallas interpreter mode — the same kernel
functions, block specs, grids, and traced-scalar epilogues that execute on
TPU — and is asserted bit-exact against the XLA engines (which are
themselves golden-verified by the rest of the suite). This is the TPU-build
analogue of the reference's lane-exact SIMD-vs-scalar tests
(/root/reference/src/lib.rs:794-908, prime32.rs:1261-1434): the "SIMD"
engine is the Pallas kernel, the "scalar" twin is the XLA path.

Interpreter mode cannot reproduce Mosaic *compiler* bugs (those are caught
by the on-TPU parity checks in benches/run.py --verify and the recorded
fragile-shape gates in ops/ntt_dispatch.py), but it pins the kernel
*algebra* — any regression in the shared epilogue/combine/digit code or the
kernel-side scalar plumbing fails here on CPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from concrete_ntt_tpu.ops import mxu32, mxu32_pallas, mxu64, mxu64_pallas, pallas32
from concrete_ntt_tpu.ops.u32 import mont_mul, mont_mul64, mont_neginv64
from concrete_ntt_tpu.tables import GOLDILOCKS, PRIMES32, PRIMES52
from concrete_ntt_tpu.utils.prime import largest_prime_in_arithmetic_progression64

N_BIG = 1 << 14  # smallest n served by the fused whole-transform kernels


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")


def _scale(n, p):
    return pow(n, p - 2, p) * pow(2, 32, p) % p


# ---------------------------------------------------------------------------
# pallas32 — fused VPU butterfly kernel (roll/select stages)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize(
    "variant,p",
    [
        ("lt30", None),  # p filled per n below
        ("lt31", None),
        ("generic", None),
    ],
)
def test_pallas32_fwd_inv_vs_xla(rng, monkeypatch, n, variant, p):
    lo, hi = {
        "lt30": (0, 1 << 30),
        "lt31": (1 << 30, 1 << 31),
        "generic": (1 << 31, (1 << 32) - 1),
    }[variant]
    p = largest_prime_in_arithmetic_progression64(2 * n, 1, lo, hi)
    from concrete_ntt_tpu import prime32

    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "xla")
    plan = prime32.Plan.new(n, p)
    assert plan.variant == variant
    x = rng.integers(0, p, (9, n), dtype=np.uint32)  # 9: exercises pad path
    want_f = np.asarray(plan.fwd(x))
    want_i = np.asarray(plan.inv(x))

    got_f = pallas32.try_fwd(
        jnp.asarray(x), None, p=p, variant=variant, p_neginv=plan.p_neginv
    )
    got_i = pallas32.try_inv(
        jnp.asarray(x), None, p=p, variant=variant, p_neginv=plan.p_neginv
    )
    assert got_f is not None and got_i is not None
    np.testing.assert_array_equal(np.asarray(got_f), want_f)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


# ---------------------------------------------------------------------------
# mxu32_pallas — whole-transform fused kernel (n >= 2^14)
# ---------------------------------------------------------------------------


def test_mxu32_fused_fwd_inv_vs_xla(rng):
    p = PRIMES32[0]
    x = rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32)
    want_f = np.asarray(mxu32.fwd(jnp.asarray(x), n=N_BIG, p=p))
    got_f = np.asarray(mxu32_pallas.fwd(jnp.asarray(x), n=N_BIG, p=p))
    np.testing.assert_array_equal(got_f, want_f)

    s = _scale(N_BIG, p)
    want_i = np.asarray(mxu32.inv(jnp.asarray(x), n=N_BIG, p=p, scale=s))
    got_i = np.asarray(mxu32_pallas.inv(jnp.asarray(x), n=N_BIG, p=p, scale=s))
    np.testing.assert_array_equal(got_i, want_i)


def test_mxu32_fused_batch_padding(rng):
    p = PRIMES32[1]
    x = rng.integers(0, 1 << 32, (3, N_BIG), dtype=np.uint32)
    want = np.asarray(mxu32.fwd(jnp.asarray(x), n=N_BIG, p=p))
    got = np.asarray(mxu32_pallas.fwd(jnp.asarray(x), n=N_BIG, p=p))
    assert got.shape == (3, N_BIG)
    np.testing.assert_array_equal(got, want)


def test_mxu32_fused_fwd_wide_vs_xla(rng):
    p = PRIMES32[2]
    limbs = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    want = np.asarray(mxu32.fwd_wide(limbs, n=N_BIG, p=p))
    got = np.asarray(mxu32_pallas.fwd_wide(limbs, n=N_BIG, p=p))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# mxu32_pallas — channel-grid kernels (all CRT channels, one pallas_call)
# ---------------------------------------------------------------------------


def test_channel_grid_fwd_wide_multi_vs_xla(rng):
    primes = PRIMES32[:5]
    limbs = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    got = np.asarray(mxu32_pallas.fwd_wide_multi(limbs, primes))
    assert got.shape == (5, 8, N_BIG)
    for i, p in enumerate(primes):
        want = np.asarray(mxu32.fwd_wide(limbs, n=N_BIG, p=p))
        np.testing.assert_array_equal(got[i], want, err_msg=f"channel {i}")


def test_channel_grid_inv_multi_vs_xla(rng):
    primes = PRIMES32[:3]
    x = jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32))
    scales = tuple(_scale(N_BIG, p) for p in primes)
    got = np.asarray(mxu32_pallas.inv_multi(x, primes, scales))
    for i, p in enumerate(primes):
        want = np.asarray(mxu32.inv(x[i], n=N_BIG, p=p, scale=scales[i]))
        np.testing.assert_array_equal(got[i], want, err_msg=f"channel {i}")


def test_channel_grid_inv_multi_presplit_matches_inv_multi(rng):
    """Pre-split digit-plane input (digit_planes32 + inv_multi_presplit)
    is bit-identical to the in-kernel-split inv_multi, including at a
    padded batch."""
    primes = PRIMES32[:3]
    scales = tuple(_scale(N_BIG, p) for p in primes)
    for b in (8, 5):
        x = jnp.asarray(rng.integers(0, 1 << 32, (3, b, N_BIG), dtype=np.uint32))
        want = np.asarray(mxu32_pallas.inv_multi(x, primes, scales))
        xd = mxu32_pallas.digit_planes32(x)
        assert xd.dtype == jnp.int8 and xd.shape[-2] * xd.shape[-1] == 4 * N_BIG
        got = np.asarray(mxu32_pallas.inv_multi_presplit(xd, primes, scales))
        np.testing.assert_array_equal(got, want, err_msg=f"b={b}")


def test_polymul32_stacked_presplit_dispatch(rng, monkeypatch):
    """CONCRETE_NTT_TPU_PRESPLIT=1 routes the stacked polymul inverse
    through the pre-split path with an unchanged result."""
    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import ntt_dispatch

    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    plan = native64.Plan32.try_new(N_BIG)
    assert plan is not None
    parts_l = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    parts_r = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    monkeypatch.setenv("CONCRETE_NTT_TPU_PRESPLIT", "0")
    want = ntt_dispatch.try_polymul32_stacked(parts_l, parts_r, plan.plans)
    assert want is not None
    monkeypatch.setenv("CONCRETE_NTT_TPU_PRESPLIT", "1")
    got = ntt_dispatch.try_polymul32_stacked(parts_l, parts_r, plan.plans)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_channel_grid_pointwise_inv_multi_vs_xla(rng):
    primes = PRIMES32[:3]
    fl = jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32))
    fr = jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32))
    scales = tuple(_scale(N_BIG, p) for p in primes)
    got = np.asarray(mxu32_pallas.pointwise_inv_multi(fl, fr, primes, scales))
    for i, p in enumerate(primes):
        from concrete_ntt_tpu import prime32

        pl = prime32.Plan.new(N_BIG, p)
        prod = mont_mul(fl[i], fr[i], p, pl.p_neginv)
        want = np.asarray(mxu32.inv(prod, n=N_BIG, p=p, scale=scales[i]))
        np.testing.assert_array_equal(got[i], want, err_msg=f"channel {i}")


# ---------------------------------------------------------------------------
# mxu32_pallas — per-pass kernels + the mid-size passes engine
# ---------------------------------------------------------------------------


def test_pass_matmod_all_passes_vs_xla(rng):
    n = 4096
    p = PRIMES32[0]
    tbl = mxu32._mxu_tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]
    d = tuple(jnp.asarray(a) for a in tbl["d"])
    e = tuple(jnp.asarray(a) for a in tbl["e"])

    v = jnp.asarray(rng.integers(0, 1 << 32, (8, n2, n1), dtype=np.uint32))
    want = np.asarray(mxu32._matmod_scaled_lazy(v, tbl["A"], tbl["d"], tbl, p=p))
    got = np.asarray(mxu32_pallas.pass_matmod(v, n=n, p=p, which="A", diag_slices=d))
    np.testing.assert_array_equal(got, want)

    y = jnp.asarray(rng.integers(0, 1 << 32, (8, n1, n2), dtype=np.uint32))
    want = np.asarray(mxu32._matmod(y, tbl["F"], tbl, p=p))
    got = np.asarray(mxu32_pallas.pass_matmod(y, n=n, p=p, which="F"))
    np.testing.assert_array_equal(got, want)

    want = np.asarray(mxu32._matmod_scaled_lazy(y, tbl["G"], tbl["e"], tbl, p=p))
    got = np.asarray(mxu32_pallas.pass_matmod(y, n=n, p=p, which="G", diag_slices=e))
    np.testing.assert_array_equal(got, want)

    want = np.asarray(mxu32._matmod(v, tbl["Ainv"], tbl, p=p))
    got = np.asarray(mxu32_pallas.pass_matmod(v, n=n, p=p, which="Ainv"))
    np.testing.assert_array_equal(got, want)

    # scaled Ainv + wide (2-limb) column pass
    s = _scale(n, p)
    mat = mxu32._scaled_ainv_planes(n, p, s)
    want = np.asarray(mxu32._matmod(v, mat, tbl, p=p))
    got = np.asarray(mxu32_pallas.pass_matmod(v, n=n, p=p, which="Ainv", scale=s))
    np.testing.assert_array_equal(got, want)

    wv = (v, jnp.asarray(rng.integers(0, 1 << 32, (8, n2, n1), dtype=np.uint32)))
    wide = mxu32._wide_col_planes(n, p, 2)
    want = np.asarray(mxu32._matmod_scaled_lazy(wv, wide, tbl["d"], tbl, p=p))
    got = np.asarray(
        mxu32_pallas.pass_matmod(wv, n=n, p=p, which="A", diag_slices=d, n_limbs=2)
    )
    np.testing.assert_array_equal(got, want)


def test_pass_matmod_sharded_rows_slice(rng):
    """pass_matmod as used by parallel/fourstep_mxu.py: rank-local row slice
    of the operand with the matching diagonal slice."""
    n = 4096
    p = PRIMES32[1]
    tbl = mxu32._mxu_tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]
    s = 2  # two ranks
    v = jnp.asarray(rng.integers(0, 1 << 32, (8, n2, n1), dtype=np.uint32))
    full = np.asarray(mxu32._matmod_scaled_lazy(v, tbl["A"], tbl["d"], tbl, p=p))
    for r in range(s):
        sl = slice(r * n2 // s, (r + 1) * n2 // s)
        d_loc = tuple(jnp.asarray(a[sl]) for a in tbl["d"])
        got = np.asarray(
            mxu32_pallas.pass_matmod(v[:, sl], n=n, p=p, which="A", diag_slices=d_loc)
        )
        np.testing.assert_array_equal(got, full[:, sl], err_msg=f"rank {r}")


def test_passes_engine_fwd_inv_vs_xla(rng):
    n = 4096
    p = PRIMES32[0]
    x = rng.integers(0, 1 << 32, (8, n), dtype=np.uint32)
    want_f = np.asarray(mxu32.fwd(jnp.asarray(x), n=n, p=p))
    got_f = np.asarray(mxu32_pallas.passes_engine.fwd(jnp.asarray(x), n=n, p=p))
    np.testing.assert_array_equal(got_f, want_f)

    s = _scale(n, p)
    want_i = np.asarray(mxu32.inv(jnp.asarray(x), n=n, p=p, scale=s))
    got_i = np.asarray(mxu32_pallas.passes_engine.inv(jnp.asarray(x), n=n, p=p, scale=s))
    np.testing.assert_array_equal(got_i, want_i)

    limbs = (jnp.asarray(x), jnp.asarray(rng.integers(0, 1 << 32, (8, n), dtype=np.uint32)))
    want_w = np.asarray(mxu32.fwd_wide(limbs, n=n, p=p))
    got_w = np.asarray(mxu32_pallas.passes_engine.fwd_wide(limbs, n=n, p=p))
    np.testing.assert_array_equal(got_w, want_w)


@pytest.mark.parametrize("n", [2048])
def test_passes_engine_row_fused_midsize(rng, n):
    """n=2048: the n1=32 pass runs row-fused (kron(I_4, M), 128 lanes)."""
    p = PRIMES32[0]
    x = rng.integers(0, 1 << 32, (8, n), dtype=np.uint32)
    want_f = np.asarray(mxu32.fwd(jnp.asarray(x), n=n, p=p))
    got_f = np.asarray(mxu32_pallas.passes_engine.fwd(jnp.asarray(x), n=n, p=p))
    np.testing.assert_array_equal(got_f, want_f)
    s = _scale(n, p)
    want_i = np.asarray(mxu32.inv(jnp.asarray(x), n=n, p=p, scale=s))
    got_i = np.asarray(mxu32_pallas.passes_engine.inv(jnp.asarray(x), n=n, p=p, scale=s))
    np.testing.assert_array_equal(got_i, want_i)
    limbs = (jnp.asarray(x),
             jnp.asarray(rng.integers(0, 1 << 32, (8, n), dtype=np.uint32)))
    want_w = np.asarray(mxu32.fwd_wide(limbs, n=n, p=p))
    got_w = np.asarray(mxu32_pallas.passes_engine.fwd_wide(limbs, n=n, p=p))
    np.testing.assert_array_equal(got_w, want_w)


@pytest.mark.parametrize("n", [2048, 4096, 8192])
@pytest.mark.parametrize("p", [GOLDILOCKS, PRIMES52[0]])
def test_mxu64_passes_engine_midsize(rng, n, p):
    """prime64 mid-size tier: row-fused pass kernels vs the XLA engine."""
    assert mxu64_pallas.passes_applicable(n)
    limbs = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, n), dtype=np.uint32))
        for _ in range(2)
    )
    want = mxu64.fwd(limbs, n=n, p=p)
    got = mxu64_pallas.passes_engine64.fwd(limbs, n=n, p=p)
    for a, b, nm in zip(got, want, ("lo", "hi")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
    s = pow(n, p - 2, p) * pow(2, 64, p) % p
    want = mxu64.inv(limbs, n=n, p=p, scale=s)
    got = mxu64_pallas.passes_engine64.inv(limbs, n=n, p=p, scale=s)
    for a, b, nm in zip(got, want, ("lo", "hi")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)


# ---------------------------------------------------------------------------
# mxu64_pallas — whole-transform fused 64-bit kernel
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "p",
    [
        GOLDILOCKS,  # 9-digit planes + shift/add top-limb fold
        PRIMES52[0],  # 8-digit, Barrett canonical epilogue
        largest_prime_in_arithmetic_progression64(
            2 * N_BIG, 1, 1 << 62, 1 << 63
        ),  # Shoup fold + double-cond-sub canonical
        largest_prime_in_arithmetic_progression64(
            2 * N_BIG, 1, 1 << 63, (1 << 64) - 1
        ),  # 9-digit + Montgomery top-limb fold (p >= 2^63, non-Goldilocks)
    ],
)
def test_mxu64_fused_fwd_inv_vs_xla(rng, p):
    limbs = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    want = mxu64.fwd(limbs, n=N_BIG, p=p)
    got = mxu64_pallas.fwd(limbs, n=N_BIG, p=p)
    for a, b, name in zip(got, want, ("lo", "hi")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)

    s = pow(N_BIG, p - 2, p) * pow(2, 64, p) % p
    want = mxu64.inv(limbs, n=N_BIG, p=p, scale=s)
    got = mxu64_pallas.inv(limbs, n=N_BIG, p=p, scale=s)
    for a, b, name in zip(got, want, ("lo", "hi")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


# ---------------------------------------------------------------------------
# mxu64_pallas — channel-grid kernels (all Plan52 channels, one pallas_call)
# ---------------------------------------------------------------------------


def test_mxu64_channel_grid_fwd_multi_vs_xla(rng):
    primes = PRIMES52[:3]
    limbs = tuple(
        jnp.asarray(rng.integers(0, 1 << 32, (8, N_BIG), dtype=np.uint32))
        for _ in range(2)
    )
    lo, hi = mxu64_pallas.fwd_multi(limbs, primes)
    assert lo.shape == (3, 8, N_BIG)
    for i, p in enumerate(primes):
        want = mxu64.fwd(limbs, n=N_BIG, p=p)
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


def test_mxu64_channel_grid_inv_multi_vs_xla(rng):
    primes = PRIMES52[:3]
    x_lo = jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32))
    x_hi = jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32))
    scales = tuple(pow(N_BIG, p - 2, p) * pow(2, 64, p) % p for p in primes)
    lo, hi = mxu64_pallas.inv_multi(x_lo, x_hi, primes, scales)
    for i, p in enumerate(primes):
        want = mxu64.inv((x_lo[i], x_hi[i]), n=N_BIG, p=p, scale=scales[i])
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


def test_mxu64_channel_grid_pointwise_inv_multi_vs_xla(rng):
    primes = PRIMES52[:3]

    def mk():
        return (
            jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 1 << 32, (3, 8, N_BIG), dtype=np.uint32)),
        )

    fl, fr = mk(), mk()
    scales = tuple(pow(N_BIG, p - 2, p) * pow(2, 64, p) % p for p in primes)
    lo, hi = mxu64_pallas.pointwise_inv_multi(fl, fr, primes, scales)
    for i, p in enumerate(primes):
        prod = mont_mul64(
            (fl[0][i], fl[1][i]), (fr[0][i], fr[1][i]), p, mont_neginv64(p)
        )
        want = mxu64.inv(prod, n=N_BIG, p=p, scale=scales[i])
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


# ---------------------------------------------------------------------------
# Dispatch integration: the full native polymul pipeline through the fused
# kernels (ENGINE=mxu + interpret) against the forced-XLA pipeline.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_native64_polymul_through_pallas_kernels(rng, monkeypatch):
    from concrete_ntt_tpu import native64

    plan = native64.Plan32.try_new(N_BIG)
    assert plan is not None
    lhs = rng.integers(0, 1 << 64, (2, N_BIG), dtype=np.uint64)
    rhs = rng.integers(0, 1 << 64, (2, N_BIG), dtype=np.uint64)

    monkeypatch.setenv("CONCRETE_NTT_TPU_FORCE_XLA", "1")
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    monkeypatch.delenv("CONCRETE_NTT_TPU_FORCE_XLA")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    got = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    np.testing.assert_array_equal(got, want)


def test_product_2xu32_fused_polymul_through_pallas_kernels(rng, monkeypatch):
    """The tfhe-rs hot path (2xu32 product plan) through the channel-grid
    kernels: fused split+fwd, Montgomery pointwise + scaled inverse, CRT
    lift (+ accumulate) — vs the forced-XLA generic path."""
    from concrete_ntt_tpu import product

    f1, f2 = PRIMES32[0], PRIMES32[1]
    m = f1 * f2
    plan = product.Plan.new(N_BIG, m, (f1, f2))
    lhs = (rng.integers(0, m, (2, N_BIG)).astype(np.uint64))
    rhs = (rng.integers(0, m, (2, N_BIG)).astype(np.uint64))
    acc0 = (rng.integers(0, m, (2, N_BIG)).astype(np.uint64))

    monkeypatch.setenv("CONCRETE_NTT_TPU_FORCE_XLA", "1")
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    want_acc = np.asarray(
        plan.negacyclic_polymul(lhs, rhs, mode=product.ACCUMULATE, standard=acc0)
    )
    monkeypatch.delenv("CONCRETE_NTT_TPU_FORCE_XLA")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    got = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    got_acc = np.asarray(
        plan.negacyclic_polymul(lhs, rhs, mode=product.ACCUMULATE, standard=acc0)
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got_acc, want_acc)

    # standalone fwd/inv also ride the channel-grid kernels
    monkeypatch.setenv("CONCRETE_NTT_TPU_FORCE_XLA", "1")
    want_dom = plan.fwd(lhs)
    want_back = np.asarray(plan.inv(plan.normalize(want_dom)))
    monkeypatch.delenv("CONCRETE_NTT_TPU_FORCE_XLA")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    got_dom = plan.fwd(lhs)
    np.testing.assert_array_equal(np.asarray(got_dom.res32), np.asarray(want_dom.res32))
    got_back = np.asarray(plan.inv(plan.normalize(got_dom)))
    np.testing.assert_array_equal(got_back, want_back)


def test_native_binary64_polymul_through_pallas_kernels(rng, monkeypatch):
    """rhs_binary path of the stacked fast path (fwd_binary semantics)."""
    from concrete_ntt_tpu import native_binary64

    plan = native_binary64.Plan32.try_new(N_BIG)
    assert plan is not None
    lhs = rng.integers(0, 1 << 64, (2, N_BIG), dtype=np.uint64)
    rhs = rng.integers(0, 2, (2, N_BIG)).astype(np.uint64)

    monkeypatch.setenv("CONCRETE_NTT_TPU_FORCE_XLA", "1")
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs, rhs_binary=True))
    monkeypatch.delenv("CONCRETE_NTT_TPU_FORCE_XLA")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    got = np.asarray(plan.negacyclic_polymul(lhs, rhs, rhs_binary=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_native64_plan52_fwd_through_pallas_kernels(rng, monkeypatch):
    from concrete_ntt_tpu import native64

    plan = native64.Plan52.try_new(N_BIG)
    assert plan is not None
    x = rng.integers(0, 1 << 64, (2, N_BIG), dtype=np.uint64)

    monkeypatch.setenv("CONCRETE_NTT_TPU_FORCE_XLA", "1")
    want = np.asarray(plan.fwd(x))
    monkeypatch.delenv("CONCRETE_NTT_TPU_FORCE_XLA")
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    got = np.asarray(plan.fwd(x))
    np.testing.assert_array_equal(got, want)
