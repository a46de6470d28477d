"""Sub-8 batch tiles — the single-polynomial latency mitigation (round-3
verdict item 5).

The Pallas kernels' proven batch tile is 8 rows; a B=1 call used to pad to
8, an 8x compute floor on the reference's native metric (one-poly latency,
/root/reference/benches/ntt.rs:84-132). ops/pallas_env.batch_tile now
serves B < 8 with bt in {1, 2, 4} kernel variants (kernel rows stay
bt*n2 >= 128, so the MXU contraction remains full-width). These tests pin
bit-exactness of every sub-tile kernel family in interpret mode and the
hardware gate semantics (real TPU requires the smallb parity marker —
Mosaic miscompiles are real, CLAUDE.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from concrete_ntt_tpu.ops import mxu32, mxu32_pallas, mxu64, mxu64_pallas
from concrete_ntt_tpu.ops import pallas_env
from concrete_ntt_tpu.tables import GOLDILOCKS, PRIMES32, PRIMES52


@pytest.fixture(autouse=True)
def _interp(monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")


def _limbs(rng, b, n):
    x = rng.integers(0, 1 << 64, (b, n), dtype=np.uint64)
    return (
        jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def test_batch_tile_selection(monkeypatch):
    monkeypatch.setenv("CONCRETE_NTT_TPU_SMALLB", "1")
    assert [pallas_env.batch_tile(b) for b in (1, 2, 3, 4, 5, 7, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8, 8
    ]
    monkeypatch.setenv("CONCRETE_NTT_TPU_SMALLB", "0")
    assert pallas_env.batch_tile(1) == 8


def test_smallb_gate_requires_marker_on_tpu(monkeypatch, tmp_path):
    """On real TPU 'auto' requires the smallb parity marker; interpret/CPU
    and SMALLB=1 bypass it (mirrors the hybrid marker gate)."""
    monkeypatch.delenv("CONCRETE_NTT_TPU_SMALLB", raising=False)
    monkeypatch.setenv("CONCRETE_NTT_TPU_CACHE_DIR", str(tmp_path))
    assert pallas_env.small_batch_tiles()  # interpret mode (autouse fixture)
    monkeypatch.delenv("CONCRETE_NTT_TPU_PALLAS_INTERPRET")
    # pretend hardware: marker absent -> bt stays 8
    import jax

    class _Dev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda: [_Dev()])
    assert not pallas_env.small_batch_tiles()
    monkeypatch.setenv("CONCRETE_NTT_TPU_SMALLB", "1")
    assert pallas_env.small_batch_tiles()
    monkeypatch.delenv("CONCRETE_NTT_TPU_SMALLB")
    # a marker without the current kernel-tree hash is STALE (round-4
    # advisor: verification must be tied to the kernel code it ran on)
    with open(pallas_env.smallb_hw_verified_marker(), "w") as f:
        f.write("test\n")
    assert not pallas_env.small_batch_tiles()
    with open(pallas_env.smallb_hw_verified_marker(), "w") as f:
        f.write(f"test\nkernels {pallas_env.kernel_tree_hash()}\n")
    assert pallas_env.small_batch_tiles()


@pytest.mark.parametrize("b", [1, 2, 3])
def test_fused32_smallb_bit_exact(rng, b):
    n, p = 1 << 14, PRIMES32[0]
    x = jnp.asarray(rng.integers(0, 1 << 32, (b, n), dtype=np.uint64)
                    .astype(np.uint32))
    s = pow(n, p - 2, p) * pow(2, 32, p) % p
    np.testing.assert_array_equal(
        np.asarray(mxu32_pallas.fwd(x, n=n, p=p)),
        np.asarray(mxu32.fwd(x, n=n, p=p)),
    )
    np.testing.assert_array_equal(
        np.asarray(mxu32_pallas.inv(x, n=n, p=p, scale=s)),
        np.asarray(mxu32.inv(x, n=n, p=p, scale=s)),
    )


@pytest.mark.parametrize("b", [1, 3])
def test_fused64_smallb_bit_exact(rng, b):
    n, p = 1 << 14, GOLDILOCKS
    limbs = _limbs(rng, b, n)
    got = mxu64_pallas.fwd(limbs, n=n, p=p)
    want = mxu64.fwd(limbs, n=n, p=p)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    s = pow(n, p - 2, p) * pow(2, 64, p) % p
    got_i = mxu64_pallas.inv(limbs, n=n, p=p, scale=s)
    want_i = mxu64.inv(limbs, n=n, p=p, scale=s)
    for g, w in zip(got_i, want_i):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_channel_grid_smallb_bit_exact(rng):
    n = 1 << 14
    primes = tuple(PRIMES32[:5])
    limbs = _limbs(rng, 1, n)
    got = np.asarray(mxu32_pallas.fwd_wide_multi(limbs, primes))
    for i, p in enumerate(primes):
        np.testing.assert_array_equal(
            got[i], np.asarray(mxu32.fwd_wide(limbs, n=n, p=p))
        )
    pr52 = tuple(PRIMES52[:3])
    lo, hi = mxu64_pallas.fwd_multi(limbs, pr52)
    for i, p in enumerate(pr52):
        want = mxu64.fwd(limbs, n=n, p=p)
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(want[0]))
        np.testing.assert_array_equal(np.asarray(hi[i]), np.asarray(want[1]))


def test_passes_smallb_bit_exact(rng):
    n, p = 4096, PRIMES32[0]
    x = jnp.asarray(rng.integers(0, 1 << 32, (1, n), dtype=np.uint64)
                    .astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(mxu32_pallas.passes_engine.fwd(x, n=n, p=p)),
        np.asarray(mxu32.fwd(x, n=n, p=p)),
    )
    limbs = _limbs(rng, 1, n)
    got = mxu64_pallas.passes_engine64.fwd(limbs, n=n, p=GOLDILOCKS)
    want = mxu64.fwd(limbs, n=n, p=GOLDILOCKS)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_native64_polymul_b1_end_to_end(rng, monkeypatch):
    """B=1 native64 polymul through the full dispatch stack (the latency
    call shape) == the B=8 result row-for-row."""
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    from concrete_ntt_tpu import native64

    n = 1 << 14
    plan = native64.Plan32.try_new(n)
    a = rng.integers(0, 1 << 64, (8, n), dtype=np.uint64)
    b = rng.integers(0, 1 << 64, (8, n), dtype=np.uint64)
    want = np.asarray(plan.negacyclic_polymul(a, b))
    got1 = np.asarray(plan.negacyclic_polymul(a[:1], b[:1]))
    np.testing.assert_array_equal(got1, want[:1])
