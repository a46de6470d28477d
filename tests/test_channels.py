"""CRT channels sharded over a mesh axis (the north-star multi-chip config).

Validates parallel/channels.py on the virtual 8-device CPU mesh: the full
dp × ch × sp composition (batch data-parallel, CRT channels channel-parallel,
four-step transform sharded with one all-to-all per pass pair) must be
bit-identical to the single-device plan — which is itself oracle-verified —
and, at the north-star shape (native128, N=2^16, BASELINE.json configs[4]),
must match an exact sparse wrapping oracle directly.
"""

import numpy as np
import pytest

import jax

from concrete_ntt_tpu import native128, native64
from concrete_ntt_tpu.parallel.channels import (
    ChannelShardedNative,
    ChannelShardedNative52,
)


@pytest.fixture(scope="module")
def mesh():
    return jax.make_mesh((2, 2, 2), ("dp", "ch", "sp"))


def test_native128_polymul_sharded_bit_exact(rng, mesh):
    n = 4096
    plan = native128.Plan32.try_new(n)
    sharded = ChannelShardedNative(
        plan, mesh, ch_axis="ch", batch_axis="dp", sp_axis="sp"
    )
    B = 4
    lhs = rng.integers(0, 1 << 32, (B, n, 4), dtype=np.uint32)
    rhs = rng.integers(0, 1 << 32, (B, n, 4), dtype=np.uint32)
    got = np.asarray(sharded.negacyclic_polymul(lhs, rhs))
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    np.testing.assert_array_equal(got, want)


def test_native128_channels_only_no_sp(rng, mesh):
    """ch sharding composes without an sp axis (no all-to-all at all)."""
    n = 4096
    plan = native128.Plan32.try_new(n)
    sharded = ChannelShardedNative(plan, mesh, ch_axis="ch", batch_axis="dp")
    B = 2
    lhs = rng.integers(0, 1 << 32, (B, n, 4), dtype=np.uint32)
    rhs = rng.integers(0, 1 << 32, (B, n, 4), dtype=np.uint32)
    got = np.asarray(sharded.negacyclic_polymul(lhs, rhs))
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    np.testing.assert_array_equal(got, want)


def test_north_star_native128_2pow16(rng, mesh):
    """BASELINE.json configs[4]: batched native128 at N=2^16, CRT channels on
    a mesh axis + dp + sp, vs the exact sparse wrapping oracle (monomial rhs:
    the negacyclic product is a sign-wrapped rotation mod 2^128)."""
    n = 1 << 16
    plan = native128.Plan32.try_new(n)
    assert plan is not None
    sharded = ChannelShardedNative(
        plan, mesh, ch_axis="ch", batch_axis="dp", sp_axis="sp"
    )
    lhs = rng.integers(0, 1 << 32, (2, n, 4), dtype=np.uint32)
    s = 23456
    rhs = np.zeros((2, n, 4), dtype=np.uint32)
    rhs[:, s, 0] = 1  # x^s
    got = np.asarray(sharded.negacyclic_polymul(lhs, rhs))

    def to_int(a):  # [n, 4] limbs -> object ints
        return sum(a[:, i].astype(object) << (32 * i) for i in range(4))

    mask = (1 << 128) - 1
    for b in range(2):
        v = to_int(lhs[b])
        want = np.concatenate([(-v[n - s :]) & mask, v[: n - s] & mask])
        np.testing.assert_array_equal(to_int(got[b]) & mask, want)


def test_channel_sharded_validation(mesh):
    plan = native64.Plan32.try_new(4096)  # 5 channels: not divisible by ch=2
    with pytest.raises(ValueError, match="channels must divide"):
        ChannelShardedNative(plan, mesh, ch_axis="ch")
    plan52 = native64.Plan52.try_new(4096)
    with pytest.raises(ValueError, match="plan32-tier"):
        ChannelShardedNative(plan52, mesh, ch_axis="ch")
    with pytest.raises(ValueError, match="plan52"):
        ChannelShardedNative52(plan, mesh, ch_axis="ch")


@pytest.fixture(scope="module")
def mesh52():
    # native64.Plan52 has 3 CRT channels -> a 6-device dp×ch submesh
    devs = np.array(jax.devices()[:6]).reshape(2, 3)
    return jax.sharding.Mesh(devs, ("dp", "ch"))


def test_native64_plan52_polymul_sharded_bit_exact(rng, mesh52):
    """The plan52 tier's 3 prime64 channels shard over `ch` (+ dp): the
    sharded wrapping product must equal the single-device Plan52 plan's
    (itself oracle-verified) bit-for-bit."""
    n = 4096
    plan = native64.Plan52.try_new(n)
    sharded = ChannelShardedNative52(
        plan, mesh52, ch_axis="ch", batch_axis="dp"
    )
    B = 2
    lhs = rng.integers(0, 1 << 64, (B, n), dtype=np.uint64)
    rhs = rng.integers(0, 1 << 64, (B, n), dtype=np.uint64)
    got = np.asarray(sharded.negacyclic_polymul(lhs, rhs))
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_native64_plan52_sharded_with_sp(rng):
    """ch × sp composition for the plan52 tier (one all_to_all per
    transform inside the same shard_map)."""
    n = 4096
    devs = np.array(jax.devices()[:6]).reshape(3, 2)
    mesh = jax.sharding.Mesh(devs, ("ch", "sp"))
    plan = native64.Plan52.try_new(n)
    sharded = ChannelShardedNative52(plan, mesh, ch_axis="ch", sp_axis="sp")
    lhs = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    rhs = rng.integers(0, 1 << 64, (1, n), dtype=np.uint64)
    got = np.asarray(sharded.negacyclic_polymul(lhs, rhs))
    want = np.asarray(plan.negacyclic_polymul(lhs, rhs))
    np.testing.assert_array_equal(got, want)


# -- communication model, machine-checked (SCALING.md §1) ---------------------


def _collective_counts(compiled_text: str) -> dict[str, int]:
    txt = compiled_text
    return {
        op: txt.count(f" {op}(") + txt.count(f" {op}-start(")
        for op in (
            "all-to-all",
            "all-gather",
            "all-reduce",
            "collective-permute",
            "reduce-scatter",
        )
    }


def _assert_minimal_collectives(n, mesh):
    """Compile the full sharded polymul + terminal reshard + CRT
    reconstruction and assert the HLO contains EXACTLY the collectives the
    SCALING.md §1 model claims: one all_to_all per transform (2 fwd + 1
    inv = 3) inside the shard_map, a terminal gather (one all-gather per
    gathered mesh axis: ch + sp = 2) feeding the reconstruction, and
    nothing else (no hidden all-reduces/permutes the model didn't count)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    plan = native128.Plan32.try_new(n)
    assert plan is not None
    sharded = ChannelShardedNative(
        plan, mesh, ch_axis="ch", batch_axis="dp", sp_axis="sp"
    )
    B, k = 2, len(plan.primes)
    val = NamedSharding(mesh, sharded._val_spec)
    parts = tuple(
        jax.ShapeDtypeStruct((B, sharded.n1, sharded.n2), np.uint32, sharding=val)
        for _ in range(2 * sharded.n_limbs)
    )

    @jax.jit
    def full(*flat):
        res = sharded._polymul_sharded(*flat, *sharded._consts)
        res = jax.sharding.reshard(
            res, NamedSharding(mesh, P(None, "dp", None, None))
        )
        return plan._reconstruct(
            [res.reshape(k, B, n)[i] for i in range(k)]
        )

    counts = _collective_counts(full.lower(*parts).compile().as_text())
    assert counts == {
        "all-to-all": 3,
        "all-gather": 2,
        "all-reduce": 0,
        "collective-permute": 0,
        "reduce-scatter": 0,
    }, counts


def test_collective_count_is_minimal(mesh):
    """3 all_to_alls + terminal gather, nothing else (fast shape)."""
    _assert_minimal_collectives(4096, mesh)


@pytest.mark.slow
def test_north_star_collective_count_is_minimal(mesh):
    """The north-star shape itself (native128, N=2^16, dp×ch×sp): the
    'provably minimal — one all-to-all per transform' claim in SCALING.md
    §1/§2 held as compiled HLO, not prose."""
    _assert_minimal_collectives(1 << 16, mesh)
