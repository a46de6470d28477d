"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4):
four-step all-to-all NTT parity vs golden and the single-chip path, dp batch
sharding, and the full sharded CRT polymul (dryrun path) vs the wrapping
oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from concrete_ntt_tpu import native64, prime32
from concrete_ntt_tpu.golden import ntt as gold
from concrete_ntt_tpu.golden import polymul as gpoly
from concrete_ntt_tpu.ops import crt as crt_ops
from concrete_ntt_tpu.ops.u32 import limbs_to_np_u64, np_u64_to_limbs
from concrete_ntt_tpu.parallel.fourstep import make_sharded_prime32
from concrete_ntt_tpu.tables import PRIMES32


def _mesh(shape, names):
    return jax.make_mesh(
        shape, names, axis_types=(jax.sharding.AxisType.Auto,) * len(shape)
    )


@pytest.mark.parametrize("n", [1024, 4096])
@pytest.mark.parametrize("d", [2, 8])
def test_fourstep_matches_single_chip(n, d, rng, cpu_mesh_devices):
    p = PRIMES32[0]
    mesh = _mesh((d,), ("x",))
    plan = prime32.Plan.new(n, p)
    fwd, inv = make_sharded_prime32(plan, mesh)
    x = rng.integers(0, p, (3, n)).astype(np.uint32)
    got = np.asarray(fwd(jnp.asarray(x)))
    want = np.asarray(plan.fwd(x))
    assert (got == want).all()
    back = np.asarray(inv(jnp.asarray(got)))
    assert (back == np.asarray(plan.inv(want))).all()


def test_fourstep_matches_golden(rng, cpu_mesh_devices):
    n, p, d = 512, PRIMES32[9], 4
    mesh = _mesh((d,), ("x",))
    plan = prime32.Plan.new(n, p)
    fwd, _ = make_sharded_prime32(plan, mesh)
    x = rng.integers(0, p, (1, n)).astype(np.uint32)
    got = np.asarray(fwd(jnp.asarray(x)))
    assert got[0].tolist() == gold.fwd([int(v) for v in x[0]], p)


def test_fourstep_dp_batch(rng, cpu_mesh_devices):
    n, p = 1024, PRIMES32[0]
    mesh = _mesh((2, 4), ("dp", "sp"))
    plan = prime32.Plan.new(n, p)
    fwd, inv = make_sharded_prime32(plan, mesh, axis="sp", batch_axis="dp")
    x = rng.integers(0, p, (4, n)).astype(np.uint32)
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp", None)))
    got = np.asarray(fwd(xd))
    assert (got == np.asarray(plan.fwd(x))).all()
    back = np.asarray(inv(fwd(xd)))
    assert (back == (x.astype(np.uint64) * n % p).astype(np.uint32)).all()


def test_sharded_native64_polymul(rng, cpu_mesh_devices):
    """Full dp+sp sharded CRT polymul == wrapping-u64 schoolbook oracle."""
    n = 512
    mesh = _mesh((2, 4), ("dp", "sp"))
    plan = native64.Plan32.try_new(n)
    channel_ntts = [
        make_sharded_prime32(pl, mesh, axis="sp", batch_axis="dp")
        for pl in plan.plans
    ]

    batch = 4
    lhs64 = rng.integers(0, 1 << 64, (batch, n), dtype=np.uint64)
    rhs64 = rng.integers(0, 1 << 64, (batch, n), dtype=np.uint64)
    in_sh = NamedSharding(mesh, P("dp", None, None))
    lhs = jax.device_put(jnp.asarray(np_u64_to_limbs(lhs64)), in_sh)
    rhs = jax.device_put(jnp.asarray(np_u64_to_limbs(rhs64)), in_sh)

    def step(a, b):
        ra = crt_ops.split_u64(a[..., 0], a[..., 1], plan.primes)
        rb = crt_ops.split_u64(b[..., 0], b[..., 1], plan.primes)
        prods = []
        for i, (fwd, inv) in enumerate(channel_ntts):
            fa = fwd(ra[i])
            fb = fwd(rb[i])
            prods.append(inv(plan.plans[i].mul_assign_normalize(fa, fb)))
        lo, hi = crt_ops.rec_u64_from5(prods, plan.primes)
        return jnp.stack([lo, hi], axis=-1)

    out = limbs_to_np_u64(np.asarray(jax.jit(step)(lhs, rhs)))
    for i in range(batch):
        want = gpoly.negacyclic_convolution_wrapping(
            lhs64[i].tolist(), rhs64[i].tolist(), 64
        )
        assert out[i].tolist() == want


def test_fourstep_rejects_tiny_n(cpu_mesh_devices):
    mesh = _mesh((8,), ("x",))
    plan = prime32.Plan.new(16, PRIMES32[0])
    with pytest.raises(ValueError):
        make_sharded_prime32(plan, mesh)


@pytest.mark.slow
@pytest.mark.parametrize("sp", [2, 4])
def test_fourstep_mxu_matches_single_chip(sp, rng, cpu_mesh_devices, monkeypatch):
    from concrete_ntt_tpu.parallel.fourstep_mxu import make_sharded_prime32_mxu

    n, p = 4096, PRIMES32[0]
    mesh = _mesh((8 // sp, sp), ("dp", "sp"))
    plan = prime32.Plan.new(n, p)
    fwd, inv, to_dist, from_dist = make_sharded_prime32_mxu(
        plan, mesh, axis="sp", batch_axis="dp"
    )
    x = rng.integers(0, p, (4, n)).astype(np.uint32)
    got = np.asarray(from_dist(fwd(to_dist(jnp.asarray(x)))))
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    want = np.asarray(plan.fwd(x))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(from_dist(inv(to_dist(jnp.asarray(want)))))
    np.testing.assert_array_equal(back, np.asarray(plan.inv(want)))
    rt = np.asarray(from_dist(inv(fwd(to_dist(jnp.asarray(x))))))
    np.testing.assert_array_equal(
        rt, (x.astype(np.uint64) * np.uint64(n) % np.uint64(p)).astype(np.uint32)
    )


@pytest.mark.slow
@pytest.mark.parametrize("sp", [2, 4])
def test_fourstep_mxu64_matches_single_chip(sp, rng, cpu_mesh_devices, monkeypatch):
    """prime64 sharded four-step (limb pairs): Plan52/Goldilocks multi-chip."""
    from concrete_ntt_tpu import prime64
    from concrete_ntt_tpu.parallel.fourstep_mxu import make_sharded_prime64_mxu
    from concrete_ntt_tpu.tables import GOLDILOCKS

    n, p = 4096, GOLDILOCKS
    mesh = _mesh((8 // sp, sp), ("dp", "sp"))
    plan = prime64.Plan.new(n, p)
    fwd, inv, to_dist, from_dist = make_sharded_prime64_mxu(
        plan, mesh, axis="sp", batch_axis="dp"
    )
    x = np_u64_to_limbs(rng.integers(0, p, (4, n), dtype=np.uint64))
    got = np.asarray(from_dist(fwd(to_dist(jnp.asarray(x)))))
    monkeypatch.setenv("CONCRETE_NTT_TPU_ENGINE", "mxu")
    want = np.asarray(plan.fwd(x))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(from_dist(inv(to_dist(jnp.asarray(want)))))
    np.testing.assert_array_equal(back, np.asarray(plan.inv(want)))
    rt = limbs_to_np_u64(np.asarray(from_dist(inv(fwd(to_dist(jnp.asarray(x)))))))
    want_rt = (
        limbs_to_np_u64(x).astype(object) * n % p
    ).astype(np.uint64)
    np.testing.assert_array_equal(rt, want_rt)
