"""Multi-chip scaling-efficiency harness (BASELINE.md: >=85% target).

Measures batched native64 CRT polymul throughput with the MXU-sharded
four-step transforms over increasing mesh sizes and reports efficiency
relative to linear scaling from the smallest mesh.

On a pod slice this exercises real ICI all-to-alls; in this repo's
single-chip environment it degenerates to the 1-chip row (the harness is
the deliverable — the driver validates the multi-chip path functionally via
__graft_entry__.dryrun_multichip on a virtual CPU mesh).

Usage: python benches/scaling.py [--n 16384] [--batch-per-chip 8]
Prints one JSON line per mesh configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import crt as crt_ops
    from concrete_ntt_tpu.ops.u32 import np_u64_to_limbs
    from concrete_ntt_tpu.parallel.fourstep_mxu import make_sharded_prime32_mxu

    n = args.n
    devs = len(jax.devices())
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1

    # mesh configs: (dp, sp) per device count, sp sharding the transform
    configs = []
    d = 1
    while d <= devs:
        sp = 2 if (d % 2 == 0 and n2 % 2 == 0) else 1
        configs.append((d // sp, sp))
        d *= 2

    plan = native64.Plan32.try_new(n)
    assert plan is not None
    rng = np.random.default_rng(0)
    base_rate = None

    for dp, sp in configs:
        ndev = dp * sp
        mesh = jax.make_mesh(
            (dp, sp), ("dp", "sp"), axis_types=(jax.sharding.AxisType.Auto,) * 2
        )
        channels = [
            make_sharded_prime32_mxu(pl, mesh, axis="sp", batch_axis="dp")
            for pl in plan.plans
        ]
        batch = args.batch_per_chip * ndev
        val_sh = NamedSharding(mesh, P("dp", None, "sp", None))
        limbs = np_u64_to_limbs(
            rng.integers(0, 1 << 64, (batch, n), dtype=np.uint64)
        ).reshape(batch, n1, n2, 2)
        lhs = jax.device_put(jnp.asarray(limbs), val_sh)
        rhs = jax.device_put(jnp.asarray(limbs[::-1].copy()), val_sh)

        def step(a, b):
            ra = crt_ops.split_u64(a[..., 0], a[..., 1], plan.primes)
            rb = crt_ops.split_u64(b[..., 0], b[..., 1], plan.primes)
            prods = []
            for i, (fwd, inv, _, _) in enumerate(channels):
                fa, fb = fwd(ra[i]), fwd(rb[i])
                prods.append(inv(plan.plans[i].mul_assign_normalize(fa, fb)))
            lo, hi = crt_ops.rec_u64_from5(prods, plan.primes)
            return jnp.stack([lo, hi], axis=-1)

        k = 32

        @jax.jit
        def chain(a, b):
            def body(carry, _):
                c, d_ = carry
                return (step(c, d_), c), None

            (c, _), _ = jax.lax.scan(body, (a, b), None, length=k)
            return jnp.sum(c.reshape(-1)[:1].astype(jnp.float32))

        @jax.jit
        def one(a, b):
            return jnp.sum(step(a, b).reshape(-1)[:1].astype(jnp.float32))

        _ = np.asarray(chain(lhs, rhs))
        _ = np.asarray(one(lhs, rhs))
        bk = b1 = float("inf")
        for _i in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(chain(lhs, rhs))
            bk = min(bk, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(one(lhs, rhs))
            b1 = min(b1, time.perf_counter() - t0)
        per_step = max(bk - b1, 1e-9) / (k - 1)
        rate = batch / per_step
        if base_rate is None:
            base_rate = rate / ndev
        eff = rate / (base_rate * ndev)
        print(
            json.dumps(
                {
                    "devices": ndev,
                    "mesh": {"dp": dp, "sp": sp},
                    "batch": batch,
                    "polymul_per_sec": round(rate, 1),
                    "scaling_efficiency": round(eff, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
