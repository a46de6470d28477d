"""A/B: public interleaved-limb polymul vs planar limb-tuple path.

The device 'limbs' format is interleaved [..., n, 2]; inside a polymul
chain every step pays two de-interleaves and one re-interleave of
[B, n, 2] u32 — a layout XLA/TPU handles badly (trailing dim 2 maps to
2/128 lanes). This measures, in ONE process (±15% cross-process wobble),

  A) plan.negacyclic_polymul on the interleaved format (bench.py's chain),
  B) the same pipeline carried as planar (lo, hi) tuples.

If B wins materially, the planar tuple becomes the documented performance
format and bench.py switches to it.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import crt, ntt_dispatch as nd
    from concrete_ntt_tpu.ops.u32 import np_u64_to_limbs
    from concrete_ntt_tpu.utils.profiling import chain_time

    n, B = 1 << 14, 8
    plan = native64.Plan32.try_new(n)
    primes = tuple(pl.p for pl in plan.plans)
    rng = np.random.default_rng(0)
    lhs64 = rng.integers(0, 1 << 64, (B, n), dtype=np.uint64)
    rhs64 = rng.integers(0, 1 << 64, (B, n), dtype=np.uint64)
    lhs = jnp.asarray(np_u64_to_limbs(lhs64))
    rhs = jnp.asarray(np_u64_to_limbs(rhs64))

    def step_api(carry):
        c, d = carry
        return (plan.negacyclic_polymul(c, d), c)

    # the stacked fast path is MXU-gated: under 'auto' on CPU it returns
    # None (round-4 advisor: the assert crashed the CPU smoke run) — force
    # the MXU engine + interpret mode there so the planar leg still runs
    if jax.devices()[0].platform != "tpu":
        os.environ.setdefault("CONCRETE_NTT_TPU_ENGINE", "mxu")
        os.environ.setdefault("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")

    def step_planar(carry):
        (clo, chi), (dlo, dhi) = carry
        out = nd.try_polymul32_stacked((clo, chi), (dlo, dhi), plan.plans)
        assert out is not None, "stacked fast path unavailable for this config"
        mods = [out[i] for i in range(len(primes))]
        lo, hi = crt.rec_u64_from5(mods, primes)
        return ((lo, hi), (clo, chi))

    la = (lhs[..., 0], lhs[..., 1])
    ra = (rhs[..., 0], rhs[..., 1])

    length = 2 if jax.devices()[0].platform == "cpu" else 128
    results = {}
    for name, step, a in [
        ("api-interleaved", step_api, (lhs, rhs)),
        ("planar-tuple", step_planar, (la, ra)),
    ] * 2:  # interleave twice: A B A B, report min
        t = chain_time(step, a, length=length, reps=5)
        results[name] = min(results.get(name, float("inf")), t / B)
        print(f"{name}: {t / B * 1e9:.1f} ns/poly", flush=True)

    a, b = results["api-interleaved"], results["planar-tuple"]
    print(
        f"\nBEST api={a * 1e9:.1f} ns/poly ({1 / a:.0f}/s)  "
        f"planar={b * 1e9:.1f} ns/poly ({1 / b:.0f}/s)  "
        f"planar saves {(a - b) * 1e9:.1f} ns/poly ({(a / b - 1) * 100:.1f}%)"
    )


if __name__ == "__main__":
    main()
