"""Interleaved A/B of COMPOSED headline-pipeline variants on real TPU.

The round-5 per-stage profile (benches/logs_r05/profile_stages_n16384.jsonl)
showed the composed native64/Plan32 polymul runs ~40% slower than the sum
of its separately-chained stages: the composition overhead is inter-stage
HBM traffic and kernel-boundary scheduling the per-stage chains hide (an
elementwise stage chained under lax.scan fuses across iterations and
measures ~0). The levers are therefore *composition* choices, each an
end-to-end chain here, interleaved in ONE process (±15% cross-process
wobble, CLAUDE.md):

  A) baseline: fwd×2 → separate XLA Montgomery pointwise → inv_multi → lift
     (the round-2 A/B winner, ntt_dispatch.try_polymul32_stacked)
  B) pointwise fused into the inverse kernel (pointwise_inv_multi): saves
     the [C,B,n] product write+read (~5.2 MB/batch) at the cost of
     in-kernel VPU serialization (~8% MXU/VPU overlap). Round-2 measured A
     faster pre-plane-diet; the diet shifted the VPU/HBM balance — re-check.
  C) batch shape: the same A pipeline at B in {8, 16, 32} (per-poly cost;
     bench.py pins B=8 from the round-2 measurement).

Usage: python tools/ab_headline.py [--n 16384] [--reps 5] [--length 96]
One JSON line per variant; run AFTER tools/tpu_parity.py has verified the
kernels on hardware (both variants are dispatch-reachable and parity-covered).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--length", type=int, default=None)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/concrete_ntt_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    on_cpu = jax.devices()[0].platform != "tpu"
    if on_cpu:
        os.environ.setdefault("CONCRETE_NTT_TPU_ENGINE", "mxu")
        os.environ.setdefault("CONCRETE_NTT_TPU_PALLAS_INTERPRET", "1")
    length = args.length or (2 if on_cpu else 96)

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import crt, ntt_dispatch as nd
    from concrete_ntt_tpu.utils.profiling import chain_time

    n = args.n
    plan = native64.Plan32.try_new(n)
    assert plan is not None
    plans = plan.plans
    primes = tuple(pl.p for pl in plans)
    rng = np.random.default_rng(0)

    def mk(b):
        x = rng.integers(0, 1 << 64, (b, n), dtype=np.uint64)
        return (
            (x & 0xFFFFFFFF).astype(np.uint32),
            (x >> np.uint64(32)).astype(np.uint32),
        )

    def step_a(carry):
        # force the in-kernel-split inverse: with the presplit marker
        # present, 'auto' would otherwise serve presplit here too and the
        # A-vs-D comparison would measure the same pipeline twice
        (llo, lhi), (rlo, rhi) = carry
        os.environ["CONCRETE_NTT_TPU_PRESPLIT"] = "0"
        try:
            out = nd.try_polymul32_stacked((llo, lhi), (rlo, rhi), plans)
        finally:
            os.environ.pop("CONCRETE_NTT_TPU_PRESPLIT", None)
        assert out is not None
        lo, hi = crt.rec_u64_from5([out[i] for i in range(len(primes))], primes)
        return ((lo, hi), (llo, lhi))

    def step_b(carry):
        (llo, lhi), (rlo, rhi) = carry
        eng = nd._mxu_impl(n)
        fl = eng.fwd_wide_multi((llo, lhi), primes)
        fr = eng.fwd_wide_multi((rlo, rhi), primes)
        fused = nd.try_pointwise_inv32_all(fl, fr, plans)
        assert fused is not None
        lo, hi = crt.rec_u64_from5(fused, primes)
        return ((lo, hi), (llo, lhi))

    def step_d(carry):
        # A, but the XLA Montgomery stage emits int8 digit planes and the
        # inverse kernel skips its in-kernel split (presplit tier, round 5)
        (llo, lhi), (rlo, rhi) = carry
        os.environ["CONCRETE_NTT_TPU_PRESPLIT"] = "1"
        try:
            out = nd.try_polymul32_stacked((llo, lhi), (rlo, rhi), plans)
        finally:
            os.environ.pop("CONCRETE_NTT_TPU_PRESPLIT", None)
        assert out is not None
        lo, hi = crt.rec_u64_from5([out[i] for i in range(len(primes))], primes)
        return ((lo, hi), (llo, lhi))

    variants = [
        ("A-separate-pointwise-b8", step_a, 8),
        ("B-fused-pointwise-inv-b8", step_b, 8),
        ("D-presplit-inv-b8", step_d, 8),
        ("A-separate-pointwise-b16", step_a, 16),
        ("A-separate-pointwise-b32", step_a, 32),
    ]
    rounds = 2
    if on_cpu:  # interpret-mode smoke: one round, the n=2^14 B=8 legs
        variants, rounds = variants[:3], 1
    results = {}
    for _round in range(rounds):  # interleave the whole set, report min
        for name, step, b in variants:
            la, ra = mk(b), mk(b)
            t = chain_time(step, (la, ra), length=length, reps=args.reps)
            per = t / b
            results[name] = min(results.get(name, float("inf")), per)
            print(
                json.dumps(
                    {
                        "variant": name,
                        "batch": b,
                        "ns_per_poly": round(per * 1e9, 1),
                        "polys_per_sec": round(1 / per, 1),
                    }
                ),
                flush=True,
            )
    best = min(results, key=results.get)
    print(json.dumps({"best": best,
                      "ns_per_poly": round(results[best] * 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
