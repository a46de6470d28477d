"""Interleaved A/B of the prime64 engine tiers on real TPU hardware.

Measures `fwd` at a given (n, p) across the three tiers — fused
whole-transform Pallas kernel, Pallas pass kernels + XLA transpose/scale,
pure-XLA mxu64 stages — in ONE process with the tiers interleaved per rep
(cross-process throughput wobbles +/-15% on the shared chip; interleaving
cancels it, CLAUDE.md). Informs `ntt_dispatch._fused64_profitable` — the
Goldilocks n=2^15 routing came from this measurement (MXU_ENGINE.md §7a).

Usage:
    python tools/ab_tiers.py                 # the §7a pending set
    python tools/ab_tiers.py 32768:p50 32768:gl ...

Shape specs: {n}:{p50|p51|gl|p62|p63|p64} or {n}:{decimal prime}.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from concrete_ntt_tpu.utils.prime import (
    largest_prime_in_arithmetic_progression64 as lpap,
)

GOLDILOCKS = (1 << 64) - (1 << 32) + 1
REPS = 3
BATCH = 16


def _resolve_p(n: int, spec: str) -> int:
    named = {
        # 32-bit regimes (prime32 tiers; see _tiers32)
        "lt30": lambda: lpap(2 * n, 1, 0, 1 << 30),
        "lt31": lambda: lpap(2 * n, 1, 1 << 30, 1 << 31),
        "gen32": lambda: lpap(2 * n, 1, 1 << 31, 1 << 32),
        # 64-bit regimes
        "p50": lambda: lpap(2 * n, 1, 0, 1 << 50),
        "p51": lambda: lpap(2 * n, 1, 0, 1 << 51),
        "gl": lambda: GOLDILOCKS,
        "p62": lambda: lpap(2 * n, 1, 0, 1 << 62),
        "p63": lambda: lpap(2 * n, 1, 1 << 62, 1 << 63),
        "p64": lambda: lpap(2 * n, 1, 1 << 63, 1 << 64),
    }
    return named[spec]() if spec in named else int(spec)


def _scale(n: int, p: int, width: int) -> int:
    return pow(n, p - 2, p) * pow(2, width, p) % p


def _tiers(n: int, p: int, direction: str = "fwd"):
    from concrete_ntt_tpu.ops import mxu64, ntt_dispatch, stagesplit

    tiers = {}
    inv = direction == "inv"
    s = _scale(n, p, 64)
    if ntt_dispatch._pallas_impls_runnable():
        from concrete_ntt_tpu.ops import mxu64_pallas

        if mxu64_pallas.fused_applicable(n):
            tiers["fused"] = (
                (lambda limbs: mxu64_pallas.inv(limbs, n=n, p=p, scale=s))
                if inv else (lambda limbs: mxu64_pallas.fwd(limbs, n=n, p=p))
            )
        if mxu64_pallas.passes_applicable(n):
            pe = mxu64_pallas.passes_engine64
            tiers["passes"] = (
                (lambda limbs: pe.inv(limbs, n=n, p=p, scale=s))
                if inv else (lambda limbs: pe.fwd(limbs, n=n, p=p))
            )
        if stagesplit.applicable64(n, p):
            tiers["hybrid"] = (
                (lambda limbs: stagesplit.inv64_fused(limbs, n=n, p=p, scale=s))
                if inv else (lambda limbs: stagesplit.fwd64_fused(limbs, n=n, p=p))
            )
    tiers["xla"] = (
        (lambda limbs: mxu64.inv(limbs, n=n, p=p, scale=s))
        if inv else (lambda limbs: mxu64.fwd(limbs, n=n, p=p))
    )
    return tiers


def _tiers32(n: int, p: int, direction: str = "fwd"):
    """prime32 fwd/inv tiers: stage-split hybrid (fused + XLA block cores),
    direct fused whole-transform kernel, pass kernels, pure-XLA stages."""
    from concrete_ntt_tpu.ops import mxu32, ntt_dispatch, stagesplit
    from concrete_ntt_tpu.prime32 import _variant

    variant = _variant(p)
    inv = direction == "inv"
    s = _scale(n, p, 32)
    tiers = {}
    if ntt_dispatch._pallas_impls_runnable():
        from concrete_ntt_tpu.ops import mxu32_pallas

        if mxu32_pallas.fused_applicable(n):
            tiers["fused"] = (
                (lambda x: mxu32_pallas.inv(x, n=n, p=p, scale=s))
                if inv else (lambda x: mxu32_pallas.fwd(x, n=n, p=p))
            )
        if n >= 2048:  # pass kernels + XLA transpose (ntt_dispatch._mxu_impl)
            pe = mxu32_pallas.passes_engine
            tiers["passes"] = (
                (lambda x: pe.inv(x, n=n, p=p, scale=s))
                if inv else (lambda x: pe.fwd(x, n=n, p=p))
            )
        if stagesplit.applicable32(n, p, variant):
            tiers["hybrid"] = (
                (lambda x: stagesplit.inv32_fused(x, n=n, p=p, scale=s))
                if inv else (lambda x: stagesplit.fwd32_fused(x, n=n, p=p))
            )
    if mxu32.applicable(n, p, variant):
        tiers["xla"] = (
            (lambda x: mxu32.inv(x, n=n, p=p, scale=s))
            if inv else (lambda x: mxu32.fwd(x, n=n, p=p))
        )
    return tiers


def run_ab(n: int, p: int, label: str, direction: str = "fwd"):
    import jax.numpy as jnp

    from concrete_ntt_tpu.utils.profiling import chain_time

    rng = np.random.default_rng(0)
    if p < (1 << 32):
        xs = jnp.asarray(
            rng.integers(0, p, (BATCH, n), dtype=np.uint64).astype(np.uint32)
        )
        operands = (xs,)
        tiers = _tiers32(n, p, direction)
    else:
        x = rng.integers(0, p, (BATCH, n), dtype=np.uint64)
        lo = jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((x >> 32).astype(np.uint32))
        operands = ((lo, hi),)
        tiers = _tiers(n, p, direction)
    # calibrate chain length per tier for >= 40 ms of device work (CLAUDE.md:
    # short chains leave tunnel jitter, ~ms, in the measurement)
    lengths = {}
    for name, fn in tiers.items():
        t0 = chain_time(lambda a: fn(a), operands[0], length=32, reps=1)
        lengths[name] = max(32, min(1 << 14, int(0.04 / max(t0, 1e-7))))
    best = {k: float("inf") for k in tiers}
    for rep in range(REPS):
        for name, fn in tiers.items():
            t = chain_time(
                lambda a: fn(a), operands[0], length=lengths[name],
                reps=1,
            )
            ns = t * 1e9 / BATCH
            best[name] = min(best[name], ns)
            print(f"rep{rep} {label} {name}: {ns:.1f} ns/poly "
                  f"(best {best[name]:.1f}, k={lengths[name]})", flush=True)
    order = sorted(best, key=best.get)
    print(f"RESULT {label} n={n} p={p}: " +
          " ".join(f"{k}={best[k]:.1f}" for k in order), flush=True)
    return best


def main():
    specs = sys.argv[1:] or ["32768:p50", "32768:p51", "32768:p63", "32768:gl"]
    for spec in specs:
        parts = spec.split(":")
        n = int(parts[0])
        p = _resolve_p(n, parts[1])
        direction = parts[2] if len(parts) > 2 else "fwd"
        run_ab(n, p, spec, direction)


if __name__ == "__main__":
    main()
