"""On-device bit-exactness checks for every Pallas kernel family.

Runs each production kernel on the REAL TPU against the XLA engine on the
same inputs (the XLA engines are golden-verified by the CPU suite). Mosaic
has miscompiled specific shapes before (CLAUDE.md); every new kernel shape
must pass here before its dispatch gate ships. Prints one PASS/FAIL line
per check; exits non-zero on any FAIL.

Usage: python tools/tpu_parity.py [--quick]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

FAILURES = []


def run(fn, *args, **kw):
    """jit-wrap every engine call: eager multi-op streams through the axon
    tunnel have been observed to wedge the session; jitted graphs are one
    round trip."""
    import jax

    return jax.jit(functools.partial(fn, **kw))(*args)


def check(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    ok = np.array_equal(got, want)
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        bad = int((got != want).sum())
        print(f"      {bad}/{got.size} elements differ", flush=True)
        FAILURES.append(name)


def check_pair(name, got, want):
    for g, w, nm in zip(got, want, ("lo", "hi")):
        check(f"{name}.{nm}", g, w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    from concrete_ntt_tpu.ops import mxu32, mxu32_pallas, mxu64, mxu64_pallas
    from concrete_ntt_tpu.ops.u32 import mont_mul, mont_mul64, mont_neginv, mont_neginv64
    from concrete_ntt_tpu.tables import GOLDILOCKS, PRIMES32, PRIMES52

    rng = np.random.default_rng(0xC0FFEE)
    mk32 = lambda *s: jnp.asarray(rng.integers(0, 1 << 32, s, dtype=np.uint32))

    # --- prime32 passes engine (row-fused shapes at n=2048) ---------------
    for n in (2048, 4096):
        p = PRIMES32[0]
        x = mk32(8, n)
        s = pow(n, p - 2, p) * pow(2, 32, p) % p
        check(f"passes32.fwd n={n}",
              run(mxu32_pallas.passes_engine.fwd, x, n=n, p=p),
              run(mxu32.fwd, x, n=n, p=p))
        check(f"passes32.inv n={n}",
              run(mxu32_pallas.passes_engine.inv, x, n=n, p=p, scale=s),
              run(mxu32.inv, x, n=n, p=p, scale=s))
        limbs = (x, mk32(8, n))
        check(f"passes32.fwd_wide n={n}",
              run(mxu32_pallas.passes_engine.fwd_wide, limbs, n=n, p=p),
              run(mxu32.fwd_wide, limbs, n=n, p=p))

    # --- prime64 passes engine (row-fused 64-bit combine shapes) ----------
    for n in (2048, 4096, 8192):
        for p in (GOLDILOCKS, PRIMES52[0]):
            limbs = (mk32(8, n), mk32(8, n))
            s = pow(n, p - 2, p) * pow(2, 64, p) % p
            check_pair(f"passes64.fwd n={n} p={p:#x}",
                       run(mxu64_pallas.passes_engine64.fwd, limbs, n=n, p=p),
                       run(mxu64.fwd, limbs, n=n, p=p))
            check_pair(f"passes64.inv n={n} p={p:#x}",
                       run(mxu64_pallas.passes_engine64.inv, limbs, n=n, p=p, scale=s),
                       run(mxu64.inv, limbs, n=n, p=p, scale=s))

    n = 1 << 14
    # --- mxu32 channel-grid (incl. the fixed in-kernel Montgomery) --------
    primes = PRIMES32[:5]
    limbs = (mk32(8, n), mk32(8, n))
    multi = np.asarray(run(lambda l: mxu32_pallas.fwd_wide_multi(l, primes), limbs))
    for i, p in enumerate(primes[: 2 if args.quick else 5]):
        check(f"mxu32.fwd_wide_multi ch{i}", multi[i],
              run(mxu32.fwd_wide, limbs, n=n, p=p))
    fl, fr = mk32(3, 8, n), mk32(3, 8, n)
    pr3 = primes[:3]
    scales = tuple(pow(n, p - 2, p) * pow(2, 32, p) % p for p in pr3)
    got = np.asarray(run(lambda a, b: mxu32_pallas.pointwise_inv_multi(a, b, pr3, scales), fl, fr))
    for i, p in enumerate(pr3):
        want = run(
            lambda a, b, p=p, i=i: mxu32.inv(
                mont_mul(a, b, p, mont_neginv(p)), n=n, p=p, scale=scales[i]
            ),
            fl[i], fr[i],
        )
        check(f"mxu32.pointwise_inv_multi ch{i}", got[i], want)

    # --- mxu64 channel-grid (Plan52) --------------------------------------
    pr52 = PRIMES52[:3]
    lo, hi = run(lambda l: mxu64_pallas.fwd_multi(l, pr52), limbs)
    for i, p in enumerate(pr52):
        check_pair(f"mxu64.fwd_multi ch{i}", (lo[i], hi[i]),
                   run(mxu64.fwd, limbs, n=n, p=p))
    scales = tuple(pow(n, p - 2, p) * pow(2, 64, p) % p for p in pr52)
    fl = (mk32(3, 8, n), mk32(3, 8, n))
    fr = (mk32(3, 8, n), mk32(3, 8, n))
    lo, hi = run(lambda a, b: mxu64_pallas.pointwise_inv_multi(a, b, pr52, scales), fl, fr)
    for i, p in enumerate(pr52):
        want = run(
            lambda al, ah, bl, bh, p=p, i=i: mxu64.inv(
                mont_mul64((al, ah), (bl, bh), p, mont_neginv64(p)),
                n=n, p=p, scale=scales[i],
            ),
            fl[0][i], fl[1][i], fr[0][i], fr[1][i],
        )
        check_pair(f"mxu64.pointwise_inv_multi ch{i}", (lo[i], hi[i]), want)

    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES", flush=True)
        sys.exit(1)
    print("\nall parity checks passed", flush=True)


if __name__ == "__main__":
    main()
