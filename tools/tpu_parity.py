"""On-device bit-exactness checks for every Pallas kernel family.

Runs each production kernel on the REAL TPU against the XLA engine on the
same inputs (the XLA engines are golden-verified by the CPU suite). Mosaic
has miscompiled specific shapes before (CLAUDE.md); every new kernel shape
must pass here before its dispatch gate ships. Prints one PASS/FAIL line
per check; exits non-zero on any FAIL.

Coverage = every dispatch-reachable (engine, n, p-regime) shape class of
the bench grid:
  * prime32 whole-transform fused kernels (n >= 2^14) x {lt30, lt31,
    generic 4-digit, generic 5-digit} x {fwd, scaled inv, fwd_wide 2/4-limb}
  * prime32 pass kernels (2048 <= n < 2^14, row-fused shapes) same regimes
  * prime64 whole-transform fused kernels x {p<2^50, p<2^62 (shoup mode),
    p<2^63 (mont), Goldilocks (gl), p>=2^63 generic (mont)} x {fwd, inv}
  * prime64 pass kernels (2048..8192)
  * channel-grid kernels: fwd_wide_multi (1/2/4-limb), inv_multi,
    pointwise_inv_multi, fwd_multi_perchannel (Bounded product), 32+64-bit
  * VPU butterfly kernels (pallas32, n < 2048) x 3 regimes
  * sharded-pass row slices (the shard_map local sections of
    parallel/fourstep_mxu) for both widths
  * B=1 padding path of the fused kernels

Usage: python tools/tpu_parity.py [--quick]
Run after ANY kernel change; commit the PASS log (TPU_PARITY_r{N}.txt).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

FAILURES = []
N_CHECKS = 0


def run(fn, *args, **kw):
    """jit-wrap every engine call: eager multi-op streams through the axon
    tunnel have been observed to wedge the session; jitted graphs are one
    round trip."""
    import jax

    return jax.jit(functools.partial(fn, **kw))(*args)


def check(name, got, want):
    global N_CHECKS
    N_CHECKS += 1
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


def _head_commit() -> str:
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    t0 = time.time()

    # The log itself records exactly what was verified (round-4 advisor:
    # a log committed alongside later kernel edits must not be trusted for
    # them) — restore_markers.py checks this hash against the current tree.
    from concrete_ntt_tpu.ops.pallas_env import kernel_tree_hash

    commit = _head_commit()
    khash = kernel_tree_hash()
    print(f"# tpu_parity HEAD={commit} kernels {khash}", flush=True)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/concrete_ntt_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from concrete_ntt_tpu.ops import mxu32, mxu32_pallas, mxu64, mxu64_pallas
    from concrete_ntt_tpu.ops.u32 import (
        mont_mul,
        mont_mul64,
        mont_neginv,
        mont_neginv64,
    )
    from concrete_ntt_tpu.tables import GOLDILOCKS, PRIMES32, PRIMES52
    from concrete_ntt_tpu.utils.prime import (
        largest_prime_in_arithmetic_progression64 as prime_in_ap,
    )

    rng = np.random.default_rng(0xC0FFEE)
    mk32 = lambda *s: jnp.asarray(rng.integers(0, 1 << 32, s, dtype=np.uint32))

    # p-regime representatives (same selection rule as benches/run.py)
    P_LT30 = PRIMES32[0]
    P_LT31 = prime_in_ap(1 << 16, 1, 1 << 30, 1 << 31)
    P_GEN4 = prime_in_ap(1 << 16, 1, 1 << 31, 4278124286)  # 4 digit planes
    P_GEN5 = prime_in_ap(1 << 16, 1, 1 << 31, (1 << 32) - 1)  # 5 digit planes
    P32_REGIMES = [("lt30", P_LT30), ("lt31", P_LT31), ("gen4", P_GEN4),
                   ("gen5", P_GEN5)]
    P64_REGIMES = [
        ("p50", PRIMES52[0]),
        ("p62.shoup", prime_in_ap(1 << 16, 1, 1 << 61, 1 << 62)),
        ("p63.mont", prime_in_ap(1 << 16, 1, 1 << 62, 1 << 63)),
        ("gl", GOLDILOCKS),
        ("p64.mont", prime_in_ap(1 << 16, 1, 1 << 63, (1 << 64) - 1)),
    ]

    whole_ns = (16384,) if args.quick else (16384, 32768)
    pass_ns32 = (2048,) if args.quick else (2048, 4096, 8192)
    pass_ns64 = (2048,) if args.quick else (2048, 4096, 8192)

    # --- prime32 whole-transform fused kernels ----------------------------
    for n in whole_ns:
        for tag, p in P32_REGIMES:
            x = mk32(8, n)
            s = pow(n, p - 2, p) * pow(2, 32, p) % p
            check(f"fused32.fwd n={n} {tag}",
                  run(mxu32_pallas.fwd, x, n=n, p=p),
                  run(mxu32.fwd, x, n=n, p=p))
            check(f"fused32.inv n={n} {tag}",
                  run(mxu32_pallas.inv, x, n=n, p=p, scale=s),
                  run(mxu32.inv, x, n=n, p=p, scale=s))
        # wide operands (native64/native128 residue-split fusion), lt30
        p = P_LT30
        for n_limbs in (2, 4):
            limbs = tuple(mk32(8, n) for _ in range(n_limbs))
            check(f"fused32.fwd_wide{n_limbs} n={n}",
                  run(mxu32_pallas.fwd_wide, limbs, n=n, p=p),
                  run(mxu32.fwd_wide, limbs, n=n, p=p))

    # --- prime32 passes engine (row-fused shapes) -------------------------
    for n in pass_ns32:
        for tag, p in (P32_REGIMES if n == 2048 else P32_REGIMES[:1]):
            x = mk32(8, n)
            s = pow(n, p - 2, p) * pow(2, 32, p) % p
            check(f"passes32.fwd n={n} {tag}",
                  run(mxu32_pallas.passes_engine.fwd, x, n=n, p=p),
                  run(mxu32.fwd, x, n=n, p=p))
            check(f"passes32.inv n={n} {tag}",
                  run(mxu32_pallas.passes_engine.inv, x, n=n, p=p, scale=s),
                  run(mxu32.inv, x, n=n, p=p, scale=s))
        limbs = (mk32(8, n), mk32(8, n))
        check(f"passes32.fwd_wide n={n}",
              run(mxu32_pallas.passes_engine.fwd_wide, limbs, n=n, p=P_LT30),
              run(mxu32.fwd_wide, limbs, n=n, p=P_LT30))

    # --- prime64 whole-transform fused kernels ----------------------------
    for n in whole_ns:
        for tag, p in P64_REGIMES:
            limbs = (mk32(8, n), mk32(8, n))
            s = pow(n, p - 2, p) * pow(2, 64, p) % p
            check_pair(f"fused64.fwd n={n} {tag}",
                       run(mxu64_pallas.fwd, limbs, n=n, p=p),
                       run(mxu64.fwd, limbs, n=n, p=p))
            check_pair(f"fused64.inv n={n} {tag}",
                       run(mxu64_pallas.inv, limbs, n=n, p=p, scale=s),
                       run(mxu64.inv, limbs, n=n, p=p, scale=s))

    # --- prime64 passes engine (row-fused 64-bit combine shapes) ----------
    for n in pass_ns64:
        for tag, p in (("gl", GOLDILOCKS), ("p50", PRIMES52[0])):
            limbs = (mk32(8, n), mk32(8, n))
            s = pow(n, p - 2, p) * pow(2, 64, p) % p
            check_pair(f"passes64.fwd n={n} {tag}",
                       run(mxu64_pallas.passes_engine64.fwd, limbs, n=n, p=p),
                       run(mxu64.fwd, limbs, n=n, p=p))
            check_pair(f"passes64.inv n={n} {tag}",
                       run(mxu64_pallas.passes_engine64.inv, limbs, n=n, p=p,
                           scale=s),
                       run(mxu64.inv, limbs, n=n, p=p, scale=s))

    # --- stage-split hybrid tier (prefix stages + blockwise 2^14 kernels) -
    from concrete_ntt_tpu.ops import stagesplit

    for tag, p in P32_REGIMES if not args.quick else P32_REGIMES[:1]:
        n = 32768
        x = mk32(8, n)
        s = pow(n, p - 2, p) * pow(2, 32, p) % p
        check(f"hybrid32.fwd n={n} {tag}",
              run(stagesplit.fwd32_fused, x, n=n, p=p),
              run(mxu32.fwd, x, n=n, p=p))
        check(f"hybrid32.inv n={n} {tag}",
              run(stagesplit.inv32_fused, x, n=n, p=p, scale=s),
              run(mxu32.inv, x, n=n, p=p, scale=s))
    if not args.quick:
        from concrete_ntt_tpu.tables import primes32_ext

        for n in (1 << 16, 1 << 17):
            p = primes32_ext()[0]
            x = mk32(8, n)
            check(f"hybrid32.fwd n={n} ext",
                  run(stagesplit.fwd32_fused, x, n=n, p=p),
                  run(mxu32.fwd, x, n=n, p=p))

    hyb_shapes = [(32768, tag, p) for tag, p in P64_REGIMES]
    if not args.quick:
        # beyond-reference sizes need primes ≡ 1 mod 2n (Goldilocks' 2-adic
        # valuation is 32; the p50 table primes cap at n = 2^15)
        hyb_shapes += [
            (65536, "p50ext", prime_in_ap(1 << 17, 1, 0, 1 << 50)),
            (131072, "gl", GOLDILOCKS),
        ]
    for n, tag, p in hyb_shapes:
        limbs = (mk32(8, n), mk32(8, n))
        s = pow(n, p - 2, p) * pow(2, 64, p) % p
        check_pair(f"hybrid64.fwd n={n} {tag}",
                   run(stagesplit.fwd64_fused, limbs, n=n, p=p),
                   run(mxu64.fwd, limbs, n=n, p=p))
        check_pair(f"hybrid64.inv n={n} {tag}",
                   run(stagesplit.inv64_fused, limbs, n=n, p=p, scale=s),
                   run(mxu64.inv, limbs, n=n, p=p, scale=s))

    # --- 32-bit channel-grid hybrid (native-plan channels at n = 2^15) ----
    if not args.quick:
        n = 1 << 15
        pr32 = PRIMES32[:5]
        limbs = (mk32(8, n), mk32(8, n))
        multi = np.asarray(run(
            lambda l: stagesplit.fwd_wide_multi_hybrid32(l, pr32, n=n), limbs
        ))
        for i, p in enumerate(pr32[:2]):
            check(f"hybrid32.fwd_wide_multi n={n} ch{i}", multi[i],
                  run(mxu32.fwd_wide, limbs, n=n, p=p))
        scales32 = tuple(pow(n, p - 2, p) * pow(2, 32, p) % p for p in pr32)
        xs = mk32(5, 8, n)
        mi = np.asarray(run(
            lambda v: stagesplit.inv_multi_hybrid32(v, pr32, scales32, n=n),
            xs,
        ))
        for i, p in enumerate(pr32[:2]):
            check(f"hybrid32.inv_multi n={n} ch{i}", mi[i],
                  run(mxu32.inv, xs[i], n=n, p=p, scale=scales32[i]))

    # --- channel-grid hybrid (Plan52 channels at n = 2^15) ----------------
    if not args.quick:
        n = 1 << 15
        pr52 = tuple(PRIMES52[:3])
        limbs = (mk32(8, n), mk32(8, n))
        lo, hi = run(
            lambda l: stagesplit.fwd_multi_hybrid64(l, pr52, n=n), limbs
        )
        for i, p in enumerate(pr52):
            check_pair(f"hybrid64.fwd_multi n={n} ch{i}", (lo[i], hi[i]),
                       run(mxu64.fwd, limbs, n=n, p=p))
        scales52 = tuple(pow(n, p - 2, p) * pow(2, 64, p) % p for p in pr52)
        fl = (mk32(3, 8, n), mk32(3, 8, n))
        fr = (mk32(3, 8, n), mk32(3, 8, n))
        lo, hi = run(
            lambda a, b: stagesplit.pointwise_inv_multi_hybrid64(
                a, b, pr52, scales52, n=n
            ),
            fl, fr,
        )
        for i, p in enumerate(pr52):
            want = run(
                lambda al, ah, bl, bh, p=p, i=i: mxu64.inv(
                    mont_mul64((al, ah), (bl, bh), p, mont_neginv64(p)),
                    n=n, p=p, scale=scales52[i],
                ),
                fl[0][i], fl[1][i], fr[0][i], fr[1][i],
            )
            check_pair(f"hybrid64.pointwise_inv_multi n={n} ch{i}",
                       (lo[i], hi[i]), want)

    # --- direct channel-grid kernels at n = 2^15 (round 5: these serve the
    # native-plan polymuls at 32768 now that the 32-bit hybrid is off in
    # 'auto' — measured slower than the direct kernels at every size) ------
    if not args.quick:
        n15 = 1 << 15
        pr5 = PRIMES32[:5]
        limbs15 = (mk32(8, n15), mk32(8, n15))
        m15 = np.asarray(
            run(lambda l: mxu32_pallas.fwd_wide_multi(l, pr5), limbs15)
        )
        for i, p in enumerate(pr5[:2]):
            check(f"mxu32.fwd_wide_multi n={n15} ch{i}", m15[i],
                  run(mxu32.fwd_wide, limbs15, n=n15, p=p))
        four15 = tuple(mk32(8, n15) for _ in range(4))
        m4_15 = np.asarray(
            run(lambda l: mxu32_pallas.fwd_wide_multi(l, pr5[:3]), four15)
        )
        for i, p in enumerate(pr5[:2]):
            check(f"mxu32.fwd_wide_multi4 n={n15} ch{i}", m4_15[i],
                  run(mxu32.fwd_wide, four15, n=n15, p=p))
        scales15 = tuple(pow(n15, p - 2, p) * pow(2, 32, p) % p for p in pr5)
        xs15 = mk32(5, 8, n15)
        mi15 = np.asarray(
            run(lambda v: mxu32_pallas.inv_multi(v, pr5, scales15), xs15)
        )
        for i, p in enumerate(pr5[:2]):
            check(f"mxu32.inv_multi n={n15} ch{i}", mi15[i],
                  run(mxu32.inv, xs15[i], n=n15, p=p, scale=scales15[i]))
        mips15 = np.asarray(run(
            lambda v: mxu32_pallas.inv_multi_presplit(
                mxu32_pallas.digit_planes32(v), pr5, scales15
            ),
            xs15,
        ))
        for i in range(2):
            check(f"mxu32.inv_multi_presplit n={n15} ch{i}",
                  mips15[i], mi15[i])
        pr3_15 = pr5[:3]
        sc3_15 = scales15[:3]
        xs3 = mk32(3, 8, n15)
        mp15 = np.asarray(
            run(lambda v: mxu32_pallas.fwd_multi_perchannel(v, pr3_15), xs3)
        )
        for i, p in enumerate(pr3_15[:2]):
            check(f"mxu32.fwd_multi_perchannel n={n15} ch{i}", mp15[i],
                  run(mxu32.fwd, xs3[i], n=n15, p=p))
        fl15, fr15 = mk32(3, 8, n15), mk32(3, 8, n15)
        got15 = np.asarray(run(
            lambda a, b: mxu32_pallas.pointwise_inv_multi(a, b, pr3_15, sc3_15),
            fl15, fr15,
        ))
        for i, p in enumerate(pr3_15[:2]):
            want15 = run(
                lambda a, b, p=p, i=i: mxu32.inv(
                    mont_mul(a, b, p, mont_neginv(p)), n=n15, p=p,
                    scale=sc3_15[i],
                ),
                fl15[i], fr15[i],
            )
            check(f"mxu32.pointwise_inv_multi n={n15} ch{i}", got15[i], want15)

    # --- beyond-reference sizes (≡ 1 mod 2^18 family, n = 2^16 / 2^17) ----
    if not args.quick:
        from concrete_ntt_tpu.tables import primes32_ext

        p_ext = primes32_ext()[0]
        for n in (1 << 16, 1 << 17):
            x = mk32(8, n)
            s = pow(n, p_ext - 2, p_ext) * pow(2, 32, p_ext) % p_ext
            check(f"fused32.fwd n={n} ext",
                  run(mxu32_pallas.fwd, x, n=n, p=p_ext),
                  run(mxu32.fwd, x, n=n, p=p_ext))
            check(f"fused32.inv n={n} ext",
                  run(mxu32_pallas.inv, x, n=n, p=p_ext, scale=s),
                  run(mxu32.inv, x, n=n, p=p_ext, scale=s))
        # native64 polymul path at 2^16: channel-grid wide fwd over the
        # extended family (the native64-32-65536 bench row)
        n = 1 << 16
        pr_ext = primes32_ext()[:5]
        limbs = (mk32(8, n), mk32(8, n))
        multi = np.asarray(
            run(lambda l: mxu32_pallas.fwd_wide_multi(l, pr_ext), limbs)
        )
        for i, p in enumerate(pr_ext[:2]):
            check(f"mxu32.fwd_wide_multi ext n={n} ch{i}", multi[i],
                  run(mxu32.fwd_wide, limbs, n=n, p=p))
        scales_ext = tuple(
            pow(n, p - 2, p) * pow(2, 32, p) % p for p in pr_ext
        )
        xs_ext = mk32(5, 8, n)
        mi_ext = np.asarray(
            run(lambda v: mxu32_pallas.inv_multi(v, pr_ext, scales_ext), xs_ext)
        )
        for i, p in enumerate(pr_ext[:2]):
            check(f"mxu32.inv_multi ext n={n} ch{i}", mi_ext[i],
                  run(mxu32.inv, xs_ext[i], n=n, p=p, scale=scales_ext[i]))
        mips_ext = np.asarray(run(
            lambda v: mxu32_pallas.inv_multi_presplit(
                mxu32_pallas.digit_planes32(v), pr_ext, scales_ext
            ),
            xs_ext,
        ))
        for i in range(2):
            check(f"mxu32.inv_multi_presplit ext n={n} ch{i}",
                  mips_ext[i], mi_ext[i])
        # 4-limb (u128 operand) channel-grid fwd at 2^16 — the kernel shape
        # behind the native128-32-65536 bench row (north-star single chip)
        four_ext = tuple(mk32(8, n) for _ in range(4))
        m4_ext = np.asarray(
            run(lambda l: mxu32_pallas.fwd_wide_multi(l, pr_ext[:3]), four_ext)
        )
        for i, p in enumerate(pr_ext[:2]):
            check(f"mxu32.fwd_wide_multi4 ext n={n} ch{i}", m4_ext[i],
                  run(mxu32.fwd_wide, four_ext, n=n, p=p))
        # product/polymul inverse compositions at 2^16 (serve directly now
        # that the 32-bit hybrid is off in 'auto')
        pr3_ext = pr_ext[:3]
        sc3_ext = scales_ext[:3]
        xs3_ext = mk32(3, 8, n)
        mp_ext = np.asarray(
            run(lambda v: mxu32_pallas.fwd_multi_perchannel(v, pr3_ext), xs3_ext)
        )
        for i, p in enumerate(pr3_ext[:2]):
            check(f"mxu32.fwd_multi_perchannel ext n={n} ch{i}", mp_ext[i],
                  run(mxu32.fwd, xs3_ext[i], n=n, p=p))
        fle, fre = mk32(3, 8, n), mk32(3, 8, n)
        gote = np.asarray(run(
            lambda a, b: mxu32_pallas.pointwise_inv_multi(a, b, pr3_ext, sc3_ext),
            fle, fre,
        ))
        for i, p in enumerate(pr3_ext[:2]):
            wante = run(
                lambda a, b, p=p, i=i: mxu32.inv(
                    mont_mul(a, b, p, mont_neginv(p)), n=n, p=p,
                    scale=sc3_ext[i],
                ),
                fle[i], fre[i],
            )
            check(f"mxu32.pointwise_inv_multi ext n={n} ch{i}", gote[i], wante)

    n = 1 << 14
    # --- mxu32 channel-grid (incl. the fixed in-kernel Montgomery) --------
    primes = PRIMES32[:5]
    limbs = (mk32(8, n), mk32(8, n))
    multi = np.asarray(run(lambda l: mxu32_pallas.fwd_wide_multi(l, primes), limbs))
    for i, p in enumerate(primes[: 2 if args.quick else 5]):
        check(f"mxu32.fwd_wide_multi ch{i}", multi[i],
              run(mxu32.fwd_wide, limbs, n=n, p=p))
    # 1-limb (u32 operand) and 4-limb (u128 operand) channel-grid forwards
    one = (mk32(8, n),)
    m1 = np.asarray(run(lambda l: mxu32_pallas.fwd_wide_multi(l, primes[:3]), one))
    for i, p in enumerate(primes[:3]):
        check(f"mxu32.fwd_multi(u32) ch{i}", m1[i], run(mxu32.fwd, one[0], n=n, p=p))
    four = tuple(mk32(8, n) for _ in range(4))
    m4 = np.asarray(run(lambda l: mxu32_pallas.fwd_wide_multi(l, primes[:3]), four))
    for i, p in enumerate(primes[:3]):
        check(f"mxu32.fwd_wide_multi4 ch{i}", m4[i],
              run(mxu32.fwd_wide, four, n=n, p=p))
    # per-channel-input forward (Bounded product path)
    pr3 = primes[:3]
    xs = mk32(3, 8, n)
    mp = np.asarray(run(lambda v: mxu32_pallas.fwd_multi_perchannel(v, pr3), xs))
    for i, p in enumerate(pr3):
        check(f"mxu32.fwd_multi_perchannel ch{i}", mp[i],
              run(mxu32.fwd, xs[i], n=n, p=p))
    # plain inv_multi (unscaled + scaled)
    scales = tuple(pow(n, p - 2, p) * pow(2, 32, p) % p for p in pr3)
    mi = np.asarray(run(lambda v: mxu32_pallas.inv_multi(v, pr3, scales), xs))
    for i, p in enumerate(pr3):
        check(f"mxu32.inv_multi ch{i}", mi[i],
              run(mxu32.inv, xs[i], n=n, p=p, scale=scales[i]))
    # pre-split digit-plane inverse (round-5 presplit tier): must equal the
    # in-kernel-split inv_multi bit-for-bit on this chip
    mips = np.asarray(run(
        lambda v: mxu32_pallas.inv_multi_presplit(
            mxu32_pallas.digit_planes32(v), pr3, scales
        ),
        xs,
    ))
    for i in range(len(pr3)):
        check(f"mxu32.inv_multi_presplit ch{i}", mips[i], mi[i])
    fl, fr = mk32(3, 8, n), mk32(3, 8, n)
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
    xl, xh = mk32(3, 8, n), mk32(3, 8, n)
    lo, hi = run(lambda a, b: mxu64_pallas.inv_multi(a, b, pr52, scales), xl, xh)
    for i, p in enumerate(pr52):
        check_pair(f"mxu64.inv_multi ch{i}", (lo[i], hi[i]),
                   run(mxu64.inv, (xl[i], xh[i]), n=n, p=p, scale=scales[i]))
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

    # --- VPU butterfly kernels (n < 2048 dispatch tier) -------------------
    from concrete_ntt_tpu import prime32 as p32mod
    from concrete_ntt_tpu.ops import pallas32

    for tag, p in (("lt30", P_LT30), ("lt31", P_LT31), ("generic", P_GEN5)):
        nn = 1024
        plan = p32mod.Plan.try_new(nn, p)
        x = jnp.asarray(rng.integers(0, p, (8, nn), dtype=np.uint32))
        got = run(
            lambda v: pallas32.try_fwd(
                v, plan._tbl, p=p, variant=plan.variant, p_neginv=plan.p_neginv
            ),
            x,
        )
        want = run(
            lambda v: p32mod._fwd_xla(
                v, jnp.asarray(plan._tbl["twid"]),
                jnp.asarray(plan._tbl.get("twid_shoup"))
                if plan.variant != "generic" else jnp.zeros(0, jnp.uint32),
                p=p, variant=plan.variant, p_neginv=plan.p_neginv,
            ),
            x,
        )
        if got is None:
            print(f"SKIP pallas32.fwd n={nn} {tag} (kernel not applicable)",
                  flush=True)
        else:
            check(f"pallas32.fwd n={nn} {tag}", got, want)

    # --- sharded-pass row slices (fourstep_mxu local sections) ------------
    # rank-local pass: rows = n2/s slice of the mid diagonal, row-fused
    n = 1 << 14
    s_shards = 4
    tbl32 = mxu32._mxu_tables(n, P_LT30)
    n1, n2 = tbl32["n1"], tbl32["n2"]
    rows = n2 // s_shards
    xloc = mk32(8, rows, n1)
    dloc = tuple(jnp.asarray(a[:rows]) for a in tbl32["d"])
    got = run(
        lambda v: mxu32_pallas.pass_matmod(
            v, n=n, p=P_LT30, which="A", diag_slices=dloc
        ),
        xloc,
    )
    want = run(
        lambda v: mxu32._matmod_scaled_lazy(v, tbl32["A"], dloc, tbl32, p=P_LT30),
        xloc,
    )
    check(f"sharded32.pass_A rows={rows}", got, want)
    tbl64 = mxu64._tables(n, GOLDILOCKS)
    xl = (mk32(8, rows, n1), mk32(8, rows, n1))
    d64 = tuple(jnp.asarray(a[:rows]) for a in tbl64["d"])
    got = run(
        lambda a, b: mxu64_pallas.pass_matmod64(
            (a, b), n=n, p=GOLDILOCKS, which="A", mont_slices=d64
        ),
        *xl,
    )
    want = run(
        lambda a, b: mxu64._matmod_scaled_lazy((a, b), tbl64["A"], d64, tbl64),
        *xl,
    )
    check_pair(f"sharded64.pass_A rows={rows}", got, want)

    # --- B=1 padding path of the fused kernels (bt=8, pre-marker default) --
    os.environ["CONCRETE_NTT_TPU_SMALLB"] = "0"
    x1 = mk32(1, n)
    check("fused32.fwd b=1",
          run(mxu32_pallas.fwd, x1, n=n, p=P_LT30),
          run(mxu32.fwd, x1, n=n, p=P_LT30))
    l1 = (mk32(1, n), mk32(1, n))
    check_pair("fused64.fwd b=1",
               run(mxu64_pallas.fwd, l1, n=n, p=GOLDILOCKS),
               run(mxu64.fwd, l1, n=n, p=GOLDILOCKS))

    # --- sub-8 batch tiles (the B=1 latency mitigation) --------------------
    # bt in {1, 2, 4} kernel variants across every family; forced on so the
    # run verifies them BEFORE the marker lets 'auto' serve them on TPU.
    os.environ["CONCRETE_NTT_TPU_SMALLB"] = "1"
    for b, tag, p in ((1, "lt30", P_LT30), (2, "gen5", P_GEN5),
                      (3, "lt30", P_LT30)):
        xb = mk32(b, n)
        s = pow(n, p - 2, p) * pow(2, 32, p) % p
        check(f"smallb.fused32.fwd b={b} {tag}",
              run(mxu32_pallas.fwd, xb, n=n, p=p),
              run(mxu32.fwd, xb, n=n, p=p))
        check(f"smallb.fused32.inv b={b} {tag}",
              run(mxu32_pallas.inv, xb, n=n, p=p, scale=s),
              run(mxu32.inv, xb, n=n, p=p, scale=s))
    for b, tag, p in ((1, "gl", GOLDILOCKS), (2, "p50", PRIMES52[0]),
                      (3, "p63.mont", P64_REGIMES[2][1])):
        lb = (mk32(b, n), mk32(b, n))
        s = pow(n, p - 2, p) * pow(2, 64, p) % p
        check_pair(f"smallb.fused64.fwd b={b} {tag}",
                   run(mxu64_pallas.fwd, lb, n=n, p=p),
                   run(mxu64.fwd, lb, n=n, p=p))
        check_pair(f"smallb.fused64.inv b={b} {tag}",
                   run(mxu64_pallas.inv, lb, n=n, p=p, scale=s),
                   run(mxu64.inv, lb, n=n, p=p, scale=s))
    # channel-grid kernels at b=1 (the native-plan polymul B=1 path)
    l1 = (mk32(1, n), mk32(1, n))
    m1s = np.asarray(run(lambda l: mxu32_pallas.fwd_wide_multi(l, primes), l1))
    for i, p in enumerate(primes[:2]):
        check(f"smallb.mxu32.fwd_wide_multi b=1 ch{i}", m1s[i],
              run(mxu32.fwd_wide, l1, n=n, p=p))
    xs1 = mk32(3, 1, n)
    scales3 = tuple(pow(n, p - 2, p) * pow(2, 32, p) % p for p in pr3)
    mi1 = np.asarray(run(lambda v: mxu32_pallas.inv_multi(v, pr3, scales3), xs1))
    for i, p in enumerate(pr3[:2]):
        check(f"smallb.mxu32.inv_multi b=1 ch{i}", mi1[i],
              run(mxu32.inv, xs1[i], n=n, p=p, scale=scales3[i]))
    mips1 = np.asarray(run(
        lambda v: mxu32_pallas.inv_multi_presplit(
            mxu32_pallas.digit_planes32(v), pr3, scales3
        ),
        xs1,
    ))
    for i in range(2):
        check(f"smallb.mxu32.inv_multi_presplit b=1 ch{i}", mips1[i], mi1[i])
    scales52 = tuple(pow(n, p - 2, p) * pow(2, 64, p) % p for p in pr52)
    lo, hi = run(lambda l: mxu64_pallas.fwd_multi(l, pr52), l1)
    for i, p in enumerate(pr52[:2]):
        check_pair(f"smallb.mxu64.fwd_multi b=1 ch{i}", (lo[i], hi[i]),
                   run(mxu64.fwd, l1, n=n, p=p))
    # passes engines at b=1 (mid sizes) and the hybrid at b=1 (n=2^15)
    x1m = mk32(1, 4096)
    check("smallb.passes32.fwd b=1 n=4096",
          run(mxu32_pallas.passes_engine.fwd, x1m, n=4096, p=P_LT30),
          run(mxu32.fwd, x1m, n=4096, p=P_LT30))
    l1m = (mk32(1, 4096), mk32(1, 4096))
    check_pair("smallb.passes64.fwd b=1 n=4096",
               run(mxu64_pallas.passes_engine64.fwd, l1m, n=4096, p=GOLDILOCKS),
               run(mxu64.fwd, l1m, n=4096, p=GOLDILOCKS))
    if not args.quick:
        nh = 1 << 15
        l1h = (mk32(1, nh), mk32(1, nh))
        check_pair("smallb.hybrid64.fwd b=1 n=32768",
                   run(stagesplit.fwd64_fused, l1h, n=nh, p=PRIMES52[0]),
                   run(mxu64.fwd, l1h, n=nh, p=PRIMES52[0]))
    del os.environ["CONCRETE_NTT_TPU_SMALLB"]

    dt = time.time() - t0
    if FAILURES:
        print(f"\n{len(FAILURES)}/{N_CHECKS} FAILURES ({dt:.0f}s)", flush=True)
        sys.exit(1)
    print(f"\nall {N_CHECKS} parity checks passed ({dt:.0f}s)", flush=True)
    # An all-PASS FULL run on real hardware certifies the stage-split
    # hybrid's kernel configurations: drop the marker that lets the 'auto'
    # dispatch tier serve them on TPU (ntt_dispatch._hybrid_deployable).
    import jax

    if not args.quick and jax.devices()[0].platform == "tpu":
        from concrete_ntt_tpu.ops.ntt_dispatch import hybrid_hw_verified_marker
        from concrete_ntt_tpu.ops.pallas_env import (
            presplit_hw_verified_marker,
            smallb_hw_verified_marker,
        )

        for path in (
            hybrid_hw_verified_marker(),
            smallb_hw_verified_marker(),
            presplit_hw_verified_marker(),
        ):
            with open(path, "w") as f:
                f.write(
                    f"all {N_CHECKS} checks passed in {dt:.0f}s at commit "
                    f"{commit}\nkernels {khash}\n"
                )
            print(f"hardware-verification marker written: {path}", flush=True)


if __name__ == "__main__":
    main()
