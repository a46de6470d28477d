"""Per-stage profile of the headline native64/Plan32 polymul pipeline.

Round-3 verdict item 3: the headline runs at ~42% of the int8-matmul-only
ceiling; the residual lives in the fwd digit-split/combine, the epilogues,
the XLA pointwise, and the Garner lift. This tool measures each stage of
the stacked polymul fast path (ntt_dispatch.try_polymul32_stacked)
SEPARATELY with the same chain-difference method as the grid, in ONE
process (cross-process wobble is ±15%), and prints a table with

  * measured ns/poly per stage and its share of the whole step,
  * the int8-MAC model time for the transform stages (MXU MACs from the
    actual operator-table shapes at the measured ~430 Tops int8 peak),
  * the ideal-HBM time per stage (operand+result bytes at 0.8 TB/s),

so "MFU" and "HBM-util" per stage are explicit. Run on the real TPU:

    python tools/profile_stages.py [--n 16384] [--batch 8] [--out FILE]

One JSON line per stage; honest-overhead check: the stage times are also
summed and compared against the measured whole step (XLA may fuse across
stage boundaries in the real pipeline, so sum >= whole is expected; a
large gap means the decomposition is not faithful).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INT8_PEAK_MACS = 215e12  # 430 TOP/s measured == 215e12 MAC/s
HBM_BYTES_PER_SEC = 0.8e12


def _mk_limbs(rng, b, n):
    import jax.numpy as jnp

    x = rng.integers(0, 1 << 64, (b, n), dtype=np.uint64)
    return (
        jnp.asarray((x & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
    )


def _tree_bytes(t):
    import jax

    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(t)
    )


def _transform_macs(n: int, primes, which: str = "fwd", n_limbs: int = 2) -> int:
    """int8 MACs per polynomial for one channel-grid transform over all
    channels, read off the ACTUAL operator-table shapes (the plane diet
    makes plane counts functions of p): pass1 runs once per column (n2),
    pass2 once per row (n1), each an [K, O] plane matmul."""
    from concrete_ntt_tpu.ops import mxu32

    n1, n2 = mxu32.four_step_factors(n)
    total = 0
    for p in primes:
        tbl = mxu32._mxu_tables(n, p)
        if which == "fwd":
            mat1 = (
                mxu32._wide_col_planes(n, p, n_limbs) if n_limbs > 1 else tbl["A"]
            )
            mat2 = tbl["F"]
        else:
            mat1, mat2 = tbl["G"], tbl["Ainv"]
        k1, o1 = mat1[0].shape
        k2, o2 = mat2[0].shape
        total += n2 * k1 * o1 + n1 * k2 * o2
    return total


def _transform_macs64(n: int, primes, which: str = "fwd") -> int:
    """int8 MACs per polynomial for the Plan52 (prime64 limb-pair) channel
    grid, from the actual mxu64 table shapes."""
    from concrete_ntt_tpu.ops import mxu64

    total = 0
    for p in primes:
        tbl = mxu64._tables(n, p)
        n1, n2 = tbl["n1"], tbl["n2"]
        m1, m2 = (tbl["A"], tbl["F"]) if which == "fwd" else (tbl["G"], tbl["Ainv"])
        k1, o1 = np.asarray(m1[0]).shape
        k2, o2 = np.asarray(m2[0]).shape
        total += (n2 if which == "fwd" else n1) * k1 * o1
        total += (n1 if which == "fwd" else n2) * k2 * o2
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=None,
                    help="chain length override (CPU smoke: 2)")
    ap.add_argument("--tier", choices=["plan32", "plan52", "native128"],
                    default="plan32",
                    help="plan52: profile the 3x prime64-channel pipeline "
                    "(the round-4 verdict item-4 gap: 31.4k vs the 33k model); "
                    "native128: the 10-channel u128 pipeline (use --n 65536 "
                    "for the north-star single-chip shape; verdict item 8: "
                    "rec_u128_from10's share)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    # honor an explicit CPU request: the axon plugin overrides JAX_PLATFORMS
    # at import, and with the tunnel down the process wedges on a futex
    # (CLAUDE.md rule 1c) — the config update below is the only way to force
    # the CPU backend for smoke runs.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import crt, ntt_dispatch as nd
    from concrete_ntt_tpu.ops.u32 import mulhi_u32, mulwide_u32
    from concrete_ntt_tpu.utils.profiling import chain_time

    n, B = args.n, args.batch
    os.environ.setdefault("CONCRETE_NTT_TPU_ENGINE", "mxu")
    if args.tier == "plan52":
        return profile_plan52(args)
    if args.tier == "native128":
        return profile_native128(args)
    plan = native64.Plan32.try_new(n)
    assert plan is not None
    plans = plan.plans
    primes = tuple(pl.p for pl in plans)
    C = len(primes)
    eng = nd._mxu_impl(n)
    rng = np.random.default_rng(0)

    la, ra = _mk_limbs(rng, B, n), _mk_limbs(rng, B, n)

    use_hyb = nd._hybrid32_multi_wanted(n, plans)
    if use_hyb:
        from concrete_ntt_tpu.ops import stagesplit

        fwd_fn = lambda l: stagesplit.fwd_wide_multi_hybrid32(l, primes, n=n)
    else:
        fwd_fn = lambda l: eng.fwd_wide_multi(l, primes)

    scales = tuple(
        pow(n, pl.p - 2, pl.p) * pow(2, 32, pl.p) % pl.p for pl in plans
    )
    if use_hyb:
        from concrete_ntt_tpu.ops import stagesplit

        inv_fn = lambda t: stagesplit.inv_multi_hybrid32(t, primes, scales, n=n)
    else:
        inv_fn = lambda t: eng.inv_multi(t, primes, scales)

    pv = jnp.asarray(np.array(primes, dtype=np.uint32)).reshape(C, 1, 1)
    nv = jnp.asarray(
        np.array([pl.p_neginv for pl in plans], dtype=np.uint32)
    ).reshape(C, 1, 1)

    def pointwise(fl, fr):
        lo, hi = mulwide_u32(fl, fr)
        m = lo * nv
        return hi + mulhi_u32(m, pv) + (lo != 0).astype(jnp.uint32)

    # --- stage steps (two-element carries; outputs feed back as inputs) ----
    def step_full(carry):
        (llo, lhi), (rlo, rhi) = carry
        out = nd.try_polymul32_stacked((llo, lhi), (rlo, rhi), plans)
        assert out is not None
        # recycle two channel rows as the next lhs limbs (fresh data per step)
        return ((out[0], out[1]), (llo, lhi))

    def step_fwd(carry):
        (llo, lhi), prev = carry
        f = fwd_fn((llo, lhi))
        return ((f[0], f[1]), (llo, lhi))

    def step_pointwise(carry):
        fl, fr = carry
        t = pointwise(fl, fr)
        return (t, fl)

    def step_inv(carry):
        t, prev = carry
        o = inv_fn(t)
        return (o, t)

    def step_lift(carry):
        t, prev = carry
        mods = [t[i] for i in range(C)]
        lo, hi = crt.rec_u64_from5(mods, primes)
        nxt = jnp.stack(
            [lo, hi, lo + np.uint32(1), hi ^ lo, lo - hi], axis=0
        )
        return (nxt, t)

    f0 = np.asarray(
        rng.integers(0, 1 << 32, (C, B, n), dtype=np.uint64)
    ).astype(np.uint32)
    f1 = np.asarray(
        rng.integers(0, 1 << 32, (C, B, n), dtype=np.uint64)
    ).astype(np.uint32)

    stages = [
        ("full-polymul", step_full, (la, ra), 1.0),
        ("fwd-wide-multi (x2 per polymul)", step_fwd, (la, ra[:1] * 2), 2.0),
        ("pointwise-montgomery", step_pointwise, (f0, f1), 1.0),
        ("inv-multi", step_inv, (f0, f1), 1.0),
        ("garner-lift rec_u64_from5", step_lift, (f0, f1), 1.0),
    ]

    fwd_macs = _transform_macs(n, primes, "fwd")
    inv_macs = _transform_macs(n, primes, "inv")
    _emit(args, stages, B, fwd_macs, inv_macs)


def _emit(args, stages, B, fwd_macs, inv_macs):
    import jax
    import jax.numpy as jnp

    from concrete_ntt_tpu.utils.profiling import chain_time

    n = args.n
    rows = []
    length = args.length or (64 if n <= (1 << 14) else 32)
    for name, step, a, mult in stages:
        print(f"# timing: {name} (chain length {length})", file=sys.stderr,
              flush=True)
        t = chain_time(step, a, length=length)
        per_poly_ns = t / B * 1e9
        hbm_ns = _tree_bytes(jax.tree_util.tree_map(jnp.asarray, a)) / B / HBM_BYTES_PER_SEC * 1e9
        row = {
            "stage": name,
            "ns_per_poly": round(per_poly_ns, 1),
            "x_per_polymul": mult,
            "hbm_floor_ns": round(hbm_ns, 1),
            "hbm_util": round(hbm_ns / per_poly_ns, 3),
        }
        macs = fwd_macs if "fwd" in name else inv_macs if "inv" in name else None
        if macs is not None:
            mxu_ns = macs / INT8_PEAK_MACS * 1e9
            row["mxu_model_ns"] = round(mxu_ns, 1)
            row["mfu"] = round(mxu_ns / per_poly_ns, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    whole = rows[0]["ns_per_poly"]
    parts = sum(r["ns_per_poly"] * r["x_per_polymul"] for r in rows[1:])
    summary = {
        "stage": "SUM(parts) vs whole",
        "sum_parts_ns": round(parts, 1),
        "whole_ns": round(whole, 1),
        "decomposition_overhead": round(parts / whole - 1, 3),
        "polymuls_per_sec": round(1e9 / whole, 1),
    }
    print(json.dumps(summary), flush=True)
    rows.append(summary)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def profile_plan52(args):
    """Stage profile of the Plan52 (3x prime64 channel) polymul: fused
    residue-intake fwd_multi x2, fused Montgomery pointwise + scaled
    inverse (pointwise_inv_multi — Plan52's production composition), and
    the rec_from3_p50_u64 lift. Measured against the mxu64 int8-MAC model
    so the 31.4k-vs-33k round-3 gap gets a per-stage attribution."""
    import jax.numpy as jnp

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops import crt, ntt_dispatch as nd
    from concrete_ntt_tpu.tables import PRIMES52

    n, B = args.n, args.batch
    plan = native64.Plan52.try_new(n)
    assert plan is not None
    plans = plan.plans
    primes = tuple(pl.p for pl in plans)
    C = len(primes)
    rng = np.random.default_rng(0)
    la, ra = _mk_limbs(rng, B, n), _mk_limbs(rng, B, n)

    def step_full(carry):
        (llo, lhi), (rlo, rhi) = carry
        fl = nd.try_fwd64_wide_all((llo, lhi), plans)
        fr = nd.try_fwd64_wide_all((rlo, rhi), plans)
        assert fl is not None and fr is not None
        fl_arr = jnp.stack(
            [jnp.stack([lo, hi], axis=-1) for lo, hi in fl], axis=0
        )
        fr_arr = jnp.stack(
            [jnp.stack([lo, hi], axis=-1) for lo, hi in fr], axis=0
        )
        res = nd.try_pointwise_inv64_all(fl_arr, fr_arr, plans)
        assert res is not None
        lo, hi = crt.rec_from3_p50_u64([(r[0], r[1]) for r in res], primes)
        return ((lo, hi), (llo, lhi))

    def step_fwd(carry):
        (llo, lhi), prev = carry
        f = nd.try_fwd64_wide_all((llo, lhi), plans)
        assert f is not None
        return ((f[0][0], f[0][1]), (llo, lhi))

    f0 = tuple(
        np.asarray(rng.integers(0, 1 << 32, (C, B, n, 2), dtype=np.uint64))
        .astype(np.uint32)
        for _ in range(2)
    )

    def step_pwinv(carry):
        fl_arr, fr_arr = carry
        res = nd.try_pointwise_inv64_all(fl_arr, fr_arr, plans)
        assert res is not None
        nxt = jnp.stack(
            [jnp.stack([lo, hi], axis=-1) for lo, hi in res], axis=0
        )
        return (nxt, fl_arr)

    def step_lift(carry):
        fl_arr, prev = carry
        lo, hi = crt.rec_from3_p50_u64(
            [(fl_arr[i, ..., 0], fl_arr[i, ..., 1]) for i in range(C)],
            primes,
        )
        nxt = jnp.stack(
            [jnp.stack([lo, hi], axis=-1),
             jnp.stack([hi, lo], axis=-1),
             jnp.stack([lo ^ hi, lo + hi], axis=-1)],
            axis=0,
        )
        return (nxt, fl_arr)

    stages = [
        ("full-polymul-52", step_full, (la, ra), 1.0),
        ("fwd-multi-52 (x2 per polymul)", step_fwd, (la, ra), 2.0),
        ("pointwise+inv-multi-52 (fused)", step_pwinv, f0, 1.0),
        ("lift rec_from3_p50_u64", step_lift, f0, 1.0),
    ]
    fwd_macs = _transform_macs64(n, primes, "fwd")
    inv_macs = _transform_macs64(n, primes, "inv")
    _emit(args, stages, B, fwd_macs, inv_macs)


def profile_native128(args):
    """Stage profile of the native128 (10x prime32 channel, 4-limb u128)
    polymul — run with --n 65536 for the north-star single-chip shape.
    Attribution target (round-4 verdict item 8): rec_u128_from10's share
    now that the hybrid serves the n >= 2^15 transforms."""
    import jax.numpy as jnp

    from concrete_ntt_tpu import native128
    from concrete_ntt_tpu.ops import crt, ntt_dispatch as nd

    n, B = args.n, args.batch
    plan = native128.Plan32.try_new(n)
    assert plan is not None
    plans = plan.plans
    primes = tuple(pl.p for pl in plans)
    C = len(primes)
    rng = np.random.default_rng(0)

    def mk4(b):
        return tuple(
            jnp.asarray(
                rng.integers(0, 1 << 32, (b, n), dtype=np.uint64).astype(
                    np.uint32
                )
            )
            for _ in range(4)
        )

    la, ra = mk4(B), mk4(B)

    def step_full(carry):
        l4, r4 = carry
        out = nd.try_polymul32_stacked(l4, r4, plans)
        assert out is not None
        lo0, lo1, hi0, hi1 = crt.rec_u128_from10(
            [out[i] for i in range(C)], primes
        )
        return ((lo0, lo1, hi0, hi1), l4)

    def step_fwd(carry):
        l4, prev = carry
        eng = nd._mxu_impl(n)
        if nd._hybrid32_multi_wanted(n, plans):
            from concrete_ntt_tpu.ops import stagesplit

            f = stagesplit.fwd_wide_multi_hybrid32(l4, primes, n=n)
        else:
            f = eng.fwd_wide_multi(l4, primes)
        return ((f[0], f[1], f[2], f[3]), l4)

    scales = tuple(
        pow(n, pl.p - 2, pl.p) * pow(2, 32, pl.p) % pl.p for pl in plans
    )

    def step_inv(carry):
        t, prev = carry
        eng = nd._mxu_impl(n)
        if nd._hybrid32_multi_wanted(n, plans):
            from concrete_ntt_tpu.ops import stagesplit

            o = stagesplit.inv_multi_hybrid32(t, primes, scales, n=n)
        else:
            o = eng.inv_multi(t, primes, scales)
        return (o, t)

    def step_lift(carry):
        t, prev = carry
        lo0, lo1, hi0, hi1 = crt.rec_u128_from10(
            [t[i] for i in range(C)], primes
        )
        nxt = jnp.stack(
            [lo0, lo1, hi0, hi1, lo0 ^ hi0, lo1 + hi1,
             lo0 - hi1, hi0 ^ lo1, lo0 + lo1, hi0 + hi1],
            axis=0,
        )
        return (nxt, t)

    f0 = np.asarray(
        rng.integers(0, 1 << 32, (C, B, n), dtype=np.uint64)
    ).astype(np.uint32)
    f1 = np.asarray(
        rng.integers(0, 1 << 32, (C, B, n), dtype=np.uint64)
    ).astype(np.uint32)

    stages = [
        ("full-polymul-128", step_full, (la, ra), 1.0),
        ("fwd-wide-multi4 x10ch (x2)", step_fwd, (la, ra), 2.0),
        ("inv-multi x10ch", step_inv, (f0, f1), 1.0),
        ("lift rec_u128_from10", step_lift, (f0, f1), 1.0),
    ]
    fwd_macs = _transform_macs(n, primes, "fwd", n_limbs=4)
    inv_macs = _transform_macs(n, primes, "inv")
    _emit(args, stages, B, fwd_macs, inv_macs)


if __name__ == "__main__":
    main()
