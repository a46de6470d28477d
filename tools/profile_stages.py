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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--length", type=int, default=None,
                    help="chain length override (CPU smoke: 2)")
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
        macs = fwd_macs if "fwd" in name else inv_macs if "inv-" in name else None
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


if __name__ == "__main__":
    main()
