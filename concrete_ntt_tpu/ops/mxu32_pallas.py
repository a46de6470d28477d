"""Fully-fused Pallas TPU kernel for the MXU four-step prime32 NTT.

The pure-XLA MXU engine (ops/mxu32.py) materializes every intermediate in
HBM: the int8 digit planes, the int32 matmul accumulators (4x the data), the
mid-pass representative, and the two transposes — ~14 MB of HBM traffic per
[8, 2^14] transform against 2.5 MB of actual input+output. This kernel runs
the ENTIRE transform per batch tile inside VMEM: transpose, digit split,
int8 MXU matmul, reduction epilogue, twiddle correction, second transpose,
second matmul, canonical epilogue — one HBM read of the operand and one
write of the result. It reuses the exact same algebra functions as the XLA
engine (same module), so results are bit-identical by construction.

This is the TPU analogue of the reference's fused depth-first transform
whose working set stays in L1/L2 (RECURSION_THRESHOLD cache blocking,
prime32.rs:12): the four-step working set stays in VMEM.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu32
from .pallas_env import batch_tile, interpret_mode

_B_TILE = 8  # proven batch-tile extent; B < 8 may use sub-tiles (batch_tile)


@lru_cache(maxsize=256)
def _build_call(n: int, p: int, n_limbs: int, direction: str, scale: int,
                interp: bool = False, hyb: tuple | None = None, bt: int = 8):
    if hyb is None:
        tbl = mxu32._mxu_tables(n, p)
    else:
        # stage-split hybrid block: same kernel SHAPE class as the plain
        # (n, p) fused kernel, different table constants (ops/stagesplit.py)
        from . import stagesplit

        tbl = stagesplit._dev32(hyb[0], p, n)["blocks"][hyb[1]]
    n1, n2 = tbl["n1"], tbl["n2"]

    if direction == "fwd":
        if n_limbs > 1:
            assert hyb is None
            mat1 = mxu32._wide_col_planes(n, p, n_limbs)
        else:
            mat1 = tbl["A"]
        diag = tbl["d"]  # layout [n2, n1]
        mat2 = tbl["F"]
    else:
        assert n_limbs == 1
        mat1 = tbl["G"]
        diag = tbl["e"]  # layout [n1, n2]
        if scale == 1:
            mat2 = tbl["Ainv"]
        elif hyb is None:
            mat2 = mxu32._scaled_ainv_planes(n, p, scale)
        else:
            from . import stagesplit

            mat2 = stagesplit._scaled_ainv_blocks32(hyb[0], p, n, scale)[hyb[1]]

    planes1, cvec1 = mat1
    planes2, cvec2 = mat2
    n_diag = len(diag)

    def kernel(*refs):
        p1_ref, c1_ref, p2_ref, c2_ref = refs[:4]
        diag_refs = refs[4 : 4 + n_diag]
        x_refs = refs[4 + n_diag : 4 + n_diag + n_limbs]
        out_ref = refs[-1]

        m1 = (p1_ref[:], c1_ref[:])
        m2 = (p2_ref[:], c2_ref[:])
        dg = tuple(r[:] for r in diag_refs)

        if direction == "fwd":
            # [Bt, n1, n2] -> transpose -> contract n1 -> correct -> transpose
            # -> contract n2 -> flat (bit-reversed NTT layout)
            v = tuple(
                jnp.swapaxes(r[:].reshape(bt, n1, n2), 1, 2) for r in x_refs
            )
            big = mxu32._dot_planes(v if n_limbs > 1 else v[0], m1)
            lo, hi = mxu32._combine(big, m1)
            y = mxu32._epilogue_scaled_lazy(lo, hi, dg, tbl, p=p)
            y = jnp.swapaxes(y, 1, 2)  # [Bt, n1, n2]
            big = mxu32._dot_planes(y, m2)
            lo, hi = mxu32._combine(big, m2)
            out = mxu32._epilogue_canonical(lo, hi, tbl, p=p)
            out_ref[:] = out.reshape(bt, n)
        else:
            # [Bt, n1, n2] -> contract n2 -> correct -> transpose ->
            # contract n1 -> transpose back -> flat (standard order)
            v = x_refs[0][:].reshape(bt, n1, n2)
            big = mxu32._dot_planes(v, m1)
            lo, hi = mxu32._combine(big, m1)
            y = mxu32._epilogue_scaled_lazy(lo, hi, dg, tbl, p=p)
            y = jnp.swapaxes(y, 1, 2)  # [Bt, n2, n1]
            big = mxu32._dot_planes(y, m2)
            lo, hi = mxu32._combine(big, m2)
            out = mxu32._epilogue_canonical(lo, hi, tbl, p=p)
            out_ref[:] = jnp.swapaxes(out, 1, 2).reshape(bt, n)

    const_specs = [
        pl.BlockSpec(planes1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(cvec1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(planes2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(cvec2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        *[
            pl.BlockSpec(diag[0].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(n_diag)
        ],
    ]
    consts = (planes1, cvec1, planes2, cvec2, *diag)

    def call(*x_limbs):
        bsz = x_limbs[0].shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                *const_specs,
                *[
                    pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=pl.BlockSpec(
                (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interp,
        )(*(jnp.asarray(c) for c in consts), *x_limbs)

    return call


def _run(x_limbs: tuple, *, n: int, p: int, direction: str, scale: int,
         hyb: tuple | None = None):
    b = x_limbs[0].shape[0]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        x_limbs = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in x_limbs)
    call = _build_call(n, p, len(x_limbs), direction, scale, interpret_mode(),
                       hyb, bt)
    out = call(*x_limbs)
    return out[:b] if pad else out


def fwd(x, *, n: int, p: int, hyb: tuple | None = None):
    return _run((x,), n=n, p=p, direction="fwd", scale=1, hyb=hyb)


def fwd_wide(limbs: tuple, *, n: int, p: int):
    return _run(tuple(limbs), n=n, p=p, direction="fwd", scale=1)


def inv(x, *, n: int, p: int, scale: int = 1, hyb: tuple | None = None):
    return _run((x,), n=n, p=p, direction="inv", scale=scale % p, hyb=hyb)


def fused_applicable(n: int) -> bool:
    """Mosaic reshapes/transposes need both four-step factors >= 128 lanes."""
    n1, n2 = mxu32.four_step_factors(n)
    return n1 >= 128 and n2 >= 128


# ---------------------------------------------------------------------------
# Channel-grid kernels: ALL CRT channels of a native plan in ONE pallas_call.
#
# Grid = (batch_tile, channel) with the channel axis innermost, so the
# operand block (whose index map ignores the channel) stays resident in VMEM
# across channels while per-channel planes/diagonals/scalars stream in. The
# prime p and its derived reduction constants become traced scalars read
# from SMEM — the traced-scalar epilogues below mirror ops/mxu32.py
# bit-for-bit (asserted by tests).
#
# For every supported channel prime (2^29 < p < 2^30, the hardcoded table
# primes lib.rs:447-595) the canonical reduction chain is the same shape:
# cond_sub(2p), cond_sub(2p), cond_sub(p) — asserted at build time.
# ---------------------------------------------------------------------------


def _sc_epilogue_scaled_lazy(lo, hi, dg, sc):
    """Traced-scalar version of mxu32._epilogue_scaled_lazy (lazy4 regime;
    the sign offset is folded into cvec so no pad term exists)."""
    p, c32, c32_sh, _unused, two_p = sc
    w, w_sh, w32, w32_sh = dg
    from .u32 import mulhi_u32

    a = lo * w - mulhi_u32(lo, w_sh) * p
    b = hi * w32 - mulhi_u32(hi, w32_sh) * p
    s = a + b  # < 4p < 2^32 (p < 2^30)
    return jnp.where(s >= two_p, s - two_p, s)  # < 2p: valid representative


def _sc_epilogue_canonical(lo, hi, sc):
    """Traced-scalar version of mxu32._epilogue_canonical for 2^29 < p < 2^30."""
    p, c32, c32_sh, _unused, two_p = sc
    from .u32 import mulhi_u32

    r = hi * c32 - mulhi_u32(hi, c32_sh) * p  # [0, 2p)
    r = jnp.where(r >= p, r - p, r)
    four_p = two_p + two_p  # < 2^32 for p < 2^30
    lo = jnp.where(lo >= four_p, lo - four_p, lo)
    lo = jnp.where(lo >= two_p, lo - two_p, lo)
    lo = jnp.where(lo >= p, lo - p, lo)
    s = r + lo
    return jnp.where(s >= p, s - p, s)


def _sc_combine(big, cvec, o):
    u = [
        (big[..., dd * o : (dd + 1) * o] + cvec[dd][None, None, :]).astype(jnp.uint32)
        for dd in range(4)
    ]
    t1 = u[1] << np.uint32(8)
    t2 = u[2] << np.uint32(16)
    t3 = u[3] << np.uint32(24)
    s1 = u[0] + t1
    c1 = (s1 < t1).astype(jnp.uint32)
    s2 = s1 + t2
    c2 = (s2 < t2).astype(jnp.uint32)
    lo = s2 + t3
    c3 = (lo < t3).astype(jnp.uint32)
    hi = (u[1] >> np.uint32(24)) + (u[2] >> np.uint32(16)) + (u[3] >> np.uint32(8))
    hi = hi + c1 + c2 + c3
    return lo, hi


def _dot8(xd, planes):
    return jax.lax.dot_general(
        xd, planes, (((xd.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _multi_tables(n: int, primes: tuple, n_limbs: int, scales: tuple,
                  hyb: tuple | None = None):
    """Stacked per-channel tables for the channel-grid kernels."""
    n1, n2 = mxu32.four_step_factors(n)
    p1f, c1f, p2f, c2f, dgf = [], [], [], [], []
    p1i, c1i, p2i, c2i, dgi = [], [], [], [], []
    scal = []
    for ch, p in enumerate(primes):
        assert (1 << 29) < p < (1 << 30), "channel-grid kernels need 30-bit primes"
        if hyb is None:
            tbl = mxu32._mxu_tables(n, p)
            mat1 = (
                mxu32._wide_col_planes(n, p, n_limbs)
                if n_limbs > 1
                else tbl["A"]
            )
        else:
            # stage-split hybrid block tables (ops/stagesplit.py)
            from . import stagesplit

            tbl = stagesplit._dev32(hyb[0], p, n)["blocks"][hyb[1]]
            mat1 = (
                stagesplit._wide_block_planes32(hyb[0], p, n, hyb[1], n_limbs)
                if n_limbs > 1
                else tbl["A"]
            )
        assert tbl["chain"] == (4 * p, 2 * p, p), "unexpected reduction chain"
        p1f.append(mat1[0])
        c1f.append(mat1[1])
        p2f.append(tbl["F"][0])
        c2f.append(tbl["F"][1])
        dgf.append(tbl["d"])
        p1i.append(tbl["G"][0])
        c1i.append(tbl["G"][1])
        if scales[ch] == 1:
            mat2 = tbl["Ainv"]
        elif hyb is None:
            mat2 = mxu32._scaled_ainv_planes(n, p, scales[ch] % p)
        else:
            from . import stagesplit

            mat2 = stagesplit._scaled_ainv_blocks32(
                hyb[0], p, n, scales[ch] % p
            )[hyb[1]]
        p2i.append(mat2[0])
        c2i.append(mat2[1])
        dgi.append(tbl["e"])
        # slot 3 is reserved-zero (formerly off_mod_p, now folded into cvec)
        scal.append(
            [p, int(tbl["c32"]), int(tbl["c32_shoup"]), 0, 2 * p]
        )
    stack = lambda xs: np.ascontiguousarray(np.stack(xs, axis=0))
    n_dg = len(dgf[0])  # 4 scale-table arrays per channel
    return {
        "n1": n1,
        "n2": n2,
        "fwd": (
            stack(p1f),
            stack(c1f),
            stack(p2f),
            stack(c2f),
            tuple(stack([d[j] for d in dgf]) for j in range(n_dg)),
        ),
        "inv": (
            stack(p1i),
            stack(c1i),
            stack(p2i),
            stack(c2i),
            tuple(stack([d[j] for d in dgi]) for j in range(n_dg)),
        ),
        "scalars": np.array(scal, dtype=np.uint32),  # [C, 5]
    }


@lru_cache(maxsize=64)
def _build_multi_call(n: int, primes: tuple, n_limbs: int, direction: str,
                      scales: tuple, pointwise: bool, interp: bool = False,
                      perch_in: bool = False, hyb: tuple | None = None,
                      bt: int = 8, hoist: bool | None = None,
                      presplit: bool = False):
    """perch_in=True (fwd only): the operand is [C, B, n] per limb with a
    DIFFERENT residue array per channel (e.g. the Bounded centered
    representation, product.rs:303-322, or the stage-split hybrid's prefix
    outputs) instead of one shared limb array.

    presplit=True (inv only, non-pointwise): the operand arrives as the
    int8 digit planes `digit_planes32` emits ([C, B, n1, 4*n2], the exact
    in-kernel _digit8 bit pattern), so the kernel skips its input digit
    split — the split rides the producing XLA elementwise stage instead of
    serializing against the MXU here. Equal HBM bytes (4/element)."""
    assert not (presplit and (pointwise or direction != "inv"))
    tabs = _multi_tables(n, primes, n_limbs, scales, hyb)
    n1, n2 = tabs["n1"], tabs["n2"]
    C = len(primes)
    planes1, cvec1, planes2, cvec2, diag = tabs[direction]
    n_diag = len(diag)
    n_in = (2 if pointwise else 1) * n_limbs if direction == "inv" else n_limbs

    # fwd with a SHARED operand (perch_in=False): the input digit split +
    # (n1, n2) transpose are channel-independent, but the channel grid axis
    # re-executes the kernel body C times per batch tile. Hoist them into a
    # VMEM scratch computed once at channel 0 (the channel axis is innermost
    # and grid steps run sequentially in row-major order), so channels 1..C-1
    # skip ~4·n_limbs digit planes + one transpose of VPU work per element.
    hoist_digits = (direction == "fwd" and not perch_in) if hoist is None else hoist

    def kernel(*refs):
        sc_ref = refs[0]
        p1_ref, c1_ref, p2_ref, c2_ref = refs[1:5]
        diag_refs = refs[5 : 5 + n_diag]
        x_refs = refs[5 + n_diag : 5 + n_diag + n_in]
        out_ref = refs[-2] if hoist_digits else refs[-1]
        xd_scr = refs[-1] if hoist_digits else None

        sc = tuple(sc_ref[0, 0, j] for j in range(5))
        m1 = p1_ref[0]
        cv1 = c1_ref[0]
        m2 = p2_ref[0]
        cv2 = c2_ref[0]
        dg = tuple(r[0][None] for r in diag_refs)

        if direction == "fwd":
            if hoist_digits:
                @pl.when(pl.program_id(1) == 0)
                def _split_once():
                    v = tuple(
                        jnp.swapaxes(r[:].reshape(bt, n1, n2), 1, 2)
                        for r in x_refs
                    )
                    xd_scr[...] = (
                        jnp.concatenate([_digit8(limb) for limb in v], axis=-1)
                        if len(v) > 1
                        else _digit8(v[0])
                    )

                xd = xd_scr[...]
            else:
                v = tuple(
                    jnp.swapaxes(
                        (r[0] if perch_in else r[:]).reshape(bt, n1, n2), 1, 2
                    )
                    for r in x_refs
                )
                xd = jnp.concatenate(
                    [_digit8(limb) for limb in v], axis=-1
                ) if len(v) > 1 else _digit8(v[0])
            lo, hi = _sc_combine(_dot8(xd, m1), cv1, n1)
            y = _sc_epilogue_scaled_lazy(lo, hi, dg, sc)
            y = jnp.swapaxes(y, 1, 2)
            lo, hi = _sc_combine(_dot8(_digit8(y), m2), cv2, n2)
            out = _sc_epilogue_canonical(lo, hi, sc)
            out_ref[0] = out.reshape(bt, n)
        else:
            if pointwise:
                a = x_refs[0][0].reshape(bt, n1, n2)
                b = x_refs[1][0].reshape(bt, n1, n2)
                xd1 = _digit8(_sc_mont_mul(a, b, sc_ref))
            elif presplit:
                xd1 = x_refs[0][0]
            else:
                xd1 = _digit8(x_refs[0][0].reshape(bt, n1, n2))
            lo, hi = _sc_combine(_dot8(xd1, m1), cv1, n2)
            y = _sc_epilogue_scaled_lazy(lo, hi, dg, sc)
            y = jnp.swapaxes(y, 1, 2)
            lo, hi = _sc_combine(_dot8(_digit8(y), m2), cv2, n1)
            out = _sc_epilogue_canonical(lo, hi, sc)
            out_ref[0] = jnp.swapaxes(out, 1, 2).reshape(bt, n)

    k1 = 4 * n_limbs * n1 if direction == "fwd" else 4 * n2
    o1 = n1 if direction == "fwd" else n2
    k2 = 4 * n2 if direction == "fwd" else 4 * n1
    o2 = n2 if direction == "fwd" else n1
    d_shape = diag[0].shape[1:]

    def call(*xs):
        bsz = xs[0].shape[1] if presplit else xs[0].shape[-2]
        grid = (bsz // bt, C)
        const_specs = [
            pl.BlockSpec((1, 1, 6), lambda i, c: (c, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k1, 4 * o1), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, o1), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2, 4 * o2), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, o2), lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec((1,) + d_shape, lambda i, c: (c, 0, 0), memory_space=pltpu.VMEM)
                for _ in range(n_diag)
            ],
        ]
        if direction == "fwd" and perch_in:
            in_specs = [
                pl.BlockSpec((1, bt, n), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        elif direction == "fwd":
            in_specs = [
                pl.BlockSpec((bt, n), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        elif presplit:
            in_specs = [
                pl.BlockSpec(
                    (1, bt, n1, 4 * n2),
                    lambda i, c: (c, i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
        else:
            in_specs = [
                pl.BlockSpec((1, bt, n), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        scal6 = np.zeros((C, 1, 6), dtype=np.uint32)
        scal6[:, 0, :5] = tabs["scalars"]
        scal6[:, 0, 5] = _neginv_vec(primes) if pointwise else 0
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*const_specs, *in_specs],
            out_specs=pl.BlockSpec(
                (1, bt, n), lambda i, c: (c, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((C, bsz, n), jnp.uint32),
            scratch_shapes=(
                [pltpu.VMEM((bt, n2, k1), jnp.int8)] if hoist_digits else []
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(
            jnp.asarray(scal6),
            jnp.asarray(planes1),
            jnp.asarray(cvec1),
            jnp.asarray(planes2),
            jnp.asarray(cvec2),
            *(jnp.asarray(d) for d in diag),
            *xs,
        )

    return call


def _digit8(x):
    parts = []
    for ee in range(4):
        # xor-128 digit trick (see mxu32._digit_cat): same int8 bit pattern
        # as (d & 255) - 128, two fewer VPU ops per plane.
        dig = (x >> np.uint32(8 * ee)) ^ np.uint32(128)
        parts.append(dig.astype(jnp.int8))
    return jnp.concatenate(parts, axis=-1)


def _neginv_vec(primes):
    from .u32 import mont_neginv

    return np.array([mont_neginv(p) for p in primes], dtype=np.uint32)


def _sc_mont_mul(a, b, sc_ref):
    """Montgomery product a*b*2^-32 mod p with traced scalars (u32.mont_mul
    with p/p_neginv read from SMEM). The u32 sum hi + mulhi(m, p) + carry
    can itself wrap (true t < 2^32 + p for arbitrary u32 inputs), so the
    overflow must be tracked explicitly — dropping it returns a wrong
    residue for ~p/2^32 of input pairs."""
    from .u32 import mulhi_u32, mulwide_u32

    p = sc_ref[0, 0, 0]
    p_neginv = sc_ref[0, 0, 5]
    lo, hi = mulwide_u32(a, b)
    m = lo * p_neginv
    mp_hi = mulhi_u32(m, p)
    carry = (lo != 0).astype(jnp.uint32)  # lo(ab) + lo(mp) is 0 or exactly 2^32
    t = hi + mp_hi
    ovf = t < hi
    s = t + carry
    ovf = ovf | (s < t)
    # true value = s + ovf*2^32 ∈ [0, 2p); reduce to [0, p).
    return jnp.where(ovf, s - p, jnp.where(s >= p, s - p, s))


def fwd_wide_multi(limbs: tuple, primes: tuple):
    """All CRT channels' forward NTTs in one kernel: [B, n] limb tuple ->
    [C, B, n] canonical NTT-domain residues."""
    n = limbs[0].shape[-1]
    b = limbs[0].shape[0]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        limbs = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in limbs)
    call = _build_multi_call(
        n, tuple(primes), len(limbs), "fwd", (1,) * len(primes), False,
        interpret_mode(), bt=bt,
    )
    out = call(*limbs)
    return out[:, :b] if pad else out


def fwd_multi_perchannel(x, primes: tuple, hyb: tuple | None = None):
    """All CRT channels' forward NTTs in one kernel with a DIFFERENT residue
    array per channel: x [C, B, n] (any u32 representatives) -> [C, B, n]
    canonical NTT-domain residues. Used by the Bounded product fwd, whose
    centered residues differ per channel (product.rs:303-322), and the
    stage-split hybrid's per-channel prefix outputs."""
    n = x.shape[-1]
    b = x.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    call = _build_multi_call(
        n, tuple(primes), 1, "fwd", (1,) * len(primes), False,
        interpret_mode(), True, hyb, bt,
    )
    out = call(x)
    return out[:, :b] if pad else out


def fwd_wide_multi_perchannel(x_lo, x_hi, primes: tuple,
                              hyb: tuple | None = None):
    """Per-channel-input wide forward: (lo, hi) [C, B, n] u64-representative
    limb pairs per channel (the hybrid's prefix outputs mod each 30-bit p)
    -> [C, B, n] canonical NTT-domain residues. The residue reduction stays
    fused in the 8-operand-plane column matmul."""
    n = x_lo.shape[-1]
    b = x_lo.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        x_lo = jnp.pad(x_lo, ((0, 0), (0, pad), (0, 0)))
        x_hi = jnp.pad(x_hi, ((0, 0), (0, pad), (0, 0)))
    call = _build_multi_call(
        n, tuple(primes), 2, "fwd", (1,) * len(primes), False,
        interpret_mode(), True, hyb, bt,
    )
    out = call(x_lo, x_hi)
    return out[:, :b] if pad else out


def inv_multi(x, primes: tuple, scales: tuple, hyb: tuple | None = None):
    """All channels' scaled inverse NTTs in one kernel:
    x [C, B, n] (any u32 representatives) -> [C, B, n] standard order."""
    n = x.shape[-1]
    b = x.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    call = _build_multi_call(
        n, tuple(primes), 1, "inv", tuple(scales), False, interpret_mode(),
        False, hyb, bt,
    )
    out = call(x)
    return out[:, :b] if pad else out


def digit_planes32(x):
    """XLA-side digit split of inverse-kernel input: [..., B, n] u32 (any
    representatives) -> [..., B, n1, 4*n2] int8 with the EXACT in-kernel
    _digit8 bit pattern (xor-128 planes, plane-major last axis). Meant to
    ride the producing elementwise stage (e.g. the stacked polymul's XLA
    Montgomery pointwise) — the planes are the same 4 bytes/element as the
    u32 they replace, so the split costs no extra HBM."""
    n = x.shape[-1]
    n1, n2 = mxu32.four_step_factors(n)
    return _digit8(x.reshape(x.shape[:-1] + (n1, n2)))


def inv_multi_presplit(xd, primes: tuple, scales: tuple):
    """All channels' scaled inverse NTTs from PRE-SPLIT digit planes
    (digit_planes32 output): xd [C, B, n1, 4*n2] int8 -> [C, B, n]
    standard-order residues. Bit-identical to inv_multi(x) for
    xd = digit_planes32(x); skips the in-kernel VPU digit split, which
    otherwise serializes against the MXU (round-5 profile: inv MFU 0.63)."""
    n1, four_n2 = xd.shape[-2], xd.shape[-1]
    n2 = four_n2 // 4
    n = n1 * n2
    assert (n1, n2) == mxu32.four_step_factors(n)
    b = xd.shape[1]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        xd = jnp.pad(xd, ((0, 0), (0, pad), (0, 0), (0, 0)))
    call = _build_multi_call(
        n, tuple(primes), 1, "inv", tuple(scales), False, interpret_mode(),
        False, None, bt, presplit=True,
    )
    out = call(xd)
    return out[:, :b] if pad else out


def pointwise_inv_multi(fl, fr, primes: tuple, scales: tuple,
                        hyb: tuple | None = None):
    """All channels' pointwise Montgomery product + scaled inverse NTT in one
    kernel: fl, fr [C, B, n] -> [C, B, n] standard-order residues."""
    n = fl.shape[-1]
    b = fl.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        fl = jnp.pad(fl, ((0, 0), (0, pad), (0, 0)))
        fr = jnp.pad(fr, ((0, 0), (0, pad), (0, 0)))
    call = _build_multi_call(
        n, tuple(primes), 1, "inv", tuple(scales), True, interpret_mode(),
        False, hyb, bt,
    )
    out = call(fl, fr)
    return out[:, :b] if pad else out


# ---------------------------------------------------------------------------
# Per-pass fused kernels: ONE matmod (digits + int8 dot + epilogue) in VMEM.
#
# The sharded four-step (parallel/fourstep_mxu.py) must run the all-to-all
# BETWEEN the two passes, so it cannot use the whole-transform kernel; these
# half-transform kernels give shard_map's local sections the same VMEM
# fusion. Shapes: x [B, rows, K] contracting the last axis (rows is the
# local shard extent — any multiple of 8).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _fused_pass_mat(n: int, p: int, which: str, n_limbs: int, scale: int,
                    f: int):
    """Pass planes with `f` logical rows fused into one kernel row: the
    contraction matrix becomes kron(I_f, M), so the per-digit output width
    grows from O to f*O. Mosaic miscompiles some u32 carry-add chains below
    ~64 output lanes (CLAUDE.md); fusing keeps every kernel shape at >= 128
    lanes — the XLA-side reshape [B, rows, K] -> [B, rows/f, f*K] is free
    (row-major view)."""
    ops = mxu32._operators(n, p)
    if which == "Ainv" and scale != 1:
        M = (ops["Ainv"].T.astype(object) * scale % p).astype(np.uint64)
    else:
        M = ops[which].T
    if f > 1:
        M = np.kron(np.eye(f, dtype=np.uint64), np.asarray(M, dtype=np.uint64))
    return mxu32._prep(np.ascontiguousarray(M), p, 4 * n_limbs)


@lru_cache(maxsize=256)
def _build_pass_call(n: int, p: int, which: str, scaled: bool, rows: int,
                     n_limbs: int = 1, scale: int = 1, interp: bool = False,
                     row_fuse: int = 1, bt: int = 8):
    tbl = mxu32._mxu_tables(n, p)
    if row_fuse > 1:
        mat = _fused_pass_mat(n, p, which, n_limbs, scale, row_fuse)
    elif which == "A" and n_limbs > 1:
        mat = mxu32._wide_col_planes(n, p, n_limbs)
    elif which == "Ainv" and scale != 1:
        mat = mxu32._scaled_ainv_planes(n, p, scale)
    else:
        mat = tbl[which]
    planes, cvec = mat
    diag = tbl["d" if which == "A" else "e"] if scaled else None
    k_in = planes.shape[0] // 4
    n_diag = len(diag) if scaled else 0

    k_lane = k_in // n_limbs  # per-limb contraction extent

    def kernel(*refs):
        p_ref, c_ref = refs[0], refs[1]
        diag_refs = refs[2 : 2 + n_diag]
        x_refs = refs[2 + n_diag : 2 + n_diag + n_limbs]
        out_ref = refs[-1]
        m = (p_ref[:], c_ref[:])
        x = tuple(r[:] for r in x_refs) if n_limbs > 1 else x_refs[0][:]
        if scaled:
            dg = tuple(r[:] for r in diag_refs)  # 2D; epilogue broadcasts
            lo, hi = mxu32._limbs(x, m, tbl)
            out = mxu32._epilogue_scaled_lazy(lo, hi, dg, tbl, p=p)
        else:
            out = mxu32._matmod(x, m, tbl, p=p)
        out_ref[:] = out

    def call(*args):
        xs, diag_slices = args[:n_limbs], args[n_limbs:]
        bsz = xs[0].shape[0]
        o = planes.shape[1] // cvec.shape[0]  # D matrix digit planes
        return pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                pl.BlockSpec(planes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(cvec.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                *[
                    pl.BlockSpec(
                        diag_slices[j].shape,
                        lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for j in range(n_diag)
                ],
                *[
                    pl.BlockSpec(
                        (bt, rows, k_lane),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=pl.BlockSpec(
                (bt, rows, o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, rows, o), jnp.uint32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(jnp.asarray(planes), jnp.asarray(cvec), *diag_slices, *xs)

    return call


def pass_matmod(x, *, n: int, p: int, which: str, diag_slices=(),
                n_limbs: int = 1, scale: int = 1, row_fuse: int = 1):
    """Fused one-pass modular matmul: x [B, rows, K] u32 (any representative,
    contract last; limb tuple for wide column passes) -> [B, rows, O].
    which in {A, F, G, Ainv}; pass the rank-local diagonal slices for the
    scaled (A/G) passes. row_fuse=f runs the kernel on [B, rows/f, f*K]
    against kron(I_f, M) so small factors keep >= 128 output lanes."""
    xs = x if isinstance(x, tuple) else (x,)
    b, rows, _k = xs[0].shape
    f = row_fuse
    if f > 1:
        if rows % f:
            raise ValueError(f"row_fuse={f} must divide rows={rows}")
        xs = tuple(a.reshape(b, rows // f, f * _k) for a in xs)
        diag_slices = tuple(
            d.reshape(rows // f, -1) for d in diag_slices
        )
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        xs = tuple(jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in xs)
    call = _build_pass_call(
        n, p, which, bool(diag_slices), rows // f, len(xs), scale % p,
        interpret_mode(), f, bt,
    )
    out = call(*xs, *diag_slices)
    out = out[:b] if pad else out
    if f > 1:
        out = out.reshape(b, rows, -1)
    return out


# ---------------------------------------------------------------------------
# Mid-size transforms (2048 <= n < 2^14): the whole-transform kernel needs
# both four-step factors >= 128 lanes (Mosaic in-kernel transposes), so these
# sizes run as two fused pass kernels with the transpose between them in XLA.
# Same API as the whole-transform module; bit-identical results.
# ---------------------------------------------------------------------------


def _split_n(n: int):
    log2n = n.bit_length() - 1
    n1 = 1 << (log2n // 2)
    return n1, n // n1


def _fuse_for(o: int) -> int:
    """Row-fusion factor keeping the per-digit output width at >= 64 lanes
    (the verified-safe floor for the u32 carry-add combine; fused shapes
    target 128)."""
    return 1 if o >= 64 else 128 // o


def fwd_passes(x, *, n: int, p: int):
    return fwd_wide_passes((x,), n=n, p=p)


def fwd_wide_passes(limbs: tuple, *, n: int, p: int):
    n1, n2 = _split_n(n)
    tbl = mxu32._mxu_tables(n, p)
    b = limbs[0].shape[0]
    d = tuple(jnp.asarray(a) for a in tbl["d"])
    v = tuple(a.reshape(b, n1, n2).transpose(0, 2, 1) for a in limbs)
    y = pass_matmod(v, n=n, p=p, which="A", diag_slices=d, n_limbs=len(limbs),
                    row_fuse=_fuse_for(n1))
    y = y.transpose(0, 2, 1)  # [B, n1, n2]
    out = pass_matmod(y, n=n, p=p, which="F", row_fuse=_fuse_for(n2))
    return out.reshape(b, n)


def inv_passes(x, *, n: int, p: int, scale: int = 1):
    n1, n2 = _split_n(n)
    tbl = mxu32._mxu_tables(n, p)
    b = x.shape[0]
    e = tuple(jnp.asarray(a) for a in tbl["e"])
    v = x.reshape(b, n1, n2)
    y = pass_matmod(v, n=n, p=p, which="G", diag_slices=e,
                    row_fuse=_fuse_for(n2))
    y = y.transpose(0, 2, 1)  # [B, n2, n1]
    out = pass_matmod(y, n=n, p=p, which="Ainv", scale=scale,
                      row_fuse=_fuse_for(n1))
    return out.transpose(0, 2, 1).reshape(b, n)



class _PassesEngine:
    """Engine facade for mid sizes: same fwd/fwd_wide/inv surface as this
    module's whole-transform kernels, built from the two pass kernels."""

    fwd = staticmethod(fwd_passes)
    fwd_wide = staticmethod(fwd_wide_passes)
    inv = staticmethod(inv_passes)


passes_engine = _PassesEngine()
