"""Fully-fused Pallas TPU kernel for the MXU four-step prime64 NTT.

Same VMEM-residency rationale as ops/mxu32_pallas.py: the XLA mxu64 engine
round-trips every intermediate (int8 digit planes, int32 accumulators,
3-limb combines, Montgomery scale) through HBM; this kernel runs the whole
transform per batch tile inside VMEM, reusing the exact jnp algebra from
ops/mxu64.py so results are bit-identical.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import mxu64
from .pallas_env import batch_tile, interpret_mode

_B_TILE = 8


def fused_applicable(n: int) -> bool:
    n1, n2 = mxu64.four_step_factors(n)
    return n1 >= 128 and n2 >= 128


@lru_cache(maxsize=128)
def _build_call(n: int, p: int, n_limbs: int, direction: str, scale: int,
                interp: bool = False, hyb: tuple | None = None, bt: int = 8):
    if hyb is None:
        tbl = mxu64._tables(n, p)
    else:
        # stage-split hybrid block: same kernel SHAPE class as the plain
        # (n, p) fused kernel (n = n_h), different table constants — the
        # per-block operators of a larger transform (ops/stagesplit.py)
        from . import stagesplit

        parent_n, blk = hyb
        tbl = stagesplit._dev64(parent_n, p, n)["blocks"][blk]
    n1, n2 = tbl["n1"], tbl["n2"]

    if direction == "fwd":
        if n_limbs != 2:
            assert hyb is None
            mat1 = mxu64._wide_col_planes(n, p, n_limbs)
        else:
            mat1 = tbl["A"]
        diag = tbl["d"]  # 4 arrays [n2, n1]
        mat2 = tbl["F"]
    else:
        assert n_limbs == 2
        mat1 = tbl["G"]
        diag = tbl["e"]  # 4 arrays [n1, n2]
        if scale == 1:
            mat2 = tbl["Ainv"]
        elif hyb is None:
            mat2 = mxu64._scaled_ainv_planes(n, p, scale)
        else:
            from . import stagesplit

            mat2 = stagesplit._scaled_ainv_blocks64(hyb[0], p, n, scale)[hyb[1]]

    planes1, cvec1 = mat1
    planes2, cvec2 = mat2
    n_diag = len(diag)

    def kernel(*refs):
        p1_ref, c1_ref, p2_ref, c2_ref = refs[:4]
        diag_refs = refs[4 : 4 + n_diag]
        x_refs = refs[4 + n_diag : 4 + n_diag + n_limbs]
        out_lo_ref, out_hi_ref = refs[-2], refs[-1]

        m1 = (p1_ref[:], c1_ref[:])
        m2 = (p2_ref[:], c2_ref[:])
        dg = tuple(r[:] for r in diag_refs)

        if direction == "fwd":
            v = tuple(
                jnp.swapaxes(r[:].reshape(bt, n1, n2), 1, 2) for r in x_refs
            )
            y = mxu64._matmod_scaled_lazy(v, m1, dg, tbl)
            y = mxu64._t(y)  # [Bt, n1, n2]
            lo, hi = mxu64._matmod_canonical(y, m2, tbl)
            out_lo_ref[:] = lo.reshape(bt, n)
            out_hi_ref[:] = hi.reshape(bt, n)
        else:
            v = tuple(r[:].reshape(bt, n1, n2) for r in x_refs)
            y = mxu64._matmod_scaled_lazy(v, m1, dg, tbl)
            y = mxu64._t(y)  # [Bt, n2, n1]
            lo, hi = mxu64._matmod_canonical(y, m2, tbl)
            out_lo_ref[:] = lo.transpose(0, 2, 1).reshape(bt, n)
            out_hi_ref[:] = hi.transpose(0, 2, 1).reshape(bt, n)

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
                    pl.BlockSpec(
                        (bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                    )
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=[
                pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(2)
            ],
            out_shape=[jax.ShapeDtypeStruct((bsz, n), jnp.uint32) for _ in range(2)],
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
    lo, hi = call(*x_limbs)
    if pad:
        lo, hi = lo[:b], hi[:b]
    return lo, hi


def fwd(limbs: tuple, *, n: int, p: int, hyb: tuple | None = None):
    return _run(tuple(limbs), n=n, p=p, direction="fwd", scale=1, hyb=hyb)


def inv(limbs: tuple, *, n: int, p: int, scale: int = 1,
        hyb: tuple | None = None):
    return _run(tuple(limbs), n=n, p=p, direction="inv", scale=scale % p,
                hyb=hyb)


# ---------------------------------------------------------------------------
# Per-pass fused kernels + mid-size passes engine (4096 <= n < 2^14): the
# whole-transform kernel needs both four-step factors >= 128 (Mosaic
# in-kernel reshapes), and the 3-limb u32 carry-add combine MISCOMPILES
# below ~128 output lanes (CLAUDE.md: wrong s6 at 64 lanes). Mid sizes run
# as two pass kernels with the transpose in XLA, and small factors fuse f
# logical rows per kernel row against kron(I_f, M) so the per-digit output
# width stays >= 128 lanes (same trick as mxu32_pallas._fused_pass_mat).
# ---------------------------------------------------------------------------


def _fuse_for64(o: int) -> int:
    return 1 if o >= 128 else 128 // o


@lru_cache(maxsize=128)
def _fused_pass_mat64(n: int, p: int, which: str, n_limbs: int, scale: int,
                      f: int):
    ops = mxu64._operators(n, p)
    if which == "Ainv" and scale != 1:
        M = (ops["Ainv"].T.astype(object) * scale % p).astype(np.uint64)
    else:
        M = ops[which].T
    if f > 1:
        M = np.kron(np.eye(f, dtype=np.uint64), np.asarray(M, dtype=np.uint64))
    if which in ("F", "Ainv") and n_limbs == 2:
        # mid-pass operands are bounded < 4p by our scaled epilogue
        n_e = mxu64._n_eplanes_lazy(p)
    else:
        n_e = 4 * n_limbs
    return mxu64._prep64(np.ascontiguousarray(M), p, n_e)


@lru_cache(maxsize=128)
def _build_pass_call64(n: int, p: int, which: str, scaled: bool, rows: int,
                       n_limbs: int, scale: int, f: int, interp: bool,
                       bt: int = 8):
    tbl = mxu64._tables(n, p)
    planes, cvec = _fused_pass_mat64(n, p, which, n_limbs, scale, f)
    n_mont = len(tbl["d"]) if scaled else 0
    n_d = cvec.shape[0]
    n_e = (
        mxu64._n_eplanes_lazy(p)
        if which in ("F", "Ainv") and n_limbs == 2
        else 4 * n_limbs
    )
    k_lane = planes.shape[0] // n_e
    o = planes.shape[1] // n_d

    def kernel(*refs):
        p_ref, c_ref = refs[0], refs[1]
        mont_refs = refs[2 : 2 + n_mont]
        x_refs = refs[2 + n_mont : 2 + n_mont + n_limbs]
        out_lo_ref, out_hi_ref = refs[-2], refs[-1]
        v = tuple(r[:] for r in x_refs)
        big = mxu64._dot(mxu64._digit_cat(v, n_e), p_ref[:])
        trip = mxu64._combine8(big, jnp.asarray(c_ref[:]), o, n_d)
        if scaled:
            lo, hi = mxu64._scaled_epilogue(
                *trip, tuple(r[:] for r in mont_refs), tbl
            )
        else:
            lo, hi = mxu64._canonical(*trip, tbl)
        out_lo_ref[:] = lo
        out_hi_ref[:] = hi

    def call(*args):
        xs, mont_slices = args[:n_limbs], args[n_limbs:]
        bsz = xs[0].shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // bt,),
            in_specs=[
                pl.BlockSpec(planes.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(cvec.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                *[
                    pl.BlockSpec(
                        mont_slices[j].shape, lambda i: (0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for j in range(n_mont)
                ],
                *[
                    pl.BlockSpec(
                        (bt, rows, k_lane), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=[
                pl.BlockSpec((bt, rows, o), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(2)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bsz, rows, o), jnp.uint32)
                for _ in range(2)
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )(jnp.asarray(planes), jnp.asarray(cvec), *mont_slices, *xs)

    return call


def pass_matmod64(x_pair, *, n: int, p: int, which: str, mont_slices=(),
                  scale: int = 1, row_fuse: int = 1):
    """One fused modular-matmul pass on limb pairs: x (lo, hi) [B, rows, K]
    (or a longer limb tuple for wide column passes) -> (lo, hi) [B, rows, O].
    Scaled (A/G) passes take the 4 rank-local mont-table slices; the final
    pass is canonical."""
    xs = tuple(x_pair)
    b, rows, _k = xs[0].shape
    f = row_fuse
    if f > 1:
        if rows % f:
            raise ValueError(f"row_fuse={f} must divide rows={rows}")
        xs = tuple(a.reshape(b, rows // f, f * _k) for a in xs)
        mont_slices = tuple(m.reshape(rows // f, -1) for m in mont_slices)
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    if pad:
        xs = tuple(jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in xs)
    call = _build_pass_call64(
        n, p, which, bool(mont_slices), rows // f, len(xs), scale % p, f,
        interpret_mode(), bt,
    )
    mont_slices = tuple(jnp.asarray(m) for m in mont_slices)
    lo, hi = call(*xs, *mont_slices)
    if pad:
        lo, hi = lo[:b], hi[:b]
    if f > 1:
        lo = lo.reshape(b, rows, -1)
        hi = hi.reshape(b, rows, -1)
    return lo, hi


def fwd_passes64(limbs: tuple, *, n: int, p: int):
    tbl = mxu64._tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]
    b = limbs[0].shape[0]
    d = tuple(jnp.asarray(a) for a in tbl["d"])  # 4 × [n2, n1]
    v = tuple(a.reshape(b, n1, n2).transpose(0, 2, 1) for a in limbs)
    y = pass_matmod64(v, n=n, p=p, which="A", mont_slices=d,
                      row_fuse=_fuse_for64(n1))
    y = tuple(a.transpose(0, 2, 1) for a in y)  # [B, n1, n2]
    lo, hi = pass_matmod64(y, n=n, p=p, which="F", row_fuse=_fuse_for64(n2))
    return lo.reshape(b, n), hi.reshape(b, n)


def inv_passes64(limbs: tuple, *, n: int, p: int, scale: int = 1):
    tbl = mxu64._tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]
    b = limbs[0].shape[0]
    e = tuple(jnp.asarray(a) for a in tbl["e"])  # 4 × [n1, n2]
    v = tuple(a.reshape(b, n1, n2) for a in limbs)
    y = pass_matmod64(v, n=n, p=p, which="G", mont_slices=e,
                      row_fuse=_fuse_for64(n2))
    y = tuple(a.transpose(0, 2, 1) for a in y)  # [B, n2, n1]
    lo, hi = pass_matmod64(y, n=n, p=p, which="Ainv", scale=scale,
                           row_fuse=_fuse_for64(n1))
    return (
        lo.transpose(0, 2, 1).reshape(b, n),
        hi.transpose(0, 2, 1).reshape(b, n),
    )


class _PassesEngine64:
    """Engine facade for mid sizes (same fwd/inv surface as this module)."""

    @staticmethod
    def fwd(limbs, *, n, p):
        return fwd_passes64(tuple(limbs), n=n, p=p)

    @staticmethod
    def inv(limbs, *, n, p, scale=1):
        return inv_passes64(tuple(limbs), n=n, p=p, scale=scale % p)


passes_engine64 = _PassesEngine64()


def passes_applicable(n: int) -> bool:
    """Both pass shapes must reach 128 fused lanes with integral fusion."""
    log2n = n.bit_length() - 1
    n1 = 1 << (log2n // 2)
    n2 = n // n1
    for o, rows in ((n1, n2), (n2, n1)):
        f = _fuse_for64(o)
        if o * f < 128 or rows % f:
            return False
    return True


# ---------------------------------------------------------------------------
# Channel-grid kernels: ALL prime64 CRT channels (Plan52 tiers) in ONE
# pallas_call — the 64-bit port of ops/mxu32_pallas.py's multi kernels.
#
# Grid = (batch_tile, channel), channel innermost: the operand block stays
# VMEM-resident across channels while per-channel planes/mont-tables/scalars
# stream in. Per-channel constants are u32 limb-pair scalars read from SMEM;
# the traced-scalar pipeline below mirrors ops/mxu64.py bit-for-bit for the
# p < 2^62 regime (all table Plan52 primes are < 2^50: 8 digit planes,
# Shoup top-limb fold, Barrett canonical epilogue) — asserted by tests.
# ---------------------------------------------------------------------------

from .u32 import (  # noqa: E402  (limb-pair array ops; scalar-free)
    add64,
    add64c,
    geq64,
    mulhi64,
    mullo64,
    mulwide64,
    select64,
    sub64,
)


def _sc_cond_sub64(x, m):
    return select64(geq64(x, m), sub64(x, m), x)


def _sc_shoup_lazy64(z, w, wsh, p):
    q = mulhi64(z, wsh)
    return sub64(mullo64(z, w), mullo64(q, p))


def _sc_mont_mul64(a, b, p, ninv):
    """u32.mont_mul64 with traced limb-pair scalars (p, -p^-1 mod 2^64)."""
    l0, l1, l2, l3 = mulwide64(a, b)
    t_lo, t_hi = (l0, l1), (l2, l3)
    m = mullo64(t_lo, ninv)
    mp_hi = mulhi64(m, p)
    carry = ((l0 != 0) | (l1 != 0)).astype(jnp.uint32)
    s, c1 = add64c(t_hi, mp_hi)
    s2, c2 = add64c(s, (carry, np.uint32(0)))
    over = (c1 | c2).astype(bool)
    neg_p = sub64((np.uint32(0), np.uint32(0)), p)
    return select64(over, add64(s2, neg_p), _sc_cond_sub64(s2, p))


def _sc_fold3to2(v0, v1, v2, sc):
    """3-limb V -> 64-bit representative; p < 2^62 regime (3p < 2^64)."""
    from .u32 import shoup_mul_u32_lazy64

    c64, c64sh, p = sc["c64"], sc["c64_shoup"], sc["p"]
    t = shoup_mul_u32_lazy64(v2, c64, c64sh, p)  # [0, 2p); u32-specialized
    s, carry = add64c((v0, v1), t)
    comp = (carry * c64[0], carry * c64[1])
    return add64(s, comp)  # wrapped s < 2p, + c64 < 3p < 2^64


def _sc_scaled_epilogue(v0, v1, v2, tab, sc):
    """Traced-scalar twin of mxu64._scaled_epilogue ("shoup" mode only —
    multi_applicable restricts the channel-grid kernels to p < 2^62):
    (v0,v1)·W + v2·(2^64·W), two lazy Shoup multiplies (< 4p < 2^64; the
    sign offset is folded into cvec so no correction term exists)."""
    from .u32 import shoup_mul_u32_lazy64

    p = sc["p"]
    t1 = _sc_shoup_lazy64((v0, v1), (tab[0], tab[1]), (tab[2], tab[3]), p)
    t2 = shoup_mul_u32_lazy64(v2, (tab[4], tab[5]), (tab[6], tab[7]), p)
    return add64(t1, t2)


def _sc_canonical(v0, v1, v2, sc):
    """3-limb V (≡ true mod p; offset folded into cvec) -> canonical limb
    pair; p < 2^62 (Barrett)."""
    p = sc["p"]
    rep = _sc_fold3to2(v0, v1, v2, sc)
    q = mulhi64(rep, sc["barrett"])
    r = sub64(rep, mullo64(q, p))
    return _sc_cond_sub64(_sc_cond_sub64(r, sc["two_p"]), p)


_SC_FIELDS = ("p", "c64", "c64_shoup", "p_neginv", "barrett", "two_p")


def _scal_vec64(n: int, p: int, tbl: dict | None = None) -> list[int]:
    if tbl is None:
        tbl = mxu64._tables(n, p)
    vals = (p, tbl["c64"], tbl["c64_shoup"], tbl["p_neginv"], tbl["barrett"],
            2 * p)
    out = []
    for v in vals:
        out += [v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF]
    return out


def _read_sc(sc_ref):
    return {
        name: (sc_ref[0, 0, 2 * j], sc_ref[0, 0, 2 * j + 1])
        for j, name in enumerate(_SC_FIELDS)
    }


def multi_applicable(n: int, primes) -> bool:
    return (
        fused_applicable(n)
        and all((1 << 33) < p < (1 << 62) for p in primes)  # "shoup" mode
        # plane diet: table shapes are p-dependent (digit/operand plane
        # counts); the stacked channel grid needs them uniform, or np.stack
        # fails on mixed-magnitude prime sets
        and len(
            {(mxu64._n_dplanes(p), mxu64._n_eplanes_lazy(p)) for p in primes}
        ) == 1
    )


def _multi_tables64(n: int, primes: tuple, scales: tuple,
                    hyb: tuple | None = None):
    n1, n2 = mxu64.four_step_factors(n)
    stk = lambda xs: np.ascontiguousarray(np.stack(xs, axis=0))
    p1f, c1f, p2f, c2f = [], [], [], []
    p1i, c1i, p2i, c2i = [], [], [], []
    dm, em, scal = [], [], []
    for ch, p in enumerate(primes):
        # prime-range requirement only: the whole-transform kernel gate
        # (fused_applicable) is enforced by the callers that build kernels;
        # table stacking also serves parallel/channels.py at smaller n.
        assert (1 << 33) < p < (1 << 62), (
            "channel-grid tables need p in (2^33, 2^62)"
        )
        if hyb is None:
            tbl = mxu64._tables(n, p)
        else:
            # stage-split hybrid block tables (ops/stagesplit.py)
            from . import stagesplit

            tbl = stagesplit._dev64(hyb[0], p, n)["blocks"][hyb[1]]
        p1f.append(tbl["A"][0]); c1f.append(tbl["A"][1])
        p2f.append(tbl["F"][0]); c2f.append(tbl["F"][1])
        p1i.append(tbl["G"][0]); c1i.append(tbl["G"][1])
        if scales[ch] % p == 1:
            m2 = tbl["Ainv"]
        elif hyb is None:
            m2 = mxu64._scaled_ainv_planes(n, p, scales[ch] % p)
        else:
            from . import stagesplit

            m2 = stagesplit._scaled_ainv_blocks64(
                hyb[0], p, n, scales[ch] % p
            )[hyb[1]]
        p2i.append(m2[0]); c2i.append(m2[1])
        dm.append(tbl["d"]); em.append(tbl["e"])
        scal.append(_scal_vec64(n, p, tbl) + [0, 0, 0, 0])  # pad to 16
    n_tab = len(dm[0])  # 10 ("shoup" scale mode — guaranteed by p < 2^62)
    return {
        "n1": n1, "n2": n2,
        "fwd": (stk(p1f), stk(c1f), stk(p2f), stk(c2f),
                tuple(stk([d[j] for d in dm]) for j in range(n_tab))),
        "inv": (stk(p1i), stk(c1i), stk(p2i), stk(c2i),
                tuple(stk([e[j] for e in em]) for j in range(n_tab))),
        "scalars": np.array(scal, dtype=np.uint32),  # [C, 16]
    }


@lru_cache(maxsize=64)
def _build_multi_call64(n: int, primes: tuple, direction: str, scales: tuple,
                        pointwise: bool, interp: bool = False,
                        hyb: tuple | None = None, perch_fwd: bool = False,
                        bt: int = 8, hoist: bool | None = None):
    tabs = _multi_tables64(n, primes, scales, hyb)
    n1, n2 = tabs["n1"], tabs["n2"]
    C = len(primes)
    planes1, cvec1, planes2, cvec2, mont = tabs[direction]
    n_mont = len(mont)
    n_in = (4 if pointwise else 2) if direction == "inv" else 2
    # Shared-operand fwd digit-split hoist (see mxu32_pallas._build_multi_call):
    # measured a WASH here (8.47 vs 8.34 µs/poly best-of-3, within ±3% noise)
    # — only C=3 channels share the split and the 3-limb epilogues dominate —
    # so it stays off by default; the mxu32 grid (C=5, thinner epilogue)
    # keeps it on where it measured ~5% off the fwd kernel.
    hoist_digits = False if hoist is None else hoist
    k1 = planes1.shape[1]

    def kernel(*refs):
        sc_ref = refs[0]
        p1_ref, c1_ref, p2_ref, c2_ref = refs[1:5]
        mont_refs = refs[5 : 5 + n_mont]
        x_refs = refs[5 + n_mont : 5 + n_mont + n_in]
        if hoist_digits:
            out_lo_ref, out_hi_ref, xd_scr = refs[-3], refs[-2], refs[-1]
        else:
            out_lo_ref, out_hi_ref = refs[-2], refs[-1]

        sc = _read_sc(sc_ref)
        m1, cv1 = p1_ref[0], c1_ref[0]
        m2, cv2 = p2_ref[0], c2_ref[0]
        tab = tuple(r[0] for r in mont_refs)

        if direction == "fwd":
            if hoist_digits:
                @pl.when(pl.program_id(1) == 0)
                def _split_once():
                    v = tuple(
                        jnp.swapaxes(r[:].reshape(bt, n1, n2), 1, 2)
                        for r in x_refs
                    )
                    xd_scr[...] = mxu64._digit_cat(v, m1.shape[0] // n1)

                xd = xd_scr[...]
            else:
                v = tuple(
                    jnp.swapaxes(
                        (r[0] if perch_fwd else r[:]).reshape(bt, n1, n2), 1, 2
                    )
                    for r in x_refs
                )
                xd = mxu64._digit_cat(v, m1.shape[0] // n1)
            big = mxu64._dot(xd, m1)
            y = _sc_scaled_epilogue(
                *mxu64._combine8(big, cv1, n1, cv1.shape[0]), tab, sc
            )
            y = tuple(jnp.swapaxes(a, 1, 2) for a in y)  # [Bt, n1, n2]
            big = mxu64._dot(mxu64._digit_cat(y, m2.shape[0] // n2), m2)
            lo, hi = _sc_canonical(*mxu64._combine8(big, cv2, n2, cv2.shape[0]), sc)
            out_lo_ref[0] = lo.reshape(bt, n)
            out_hi_ref[0] = hi.reshape(bt, n)
        else:
            if pointwise:
                a = tuple(r[0].reshape(bt, n1, n2) for r in x_refs[0:2])
                b = tuple(r[0].reshape(bt, n1, n2) for r in x_refs[2:4])
                v = _sc_mont_mul64(a, b, sc["p"], sc["p_neginv"])
            else:
                v = tuple(r[0].reshape(bt, n1, n2) for r in x_refs)
            big = mxu64._dot(mxu64._digit_cat(v, m1.shape[0] // n2), m1)
            y = _sc_scaled_epilogue(
                *mxu64._combine8(big, cv1, n2, cv1.shape[0]), tab, sc
            )
            y = tuple(jnp.swapaxes(a, 1, 2) for a in y)  # [Bt, n2, n1]
            big = mxu64._dot(mxu64._digit_cat(y, m2.shape[0] // n1), m2)
            lo, hi = _sc_canonical(*mxu64._combine8(big, cv2, n1, cv2.shape[0]), sc)
            out_lo_ref[0] = jnp.swapaxes(lo, 1, 2).reshape(bt, n)
            out_hi_ref[0] = jnp.swapaxes(hi, 1, 2).reshape(bt, n)

    m_shape = mont[0].shape[1:]

    def call(*xs):
        bsz = xs[0].shape[-2]
        grid = (bsz // bt, C)
        const_specs = [
            pl.BlockSpec((1, 1, 16), lambda i, c: (c, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,) + planes1.shape[1:], lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + cvec1.shape[1:], lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + planes2.shape[1:], lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + cvec2.shape[1:], lambda i, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec((1,) + m_shape, lambda i, c: (c, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_mont)
            ],
        ]
        if direction == "fwd" and perch_fwd:
            in_specs = [
                pl.BlockSpec((1, bt, n), lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        elif direction == "fwd":
            in_specs = [
                pl.BlockSpec((bt, n), lambda i, c: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        else:
            in_specs = [
                pl.BlockSpec((1, bt, n), lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_in)
            ]
        scal16 = tabs["scalars"].reshape(C, 1, 16)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[*const_specs, *in_specs],
            out_specs=[
                pl.BlockSpec((1, bt, n), lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(2)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, bsz, n), jnp.uint32) for _ in range(2)
            ],
            scratch_shapes=(
                [pltpu.VMEM((bt, n2, k1), jnp.int8)] if hoist_digits else []
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=interp,
        )(
            jnp.asarray(scal16),
            jnp.asarray(planes1), jnp.asarray(cvec1),
            jnp.asarray(planes2), jnp.asarray(cvec2),
            *(jnp.asarray(m) for m in mont),
            *xs,
        )

    return call


def _pad_b(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _pad_cb(x, pad):
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x


def fwd_multi(limbs: tuple, primes: tuple):
    """All Plan52 channels' forward NTTs in one kernel: (lo, hi) [B, n]
    limb pair -> (lo, hi) of [C, B, n] canonical NTT-domain residues."""
    n = limbs[0].shape[-1]
    b = limbs[0].shape[0]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    xs = tuple(_pad_b(a, pad) for a in limbs)
    call = _build_multi_call64(
        n, tuple(primes), "fwd", (1,) * len(primes), False, interpret_mode(),
        bt=bt,
    )
    lo, hi = call(*xs)
    return (lo[:, :b], hi[:, :b]) if pad else (lo, hi)


def fwd_multi_perchannel64(x_lo, x_hi, primes: tuple,
                           hyb: tuple | None = None):
    """Per-channel-input channel-grid forward: [C, B, n] limb pairs (any
    u64 representatives, e.g. the stage-split hybrid's per-channel prefix
    outputs) -> (lo, hi) of [C, B, n] canonical NTT-domain residues."""
    n = x_lo.shape[-1]
    b = x_lo.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    call = _build_multi_call64(
        n, tuple(primes), "fwd", (1,) * len(primes), False, interpret_mode(),
        hyb, True, bt,
    )
    lo, hi = call(_pad_cb(x_lo, pad), _pad_cb(x_hi, pad))
    return (lo[:, :b], hi[:, :b]) if pad else (lo, hi)


def inv_multi(x_lo, x_hi, primes: tuple, scales: tuple,
              hyb: tuple | None = None):
    """All channels' scaled inverse NTTs in one kernel: [C, B, n] limb pairs
    (any u64 representatives) -> standard-order canonical pairs."""
    n = x_lo.shape[-1]
    b = x_lo.shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    call = _build_multi_call64(
        n, tuple(primes), "inv", tuple(scales), False, interpret_mode(), hyb,
        bt=bt,
    )
    lo, hi = call(_pad_cb(x_lo, pad), _pad_cb(x_hi, pad))
    return (lo[:, :b], hi[:, :b]) if pad else (lo, hi)


def pointwise_inv_multi(fl, fr, primes: tuple, scales: tuple,
                        hyb: tuple | None = None):
    """All channels' pointwise Montgomery product + scaled inverse in one
    kernel: fl, fr = (lo, hi) pairs of [C, B, n] -> standard-order pairs."""
    n = fl[0].shape[-1]
    b = fl[0].shape[-2]
    bt = batch_tile(b, _B_TILE)
    pad = (-b) % bt
    call = _build_multi_call64(
        n, tuple(primes), "inv", tuple(scales), True, interpret_mode(), hyb,
        bt=bt,
    )
    lo, hi = call(
        _pad_cb(fl[0], pad), _pad_cb(fl[1], pad),
        _pad_cb(fr[0], pad), _pad_cb(fr[1], pad),
    )
    return (lo[:, :b], hi[:, :b]) if pad else (lo, hi)

