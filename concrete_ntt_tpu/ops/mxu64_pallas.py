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
from .pallas_env import interpret_mode

_B_TILE = 8


def fused_applicable(n: int) -> bool:
    log2n = n.bit_length() - 1
    n1 = 1 << (log2n // 2)
    return n1 >= 128 and (n // n1) >= 128


@lru_cache(maxsize=128)
def _build_call(n: int, p: int, n_limbs: int, direction: str, scale: int,
                interp: bool = False):
    tbl = mxu64._tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]

    if direction == "fwd":
        mat1 = tbl["A"] if n_limbs == 2 else mxu64._wide_col_planes(n, p, n_limbs)
        diag = tbl["d"]  # 4 arrays [n2, n1]
        mat2 = tbl["F"]
    else:
        assert n_limbs == 2
        mat1 = tbl["G"]
        diag = tbl["e"]  # 4 arrays [n1, n2]
        mat2 = (
            tbl["Ainv"] if scale == 1 else mxu64._scaled_ainv_planes(n, p, scale)
        )

    planes1, cvec1 = mat1
    planes2, cvec2 = mat2

    def kernel(*refs):
        p1_ref, c1_ref, p2_ref, c2_ref = refs[:4]
        diag_refs = refs[4:8]
        x_refs = refs[8 : 8 + n_limbs]
        out_lo_ref, out_hi_ref = refs[-2], refs[-1]

        m1 = (p1_ref[:], c1_ref[:])
        m2 = (p2_ref[:], c2_ref[:])
        dg = tuple(r[:] for r in diag_refs)

        if direction == "fwd":
            v = tuple(
                jnp.swapaxes(r[:].reshape(_B_TILE, n1, n2), 1, 2) for r in x_refs
            )
            y = mxu64._matmod_scaled_lazy(v, m1, dg, tbl)
            y = mxu64._t(y)  # [Bt, n1, n2]
            lo, hi = mxu64._matmod_canonical(y, m2, tbl)
            out_lo_ref[:] = lo.reshape(_B_TILE, n)
            out_hi_ref[:] = hi.reshape(_B_TILE, n)
        else:
            v = tuple(r[:].reshape(_B_TILE, n1, n2) for r in x_refs)
            y = mxu64._matmod_scaled_lazy(v, m1, dg, tbl)
            y = mxu64._t(y)  # [Bt, n2, n1]
            lo, hi = mxu64._matmod_canonical(y, m2, tbl)
            out_lo_ref[:] = lo.transpose(0, 2, 1).reshape(_B_TILE, n)
            out_hi_ref[:] = hi.transpose(0, 2, 1).reshape(_B_TILE, n)

    const_specs = [
        pl.BlockSpec(planes1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(cvec1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(planes2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(cvec2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        *[
            pl.BlockSpec(diag[0].shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    ]
    consts = (planes1, cvec1, planes2, cvec2, *diag)

    def call(*x_limbs):
        bsz = x_limbs[0].shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // _B_TILE,),
            in_specs=[
                *const_specs,
                *[
                    pl.BlockSpec(
                        (_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM
                    )
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=[
                pl.BlockSpec((_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(2)
            ],
            out_shape=[jax.ShapeDtypeStruct((bsz, n), jnp.uint32) for _ in range(2)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interp,
        )(*(jnp.asarray(c) for c in consts), *x_limbs)

    return call


def _run(x_limbs: tuple, *, n: int, p: int, direction: str, scale: int):
    b = x_limbs[0].shape[0]
    pad = (-b) % _B_TILE
    if pad:
        x_limbs = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in x_limbs)
    call = _build_call(n, p, len(x_limbs), direction, scale, interpret_mode())
    lo, hi = call(*x_limbs)
    if pad:
        lo, hi = lo[:b], hi[:b]
    return lo, hi


def fwd(limbs: tuple, *, n: int, p: int):
    return _run(tuple(limbs), n=n, p=p, direction="fwd", scale=1)


def inv(limbs: tuple, *, n: int, p: int, scale: int = 1):
    return _run(tuple(limbs), n=n, p=p, direction="inv", scale=scale % p)

