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

_B_TILE = 8


@lru_cache(maxsize=256)
def _build_call(n: int, p: int, n_limbs: int, direction: str, scale: int):
    tbl = mxu32._mxu_tables(n, p)
    n1, n2 = tbl["n1"], tbl["n2"]

    if direction == "fwd":
        mat1 = (
            mxu32._wide_col_planes(n, p, n_limbs) if n_limbs > 1 else tbl["A"]
        )
        diag = tbl["d"]  # layout [n2, n1]
        mat2 = tbl["F"]
    else:
        assert n_limbs == 1
        mat1 = tbl["G"]
        diag = tbl["e"]  # layout [n1, n2]
        mat2 = tbl["Ainv"] if scale == 1 else mxu32._scaled_ainv_planes(n, p, scale)

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
                jnp.swapaxes(r[:].reshape(_B_TILE, n1, n2), 1, 2) for r in x_refs
            )
            big = mxu32._dot_planes(v if n_limbs > 1 else v[0], m1)
            lo, hi = mxu32._combine(big, m1)
            y = mxu32._epilogue_scaled_lazy(lo, hi, dg, tbl, p=p)
            y = jnp.swapaxes(y, 1, 2)  # [Bt, n1, n2]
            big = mxu32._dot_planes(y, m2)
            lo, hi = mxu32._combine(big, m2)
            out = mxu32._epilogue_canonical(lo, hi, tbl, p=p)
            out_ref[:] = out.reshape(_B_TILE, n)
        else:
            # [Bt, n1, n2] -> contract n2 -> correct -> transpose ->
            # contract n1 -> transpose back -> flat (standard order)
            v = x_refs[0][:].reshape(_B_TILE, n1, n2)
            big = mxu32._dot_planes(v, m1)
            lo, hi = mxu32._combine(big, m1)
            y = mxu32._epilogue_scaled_lazy(lo, hi, dg, tbl, p=p)
            y = jnp.swapaxes(y, 1, 2)  # [Bt, n2, n1]
            big = mxu32._dot_planes(y, m2)
            lo, hi = mxu32._combine(big, m2)
            out = mxu32._epilogue_canonical(lo, hi, tbl, p=p)
            out_ref[:] = jnp.swapaxes(out, 1, 2).reshape(_B_TILE, n)

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
            grid=(bsz // _B_TILE,),
            in_specs=[
                *const_specs,
                *[
                    pl.BlockSpec((_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
                    for _ in range(n_limbs)
                ],
            ],
            out_specs=pl.BlockSpec(
                (_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(*(jnp.asarray(c) for c in consts), *x_limbs)

    return call


def _run(x_limbs: tuple, *, n: int, p: int, direction: str, scale: int):
    b = x_limbs[0].shape[0]
    pad = (-b) % _B_TILE
    if pad:
        x_limbs = tuple(jnp.pad(a, ((0, pad), (0, 0))) for a in x_limbs)
    call = _build_call(n, p, len(x_limbs), direction, scale)
    out = call(*x_limbs)
    return out[:b] if pad else out


def fwd(x, *, n: int, p: int):
    return _run((x,), n=n, p=p, direction="fwd", scale=1)


def fwd_wide(limbs: tuple, *, n: int, p: int):
    return _run(tuple(limbs), n=n, p=p, direction="fwd", scale=1)


def inv(x, *, n: int, p: int, scale: int = 1):
    return _run((x,), n=n, p=p, direction="inv", scale=scale % p)


def fused_applicable(n: int) -> bool:
    """Mosaic reshapes/transposes need both four-step factors >= 128 lanes."""
    log2n = n.bit_length() - 1
    n1 = 1 << (log2n // 2)
    return n1 >= 128 and (n // n1) >= 128
