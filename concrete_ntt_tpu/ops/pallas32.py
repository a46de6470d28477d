"""Fused Pallas TPU kernels for the prime32 NTT.

The XLA path materializes the [B, n] array in HBM after every butterfly
stage (log2(n) round trips). This kernel keeps a [8, n] block resident in
VMEM and runs ALL stages per grid step — the TPU analogue of the reference's
depth-first cache blocking + in-register tail stages (RECURSION_THRESHOLD,
prime32.rs:12; interleave networks, prime32/shoup.rs:87-160).

Butterfly data movement: Mosaic does not support reshapes that split the
lane dimension, so stages are expressed as **lane rotations + masked
selects** instead of strided views: partner lanes are brought into position
with pltpu.roll(±t) and each lane computes its butterfly output role chosen
by a parity mask of its block index. Twiddles are pre-expanded per stage to
full-width [log2(n), n] vectors on the host (w for lane j at stage with m
blocks of width 2t = twid[m + j//(2t)]), so the kernel reads them with no
gathers — preserving the reference's never-materialize-bit-reversal property
(twiddle storage order does the permuting, prime32.rs:223-246).

Same butterfly algebra as ops/butterflies32.py (shared code) → results are
bit-identical to the XLA path and the golden model.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import butterflies32 as bf32
from .pallas_env import interpret_mode

_MAX_N = 1 << 15  # expanded twiddles live in VMEM: 2·log2(n)·n·4 bytes
_B_TILE = 8  # sublane granularity for u32


@lru_cache(maxsize=128)
def _expanded_twiddles(n: int, p: int, direction: str):
    """[log2(n), n] stage-expanded twiddle (+ Shoup companion) tables."""
    from ..golden.ntt import negacyclic_twiddles

    twid, inv_twid = negacyclic_twiddles(p, n)
    base = twid if direction == "fwd" else inv_twid
    log2n = n.bit_length() - 1
    exp = np.zeros((log2n, n), dtype=np.uint32)
    for s in range(log2n):
        m = 1 << s
        two_t = n >> s
        for j in range(n):
            exp[s, j] = base[m + j // two_t]
    if p < 1 << 31:
        exp_shoup = ((exp.astype(np.uint64) << np.uint64(32)) // np.uint64(p)).astype(
            np.uint32
        )
        return exp, exp_shoup
    # generic regime: Montgomery form
    expm = ((exp.astype(object) * (1 << 32)) % p).astype(np.uint64).astype(np.uint32)
    return (expm,)


def _butterflies(p, variant, p_neginv, direction):
    if direction == "fwd":
        if variant == "lt30":
            return bf32.make_fwd_lt30(p)
        if variant == "lt31":
            return bf32.make_fwd_lt31(p)
        return bf32.make_fwd_generic32(p, p_neginv)
    if variant == "lt30":
        return bf32.make_inv_lt30(p)
    if variant == "lt31":
        return bf32.make_inv_lt31(p)
    return bf32.make_inv_generic32(p, p_neginv)


def _make_kernel(n, p, variant, p_neginv, direction, has_shoup):
    bf, lbf = _butterflies(p, variant, p_neginv, direction)
    log2n = n.bit_length() - 1
    stage_order = range(log2n) if direction == "fwd" else range(log2n - 1, -1, -1)

    def body(buf, tw_ref, tws_ref):
        lane = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
        for s in stage_order:
            t = n >> (s + 1)
            # lane j is the z0 slot of its butterfly iff bit log2(t) of j is 0
            m0 = (lane & np.uint32(t)) == 0
            x_p = pltpu.roll(buf, n - t, axis=1)  # buf[j+t] at lane j
            x_m = pltpu.roll(buf, t, axis=1)  # buf[j-t] at lane j
            z0 = jnp.where(m0, buf, x_m)
            z1 = jnp.where(m0, x_p, buf)
            w = tw_ref[s, :].reshape(1, n)
            wparts = (w, tws_ref[s, :].reshape(1, n)) if tws_ref is not None else (w,)
            is_last = (s == log2n - 1) if direction == "fwd" else (s == 0)
            use = lbf if is_last else bf
            (o0,), (o1,) = use((z0,), (z1,), wparts)
            buf = jnp.where(m0, o0, o1)
        return buf

    if has_shoup:

        def kernel(tw_ref, tws_ref, x_ref, out_ref):
            out_ref[:] = body(x_ref[:], tw_ref, tws_ref)

    else:

        def kernel(tw_ref, x_ref, out_ref):
            out_ref[:] = body(x_ref[:], tw_ref, None)

    return kernel


@lru_cache(maxsize=256)
def _build_call(n, p, variant, p_neginv, direction, has_shoup, interp=False):
    kernel = _make_kernel(n, p, variant, p_neginv, direction, has_shoup)
    log2n = n.bit_length() - 1
    n_tw = 2 if has_shoup else 1

    def call(x, *twids):
        bsz = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(bsz // _B_TILE,),
            in_specs=[
                *[
                    pl.BlockSpec(
                        (log2n, n), lambda i: (0, 0), memory_space=pltpu.VMEM
                    )
                    for _ in range(n_tw)
                ],
                pl.BlockSpec((_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_B_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, n), jnp.uint32),
            interpret=interp,
        )(*twids, x)

    return jax.jit(call)


def _run(x, *, p, variant, p_neginv, direction):
    b, n = x.shape
    if n > _MAX_N or n < 256:
        return None  # tiny transforms: XLA path is fine and avoids lane padding
    pad = (-b) % _B_TILE
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    has_shoup = variant != "generic"
    twids = tuple(
        jnp.asarray(a) for a in _expanded_twiddles(n, p, direction)
    )
    call = _build_call(
        n, p, variant, p_neginv, direction, has_shoup, interpret_mode()
    )
    out = call(x, *twids)
    return out[:b] if pad else out


def try_fwd(x, tbl, *, p, variant, p_neginv):
    del tbl
    return _run(x, p=p, variant=variant, p_neginv=p_neginv, direction="fwd")


def try_inv(x, tbl, *, p, variant, p_neginv):
    del tbl
    return _run(x, p=p, variant=variant, p_neginv=p_neginv, direction="inv")
