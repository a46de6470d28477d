"""Backend dispatch for NTT kernels: fused Pallas on TPU, pure-XLA elsewhere.

The XLA path (ops/engine.py) is the portable, always-correct reference
implementation; the Pallas path (ops/pallas32.py) is the fused VMEM-resident
kernel used on TPU. Both compute bit-identical results — enforced by tests.

Set the environment variable CONCRETE_NTT_TPU_FORCE_XLA=1 to disable the
Pallas path (debugging / A-B benchmarking).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


def _pallas_available() -> bool:
    if os.environ.get("CONCRETE_NTT_TPU_FORCE_XLA"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fwd32(x, tbl, *, p, variant, p_neginv):
    if _pallas_available():
        from . import pallas32

        out = pallas32.try_fwd(x, tbl, p=p, variant=variant, p_neginv=p_neginv)
        if out is not None:
            return out
    from .. import prime32

    if variant == "generic":
        return prime32._fwd_xla(
            x, jnp.asarray(tbl["twid"]), jnp.zeros(0, jnp.uint32),
            p=p, variant=variant, p_neginv=p_neginv,
        )
    return prime32._fwd_xla(
        x, jnp.asarray(tbl["twid"]), jnp.asarray(tbl["twid_shoup"]),
        p=p, variant=variant, p_neginv=p_neginv,
    )


def inv32(x, tbl, *, p, variant, p_neginv):
    if _pallas_available():
        from . import pallas32

        out = pallas32.try_inv(x, tbl, p=p, variant=variant, p_neginv=p_neginv)
        if out is not None:
            return out
    from .. import prime32

    if variant == "generic":
        return prime32._inv_xla(
            x, jnp.asarray(tbl["inv_twid"]), jnp.zeros(0, jnp.uint32),
            p=p, variant=variant, p_neginv=p_neginv,
        )
    return prime32._inv_xla(
        x, jnp.asarray(tbl["inv_twid"]), jnp.asarray(tbl["inv_twid_shoup"]),
        p=p, variant=variant, p_neginv=p_neginv,
    )
