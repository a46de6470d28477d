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


def _engine() -> str:
    """Selected engine: 'auto' (default), 'mxu', 'pallas', or 'xla'."""
    if os.environ.get("CONCRETE_NTT_TPU_FORCE_XLA"):
        return "xla"
    return os.environ.get("CONCRETE_NTT_TPU_ENGINE", "auto").lower()


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pallas_available() -> bool:
    eng = _engine()
    if eng == "pallas":
        return True
    return eng == "auto" and _on_tpu()


def _mxu_wanted(n, p, variant) -> bool:
    from . import mxu32

    if not mxu32.applicable(n, p, variant):
        return False
    eng = _engine()
    if eng == "mxu":
        return True
    return eng == "auto" and _on_tpu()


def try_fwd32_wide_all(parts, plans):
    """Fused residue-split + forward NTT for a CRT plan's prime32 channels.

    `parts` is the little-endian u32 limb tuple of the wide operand. On the
    MXU engine the per-coefficient `% p` residue split (native64.rs:980-993)
    folds into the column matmul as extra digit planes, so the split kernel
    disappears from the pipeline. Returns a list of per-channel NTT-domain
    residues, or None when the MXU path does not apply (caller falls back to
    split + per-channel fwd)."""
    n = parts[0].shape[-1]
    if not all(_mxu_wanted(n, pl.p, pl.variant) for pl in plans):
        return None
    from . import mxu32

    if len(parts) == 1:  # u32 values: any u32 is a valid residue representative
        return [mxu32.fwd(parts[0], n=n, p=pl.p) for pl in plans]
    return [mxu32.fwd_wide(parts, n=n, p=pl.p) for pl in plans]


def fwd32(x, tbl, *, p, variant, p_neginv):
    n = x.shape[-1]
    if _mxu_wanted(n, p, variant):
        from . import mxu32

        return mxu32.fwd(x, n=n, p=p)
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
    n = x.shape[-1]
    if _mxu_wanted(n, p, variant):
        from . import mxu32

        return mxu32.inv(x, n=n, p=p)
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
