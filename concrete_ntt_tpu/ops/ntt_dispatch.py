"""Backend dispatch for NTT kernels: fused Pallas on TPU, pure-XLA elsewhere.

The XLA path (ops/engine.py) is the portable, always-correct reference
implementation; the Pallas path (ops/pallas32.py) is the fused VMEM-resident
kernel used on TPU. Both compute bit-identical results — enforced by tests.

Set the environment variable CONCRETE_NTT_TPU_FORCE_XLA=1 to disable the
Pallas path (debugging / A-B benchmarking).
"""

from __future__ import annotations

import os

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


def _pallas_impls_runnable() -> bool:
    """Pallas kernels execute natively on TPU, or anywhere in interpret mode
    (CONCRETE_NTT_TPU_PALLAS_INTERPRET=1 — used by the test suite to drive
    the production kernel paths through this dispatch layer on CPU)."""
    from .pallas_env import interpret_mode

    return _on_tpu() or interpret_mode()


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


def _mxu_impl(n):
    """Fused-Pallas MXU engine on TPU, pure-XLA MXU engine elsewhere
    (bit-identical; the Pallas kernel keeps the whole transform in VMEM).
    Mosaic lane-splitting reshapes need both four-step factors >= 128 lanes,
    so the fused kernel only serves n >= 2^14."""
    if _pallas_impls_runnable():
        from . import mxu32_pallas

        if mxu32_pallas.fused_applicable(n):
            return mxu32_pallas
        if n >= 2048:  # mid sizes: two fused pass kernels + XLA transpose.
            # n=2048's n1=32 pass uses row_fuse=4 (kron(I_4, M)) to keep the
            # output at 128 lanes — the bare 32-lane shape miscompiles in
            # Mosaic (wrong u32 carry-add chains).
            return mxu32_pallas.passes_engine
    from . import mxu32

    return mxu32



def _presplit_wanted() -> bool:
    """Round 5: the stacked polymul's inverse consumes int8 digit planes
    emitted by the XLA Montgomery pointwise stage instead of u32 residues
    (mxu32_pallas.digit_planes32 / inv_multi_presplit). Moves the in-kernel
    VPU digit split (~0.33 µs/poly at n=2^14, serialized against the MXU)
    into the HBM-bound pointwise chain at equal HBM bytes.

    MEASURED AMBIGUOUS → OFF in 'auto' (round 5). Three interleaved
    same-process A/Bs on hardware disagreed: +2.8% (min-of-reps, the first
    clean post-parity process — matching the 0.33 µs VPU-split model),
    then −18% and −8% (median) in two later processes that also produced
    physically impossible readings (3.5 µs full polymuls), i.e. evening
    tunnel congestion. With no robust win, 'auto' keeps the widely-measured
    in-kernel-split composition; CONCRETE_NTT_TPU_PRESPLIT=1 forces the
    presplit tier on (parity-covered, bit-identical), =0 forces off.
    Logs: benches/logs_r05/ab_headline_presplit.log, ab_presplit_tiebreak.log;
    docs/MXU_ENGINE.md §5d."""
    env = os.environ.get("CONCRETE_NTT_TPU_PRESPLIT", "auto")
    if env == "1":
        return True
    return False


def _hybrid32_multi_wanted(n, plans) -> bool:
    """Channel-grid stage-split hybrid for native-plan prime32 channels —
    OFF in 'auto' since round 5: the 32-bit hybrid measured slower than the
    direct fused kernels at every size on hardware (single-prime A/B,
    benches/logs_r05/ab_tiers32_*.log: inv −15% at 2^15, fwd −38% at 2^16,
    −2.5x at 2^17; grid regressions native64-32-32768 / product-2xu32-32768
    0.85x). The 32-bit fused kernel's tables stay small (4-5 digit planes),
    so the 2^15 cliff the hybrid flattens for 64-bit channels never
    materializes here. CONCRETE_NTT_TPU_HYBRID=1 still forces the tier on
    for research; the kernels remain parity-covered."""
    if os.environ.get("CONCRETE_NTT_TPU_HYBRID", "auto") != "1":
        return False
    if not _pallas_impls_runnable():
        return False
    from . import stagesplit

    return stagesplit.multi_hybrid_applicable32(
        n, tuple(pl.p for pl in plans)
    ) and all(stagesplit.applicable32(n, pl.p, pl.variant) for pl in plans)


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
    if len(parts) <= 2 and _hybrid32_multi_wanted(n, plans):
        from . import stagesplit

        stacked = stagesplit.fwd_wide_multi_hybrid32(
            tuple(parts), tuple(pl.p for pl in plans), n=n
        )
        return [stacked[i] for i in range(len(plans))]
    eng = _mxu_impl(n)
    if hasattr(eng, "fwd_wide_multi") and all(
        (1 << 29) < pl.p < (1 << 30) for pl in plans
    ):
        stacked = eng.fwd_wide_multi(tuple(parts), tuple(pl.p for pl in plans))
        return [stacked[i] for i in range(len(plans))]

    if len(parts) == 1:  # u32 values: any u32 is a valid residue representative
        return [eng.fwd(parts[0], n=n, p=pl.p) for pl in plans]
    return [eng.fwd_wide(parts, n=n, p=pl.p) for pl in plans]


def try_fwd32_perchannel_all(stacked, plans):
    """Forward NTTs for all prime32 channels with per-channel residue
    arrays ([k, B, n], any u32 representatives) in one channel-grid kernel.
    Serves the Bounded product fwd (centered residues differ per channel).
    Returns a list of NTT-domain residues, or None when inapplicable."""
    n = stacked.shape[-1]
    if not all(_mxu_wanted(n, pl.p, pl.variant) for pl in plans):
        return None
    if _hybrid32_multi_wanted(n, plans):
        from . import stagesplit

        out = stagesplit.fwd_perchannel_multi_hybrid32(
            stacked, tuple(pl.p for pl in plans), n=n
        )
        return [out[i] for i in range(len(plans))]
    eng = _mxu_impl(n)
    if hasattr(eng, "fwd_multi_perchannel") and all(
        (1 << 29) < pl.p < (1 << 30) for pl in plans
    ):
        out = eng.fwd_multi_perchannel(stacked, tuple(pl.p for pl in plans))
        return [out[i] for i in range(len(plans))]
    return [eng.fwd(stacked[i], n=n, p=pl.p) for i, pl in enumerate(plans)]


def try_pointwise_inv32_all(fl, fr, plans):
    """Fused pointwise-multiply + normalize + inverse NTT for a CRT plan's
    prime32 channels on the MXU engine.

    The pointwise product is a bare Montgomery multiply (a*b*2^-32); the
    2^32 compensation and the n^-1 normalization fold into the inverse
    column matrix — the matmul analogue of the reference's fused
    mul_assign_normalize + inv pipeline (native64.rs:1062-1069). Returns a
    list of standard-order per-channel residues, or None if inapplicable."""
    n = fl.shape[-1]
    if not all(_mxu_wanted(n, pl.p, pl.variant) for pl in plans):
        return None
    eng = _mxu_impl(n)
    scales = tuple(
        pow(n, pl.p - 2, pl.p) * pow(2, 32, pl.p) % pl.p for pl in plans
    )
    if _hybrid32_multi_wanted(n, plans):
        from . import stagesplit

        out = stagesplit.pointwise_inv_multi_hybrid32(
            fl, fr, tuple(pl.p for pl in plans), scales, n=n
        )
        return [out[i] for i in range(len(plans))]
    if hasattr(eng, "pointwise_inv_multi") and all(
        (1 << 29) < pl.p < (1 << 30) for pl in plans
    ):
        out = eng.pointwise_inv_multi(
            fl, fr, tuple(pl.p for pl in plans), scales
        )
        return [out[i] for i in range(len(plans))]
    from .u32 import mont_mul

    outs = []
    for i, pl in enumerate(plans):
        prod = mont_mul(fl[i], fr[i], pl.p, pl.p_neginv)
        outs.append(eng.inv(prod, n=n, p=pl.p, scale=scales[i]))
    return outs


def try_inv32_all(stacked, plans, scales=None):
    """Plain (unnormalized unless scaled) inverse NTTs for all prime32
    channels of a CRT plan in one channel-grid kernel. stacked: [k, B, n]
    any-u32 representatives -> list of standard-order canonical residues.
    Returns None when the MXU channel-grid path does not apply."""
    n = stacked.shape[-1]
    if not all(_mxu_wanted(n, pl.p, pl.variant) for pl in plans):
        return None
    eng = _mxu_impl(n)
    if scales is None:
        scales = (1,) * len(plans)
    if _hybrid32_multi_wanted(n, plans):
        from . import stagesplit

        out = stagesplit.inv_multi_hybrid32(
            stacked, tuple(pl.p for pl in plans), tuple(scales), n=n
        )
        return [out[i] for i in range(len(plans))]
    if hasattr(eng, "inv_multi") and all(
        (1 << 29) < pl.p < (1 << 30) for pl in plans
    ):
        out = eng.inv_multi(stacked, tuple(pl.p for pl in plans), tuple(scales))
        return [out[i] for i in range(len(plans))]
    return [
        eng.inv(stacked[i], n=n, p=pl.p, scale=scales[i])
        for i, pl in enumerate(plans)
    ]


def try_polymul32_stacked(parts_l, parts_r, plans, rhs_binary=False):
    """End-to-end stacked negacyclic polymul fast path for plan32 CRT plans
    on the fused-Pallas MXU engine: fwd both operands (channel-grid kernels),
    pointwise Montgomery product in XLA with per-channel vector constants,
    scaled inverse (n^-1 * 2^32 folded into the inverse column matrix).
    Returns standard-order residues [C, B, n], or None if inapplicable."""
    n = parts_l[0].shape[-1]
    if not all(_mxu_wanted(n, pl.p, pl.variant) for pl in plans):
        return None
    if not all((1 << 29) < pl.p < (1 << 30) for pl in plans):
        return None
    eng = _mxu_impl(n)
    if not hasattr(eng, "fwd_wide_multi"):
        return None
    import numpy as np

    from .u32 import mulhi_u32, mulwide_u32

    primes = tuple(pl.p for pl in plans)
    use_hyb = len(parts_l) <= 2 and _hybrid32_multi_wanted(n, plans)
    if use_hyb:
        from . import stagesplit

        fl = stagesplit.fwd_wide_multi_hybrid32(tuple(parts_l), primes, n=n)
        fr = stagesplit.fwd_wide_multi_hybrid32(
            tuple(parts_r[:1]) if rhs_binary else tuple(parts_r), primes, n=n
        )
    else:
        fl = eng.fwd_wide_multi(tuple(parts_l), primes)
        fr = eng.fwd_wide_multi(
            tuple(parts_r[:1]) if rhs_binary else tuple(parts_r), primes
        )
    c = len(primes)
    pv = jnp.asarray(np.array(primes, dtype=np.uint32)).reshape(c, 1, 1)
    nv = jnp.asarray(
        np.array([pl.p_neginv for pl in plans], dtype=np.uint32)
    ).reshape(c, 1, 1)
    # Montgomery product a*b*2^-32 mod p (any-u32 representative out).
    # Measured A/B (round 2): this separate XLA elementwise stage BEATS both
    # the in-kernel pointwise_inv_multi fusion (65.1k vs 61.2k polymuls/s)
    # and operand-stacked single-call forwards (59.8k) — in-kernel VPU work
    # serializes against the MXU (~8% overlap), while a separate fused XLA
    # stage streams at full HBM bandwidth between kernels.
    lo, hi = mulwide_u32(fl, fr)
    m = lo * nv
    # REDC carry: lo(a·b) + lo(m·p) is 0 or exactly 2^32 (m·p ≡ -lo mod 2^32),
    # so the carry is just (lo != 0) — no second mullo+add+compare needed.
    t = hi + mulhi_u32(m, pv) + (lo != 0).astype(jnp.uint32)
    scales = tuple(
        pow(n, pl.p - 2, pl.p) * pow(2, 32, pl.p) % pl.p for pl in plans
    )
    if use_hyb:
        from . import stagesplit

        return stagesplit.inv_multi_hybrid32(t, primes, scales, n=n)
    if _presplit_wanted() and hasattr(eng, "inv_multi_presplit"):
        return eng.inv_multi_presplit(eng.digit_planes32(t), primes, scales)
    return eng.inv_multi(t, primes, scales)


def _mxu64_wanted(n, p) -> bool:
    from . import mxu64

    if not mxu64.applicable(n, p):
        return False
    eng = _engine()
    if eng == "mxu":
        return True
    return eng == "auto" and _on_tpu()


def _fused64_profitable(n: int, p: int) -> bool:
    """Measured A/B (docs/MXU_ENGINE.md §7a): at n = 2^15 the 9-digit-plane
    Goldilocks working set pushes the fused whole-transform kernel past its
    VMEM comfort and the pass-kernel tier beats it by ~10% (7659 vs 8391
    ns/poly); every smaller-plane regime keeps the fused kernel."""
    from . import mxu64

    return not (n >= 32768 and mxu64._n_dplanes(p) >= 9)


def hybrid_hw_verified_marker() -> str:
    from .table_cache import _cache_dir

    d = _cache_dir() or "/tmp"
    return os.path.join(d, "hybrid_hw_verified_v1")


def _hybrid_deployable() -> bool:
    """Mosaic miscompiles are real (CLAUDE.md): the hybrid's kernel table
    configurations must pass tools/tpu_parity.py on REAL hardware before
    the tier serves default traffic there. The parity run drops a marker
    file on an all-PASS run; until then 'auto' keeps the direct tiers on
    real TPU. Interpret/CPU runs have no Mosaic compiler in the loop and
    always qualify; CONCRETE_NTT_TPU_HYBRID=1 forces the tier on (the
    parity/measurement runs themselves)."""
    env = os.environ.get("CONCRETE_NTT_TPU_HYBRID", "auto")
    if env == "1":
        return True
    from .pallas_env import interpret_mode

    if interpret_mode() or not _on_tpu():
        return True
    from .pallas_env import marker_valid

    return marker_valid(hybrid_hw_verified_marker())


def _hybrid64_wanted(n: int, p: int) -> bool:
    """Stage-split hybrid above the 2^14 MXU sweet spot: ℓ butterfly
    prefix stages + 2^ℓ blockwise 2^14 four-steps cut the matmul MACs from
    n·(n1+n2) to n·256 (ops/stagesplit.py; MXU_ENGINE.md §7b).
    CONCRETE_NTT_TPU_HYBRID=0 disables, =1 forces; default auto (gated on
    the hardware parity marker — see _hybrid_deployable)."""
    env = os.environ.get("CONCRETE_NTT_TPU_HYBRID", "auto")
    if env == "0":
        return False
    if not _hybrid_deployable():
        return False
    from . import stagesplit

    return stagesplit.applicable64(n, p)


def _mxu64_impl(n, p, pair: bool = True):
    """Stage-split hybrid above 2^14 (u64 pairs); fused-Pallas mxu64 on TPU
    (n with both four-step factors >= 128); pure-XLA mxu64 elsewhere. All
    bit-identical."""
    if pair and _hybrid64_wanted(n, p):
        from . import stagesplit

        if _pallas_impls_runnable():
            return stagesplit.engine64_fused
        return stagesplit.engine64_xla
    if _pallas_impls_runnable():
        from . import mxu64_pallas

        if mxu64_pallas.fused_applicable(n) and _fused64_profitable(n, p):
            return mxu64_pallas
        if n >= 2048 and mxu64_pallas.passes_applicable(n):
            # mid sizes: two fused pass kernels + XLA transpose, with small
            # factors row-fused to 128 output lanes (the bare 64-lane 3-limb
            # combine miscompiles in Mosaic — CLAUDE.md)
            return mxu64_pallas.passes_engine64
    from . import mxu64

    return mxu64


def try_fwd64(limbs, n, p):
    """MXU four-step forward for prime64 (u64 limb pairs); None if N/A."""
    if not _mxu64_wanted(n, p):
        return None
    return _mxu64_impl(n, p, pair=len(limbs) == 2).fwd(limbs, n=n, p=p)


def try_inv64(limbs, n, p, scale: int = 1):
    if not _mxu64_wanted(n, p):
        return None
    return _mxu64_impl(n, p, pair=len(limbs) == 2).inv(
        limbs, n=n, p=p, scale=scale
    )


def try_fwd64_wide_all(parts, plans):
    """Fused residue-split + forward NTT for a CRT plan's prime64 (Plan52)
    channels: mxu64 accepts ANY u64 representative, so the per-coefficient
    `mod p` split (split_u64_to_p50) disappears. Returns a list of
    per-channel (lo, hi) NTT-domain residues, or None."""
    n = parts[0].shape[-1]
    if not all(_mxu64_wanted(n, pl.p) for pl in plans):
        return None
    if len(parts) > 2:
        return None  # u128 inputs keep the explicit split path
    eng = _mxu64_impl(n, plans[0].p, pair=False)

    limbs = tuple(parts) if len(parts) == 2 else (parts[0], jnp.zeros_like(parts[0]))
    primes = tuple(pl.p for pl in plans)
    if _pallas_impls_runnable() and all(
        _hybrid64_wanted(n, pl.p) for pl in plans
    ):
        from . import stagesplit

        if stagesplit.multi_hybrid_applicable64(n, primes):
            lo, hi = stagesplit.fwd_multi_hybrid64(limbs, primes, n=n)
            return [(lo[i], hi[i]) for i in range(len(plans))]
    if hasattr(eng, "fwd_multi") and eng.multi_applicable(n, primes):
        lo, hi = eng.fwd_multi(limbs, primes)
        return [(lo[i], hi[i]) for i in range(len(plans))]
    return [eng.fwd(limbs, n=n, p=pl.p) for pl in plans]


def try_pointwise_inv64_all(fl, fr, plans):
    """Fused Montgomery pointwise + scaled inverse for Plan52 channels.
    fl, fr: [k, B, n, 2] stacked limb arrays. Returns per-channel (lo, hi)
    standard-order residues, or None."""
    n = fl.shape[-2]
    if not all(_mxu64_wanted(n, pl.p) for pl in plans):
        return None
    eng = _mxu64_impl(n, plans[0].p, pair=False)
    primes = tuple(pl.p for pl in plans)
    scales = tuple(
        pow(n, pl.p - 2, pl.p) * pow(2, 64, pl.p) % pl.p for pl in plans
    )
    if _pallas_impls_runnable() and all(
        _hybrid64_wanted(n, pl.p) for pl in plans
    ):
        from . import stagesplit

        if stagesplit.multi_hybrid_applicable64(n, primes):
            lo, hi = stagesplit.pointwise_inv_multi_hybrid64(
                (fl[..., 0], fl[..., 1]), (fr[..., 0], fr[..., 1]),
                primes, scales, n=n,
            )
            return [(lo[i], hi[i]) for i in range(len(plans))]
    if hasattr(eng, "pointwise_inv_multi") and eng.multi_applicable(n, primes):
        lo, hi = eng.pointwise_inv_multi(
            (fl[..., 0], fl[..., 1]), (fr[..., 0], fr[..., 1]), primes, scales
        )
        return [(lo[i], hi[i]) for i in range(len(plans))]
    from .u32 import mont_mul64, mont_neginv64

    outs = []
    for i, pl in enumerate(plans):
        prod = mont_mul64(
            (fl[i, ..., 0], fl[i, ..., 1]),
            (fr[i, ..., 0], fr[i, ..., 1]),
            pl.p,
            mont_neginv64(pl.p),
        )
        outs.append(eng.inv(prod, n=n, p=pl.p, scale=scales[i]))
    return outs


def _hybrid32_wanted(n: int, p: int, variant: str) -> bool:
    """32-bit stage-split hybrid — OFF in 'auto' since round 5 (see
    _hybrid32_multi_wanted: measured slower than the direct fused kernel at
    2^15/2^16/2^17 in every regime). =1 forces it on for research."""
    env = os.environ.get("CONCRETE_NTT_TPU_HYBRID", "auto")
    if env != "1":
        return False
    from . import stagesplit

    return stagesplit.applicable32(n, p, variant)


def _hybrid32_impl():
    from . import stagesplit

    if _pallas_impls_runnable():
        return stagesplit.engine32_fused
    return stagesplit.engine32_xla


def fwd32(x, tbl, *, p, variant, p_neginv):
    n = x.shape[-1]
    if _mxu_wanted(n, p, variant):
        if _hybrid32_wanted(n, p, variant):
            return _hybrid32_impl().fwd(x, n=n, p=p)
        return _mxu_impl(n).fwd(x, n=n, p=p)
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
        if _hybrid32_wanted(n, p, variant):
            return _hybrid32_impl().inv(x, n=n, p=p)
        return _mxu_impl(n).inv(x, n=n, p=p)
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
