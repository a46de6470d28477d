"""Interpret-mode switch for the Pallas production kernels.

Setting CONCRETE_NTT_TPU_PALLAS_INTERPRET=1 makes every pallas_call in this
package run in Pallas interpreter mode, which executes on any backend (CPU
included). This exists so the committed test suite can execute the exact
production kernel code paths — the same kernel functions, block specs, grid
layouts, and traced-scalar epilogues that run on TPU — and assert them
bit-exact against the golden model without TPU hardware (the TPU-build
answer to the reference's SIMD-vs-scalar lane-exact tests,
/root/reference/src/lib.rs:794-908, prime32.rs:1261-1434).

The flag is read at kernel-build time and is part of every build cache key,
so toggling it mid-process (pytest monkeypatch) cannot serve stale kernels.
"""

from __future__ import annotations

import os


def interpret_mode() -> bool:
    return bool(os.environ.get("CONCRETE_NTT_TPU_PALLAS_INTERPRET"))


def kernel_tree_hash() -> str:
    """sha256 over every source file in ops/ — the modules that define the
    on-device kernels (and their dispatch gates) a hardware parity run
    certifies. Markers record this hash; a marker whose hash differs from
    the current tree was written for DIFFERENT kernel code and no longer
    certifies anything (round-4 advisor finding: markers restored for one
    commit stayed valid after later kernel edits). Hashing the whole ops/
    directory over-invalidates on comment-only edits, which is the safe
    direction — a stale-looking marker only costs a parity re-run."""
    import hashlib

    h = hashlib.sha256()
    d = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(os.listdir(d)):
        if name.endswith(".py"):
            h.update(name.encode())
            with open(os.path.join(d, name), "rb") as f:
                h.update(f.read())
    return h.hexdigest()


def marker_valid(path: str) -> bool:
    """True iff the hardware-verification marker at `path` exists AND was
    written against the current kernel tree (records the current
    kernel_tree_hash()). Old-format markers without a hash line are treated
    as stale: the hardware run they attest to cannot be tied to this code."""
    try:
        with open(path) as f:
            text = f.read()
    except OSError:
        return False
    return f"kernels {kernel_tree_hash()}" in text


def smallb_hw_verified_marker() -> str:
    """Marker dropped by an all-PASS tools/tpu_parity.py run (which includes
    the sub-8 batch-tile kernel shapes): until it exists, real-TPU kernels
    keep the proven bt=8 tile and pad (Mosaic miscompiles are real —
    CLAUDE.md; every new kernel shape needs hardware parity first)."""
    from .table_cache import _cache_dir

    d = _cache_dir() or "/tmp"
    return os.path.join(d, "smallb_hw_verified_v1")


def presplit_hw_verified_marker() -> str:
    """Marker dropped by an all-PASS tools/tpu_parity.py run (which includes
    the presplit inverse kernel shapes at n = 2^14..2^16 and b = 1): until
    it exists, real-TPU 'auto' keeps the in-kernel-split inv_multi."""
    from .table_cache import _cache_dir

    d = _cache_dir() or "/tmp"
    return os.path.join(d, "presplit_hw_verified_v1")


def small_batch_tiles() -> bool:
    """Whether sub-8 batch tiles (bt in {1, 2, 4}) may serve B < 8 calls —
    the single-polynomial latency mitigation (round-3 verdict item 5: the
    bt=8 tile pads B=1 to 8, an 8x compute floor). CONCRETE_NTT_TPU_SMALLB
    =1 forces on (parity/measurement runs), =0 off; default auto = on under
    interpret/CPU (no Mosaic in the loop), on real TPU only once the
    hardware parity marker exists."""
    env = os.environ.get("CONCRETE_NTT_TPU_SMALLB", "auto")
    if env == "1":
        return True
    if env == "0":
        return False
    if interpret_mode():
        return True
    try:
        import jax

        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return True
    return marker_valid(smallb_hw_verified_marker())


def batch_tile(b: int, bt_max: int = 8) -> int:
    """Batch-tile extent for a B=b call: the proven bt_max tile for b >=
    bt_max, else the smallest power of two >= b when small tiles are
    allowed (kernel rows stay >= n2 >= 128, so the MXU contraction remains
    full-width at every bt)."""
    if b >= bt_max or not small_batch_tiles():
        return bt_max
    return 1 << max(0, (b - 1).bit_length())
