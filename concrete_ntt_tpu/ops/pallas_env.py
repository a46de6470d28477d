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
