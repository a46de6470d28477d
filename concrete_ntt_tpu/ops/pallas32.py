"""Fused Pallas TPU kernels for the prime32 NTT (stub — XLA fallback for now).

Filled in by the perf milestone (SURVEY.md §7 M6): a VMEM-resident kernel
running all butterfly stages per tile, replacing per-stage HBM round trips.
Returning None signals the dispatcher to use the XLA path.
"""

from __future__ import annotations


def try_fwd(x, tbl, *, p, variant, p_neginv):
    return None


def try_inv(x, tbl, *, p, variant, p_neginv):
    return None
