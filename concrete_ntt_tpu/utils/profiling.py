"""Profiling and roofline helpers (aux subsystem; SURVEY.md §5).

The reference has no in-library tracing (criterion benches only); the TPU
build's equivalents are jax.profiler traces plus roofline accounting for the
transform kernels.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import numpy as np

# TPU v5e single-chip peaks (public spec): used for utilization estimates.
V5E_INT8_TOPS = 394e12
V5E_HBM_GBS = 819e9


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard / xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chain_time(step, args, *, length: int = 128, reps: int = 5):
    """Per-step latency of `step` via on-device lax.scan chains.

    Times a chain of `length` dependent applications minus a chain of one,
    so dispatch and host-transfer round trips cancel (the tunnel to a
    remote TPU adds ~tens of ms that would otherwise dominate).
    `step` maps a pytree carry to a pytree carry.
    """
    import jax
    import jax.numpy as jnp

    args = jax.tree_util.tree_map(jnp.asarray, args)

    def make(k):
        @jax.jit
        def f(ops):
            def body(carry, _):
                return step(carry), None

            out, _ = jax.lax.scan(body, ops, None, length=k)
            # Reduce EVERY element of EVERY carry leaf: a [:1] slice-touch is
            # not DCE-proof for ELEMENTWISE stages — XLA slices the whole
            # dependency chain down to element [0] and times nothing (the
            # transform stages were immune only because each output element
            # depends on all inputs). The full reduction runs once, outside
            # the scan, so it cancels in the (t_K - t_1)/(K - 1) difference.
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out)
            )

        return f

    f_k, f_1 = make(length), make(1)
    _ = np.asarray(f_k(args))
    _ = np.asarray(f_1(args))
    best_k = best_1 = float("inf")
    for _i in range(reps):
        t0 = time.perf_counter()
        np.asarray(f_k(args))
        best_k = min(best_k, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(f_1(args))
        best_1 = min(best_1, time.perf_counter() - t0)
    return max(best_k - best_1, 1e-9) / (length - 1)


@dataclass
class Roofline:
    seconds: float
    hbm_bytes: int
    mxu_macs: int

    @property
    def hbm_gbs(self) -> float:
        return self.hbm_bytes / self.seconds / 1e9

    @property
    def mxu_tops(self) -> float:
        return 2 * self.mxu_macs / self.seconds / 1e12

    @property
    def hbm_util(self) -> float:
        return self.hbm_bytes / self.seconds / V5E_HBM_GBS

    @property
    def mxu_util(self) -> float:
        return 2 * self.mxu_macs / self.seconds / V5E_INT8_TOPS


def mxu_transform_roofline(n: int, batch: int, seconds: float,
                           n_eplanes: int = 4, n_dplanes: int = 4) -> Roofline:
    """Roofline for one MXU four-step transform of [batch, n] u32 data.

    hbm_bytes counts the ideal fused traffic (operand in + result out);
    mxu_macs counts both digit-plane matmuls."""
    log2n = n.bit_length() - 1
    n1 = 1 << (log2n // 2)
    n2 = n // n1
    # col pass: contraction E*n1, output D*n1 int32; row: 4*n2 planes
    macs = batch * n2 * (n_eplanes * n1) * (n_dplanes * n1)
    macs += batch * n1 * (4 * n2) * (n_dplanes * n2)
    data = batch * n * 4 * (n_eplanes // 4 + 1)
    return Roofline(seconds=seconds, hbm_bytes=data, mxu_macs=macs)
