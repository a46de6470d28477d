"""Benchmark harness — headline metric for the driver.

Headline (BASELINE.json): batched N=2^14 native64 negacyclic polynomial
multiplications per second per chip.

Methodology: the axon tunnel's block_until_ready does not synchronize and
host readbacks carry ~28 ms of round-trip latency, so throughput is measured
with on-device `lax.scan` chains of K and 1 steps, each synced by a 4-byte
reduced readback; per-step time = (t_K - t_1)/(K - 1), which cancels the
RTT and dispatch overhead exactly.

Baseline: the reference publishes no absolute numbers and this image has no
Rust toolchain (BASELINE.md), so the per-core AVX512 baseline was MEASURED
with an independent C++ AVX512 implementation of the same algorithm class
(benches/baseline_avx512.cpp, `make baseline`): best 1023 polymul/s on this
host's 2.1 GHz Xeon core, ~1800/s scaled to hpc7a (EPYC 9R14) boost clocks.
The denominator below retains the MORE GENEROUS round-1 op-count estimate
(2900/s) so vs_baseline stays a lower bound on the true advantage even if
the Rust implementation out-runs the measured C++ by up to ~1.6x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# max(measured-scaled 1800/s, op-count estimate 2900/s) — see module docstring
BASELINE_POLYMUL_PER_SEC = 2900.0

N = 1 << 14
BATCH = 8  # one Pallas batch tile per grid step measures best on v5e
K = 256  # >= ~30 ms of on-device work so tunnel RTT jitter (~ms) cancels


def _timed_pairs(f_k, f_1, args, reps=7):
    """Interleaved (t_K, t_1) samples — K-chain and 1-chain alternate so
    slow contention drift on the shared chip hits both sides of each
    difference equally; per-rep estimates give the dispersion."""
    for f in (f_k, f_1):
        _ = np.asarray(f(*args))  # compile + sync
        _ = np.asarray(f(*args))  # chip warm-up (clock spin-up after idle)
    pairs = []
    for _i in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(f_k(*args))
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = np.asarray(f_1(*args))
        pairs.append((tk, time.perf_counter() - t0))
    return pairs


def _probe_device(timeout_s: float = 180.0):
    """Fail fast if the axon tunnel is down instead of hanging forever.

    The remote pool can be unreachable for hours (CLAUDE.md): even
    jax.devices() then blocks with no timeout. Probe with a tiny jit matmul
    on a daemon thread; if it doesn't answer within timeout_s, exit(1) so
    the caller can retry rather than wedge."""
    import sys
    import threading

    ok = threading.Event()

    def probe():
        import jax
        import jax.numpy as jnp

        # array creation INSIDE the jit: eager op streams can wedge the axon
        # session permanently (CLAUDE.md rule 2 — one graph, one round trip)
        @jax.jit
        def f():
            o = jnp.ones((128, 128), jnp.bfloat16)
            return o @ o

        f().block_until_ready()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(
            f"bench.py: device probe got no answer in {timeout_s:.0f}s "
            "(axon tunnel down?) — aborting instead of hanging",
            file=sys.stderr,
        )
        sys.exit(1)


def main():
    import jax

    # persistent compilation cache: repeat driver runs skip the 20-40s compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/concrete_ntt_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _probe_device()
    import jax.numpy as jnp

    from concrete_ntt_tpu import native64
    from concrete_ntt_tpu.ops.u32 import np_u64_to_limbs

    plan = native64.Plan32.try_new(N)
    assert plan is not None

    rng = np.random.default_rng(0)
    # planar (lo, hi) limb tuples: the documented performance format — the
    # interleaved [B, N, 2] array costs ~955 ns/poly in de/re-interleave on
    # TPU (trailing dim 2 maps to 2/128 lanes; measured in tools/ab_marshal.py)
    ll = np_u64_to_limbs(rng.integers(0, 1 << 64, (BATCH, N), dtype=np.uint64))
    rl = np_u64_to_limbs(rng.integers(0, 1 << 64, (BATCH, N), dtype=np.uint64))
    lhs = (jnp.asarray(ll[..., 0]), jnp.asarray(ll[..., 1]))
    rhs = (jnp.asarray(rl[..., 0]), jnp.asarray(rl[..., 1]))

    def chain(k):
        def fn(a, b):
            # two-element carry so BOTH operands are fresh every step — no
            # loop-invariant fwd() for XLA to hoist out of the scan
            def body(carry, _):
                c, d = carry
                return (plan.negacyclic_polymul(c, d), c), None

            (c, _), _ = jax.lax.scan(body, (a, b), None, length=k)
            return sum(jnp.sum(l, dtype=jnp.uint32) for l in c)

        return jax.jit(fn)

    pairs = _timed_pairs(chain(K), chain(1), (lhs, rhs))
    t_k = min(a for a, _ in pairs)
    t_1 = min(b for _, b in pairs)
    per_step = max(t_k - t_1, 1e-9) / (K - 1)
    per_sec = BATCH / per_step
    # dispersion of the per-rep interleaved estimates (round-4 verdict: a
    # point estimate on a ±15%-wobble shared chip can't distinguish a real
    # delta from noise across rounds)
    ests = sorted((a - b) / (K - 1) for a, b in pairs if a > b)
    med = BATCH / ests[len(ests) // 2] if ests else per_sec
    low = BATCH / ests[-1] if ests else per_sec

    print(
        json.dumps(
            {
                "metric": "native64_polymul_n2^14_per_sec_per_chip",
                "value": round(per_sec, 2),
                "unit": "polymul/s",
                "vs_baseline": round(per_sec / BASELINE_POLYMUL_PER_SEC, 3),
                "value_med": round(med, 2),
                "value_min": round(low, 2),
                "reps": len(pairs),
                # planar (lo, hi) input since round 4 — earlier rounds timed
                # the interleaved [B, N, 2] format, which carries ~955
                # ns/poly of marshalling (tools/ab_marshal.py); cross-round
                # deltas must attribute that to the format, not kernels
                "input_format": "planar",
            }
        )
    )


if __name__ == "__main__":
    main()
