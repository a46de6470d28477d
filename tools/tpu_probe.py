"""Bounded TPU-reachability probe.

The axon tunnel can go down for hours (CLAUDE.md rule 1b: even
``jax.devices()`` hangs).  This probe runs a tiny jit matmul and must be
invoked under ``timeout`` (the in-process SIGALRM cannot interrupt a futex
wait inside the axon plugin).  Exit 0 = TPU answered; anything else = down.

Usage: ``timeout 95 python tools/tpu_probe.py``
"""

import sys


def main() -> int:
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    if not devs or devs[0].platform == "cpu":
        print(f"PROBE: no accelerator (devices={devs})")
        return 3
    x = jnp.ones((128, 128), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    y.block_until_ready()
    print(f"PROBE OK: {devs[0]} -> {float(y[0, 0])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
