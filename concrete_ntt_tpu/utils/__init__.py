"""Host-side number theory and constant-generation utilities (L0).

Parity with the reference's const-eval layer: src/prime.rs, src/roots.rs,
src/fastdiv.rs, src/u256_impl.rs. Python bigints replace the reference's
const-fn u256 arithmetic; nothing here runs on the accelerator.
"""

from . import bitrev, fastdiv, prime, roots

__all__ = ["bitrev", "fastdiv", "prime", "roots"]
