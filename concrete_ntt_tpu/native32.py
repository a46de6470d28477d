"""Native NTT simulating wrapping arithmetic mod 2^32 via CRT.

Capability parity with the reference's src/native32.rs: Plan32 runs 3× 30-bit
prime32 channels (~90 bits of headroom, native32.rs:8-12,338-345); Plan52
runs 2× 50-bit prime64 channels (native32.rs:19,441-445 — IFMA tier in the
reference, u32-limb Shoup tier here).

Exactness contract: negacyclic_polymul equals the schoolbook negacyclic
convolution in wrapping u32 arithmetic whenever the signed result stays
within ±(Π primes)/2 — which holds for all u32 inputs at supported n.
"""

from __future__ import annotations

from dataclasses import dataclass

from ._native_common import NativePlanBase, build_plans32, build_plans52
from .ops import crt as crt_ops
from .tables import NATIVE32_PRIMES, native_channel_primes, PRIMES52


@dataclass(frozen=True)
class Plan32(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan32 | None":
        primes = native_channel_primes(3, n)
        if primes is None:
            return None
        plans = build_plans32(n, primes)
        if not plans:
            return None
        return cls(n=n, width=32, primes=primes, plans=plans, tier="plan32")

    def _reconstruct(self, residues):
        return crt_ops.rec_u32_from3(residues, self.primes)

    # named accessors, parity with native32.rs
    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]

    def ntt_2(self):
        return self.plans[2]


@dataclass(frozen=True)
class Plan52(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan52 | None":
        primes = PRIMES52[:2]
        plans = build_plans52(n, primes)
        if not plans:
            return None
        return cls(n=n, width=32, primes=primes, plans=plans, tier="plan52")

    def _reconstruct(self, residues):
        return crt_ops.rec_from2_p50_u32(residues, self.primes)

    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]
