"""Native NTT simulating wrapping arithmetic mod 2^64 via CRT.

Capability parity with src/native64.rs: Plan32 = 5× 30-bit prime32 channels
(~150 bits, native64.rs:16-22,933-942); Plan52 = 3× 50-bit prime64 channels
(native64.rs:29-34,1078-1087). Signed-truncation reconstruction follows the
reference's v2 pair-digit structure exactly (native64.rs:91-141).
"""

from __future__ import annotations

from dataclasses import dataclass

from ._native_common import NativePlanBase, build_plans32, build_plans52
from .ops import crt as crt_ops
from .tables import NATIVE64_PRIMES, native_channel_primes, PRIMES52


@dataclass(frozen=True)
class Plan32(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan32 | None":
        primes = native_channel_primes(5, n)
        if primes is None:
            return None
        plans = build_plans32(n, primes)
        if not plans:
            return None
        return cls(n=n, width=64, primes=primes, plans=plans, tier="plan32")

    def _reconstruct(self, residues):
        from . import crt_mxu

        if crt_mxu.mxu_lift_enabled():
            return crt_mxu.rec_u64_from5(residues, self.primes)
        return crt_ops.rec_u64_from5(residues, self.primes)

    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]

    def ntt_2(self):
        return self.plans[2]

    def ntt_3(self):
        return self.plans[3]

    def ntt_4(self):
        return self.plans[4]


@dataclass(frozen=True)
class Plan52(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan52 | None":
        primes = PRIMES52[:3]
        plans = build_plans52(n, primes)
        if not plans:
            return None
        return cls(n=n, width=64, primes=primes, plans=plans, tier="plan52")

    def _reconstruct(self, residues):
        return crt_ops.rec_from3_p50_u64(residues, self.primes)

    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]

    def ntt_2(self):
        return self.plans[2]
