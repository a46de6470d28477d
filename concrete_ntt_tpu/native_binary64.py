"""Native-binary NTT mod 2^64 (src/native_binary64.rs): Plan32 = 3× 30-bit
channels (native_binary64.rs:17-23), Plan52 = 2× 50-bit channels
(native_binary64.rs:25-29). fwd_binary at native_binary64.rs:372-389."""

from __future__ import annotations

from dataclasses import dataclass

from ._native_common import NativePlanBase, build_plans32, build_plans52
from .ops import crt as crt_ops
from .tables import NATIVE_BINARY64_PRIMES, native_channel_primes, PRIMES52


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
        return cls(n=n, width=64, primes=primes, plans=plans, tier="plan32")

    def _reconstruct(self, residues):
        return crt_ops.rec_u64_from3(residues, self.primes)

    def negacyclic_polymul(self, lhs, rhs, rhs_binary: bool = True):
        return super().negacyclic_polymul(lhs, rhs, rhs_binary=rhs_binary)

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
        return cls(n=n, width=64, primes=primes, plans=plans, tier="plan52")

    def _reconstruct(self, residues):
        return crt_ops.rec_from2_p50_u64(residues, self.primes)

    def negacyclic_polymul(self, lhs, rhs, rhs_binary: bool = True):
        return super().negacyclic_polymul(lhs, rhs, rhs_binary=rhs_binary)

    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]
