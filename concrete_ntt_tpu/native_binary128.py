"""Native-binary NTT mod 2^128 (src/native_binary128.rs): Plan32 = 5× 30-bit
channels (native_binary128.rs:4-10); no Plan52 tier (parity with reference).
Reconstruction: v2 pair digits v0/v12/v34 → u128 (native_binary128.rs:13-66)."""

from __future__ import annotations

from dataclasses import dataclass

from ._native_common import NativePlanBase, build_plans32
from .ops import crt as crt_ops
from .tables import NATIVE_BINARY128_PRIMES, native_channel_primes


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
        return cls(n=n, width=128, primes=primes, plans=plans, tier="plan32")

    def _reconstruct(self, residues):
        from . import crt_mxu

        if crt_mxu.mxu_lift_enabled():
            return crt_mxu.rec_u128_from5(residues, self.primes)
        return crt_ops.rec_u128_from5(residues, self.primes)

    def negacyclic_polymul(self, lhs, rhs, rhs_binary: bool = True):
        return super().negacyclic_polymul(lhs, rhs, rhs_binary=rhs_binary)

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
