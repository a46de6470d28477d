"""Native-binary NTT mod 2^32: one operand has {0,1} coefficients.

Parity with src/native_binary32.rs: the binary operand needs no CRT headroom
of its own, so Plan32 uses only 2× 30-bit channels (native_binary32.rs:11)
and Plan52 a single 50-bit channel (native_binary32.rs:19). `fwd_binary`
skips the modular reduction (native_binary32.rs:210-218). Use case: FHE
external products / PBS with binary polynomials.
"""

from __future__ import annotations

from dataclasses import dataclass

from ._native_common import NativePlanBase, build_plans32, build_plans52
from .ops import crt as crt_ops
from .tables import NATIVE_BINARY32_PRIMES, native_channel_primes, PRIMES52


@dataclass(frozen=True)
class Plan32(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan32 | None":
        primes = native_channel_primes(2, n)
        if primes is None:
            return None
        plans = build_plans32(n, primes)
        if not plans:
            return None
        return cls(n=n, width=32, primes=primes, plans=plans, tier="plan32")

    def _reconstruct(self, residues):
        return crt_ops.rec_u32_from2(residues, self.primes)

    def negacyclic_polymul(self, lhs, rhs, rhs_binary: bool = True):
        """rhs is the binary operand (native_binary32.rs polymul contract)."""
        return super().negacyclic_polymul(lhs, rhs, rhs_binary=rhs_binary)

    def ntt_0(self):
        return self.plans[0]

    def ntt_1(self):
        return self.plans[1]


@dataclass(frozen=True)
class Plan52(NativePlanBase):
    @classmethod
    def try_new(cls, n: int) -> "Plan52 | None":
        primes = PRIMES52[:1]
        plans = build_plans52(n, primes)
        if not plans:
            return None
        return cls(n=n, width=32, primes=primes, plans=plans, tier="plan52")

    def _reconstruct(self, residues):
        return crt_ops.rec_from1_p50_u32(residues, self.primes)

    def negacyclic_polymul(self, lhs, rhs, rhs_binary: bool = True):
        return super().negacyclic_polymul(lhs, rhs, rhs_binary=rhs_binary)

    def ntt_0(self):
        return self.plans[0]
