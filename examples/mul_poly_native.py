"""Wrapping-u32 negacyclic product (port of examples/mul_poly_native.rs).

native32::Plan32, n = 1024: the product equals the schoolbook negacyclic
convolution computed in wrapping u32 machine arithmetic.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from concrete_ntt_tpu import native32
from concrete_ntt_tpu.golden.polymul import negacyclic_convolution_wrapping

N = 1024

rng = np.random.default_rng(0)
lhs = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)
rhs = rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32)

plan = native32.Plan32.try_new(N)
assert plan is not None
prod = np.asarray(plan.negacyclic_polymul(lhs, rhs))

expected = negacyclic_convolution_wrapping(lhs.tolist(), rhs.tolist(), 32)
assert prod.tolist() == expected
print(f"ok: wrapping-u32 negacyclic product, n={N}, 3 CRT channels")
