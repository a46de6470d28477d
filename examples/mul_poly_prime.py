"""Negacyclic polynomial product over Z/pZ (port of examples/mul_poly_prime.rs).

p = 1073479681, n = 1024: fwd both operands, fused pointwise multiply +
normalize, inverse transform; asserts equality with the schoolbook oracle.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from concrete_ntt_tpu import prime32
from concrete_ntt_tpu.golden.polymul import negacyclic_convolution_mod

N = 1024
P = 1073479681

rng = np.random.default_rng(0)
lhs = rng.integers(0, P, N).astype(np.uint32)
rhs = rng.integers(0, P, N).astype(np.uint32)

plan = prime32.Plan.new(N, P)
prod = np.asarray(plan.negacyclic_polymul(lhs, rhs))

expected = negacyclic_convolution_mod(lhs.tolist(), rhs.tolist(), P)
assert prod.tolist() == expected
print(f"ok: negacyclic product of two degree-{N - 1} polynomials mod {P}")
