"""Prime-table parity and regeneration tests (reference lib.rs:447-652,
generation procedure lib.rs:424-445 / generate_primes test lib.rs:770-785)."""

from concrete_ntt_tpu.tables import (
    GOLDILOCKS,
    NATIVE64_PRIMES,
    PRIMES32,
    PRIMES52,
    crt_constants,
    generate_ntt_primes,
    primes32_ext,
)
from concrete_ntt_tpu.utils.fastdiv import magic_u64
from concrete_ntt_tpu.utils.prime import is_prime64


def test_primes32_properties():
    assert len(PRIMES32) == 10
    assert list(PRIMES32) == sorted(PRIMES32)
    for p in PRIMES32:
        assert is_prime64(p)
        assert p < 1 << 30
        assert p % (1 << 16) == 1  # supports N up to 2^15
        assert magic_u64(p).exact_for_u64


def test_primes32_regeneration():
    # The table must be exactly the 10 largest 30-bit primes ≡ 1 (mod 2^16)
    # with the exact-magic property — the reference's selection procedure.
    assert generate_ntt_primes(10, 30, 1 << 16) == PRIMES32


def test_primes52_properties():
    assert len(PRIMES52) == 6
    for p in PRIMES52:
        assert is_prime64(p)
        assert p < 1 << 50
        assert p % (1 << 16) == 1
        assert magic_u64(p).exact_for_u64


def test_primes52_regeneration():
    assert generate_ntt_primes(6, 50, 1 << 16) == PRIMES52


def test_primes32_ext():
    ext = primes32_ext()
    assert len(ext) == 10
    for p in ext:
        assert is_prime64(p) and p < 1 << 30 and p % (1 << 18) == 1


def test_goldilocks():
    assert GOLDILOCKS == 2**64 - 2**32 + 1
    assert is_prime64(GOLDILOCKS)
    # 2^32 | p-1 → supports huge transform sizes.
    assert (GOLDILOCKS - 1) % (1 << 32) == 0


def test_crt_constants_native64():
    c = crt_constants(NATIVE64_PRIMES)
    m = 1
    for p in NATIVE64_PRIMES:
        m *= p
    assert c["product"] == m
    # Headroom contract: wrapping-u64 negacyclic convolution at N=2^15 stays
    # strictly inside (-M/2, M/2): n * (2^64-1)^2 * ... bound:
    assert (1 << 15) * ((1 << 64) - 1) ** 2 < m // 2
    # CRT identity: explicit lift of residues of a known value recovers it.
    v = 0x0123456789ABCDEF0123456789ABCDEF % m
    lift = 0
    for p, y, mi in zip(NATIVE64_PRIMES, c["y"], c["big_m"]):
        lift += ((v % p) * y % p) * mi
    assert lift % m == v
