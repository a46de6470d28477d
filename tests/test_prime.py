"""Number-theory layer tests (mirrors the reference's test patterns,
SURVEY.md §4.5: prime.rs:187-222, roots.rs:111-131, fastdiv.rs:157-195)."""

import random

from concrete_ntt_tpu.utils.fastdiv import (
    barrett32,
    div_via_magic,
    magic_u64,
    shoup32,
    shoup64,
)
from concrete_ntt_tpu.utils.prime import (
    exp_mod,
    is_prime64,
    largest_prime_in_arithmetic_progression64,
)
from concrete_ntt_tpu.utils.roots import (
    find_primitive_root64,
    is_primitive_root,
    sqrt_mod,
)


def _sieve(limit):
    is_p = bytearray([1]) * limit
    is_p[0:2] = b"\x00\x00"
    for i in range(2, int(limit**0.5) + 1):
        if is_p[i]:
            is_p[i * i :: i] = b"\x00" * len(is_p[i * i :: i])
    return [i for i in range(limit) if is_p[i]]


def test_is_prime_small():
    # Same pattern as reference prime.rs:187-206: check against sieve < 1000.
    primes = set(_sieve(1000))
    for n in range(1000):
        assert is_prime64(n) == (n in primes), n


def test_is_prime_known_large():
    assert is_prime64((1 << 64) - 59)  # largest prime < 2^64
    assert not is_prime64((1 << 64) - 1)
    assert is_prime64(0x3F5A0001)
    assert is_prime64((1 << 64) - (1 << 32) + 1)  # Goldilocks
    # Strong pseudoprime to several bases, composite:
    assert not is_prime64(3215031751)


def test_prime_search():
    # p ≡ 1 (mod 2^16), largest below 2^30:
    p = largest_prime_in_arithmetic_progression64(1 << 16, 1, 2, (1 << 30) - 1)
    assert p is not None
    assert p % (1 << 16) == 1 and is_prime64(p) and p < 1 << 30
    # Edge cases (reference prime.rs:208-222 pattern):
    assert largest_prime_in_arithmetic_progression64(2, 1, 14, 16) is None


def test_sqrt_mod():
    rng = random.Random(1)
    for p in (0x3F5A0001, 1062862849, 97, 1073479681):
        for _ in range(20):
            x = rng.randrange(1, p)
            a = x * x % p
            r = sqrt_mod(a, p)
            assert r is not None and r * r % p == a


def test_primitive_root():
    # Reference roots.rs:111-131 pattern: order checks.
    for p, degree in ((1062862849, 64), (0x3F5A0001, 1 << 16), (1073479681, 2048)):
        w = find_primitive_root64(p, degree)
        assert w is not None
        assert is_primitive_root(w, degree, p)
    # No 2N-th root when 2N doesn't divide p-1:
    assert find_primitive_root64(7, 4) is None


def test_exp_mod():
    rng = random.Random(2)
    for _ in range(50):
        p = 0x3F5A0001
        b = rng.randrange(p)
        e = rng.randrange(1 << 40)
        assert exp_mod(b, e, p) == pow(b, e, p)


def test_magic_u64_exactness():
    # Randomized check mirroring fastdiv.rs:157-195: magic division equals
    # plain division for random u64 numerators, for every table prime.
    from concrete_ntt_tpu.tables import PRIMES32, PRIMES52

    rng = random.Random(3)
    for d in PRIMES32 + PRIMES52:
        m = magic_u64(d)
        assert m.exact_for_u64, hex(d)
        for _ in range(200):
            x = rng.randrange(1 << 64)
            assert div_via_magic(x, m) == x // d
        assert div_via_magic((1 << 64) - 1, m) == ((1 << 64) - 1) // d
        assert div_via_magic(d - 1, m) == 0
        assert div_via_magic(d, m) == 1


def test_barrett32():
    # Barrett algebra proof-by-test (reference lib.rs:691-765 pattern):
    # for x < p^2, q = ((x >> (big_q-1)) * p_barrett) >> (big_q+2) gives
    # x - q*p in [0, 2p).
    rng = random.Random(4)
    for p in (0x3F5A0001, 0x3FFC0001, 1062862849, (1 << 31) + 11):
        p_barrett, big_q = barrett32(p)
        for _ in range(500):
            x = rng.randrange(p * p)
            q = ((x >> (big_q - 1)) * p_barrett) >> (big_q + 2)
            r = x - q * p
            assert 0 <= r < 2 * p
            assert r % p == x % p


def test_shoup_mul_bounds():
    # Shoup product t = z*w - floor(z*w_shoup/2^32)*p is ≡ z*w (mod p) and
    # t < 2p, for any z < 2^32 and w < p (Harvey's bound).
    rng = random.Random(5)
    p = 0x3F5A0001
    for _ in range(500):
        w = rng.randrange(p)
        ws = shoup32(w, p)
        z = rng.randrange(1 << 32)
        t = (z * w - ((z * ws) >> 32) * p) % (1 << 32)
        assert t < 2 * p
        assert t % p == z * w % p
    # 64-bit flavor:
    p64 = (1 << 62) - (1 << 16) + 1
    if is_prime64(p64):
        for _ in range(100):
            w = rng.randrange(p64)
            ws = shoup64(w, p64)
            z = rng.randrange(1 << 64)
            t = (z * w - ((z * ws) >> 64) * p64) % (1 << 64)
            assert t < 2 * p64 and t % p64 == z * w % p64
