// Measured per-core AVX512 baseline for the native64-style negacyclic
// polymul (the headline metric's denominator).
//
// The reference (zama-ai/concrete-ntt) publishes no numbers and this image
// has no Rust toolchain, so the baseline is established by implementing the
// same ALGORITHM CLASS from first principles — Harvey-style lazy-reduction
// ([0,4p)) radix-2 NTT with Shoup multiplication, negacyclic twist folded
// into bit-reversed twiddles, the reference's five hardcoded 30-bit CRT
// primes (compile-time constants so the residue split compiles to magic
// multiplies, as in the reference), fully vectorized tail stages (the
// in-register analogue), Montgomery pointwise with fused n^-1
// normalization, and a v2-paired Shoup Garner lift with signed truncation —
// in AVX512 intrinsics, measured on this host's core. This is an
// independent implementation (no code derived from the Rust reference);
// self-checks assert the wrapping-polymul contract against a schoolbook
// oracle before timing.
//
// Build/run: make baseline   (g++ -O3 -march=native)
// Prints one JSON line with seconds per polymul.

#include <immintrin.h>

#include <cassert>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = unsigned __int128;

// The reference's primes32 table P0..P4 (lib.rs:453-462; same constants as
// concrete_ntt_tpu.tables.PRIMES32[:5]) — compile-time so `% P` lowers to
// magic multiplies and auto-vectorizes, like the reference's const table.
static constexpr u32 P0 = 0x3F5A0001, P1 = 0x3F5D0001, P2 = 0x3F760001,
                     P3 = 0x3F820001, P4 = 0x3FAC0001;
static constexpr u32 PRIMES[5] = {P0, P1, P2, P3, P4};

static u64 powmod(u64 b, u64 e, u64 p) {
  u128 r = 1, a = b % p;
  while (e) {
    if (e & 1) r = r * a % p;
    a = a * a % p;
    e >>= 1;
  }
  return (u64)r;
}
static u64 find_root2n(u64 p, u64 two_n) {
  u64 q = (p - 1) / two_n;
  for (u64 g = 2;; g++) {
    u64 r = powmod(g, q, p);
    if (powmod(r, two_n / 2, p) != 1) return r;
  }
}
static u32 bitrev(u32 x, int bits) {
  u32 r = 0;
  for (int i = 0; i < bits; i++) r |= ((x >> i) & 1) << (bits - 1 - i);
  return r;
}

struct Channel {
  u32 p, two_p, n_inv_w, n_inv_shoup_w, neginv;
  std::vector<u32> twid, twid_shoup, itwid, itwid_shoup;
  // per-stage expanded tail twiddles (t < 16): lane j of vector i holds
  // twid[m + (16*i + j) / (2t)] — the flat-layout analogue of the
  // reference's in-register tail networks
  std::vector<u32> tw_tail, tws_tail, itw_tail, itws_tail;  // [4][n]
  int n, lg;
};

static Channel make_channel(u32 p, int n) {
  Channel c;
  c.p = p;
  c.two_p = 2 * p;
  c.n = n;
  c.lg = __builtin_ctz((u32)n);
  u64 psi = find_root2n(p, 2ull * n);
  u64 ipsi = powmod(psi, p - 2, p);
  c.twid.resize(n);
  c.twid_shoup.resize(n);
  c.itwid.resize(n);
  c.itwid_shoup.resize(n);
  for (int k = 0; k < n; k++) {
    u64 w = powmod(psi, k, p), iw = powmod(ipsi, k, p);
    c.twid[bitrev(k, c.lg)] = (u32)w;
    c.twid_shoup[bitrev(k, c.lg)] = (u32)(((u128)w << 32) / p);
    c.itwid[bitrev(k, c.lg)] = (u32)iw;
    c.itwid_shoup[bitrev(k, c.lg)] = (u32)(((u128)iw << 32) / p);
  }
  c.tw_tail.resize(4 * n);
  c.tws_tail.resize(4 * n);
  c.itw_tail.resize(4 * n);
  c.itws_tail.resize(4 * n);
  for (int s = c.lg - 4; s < c.lg; s++) {  // stages with t = 8,4,2,1
    int m = 1 << s, two_t = n >> s;
    int row = s - (c.lg - 4);
    for (int j = 0; j < n; j++) {
      int b = j / two_t;
      c.tw_tail[row * n + j] = c.twid[m + b];
      c.tws_tail[row * n + j] = c.twid_shoup[m + b];
      c.itw_tail[row * n + j] = c.itwid[m + b];
      c.itws_tail[row * n + j] = c.itwid_shoup[m + b];
    }
  }
  u64 ninv = powmod(n, p - 2, p);
  u64 w = ninv * ((u128)(1ull << 32) % p) % p;
  c.n_inv_w = (u32)w;
  c.n_inv_shoup_w = (u32)(((u128)w << 32) / p);
  u64 inv = 1;
  for (int i = 0; i < 5; i++) inv *= 2 - (u64)p * inv;
  c.neginv = (u32)(0u - (u32)inv);
  return c;
}

static inline __m512i mulhi_u32x16(__m512i a, __m512i b) {
  __m512i even = _mm512_srli_epi64(_mm512_mul_epu32(a, b), 32);
  __m512i odd =
      _mm512_mul_epu32(_mm512_srli_epi64(a, 32), _mm512_srli_epi64(b, 32));
  const __m512i hi = _mm512_set1_epi64((long long)0xFFFFFFFF00000000ull);
  return _mm512_or_si512(even, _mm512_and_si512(odd, hi));
}

static inline __mmask16 role_mask(int t) {  // lanes with (j & t) == 0
  u32 m = 0;
  for (int j = 0; j < 16; j++)
    if (!(j & t)) m |= 1u << j;
  return (__mmask16)m;
}

static void fwd_ntt(const Channel& c, u32* a) {
  const int n = c.n;
  const __m512i vp = _mm512_set1_epi32((int)c.p);
  const __m512i v2p = _mm512_set1_epi32((int)c.two_p);
  for (int s = 0; s < c.lg - 4; s++) {  // strided stages, t >= 16
    int m = 1 << s, t = n >> (s + 1);
    for (int b = 0; b < m; b++) {
      const __m512i vw = _mm512_set1_epi32((int)c.twid[m + b]);
      const __m512i vws = _mm512_set1_epi32((int)c.twid_shoup[m + b]);
      u32* z0 = a + (size_t)b * 2 * t;
      u32* z1 = z0 + t;
      for (int i = 0; i < t; i += 16) {
        __m512i x0 = _mm512_loadu_si512(z0 + i);
        __m512i x1 = _mm512_loadu_si512(z1 + i);
        x0 = _mm512_min_epu32(x0, _mm512_sub_epi32(x0, v2p));
        __m512i q = mulhi_u32x16(x1, vws);
        __m512i wt = _mm512_sub_epi32(_mm512_mullo_epi32(x1, vw),
                                      _mm512_mullo_epi32(q, vp));
        _mm512_storeu_si512(z0 + i, _mm512_add_epi32(x0, wt));
        _mm512_storeu_si512(z1 + i,
                            _mm512_add_epi32(_mm512_sub_epi32(x0, wt), v2p));
      }
    }
  }
  for (int s = c.lg - 4; s < c.lg; s++) {  // tail stages in-register
    int t = n >> (s + 1);
    int row = s - (c.lg - 4);
    const u32* tw = c.tw_tail.data() + (size_t)row * n;
    const u32* tws = c.tws_tail.data() + (size_t)row * n;
    __m512i idx = _mm512_set_epi32(15 ^ t, 14 ^ t, 13 ^ t, 12 ^ t, 11 ^ t,
                                   10 ^ t, 9 ^ t, 8 ^ t, 7 ^ t, 6 ^ t, 5 ^ t,
                                   4 ^ t, 3 ^ t, 2 ^ t, 1 ^ t, 0 ^ t);
    __mmask16 role = role_mask(t);
    for (int i = 0; i < n; i += 16) {
      __m512i x = _mm512_loadu_si512(a + i);
      __m512i partner = _mm512_permutexvar_epi32(idx, x);
      __m512i z0 = _mm512_mask_blend_epi32(role, partner, x);
      __m512i z1 = _mm512_mask_blend_epi32(role, x, partner);
      z0 = _mm512_min_epu32(z0, _mm512_sub_epi32(z0, v2p));
      __m512i vw = _mm512_loadu_si512(tw + i);
      __m512i vws = _mm512_loadu_si512(tws + i);
      __m512i q = mulhi_u32x16(z1, vws);
      __m512i wt = _mm512_sub_epi32(_mm512_mullo_epi32(z1, vw),
                                    _mm512_mullo_epi32(q, vp));
      __m512i lo = _mm512_add_epi32(z0, wt);
      __m512i hi = _mm512_add_epi32(_mm512_sub_epi32(z0, wt), v2p);
      _mm512_storeu_si512(a + i, _mm512_mask_blend_epi32(role, hi, lo));
    }
  }
  for (int i = 0; i < n; i += 16) {  // canonicalize
    __m512i x = _mm512_loadu_si512(a + i);
    x = _mm512_min_epu32(x, _mm512_sub_epi32(x, v2p));
    x = _mm512_min_epu32(x, _mm512_sub_epi32(x, vp));
    _mm512_storeu_si512(a + i, x);
  }
}

static void inv_ntt(const Channel& c, u32* a) {
  const int n = c.n;
  const __m512i vp = _mm512_set1_epi32((int)c.p);
  const __m512i v2p = _mm512_set1_epi32((int)c.two_p);
  for (int s = c.lg - 1; s >= c.lg - 4; s--) {  // tail stages first (t < 16)
    int t = n >> (s + 1);
    int row = s - (c.lg - 4);
    const u32* tw = c.itw_tail.data() + (size_t)row * n;
    const u32* tws = c.itws_tail.data() + (size_t)row * n;
    __m512i idx = _mm512_set_epi32(15 ^ t, 14 ^ t, 13 ^ t, 12 ^ t, 11 ^ t,
                                   10 ^ t, 9 ^ t, 8 ^ t, 7 ^ t, 6 ^ t, 5 ^ t,
                                   4 ^ t, 3 ^ t, 2 ^ t, 1 ^ t, 0 ^ t);
    __mmask16 role = role_mask(t);
    for (int i = 0; i < n; i += 16) {
      __m512i x = _mm512_loadu_si512(a + i);
      __m512i partner = _mm512_permutexvar_epi32(idx, x);
      __m512i z0 = _mm512_mask_blend_epi32(role, partner, x);
      __m512i z1 = _mm512_mask_blend_epi32(role, x, partner);
      __m512i s0 = _mm512_add_epi32(z0, z1);
      s0 = _mm512_min_epu32(s0, _mm512_sub_epi32(s0, v2p));
      __m512i d = _mm512_add_epi32(_mm512_sub_epi32(z0, z1), v2p);
      __m512i vw = _mm512_loadu_si512(tw + i);
      __m512i vws = _mm512_loadu_si512(tws + i);
      __m512i q = mulhi_u32x16(d, vws);
      __m512i wd = _mm512_sub_epi32(_mm512_mullo_epi32(d, vw),
                                    _mm512_mullo_epi32(q, vp));
      _mm512_storeu_si512(a + i, _mm512_mask_blend_epi32(role, wd, s0));
    }
  }
  for (int s = c.lg - 5; s >= 0; s--) {  // strided stages
    int m = 1 << s, t = n >> (s + 1);
    for (int b = 0; b < m; b++) {
      const __m512i vw = _mm512_set1_epi32((int)c.itwid[m + b]);
      const __m512i vws = _mm512_set1_epi32((int)c.itwid_shoup[m + b]);
      u32* z0 = a + (size_t)b * 2 * t;
      u32* z1 = z0 + t;
      for (int i = 0; i < t; i += 16) {
        __m512i x0 = _mm512_loadu_si512(z0 + i);
        __m512i x1 = _mm512_loadu_si512(z1 + i);
        __m512i s0 = _mm512_add_epi32(x0, x1);
        s0 = _mm512_min_epu32(s0, _mm512_sub_epi32(s0, v2p));
        __m512i d = _mm512_add_epi32(_mm512_sub_epi32(x0, x1), v2p);
        __m512i q = mulhi_u32x16(d, vws);
        __m512i wd = _mm512_sub_epi32(_mm512_mullo_epi32(d, vw),
                                      _mm512_mullo_epi32(q, vp));
        _mm512_storeu_si512(z0 + i, s0);
        _mm512_storeu_si512(z1 + i, wd);
      }
    }
  }
  for (int i = 0; i < n; i += 16) {
    __m512i x = _mm512_loadu_si512(a + i);
    x = _mm512_min_epu32(x, _mm512_sub_epi32(x, v2p));
    x = _mm512_min_epu32(x, _mm512_sub_epi32(x, vp));
    _mm512_storeu_si512(a + i, x);
  }
}

static void pointwise_normalize(const Channel& c, u32* a, const u32* b, int n) {
  const __m512i vp = _mm512_set1_epi32((int)c.p);
  const __m512i vni = _mm512_set1_epi32((int)c.neginv);
  const __m512i vw = _mm512_set1_epi32((int)c.n_inv_w);
  const __m512i vws = _mm512_set1_epi32((int)c.n_inv_shoup_w);
  for (int i = 0; i < n; i += 16) {
    __m512i x = _mm512_loadu_si512(a + i);
    __m512i y = _mm512_loadu_si512(b + i);
    __m512i pe = _mm512_mul_epu32(x, y);
    __m512i po =
        _mm512_mul_epu32(_mm512_srli_epi64(x, 32), _mm512_srli_epi64(y, 32));
    __m512i me = _mm512_mul_epu32(pe, vni);
    __m512i mo = _mm512_mul_epu32(po, vni);
    pe = _mm512_add_epi64(pe, _mm512_mul_epu32(me, vp));
    po = _mm512_add_epi64(po, _mm512_mul_epu32(mo, vp));
    pe = _mm512_srli_epi64(pe, 32);
    po = _mm512_and_si512(_mm512_srli_epi64(po, 32),
                          _mm512_set1_epi64(0xFFFFFFFFll));
    __m512i r = _mm512_or_si512(pe, _mm512_slli_epi64(po, 32));
    __m512i q = mulhi_u32x16(r, vws);
    r = _mm512_sub_epi32(_mm512_mullo_epi32(r, vw), _mm512_mullo_epi32(q, vp));
    r = _mm512_min_epu32(r, _mm512_sub_epi32(r, vp));
    _mm512_storeu_si512(a + i, r);
  }
}

// --------------------------------------------------------------- plan
struct Native64 {
  int n;
  Channel ch[5];
  // v2 pairing constants (pair channels 1,2 and 3,4 into u64 moduli)
  u64 p12, p34;
  u64 c12, c12_sh;   // P1^-1 mod P2 + 32-bit Shoup companion
  u64 c34, c34_sh;   // P3^-1 mod P4
  u64 g1, g1_sh;     // (P0)^-1 mod P12, Shoup companion (<<64)
  u64 g2, g2_sh;     // (P0*P12)^-1 mod P34
  u64 p0m34, p0m34_sh;  // P0 mod P34 + Shoup (<<64 / P34)
  u64 m34;              // floor(2^64 / P34) (Barrett)
  u64 half34;
};

static inline u64 mulhi64(u64 a, u64 b) { return (u64)(((u128)a * b) >> 64); }
static inline u64 shoup64(u64 x, u64 w, u64 wsh, u64 p) {
  u64 q = mulhi64(x, wsh);
  u64 r = x * w - q * p;
  return r >= p ? r - p : r;
}

static Native64 make_native64(int n) {
  Native64 pl;
  pl.n = n;
  for (int k = 0; k < 5; k++) pl.ch[k] = make_channel(PRIMES[k], n);
  pl.p12 = (u64)P1 * P2;
  pl.p34 = (u64)P3 * P4;
  auto inv_mod = [](u128 a, u64 m) { return (u64)powmod((u64)(a % m), 0, 0); };
  (void)inv_mod;
  // P1^-1 mod P2 etc. (32-bit)
  pl.c12 = powmod(P1 % P2, P2 - 2, P2);
  pl.c34 = powmod(P3 % P4, P4 - 2, P4);
  // g1 = P0^-1 mod P12 via CRT of inverses mod P1 and P2
  auto inv_mod_pair = [&](u64 a, u32 q1, u32 q2, u64 q12) -> u64 {
    u64 i1 = powmod(a % q1, q1 - 2, q1), i2 = powmod(a % q2, q2 - 2, q2);
    // CRT: x ≡ i1 (q1), x ≡ i2 (q2)
    u64 c = powmod(q1 % q2, q2 - 2, q2);
    u64 t = (u64)((u128)((i2 + q2 - i1 % q2) % q2) * c % q2);
    return (i1 + (u128)q1 * t) % q12;
  };
  pl.g1 = inv_mod_pair(P0, P1, P2, pl.p12);
  pl.g1_sh = (u64)(((u128)pl.g1 << 64) / pl.p12);
  u128 p012 = (u128)P0 * pl.p12;
  pl.g2 = inv_mod_pair((u64)(p012 % pl.p34), P3, P4, pl.p34);
  pl.g2_sh = (u64)(((u128)pl.g2 << 64) / pl.p34);
  pl.c12_sh = ((u128)pl.c12 << 32) / P2;
  pl.c34_sh = ((u128)pl.c34 << 32) / P4;
  pl.p0m34 = (u64)P0 % pl.p34;
  pl.p0m34_sh = (u64)(((u128)pl.p0m34 << 64) / pl.p34);
  pl.m34 = (u64)((((u128)1) << 64) / pl.p34);
  pl.half34 = pl.p34 / 2;
  return pl;
}

// ------------------------- AVX512 u64-lane helpers for the SIMD lift ------
static inline __m512i mullo64x8(__m512i a, __m512i b) {
  return _mm512_mullo_epi64(a, b);  // AVX512DQ
}
static inline __m512i mulhi64x8(__m512i a, __m512i b) {
  // schoolbook 64x64 -> hi64 from 32-bit partials
  const __m512i lo32 = _mm512_set1_epi64(0xFFFFFFFFll);
  __m512i alo = _mm512_and_si512(a, lo32), ahi = _mm512_srli_epi64(a, 32);
  __m512i blo = _mm512_and_si512(b, lo32), bhi = _mm512_srli_epi64(b, 32);
  __m512i ll = _mm512_mul_epu32(a, b);  // alo*blo
  __m512i lh = _mm512_mul_epu32(alo, bhi);
  __m512i hl = _mm512_mul_epu32(ahi, blo);
  __m512i hh = _mm512_mul_epu32(ahi, bhi);
  __m512i mid = _mm512_add_epi64(
      _mm512_add_epi64(_mm512_srli_epi64(ll, 32), _mm512_and_si512(lh, lo32)),
      _mm512_and_si512(hl, lo32));
  return _mm512_add_epi64(
      _mm512_add_epi64(hh, _mm512_srli_epi64(lh, 32)),
      _mm512_add_epi64(_mm512_srli_epi64(hl, 32), _mm512_srli_epi64(mid, 32)));
}
static inline __m512i condsub64x8(__m512i x, __m512i p) {
  __mmask8 ge = _mm512_cmpge_epu64_mask(x, p);
  return _mm512_mask_sub_epi64(x, ge, x, p);
}
static inline __m512i shoup64x8(__m512i x, __m512i w, __m512i wsh, __m512i p) {
  __m512i q = mulhi64x8(x, wsh);
  __m512i r = _mm512_sub_epi64(mullo64x8(x, w), mullo64x8(q, p));
  return condsub64x8(r, p);
}

static void polymul(Native64& pl, const u64* lhs, const u64* rhs, u64* out,
                    std::vector<u32>& scratch) {
  const int n = pl.n;
  u32* bufs = scratch.data();
  // residue split: constant primes -> compiler magic multiplies, vectorized
  for (int i = 0; i < n; i++) bufs[0 * n + i] = (u32)(lhs[i] % P0);
  for (int i = 0; i < n; i++) bufs[1 * n + i] = (u32)(lhs[i] % P1);
  for (int i = 0; i < n; i++) bufs[2 * n + i] = (u32)(lhs[i] % P2);
  for (int i = 0; i < n; i++) bufs[3 * n + i] = (u32)(lhs[i] % P3);
  for (int i = 0; i < n; i++) bufs[4 * n + i] = (u32)(lhs[i] % P4);
  for (int i = 0; i < n; i++) bufs[5 * n + i] = (u32)(rhs[i] % P0);
  for (int i = 0; i < n; i++) bufs[6 * n + i] = (u32)(rhs[i] % P1);
  for (int i = 0; i < n; i++) bufs[7 * n + i] = (u32)(rhs[i] % P2);
  for (int i = 0; i < n; i++) bufs[8 * n + i] = (u32)(rhs[i] % P3);
  for (int i = 0; i < n; i++) bufs[9 * n + i] = (u32)(rhs[i] % P4);
  for (int k = 0; k < 5; k++) {
    u32* a = bufs + (size_t)k * n;
    u32* b = bufs + (size_t)(5 + k) * n;
    fwd_ntt(pl.ch[k], a);
    fwd_ntt(pl.ch[k], b);
    pointwise_normalize(pl.ch[k], a, b, n);
    inv_ntt(pl.ch[k], a);
  }
  // v2-paired Garner lift (channels (1,2) and (3,4) pair into u64 digits):
  // value = v0 + P0*(d1 + P12*d2_signed), all wrapping u64. AVX512 u64
  // lanes, 8 coefficients per iteration (the SIMD reconstruction slice).
  const u32 *v0 = bufs, *v1 = bufs + n, *v2 = bufs + 2 * (size_t)n,
            *v3 = bufs + 3 * (size_t)n, *v4 = bufs + 4 * (size_t)n;
  const __m512i vp12 = _mm512_set1_epi64((long long)pl.p12);
  const __m512i vp34 = _mm512_set1_epi64((long long)pl.p34);
  const __m512i vP1 = _mm512_set1_epi64(P1), vP2 = _mm512_set1_epi64(P2);
  const __m512i vP3 = _mm512_set1_epi64(P3), vP4 = _mm512_set1_epi64(P4);
  const __m512i vc12 = _mm512_set1_epi64((long long)pl.c12);
  const __m512i vc12s = _mm512_set1_epi64((long long)pl.c12_sh);
  const __m512i vc34 = _mm512_set1_epi64((long long)pl.c34);
  const __m512i vc34s = _mm512_set1_epi64((long long)pl.c34_sh);
  const __m512i vg1 = _mm512_set1_epi64((long long)pl.g1);
  const __m512i vg1s = _mm512_set1_epi64((long long)pl.g1_sh);
  const __m512i vg2 = _mm512_set1_epi64((long long)pl.g2);
  const __m512i vg2s = _mm512_set1_epi64((long long)pl.g2_sh);
  const __m512i vp0c = _mm512_set1_epi64((long long)pl.p0m34);
  const __m512i vp0cs = _mm512_set1_epi64((long long)pl.p0m34_sh);
  const __m512i vhalf = _mm512_set1_epi64((long long)pl.half34);
  const __m512i vP0 = _mm512_set1_epi64(P0);
  for (int i = 0; i < n; i += 8) {
    __m512i x0 = _mm512_cvtepu32_epi64(_mm256_loadu_si256((__m256i*)(v0 + i)));
    __m512i x1 = _mm512_cvtepu32_epi64(_mm256_loadu_si256((__m256i*)(v1 + i)));
    __m512i x2 = _mm512_cvtepu32_epi64(_mm256_loadu_si256((__m256i*)(v2 + i)));
    __m512i x3 = _mm512_cvtepu32_epi64(_mm256_loadu_si256((__m256i*)(v3 + i)));
    __m512i x4 = _mm512_cvtepu32_epi64(_mm256_loadu_si256((__m256i*)(v4 + i)));
    // pair (v1, v2): t = ((v2 - v1 mod P2) * c12) mod P2 via 32-bit Shoup
    // evaluated in u64 lanes (products < 2^60, exact); r12 = v1 + P1*t
    __m512i d = condsub64x8(_mm512_add_epi64(x2, _mm512_sub_epi64(vP2, x1)),
                            vP2);
    __m512i q = _mm512_srli_epi64(mullo64x8(d, vc12s), 32);
    __m512i t = condsub64x8(
        _mm512_sub_epi64(mullo64x8(d, vc12), mullo64x8(q, vP2)), vP2);
    __m512i r12 = _mm512_add_epi64(x1, mullo64x8(vP1, t));
    d = condsub64x8(_mm512_add_epi64(x4, _mm512_sub_epi64(vP4, x3)), vP4);
    q = _mm512_srli_epi64(mullo64x8(d, vc34s), 32);
    t = condsub64x8(_mm512_sub_epi64(mullo64x8(d, vc34), mullo64x8(q, vP4)),
                    vP4);
    __m512i r34 = _mm512_add_epi64(x3, mullo64x8(vP3, t));
    // digit d1 = (r12 - d0) * P0^-1 mod P12 (64-bit Shoup)
    __m512i diff = _mm512_sub_epi64(r12, x0);
    __mmask8 bor = _mm512_cmplt_epu64_mask(r12, x0);
    diff = _mm512_mask_add_epi64(diff, bor, diff, vp12);
    __m512i d1 = shoup64x8(diff, vg1, vg1s, vp12);
    // lvl = (d0 + P0*d1) mod P34: Shoup-mul d1 by (P0 mod P34), add d0
    __m512i lvl = condsub64x8(
        _mm512_add_epi64(shoup64x8(d1, vp0c, vp0cs, vp34), x0), vp34);
    diff = _mm512_sub_epi64(r34, lvl);
    bor = _mm512_cmplt_epu64_mask(r34, lvl);
    diff = _mm512_mask_add_epi64(diff, bor, diff, vp34);
    __m512i d2 = shoup64x8(diff, vg2, vg2s, vp34);
    // signed truncation + wrapping Horner
    __mmask8 neg = _mm512_cmpgt_epu64_mask(d2, vhalf);
    d2 = _mm512_mask_sub_epi64(d2, neg, d2, vp34);
    __m512i acc = _mm512_add_epi64(d1, mullo64x8(vp12, d2));
    acc = _mm512_add_epi64(x0, mullo64x8(vP0, acc));
    _mm512_storeu_si512(out + i, acc);
  }
}

int main(int argc, char** argv) {
  int n = argc > 1 ? atoi(argv[1]) : 1 << 14;
  Native64 pl = make_native64(n);

  {  // self-check 1: per-channel roundtrip
    std::vector<u32> x(n), y(n);
    for (int i = 0; i < n; i++) x[i] = (u32)rand() % pl.ch[0].p;
    y = x;
    fwd_ntt(pl.ch[0], y.data());
    inv_ntt(pl.ch[0], y.data());
    for (int i = 0; i < n; i++)
      assert(y[i] == (u32)((u64)x[i] * n % pl.ch[0].p));
  }
  {  // self-check 2: wrapping polymul vs schoolbook at small n
    int sn = 512;
    Native64 sp = make_native64(sn);
    std::vector<u64> a(sn), b(sn), got(sn), want(sn, 0);
    for (int i = 0; i < sn; i++) {
      a[i] = ((u64)rand() << 32) ^ (u64)rand();
      b[i] = ((u64)rand() << 32) ^ (u64)rand();
    }
    std::vector<u32> scratch((size_t)10 * sn);
    polymul(sp, a.data(), b.data(), got.data(), scratch);
    for (int i = 0; i < sn; i++)
      for (int j = 0; j < sn; j++) {
        u64 t = a[i] * b[j];
        int k = i + j;
        if (k >= sn) want[k - sn] -= t;
        else want[k] += t;
      }
    for (int i = 0; i < sn; i++) assert(got[i] == want[i]);
  }

  std::vector<u64> a(n), b(n), out(n);
  for (int i = 0; i < n; i++) {
    a[i] = ((u64)rand() << 32) ^ (u64)rand();
    b[i] = ((u64)rand() << 32) ^ (u64)rand();
  }
  std::vector<u32> scratch((size_t)10 * n);
  polymul(pl, a.data(), b.data(), out.data(), scratch);
  int reps = 100;
  double best = 1e30;
  volatile u64 sink = 0;
  for (int r = 0; r < 5; r++) {
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < reps; i++) {
      polymul(pl, a.data(), b.data(), out.data(), scratch);
      sink ^= out[0];
    }
    double dt =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
            .count() /
        reps;
    if (dt < best) best = dt;
  }
  printf(
      "{\"bench\": \"native64_polymul_avx512_1core\", \"n\": %d, "
      "\"seconds_per_polymul\": %.6e, \"polymul_per_sec\": %.1f}\n",
      n, best, 1.0 / best);
  return (int)(sink & 0);
}
