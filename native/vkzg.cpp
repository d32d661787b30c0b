// vkzg_host: native BN254 host runtime for verkle_kzg_tpu.
//
// The reference is 100% native (Rust + arkworks); this library is the
// TPU-framework's native host-side counterpart: fast CPU field/curve
// arithmetic, Pippenger MSM, and the SHA-256 try-and-increment hash-to-curve
// CRS generator. It serves (a) CRS setup, (b) large-size bit-exactness
// oracles for the device kernels (python bigints are too slow past ~2^14
// points), and (c) a reference line for benchmarks.
//
// Semantics mirror hostmath/*.py exactly (which in turn mirrors arkworks):
//   * G1 affine points serialize as 32-byte LE x || 32-byte LE y, with
//     (0, 0) meaning the point at infinity (cofactor 1, (0,0) not on curve).
//   * Scalars/field elements are 32-byte LE.
//   * hash-to-curve follows vector-commit/src/ipa/ipa_point_generator.rs:
//     SHA-256(seed || LE u64 counter) -> ark from_random_bytes semantics.
//
// Build: make -C native   (produces libvkzg.so; loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = std::uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// 256-bit integers as 4x u64 little-endian
// ---------------------------------------------------------------------------

struct U256 {
  u64 w[4];
};

static inline U256 u256_zero() { return U256{{0, 0, 0, 0}}; }

static inline bool u256_is_zero(const U256 &a) {
  return (a.w[0] | a.w[1] | a.w[2] | a.w[3]) == 0;
}

static inline bool u256_eq(const U256 &a, const U256 &b) {
  return a.w[0] == b.w[0] && a.w[1] == b.w[1] && a.w[2] == b.w[2] &&
         a.w[3] == b.w[3];
}

static inline int u256_cmp(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; --i) {
    if (a.w[i] < b.w[i]) return -1;
    if (a.w[i] > b.w[i]) return 1;
  }
  return 0;
}

static inline U256 u256_add(const U256 &a, const U256 &b, u64 *carry_out) {
  U256 r;
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (u128)a.w[i] + b.w[i];
    r.w[i] = (u64)c;
    c >>= 64;
  }
  if (carry_out) *carry_out = (u64)c;
  return r;
}

static inline U256 u256_sub(const U256 &a, const U256 &b, u64 *borrow_out) {
  U256 r;
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u64 bi = b.w[i] + borrow;
    borrow = (bi < b.w[i]) || (a.w[i] < bi);
    r.w[i] = a.w[i] - bi;
  }
  if (borrow_out) *borrow_out = borrow;
  return r;
}

static void u256_from_bytes_le(U256 &out, const std::uint8_t *b) {
  for (int i = 0; i < 4; ++i) {
    u64 w = 0;
    for (int j = 7; j >= 0; --j) w = (w << 8) | b[i * 8 + j];
    out.w[i] = w;
  }
}

static void u256_to_bytes_le(const U256 &a, std::uint8_t *b) {
  for (int i = 0; i < 4; ++i) {
    u64 w = a.w[i];
    for (int j = 0; j < 8; ++j) {
      b[i * 8 + j] = (std::uint8_t)w;
      w >>= 8;
    }
  }
}

// ---------------------------------------------------------------------------
// Montgomery field arithmetic, parametric in the modulus
// ---------------------------------------------------------------------------

struct FieldCtx {
  U256 mod;
  U256 r2;     // R^2 mod m, R = 2^256
  U256 one;    // R mod m
  u64 n0inv;   // -m^-1 mod 2^64

  explicit FieldCtx(const U256 &m) : mod(m) {
    // one = 2^256 mod m via 256 modular doublings of 1
    U256 r{{1, 0, 0, 0}};
    for (int i = 0; i < 256; ++i) {
      u64 carry;
      U256 d = u256_add(r, r, &carry);
      if (carry || u256_cmp(d, mod) >= 0) d = u256_sub(d, mod, nullptr);
      r = d;
    }
    one = r;
    // r2 = one * one mod m via shift-and-add modmul (init-time only)
    U256 acc = u256_zero();
    for (int i = 255; i >= 0; --i) {
      u64 carry;
      U256 d = u256_add(acc, acc, &carry);
      if (carry || u256_cmp(d, mod) >= 0) d = u256_sub(d, mod, nullptr);
      acc = d;
      if ((one.w[i / 64] >> (i % 64)) & 1) {
        d = u256_add(acc, one, &carry);
        if (carry || u256_cmp(d, mod) >= 0) d = u256_sub(d, mod, nullptr);
        acc = d;
      }
    }
    r2 = acc;
    // n0inv = -m^-1 mod 2^64 via Newton iteration
    u64 inv = 1;
    for (int i = 0; i < 6; ++i) inv *= 2 - mod.w[0] * inv;
    n0inv = ~inv + 1;  // negate mod 2^64
  }
};

// BN254 base field q and scalar field r (limbs little-endian)
static const FieldCtx FQ(U256{{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL}});
static const FieldCtx FR(U256{{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL}});

static U256 f_add(const FieldCtx &F, const U256 &a, const U256 &b) {
  u64 carry;
  U256 s = u256_add(a, b, &carry);
  if (carry || u256_cmp(s, F.mod) >= 0) {
    s = u256_sub(s, F.mod, nullptr);
  }
  return s;
}

static U256 f_sub(const FieldCtx &F, const U256 &a, const U256 &b) {
  u64 borrow;
  U256 d = u256_sub(a, b, &borrow);
  if (borrow) d = u256_add(d, F.mod, nullptr);
  return d;
}

static U256 f_neg(const FieldCtx &F, const U256 &a) {
  if (u256_is_zero(a)) return a;
  return u256_sub(F.mod, a, nullptr);
}

// CIOS Montgomery multiply (4x64 limbs)
static U256 f_mul(const FieldCtx &F, const U256 &a, const U256 &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 c = 0;
    for (int j = 0; j < 4; ++j) {
      c += (u128)t[j] + (u128)a.w[i] * b.w[j];
      t[j] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[4] = (u64)c;
    t[5] = (u64)(c >> 64);

    u64 m = t[0] * F.n0inv;
    c = (u128)t[0] + (u128)m * F.mod.w[0];
    c >>= 64;
    for (int j = 1; j < 4; ++j) {
      c += (u128)t[j] + (u128)m * F.mod.w[j];
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[3] = (u64)c;
    t[4] = t[5] + (u64)(c >> 64);
    t[5] = 0;
  }
  U256 r{{t[0], t[1], t[2], t[3]}};
  if (t[4] || u256_cmp(r, F.mod) >= 0) r = u256_sub(r, F.mod, nullptr);
  return r;
}

static U256 f_sq(const FieldCtx &F, const U256 &a) { return f_mul(F, a, a); }

static U256 f_to_mont(const FieldCtx &F, const U256 &a) {
  return f_mul(F, a, F.r2);
}

static U256 f_from_mont(const FieldCtx &F, const U256 &a) {
  U256 one_std{{1, 0, 0, 0}};
  return f_mul(F, a, one_std);
}

// Fermat inverse (Montgomery in/out); 0 -> 0.
static U256 f_inv(const FieldCtx &F, const U256 &a) {
  if (u256_is_zero(a)) return a;
  U256 e = u256_sub(F.mod, U256{{2, 0, 0, 0}}, nullptr);
  U256 acc = F.one, base = a;
  for (int i = 0; i < 256; ++i) {
    if ((e.w[i / 64] >> (i % 64)) & 1) acc = f_mul(F, acc, base);
    base = f_sq(F, base);
  }
  return acc;
}

// (q+1)/4 computed from q (q = 3 mod 4): (q >> 2) + 1
static U256 fq_sqrt_exp() {
  U256 e = u256_zero();
  for (int i = 0; i < 4; ++i) {
    e.w[i] = FQ.mod.w[i] >> 2;
    if (i < 3) e.w[i] |= FQ.mod.w[i + 1] << 62;
  }
  return u256_add(e, U256{{1, 0, 0, 0}}, nullptr);
}

// sqrt via a^((q+1)/4) (q = 3 mod 4); returns false if non-residue.
static bool fq_sqrt(const U256 &a_mont, U256 &out_mont) {
  static const U256 E = fq_sqrt_exp();
  U256 acc = FQ.one, base = a_mont;
  for (int i = 0; i < 256; ++i) {
    if ((E.w[i / 64] >> (i % 64)) & 1) acc = f_mul(FQ, acc, base);
    base = f_sq(FQ, base);
  }
  if (!u256_eq(f_sq(FQ, acc), a_mont)) return false;
  out_mont = acc;
  return true;
}

// ---------------------------------------------------------------------------
// G1: projective (X:Y:Z), complete RCB16 formulas (a=0, b3=9), Mont coords
// ---------------------------------------------------------------------------

struct G1 {
  U256 x, y, z;
};

static const u64 B3 = 9;

static U256 fq_small(u64 v) {
  U256 s{{v, 0, 0, 0}};
  return f_to_mont(FQ, s);
}

static G1 g1_identity() { return G1{u256_zero(), FQ.one, u256_zero()}; }

static bool g1_is_identity(const G1 &p) { return u256_is_zero(p.z); }

static U256 B3_MONT;  // initialized lazily
static bool B3_INIT = false;
static inline const U256 &b3_mont() {
  if (!B3_INIT) {
    B3_MONT = fq_small(B3);
    B3_INIT = true;
  }
  return B3_MONT;
}

static G1 g1_add(const G1 &P, const G1 &Q) {
  const FieldCtx &F = FQ;
  U256 t0 = f_mul(F, P.x, Q.x);
  U256 t1 = f_mul(F, P.y, Q.y);
  U256 t2 = f_mul(F, P.z, Q.z);
  U256 t3 = f_add(F, P.x, P.y);
  U256 t4 = f_add(F, Q.x, Q.y);
  t3 = f_mul(F, t3, t4);
  t4 = f_add(F, t0, t1);
  t3 = f_sub(F, t3, t4);
  t4 = f_add(F, P.y, P.z);
  U256 X3 = f_add(F, Q.y, Q.z);
  t4 = f_mul(F, t4, X3);
  X3 = f_add(F, t1, t2);
  t4 = f_sub(F, t4, X3);
  X3 = f_add(F, P.x, P.z);
  U256 Y3 = f_add(F, Q.x, Q.z);
  X3 = f_mul(F, X3, Y3);
  Y3 = f_add(F, t0, t2);
  Y3 = f_sub(F, X3, Y3);
  X3 = f_add(F, t0, t0);
  t0 = f_add(F, X3, t0);
  t2 = f_mul(F, b3_mont(), t2);
  U256 Z3 = f_add(F, t1, t2);
  t1 = f_sub(F, t1, t2);
  Y3 = f_mul(F, b3_mont(), Y3);
  X3 = f_mul(F, t4, Y3);
  t2 = f_mul(F, t3, t1);
  X3 = f_sub(F, t2, X3);
  Y3 = f_mul(F, Y3, t0);
  t1 = f_mul(F, t1, Z3);
  Y3 = f_add(F, t1, Y3);
  t0 = f_mul(F, t0, t3);
  Z3 = f_mul(F, Z3, t4);
  Z3 = f_add(F, Z3, t0);
  return G1{X3, Y3, Z3};
}

static G1 g1_double(const G1 &P) {
  const FieldCtx &F = FQ;
  U256 t0 = f_mul(F, P.y, P.y);
  U256 Z3 = f_add(F, t0, t0);
  Z3 = f_add(F, Z3, Z3);
  Z3 = f_add(F, Z3, Z3);
  U256 t1 = f_mul(F, P.y, P.z);
  U256 t2 = f_mul(F, P.z, P.z);
  t2 = f_mul(F, b3_mont(), t2);
  U256 X3 = f_mul(F, t2, Z3);
  U256 Y3 = f_add(F, t0, t2);
  Z3 = f_mul(F, t1, Z3);
  t1 = f_add(F, t2, t2);
  t2 = f_add(F, t1, t2);
  t0 = f_sub(F, t0, t2);
  Y3 = f_mul(F, t0, Y3);
  Y3 = f_add(F, X3, Y3);
  t1 = f_mul(F, P.x, P.y);
  X3 = f_mul(F, t0, t1);
  X3 = f_add(F, X3, X3);
  return G1{X3, Y3, Z3};
}

static G1 g1_neg(const G1 &P) { return G1{P.x, f_neg(FQ, P.y), P.z}; }

static G1 g1_scalar_mul(const G1 &P, const U256 &k) {
  G1 acc = g1_identity();
  for (int i = 255; i >= 0; --i) {
    acc = g1_double(acc);
    if ((k.w[i / 64] >> (i % 64)) & 1) acc = g1_add(acc, P);
  }
  return acc;
}

// affine I/O: (x, y) standard form; (0, 0) = infinity
static G1 g1_from_affine_bytes(const std::uint8_t *xy) {
  U256 x, y;
  u256_from_bytes_le(x, xy);
  u256_from_bytes_le(y, xy + 32);
  if (u256_is_zero(x) && u256_is_zero(y)) return g1_identity();
  return G1{f_to_mont(FQ, x), f_to_mont(FQ, y), FQ.one};
}

static void g1_to_affine_bytes(const G1 &P, std::uint8_t *xy) {
  if (g1_is_identity(P)) {
    std::memset(xy, 0, 64);
    return;
  }
  U256 zinv = f_inv(FQ, P.z);
  U256 x = f_from_mont(FQ, f_mul(FQ, P.x, zinv));
  U256 y = f_from_mont(FQ, f_mul(FQ, P.y, zinv));
  u256_to_bytes_le(x, xy);
  u256_to_bytes_le(y, xy + 32);
}

// ---------------------------------------------------------------------------
// SHA-256 (compact, for hash-to-curve CRS generation)
// ---------------------------------------------------------------------------

namespace sha256 {
static const std::uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline std::uint32_t rotr(std::uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

static void digest(const std::uint8_t *msg, std::size_t len,
                   std::uint8_t out[32]) {
  std::uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                        0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  std::vector<std::uint8_t> padded(msg, msg + len);
  padded.push_back(0x80);
  while (padded.size() % 64 != 56) padded.push_back(0);
  u64 bits = (u64)len * 8;
  for (int i = 7; i >= 0; --i) padded.push_back((std::uint8_t)(bits >> (i * 8)));

  for (std::size_t blk = 0; blk < padded.size(); blk += 64) {
    std::uint32_t w[64];
    for (int i = 0; i < 16; ++i)
      w[i] = (padded[blk + 4 * i] << 24) | (padded[blk + 4 * i + 1] << 16) |
             (padded[blk + 4 * i + 2] << 8) | padded[blk + 4 * i + 3];
    for (int i = 16; i < 64; ++i) {
      std::uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
      std::uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    std::uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
                  g = h[6], hh = h[7];
    for (int i = 0; i < 64; ++i) {
      std::uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
      std::uint32_t ch = (e & f) ^ (~e & g);
      std::uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      std::uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
      std::uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
      std::uint32_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }
  for (int i = 0; i < 8; ++i) {
    out[4 * i] = (std::uint8_t)(h[i] >> 24);
    out[4 * i + 1] = (std::uint8_t)(h[i] >> 16);
    out[4 * i + 2] = (std::uint8_t)(h[i] >> 8);
    out[4 * i + 3] = (std::uint8_t)h[i];
  }
}
}  // namespace sha256

// ---------------------------------------------------------------------------
// BN254 tower fields Fq2 / Fq6 / Fq12 and the optimal-ate pairing.
//
// Structurally mirrors hostmath/{field,pairing}.py (the vector-checked
// python oracle) so results are identical by construction; the only
// algorithmic differences are (a) tower inversion formulas instead of
// Fermat pow for the per-line inverses, and (b) Montgomery u64x4 limbs.
// Used by KZG verify (kzg/mod.rs:182-186 calls arkworks' pairing; this is
// the framework's native equivalent — two pairings per verify, host-side).
// ---------------------------------------------------------------------------

struct Fq2 {
  U256 c0, c1;  // c0 + c1*u, u^2 = -1; Montgomery form
};

static inline Fq2 fq2_zero() { return Fq2{u256_zero(), u256_zero()}; }
static inline Fq2 fq2_one() { return Fq2{FQ.one, u256_zero()}; }
static inline bool fq2_is_zero(const Fq2 &a) {
  return u256_is_zero(a.c0) && u256_is_zero(a.c1);
}
static inline bool fq2_eq(const Fq2 &a, const Fq2 &b) {
  return u256_eq(a.c0, b.c0) && u256_eq(a.c1, b.c1);
}
static inline Fq2 fq2_add(const Fq2 &a, const Fq2 &b) {
  return Fq2{f_add(FQ, a.c0, b.c0), f_add(FQ, a.c1, b.c1)};
}
static inline Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) {
  return Fq2{f_sub(FQ, a.c0, b.c0), f_sub(FQ, a.c1, b.c1)};
}
static inline Fq2 fq2_neg(const Fq2 &a) {
  return Fq2{f_neg(FQ, a.c0), f_neg(FQ, a.c1)};
}
static inline Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
  // Karatsuba: (a0b0 - a1b1) + ((a0+a1)(b0+b1) - a0b0 - a1b1) u
  U256 t0 = f_mul(FQ, a.c0, b.c0);
  U256 t1 = f_mul(FQ, a.c1, b.c1);
  U256 s = f_mul(FQ, f_add(FQ, a.c0, a.c1), f_add(FQ, b.c0, b.c1));
  return Fq2{f_sub(FQ, t0, t1), f_sub(FQ, f_sub(FQ, s, t0), t1)};
}
static inline Fq2 fq2_sq(const Fq2 &a) {
  // complex squaring: (a0+a1)(a0-a1) + (2 a0 a1) u
  U256 t = f_mul(FQ, a.c0, a.c1);
  return Fq2{f_mul(FQ, f_add(FQ, a.c0, a.c1), f_sub(FQ, a.c0, a.c1)),
             f_add(FQ, t, t)};
}
static inline Fq2 fq2_conj(const Fq2 &a) { return Fq2{a.c0, f_neg(FQ, a.c1)}; }
// pow by wide little-endian u64 exponent (used once at init for the
// Frobenius gamma constants)
static Fq2 fq2_pow(const Fq2 &a, const u64 *e, int nwords) {
  Fq2 acc = fq2_one(), base = a;
  for (int w = 0; w < nwords; ++w)
    for (int b = 0; b < 64; ++b) {
      if ((e[w] >> b) & 1) acc = fq2_mul(acc, base);
      base = fq2_sq(base);
    }
  return acc;
}
// multiply by xi = 9 + u: (9a0 - a1) + (9a1 + a0) u
static inline Fq2 fq2_mul_xi(const Fq2 &a) {
  U256 a0x8 = f_add(FQ, a.c0, a.c0);
  a0x8 = f_add(FQ, a0x8, a0x8);
  a0x8 = f_add(FQ, a0x8, a0x8);
  U256 nine_a0 = f_add(FQ, a0x8, a.c0);
  U256 a1x8 = f_add(FQ, a.c1, a.c1);
  a1x8 = f_add(FQ, a1x8, a1x8);
  a1x8 = f_add(FQ, a1x8, a1x8);
  U256 nine_a1 = f_add(FQ, a1x8, a.c1);
  return Fq2{f_sub(FQ, nine_a0, a.c1), f_add(FQ, nine_a1, a.c0)};
}
static inline Fq2 fq2_inv(const Fq2 &a) {
  // 1/(a + bu) = (a - bu) / (a^2 + b^2)
  U256 norm = f_add(FQ, f_sq(FQ, a.c0), f_sq(FQ, a.c1));
  U256 n = f_inv(FQ, norm);
  return Fq2{f_mul(FQ, a.c0, n), f_neg(FQ, f_mul(FQ, a.c1, n))};
}

struct Fq6 {
  Fq2 c0, c1, c2;  // c0 + c1*v + c2*v^2, v^3 = xi
};

static inline Fq6 fq6_zero() { return Fq6{fq2_zero(), fq2_zero(), fq2_zero()}; }
static inline Fq6 fq6_one() { return Fq6{fq2_one(), fq2_zero(), fq2_zero()}; }
static inline bool fq6_eq(const Fq6 &a, const Fq6 &b) {
  return fq2_eq(a.c0, b.c0) && fq2_eq(a.c1, b.c1) && fq2_eq(a.c2, b.c2);
}
static inline Fq6 fq6_add(const Fq6 &a, const Fq6 &b) {
  return Fq6{fq2_add(a.c0, b.c0), fq2_add(a.c1, b.c1), fq2_add(a.c2, b.c2)};
}
static inline Fq6 fq6_sub(const Fq6 &a, const Fq6 &b) {
  return Fq6{fq2_sub(a.c0, b.c0), fq2_sub(a.c1, b.c1), fq2_sub(a.c2, b.c2)};
}
static inline Fq6 fq6_neg(const Fq6 &a) {
  return Fq6{fq2_neg(a.c0), fq2_neg(a.c1), fq2_neg(a.c2)};
}
static Fq6 fq6_mul(const Fq6 &a, const Fq6 &b) {
  // Karatsuba-3 with xi wrap (same formulas as hostmath Fq6.__mul__)
  Fq2 t0 = fq2_mul(a.c0, b.c0);
  Fq2 t1 = fq2_mul(a.c1, b.c1);
  Fq2 t2 = fq2_mul(a.c2, b.c2);
  Fq2 s12 = fq2_mul(fq2_add(a.c1, a.c2), fq2_add(b.c1, b.c2));
  Fq2 c0 = fq2_add(t0, fq2_mul_xi(fq2_sub(fq2_sub(s12, t1), t2)));
  Fq2 s01 = fq2_mul(fq2_add(a.c0, a.c1), fq2_add(b.c0, b.c1));
  Fq2 c1 = fq2_add(fq2_sub(fq2_sub(s01, t0), t1), fq2_mul_xi(t2));
  Fq2 s02 = fq2_mul(fq2_add(a.c0, a.c2), fq2_add(b.c0, b.c2));
  Fq2 c2 = fq2_add(fq2_sub(fq2_sub(s02, t0), t2), t1);
  return Fq6{c0, c1, c2};
}
// multiply by v (shift with xi wrap)
static inline Fq6 fq6_mul_by_v(const Fq6 &a) {
  return Fq6{fq2_mul_xi(a.c2), a.c0, a.c1};
}
static Fq6 fq6_inv(const Fq6 &a) {
  Fq2 t0 = fq2_sub(fq2_sq(a.c0), fq2_mul_xi(fq2_mul(a.c1, a.c2)));
  Fq2 t1 = fq2_sub(fq2_mul_xi(fq2_sq(a.c2)), fq2_mul(a.c0, a.c1));
  Fq2 t2 = fq2_sub(fq2_sq(a.c1), fq2_mul(a.c0, a.c2));
  Fq2 norm = fq2_add(fq2_mul(a.c0, t0),
                     fq2_add(fq2_mul_xi(fq2_mul(a.c2, t1)),
                             fq2_mul_xi(fq2_mul(a.c1, t2))));
  Fq2 n = fq2_inv(norm);
  return Fq6{fq2_mul(t0, n), fq2_mul(t1, n), fq2_mul(t2, n)};
}

struct Fq12 {
  Fq6 c0, c1;  // c0 + c1*w, w^2 = v
};

static inline Fq12 fq12_one() { return Fq12{fq6_one(), fq6_zero()}; }
static inline bool fq12_eq(const Fq12 &a, const Fq12 &b) {
  return fq6_eq(a.c0, b.c0) && fq6_eq(a.c1, b.c1);
}
static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
  Fq6 t0 = fq6_mul(a.c0, b.c0);
  Fq6 t1 = fq6_mul(a.c1, b.c1);
  Fq6 c0 = fq6_add(t0, fq6_mul_by_v(t1));
  Fq6 s = fq6_mul(fq6_add(a.c0, a.c1), fq6_add(b.c0, b.c1));
  Fq6 c1 = fq6_sub(fq6_sub(s, t0), t1);
  return Fq12{c0, c1};
}
static inline Fq12 fq12_sq(const Fq12 &a) {
  // complex squaring over Fq6: c0' = (c0+c1)(c0+v*c1) - t - v*t, c1' = 2t
  Fq6 t = fq6_mul(a.c0, a.c1);
  Fq6 s = fq6_mul(fq6_add(a.c0, a.c1), fq6_add(a.c0, fq6_mul_by_v(a.c1)));
  Fq6 c0 = fq6_sub(fq6_sub(s, t), fq6_mul_by_v(t));
  return Fq12{c0, fq6_add(t, t)};
}
static inline Fq12 fq12_conj(const Fq12 &a) { return Fq12{a.c0, fq6_neg(a.c1)}; }
static Fq12 fq12_inv(const Fq12 &a) {
  Fq6 norm = fq6_sub(fq6_mul(a.c0, a.c0), fq6_mul_by_v(fq6_mul(a.c1, a.c1)));
  Fq6 n = fq6_inv(norm);
  return Fq12{fq6_mul(a.c0, n), fq6_neg(fq6_mul(a.c1, n))};
}
static inline Fq12 fq12_sub(const Fq12 &a, const Fq12 &b) {
  return Fq12{fq6_sub(a.c0, b.c0), fq6_sub(a.c1, b.c1)};
}
// pow by a wide little-endian u64 exponent (MSB-first square-and-multiply)
static Fq12 fq12_pow(const Fq12 &a, const u64 *e, int nwords) {
  int top = nwords - 1;
  while (top >= 0 && e[top] == 0) --top;
  if (top < 0) return fq12_one();
  int bit = 63;
  while (!((e[top] >> bit) & 1)) --bit;
  Fq12 acc = a;
  for (int w = top; w >= 0; --w) {
    for (int b = (w == top ? bit - 1 : 63); b >= 0; --b) {
      acc = fq12_sq(acc);
      if ((e[w] >> b) & 1) acc = fq12_mul(acc, a);
    }
  }
  return acc;
}

// pairing exponents (see docs: generated from params.py Q/R)
static const u64 EXP_Q[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                             0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// (q - 1) / 6
static const u64 EXP_QM1_D6[4] = {0x34b017592414d4e1ULL, 0xee9591c2e6bda1c2ULL,
                                  0xf40d60f3c0403964ULL, 0x0810b7bdd032f006ULL};

// Frobenius x -> x^q on the tower, coefficient-wise: conjugate each Fq2
// coefficient and scale by gamma_i = xi^(i*(q-1)/6) for basis element
// v^(i/2) w^(i%2) (i = lane index 0..5). Computed once at init; validated
// against the generic pow path by the python bit-exactness tests.
struct FrobCtx {
  Fq2 g[6];  // g[i] = xi^(i*(q-1)/6)
  FrobCtx() {
    Fq2 xi{fq_small(9), FQ.one};
    g[0] = fq2_one();
    g[1] = fq2_pow(xi, EXP_QM1_D6, 4);
    for (int i = 2; i < 6; ++i) g[i] = fq2_mul(g[i - 1], g[1]);
  }
};
static const FrobCtx FROB;

static inline Fq12 fq12_frobenius(const Fq12 &a) {
  // lanes: c0 = (b0 + b1 v + b2 v^2), c1 w = (b3 + b4 v + b5 v^2) w
  // v^q = g2 v, (v^2)^q = g4 v^2, w^q = g1 w, (v w)^q = g3 v w, (v^2 w)^q = g5 v^2 w
  return Fq12{
      Fq6{fq2_conj(a.c0.c0), fq2_mul(fq2_conj(a.c0.c1), FROB.g[2]),
          fq2_mul(fq2_conj(a.c0.c2), FROB.g[4])},
      Fq6{fq2_mul(fq2_conj(a.c1.c0), FROB.g[1]),
          fq2_mul(fq2_conj(a.c1.c1), FROB.g[3]),
          fq2_mul(fq2_conj(a.c1.c2), FROB.g[5])}};
}
// Q^2
static const u64 EXP_Q2[8] = {0x3b5458a2275d69b1ULL, 0xa602072d09eac101ULL,
                              0x4a50189c6d96cadcULL, 0x04689e957a1242c8ULL,
                              0x26edfa5c34c6b38dULL, 0xb00b855116375606ULL,
                              0x599a6f7c0348d21cULL, 0x0925c4b8763cbf9cULL};
// (Q^4 - Q^2 + 1) / R  (761 bits)
static const u64 EXP_HARD[12] = {
    0xe81bb482ccdf42b1ULL, 0x5abf5cc4f49c36d4ULL, 0xf1154e7e1da014fdULL,
    0xdcc7b44c87cdbacfULL, 0xaaa441e3954bcf8aULL, 0x6b887d56d5095f23ULL,
    0x79581e16f3fd90c6ULL, 0x3b1b1355d189227dULL, 0x4e529a5861876f6bULL,
    0x6c0eb522d5b12278ULL, 0x331ec15183177fafULL, 0x01baaa710b0759adULL};
// ate loop count 6x+2 = 29793968203157093288 (65 bits; top bit implicit)
static const u64 ATE_LOW = 0x9d797039be763ba8ULL;
static const int ATE_BITS = 65;

// Point of E(Fq12) in affine coords + infinity flag (mirrors the python
// (x, y) tuples / None).
struct E12 {
  Fq12 x, y;
  bool inf;
};

// untwist E'(Fq2) -> E(Fq12): (x, y) -> (v*x at c0.c1, w^3*y at c1.c1)
static E12 untwist(const Fq2 &x, const Fq2 &y) {
  E12 r;
  r.x.c0 = Fq6{fq2_zero(), x, fq2_zero()};
  r.x.c1 = fq6_zero();
  r.y.c0 = fq6_zero();
  r.y.c1 = Fq6{fq2_zero(), y, fq2_zero()};
  r.inf = false;
  return r;
}

static E12 embed_g1(const U256 &x_mont, const U256 &y_mont) {
  E12 r;
  r.x = Fq12{Fq6{Fq2{x_mont, u256_zero()}, fq2_zero(), fq2_zero()}, fq6_zero()};
  r.y = Fq12{Fq6{Fq2{y_mont, u256_zero()}, fq2_zero(), fq2_zero()}, fq6_zero()};
  r.inf = false;
  return r;
}

static E12 frob_point(const E12 &pt) {
  return E12{fq12_frobenius(pt.x), fq12_frobenius(pt.y), pt.inf};
}

// one Miller step: line through t and q evaluated at p, AND t <- t + q,
// sharing the single lambda/inversion both need (line_eval/add_e12 fused;
// lambda is identical in both, so results are unchanged)
static Fq12 step_eval(E12 &t, const E12 &q, const E12 &p) {
  Fq12 lam;
  if (fq12_eq(t.x, q.x) && fq12_eq(t.y, q.y)) {
    Fq12 x2 = fq12_sq(t.x);
    Fq12 three_x2 = fq12_mul(x2, Fq12{Fq6{Fq2{fq_small(3), u256_zero()},
                                          fq2_zero(), fq2_zero()},
                                      fq6_zero()});
    lam = fq12_mul(three_x2, fq12_inv(Fq12{fq6_add(t.y.c0, t.y.c0),
                                           fq6_add(t.y.c1, t.y.c1)}));
  } else if (fq12_eq(t.x, q.x)) {
    Fq12 line = fq12_sub(p.x, t.x);  // vertical
    t.inf = true;
    return line;
  } else {
    lam = fq12_mul(fq12_sub(q.y, t.y), fq12_inv(fq12_sub(q.x, t.x)));
  }
  Fq12 line = fq12_sub(fq12_sub(p.y, t.y), fq12_mul(lam, fq12_sub(p.x, t.x)));
  Fq12 x3 = fq12_sub(fq12_sub(fq12_sq(lam), t.x), q.x);
  Fq12 y3 = fq12_sub(fq12_mul(lam, fq12_sub(t.x, x3)), t.y);
  t = E12{x3, y3, false};
  return line;
}

// f_{6x+2,Q}(P) with the two optimal-ate correction lines
// (hostmath/pairing.py::miller_loop, same bit order: MSB-first, top skipped)
static Fq12 miller_loop(const E12 &pe, const E12 &qe) {
  Fq12 f = fq12_one();
  E12 t = qe;
  for (int i = ATE_BITS - 2; i >= 0; --i) {
    f = fq12_mul(fq12_sq(f), step_eval(t, t, pe));
    int bit = i >= 64 ? 0 : (int)((ATE_LOW >> i) & 1);
    if (bit) f = fq12_mul(f, step_eval(t, qe, pe));
  }
  E12 q1 = frob_point(qe);
  E12 q2 = frob_point(q1);
  E12 nq2 = E12{q2.x, fq12_sub(Fq12{fq6_zero(), fq6_zero()}, q2.y), false};
  f = fq12_mul(f, step_eval(t, q1, pe));
  f = fq12_mul(f, step_eval(t, nq2, pe));
  return f;
}

// f^((q^12-1)/r): easy part by conjugate/inverse + ^(q^2+1), hard part by
// plain wide pow (hostmath/pairing.py::final_exponentiation)
static Fq12 final_exponentiation(const Fq12 &f) {
  Fq12 f1 = fq12_mul(fq12_conj(f), fq12_inv(f));      // ^(q^6 - 1)
  Fq12 f2 = fq12_mul(fq12_pow(f1, EXP_Q2, 8), f1);    // ^(q^2 + 1)
  return fq12_pow(f2, EXP_HARD, 12);
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// out_xy: n*64 bytes. Batched scalar mul: out[i] = k[i] * P[i].
void vkzg_g1_scalar_mul_batch(const std::uint8_t *points_xy,
                              const std::uint8_t *scalars, std::size_t n,
                              std::uint8_t *out_xy) {
  for (std::size_t i = 0; i < n; ++i) {
    G1 p = g1_from_affine_bytes(points_xy + 64 * i);
    U256 k;
    u256_from_bytes_le(k, scalars + 32 * i);
    G1 r = g1_scalar_mul(p, k);
    g1_to_affine_bytes(r, out_xy + 64 * i);
  }
}

// Naive serial MSM (reference inner_product semantics, utils.rs:16-19).
void vkzg_g1_msm_naive(const std::uint8_t *points_xy,
                       const std::uint8_t *scalars, std::size_t n,
                       std::uint8_t *out_xy) {
  G1 acc = g1_identity();
  for (std::size_t i = 0; i < n; ++i) {
    G1 p = g1_from_affine_bytes(points_xy + 64 * i);
    U256 k;
    u256_from_bytes_le(k, scalars + 32 * i);
    acc = g1_add(acc, g1_scalar_mul(p, k));
  }
  g1_to_affine_bytes(acc, out_xy);
}

// Pippenger MSM, window c bits.
void vkzg_g1_msm_pippenger(const std::uint8_t *points_xy,
                           const std::uint8_t *scalars, std::size_t n,
                           unsigned c, std::uint8_t *out_xy) {
  if (c < 1) c = 1;
  if (c > 20) c = 20;
  const unsigned windows = (256 + c - 1) / c;
  const std::size_t nbuckets = ((std::size_t)1 << c) - 1;

  std::vector<G1> pts(n);
  std::vector<U256> ks(n);
  for (std::size_t i = 0; i < n; ++i) {
    pts[i] = g1_from_affine_bytes(points_xy + 64 * i);
    u256_from_bytes_le(ks[i], scalars + 32 * i);
  }

  G1 total = g1_identity();
  std::vector<G1> buckets(nbuckets);
  for (int w = windows - 1; w >= 0; --w) {
    for (auto &b : buckets) b = g1_identity();
    for (std::size_t i = 0; i < n; ++i) {
      unsigned bit = w * c;
      u64 digit = 0;
      for (unsigned j = 0; j < c && bit + j < 256; ++j) {
        unsigned idx = bit + j;
        digit |= ((ks[i].w[idx / 64] >> (idx % 64)) & 1) << j;
      }
      if (digit) buckets[digit - 1] = g1_add(buckets[digit - 1], pts[i]);
    }
    G1 running = g1_identity(), wsum = g1_identity();
    for (std::size_t b = nbuckets; b-- > 0;) {
      running = g1_add(running, buckets[b]);
      wsum = g1_add(wsum, running);
    }
    for (unsigned j = 0; j < c; ++j) total = g1_double(total);
    total = g1_add(total, wsum);
  }
  g1_to_affine_bytes(total, out_xy);
}

// SHA-256(domain || msg) for hash-to-curve parity checks.
void vkzg_sha256(const std::uint8_t *msg, std::size_t len, std::uint8_t *out) {
  sha256::digest(msg, len, out);
}

// Hash-to-curve CRS (IPAPointGenerator::gen semantics): SHA-256(seed || LE
// u64 counter) -> ark from_random_bytes try-and-increment. Returns the
// number of counter values consumed.
u64 vkzg_ipa_crs(const std::uint8_t *seed, std::size_t seed_len,
                 std::size_t num, std::uint8_t *out_xy) {
  std::vector<std::uint8_t> buf(seed, seed + seed_len);
  buf.resize(seed_len + 8);
  std::size_t produced = 0;
  u64 counter = 0;
  while (produced < num) {
    for (int j = 0; j < 8; ++j)
      buf[seed_len + j] = (std::uint8_t)(counter >> (8 * j));
    std::uint8_t digest[32];
    sha256::digest(buf.data(), buf.size(), digest);
    ++counter;

    // ark AffineRepr::from_random_bytes on the 32-byte digest:
    std::uint8_t flags = digest[31] & 0xC0;
    std::uint8_t masked[32];
    std::memcpy(masked, digest, 32);
    masked[31] &= 0x3F;
    U256 x;
    u256_from_bytes_le(x, masked);
    if (u256_cmp(x, FQ.mod) >= 0) continue;
    if (flags == 0xC0) continue;  // both flag bits: invalid
    if (flags == 0x40) {          // infinity flag
      if (!u256_is_zero(x)) continue;
      std::memset(out_xy + 64 * produced, 0, 64);
      ++produced;
      continue;
    }
    // y^2 = x^3 + 3
    U256 xm = f_to_mont(FQ, x);
    U256 rhs = f_add(FQ, f_mul(FQ, f_sq(FQ, xm), xm), fq_small(3));
    U256 ym;
    if (!fq_sqrt(rhs, ym)) continue;
    U256 y = f_from_mont(FQ, ym);
    U256 negy = u256_sub(FQ.mod, y, nullptr);
    if (u256_is_zero(y)) negy = y;
    // greatest = (flags == 0x00): pick the larger y; else the smaller
    U256 pick;
    if (flags == 0x00) pick = (u256_cmp(y, negy) > 0) ? y : negy;
    else pick = (u256_cmp(y, negy) > 0) ? negy : y;
    u256_to_bytes_le(x, out_xy + 64 * produced);
    u256_to_bytes_le(pick, out_xy + 64 * produced + 32);
    ++produced;
  }
  return counter;
}

// Monomial SRS [s^i G] for the KZG test generator.
void vkzg_kzg_srs(const std::uint8_t *g_xy, const std::uint8_t *secret,
                  std::size_t num, std::uint8_t *out_xy) {
  G1 g = g1_from_affine_bytes(g_xy);
  U256 s_std;
  u256_from_bytes_le(s_std, secret);
  U256 s = f_to_mont(FR, s_std);
  U256 pow = FR.one;  // s^0 in Mont form
  for (std::size_t i = 0; i < num; ++i) {
    U256 k = f_from_mont(FR, pow);
    G1 r = g1_scalar_mul(g, k);
    g1_to_affine_bytes(r, out_xy + 64 * i);
    pow = f_mul(FR, pow, s);
  }
}

// Product of n pairings with one shared final exponentiation
// (hostmath/pairing.py::multi_pairing; arkworks Pairing::multi_pairing).
//   g1s:  n * 64 bytes  — affine (x||y) LE, all-zero = infinity (skip pair)
//   g2s:  n * 128 bytes — affine (x.c0||x.c1||y.c0||y.c1) LE, all-zero = inf
//   out:  384 bytes — Fq12 standard-form coefficients, 12 * 32-byte LE Fq in
//         order c0.c0.c0, c0.c0.c1, c0.c1.c0, ..., c1.c2.c1
void vkzg_multi_pairing(const std::uint8_t *g1s, const std::uint8_t *g2s,
                        std::size_t n, std::uint8_t *out) {
  Fq12 f = fq12_one();
  for (std::size_t i = 0; i < n; ++i) {
    const std::uint8_t *p = g1s + 64 * i;
    const std::uint8_t *q = g2s + 128 * i;
    bool p_inf = true, q_inf = true;
    for (int j = 0; j < 64; ++j) p_inf &= (p[j] == 0);
    for (int j = 0; j < 128; ++j) q_inf &= (q[j] == 0);
    if (p_inf || q_inf) continue;  // e(O, .) = e(., O) = 1
    U256 px, py;
    u256_from_bytes_le(px, p);
    u256_from_bytes_le(py, p + 32);
    E12 pe = embed_g1(f_to_mont(FQ, px), f_to_mont(FQ, py));
    U256 xc0, xc1, yc0, yc1;
    u256_from_bytes_le(xc0, q);
    u256_from_bytes_le(xc1, q + 32);
    u256_from_bytes_le(yc0, q + 64);
    u256_from_bytes_le(yc1, q + 96);
    E12 qe = untwist(Fq2{f_to_mont(FQ, xc0), f_to_mont(FQ, xc1)},
                     Fq2{f_to_mont(FQ, yc0), f_to_mont(FQ, yc1)});
    f = fq12_mul(f, miller_loop(pe, qe));
  }
  f = final_exponentiation(f);
  const Fq2 *pairs[6] = {&f.c0.c0, &f.c0.c1, &f.c0.c2,
                         &f.c1.c0, &f.c1.c1, &f.c1.c2};
  for (int i = 0; i < 6; ++i) {
    u256_to_bytes_le(f_from_mont(FQ, pairs[i]->c0), out + 64 * i);
    u256_to_bytes_le(f_from_mont(FQ, pairs[i]->c1), out + 64 * i + 32);
  }
}

}  // extern "C"
