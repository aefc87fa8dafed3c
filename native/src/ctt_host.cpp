// constantine_tpu host-native runtime: hashes + bulk serialization.
//
// From-scratch C++ implementations designed for the TPU framework's host
// path; behavioral parity targets (verified by tests/test_native.py
// differential tests against hashlib and the pure-python fallbacks):
//   SHA-256: FIPS 180-4           (reference: hashes/sha256/*.nim)
//   Keccak-256 / SHA3-256: FIPS 202 (reference: hashes/keccak/*.nim)
//   RIPEMD-160                     (reference: hashes/ripemd160/*.nim)
//   limb marshalling               (reference: serialization/io_limbs.nim)

#include "../include/constantine_tpu.h"

#include <cstring>

// ---------------------------------------------------------------------------
// SHA-256
// ---------------------------------------------------------------------------

namespace {

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

const uint32_t K256[64] = {
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

void sha256_compress(uint32_t h[8], const uint8_t block[64]) {
  uint32_t w[64];
  for (int i = 0; i < 16; i++)
    w[i] = (uint32_t(block[4 * i]) << 24) | (uint32_t(block[4 * i + 1]) << 16) |
           (uint32_t(block[4 * i + 2]) << 8) | uint32_t(block[4 * i + 3]);
  for (int i = 16; i < 64; i++) {
    uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
    uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  uint32_t a = h[0], b = h[1], c = h[2], d = h[3];
  uint32_t e = h[4], f = h[5], g = h[6], hh = h[7];
  for (int i = 0; i < 64; i++) {
    uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = hh + S1 + ch + K256[i] + w[i];
    uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
    uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
    uint32_t t2 = S0 + maj;
    hh = g; g = f; f = e; e = d + t1;
    d = c; c = b; b = a; a = t1 + t2;
  }
  h[0] += a; h[1] += b; h[2] += c; h[3] += d;
  h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
}

}  // namespace

extern "C" {

int ctt_abi_version(void) { return CTT_TPU_ABI_VERSION; }

void ctt_sha256_init(ctt_sha256_ctx *ctx) {
  static const uint32_t iv[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                 0xa54ff53a, 0x510e527f, 0x9b05688c,
                                 0x1f83d9ab, 0x5be0cd19};
  std::memcpy(ctx->h, iv, sizeof(iv));
  ctx->bytelen = 0;
  ctx->buffill = 0;
}

void ctt_sha256_update(ctt_sha256_ctx *ctx, const uint8_t *data, size_t len) {
  ctx->bytelen += len;
  if (ctx->buffill) {
    size_t take = 64 - ctx->buffill;
    if (take > len) take = len;
    std::memcpy(ctx->buf + ctx->buffill, data, take);
    ctx->buffill += (uint32_t)take;
    data += take;
    len -= take;
    if (ctx->buffill == 64) {
      sha256_compress(ctx->h, ctx->buf);
      ctx->buffill = 0;
    }
  }
  while (len >= 64) {
    sha256_compress(ctx->h, data);
    data += 64;
    len -= 64;
  }
  if (len) {
    std::memcpy(ctx->buf, data, len);
    ctx->buffill = (uint32_t)len;
  }
}

void ctt_sha256_finish(ctt_sha256_ctx *ctx, uint8_t *out) {
  uint64_t bitlen = ctx->bytelen * 8;
  uint8_t pad = 0x80;
  ctt_sha256_update(ctx, &pad, 1);
  uint8_t zero[64] = {0};
  size_t padlen = (ctx->buffill <= 56) ? 56 - ctx->buffill
                                       : 64 + 56 - ctx->buffill;
  ctt_sha256_update(ctx, zero, padlen);
  uint8_t lenb[8];
  for (int i = 0; i < 8; i++) lenb[i] = (uint8_t)(bitlen >> (56 - 8 * i));
  // bypass bytelen accounting for the length block
  std::memcpy(ctx->buf + ctx->buffill, lenb, 8);
  sha256_compress(ctx->h, ctx->buf);
  for (int i = 0; i < 8; i++) {
    out[4 * i] = (uint8_t)(ctx->h[i] >> 24);
    out[4 * i + 1] = (uint8_t)(ctx->h[i] >> 16);
    out[4 * i + 2] = (uint8_t)(ctx->h[i] >> 8);
    out[4 * i + 3] = (uint8_t)(ctx->h[i]);
  }
}

void ctt_sha256(const uint8_t *data, size_t len, uint8_t *out) {
  ctt_sha256_ctx ctx;
  ctt_sha256_init(&ctx);
  ctt_sha256_update(&ctx, data, len);
  ctt_sha256_finish(&ctx, out);
}

void ctt_sha256_batch(const uint8_t *data, size_t len, size_t n,
                      uint8_t *out) {
  for (size_t i = 0; i < n; i++)
    ctt_sha256(data + i * len, len, out + i * 32);
}

void ctt_hmac_sha256(const uint8_t *key, size_t keylen, const uint8_t *msg,
                     size_t msglen, uint8_t *out) {
  uint8_t k[64] = {0};
  if (keylen > 64) {
    ctt_sha256(key, keylen, k);  // first 32 bytes, rest zero
  } else {
    std::memcpy(k, key, keylen);
  }
  uint8_t ipad[64], opad[64];
  for (int i = 0; i < 64; i++) {
    ipad[i] = k[i] ^ 0x36;
    opad[i] = k[i] ^ 0x5c;
  }
  ctt_sha256_ctx ctx;
  uint8_t inner[32];
  ctt_sha256_init(&ctx);
  ctt_sha256_update(&ctx, ipad, 64);
  ctt_sha256_update(&ctx, msg, msglen);
  ctt_sha256_finish(&ctx, inner);
  ctt_sha256_init(&ctx);
  ctt_sha256_update(&ctx, opad, 64);
  ctt_sha256_update(&ctx, inner, 32);
  ctt_sha256_finish(&ctx, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Keccak (FIPS 202 permutation; Ethereum pad 0x01 / SHA3 pad 0x06)
// ---------------------------------------------------------------------------

namespace {

inline uint64_t rotl64(uint64_t x, int n) {
  return (x << n) | (x >> (64 - n));
}

const uint64_t KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

const int KECCAK_ROT[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55, 20, 3,  10, 43,
                            25, 39, 41, 45, 15, 21, 8,  18, 2,  61, 56, 14};

void keccak_f(uint64_t st[25]) {
  for (int round = 0; round < 24; round++) {
    uint64_t bc[5], t;
    // theta
    for (int i = 0; i < 5; i++)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; i++) {
      t = bc[(i + 4) % 5] ^ rotl64(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    uint64_t b[25];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        b[dst] = rotl64(st[src], KECCAK_ROT[src]);
      }
    // chi
    for (int j = 0; j < 25; j += 5)
      for (int i = 0; i < 5; i++)
        st[j + i] = b[j + i] ^ ((~b[j + (i + 1) % 5]) & b[j + (i + 2) % 5]);
    // iota
    st[0] ^= KECCAK_RC[round];
  }
}

void keccak256_pad(const uint8_t *data, size_t len, uint8_t pad,
                   uint8_t *out) {
  const size_t rate = 136;  // 1088-bit rate for 256-bit output
  uint64_t st[25] = {0};
  while (len >= rate) {
    for (size_t i = 0; i < rate / 8; i++) {
      uint64_t v = 0;
      std::memcpy(&v, data + 8 * i, 8);  // little-endian hosts
      st[i] ^= v;
    }
    keccak_f(st);
    data += rate;
    len -= rate;
  }
  uint8_t last[136] = {0};
  std::memcpy(last, data, len);
  last[len] ^= pad;
  last[rate - 1] ^= 0x80;
  for (size_t i = 0; i < rate / 8; i++) {
    uint64_t v = 0;
    std::memcpy(&v, last + 8 * i, 8);
    st[i] ^= v;
  }
  keccak_f(st);
  std::memcpy(out, st, 32);
}

}  // namespace

extern "C" {

void ctt_keccak256(const uint8_t *data, size_t len, uint8_t *out) {
  keccak256_pad(data, len, 0x01, out);
}

void ctt_sha3_256(const uint8_t *data, size_t len, uint8_t *out) {
  keccak256_pad(data, len, 0x06, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// RIPEMD-160
// ---------------------------------------------------------------------------

namespace {

inline uint32_t rotl32(uint32_t x, int n) { return (x << n) | (x >> (32 - n)); }

inline uint32_t rmd_f(int j, uint32_t x, uint32_t y, uint32_t z) {
  if (j < 16) return x ^ y ^ z;
  if (j < 32) return (x & y) | (~x & z);
  if (j < 48) return (x | ~y) ^ z;
  if (j < 64) return (x & z) | (y & ~z);
  return x ^ (y | ~z);
}

const uint32_t RMD_KL[5] = {0, 0x5a827999, 0x6ed9eba1, 0x8f1bbcdc, 0xa953fd4e};
const uint32_t RMD_KR[5] = {0x50a28be6, 0x5c4dd124, 0x6d703ef3, 0x7a6d76e9, 0};
const int RMD_RL[80] = {0, 1, 2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13,
                        14, 15, 7, 4,  13, 1,  10, 6,  15, 3,  12, 0,  9,  5,
                        2,  14, 11, 8, 3,  10, 14, 4,  9,  15, 8,  1,  2,  7,
                        0,  6,  13, 11, 5, 12, 1,  9,  11, 10, 0,  8,  12, 4,
                        13, 3,  7,  15, 14, 5, 6,  2,  4,  0,  5,  9,  7,  12,
                        2,  10, 14, 1,  3,  8,  11, 6, 15, 13};
const int RMD_RR[80] = {5,  14, 7,  0, 9,  2,  11, 4,  13, 6,  15, 8,  1,  10,
                        3,  12, 6,  11, 3, 7,  0,  13, 5,  10, 14, 15, 8,  12,
                        4,  9,  1,  2,  15, 5, 1,  3,  7,  14, 6,  9,  11, 8,
                        12, 2,  10, 0,  4,  13, 8, 6,  4,  1,  3,  11, 15, 0,
                        5,  12, 2,  13, 9,  7,  10, 14, 12, 15, 10, 4,  1,  5,
                        8,  7,  6,  2,  13, 14, 0,  3,  9,  11};
const int RMD_SL[80] = {11, 14, 15, 12, 5,  8,  7,  9,  11, 13, 14, 15, 6,  7,
                        9,  8,  7,  6,  8,  13, 11, 9,  7,  15, 7,  12, 15, 9,
                        11, 7,  13, 12, 11, 13, 6,  7,  14, 9,  13, 15, 14, 8,
                        13, 6,  5,  12, 7,  5,  11, 12, 14, 15, 14, 15, 9,  8,
                        9,  14, 5,  6,  8,  6,  5,  12, 9,  15, 5,  11, 6,  8,
                        13, 12, 5,  12, 13, 14, 11, 8,  5,  6};
const int RMD_SR[80] = {8,  9,  9,  11, 13, 15, 15, 5,  7,  7,  8,  11, 14, 14,
                        12, 6,  9,  13, 15, 7,  12, 8,  9,  11, 7,  7,  12, 7,
                        6,  15, 13, 11, 9,  7,  15, 11, 8,  6,  6,  14, 12, 13,
                        5,  14, 13, 13, 7,  5,  15, 5,  8,  11, 14, 14, 6,  14,
                        6,  9,  12, 9,  12, 5,  15, 8,  8,  5,  12, 9,  12, 5,
                        14, 6,  8,  13, 6,  5,  15, 13, 11, 11};

void rmd_compress(uint32_t h[5], const uint8_t block[64]) {
  uint32_t x[16];
  for (int i = 0; i < 16; i++)
    x[i] = uint32_t(block[4 * i]) | (uint32_t(block[4 * i + 1]) << 8) |
           (uint32_t(block[4 * i + 2]) << 16) |
           (uint32_t(block[4 * i + 3]) << 24);
  uint32_t al = h[0], bl = h[1], cl = h[2], dl = h[3], el = h[4];
  uint32_t ar = h[0], br = h[1], cr = h[2], dr = h[3], er = h[4];
  for (int j = 0; j < 80; j++) {
    uint32_t t = rotl32(al + rmd_f(j, bl, cl, dl) + x[RMD_RL[j]] +
                            RMD_KL[j / 16],
                        RMD_SL[j]) +
                 el;
    al = el; el = dl; dl = rotl32(cl, 10); cl = bl; bl = t;
    t = rotl32(ar + rmd_f(79 - j, br, cr, dr) + x[RMD_RR[j]] + RMD_KR[j / 16],
               RMD_SR[j]) +
        er;
    ar = er; er = dr; dr = rotl32(cr, 10); cr = br; br = t;
  }
  uint32_t t = h[1] + cl + dr;
  h[1] = h[2] + dl + er;
  h[2] = h[3] + el + ar;
  h[3] = h[4] + al + br;
  h[4] = h[0] + bl + cr;
  h[0] = t;
}

}  // namespace

extern "C" {

void ctt_ripemd160(const uint8_t *data, size_t len, uint8_t *out) {
  uint32_t h[5] = {0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476,
                   0xc3d2e1f0};
  uint64_t bitlen = (uint64_t)len * 8;
  while (len >= 64) {
    rmd_compress(h, data);
    data += 64;
    len -= 64;
  }
  uint8_t last[128] = {0};
  std::memcpy(last, data, len);
  last[len] = 0x80;
  size_t total = (len <= 55) ? 64 : 128;
  for (int i = 0; i < 8; i++)
    last[total - 8 + i] = (uint8_t)(bitlen >> (8 * i));  // little-endian
  rmd_compress(h, last);
  if (total == 128) rmd_compress(h, last + 64);
  for (int i = 0; i < 5; i++) {
    out[4 * i] = (uint8_t)(h[i]);
    out[4 * i + 1] = (uint8_t)(h[i] >> 8);
    out[4 * i + 2] = (uint8_t)(h[i] >> 16);
    out[4 * i + 3] = (uint8_t)(h[i] >> 24);
  }
}

// ---------------------------------------------------------------------------
// Bulk serialization (io_limbs analogue)
// ---------------------------------------------------------------------------

int ctt_bytes_be_to_limbs(const uint8_t *data, size_t nbytes, size_t n,
                          uint32_t *limbs, size_t L) {
  if (nbytes % 2 != 0 || 2 * L < nbytes) return -1;
  for (size_t i = 0; i < n; i++) {
    const uint8_t *src = data + i * nbytes;
    uint32_t *dst = limbs + i * L;
    size_t words = nbytes / 2;
    for (size_t w = 0; w < words; w++) {
      // limb w = bytes [nbytes-2w-2, nbytes-2w-1] big-endian
      size_t off = nbytes - 2 * w - 2;
      dst[w] = (uint32_t(src[off]) << 8) | uint32_t(src[off + 1]);
    }
    for (size_t w = words; w < L; w++) dst[w] = 0;
  }
  return 0;
}

int ctt_limbs_to_bytes_be(const uint32_t *limbs, size_t L, size_t n,
                          uint8_t *data, size_t nbytes) {
  if (nbytes % 2 != 0) return -1;
  size_t words = nbytes / 2;
  if (words > L) return -1;
  for (size_t i = 0; i < n; i++) {
    const uint32_t *src = limbs + i * L;
    uint8_t *dst = data + i * nbytes;
    for (size_t w = 0; w < words; w++) {
      size_t off = nbytes - 2 * w - 2;
      dst[off] = (uint8_t)(src[w] >> 8);
      dst[off + 1] = (uint8_t)(src[w]);
    }
  }
  return 0;
}

void ctt_limbs_lt_modulus(const uint32_t *limbs, const uint32_t *modulus,
                          size_t L, size_t n, uint8_t *ok) {
  for (size_t i = 0; i < n; i++) {
    const uint32_t *v = limbs + i * L;
    int lt = 0;
    for (size_t w = L; w-- > 0;) {
      if (v[w] < modulus[w]) { lt = 1; break; }
      if (v[w] > modulus[w]) { lt = 0; break; }
    }
    ok[i] = (uint8_t)lt;
  }
}

}  // extern "C"
