/* constantine_tpu host-native C ABI.
 *
 * The TPU-native framework keeps all field/EC/polynomial compute on the
 * accelerator (JAX/XLA/Pallas); this library is the host-side native
 * runtime for the byte-oriented work that feeds it: cryptographic hashing
 * (Fiat-Shamir transcripts, hash-to-curve expansion, codecs) and bulk
 * serialization between big-endian byte strings and the planar 16-bit-limb
 * arrays the device kernels consume.
 *
 * It is the analogue of the reference's native layers:
 *   - constantine/hashes/*.nim (SHA-256, Keccak, RIPEMD-160)
 *   - constantine/serialization/io_limbs.nim (marshal/unmarshal)
 *   - bindings/ + include/constantine.h (C ABI export surface)
 *
 * All functions are thread-safe and allocation-free on the hot path.
 * Status codes: 0 = ok, negative = error.
 */

#ifndef CONSTANTINE_TPU_H
#define CONSTANTINE_TPU_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

#define CTT_TPU_ABI_VERSION 1

int ctt_abi_version(void);

/* ---- one-shot hashes -------------------------------------------------- */

/* out: 32 bytes */
void ctt_sha256(const uint8_t *data, size_t len, uint8_t *out);
/* out: 32 bytes (Ethereum Keccak-256, pad 0x01) */
void ctt_keccak256(const uint8_t *data, size_t len, uint8_t *out);
/* out: 32 bytes (FIPS SHA3-256, pad 0x06) */
void ctt_sha3_256(const uint8_t *data, size_t len, uint8_t *out);
/* out: 20 bytes */
void ctt_ripemd160(const uint8_t *data, size_t len, uint8_t *out);
/* out: 32 bytes */
void ctt_hmac_sha256(const uint8_t *key, size_t keylen,
                     const uint8_t *msg, size_t msglen, uint8_t *out);

/* ---- streaming SHA-256 (reference: hashes/h_sha256.nim update/finish) -- */

typedef struct {
  uint32_t h[8];
  uint8_t buf[64];
  uint64_t bytelen;
  uint32_t buffill;
} ctt_sha256_ctx;

void ctt_sha256_init(ctt_sha256_ctx *ctx);
void ctt_sha256_update(ctt_sha256_ctx *ctx, const uint8_t *data, size_t len);
void ctt_sha256_finish(ctt_sha256_ctx *ctx, uint8_t *out /* 32 bytes */);

/* ---- batch hashing (lane-parallel host work, OpenMP-free simple loop) -- */

/* n messages of equal stride `len` bytes each; out: n * 32 bytes */
void ctt_sha256_batch(const uint8_t *data, size_t len, size_t n,
                      uint8_t *out);

/* ---- bulk serialization ------------------------------------------------ */

/* n big-endian `nbytes`-wide integers (concatenated) -> n * L uint32
 * little-endian 16-bit limbs (row-major (n, L)). Returns 0, or -1 if
 * nbytes is odd or 2*L < nbytes. */
int ctt_bytes_be_to_limbs(const uint8_t *data, size_t nbytes, size_t n,
                          uint32_t *limbs, size_t L);

/* inverse: (n, L) limbs -> n big-endian nbytes-wide integers.
 * Limbs beyond nbytes/2 are ignored. Returns 0 or -1. */
int ctt_limbs_to_bytes_be(const uint32_t *limbs, size_t L, size_t n,
                          uint8_t *data, size_t nbytes);

/* canonicality check: value < modulus (both as L little-endian 16-bit
 * limbs), batched. ok[i] = 1 if limbs[i] < modulus. */
void ctt_limbs_lt_modulus(const uint32_t *limbs, const uint32_t *modulus,
                          size_t L, size_t n, uint8_t *ok);

#ifdef __cplusplus
}
#endif

#endif /* CONSTANTINE_TPU_H */
