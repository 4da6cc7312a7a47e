/* Keccak-f[1600] sponge (Ethereum keccak256 padding 0x01) — the native
 * transcript/interpreter hot path. The reference gets this from tiny-keccak
 * via snark-verifier; here it is a from-scratch C implementation exposed
 * through ctypes (spectre_tpu/native.py) with a pure-Python fallback.
 *
 * API:
 *   void spectre_keccak256(const uint8_t *in, size_t len, uint8_t out[32]);
 *   void spectre_keccak_batch(const uint8_t *in, size_t stride, size_t n,
 *                             size_t len, uint8_t *out);  // n msgs, same len
 */
#include <stddef.h>
#include <stdint.h>
#include <string.h>

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

#define ROL(x, n) (((x) << (n)) | ((x) >> (64 - (n))))

static void keccakf(uint64_t s[25]) {
    uint64_t bc[5], t;
    for (int round = 0; round < 24; round++) {
        /* theta */
        for (int i = 0; i < 5; i++)
            bc[i] = s[i] ^ s[i + 5] ^ s[i + 10] ^ s[i + 15] ^ s[i + 20];
        for (int i = 0; i < 5; i++) {
            t = bc[(i + 4) % 5] ^ ROL(bc[(i + 1) % 5], 1);
            for (int j = 0; j < 25; j += 5) s[j + i] ^= t;
        }
        /* rho + pi */
        static const int rot[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55,
                                    20, 3,  10, 43, 25, 39, 41, 45, 15,
                                    21, 8,  18, 2,  61, 56, 14};
        static const int pi[25] = {0,  10, 20, 5,  15, 16, 1,  11, 21,
                                   6,  7,  17, 2,  12, 22, 23, 8,  18,
                                   3,  13, 14, 24, 9,  19, 4};
        uint64_t tmp[25];
        for (int i = 0; i < 25; i++) tmp[pi[i]] = ROL(s[i], rot[i]);
        /* chi */
        for (int j = 0; j < 25; j += 5) {
            for (int i = 0; i < 5; i++) bc[i] = tmp[j + i];
            for (int i = 0; i < 5; i++)
                s[j + i] = bc[i] ^ ((~bc[(i + 1) % 5]) & bc[(i + 2) % 5]);
        }
        /* iota */
        s[0] ^= RC[round];
    }
}

void spectre_keccak256(const uint8_t *in, size_t len, uint8_t *out) {
    uint64_t s[25];
    memset(s, 0, sizeof(s));
    const size_t rate = 136;
    while (len >= rate) {
        for (size_t i = 0; i < rate / 8; i++) {
            uint64_t w;
            memcpy(&w, in + 8 * i, 8);
            s[i] ^= w;
        }
        keccakf(s);
        in += rate;
        len -= rate;
    }
    uint8_t last[136];
    memset(last, 0, sizeof(last));
    memcpy(last, in, len);
    last[len] = 0x01;       /* legacy keccak padding (Ethereum) */
    last[rate - 1] |= 0x80;
    for (size_t i = 0; i < rate / 8; i++) {
        uint64_t w;
        memcpy(&w, last + 8 * i, 8);
        s[i] ^= w;
    }
    keccakf(s);
    memcpy(out, s, 32);
}

void spectre_keccak_batch(const uint8_t *in, size_t stride, size_t n,
                          size_t len, uint8_t *out) {
    for (size_t i = 0; i < n; i++)
        spectre_keccak256(in + i * stride, len, out + 32 * i);
}
