/* Native hot loops for the metadata filter engine.
 *
 * The numpy path for a numeric predicate materializes a 1-byte bool per
 * doc and then packbits-compresses it — three memory passes. These
 * kernels do compare + bit-pack + existence-AND in ONE pass over the
 * dense biased-uint64 value array (comet_tpu/ops/bitset.py BSI layout),
 * which is what the reference's roaring BSI achieves with container
 * locality (metadata_index.go:332-393).
 *
 * Built by `make native` (cc -O3 -shared -fPIC); loaded via ctypes with a
 * silent numpy fallback when the shared object is missing.
 */

#include <stdint.h>
#include <stddef.h>

/* op codes (keep in sync with comet_tpu/native/__init__.py) */
enum {
    OP_GT = 0,
    OP_GE = 1,
    OP_EQ = 2,
    OP_LT = 3,
    OP_LE = 4,
    OP_RANGE = 5, /* lo <= v <= hi inclusive */
};

/* Per 64-value block: a byte-mask compare loop the compiler auto-vectorizes
 * (AVX2/AVX-512 compare -> 0/1 bytes), then SWAR-pack each 8 mask bytes
 * into 8 bits via the 0x0102040810204080 multiply trick (no carries:
 * exponents 8i + 56 - 7j collide only for i == j within 0..7). */
#define PACK_BLOCK(CMP)                                                    \
    do {                                                                   \
        for (size_t w = 0; w < words; ++w) {                               \
            const uint64_t *v = vals + (w << 6);                           \
            unsigned char m[64];                                           \
            for (int b = 0; b < 64; ++b) m[b] = (unsigned char)(CMP);      \
            uint64_t acc = 0;                                              \
            for (int g = 0; g < 8; ++g) {                                  \
                uint64_t chunk;                                            \
                __builtin_memcpy(&chunk, m + 8 * g, 8);                    \
                acc |= ((chunk * 0x0102040810204080ULL) >> 56) << (8 * g); \
            }                                                              \
            out[w] = (w < ebm_words) ? (acc & ebm[w]) : 0;                 \
        }                                                                  \
    } while (0)

/* vals: n biased values, n % 64 == 0.
 * ebm:  n/64 existence words (little bit order, bit i of word w = doc 64w+i).
 * out:  n/64 result words.
 */
void bsi_compare_pack(const uint64_t *vals, size_t n, int op,
                      uint64_t lo, uint64_t hi,
                      const uint64_t *ebm, size_t ebm_words,
                      uint64_t *out) {
    size_t words = n >> 6;
    /* unsigned 64-bit compares have no SIMD form (pcmpgtq is signed);
     * flipping the bias bit makes unsigned order == signed order, so the
     * compiler can vectorize the comparisons */
    const uint64_t B = 0x8000000000000000ULL;
    const int64_t slo = (int64_t)(lo ^ B), shi = (int64_t)(hi ^ B);
    switch (op) {
    case OP_GT:    PACK_BLOCK((int64_t)(v[b] ^ B) > slo); break;
    case OP_GE:    PACK_BLOCK((int64_t)(v[b] ^ B) >= slo); break;
    case OP_EQ:    PACK_BLOCK(v[b] == lo); break;
    case OP_LT:    PACK_BLOCK((int64_t)(v[b] ^ B) < slo); break;
    case OP_LE:    PACK_BLOCK((int64_t)(v[b] ^ B) <= slo); break;
    case OP_RANGE: PACK_BLOCK((int64_t)(v[b] ^ B) >= slo
                              && (int64_t)(v[b] ^ B) <= shi); break;
    }
}

/* AND-reduce a stack of bitset word arrays: out = rows[0] & ... & rows[r-1].
 * rows is row-major [r, words]. (Legacy layout — requires the caller to
 * copy all operands into one matrix; prefer bitset_and_fold.) */
void bitset_and_many(const uint64_t *rows, size_t r, size_t words,
                     uint64_t *out) {
    if (r == 0) return;
    for (size_t w = 0; w < words; ++w) out[w] = rows[w];
    for (size_t i = 1; i < r; ++i) {
        const uint64_t *row = rows + i * words;
        for (size_t w = 0; w < words; ++w) out[w] &= row[w];
    }
}

/* AND-fold r word arrays (given as POINTERS — no operand copies) into out,
 * blockwise with zero-block skipping:
 *
 *   - one pass over memory total (the numpy fold pays r-1 full passes);
 *   - per 64-word (512 B) block, once the running AND of the first
 *     operands is all-zero the remaining operands are never read — with
 *     the caller ordering operands by ascending popcount (selective
 *     first), sparse intersections skip most of the wide operands'
 *     bandwidth, which is the dense-layout answer to roaring's
 *     container-sparsity advantage (docs/INDEX.md:7250-7276).
 *
 * Every inner loop is a plain AND/OR pass the compiler auto-vectorizes;
 * operands interleave per 512 B block so the running AND stays in L1
 * across operands and a zero block skips the remaining operands' DRAM. */
void bitset_and_fold(const uint64_t *const *rows, size_t r,
                     size_t words, uint64_t *out) {
    if (r == 0) return;
    const size_t B = 64;
    for (size_t lo = 0; lo < words; lo += B) {
        const size_t hi = lo + B < words ? lo + B : words;
        const uint64_t *a = rows[0];
        if (r == 1) {
            for (size_t w = lo; w < hi; ++w) out[w] = a[w];
            continue;
        }
        const uint64_t *b = rows[1];
        for (size_t w = lo; w < hi; ++w) out[w] = a[w] & b[w];
        for (size_t k = 2; k < r; ++k) {
            uint64_t any = 0;
            for (size_t w = lo; w < hi; ++w) any |= out[w];
            if (!any) break;
            const uint64_t *c = rows[k];
            for (size_t w = lo; w < hi; ++w) out[w] &= c[w];
        }
    }
}
