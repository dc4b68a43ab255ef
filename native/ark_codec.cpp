// Native host data-path: bulk canonical-serialization codec + CPU
// Montgomery oracle.
//
// The reference's native locus is its x86_64 Montgomery assembly
// (ff-asm/src/lib.rs:51) — on TPU that role is played by the Pallas/XLA
// kernels.  What remains host-side in the TPU design is the *data path*:
// converting between the wire format of ark-serialize (little-endian
// canonical bytes, flags in the top bits of the final byte;
// serialize/src/lib.rs:84,125) and the device limb layout
// (uint32 arrays of 16-bit limbs), for gigabyte-scale point/scalar
// loading.  Python byte loops are ~1e5 elements/s; this C++ path is
// memory-bandwidth bound.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// limbs[n][L] (uint32 holding 16-bit limbs, little-endian limb order)
//   -> out[n][stride] little-endian bytes.
// stride may be smaller than 2*L (moduli whose byte size isn't a
// multiple of 2) or larger (flag byte headroom); excess bytes are zero.
void ark_pack_le(const uint32_t* limbs, size_t n, size_t L, uint8_t* out,
                 size_t stride) {
    for (size_t i = 0; i < n; ++i) {
        const uint32_t* src = limbs + i * L;
        uint8_t* dst = out + i * stride;
        std::memset(dst, 0, stride);
        size_t nb = stride < 2 * L ? stride : 2 * L;
        for (size_t b = 0; b < nb; ++b) {
            uint32_t limb = src[b >> 1];
            dst[b] = (uint8_t)((b & 1) ? (limb >> 8) : limb);
        }
    }
}

// inverse of ark_pack_le; bytes beyond 2*L are ignored.
void ark_unpack_le(const uint8_t* in, size_t n, size_t stride,
                   uint32_t* limbs, size_t L) {
    for (size_t i = 0; i < n; ++i) {
        const uint8_t* src = in + i * stride;
        uint32_t* dst = limbs + i * L;
        std::memset(dst, 0, L * sizeof(uint32_t));
        size_t nb = stride < 2 * L ? stride : 2 * L;
        for (size_t b = 0; b < nb; ++b) {
            dst[b >> 1] |= ((uint32_t)src[b]) << ((b & 1) ? 8 : 0);
        }
    }
}

// OR the given flag mask into the last byte of each `stride`-sized
// record (flagged field-element serialization, fp/mod.rs:544-589).
void ark_apply_flags(uint8_t* buf, size_t n, size_t stride,
                     const uint8_t* flags) {
    for (size_t i = 0; i < n; ++i) {
        buf[i * stride + stride - 1] |= flags[i];
    }
}

// Extract + clear the top `flag_bits` bits of each record's last byte.
void ark_strip_flags(uint8_t* buf, size_t n, size_t stride, int flag_bits,
                     uint8_t* flags_out) {
    uint8_t mask = (uint8_t)(0xFFu << (8 - flag_bits));
    for (size_t i = 0; i < n; ++i) {
        uint8_t* last = buf + i * stride + stride - 1;
        flags_out[i] = *last & mask;
        *last = (uint8_t)(*last & ~mask);
    }
}

// ---------------------------------------------------------------------------
// CPU Montgomery oracle: 16-bit-limb CIOS, for host-side golden-vector
// generation at scale (mirrors the semantics of ops/mont.py `mul`).
// a, b, out: [n][L]; p: [L]; inv16 = -p^-1 mod 2^16.
void ark_mont_mul_batch(const uint32_t* a, const uint32_t* b, uint32_t* out,
                        size_t n, size_t L, const uint32_t* p,
                        uint32_t inv16) {
    // column accumulators fit u64 comfortably (L <= 64)
    uint64_t cols[131];
    for (size_t e = 0; e < n; ++e) {
        const uint32_t* x = a + e * L;
        const uint32_t* y = b + e * L;
        for (size_t k = 0; k <= 2 * L; ++k) cols[k] = 0;
        for (size_t i = 0; i < L; ++i) {
            uint64_t xi = x[i];
            for (size_t j = 0; j < L; ++j) cols[i + j] += xi * y[j];
        }
        for (size_t i = 0; i < L; ++i) {
            uint64_t m = ((cols[i] & 0xFFFF) * inv16) & 0xFFFF;
            for (size_t j = 0; j < L; ++j) cols[i + j] += m * p[j];
            cols[i + 1] += cols[i] >> 16;
        }
        // propagate into result limbs; the top column folds into carry
        uint64_t carry = 0;
        uint32_t res[64];
        for (size_t k = 0; k < L; ++k) {
            uint64_t v = cols[L + k] + carry;
            res[k] = (uint32_t)(v & 0xFFFF);
            carry = v >> 16;
        }
        carry += cols[2 * L];
        // conditional subtract: compare (carry:res) with p
        uint64_t borrow = 0;
        uint32_t d[64];
        for (size_t k = 0; k < L; ++k) {
            uint64_t t = (uint64_t)res[k] - p[k] - borrow;
            d[k] = (uint32_t)(t & 0xFFFF);
            borrow = (t >> 63) & 1;  // underflow marker
        }
        int ge = carry || !borrow;
        uint32_t* o = out + e * L;
        for (size_t k = 0; k < L; ++k) o[k] = ge ? d[k] : res[k];
    }
}

}  // extern "C"
