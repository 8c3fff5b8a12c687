// Native host-runtime component: CAVLC residual symbol generation, MSB-first
// bit packing, and Annex-B emulation prevention.
//
// The TPU-native counterpart of the reference's entropy/bit plumbing
// (residual.cpp residual_block_cavlc_write, rbsp_IO.cpp writeRawBits,
// nal.cpp writeNAL): the device computes levels in bulk; this code turns
// them into bits on the host at native speed. Semantics are identical to
// ops/cavlc.py / bitstream/bitio.py / bitstream/nal.py (tests compare).
//
// Built with plain g++ into a shared object, loaded via ctypes (no
// pybind11 in this image).

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// MSB-first bit packing. Returns total bit count. `out` must hold
// ceil(sum(lens)/8) bytes; bits beyond the count are zero.
long bitpack(const uint32_t* vals, const uint8_t* lens, long n, uint8_t* out) {
    uint64_t acc = 0;
    int nacc = 0;
    long nbytes = 0;
    long bits = 0;
    for (long i = 0; i < n; i++) {
        int nb = lens[i];
        acc = (acc << nb) | (vals[i] & ((nb >= 32) ? 0xFFFFFFFFu : ((1u << nb) - 1)));
        nacc += nb;
        bits += nb;
        while (nacc >= 8) {
            nacc -= 8;
            out[nbytes++] = (uint8_t)(acc >> nacc);
        }
        acc &= (nacc >= 64) ? ~0ull : ((1ull << nacc) - 1);
    }
    if (nacc > 0) {
        out[nbytes++] = (uint8_t)(acc << (8 - nacc));
    }
    return bits;
}

// ---------------------------------------------------------------------------
// Emulation prevention insertion (nal.cpp:272-295). Returns output length.
long insert_epb(const uint8_t* in, long n, uint8_t* out) {
    long pos = 0;
    int zeros = 0;
    for (long i = 0; i < n; i++) {
        uint8_t b = in[i];
        if (zeros >= 2 && b <= 3) {
            out[pos++] = 3;
            zeros = 0;
        }
        out[pos++] = b;
        zeros = (b == 0) ? zeros + 1 : 0;
    }
    return pos;
}

// ---------------------------------------------------------------------------
// CAVLC residual block symbol generation (ops/cavlc.py block_symbols).
// Tables are passed in flat (see python wrapper for layouts).
// Returns the number of symbols written; *total_coeff_out gets TotalCoeff.

static inline void level_code_parts(int level_code, int suffix_len,
                                    int* prefix, int* ssize, int* suffix) {
    if (suffix_len == 0) {
        if (level_code < 14) { *prefix = level_code; *ssize = 0; *suffix = 0; return; }
        if (level_code < 30) { *prefix = 14; *ssize = 4; *suffix = level_code - 14; return; }
        *prefix = 15; *ssize = 12; *suffix = level_code - 30; return;
    }
    int p = level_code >> suffix_len;
    if (p < 15) { *prefix = p; *ssize = suffix_len; *suffix = level_code & ((1 << suffix_len) - 1); return; }
    *prefix = 15; *ssize = 12; *suffix = level_code - (15 << suffix_len);
}

int cavlc_block_symbols(
    const int32_t* levels, int max_num_coeff, int nc,
    const int32_t* ct_len, const int32_t* ct_bits,     // [5*17*4]
    const int32_t* tz_len, const int32_t* tz_bits,     // [15*16]
    const int32_t* tzc_len, const int32_t* tzc_bits,   // [3*4]
    const int32_t* rb_len, const int32_t* rb_bits,     // [6*7]
    uint32_t* out_vals, uint8_t* out_lens, int* total_coeff_out) {
    int nonzero_pos[16];
    int total_coeff = 0;
    for (int i = 0; i < max_num_coeff; i++) {
        if (levels[i] != 0) nonzero_pos[total_coeff++] = i;
    }
    int trailing_ones = 0;
    for (int i = total_coeff - 1; i >= 0; i--) {
        int v = levels[nonzero_pos[i]];
        if ((v == 1 || v == -1) && trailing_ones < 3) trailing_ones++;
        else break;
    }
    int ctx;
    if (nc == -1) ctx = 4;
    else if (nc < 2) ctx = 0;
    else if (nc < 4) ctx = 1;
    else if (nc < 8) ctx = 2;
    else ctx = 3;

    int ns = 0;
    int idx = (ctx * 17 + total_coeff) * 4 + trailing_ones;
    out_vals[ns] = (uint32_t)ct_bits[idx];
    out_lens[ns++] = (uint8_t)ct_len[idx];
    *total_coeff_out = total_coeff;
    if (total_coeff == 0) return ns;

    for (int i = 0; i < trailing_ones; i++) {
        int lv = levels[nonzero_pos[total_coeff - 1 - i]];
        out_vals[ns] = lv < 0 ? 1 : 0;
        out_lens[ns++] = 1;
    }
    int suffix_len = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
    for (int i = trailing_ones; i < total_coeff; i++) {
        int lv = levels[nonzero_pos[total_coeff - 1 - i]];
        int code = lv > 0 ? 2 * lv - 2 : -2 * lv - 1;
        if (i == trailing_ones && trailing_ones < 3) code -= 2;
        int prefix, ssize, suffix;
        level_code_parts(code, suffix_len, &prefix, &ssize, &suffix);
        out_vals[ns] = 1;                       // prefix zeros + stop bit
        out_lens[ns++] = (uint8_t)(prefix + 1);
        if (ssize > 0) {
            out_vals[ns] = (uint32_t)suffix;
            out_lens[ns++] = (uint8_t)ssize;
        }
        if (suffix_len == 0) suffix_len = 1;
        int abslv = lv < 0 ? -lv : lv;
        if (abslv > (3 << (suffix_len - 1)) && suffix_len < 6) suffix_len++;
    }

    int total_zeros = nonzero_pos[total_coeff - 1] + 1 - total_coeff;
    if (total_coeff < max_num_coeff) {
        if (nc != -1) {
            int tzi = (total_coeff - 1) * 16 + total_zeros;
            out_vals[ns] = (uint32_t)tz_bits[tzi];
            out_lens[ns++] = (uint8_t)tz_len[tzi];
        } else {
            int tzi = (total_coeff - 1) * 4 + total_zeros;
            out_vals[ns] = (uint32_t)tzc_bits[tzi];
            out_lens[ns++] = (uint8_t)tzc_len[tzi];
        }
    }

    int zeros_left = total_zeros;
    for (int i = total_coeff - 1; i > 0; i--) {
        if (zeros_left <= 0) break;
        int run_before = nonzero_pos[i] - nonzero_pos[i - 1] - 1;
        if (zeros_left > 6) {
            if (run_before < 7) {
                out_vals[ns] = (uint32_t)(7 - run_before);
                out_lens[ns++] = 3;
            } else {
                out_vals[ns] = 1;               // zeros then stop bit
                out_lens[ns++] = (uint8_t)(run_before - 4 + 1);
            }
        } else {
            int rbi = (zeros_left - 1) * 7 + run_before;
            out_vals[ns] = (uint32_t)rb_bits[rbi];
            out_lens[ns++] = (uint8_t)rb_len[rbi];
        }
        zeros_left -= run_before;
    }
    return ns;
}

}  // extern "C"
