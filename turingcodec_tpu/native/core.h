// Shared native-core definitions: CABAC tables, arithmetic engine, and the
// sig_coeff_flag context derivation — used by cabac_core.cpp (residual
// decode / rate estimation / intra TU) and slice_parse.cpp (full CTU parse).
//
// Spec references: decode engine 9.3.4.3; context derivation 9.3.4.2.5.
#ifndef TC_NATIVE_CORE_H
#define TC_NATIVE_CORE_H

#include <cstdint>
#include <cstring>

// Tables installed once by tc_init_tables (defined in cabac_core.cpp).
extern uint8_t g_range_lps[64][4];
extern uint8_t g_next_mps[128];
extern uint8_t g_next_lps[128];
extern uint8_t g_sig4x4[16];
extern int32_t g_off_sig, g_off_csbf, g_off_lastx, g_off_lasty, g_off_gt1,
    g_off_gt2;
// scan tables: g_scan[s][idx] for grid log2 s in 0..3, scan idx 0..2;
// entries are (x, y) pairs in scan order, (1 << 2s) of them.
extern int8_t g_scan[4][3][2 * 64];

// Arithmetic decoding engine (spec 9.3.4.3) with a 64-bit bit cache.
// `pos` stays the semantic bit position (cache refills change nothing
// visible), matching cabac/engine.py exactly — including reading past the
// end of the buffer as zero bits (decoder robustness).
struct Engine {
    const uint8_t* data;
    int64_t nbits;
    int64_t pos;
    uint32_t range;
    uint32_t offset;
    uint64_t cache = 0;
    int cache_bits = 0;

    inline void set_pos(int64_t p) {
        pos = p;
        cache = 0;
        cache_bits = 0;
    }

    inline uint32_t read_bits(int n) {
        while (cache_bits < n) {
            int64_t bitpos = pos + cache_bits;
            int64_t bytepos = bitpos >> 3;
            int shift = (int)(bitpos & 7);
            uint32_t byte = (bytepos < (nbits >> 3)) ? data[bytepos] : 0;
            int avail = 8 - shift;
            cache = (cache << avail) | (byte & ((1u << avail) - 1));
            cache_bits += avail;
        }
        uint32_t out = (uint32_t)((cache >> (cache_bits - n)) &
                                  ((1ull << n) - 1));
        cache_bits -= n;
        cache &= (1ull << cache_bits) - 1;
        pos += n;
        return out;
    }

    // Re-init the arithmetic state at a (byte-aligned) bit position — used
    // after PCM payloads and at WPP/tile substream boundaries.
    inline void restart_at(int64_t p) {
        set_pos(p);
        range = 510;
        offset = read_bits(9);
    }

    inline int decode_decision(uint8_t* ctx, int idx) {
        uint32_t s = ctx[idx];
        uint32_t lps = g_range_lps[s >> 1][(range >> 6) & 3];
        range -= lps;
        int bin;
        if (offset >= range) {
            bin = 1 - (s & 1);
            offset -= range;
            range = lps;
            ctx[idx] = g_next_lps[s];
        } else {
            bin = s & 1;
            ctx[idx] = g_next_mps[s];
        }
        if (range < 256) {
            int n = __builtin_clz(range) - 23;  // 9 - bit_length(range)
            range <<= n;
            offset = (offset << n) | read_bits(n);
        }
        return bin;
    }

    inline int decode_bypass() {
        offset = (offset << 1) | read_bits(1);
        if (offset >= range) {
            offset -= range;
            return 1;
        }
        return 0;
    }

    inline uint32_t decode_bypass_bits(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++)
            v = (v << 1) | decode_bypass();
        return v;
    }

    // spec 9.3.4.3.5; on a 1 the range is NOT renormalized (PCM / slice end)
    inline int decode_terminate() {
        uint32_t r = range - 2;
        if (offset >= r) {
            range = r;
            return 1;
        }
        if (r < 256) {
            int n = __builtin_clz(r) - 23;
            r <<= n;
            offset = (offset << n) | read_bits(n);
        }
        range = r;
        return 0;
    }

    // k-th order Exp-Golomb, bypass bins (spec 9.3.3.3). Returns -1 when the
    // prefix run is implausibly long (corrupt stream guard).
    inline int64_t decode_egk(int k) {
        int64_t value = 0;
        while (decode_bypass()) {
            value += 1ll << k;
            k++;
            if (k > 32)
                return -1;
        }
        if (k)
            value += decode_bypass_bits(k);
        return value;
    }

    inline int decode_remaining(int rice) {
        int prefix = 0;
        while (prefix < 32 && decode_bypass())
            prefix++;
        if (prefix <= 3)
            return (prefix << rice) + (rice ? decode_bypass_bits(rice) : 0);
        int n = prefix - 3 + rice;
        return decode_bypass_bits(n) + (((1 << (prefix - 3)) + 2) << rice);
    }
};

// sig_coeff_flag ctxInc (spec 9.3.4.2.5) — mirrors ctu_parse._sig_ctx
inline int sig_ctx(int log2_size, int c_idx, int scan_idx, int xc, int yc,
                   int xp, int yp, int xs, int ys, int prev_csbf) {
    int sig;
    if (log2_size == 2) {
        sig = g_sig4x4[(yp << 2) + xp];
    } else if (xc == 0 && yc == 0) {
        sig = 0;
    } else {
        if (prev_csbf == 0) {
            int s = xp + yp;
            sig = s == 0 ? 2 : (s < 3 ? 1 : 0);
        } else if (prev_csbf == 1) {
            sig = yp == 0 ? 2 : (yp == 1 ? 1 : 0);
        } else if (prev_csbf == 2) {
            sig = xp == 0 ? 2 : (xp == 1 ? 1 : 0);
        } else {
            sig = 2;
        }
        if (c_idx == 0) {
            if (xs || ys)
                sig += 3;
            sig += (log2_size == 3 && scan_idx == 0) ? 9
                 : (log2_size == 3 ? 15 : 21);
        } else {
            sig += log2_size == 3 ? 9 : 12;
        }
    }
    return sig + (c_idx ? 27 : 0);
}

// residual_coding() body from the last-position syntax down (spec 7.3.8.11),
// writing into a strided int16 plane. Returns 0 on success.
int residual_decode_core(Engine& e, uint8_t* ctx, int log2_size, int c_idx,
                         int scan_idx, int sdh, int16_t* out,
                         int out_stride);

// One intra TB: reference build + filter + predict + dequant/IDCT + add
// (cabac_core.cpp). Reused by the per-picture intra driver in
// pixel_recon.cpp.
extern "C" int tc_intra_tu(int16_t* plane, int pw, int ph,
                           const int32_t* zscan, int zw, int x0, int y0,
                           int n, int c_idx, int sub, int bit_depth, int mode,
                           int strong_smoothing, const int16_t* coeff_plane,
                           int cbf, int qp, int use_dst);

#endif  // TC_NATIVE_CORE_H
