// Fast CIGAR-string formatting from packed run entries.
//
// The device engines emit per-pair CIGARs as packed uint16 runs
// (op << 12 | count, op in {0:'=',1:'X',2:'I',3:'D'}); turning ~10^6 runs
// per batch into strings is the dominant host-side post-processing cost
// (the analogue of cigarlist_to_cigar, genasm_gpu.cu:881-888 — also host-
// side and outside the timed kernel there). Python/numpy string joins run
// ~1us/run; this does ~10ns/run.
//
// Built as a plain shared library, bound with ctypes (no pybind11 in the
// image). See scrooge_tpu/native/__init__.py.

#include <cstdint>
#include <cstring>

static const char OPS[4] = {'=', 'X', 'I', 'D'};

extern "C" {

// entries: column-major per lane (cap x B), entry g of lane b at
// entries[g * B + b] (the compact_entries device layout, row-major (cap, B)).
// out: B rows of out_stride chars; out_lens[b] = chars written for lane b.
// Returns 0 on success, -1 if any lane would overflow out_stride.
int format_cigars(const uint16_t* entries, int64_t cap, int64_t B,
                  const int32_t* totals, char* out, int64_t out_stride,
                  int32_t* out_lens) {
    int rc = 0;
    for (int64_t b = 0; b < B; b++) {
        char* dst = out + b * out_stride;
        char* p = dst;
        char* end = dst + out_stride;
        int64_t t = totals[b];
        if (t > cap) t = cap;
        for (int64_t g = 0; g < t; g++) {
            uint16_t e = entries[g * B + b];
            uint32_t count = e & 0x0FFF;
            char op = OPS[(e >> 12) & 3];
            // itoa (count <= 4095 so at most 4 digits)
            char digits[8];
            int nd = 0;
            if (count == 0) digits[nd++] = '0';
            while (count > 0) { digits[nd++] = (char)('0' + count % 10); count /= 10; }
            if (p + nd + 1 > end) { rc = -1; break; }
            while (nd > 0) *p++ = digits[--nd];
            *p++ = op;
        }
        out_lens[b] = (int32_t)(p - dst);
    }
    return rc;
}

// Affine-gap rescoring of packed runs (get_alignment_score,
// cpu_baseline.cpp:694-725): match adds +match/base; mismatch subtracts
// mismatch/base; each gap run subtracts gap_open + gap_extend*len.
void affine_scores(const uint16_t* entries, int64_t cap, int64_t B,
                   const int32_t* totals, int32_t match, int32_t mismatch,
                   int32_t gap_open, int32_t gap_extend, int64_t* out) {
    for (int64_t b = 0; b < B; b++) {
        int64_t score = 0;
        int64_t t = totals[b];
        if (t > cap) t = cap;
        for (int64_t g = 0; g < t; g++) {
            uint16_t e = entries[g * B + b];
            int32_t count = e & 0x0FFF;
            switch ((e >> 12) & 3) {
                case 0: score += (int64_t)match * count; break;
                case 1: score -= (int64_t)mismatch * count; break;
                default: score -= gap_open + (int64_t)gap_extend * count;
            }
        }
        out[b] = score;
    }
}

// Direct formatting from the engines' raw per-window run layout
// (maxw, ne, B): entry (w, e, b) at (w*ne + e)*B + b, valid for
// e < counts[w*B + b]. Windows concatenate in order (runs are NOT merged
// across windows — reference behavior, genasm_cpu.cpp:411-438). This skips
// the device-side compaction pass entirely.
int format_cigars_windows(const uint16_t* entries, int64_t maxw, int64_t ne,
                          int64_t B, const int32_t* counts, char* out,
                          int64_t out_stride, int32_t* out_lens) {
    int rc = 0;
    for (int64_t b = 0; b < B; b++) {
        char* dst = out + b * out_stride;
        char* p = dst;
        char* end = dst + out_stride;
        for (int64_t w = 0; w < maxw; w++) {
            int64_t t = counts[w * B + b];
            if (t > ne) t = ne;
            const uint16_t* row = entries + w * ne * B + b;
            for (int64_t e = 0; e < t; e++) {
                uint16_t ent = row[e * B];
                uint32_t count = ent & 0x0FFF;
                char op = OPS[(ent >> 12) & 3];
                char digits[8];
                int nd = 0;
                if (count == 0) digits[nd++] = '0';
                while (count > 0) { digits[nd++] = (char)('0' + count % 10); count /= 10; }
                if (p + nd + 1 > end) { rc = -1; w = maxw; break; }
                while (nd > 0) *p++ = digits[--nd];
                *p++ = op;
            }
        }
        out_lens[b] = (int32_t)(p - dst);
    }
    return rc;
}

// 2-bit pack: codes (rows x T) uint8 -> words (rows x ceil(T/16)) uint32,
// char k of a word in bits [2k, 2k+2) (matches engine_pallas.pack_2bit).
void pack_2bit_rows(const uint8_t* codes, int64_t rows, int64_t T,
                    uint32_t* out) {
    int64_t Tw = (T + 15) / 16;
    for (int64_t r = 0; r < rows; r++) {
        const uint8_t* src = codes + r * T;
        uint32_t* dst = out + r * Tw;
        for (int64_t w = 0; w < Tw; w++) {
            uint32_t acc = 0;
            int64_t base = w * 16;
            int64_t hi = T - base < 16 ? T - base : 16;
            for (int64_t k = 0; k < hi; k++) {
                acc |= (uint32_t)(src[base + k] & 3) << (2 * k);
            }
            dst[w] = acc;
        }
    }
}

// Fused ASCII -> 2-bit encode + pack for variable-length rows
// (ascii_to_zero_based_string + TwoBitArray packing in one pass; the
// reference does these as separate host/device steps, genasm_cpu.cpp:462-493
// and genasm_gpu.cu:640-685). ascii holds the concatenated sequences; row r
// occupies bytes [starts[r], starts[r] + lens[r]). out is rows x Pw uint32,
// char k of a word in bits [2k, 2k+2), tail words zero-filled. Returns 0 on
// success, -1 with *bad_pos = ascii index of the first non-ACGT byte.
static const uint8_t* encode_lut() {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        for (int i = 0; i < 256; i++) lut[i] = 0xFF;
        lut['A'] = lut['a'] = 0; lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2; lut['T'] = lut['t'] = 3;
        init = true;
    }
    return lut;
}

int encode_pack_rows(const uint8_t* ascii, const int64_t* starts,
                     const int64_t* lens, int64_t rows, int64_t Pw,
                     uint32_t* out, int64_t* bad_pos) {
    const uint8_t* lut = encode_lut();
    for (int64_t r = 0; r < rows; r++) {
        const uint8_t* src = ascii + starts[r];
        int64_t n = lens[r];
        uint32_t* dst = out + r * Pw;
        int64_t nw = (n + 15) / 16;
        if (nw > Pw) nw = Pw;
        for (int64_t w = 0; w < nw; w++) {
            uint32_t acc = 0;
            int64_t base = w * 16;
            int64_t hi = n - base < 16 ? n - base : 16;
            uint8_t bad = 0;
            for (int64_t k = 0; k < hi; k++) {
                uint8_t code = lut[src[base + k]];
                bad |= code;
                acc |= (uint32_t)(code & 3) << (2 * k);
            }
            if (bad & 0xFC) {  // some code was 0xFF: locate it exactly
                for (int64_t k = 0; k < hi; k++) {
                    if (lut[src[base + k]] == 0xFF) {
                        *bad_pos = starts[r] + base + k;
                        return -1;
                    }
                }
            }
            dst[w] = acc;
        }
        for (int64_t w = nw; w < Pw; w++) dst[w] = 0;
    }
    return 0;
}

// Unpacked variant for the XLA engine (uint8 code rows, width P,
// zero-padded). Same contract as encode_pack_rows otherwise.
int encode_rows(const uint8_t* ascii, const int64_t* starts,
                const int64_t* lens, int64_t rows, int64_t P,
                uint8_t* out, int64_t* bad_pos) {
    const uint8_t* lut = encode_lut();
    for (int64_t r = 0; r < rows; r++) {
        const uint8_t* src = ascii + starts[r];
        int64_t n = lens[r] < P ? lens[r] : P;
        uint8_t* dst = out + r * P;
        for (int64_t k = 0; k < n; k++) {
            uint8_t code = lut[src[k]];
            if (code == 0xFF) { *bad_pos = starts[r] + k; return -1; }
            dst[k] = code;
        }
        memset(dst + n, 0, (size_t)(P - n));
    }
    return 0;
}

// uint8 packed-run layout (op << 6 | count, count <= 63): used when the
// config's tb_limit bounds run lengths under 64, halving the
// device->host readback.
int format_cigars8(const uint8_t* entries, int64_t cap, int64_t B,
                   const int32_t* totals, char* out, int64_t out_stride,
                   int32_t* out_lens) {
    int rc = 0;
    for (int64_t b = 0; b < B; b++) {
        char* dst = out + b * out_stride;
        char* p = dst;
        char* end = dst + out_stride;
        int64_t t = totals[b];
        if (t > cap) t = cap;
        for (int64_t g = 0; g < t; g++) {
            uint8_t e = entries[g * B + b];
            uint32_t count = e & 0x3F;
            char op = OPS[(e >> 6) & 3];
            char digits[4];
            int nd = 0;
            if (count == 0) digits[nd++] = '0';
            while (count > 0) { digits[nd++] = (char)('0' + count % 10); count /= 10; }
            if (p + nd + 1 > end) { rc = -1; break; }
            while (nd > 0) *p++ = digits[--nd];
            *p++ = op;
        }
        out_lens[b] = (int32_t)(p - dst);
    }
    return rc;
}

// Lane-major extraction of a compacted (cap, B) run buffer into one flat
// uint16 stream: lane b's valid runs land contiguously at out[offs[b]..].
// This is the return_packed fast path — the numpy equivalent (transpose
// copy + boolean-mask gather) costs ~10x for the same strided walk.
void extract_runs(const uint16_t* entries, int64_t cap, int64_t B,
                  const int32_t* totals, const int64_t* offs,
                  uint16_t* out) {
    for (int64_t b = 0; b < B; b++) {
        int64_t t = totals[b];
        if (t > cap) t = cap;
        uint16_t* dst = out + offs[b];
        const uint16_t* src = entries + b;
        for (int64_t g = 0; g < t; g++) dst[g] = src[g * B];
    }
}

// uint8 layout variant (op << 6 | count): converts to the canonical
// uint16 op << 12 | count layout during the same strided walk.
void extract_runs8(const uint8_t* entries, int64_t cap, int64_t B,
                   const int32_t* totals, const int64_t* offs,
                   uint16_t* out) {
    for (int64_t b = 0; b < B; b++) {
        int64_t t = totals[b];
        if (t > cap) t = cap;
        uint16_t* dst = out + offs[b];
        const uint8_t* src = entries + b;
        for (int64_t g = 0; g < t; g++) {
            uint8_t e = src[g * B];
            dst[g] = (uint16_t)(((uint16_t)(e >> 6) << 12) | (e & 0x3F));
        }
    }
}

}  // extern "C"
