// Native host-side FASTQ parser: raw byte buffer -> fixed-shape 2-bit code
// batches ready for device upload.
//
// Reference analog: zotmer/library/file.py readFastq (pure-Python generator;
// SURVEY.md section 2a). At the >=1 Gbase/s/host target the host input
// pipeline is the bottleneck (SURVEY.md section 7 "hard parts"), so the
// parse+encode inner loop is C++ (memchr newline scans + 256-entry LUT
// encode), exposed through a C ABI for ctypes (no pybind11 in this image).
//
// Semantics must match zotpu/semantics.py: A/C/G/T (either case) -> 0..3,
// anything else -> 4 (INVALID_CODE); codes rows padded with 4.

#include <cstdint>
#include <cstring>

namespace {
uint8_t LUT[256];
struct LutInit {
    LutInit() {
        memset(LUT, 4, sizeof(LUT));
        LUT['A'] = LUT['a'] = 0;
        LUT['C'] = LUT['c'] = 1;
        LUT['G'] = LUT['g'] = 2;
        LUT['T'] = LUT['t'] = 3;
    }
} lut_init;
}  // namespace

extern "C" {

// Parse up to max_reads FASTQ records from buf[0..len).
// codes: caller-allocated (max_reads * max_len) u8, filled row-major.
// lengths: caller-allocated (max_reads) i32 (clamped to max_len).
// consumed: bytes of buf consumed (complete records only).
// max_seen: longest sequence line seen (pre-clamp) -- lets the caller detect
//           truncation and fall back to the halo-chunking slow path.
// Returns number of records parsed.
int64_t zotpu_parse_fastq(const uint8_t* buf, int64_t len,
                          int64_t max_reads, int64_t max_len,
                          uint8_t* codes, int32_t* lengths,
                          int64_t* consumed, int64_t* max_seen) {
    int64_t nreads = 0;
    int64_t pos = 0;
    int64_t seen = 0;
    while (nreads < max_reads) {
        int64_t line_start[4];
        int64_t line_end[4];
        int64_t p = pos;
        bool complete = true;
        for (int l = 0; l < 4; ++l) {
            line_start[l] = p;
            if (p >= len) { complete = false; break; }
            const void* nl = memchr(buf + p, '\n', static_cast<size_t>(len - p));
            if (nl == nullptr) { complete = false; break; }
            line_end[l] = static_cast<const uint8_t*>(nl) - buf;
            p = line_end[l] + 1;
        }
        if (!complete) break;
        int64_t s = line_start[1];
        int64_t e = line_end[1];
        // tolerate \r\n
        if (e > s && buf[e - 1] == '\r') --e;
        int64_t L = e - s;
        if (L > seen) seen = L;
        if (L > max_len) L = max_len;
        uint8_t* row = codes + nreads * max_len;
        for (int64_t i = 0; i < L; ++i) row[i] = LUT[buf[s + i]];
        if (L < max_len) memset(row + L, 4, static_cast<size_t>(max_len - L));
        lengths[nreads] = static_cast<int32_t>(L);
        ++nreads;
        pos = p;
    }
    *consumed = pos;
    *max_seen = seen;
    return nreads;
}

// Encode arbitrary bytes -> codes (for FASTA bodies handled host-side).
void zotpu_encode(const uint8_t* buf, int64_t len, uint8_t* out) {
    for (int64_t i = 0; i < len; ++i) out[i] = LUT[buf[i]];
}

// Pack code rows into the H2D wire form (zotpu/io/wire.py): 4 codes/byte
// (code i of a group at bit 2i) + 1 invalid bit/base (base i of a group at
// bit i; invalid = code >= 4, i.e. bit 2 set for codes in 0..4). total is
// rows * L bytes in, rows * (L/4 + L/8) bytes out; L % 8 == 0.
void zotpu_pack_wire(const uint8_t* codes, int64_t total,
                     uint8_t* packed, uint8_t* mask) {
    const int64_t groups = total / 8;
    for (int64_t g = 0; g < groups; ++g) {
        const uint8_t* c = codes + g * 8;
        uint8_t p0 = 0, p1 = 0, mb = 0;
        for (int b = 0; b < 4; ++b)
            p0 = static_cast<uint8_t>(p0 | ((c[b] & 3) << (2 * b)));
        for (int b = 0; b < 4; ++b)
            p1 = static_cast<uint8_t>(p1 | ((c[4 + b] & 3) << (2 * b)));
        for (int b = 0; b < 8; ++b)
            mb = static_cast<uint8_t>(mb | (((c[b] >> 2) & 1) << b));
        packed[2 * g] = p0;
        packed[2 * g + 1] = p1;
        mask[g] = mb;
    }
}

}  // extern "C"
