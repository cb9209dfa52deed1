// ASan/UBSan fuzz for codec_core entry points that parse untrusted
// payloads: GIF LZW decode and PNG unfilter.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int64_t zt_gif_lzw_decode(const uint8_t*, int64_t, uint8_t*,
                                     int64_t, int);
extern "C" int64_t zt_gif_lzw_encode(const uint8_t*, int64_t, uint8_t*,
                                     int64_t, int);
extern "C" int zt_png_unfilter(const uint8_t*, uint8_t*, int64_t, int64_t,
                               int64_t);

static uint64_t st = 88172645463325252ULL;
static uint64_t rnd() {
    st ^= st << 13; st ^= st >> 7; st ^= st << 17; return st;
}

int fuzz_encoder();

int main() {
    // LZW: valid encodes, then corrupted, then garbage
    for (int round = 0; round < 2000; ++round) {
        int mcs = 2 + (int)(rnd() % 7);  // 2..8
        size_t n = 1 + rnd() % 3000;
        std::vector<uint8_t> px(n);
        for (auto& b : px) b = (uint8_t)(rnd() & ((1 << mcs) - 1));
        std::vector<uint8_t> enc(n * 2 + 1024);
        int64_t el = zt_gif_lzw_encode(px.data(), n, enc.data(), enc.size(), mcs);
        if (el > 0) {
            enc.resize(el);
            std::vector<uint8_t> dec(n);
            // valid decode must round-trip
            int64_t dl = zt_gif_lzw_decode(enc.data(), el, dec.data(), n, mcs);
            if (dl != (int64_t)n || std::memcmp(dec.data(), px.data(), n)) {
                fprintf(stderr, "LZW roundtrip MISMATCH n=%zu mcs=%d dl=%lld\n",
                        n, mcs, (long long)dl);
                return 1;
            }
            // corrupted decode must stay in bounds (any return ok)
            std::vector<uint8_t> bad = enc;
            for (int k = 0; k < 8; ++k) bad[rnd() % bad.size()] = (uint8_t)rnd();
            zt_gif_lzw_decode(bad.data(), bad.size(), dec.data(), n, mcs);
            // truncated
            zt_gif_lzw_decode(enc.data(), el / 2, dec.data(), n, mcs);
            // undersized output
            if (n > 4) zt_gif_lzw_decode(enc.data(), el, dec.data(), n / 4, mcs);
            // wrong min_code_size
            zt_gif_lzw_decode(enc.data(), el, dec.data(), n, (mcs % 8) + 1);
        }
        // pure garbage
        std::vector<uint8_t> g(1 + rnd() % 512), out(4096);
        for (auto& b : g) b = (uint8_t)rnd();
        zt_gif_lzw_decode(g.data(), g.size(), out.data(), out.size(),
                          1 + (int)(rnd() % 10));
    }
    fprintf(stderr, "lzw ok\n");
    // PNG unfilter: random filter bytes incl. invalid types
    for (int round = 0; round < 2000; ++round) {
        int64_t w = 1 + rnd() % 64, h = 1 + rnd() % 32, bpp = 1 + rnd() % 8;
        int64_t stride = w * bpp;
        std::vector<uint8_t> src((stride + 1) * h), dst(stride * h);
        for (auto& b : src) b = (uint8_t)rnd();
        zt_png_unfilter(src.data(), dst.data(), h, stride, bpp);
    }
    fprintf(stderr, "unfilter ok\n");
    return fuzz_encoder();
}

// --- encoder: random images / dims / subsampling, then decode the
// produced scan path end-to-end via the decoder entry (validates the
// capacity math and the band logic stay in bounds) ---
extern "C" long zt_jpeg_encode_scan(const uint8_t*, int64_t, int64_t, int,
                                    int, int, int, const uint16_t*,
                                    const uint16_t*, const uint32_t*,
                                    const uint8_t*, const uint32_t*,
                                    const uint8_t*, uint8_t*, long);

static void huff_pack(const int* bits, const int* vals, int nvals,
                      uint32_t* codes, uint8_t* lens, int size) {
    std::memset(codes, 0, sizeof(uint32_t) * size);
    std::memset(lens, 0, size);
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
        for (int i = 0; i < bits[l]; ++i, ++k, ++code) {
            if (k < nvals && vals[k] < size) {
                codes[vals[k]] = code;
                lens[vals[k]] = (uint8_t)l;
            }
        }
        code <<= 1;
    }
}

int fuzz_encoder() {
    // standard Annex K luma tables (shared for both classes here —
    // conformance of the table choice is the python layer's job)
    static const int dc_bits[17] = {0,0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0};
    static const int dc_vals[12] = {0,1,2,3,4,5,6,7,8,9,10,11};
    static const int ac_bits[17] = {0,0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7D};
    static int ac_vals[162];
    static const int ac_first[] = {
        0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,
        0x13,0x51,0x61,0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,
        0x23,0x42,0xB1,0xC1,0x15,0x52,0xD1,0xF0,0x24,0x33,0x62,0x72,0x82};
    int n = 0;
    for (int v : ac_first) ac_vals[n++] = v;
    for (int hi = 0; hi <= 15 && n < 162; ++hi)
        for (int lo = 1; lo <= 10 && n < 162; ++lo) {
            int sym = (hi << 4) | lo;
            bool seen = false;
            for (int i = 0; i < n; ++i) if (ac_vals[i] == sym) seen = true;
            if (!seen) ac_vals[n++] = sym;
        }
    uint32_t dc_c[2 * 12]; uint8_t dc_l[2 * 12];
    uint32_t ac_c[2 * 256]; uint8_t ac_l[2 * 256];
    huff_pack(dc_bits, dc_vals, 12, dc_c, dc_l, 12);
    huff_pack(dc_bits, dc_vals, 12, dc_c + 12, dc_l + 12, 12);
    huff_pack(ac_bits, ac_vals, n, ac_c, ac_l, 256);
    huff_pack(ac_bits, ac_vals, n, ac_c + 256, ac_l + 256, 256);
    uint16_t q[64];
    for (int round = 0; round < 400; ++round) {
        int64_t h = 1 + rnd() % 70, w = 1 + rnd() % 70;
        int ch = 1 + rnd() % 4;
        if (ch == 2) ch = 3;
        int ncomp = (ch >= 3 && (rnd() & 3)) ? 3 : 1;
        int sh = 1 + (int)(rnd() & 1), sv = 1 + (int)(rnd() & 1);
        for (int i = 0; i < 64; ++i) q[i] = 1 + (uint16_t)(rnd() % 255);
        std::vector<uint8_t> img(h * w * ch);
        for (auto& b : img) b = (uint8_t)rnd();
        int64_t mx = (w + 8 * sh - 1) / (8 * sh);
        int64_t my = (h + 8 * sv - 1) / (8 * sv);
        long nb = mx * my * (ncomp == 1 ? 1 : sh * sv + 2);
        long cap = nb * 424 + 4096;
        std::vector<uint8_t> out(cap);
        long rc = zt_jpeg_encode_scan(img.data(), h, w, ch, ncomp, sh, sv,
                                      q, q, dc_c, dc_l, ac_c, ac_l,
                                      out.data(), cap);
        if (rc < 0) {
            fprintf(stderr, "encode_scan failed rc=%ld h=%lld w=%lld ch=%d "
                    "ncomp=%d sh=%d sv=%d\n", rc, (long long)h,
                    (long long)w, ch, ncomp, sh, sv);
            return 1;
        }
        // tight-capacity path: must cleanly report overflow, not write OOB
        if (rc > 8) zt_jpeg_encode_scan(img.data(), h, w, ch, ncomp, sh,
                                        sv, q, q, dc_c, dc_l, ac_c, ac_l,
                                        out.data(), rc / 2);
    }
    fprintf(stderr, "encoder ok\n");
    return 0;
}
