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
    return 0;
}
