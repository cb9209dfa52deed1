// ASan/UBSan fuzz driver for zt_jpeg_decode: truncations, byte flips,
// and random garbage must never read/write out of bounds (error codes
// are fine). Streams come from files passed on argv.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int zt_jpeg_info(const uint8_t*, int64_t, int*, int*, int*);
extern "C" int zt_jpeg_decode(const uint8_t*, int64_t, uint8_t*, int);

static uint64_t rng_state = 0x9e3779b97f4a7c15ULL;
static uint64_t rnd() {
    rng_state ^= rng_state << 13;
    rng_state ^= rng_state >> 7;
    rng_state ^= rng_state << 17;
    return rng_state;
}

static void try_decode(const std::vector<uint8_t>& d) {
    int w = 0, h = 0, nc = 0;
    if (zt_jpeg_info(d.data(), (int64_t)d.size(), &w, &h, &nc) != 0) return;
    if (w <= 0 || h <= 0 || (int64_t)w * h > 16 << 20) return;
    for (int oc : {1, 3}) {
        std::vector<uint8_t> out((size_t)w * h * oc);
        zt_jpeg_decode(d.data(), (int64_t)d.size(), out.data(), oc);
    }
}

int main(int argc, char** argv) {
    for (int i = 1; i < argc; ++i) {
        FILE* f = fopen(argv[i], "rb");
        if (!f) continue;
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> base(n);
        if (fread(base.data(), 1, n, f) != (size_t)n) { fclose(f); continue; }
        fclose(f);
        try_decode(base);
        // truncations (dense near the start where headers live)
        for (long t = 0; t < n; t += (t < 1024 ? 7 : 211)) {
            std::vector<uint8_t> d(base.begin(), base.begin() + t);
            try_decode(d);
        }
        // single-byte flips (dense over headers, sampled over scan)
        for (long p = 0; p < n; p += (p < 1024 ? 1 : 97)) {
            std::vector<uint8_t> d = base;
            d[p] ^= (uint8_t)(1 + (rnd() & 0xFE));
            try_decode(d);
        }
        // random multi-corruptions
        for (int r = 0; r < 400; ++r) {
            std::vector<uint8_t> d = base;
            int flips = 1 + (int)(rnd() % 16);
            for (int k = 0; k < flips; ++k) d[rnd() % n] = (uint8_t)rnd();
            try_decode(d);
        }
        fprintf(stderr, "fuzzed %s (%ld bytes)\n", argv[i], n);
    }
    // pure garbage with JPEG magic
    for (int r = 0; r < 300; ++r) {
        std::vector<uint8_t> d(2 + rnd() % 4096);
        d[0] = 0xFF; d[1] = 0xD8;
        for (size_t k = 2; k < d.size(); ++k) d[k] = (uint8_t)rnd();
        try_decode(d);
    }
    fprintf(stderr, "garbage pass done\n");
    return 0;
}
