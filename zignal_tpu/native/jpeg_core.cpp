// JPEG decoder (host side, C++).
//
// Covers the reference's decode scope (reference: src/codecs/jpeg.zig):
// baseline + progressive DCT, Huffman coding, DQT/DHT/SOF0/1/2/SOS/DRI,
// restart markers, arbitrary 1-4x sampling factors (4:4:4/4:2:2/4:2:0),
// grayscale and YCbCr. Coefficients are fully buffered, then dequantized,
// IDCT'd (AAN float) and color-converted with the same fixed-point BT.601
// math as the color stack (src/color.zig:1057-1078).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <vector>

namespace {

struct HuffTable {
    // canonical code -> value decode via count/offset tables
    uint8_t counts[17] = {0};
    uint8_t values[256] = {0};
    int32_t mincode[17] = {0};
    int32_t maxcode[18] = {0};
    int32_t valptr[17] = {0};
    bool present = false;

    void build() {
        int code = 0, k = 0;
        for (int l = 1; l <= 16; ++l) {
            valptr[l] = k;
            mincode[l] = code;
            code += counts[l];
            k += counts[l];
            maxcode[l] = code - 1;
            code <<= 1;
        }
        maxcode[17] = 0x7FFFFFFF;
    }
};

struct Component {
    int id = 0, h = 1, v = 1, tq = 0;
    int dc_tbl = 0, ac_tbl = 0;
    int dc_pred = 0;
    int bx = 0, by = 0;          // blocks per row / col allocated
    std::vector<int16_t> coef;   // bx*by*64
};

struct BitReader {
    const uint8_t* data;
    int64_t len, pos;
    uint32_t buf = 0;
    int cnt = 0;
    bool marker_hit = false;

    int next_byte() {
        if (pos >= len) return -1;
        return data[pos++];
    }

    // returns bit or -1 at marker/end
    int bit() {
        if (cnt == 0) {
            int b = next_byte();
            if (b < 0) return -1;
            if (b == 0xFF) {
                int b2 = next_byte();
                if (b2 == 0x00) {
                    // stuffed
                } else if (b2 >= 0xD0 && b2 <= 0xD7) {
                    // restart marker consumed by caller normally; back up
                    pos -= 2;
                    marker_hit = true;
                    return -1;
                } else {
                    pos -= 2;
                    marker_hit = true;
                    return -1;
                }
            }
            buf = (uint32_t)b;
            cnt = 8;
        }
        cnt--;
        return (buf >> cnt) & 1;
    }

    int bits(int n) {
        int v = 0;
        for (int i = 0; i < n; ++i) {
            int b = bit();
            if (b < 0) return v << (n - 1 - i);  // pad zeros (truncated)
            v = (v << 1) | b;
        }
        return v;
    }

    void reset() { cnt = 0; marker_hit = false; }
};

int huff_decode(BitReader& br, const HuffTable& t) {
    int code = 0;
    for (int l = 1; l <= 16; ++l) {
        int b = br.bit();
        if (b < 0) return -1;
        code = (code << 1) | b;
        if (t.counts[l] && code <= t.maxcode[l]) {
            return t.values[t.valptr[l] + code - t.mincode[l]];
        }
    }
    return -1;
}

inline int extend(int v, int n) {
    return (n && v < (1 << (n - 1))) ? v - (1 << n) + 1 : v;
}

const uint8_t ZIGZAG[64] = {
    0,  1,  8, 16,  9,  2,  3, 10,
   17, 24, 32, 25, 18, 11,  4,  5,
   12, 19, 26, 33, 40, 48, 41, 34,
   27, 20, 13,  6,  7, 14, 21, 28,
   35, 42, 49, 56, 57, 50, 43, 36,
   29, 22, 15, 23, 30, 37, 44, 51,
   58, 59, 52, 45, 38, 31, 39, 46,
   53, 60, 61, 54, 47, 55, 62, 63,
};

// Separable float IDCT, 8x8. in: dequantized coefficients (natural order),
// out: 64 bytes clamped with +128 level shift. Basis table is precomputed
// once; the two passes are plain matrix products the compiler vectorizes.
struct IdctBasis {
    float cs[8][8];
    IdctBasis() {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x)
                cs[u][x] = (u == 0 ? 0.35355339059327373f : 0.5f)
                           * std::cos((2 * x + 1) * u * 0.19634954084936207f);
    }
};
static const IdctBasis kBasis;

void idct8x8(const float* in, uint8_t* out, int out_stride) {
    float tmp[64];
    for (int i = 0; i < 8; ++i) {
        const float* s = in + i * 8;
        for (int x = 0; x < 8; ++x) {
            float sum = 0.0f;
            for (int u = 0; u < 8; ++u) sum += kBasis.cs[u][x] * s[u];
            tmp[i * 8 + x] = sum;
        }
    }
    for (int x = 0; x < 8; ++x) {
        for (int y = 0; y < 8; ++y) {
            float sum = 0.0f;
            for (int u = 0; u < 8; ++u) sum += kBasis.cs[u][y] * tmp[u * 8 + x];
            int v = (int)std::lround(sum) + 128;
            out[y * out_stride + x] = (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : v);
        }
    }
}

struct Decoder {
    const uint8_t* data;
    int64_t len, pos = 0;
    uint16_t qt[4][64] = {{0}};
    HuffTable dc_tables[4], ac_tables[4];
    Component comp[4];
    int ncomp = 0, width = 0, height = 0;
    int hmax = 1, vmax = 1;
    int mcux = 0, mcuy = 0;
    int restart_interval = 0;
    bool progressive = false;
    bool seen_sos = false;
    int eobrun = 0;

    int u8() { return pos < len ? data[pos++] : -1; }
    int u16() {
        int a = u8(), b = u8();
        return (a < 0 || b < 0) ? -1 : (a << 8) | b;
    }

    int parse_headers(bool scan_only_info) {
        if (u16() != 0xFFD8) return -1;  // SOI
        for (;;) {
            int m = u8();
            while (m == 0xFF) m = u8();  // fill bytes; m now low byte
            if (m < 0) return -1;
            int marker = 0xFF00 | m;
            if (marker == 0xFFD9) return seen_sos ? 0 : -1;  // EOI
            if (marker >= 0xFFD0 && marker <= 0xFFD7) continue;
            int L = u16();
            if (L < 2) return -1;
            int64_t seg_end = pos + L - 2;
            switch (marker) {
                case 0xFFC0: case 0xFFC1: case 0xFFC2: {
                    progressive = (marker == 0xFFC2);
                    int prec = u8();
                    if (prec != 8) return -2;
                    height = u16();
                    width = u16();
                    ncomp = u8();
                    if (ncomp < 1 || ncomp > 4) return -2;
                    for (int i = 0; i < ncomp; ++i) {
                        comp[i].id = u8();
                        int hv = u8();
                        comp[i].h = hv >> 4;
                        comp[i].v = hv & 15;
                        comp[i].tq = u8();
                        if (comp[i].h < 1 || comp[i].h > 4 ||
                            comp[i].v < 1 || comp[i].v > 4) return -2;
                        hmax = comp[i].h > hmax ? comp[i].h : hmax;
                        vmax = comp[i].v > vmax ? comp[i].v : vmax;
                    }
                    if (scan_only_info) return 0;
                    mcux = (width + 8 * hmax - 1) / (8 * hmax);
                    mcuy = (height + 8 * vmax - 1) / (8 * vmax);
                    for (int i = 0; i < ncomp; ++i) {
                        comp[i].bx = mcux * comp[i].h;
                        comp[i].by = mcuy * comp[i].v;
                        comp[i].coef.assign((size_t)comp[i].bx * comp[i].by * 64, 0);
                    }
                    break;
                }
                case 0xFFC4: {  // DHT
                    while (pos < seg_end) {
                        int tc_th = u8();
                        int tc = tc_th >> 4, th = tc_th & 15;
                        if (tc > 1 || th > 3) return -1;
                        HuffTable& t = tc ? ac_tables[th] : dc_tables[th];
                        int total = 0;
                        for (int i = 1; i <= 16; ++i) {
                            int c = u8();
                            t.counts[i] = (uint8_t)c;
                            total += c;
                        }
                        if (total > 256) return -1;
                        for (int i = 0; i < total; ++i) t.values[i] = (uint8_t)u8();
                        t.build();
                        t.present = true;
                    }
                    break;
                }
                case 0xFFDB: {  // DQT
                    while (pos < seg_end) {
                        int pq_tq = u8();
                        int pq = pq_tq >> 4, tq = pq_tq & 15;
                        if (tq > 3) return -1;
                        for (int i = 0; i < 64; ++i)
                            qt[tq][ZIGZAG[i]] = pq ? (uint16_t)u16() : (uint16_t)u8();
                    }
                    break;
                }
                case 0xFFDD:  // DRI
                    restart_interval = u16();
                    break;
                case 0xFFDA:  // SOS
                    if (scan_only_info) return 0;
                    seen_sos = true;
                    if (decode_scan(seg_end) < 0) return -1;
                    continue;  // more scans (progressive / multi-scan) until EOI
                default:
                    break;  // skip APPn/COM/etc
            }
            if (pos < seg_end) pos = seg_end;
        }
    }

    Component* find_comp(int id) {
        for (int i = 0; i < ncomp; ++i)
            if (comp[i].id == id) return &comp[i];
        return nullptr;
    }

    int decode_scan(int64_t header_end) {
        int ns = u8();
        Component* scomp[4];
        for (int i = 0; i < ns; ++i) {
            int cs = u8();
            int td_ta = u8();
            Component* c = find_comp(cs);
            if (!c) return -1;
            c->dc_tbl = td_ta >> 4;
            c->ac_tbl = td_ta & 15;
            scomp[i] = c;
        }
        int ss = u8();       // spectral start
        int se = u8();       // spectral end
        int ah_al = u8();
        int ah = ah_al >> 4, al = ah_al & 15;
        (void)header_end;

        BitReader br{data, len, pos};
        eobrun = 0;
        for (int i = 0; i < ncomp; ++i) comp[i].dc_pred = 0;

        if (!progressive) {
            int rc = decode_sequential(br, scomp, ns);
            pos = br.pos;
            return rc;
        }
        int rc = decode_progressive(br, scomp, ns, ss, se, ah, al);
        pos = br.pos;
        return rc;
    }

    void handle_restart(BitReader& br, int& mcu_count) {
        if (restart_interval && mcu_count == restart_interval) {
            mcu_count = 0;
            // align to byte, expect RSTn
            br.cnt = 0;
            if (br.pos + 1 < br.len && br.data[br.pos] == 0xFF &&
                br.data[br.pos + 1] >= 0xD0 && br.data[br.pos + 1] <= 0xD7) {
                br.pos += 2;
            }
            br.marker_hit = false;
            for (int i = 0; i < ncomp; ++i) comp[i].dc_pred = 0;
            eobrun = 0;
        }
    }

    int decode_block_seq(BitReader& br, Component* c, int16_t* blk) {
        const HuffTable& dct = dc_tables[c->dc_tbl];
        const HuffTable& act = ac_tables[c->ac_tbl];
        int t = huff_decode(br, dct);
        if (t < 0) return br.marker_hit ? 0 : -1;
        int diff = t ? extend(br.bits(t), t) : 0;
        c->dc_pred += diff;
        blk[0] = (int16_t)c->dc_pred;
        int k = 1;
        while (k < 64) {
            int rs = huff_decode(br, act);
            if (rs < 0) return br.marker_hit ? 0 : -1;
            int r = rs >> 4, s = rs & 15;
            if (s == 0) {
                if (r == 15) { k += 16; continue; }
                break;  // EOB
            }
            k += r;
            if (k > 63) break;
            blk[ZIGZAG[k]] = (int16_t)extend(br.bits(s), s);
            k++;
        }
        return 0;
    }

    int decode_sequential(BitReader& br, Component** scomp, int ns) {
        int mcu_count = 0;
        if (ns == 1) {
            // non-interleaved single-component scan
            Component* c = scomp[0];
            int bw = (width * c->h / hmax + 7) / 8;
            int bh = (height * c->v / vmax + 7) / 8;
            for (int byi = 0; byi < bh; ++byi) {
                for (int bxi = 0; bxi < bw; ++bxi) {
                    handle_restart(br, mcu_count);
                    int16_t* blk = &c->coef[((size_t)byi * c->bx + bxi) * 64];
                    if (decode_block_seq(br, c, blk) < 0) return -1;
                    mcu_count++;
                }
            }
            return 0;
        }
        for (int my = 0; my < mcuy; ++my) {
            for (int mx = 0; mx < mcux; ++mx) {
                handle_restart(br, mcu_count);
                for (int i = 0; i < ns; ++i) {
                    Component* c = scomp[i];
                    for (int v = 0; v < c->v; ++v) {
                        for (int h = 0; h < c->h; ++h) {
                            int bxi = mx * c->h + h;
                            int byi = my * c->v + v;
                            int16_t* blk = &c->coef[((size_t)byi * c->bx + bxi) * 64];
                            if (decode_block_seq(br, c, blk) < 0) return -1;
                        }
                    }
                }
                mcu_count++;
            }
        }
        return 0;
    }

    int decode_prog_dc(BitReader& br, Component* c, int16_t* blk, int ah, int al) {
        if (ah == 0) {
            const HuffTable& dct = dc_tables[c->dc_tbl];
            int t = huff_decode(br, dct);
            if (t < 0) return br.marker_hit ? 0 : -1;
            int diff = t ? extend(br.bits(t), t) : 0;
            c->dc_pred += diff;
            blk[0] = (int16_t)(c->dc_pred << al);
        } else {
            if (br.bit() > 0) blk[0] |= (int16_t)(1 << al);
        }
        return 0;
    }

    int decode_prog_ac(BitReader& br, Component* c, int16_t* blk,
                       int ss, int se, int ah, int al) {
        const HuffTable& act = ac_tables[c->ac_tbl];
        if (ah == 0) {
            // first pass
            if (eobrun > 0) { eobrun--; return 0; }
            int k = ss;
            while (k <= se) {
                int rs = huff_decode(br, act);
                if (rs < 0) return br.marker_hit ? 0 : -1;
                int r = rs >> 4, s = rs & 15;
                if (s == 0) {
                    if (r < 15) {
                        eobrun = (1 << r) - 1;
                        if (r) eobrun += br.bits(r);
                        break;
                    }
                    k += 16;
                    continue;
                }
                k += r;
                if (k > 63) break;
                blk[ZIGZAG[k]] = (int16_t)(extend(br.bits(s), s) << al);
                k++;
            }
            return 0;
        }
        // refinement pass
        int p1 = 1 << al, m1 = -(1 << al);
        int k = ss;
        if (eobrun == 0) {
            while (k <= se) {
                int rs = huff_decode(br, act);
                if (rs < 0) return br.marker_hit ? 0 : -1;
                int r = rs >> 4, s = rs & 15;
                int coef_val = 0;
                if (s == 0) {
                    if (r < 15) {
                        eobrun = (1 << r);
                        if (r) eobrun += br.bits(r);
                        break;
                    }
                    // r == 15: skip 16 zero-history coefficients
                } else {
                    coef_val = br.bit() ? p1 : m1;
                }
                while (k <= se) {
                    int16_t* p = &blk[ZIGZAG[k]];
                    if (*p != 0) {
                        if (br.bit() > 0 && ((*p) & p1) == 0)
                            *p += (int16_t)((*p >= 0) ? p1 : m1);
                    } else {
                        if (r == 0) {
                            if (coef_val) *p = (int16_t)coef_val;
                            k++;
                            break;
                        }
                        r--;
                    }
                    k++;
                }
            }
        }
        if (eobrun > 0) {
            while (k <= se) {
                int16_t* p = &blk[ZIGZAG[k]];
                if (*p != 0) {
                    if (br.bit() > 0 && ((*p) & p1) == 0)
                        *p += (int16_t)((*p >= 0) ? p1 : m1);
                }
                k++;
            }
            eobrun--;
        }
        return 0;
    }

    int decode_progressive(BitReader& br, Component** scomp, int ns,
                           int ss, int se, int ah, int al) {
        int mcu_count = 0;
        if (ss == 0 && ns > 1) {
            // interleaved DC scan
            for (int my = 0; my < mcuy; ++my) {
                for (int mx = 0; mx < mcux; ++mx) {
                    handle_restart(br, mcu_count);
                    for (int i = 0; i < ns; ++i) {
                        Component* c = scomp[i];
                        for (int v = 0; v < c->v; ++v)
                            for (int h = 0; h < c->h; ++h) {
                                int16_t* blk = &c->coef[
                                    ((size_t)(my * c->v + v) * c->bx + mx * c->h + h) * 64];
                                if (decode_prog_dc(br, c, blk, ah, al) < 0) return -1;
                            }
                    }
                    mcu_count++;
                }
            }
            return 0;
        }
        // non-interleaved (DC single comp or AC scans)
        Component* c = scomp[0];
        int bw = (width * c->h / hmax + 7) / 8;
        int bh = (height * c->v / vmax + 7) / 8;
        for (int byi = 0; byi < bh; ++byi) {
            for (int bxi = 0; bxi < bw; ++bxi) {
                handle_restart(br, mcu_count);
                int16_t* blk = &c->coef[((size_t)byi * c->bx + bxi) * 64];
                int rc = (ss == 0)
                             ? decode_prog_dc(br, c, blk, ah, al)
                             : decode_prog_ac(br, c, blk, ss, se, ah, al);
                if (rc < 0) return -1;
                mcu_count++;
            }
        }
        return 0;
    }

    // Reconstruct full-resolution planes and write interleaved output.
    void reconstruct(uint8_t* out, int out_ncomp) {
        std::vector<std::vector<uint8_t>> planes(ncomp);
        std::vector<int> pw(ncomp), ph(ncomp);
        for (int i = 0; i < ncomp; ++i) {
            Component& c = comp[i];
            pw[i] = c.bx * 8;
            ph[i] = c.by * 8;
            planes[i].assign((size_t)pw[i] * ph[i], 0);
            const uint16_t* q = qt[c.tq];
            float deq[64];
            for (int byi = 0; byi < c.by; ++byi) {
                for (int bxi = 0; bxi < c.bx; ++bxi) {
                    const int16_t* blk = &c.coef[((size_t)byi * c.bx + bxi) * 64];
                    for (int k = 0; k < 64; ++k) deq[k] = (float)blk[k] * (float)q[k];
                    idct8x8(deq, &planes[i][((size_t)byi * 8) * pw[i] + bxi * 8], pw[i]);
                }
            }
        }
        // upsample + interleave + color convert
        for (int y = 0; y < height; ++y) {
            for (int x = 0; x < width; ++x) {
                int vals[4];
                for (int i = 0; i < ncomp; ++i) {
                    int sx = x * comp[i].h / hmax;
                    int sy = y * comp[i].v / vmax;
                    vals[i] = planes[i][(size_t)sy * pw[i] + sx];
                }
                uint8_t* o = out + ((size_t)y * width + x) * out_ncomp;
                if (ncomp >= 3) {
                    // fixed-point BT.601 (matches color stack)
                    int64_t Y = vals[0], cb = vals[1] - 128, cr = vals[2] - 128;
                    int64_t r = (65536 * Y + 91881 * cr + 32768) >> 16;
                    int64_t g = (65536 * Y - 22554 * cb - 46802 * cr + 32768) >> 16;
                    int64_t b = (65536 * Y + 116130 * cb + 32768) >> 16;
                    o[0] = (uint8_t)(r < 0 ? 0 : r > 255 ? 255 : r);
                    o[1] = (uint8_t)(g < 0 ? 0 : g > 255 ? 255 : g);
                    o[2] = (uint8_t)(b < 0 ? 0 : b > 255 ? 255 : b);
                } else {
                    o[0] = (uint8_t)vals[0];
                    if (out_ncomp == 3) { o[1] = o[0]; o[2] = o[0]; }
                }
            }
        }
    }
};

}  // namespace

extern "C" {

int zt_jpeg_info(const uint8_t* data, int64_t len, int* w, int* h, int* ncomp) {
    Decoder d;
    d.data = data;
    d.len = len;
    int rc = d.parse_headers(true);
    if (rc < 0) return rc;
    *w = d.width;
    *h = d.height;
    *ncomp = d.ncomp;
    return 0;
}

// out must hold width*height*out_ncomp bytes; out_ncomp: 1 (gray) or 3 (rgb).
int zt_jpeg_decode(const uint8_t* data, int64_t len, uint8_t* out, int out_ncomp) {
    Decoder d;
    d.data = data;
    d.len = len;
    int rc = d.parse_headers(false);
    if (rc < 0) return rc;
    if (d.width <= 0 || d.height <= 0) return -1;
    d.reconstruct(out, out_ncomp);
    return 0;
}

}  // extern "C"
