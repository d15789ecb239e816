// COCO-compatible RLE mask codec — native core for the evaluation stack.
//
// Replaces the pycocotools C library the reference leans on everywhere
// (dcnn/utils/mots_evaluation.py:5,45; dcnn/utils/MOT_utils.py:8,199;
// dcnn/mots_tools/mots_common/io.py:57-60): encode/decode between
// column-major binary masks and COCO uncompressed RLE, the LEB128-style
// string compression, IoU between RLE pairs, area, bbox, and merge.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// The Python wrapper (apse_uav_tpu/evaluation/rle.py) holds the numpy
// fallback and the object layer.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>

extern "C" {

// ---- raw counts <-> mask ------------------------------------------------

// Encode a column-major (Fortran-order) HxW uint8 mask into RLE counts.
// counts_out must have room for h*w+1 entries; returns the count length.
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, uint32_t* counts_out) {
    int64_t n = h * w;
    int64_t m = 0;
    uint8_t prev = 0;  // RLE starts with a run of zeros (possibly empty)
    int64_t run = 0;
    for (int64_t i = 0; i < n; i++) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v != prev) {
            counts_out[m++] = (uint32_t)run;
            run = 0;
            prev = v;
        }
        run++;
    }
    counts_out[m++] = (uint32_t)run;
    return m;
}

// Decode RLE counts into a column-major uint8 mask buffer of size h*w.
void rle_decode(const uint32_t* counts, int64_t m, uint8_t* mask_out, int64_t n) {
    int64_t pos = 0;
    uint8_t v = 0;
    for (int64_t j = 0; j < m && pos < n; j++) {
        int64_t run = counts[j];
        if (run > n - pos) run = n - pos;
        memset(mask_out + pos, v, (size_t)run);
        pos += run;
        v = !v;
    }
    if (pos < n) memset(mask_out + pos, 0, (size_t)(n - pos));
}

// ---- compressed string form (COCO "counts" strings) ---------------------

// COCO's modified LEB128: 6-bit groups, offset by 48, sign-folded deltas
// for counts beyond the first two.
int64_t rle_to_string(const uint32_t* counts, int64_t m, char* out) {
    int64_t p = 0;
    for (int64_t i = 0; i < m; i++) {
        int64_t x = (int64_t)counts[i];
        if (i > 2) x -= (int64_t)counts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? x != -1 : x != 0;
            if (more) c |= 0x20;
            c += 48;
            out[p++] = (char)c;
        }
    }
    out[p] = 0;
    return p;
}

int64_t rle_from_string(const char* s, uint32_t* counts_out) {
    int64_t m = 0;
    int64_t p = 0;
    while (s[p]) {
        int64_t x = 0;
        int64_t k = 0;
        bool more = true;
        while (more) {
            int64_t c = (int64_t)s[p] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            p++;
            k++;
            if (!more && (c & 0x10)) x |= -1L << (5 * k);
        }
        if (m > 2) x += (int64_t)counts_out[m - 2];
        counts_out[m++] = (uint32_t)x;
    }
    return m;
}

// ---- geometry on RLE ----------------------------------------------------

uint64_t rle_area(const uint32_t* counts, int64_t m) {
    uint64_t a = 0;
    for (int64_t i = 1; i < m; i += 2) a += counts[i];
    return a;
}

// Intersection-over-union between two RLEs of the same h*w extent.
// If iscrowd, computes IoA (intersection over area of the first).
double rle_iou(const uint32_t* ca, int64_t ma, const uint32_t* cb, int64_t mb, int iscrowd) {
    uint64_t inter = 0;
    // March the two run-length streams.
    int64_t ia = 0, ib = 0;
    uint64_t enda = ca[0], endb = cb[0];  // next boundary positions
    uint64_t pos = 0;
    uint8_t va = 0, vb = 0;
    uint64_t total_a = rle_area(ca, ma), total_b = rle_area(cb, mb);
    while (ia < ma && ib < mb) {
        uint64_t next_pos = std::min(enda, endb);
        if (va && vb) inter += next_pos - pos;
        pos = next_pos;
        if (pos == enda) { ia++; va = !va; if (ia < ma) enda += ca[ia]; }
        if (pos == endb) { ib++; vb = !vb; if (ib < mb) endb += cb[ib]; }
    }
    double u = iscrowd ? (double)total_a
                       : (double)(total_a + total_b - inter);
    if (u <= 0) return 0.0;
    return (double)inter / u;
}

// Union/intersection merge of two RLEs -> counts_out (cap h*w+1), returns m.
int64_t rle_merge(const uint32_t* ca, int64_t ma, const uint32_t* cb, int64_t mb,
                  int intersect, uint32_t* counts_out) {
    int64_t ia = 0, ib = 0, m = 0;
    uint64_t enda = ca[0], endb = cb[0];
    uint64_t pos = 0;
    uint8_t va = 0, vb = 0;
    uint8_t prev = 0;
    uint64_t run = 0;
    while (ia < ma && ib < mb) {
        uint64_t next_pos = std::min(enda, endb);
        uint8_t v = intersect ? (va && vb) : (va || vb);
        if (v != prev) { counts_out[m++] = (uint32_t)run; run = 0; prev = v; }
        run += next_pos - pos;
        pos = next_pos;
        if (pos == enda) { ia++; va = !va; if (ia < ma) enda += ca[ia]; }
        if (pos == endb) { ib++; vb = !vb; if (ib < mb) endb += cb[ib]; }
    }
    counts_out[m++] = (uint32_t)run;
    return m;
}

// Tight bbox (x, y, w, h) of an RLE over an h-row column-major grid.
void rle_bbox(const uint32_t* counts, int64_t m, int64_t h, double* out4) {
    int64_t xmin = INT64_MAX, xmax = -1, ymin = INT64_MAX, ymax = -1;
    uint64_t pos = 0;
    for (int64_t i = 0; i < m; i++) {
        if (i % 2 == 1 && counts[i] > 0) {
            uint64_t start = pos, end = pos + counts[i] - 1;
            int64_t x0 = (int64_t)(start / (uint64_t)h), x1 = (int64_t)(end / (uint64_t)h);
            xmin = std::min(xmin, x0); xmax = std::max(xmax, x1);
            if (x0 == x1) {
                ymin = std::min(ymin, (int64_t)(start % (uint64_t)h));
                ymax = std::max(ymax, (int64_t)(end % (uint64_t)h));
            } else {
                ymin = 0; ymax = h - 1;
            }
        }
        pos += counts[i];
    }
    if (xmax < 0) { out4[0] = out4[1] = out4[2] = out4[3] = 0.0; return; }
    out4[0] = (double)xmin; out4[1] = (double)ymin;
    out4[2] = (double)(xmax - xmin + 1); out4[3] = (double)(ymax - ymin + 1);
}

}  // extern "C"
