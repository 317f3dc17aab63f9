// Native host-side point-cloud runtime for pyLiDAR-SLAM-TPU.
//
// The reference's host hot loops live in external native deps (pykdtree,
// numba-LLVM kernels -- SURVEY.md section 2.9); the TPU build's device path
// is JAX/Pallas, and THIS module is the native host runtime around it: scan
// decoding, calibration correction, NaN scrubbing, padding and int16 upload
// quantization fused into a single C++ pass (releasing the GIL so loader
// threads overlap with device execution).
//
// Built as a plain C-ABI shared library (no Python.h dependency for the
// core) and loaded through ctypes -- see pylidar_slam_tpu/utils/native.py.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

// Fast polynomial transcendentals for the range-image encoder hot loop.
// Max error: atan2 ~5e-6 rad, asin ~2e-8 rad over the fitted domain --
// both orders of magnitude below the 1/16-sub-pixel bin width (3.8e-4 rad
// az at 1024 cols), so encodes are angularly indistinguishable from libm.
static inline float fast_atan01(float t) {  // t in [0, 1]
    float t2 = t * t;
    return t * (9.9998007e-01f + t2 * (-3.3269442e-01f + t2 *
           (1.9401986e-01f + t2 * (-1.1769517e-01f + t2 *
           (5.4082715e-02f + t2 * -1.2299740e-02f)))));
}

static inline float fast_atan2f(float y, float x) {
    float ax = std::fabs(x), ay = std::fabs(y);
    float mn = ax < ay ? ax : ay;
    float mx = ax < ay ? ay : ax;
    if (mx == 0.0f) return 0.0f;
    float a = fast_atan01(mn / mx);
    if (ay > ax) a = 1.5707963268f - a;
    if (x < 0.0f) a = 3.1415926536f - a;
    return y < 0.0f ? -a : a;
}

// Fitted on [0, 0.45] (covers +/-24.5 deg elevation FOVs); monotonic and
// over-FOV inputs still map far outside the row range, so out-of-FOV points
// are dropped exactly as with libm asin.
static inline float fast_asinf(float t) {
    float t2 = t * t;
    return t * (1.0000001f + t2 * (1.6665651e-01f + t2 * (7.5292622e-02f +
           t2 * (4.1291451e-02f + t2 * 4.6319538e-02f))));
}

extern "C" {

// Reads a KITTI .bin scan (float32 x,y,z,reflectance records), applies the
// HDL-64 0.205-degree per-point vertical-angle correction (Rodrigues about
// axis = p x z, cf. reference kitti_dataset.py:201-231), drops NaN rows,
// quantizes to int16 steps of `quantization` meters, and writes up to
// `capacity` padded rows into `out` (int16 x 3, zero padding).
//
// Returns the number of valid points written, or -1 on IO error.
int load_kitti_scan_quantized(const char* path, float quantization,
                              int16_t* out, int capacity) {
    FILE* f = std::fopen(path, "rb");
    if (f == nullptr) return -1;

    const float theta = 0.205f * 3.14159265358979f / 180.0f;
    const float c = std::cos(theta);
    const float s = std::sin(theta);
    const float inv_q = 1.0f / quantization;

    std::memset(out, 0, static_cast<size_t>(capacity) * 3 * sizeof(int16_t));

    float buffer[4 * 4096];
    int written = 0;
    size_t got;
    while ((got = std::fread(buffer, sizeof(float) * 4, 4096, f)) > 0) {
        for (size_t i = 0; i < got && written < capacity; ++i) {
            float x = buffer[4 * i + 0];
            float y = buffer[4 * i + 1];
            float z = buffer[4 * i + 2];
            if (std::isnan(x) || std::isnan(y) || std::isnan(z)) continue;

            // axis a = normalize(p x ez) = (y, -x, 0) / |(y, -x)|
            float nxy = std::sqrt(x * x + y * y);
            float ax = 0.0f, ay = 0.0f;
            if (nxy > 1e-12f) {
                ax = y / nxy;
                ay = -x / nxy;
            }
            // Rodrigues: p' = c p + s (a x p) + (1-c) (a.p) a   (az = 0)
            float adotp = ax * x + ay * y;
            float cx_ = ay * z;          // (a x p).x = ay*z - 0*y
            float cy_ = -ax * z;         // (a x p).y = 0*x - ax*z
            float cz_ = ax * y - ay * x; // (a x p).z
            float rx = c * x + s * cx_ + (1.0f - c) * adotp * ax;
            float ry = c * y + s * cy_ + (1.0f - c) * adotp * ay;
            float rz = c * z + s * cz_;

            float qx = rx * inv_q, qy = ry * inv_q, qz = rz * inv_q;
            // out-of-range points are dropped (clamping warps geometry)
            if (qx > 32767.f || qx < -32767.f || qy > 32767.f ||
                qy < -32767.f || qz > 32767.f || qz < -32767.f) continue;
            out[3 * written + 0] = static_cast<int16_t>(std::lround(qx));
            out[3 * written + 1] = static_cast<int16_t>(std::lround(qy));
            out[3 * written + 2] = static_cast<int16_t>(std::lround(qz));
            ++written;
        }
        if (written >= capacity) break;
    }
    std::fclose(f);
    return written;
}

// Float32 variant (no quantization): decode + correct + scrub + pad.
int load_kitti_scan(const char* path, float* out, int capacity) {
    FILE* f = std::fopen(path, "rb");
    if (f == nullptr) return -1;

    const float theta = 0.205f * 3.14159265358979f / 180.0f;
    const float c = std::cos(theta);
    const float s = std::sin(theta);

    std::memset(out, 0, static_cast<size_t>(capacity) * 3 * sizeof(float));

    float buffer[4 * 4096];
    int written = 0;
    size_t got;
    while ((got = std::fread(buffer, sizeof(float) * 4, 4096, f)) > 0) {
        for (size_t i = 0; i < got && written < capacity; ++i) {
            float x = buffer[4 * i + 0];
            float y = buffer[4 * i + 1];
            float z = buffer[4 * i + 2];
            if (std::isnan(x) || std::isnan(y) || std::isnan(z)) continue;
            float nxy = std::sqrt(x * x + y * y);
            float ax = 0.0f, ay = 0.0f;
            if (nxy > 1e-12f) { ax = y / nxy; ay = -x / nxy; }
            float adotp = ax * x + ay * y;
            float cx_ = ay * z, cy_ = -ax * z, cz_ = ax * y - ay * x;
            out[3 * written + 0] = c * x + s * cx_ + (1.0f - c) * adotp * ax;
            out[3 * written + 1] = c * y + s * cy_ + (1.0f - c) * adotp * ay;
            out[3 * written + 2] = c * z + s * cz_;
            ++written;
        }
        if (written >= capacity) break;
    }
    std::fclose(f);
    return written;
}

// Quantizes an (n, 3) float32 cloud into padded int16 steps (generic host
// prep for non-KITTI datasets): NaN rows dropped, zero padding to capacity.
int quantize_pad(const float* points, int n, float quantization,
                 int16_t* out, int capacity) {
    const float inv_q = 1.0f / quantization;
    std::memset(out, 0, static_cast<size_t>(capacity) * 3 * sizeof(int16_t));
    int written = 0;
    for (int i = 0; i < n && written < capacity; ++i) {
        float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
        if (std::isnan(x) || std::isnan(y) || std::isnan(z)) continue;
        float qx = x * inv_q, qy = y * inv_q, qz = z * inv_q;
        if (qx > 32767.f || qx < -32767.f || qy > 32767.f ||
            qy < -32767.f || qz > 32767.f || qz < -32767.f) continue;
        out[3 * written + 0] = static_cast<int16_t>(std::lround(qx));
        out[3 * written + 1] = static_cast<int16_t>(std::lround(qy));
        out[3 * written + 2] = static_cast<int16_t>(std::lround(qz));
        ++written;
    }
    return written;
}

// Voxel grid sampling: marks the first point of each voxel (the reference's
// numba grid_sample, pointcloud.py:182-195) with an open-addressing hash
// table -- O(n), no sort.  `keep` must hold n bytes.  Returns kept count.
int grid_sample_mask(const float* points, int n, float voxel_size,
                     uint8_t* keep) {
    // next power of two >= 2n for the table
    int table_size = 1;
    while (table_size < 2 * n) table_size <<= 1;
    const int mask = table_size - 1;
    int64_t* table = new int64_t[table_size];
    std::memset(table, 0xff, sizeof(int64_t) * table_size);  // -1 everywhere

    const float inv = 1.0f / voxel_size;
    int kept = 0;
    for (int i = 0; i < n; ++i) {
        int32_t vx = static_cast<int32_t>(std::lround(points[3 * i] * inv));
        int32_t vy = static_cast<int32_t>(std::lround(points[3 * i + 1] * inv));
        int32_t vz = static_cast<int32_t>(std::lround(points[3 * i + 2] * inv));
        int64_t h = 73856093LL * vx + 19349669LL * vy + 83492791LL * vz;
        uint64_t slot = (static_cast<uint64_t>(h) * 0x9E3779B97F4A7C15ULL) & mask;
        bool found = false;
        while (table[slot] != -1) {
            if (table[slot] == h) { found = true; break; }
            slot = (slot + 1) & mask;
        }
        if (!found) {
            table[slot] = h;
            keep[i] = 1;
            ++kept;
        } else {
            keep[i] = 0;
        }
    }
    delete[] table;
    return kept;
}

// Fused loop-closure subsample (slam/loop_closure.py): drop exact-zero
// padding rows, keep the first point per voxel (same hash as
// grid_sample_mask; matches the two-pass numpy path up to rounding of
// half-boundary points -- np.round is half-to-even, std::lround is
// half-away-from-zero, so a point exactly on a half-voxel edge may land in
// the adjacent voxel, swapping which near-duplicate survives), then select
// `cap` evenly spaced survivors (np.linspace semantics)
// straight into `out` (cap x 3 float32, caller-zeroed).  One O(n) pass
// replaces the numpy zero-drop + mask-index + linspace-gather chain that
// cost ~4.5 ms/frame on a single-core host.  Returns the number of rows
// written (<= cap).
int lc_subsample(const float* points, int n, float voxel_size, int cap,
                 float* out) {
    if (n <= 0 || cap <= 0) return 0;
    int table_size = 1;
    while (table_size < 2 * n) table_size <<= 1;
    const int mask = table_size - 1;
    int64_t* table = new int64_t[table_size];
    std::memset(table, 0xff, sizeof(int64_t) * table_size);
    int32_t* kept_idx = new int32_t[n];

    const float inv = 1.0f / voxel_size;
    int kept = 0;
    for (int i = 0; i < n; ++i) {
        const float x = points[3 * i], y = points[3 * i + 1],
                    z = points[3 * i + 2];
        if (x == 0.0f && y == 0.0f && z == 0.0f) continue;  // padding row
        int32_t vx = static_cast<int32_t>(std::lround(x * inv));
        int32_t vy = static_cast<int32_t>(std::lround(y * inv));
        int32_t vz = static_cast<int32_t>(std::lround(z * inv));
        int64_t h = 73856093LL * vx + 19349669LL * vy + 83492791LL * vz;
        uint64_t slot = (static_cast<uint64_t>(h) * 0x9E3779B97F4A7C15ULL) & mask;
        bool found = false;
        while (table[slot] != -1) {
            if (table[slot] == h) { found = true; break; }
            slot = (slot + 1) & mask;
        }
        if (!found) {
            table[slot] = h;
            kept_idx[kept++] = i;
        }
    }
    int n_out = kept < cap ? kept : cap;
    for (int k = 0; k < n_out; ++k) {
        // np.linspace(0, kept-1, cap).astype(int) == floor(k*(kept-1)/(cap-1))
        // (cap == 1 guarded: np.linspace(0, kept-1, 1) == [0]).
        int src;
        if (kept <= cap) src = kept_idx[k];
        else if (cap == 1) src = kept_idx[0];
        else src = kept_idx[(int)((int64_t)k * (kept - 1) / (cap - 1))];
        out[3 * k + 0] = points[3 * src + 0];
        out[3 * k + 1] = points[3 * src + 1];
        out[3 * k + 2] = points[3 * src + 2];
    }
    delete[] kept_idx;
    delete[] table;
    return n_out;
}

// Encodes an (n, 3) float32 cloud into the fixed-shape range-image upload
// buffer.  Per pixel the CLOSEST point wins (the spherical z-buffer,
// reference projection.py:403-415); r is its range in `range_step` steps
// (uint16 LE, 0 = empty pixel).  Three modes:
//   mode == 0: (h*w, 3) rows [r_lo, r_hi, sub] with 4+4-bit offsets
//              ((dtheta_q << 4) | dphi_q, bin centers ((q+0.5)/16 - 0.53));
//   mode == 1: (h*w, 4) rows [r_lo, r_hi, sub_t, sub_p] with 8-bit bins
//              (centers ((q+0.5)/256 - 0.53) pixels -- ~0.7 mm tangential
//              at 30 m, negligible next to sensor noise);
//   mode == 2: (h*w + (h+w)/2, 2) rows [r_lo, r_hi] followed by per-ROW
//              mean elevation offsets (h bytes) and per-COLUMN mean azimuth
//              offsets (w bytes) packed 2 bytes/row -- a spinning LiDAR's
//              beam angles are (row, col)-separable, so 8-bit PLANE means
//              replace the per-pixel offset field at 2/3 the bytes.
// Projection model and seam wrap match ops/projection.py exactly.  O(n),
// single pass, no sort.  Returns the number of non-empty pixels.
int encode_range_image(const float* pts, int n, int h, int w,
                       float fov_up, float fov_down, float range_step,
                       int mode, uint8_t* out) {
    const int sub16 = (mode == 1);
    const int planes = (mode == 2);
    const float pi = 3.14159265358979f;
    const float fov = std::fabs(fov_up) + std::fabs(fov_down);
    const float abs_down = std::fabs(fov_down);
    const int hw = h * w;
    const int bpp = sub16 ? 4 : (planes ? 2 : 3);
    const size_t out_rows = planes ? hw + (h + w + 1) / 2 : hw;
    std::memset(out, 0, out_rows * bpp);

    const float pw = 2.0f * pi / static_cast<float>(w);   // azimuth/pixel
    const float ph = fov / static_cast<float>(h);         // elevation/pixel
    const float inv_step = 1.0f / range_step;
    const float half_w = 0.5f * static_cast<float>(w) / pi;
    const float inv_fov_h = static_cast<float>(h) / fov;

    int nt = 1;
#ifdef _OPENMP
    nt = omp_get_max_threads();
    if (nt > 8) nt = 8;
    if (n < 16384) nt = 1;  // not worth the merge for small scans
#endif

    // Phase 1 (parallel over point ranges): per-thread z-buffers of
    // (steps, point index); thetas/phis cached so the merge phase does no
    // transcendentals.  Ties resolve to the lowest point index
    // (deterministic, thread-count independent).
    uint16_t* steps_t = new uint16_t[static_cast<size_t>(nt) * hw];
    int32_t* idx_t = new int32_t[static_cast<size_t>(nt) * hw];
    float* thetas = new float[n];
    float* phis = new float[n];
    std::memset(steps_t, 0xff, sizeof(uint16_t) * nt * hw);

#ifdef _OPENMP
#pragma omp parallel num_threads(nt)
#endif
    {
        int tid = 0;
#ifdef _OPENMP
        tid = omp_get_thread_num();
#endif
        uint16_t* best = steps_t + static_cast<size_t>(tid) * hw;
        int32_t* bidx = idx_t + static_cast<size_t>(tid) * hw;
        int lo = static_cast<int>(static_cast<int64_t>(n) * tid / nt);
        int hi = static_cast<int>(static_cast<int64_t>(n) * (tid + 1) / nt);

        // Two-pass blocks: pass A is BRANCHLESS (every conditional is a
        // select) so the compiler auto-vectorizes the transcendental math
        // (AVX-512: 16 points/iteration -- the encode was the single-core
        // host pipeline's bottleneck at ~2.6 ms/scan, and the math is ~80%
        // of it); pass B is the serial data-dependent z-buffer scatter.
        constexpr int BLK = 2048;
        int32_t pixbuf[BLK];
        uint16_t stepbuf[BLK];
        for (int base = lo; base < hi; base += BLK) {
            const int m = (hi - base) < BLK ? (hi - base) : BLK;
            const float* __restrict__ p = pts + static_cast<size_t>(3) * base;
            float* __restrict__ th_out = thetas + base;
            float* __restrict__ ph_out = phis + base;
            int32_t* __restrict__ pix_out = pixbuf;
            uint16_t* __restrict__ step_out = stepbuf;
#if defined(__GNUC__)
#pragma GCC ivdep
#endif
            for (int k = 0; k < m; ++k) {
                float x = p[3 * k], y = p[3 * k + 1], z = p[3 * k + 2];
                // NaN scrub without branches: comparisons with NaN are
                // false, so `finite` masks the emit below.
                bool finite = (x == x) & (y == y) & (z == z);
                float r = std::sqrt(x * x + y * y + z * z);
                float r_safe = r > 0.0f ? r : 1.0f;
                // branchless atan2 (same polynomial/error as fast_atan2f)
                float ax = std::fabs(x), ay = std::fabs(y);
                float mn = ax < ay ? ax : ay;
                float mx = ax < ay ? ay : ax;
                float a = fast_atan01(mn / (mx > 0.0f ? mx : 1.0f));
                a = ay > ax ? 1.5707963268f - a : a;
                a = x < 0.0f ? 3.1415926536f - a : a;
                a = y < 0.0f ? -a : a;
                float theta = -a;
                float phi = fast_asinf(z / r_safe);
                thetas[base + k] = theta;
                phis[base + k] = phi;
                float colf = (theta + pi) * half_w;
                float rowf = (fov - (phi + abs_down)) * inv_fov_h;
                // cap at 65534: 0xffff is the empty sentinel in the z-buffer
                float steps_f = r * inv_step;
                bool ok = finite & (r > 0.0f) & (steps_f < 65534.0f) &
                          // (int) truncates toward zero: guard the negative
                          // side so rows below -0.5 don't alias into row 0
                          (rowf >= -0.53f) &
                          (rowf < static_cast<float>(h) - 0.53f);
                // +0.03 px tie-break bias: beams sitting exactly on the
                // half-pixel rounding boundary otherwise flip per beam on
                // sub-pixel angular noise, z-buffer-colliding ~24% of a
                // 64x1024 scan; the bias exceeds the polynomial jitter and
                // the sub-pixel offset field absorbs it.
                int row = static_cast<int>(rowf + 0.53f);
                int col = static_cast<int>(colf + 0.53f);  // colf in (0, w]
                col = col >= w ? col - w : col;  // seam wraps to column 0
                float sf = steps_f < 65534.0f ? steps_f : 65534.0f;
                int st = static_cast<int>(sf + 0.5f);
                st = st < 1 ? 1 : st;
                pix_out[k] = ok ? row * w + col : -1;
                step_out[k] = static_cast<uint16_t>(st);
            }
            for (int k = 0; k < m; ++k) {
                int pix = pixbuf[k];
                if (pix < 0) continue;
                uint16_t steps = stepbuf[k];
                int i = base + k;
                if (steps < best[pix] ||
                    (steps == best[pix] && i < bidx[pix])) {
                    best[pix] = steps;
                    bidx[pix] = i;
                }
            }
        }
    }

    // Phase 2 (planes mode): serial merge accumulating per-row/per-column
    // mean angular offsets of the winners (65k pixels of sum/compare --
    // cheaper than any parallel merge of the accumulators).
    if (planes) {
        double* row_sum = new double[h]();
        double* col_sum = new double[w]();
        int* row_cnt = new int[h]();
        int* col_cnt = new int[w]();
        int hits2 = 0;
        for (int pix = 0; pix < hw; ++pix) {
            uint16_t best = 0xffff;
            int32_t win = -1;
            for (int t = 0; t < nt; ++t) {
                uint16_t s = steps_t[static_cast<size_t>(t) * hw + pix];
                if (s == 0xffff) continue;
                int32_t bi = idx_t[static_cast<size_t>(t) * hw + pix];
                if (s < best || (s == best && bi < win)) {
                    best = s;
                    win = bi;
                }
            }
            if (win < 0) continue;
            ++hits2;
            out[2 * pix + 0] = static_cast<uint8_t>(best & 0xff);
            out[2 * pix + 1] = static_cast<uint8_t>(best >> 8);
            int row = pix / w, col = pix % w;
            float theta_c = (2.0f * static_cast<float>(col) /
                             static_cast<float>(w) - 1.0f) * pi;
            float phi_c = (1.0f - static_cast<float>(row) /
                           static_cast<float>(h)) * fov - abs_down;
            float dtheta = thetas[win] - theta_c;
            if (dtheta > pi) dtheta -= 2.0f * pi;
            else if (dtheta < -pi) dtheta += 2.0f * pi;
            float dphi = phis[win] - phi_c;
            col_sum[col] += dtheta / pw + 0.53f;
            col_cnt[col] += 1;
            row_sum[row] += dphi / ph + 0.47f;
            row_cnt[row] += 1;
        }
        // Plane tail: h row bytes then w column bytes, 2 per output row
        // (quantized q = floor(mean * 256), decode (q + 0.5)/256).
        uint8_t* tail = out + static_cast<size_t>(2) * hw;
        for (int r2 = 0; r2 < h; ++r2) {
            double m = row_cnt[r2] ? row_sum[r2] / row_cnt[r2] : 0.5;
            int q = static_cast<int>(std::floor(m * 256.0));
            if (q < 0) q = 0; else if (q > 255) q = 255;
            tail[r2] = static_cast<uint8_t>(q);
        }
        for (int c2 = 0; c2 < w; ++c2) {
            double m = col_cnt[c2] ? col_sum[c2] / col_cnt[c2] : 0.5;
            int q = static_cast<int>(std::floor(m * 256.0));
            if (q < 0) q = 0; else if (q > 255) q = 255;
            tail[h + c2] = static_cast<uint8_t>(q);
        }
        delete[] row_sum;
        delete[] col_sum;
        delete[] row_cnt;
        delete[] col_cnt;
        delete[] steps_t;
        delete[] idx_t;
        delete[] thetas;
        delete[] phis;
        return hits2;
    }

    // Phase 2: merge per-thread winners and emit the packed bytes.
    int hits = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : hits) num_threads(nt)
#endif
    for (int pix = 0; pix < hw; ++pix) {
        uint16_t best = 0xffff;
        int32_t win = -1;
        for (int t = 0; t < nt; ++t) {
            uint16_t s = steps_t[static_cast<size_t>(t) * hw + pix];
            if (s == 0xffff) continue;
            int32_t bi = idx_t[static_cast<size_t>(t) * hw + pix];
            if (s < best || (s == best && bi < win)) {
                best = s;
                win = bi;
            }
        }
        if (win < 0) continue;
        ++hits;

        int row = pix / w, col = pix % w;
        float theta_c = (2.0f * static_cast<float>(col) /
                         static_cast<float>(w) - 1.0f) * pi;
        float phi_c = (1.0f - static_cast<float>(row) /
                       static_cast<float>(h)) * fov - abs_down;
        float dtheta = thetas[win] - theta_c;
        if (dtheta > pi) dtheta -= 2.0f * pi;       // seam wrap
        else if (dtheta < -pi) dtheta += 2.0f * pi;
        float dphi = phis[win] - phi_c;
        // Offset windows follow the biased rounding above: dtheta/pw lands
        // in [-0.53, 0.47) but dphi/ph in (-0.47, 0.53] (rowf runs OPPOSITE
        // to phi), so the two quantizers shift in opposite directions; a
        // symmetric [-0.5, 0.5) window clamps edge offsets (~1.5-3 cm extra
        // reconstruction error at 80 m in 4-bit mode).
        if (sub16) {
            int qt = static_cast<int>(std::floor((dtheta / pw + 0.53f) * 256.0f));
            int qp = static_cast<int>(std::floor((dphi / ph + 0.47f) * 256.0f));
            if (qt < 0) qt = 0; else if (qt > 255) qt = 255;
            if (qp < 0) qp = 0; else if (qp > 255) qp = 255;
            out[4 * pix + 0] = static_cast<uint8_t>(best & 0xff);
            out[4 * pix + 1] = static_cast<uint8_t>(best >> 8);
            out[4 * pix + 2] = static_cast<uint8_t>(qt);
            out[4 * pix + 3] = static_cast<uint8_t>(qp);
        } else {
            int qt = static_cast<int>(std::floor((dtheta / pw + 0.53f) * 16.0f));
            int qp = static_cast<int>(std::floor((dphi / ph + 0.47f) * 16.0f));
            if (qt < 0) qt = 0; else if (qt > 15) qt = 15;
            if (qp < 0) qp = 0; else if (qp > 15) qp = 15;
            out[3 * pix + 0] = static_cast<uint8_t>(best & 0xff);
            out[3 * pix + 1] = static_cast<uint8_t>(best >> 8);
            out[3 * pix + 2] = static_cast<uint8_t>((qt << 4) | qp);
        }
    }
    delete[] steps_t;
    delete[] idx_t;
    delete[] thetas;
    delete[] phis;
    return hits;
}

}  // extern "C"
