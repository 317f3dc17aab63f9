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

}  // extern "C"
