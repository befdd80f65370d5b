// tcnerf native host runtime: hot host-side data-path kernels.
//
// The reference's input pipeline is single-threaded numpy inside keras
// Sequences (SURVEY.md §2.8). On a production TPU host the per-step batch
// assembly (pixel sampling -> ray back-projection -> target gather -> u8->f32
// image conversion) competes with the device for wall-clock; these C++
// implementations are OpenMP-parallel and avoid numpy temp allocations.
// Bound via ctypes (tcnerf/utils/native.py) with a transparent numpy fallback
// when the library is not built.
//
// Build: make -C native   (g++ -O3 -march=native -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Back-project pixels through a pinhole camera into world rays.
//   u, v:        [n] pixel coordinates (x = column, y = row)
//   extrinsics:  [16] row-major camera-to-world
//   k_inv:       [9]  row-major inverse intrinsics
//   rays_o/d:    [n, 3] outputs; directions normalized when normalize != 0
void rays_from_pixels(const float* u, const float* v, int64_t n,
                      const double* extrinsics, const double* k_inv,
                      int normalize, float* rays_o, float* rays_d) {
  const double r00 = extrinsics[0], r01 = extrinsics[1], r02 = extrinsics[2];
  const double r10 = extrinsics[4], r11 = extrinsics[5], r12 = extrinsics[6];
  const double r20 = extrinsics[8], r21 = extrinsics[9], r22 = extrinsics[10];
  const float ox = (float)extrinsics[3], oy = (float)extrinsics[7],
              oz = (float)extrinsics[11];
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double px = u[i], py = v[i];
    // camera-space direction = K^-1 @ (u, v, 1)
    const double cx = k_inv[0] * px + k_inv[1] * py + k_inv[2];
    const double cy = k_inv[3] * px + k_inv[4] * py + k_inv[5];
    const double cz = k_inv[6] * px + k_inv[7] * py + k_inv[8];
    double wx = r00 * cx + r01 * cy + r02 * cz;
    double wy = r10 * cx + r11 * cy + r12 * cz;
    double wz = r20 * cx + r21 * cy + r22 * cz;
    if (normalize) {
      const double inv = 1.0 / std::sqrt(wx * wx + wy * wy + wz * wz);
      wx *= inv; wy *= inv; wz *= inv;
    }
    rays_d[3 * i + 0] = (float)wx;
    rays_d[3 * i + 1] = (float)wy;
    rays_d[3 * i + 2] = (float)wz;
    rays_o[3 * i + 0] = ox;
    rays_o[3 * i + 1] = oy;
    rays_o[3 * i + 2] = oz;
  }
}

// uint8 HWC(4|3) image -> float32 HWC3 in [0, 1] (the /255 conversion every
// generator performs per view per step).
void u8_to_f32_rgb(const uint8_t* src, int64_t h, int64_t w, int64_t c,
                   float* dst) {
  const float scale = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w * c;
    float* out = dst + y * w * 3;
    for (int64_t x = 0; x < w; ++x) {
      out[3 * x + 0] = row[c * x + 0] * scale;
      out[3 * x + 1] = row[c * x + 1] * scale;
      out[3 * x + 2] = row[c * x + 2] * scale;
    }
  }
}

// Gather target RGB at integer pixel coords (row, col) -> [n, 3] in [0, 1].
void gather_target_rgb(const uint8_t* image, int64_t h, int64_t w, int64_t c,
                       const int32_t* rows, const int32_t* cols, int64_t n,
                       float* dst) {
  const float scale = 1.0f / 255.0f;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* px = image + ((int64_t)rows[i] * w + cols[i]) * c;
    dst[3 * i + 0] = px[0] * scale;
    dst[3 * i + 1] = px[1] * scale;
    dst[3 * i + 2] = px[2] * scale;
  }
}

// CPU bilinear gather (host-side oracle / debugging): feature image [h, w, c],
// queries [n, 2] as (x, y); clamped like tfa.interpolate_bilinear.
void bilinear_gather_f32(const float* image, int64_t h, int64_t w, int64_t c,
                         const float* coords_xy, int64_t n, float* dst) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float x = coords_xy[2 * i + 0];
    float y = coords_xy[2 * i + 1];
    x = x < 0 ? 0 : (x > (float)(w - 1) ? (float)(w - 1) : x);
    y = y < 0 ? 0 : (y > (float)(h - 1) ? (float)(h - 1) : y);
    float x0f = std::floor(x), y0f = std::floor(y);
    if (x0f > (float)(w - 2)) x0f = (float)(w - 2);
    if (y0f > (float)(h - 2)) y0f = (float)(h - 2);
    const float ax = x - x0f, ay = y - y0f;
    const int64_t x0 = (int64_t)x0f, y0 = (int64_t)y0f;
    const float* p00 = image + (y0 * w + x0) * c;
    const float* p01 = p00 + c;
    const float* p10 = p00 + w * c;
    const float* p11 = p10 + c;
    float* out = dst + i * c;
    for (int64_t k = 0; k < c; ++k) {
      const float top = p00[k] + ax * (p01[k] - p00[k]);
      const float bot = p10[k] + ax * (p11[k] - p10[k]);
      out[k] = top + ay * (bot - top);
    }
  }
}

int tcnerf_native_version() { return 1; }

}  // extern "C"
