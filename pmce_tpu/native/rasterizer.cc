// Software z-buffer triangle rasterizer for the demo mesh overlay.
//
// Replaces the reference's pyrender/OSMesa OpenGL renderer
// (/root/reference/demo/renderer.py:37-118) with a dependency-free C++
// rasterizer: weak-perspective projected vertices, barycentric coverage,
// z-buffered Lambertian shading composited over the input frame.
//
// Exposed via a C ABI and driven from Python through ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

// verts: [n_verts * 3] — x, y in pixels, z = depth (smaller = closer).
// faces: [n_faces * 3] vertex indices.
// image: [h * w * 3] uint8, composited in place.
// depth: [h * w] float workspace, caller-initialized to +inf.
// color: [3] base RGB in 0..255.  alpha: overlay opacity 0..1.
void rasterize_mesh(const float* verts, int n_verts,
                    const int32_t* faces, int n_faces,
                    uint8_t* image, float* depth,
                    int h, int w,
                    const float* color, float alpha) {
  // Fixed headlight direction (towards -z, slightly from above-left).
  const float lx = -0.25f, ly = -0.35f, lz = -0.90f;
  const float lnorm = std::sqrt(lx * lx + ly * ly + lz * lz);
  const float ldx = lx / lnorm, ldy = ly / lnorm, ldz = lz / lnorm;

  for (int f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f + 0];
    const int32_t i1 = faces[3 * f + 1];
    const int32_t i2 = faces[3 * f + 2];
    if (i0 >= n_verts || i1 >= n_verts || i2 >= n_verts) continue;

    const float x0 = verts[3 * i0], y0 = verts[3 * i0 + 1],
                z0 = verts[3 * i0 + 2];
    const float x1 = verts[3 * i1], y1 = verts[3 * i1 + 1],
                z1 = verts[3 * i1 + 2];
    const float x2 = verts[3 * i2], y2 = verts[3 * i2 + 1],
                z2 = verts[3 * i2 + 2];

    // Screen-space face normal for shading + backface-agnostic coverage.
    const float ax = x1 - x0, ay = y1 - y0, az = z1 - z0;
    const float bx = x2 - x0, by = y2 - y0, bz = z2 - z0;
    float nx = ay * bz - az * by;
    float ny = az * bx - ax * bz;
    float nz = ax * by - ay * bx;
    const float nn = std::sqrt(nx * nx + ny * ny + nz * nz) + 1e-12f;
    nx /= nn; ny /= nn; nz /= nn;
    float lambert = nx * ldx + ny * ldy + nz * ldz;
    if (lambert < 0) lambert = -lambert;  // double-sided
    const float shade = 0.35f + 0.65f * lambert;

    const int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    const int xmax = std::min(w - 1, (int)std::ceil(std::max({x0, x1, x2})));
    const int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    const int ymax = std::min(h - 1, (int)std::ceil(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;

    const float denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2);
    if (std::fabs(denom) < 1e-12f) continue;
    const float inv_d = 1.0f / denom;

    for (int py = ymin; py <= ymax; ++py) {
      for (int px = xmin; px <= xmax; ++px) {
        const float fx = px + 0.5f, fy = py + 0.5f;
        const float w0 = ((y1 - y2) * (fx - x2) + (x2 - x1) * (fy - y2))
                         * inv_d;
        const float w1 = ((y2 - y0) * (fx - x2) + (x0 - x2) * (fy - y2))
                         * inv_d;
        const float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        const float z = w0 * z0 + w1 * z1 + w2 * z2;
        const int idx = py * w + px;
        if (z >= depth[idx]) continue;
        depth[idx] = z;
        for (int c = 0; c < 3; ++c) {
          const float base = image[3 * idx + c];
          const float lit = color[c] * shade;
          const float out = (1.0f - alpha) * base + alpha * lit;
          image[3 * idx + c] =
              (uint8_t)std::min(255.0f, std::max(0.0f, out));
        }
      }
    }
  }
}

}  // extern "C"
