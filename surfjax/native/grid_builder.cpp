// Native uniform-grid builder (SURVEY.md native-code policy).
//
// engines/mesh.build_grid's triangle->cell binning is a pure-Python loop
// over (triangle x overlapped cells) — fine for the test meshes, minutes
// for production-size ones. This C++ implementation does the same
// conservative AABB binning at memory speed and is loaded via ctypes.
//
//   g++ -O2 -shared -fPIC -o libgridbuilder.so grid_builder.cpp
//
// Two-pass CSR construction: count per cell, prefix-sum, then fill.

#include <cstdint>
#include <algorithm>

namespace {
inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}
}  // namespace

extern "C" {

// Pass 1: per-cell triangle counts.
// verts: (V,3) f32; faces: (F,3) i32; bb_min/cell: (3,) f32.
// counts: (nx*ny*nz,) i32 (zeroed by the caller).
void sj_grid_count(const float *verts, const int32_t *faces, int n_faces,
                   const float *bb_min, const float *cell,
                   int nx, int ny, int nz, int32_t *counts) {
  for (int f = 0; f < n_faces; ++f) {
    const float *a = verts + 3 * faces[3 * f + 0];
    const float *b = verts + 3 * faces[3 * f + 1];
    const float *c = verts + 3 * faces[3 * f + 2];
    int lo[3], hi[3];
    const int dims[3] = {nx, ny, nz};
    for (int ax = 0; ax < 3; ++ax) {
      float mn = std::min(a[ax], std::min(b[ax], c[ax]));
      float mx = std::max(a[ax], std::max(b[ax], c[ax]));
      lo[ax] = clampi((int)((mn - bb_min[ax]) / cell[ax]), 0, dims[ax] - 1);
      hi[ax] = clampi((int)((mx - bb_min[ax]) / cell[ax]), 0, dims[ax] - 1);
    }
    for (int ix = lo[0]; ix <= hi[0]; ++ix)
      for (int iy = lo[1]; iy <= hi[1]; ++iy)
        for (int iz = lo[2]; iz <= hi[2]; ++iz)
          counts[(ix * ny + iy) * nz + iz]++;
  }
}

// Pass 2: fill the CSR cell_tris using cell_start offsets.
// cursor: scratch (ncells,) i32 (zeroed by caller); cell_start: (ncells+1,).
void sj_grid_fill(const float *verts, const int32_t *faces, int n_faces,
                  const float *bb_min, const float *cell,
                  int nx, int ny, int nz, const int32_t *cell_start,
                  int32_t *cursor, int32_t *cell_tris) {
  for (int f = 0; f < n_faces; ++f) {
    const float *a = verts + 3 * faces[3 * f + 0];
    const float *b = verts + 3 * faces[3 * f + 1];
    const float *c = verts + 3 * faces[3 * f + 2];
    int lo[3], hi[3];
    const int dims[3] = {nx, ny, nz};
    for (int ax = 0; ax < 3; ++ax) {
      float mn = std::min(a[ax], std::min(b[ax], c[ax]));
      float mx = std::max(a[ax], std::max(b[ax], c[ax]));
      lo[ax] = clampi((int)((mn - bb_min[ax]) / cell[ax]), 0, dims[ax] - 1);
      hi[ax] = clampi((int)((mx - bb_min[ax]) / cell[ax]), 0, dims[ax] - 1);
    }
    for (int ix = lo[0]; ix <= hi[0]; ++ix)
      for (int iy = lo[1]; iy <= hi[1]; ++iy)
        for (int iz = lo[2]; iz <= hi[2]; ++iz) {
          int cid = (ix * ny + iy) * nz + iz;
          cell_tris[cell_start[cid] + cursor[cid]++] = f;
        }
  }
}

}  // extern "C"
