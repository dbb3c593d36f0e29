// Native TSDF runtime core.
//
// Host-side hot loops of the meshing pipeline (the reference delegates
// these to Open3D's C++ VoxelBlockGrid, tsdf_integrate.py:29-88):
//   * tsdf_integrate_block: fuse one depth/color frame into a 16^3 block
//   * marching_tets_block: extract the zero isosurface of one block
//     (table-free marching tetrahedra)
//
// Built as a plain shared library (no pybind11 in this image); loaded via
// ctypes from cut3r_slam_tpu/utils/tsdf.py with a numpy fallback.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

static const int BLOCK = 16;

// ---------------------------------------------------------------------
// integration
// ---------------------------------------------------------------------
void tsdf_integrate_block(
    float* tsdf,          // (16,16,16) running sdf
    float* weight,        // (16,16,16) running weight
    float* color,         // (16,16,16,3) running color
    const float* depth,   // (H,W)
    const float* rgb,     // (H,W,3) or nullptr
    int H, int W,
    const float* K4,      // fx fy cx cy
    const float* w2c,     // (4,4) row-major
    const float* base,    // block origin in world (3)
    float voxel, float trunc, float max_weight, float depth_trunc)
{
    const float fx = K4[0], fy = K4[1], cx = K4[2], cy = K4[3];
    for (int z = 0; z < BLOCK; z++)
    for (int y = 0; y < BLOCK; y++)
    for (int x = 0; x < BLOCK; x++) {
        const float wx = base[0] + (x + 0.5f) * voxel;
        const float wy = base[1] + (y + 0.5f) * voxel;
        const float wz = base[2] + (z + 0.5f) * voxel;
        const float pcx = w2c[0]*wx + w2c[1]*wy + w2c[2]*wz + w2c[3];
        const float pcy = w2c[4]*wx + w2c[5]*wy + w2c[6]*wz + w2c[7];
        const float pcz = w2c[8]*wx + w2c[9]*wy + w2c[10]*wz + w2c[11];
        if (pcz <= 0.01f) continue;
        const int u = (int)(fx * pcx / pcz + cx + 0.5f);
        const int v = (int)(fy * pcy / pcz + cy + 0.5f);
        if (u < 0 || u >= W || v < 0 || v >= H) continue;
        const float d = depth[v * W + u];
        if (d <= 0.01f || d > depth_trunc) continue;
        float sdf = (d - pcz) / trunc;
        if (sdf < -1.f) continue;
        if (sdf > 1.f) sdf = 1.f;

        const int idx = (z * BLOCK + y) * BLOCK + x;
        const float w_old = weight[idx];
        const float denom = w_old + 1.f;
        tsdf[idx] = (tsdf[idx] * w_old + sdf) / denom;
        if (rgb) {
            for (int c = 0; c < 3; c++)
                color[idx * 3 + c] =
                    (color[idx * 3 + c] * w_old + rgb[(v * W + u) * 3 + c])
                    / denom;
        }
        weight[idx] = denom < max_weight ? denom : max_weight;
    }
}

// ---------------------------------------------------------------------
// isosurface extraction (block-local, with 1-voxel apron from caller)
// ---------------------------------------------------------------------
// vertex offsets of cube corners
static const int VOFF[8][3] = {
    {0,0,0},{1,0,0},{1,1,0},{0,1,0},{0,0,1},{1,0,1},{1,1,1},{0,1,1}};

// Table-free marching TETRAHEDRA: each cell splits into 6 tets around
// the main diagonal; crossing tets emit 1-2 triangles. Slightly denser
// than classic marching cubes but consistent and compact.
static const int TETS[6][4] = {
    {0,5,1,6},{0,1,2,6},{0,2,3,6},{0,3,7,6},{0,7,4,6},{0,4,5,6}};

static inline void vlerp(const float* p1, const float* p2, float v1,
                         float v2, float* out)
{
    float t = (0.f - v1) / (v2 - v1 + 1e-12f);
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    for (int i = 0; i < 3; i++) out[i] = p1[i] + t * (p2[i] - p1[i]);
}

// Marching tetrahedra over one block. sdf/wgt are (N+1)^3 grids
// (block + apron). Emits triangles into out_verts (max_tris*9 floats).
// Returns number of triangles.
int marching_tets_block(
    const float* sdf, const float* wgt, int n1 /* = BLOCK+1 */,
    const float* base, float voxel, float min_weight,
    float* out_verts, int max_tris)
{
    int ntri = 0;
    const int N = n1 - 1;
    for (int z = 0; z < N; z++)
    for (int y = 0; y < N; y++)
    for (int x = 0; x < N; x++) {
        float cv[8];  // corner values
        float cp[8][3];
        bool ok = true;
        for (int c = 0; c < 8; c++) {
            const int xx = x + VOFF[c][0], yy = y + VOFF[c][1],
                      zz = z + VOFF[c][2];
            const int idx = (zz * n1 + yy) * n1 + xx;
            if (wgt[idx] < min_weight) { ok = false; break; }
            cv[c] = sdf[idx];
            cp[c][0] = base[0] + xx * voxel;
            cp[c][1] = base[1] + yy * voxel;
            cp[c][2] = base[2] + zz * voxel;
        }
        if (!ok) continue;
        for (int t = 0; t < 6 && ntri < max_tris; t++) {
            const int* T = TETS[t];
            float v[4];
            const float* p[4];
            int neg = 0;
            for (int i = 0; i < 4; i++) {
                v[i] = cv[T[i]];
                p[i] = cp[T[i]];
                if (v[i] < 0) neg++;
            }
            if (neg == 0 || neg == 4) continue;
            // collect crossing edges of the tet
            int pairs[6][2] = {{0,1},{0,2},{0,3},{1,2},{1,3},{2,3}};
            float pts[4][3];
            int np = 0;
            for (int e = 0; e < 6; e++) {
                int a = pairs[e][0], b = pairs[e][1];
                if ((v[a] < 0) != (v[b] < 0)) {
                    vlerp(p[a], p[b], v[a], v[b], pts[np]);
                    np++;
                }
            }
            if (np == 3) {
                if (ntri < max_tris) {
                    memcpy(out_verts + ntri * 9 + 0, pts[0], 12);
                    memcpy(out_verts + ntri * 9 + 3, pts[1], 12);
                    memcpy(out_verts + ntri * 9 + 6, pts[2], 12);
                    ntri++;
                }
            } else if (np == 4) {
                // quad -> two triangles (order by pairing opposite edges)
                if (ntri + 1 < max_tris) {
                    memcpy(out_verts + ntri * 9 + 0, pts[0], 12);
                    memcpy(out_verts + ntri * 9 + 3, pts[1], 12);
                    memcpy(out_verts + ntri * 9 + 6, pts[2], 12);
                    ntri++;
                    memcpy(out_verts + ntri * 9 + 0, pts[1], 12);
                    memcpy(out_verts + ntri * 9 + 3, pts[3], 12);
                    memcpy(out_verts + ntri * 9 + 6, pts[2], 12);
                    ntri++;
                }
            }
        }
    }
    return ntri;
}

}  // extern "C"
