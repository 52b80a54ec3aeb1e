// Approximate convex decomposition (V-HACD-style) — native host kernels.
//
// Counterpart of the reference's `Collider::convex_decomposition`
// (/root/reference/src/collision/collider/parry/mod.rs:962-990), which
// delegates to Parry's native-Rust VHACD implementation configured by
// `VhacdParameters` (parry/mod.rs:37-108: resolution 64, plane
// downsampling 4, flood-fill voxelization, max hulls).
//
// This is an original implementation of the same two-stage algorithm:
//   1. `avt_voxelize` — voxelize the triangle mesh (surface rasterization
//      + exterior flood fill, so open meshes degrade gracefully to
//      shells), and
//   2. `avt_best_plane` — the hot inner kernel of the recursive split:
//      score every candidate axis-aligned cutting plane of a part by the
//      summed 26-DOP volume of the two halves (a k-DOP is a cheap convex
//      superset of the voxel set and a subset-ish stand-in for its convex
//      hull — the role VHACD's `convex_hull_approximation=true` default
//      plays, parry/mod.rs:73-77), plus VHACD's alpha balance bias.
//
// The greedy part loop and the exact-hull concavity accept test live in
// Python (avian_tpu/native/__init__.py), which calls these through
// ctypes; a pure-numpy fallback with identical semantics lives there too.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline long idx3(int x, int y, int z, const int* d) {
    return ((long)x * d[1] + y) * d[2] + z;
}

// 13 direction pairs of the 26-DOP: axes, face diagonals, corner
// diagonals (integer so projections of integer cells stay exact).
const int DIRS[13][3] = {
    {1, 0, 0}, {0, 1, 0}, {0, 0, 1},
    {1, 1, 0}, {1, -1, 0}, {1, 0, 1}, {1, 0, -1}, {0, 1, 1}, {0, 1, -1},
    {1, 1, 1}, {1, -1, 1}, {1, 1, -1}, {1, -1, -1},
};

}  // namespace

extern "C" {

// Surface-rasterize + exterior-flood-fill voxelization.
// V: float32[nv*3], F: int32[nf*3], dims: int32[3], origin: float32[3].
// out: uint8[nx*ny*nz], 1 = solid.
void avt_voxelize(const float* V, int nv, const int32_t* F, int nf,
                  const int32_t* dims, const float* origin, float voxel,
                  uint8_t* out) {
    (void)nv;
    const int nx = dims[0], ny = dims[1], nz = dims[2];
    const int d[3] = {nx, ny, nz};
    const long n = (long)nx * ny * nz;
    std::vector<uint8_t> surf(n, 0);
    const float inv = 1.0f / voxel;
    for (int t = 0; t < nf; t++) {
        const float* a = V + 3 * (long)F[3 * t + 0];
        const float* b = V + 3 * (long)F[3 * t + 1];
        const float* c = V + 3 * (long)F[3 * t + 2];
        float e1 = 0, e2 = 0, e3 = 0;
        for (int k = 0; k < 3; k++) {
            float ab = b[k] - a[k], ac = c[k] - a[k], bc = c[k] - b[k];
            e1 += ab * ab;
            e2 += ac * ac;
            e3 += bc * bc;
        }
        float m = std::sqrt(std::fmax(e1, std::fmax(e2, e3)));
        int ns = (int)std::ceil(m * inv * 2.0f);  // sample at voxel/2 spacing
        if (ns < 1) ns = 1;
        for (int i = 0; i <= ns; i++) {
            for (int j = 0; j <= ns - i; j++) {
                float u = (float)i / ns, v = (float)j / ns, w = 1.0f - u - v;
                int xi[3];
                for (int k = 0; k < 3; k++) {
                    float p = w * a[k] + u * b[k] + v * c[k];
                    int q = (int)std::floor((p - origin[k]) * inv);
                    if (q < 0) q = 0;
                    if (q >= d[k]) q = d[k] - 1;
                    xi[k] = q;
                }
                surf[idx3(xi[0], xi[1], xi[2], d)] = 1;
            }
        }
    }
    // Exterior flood fill (6-connected) from every boundary cell that is
    // not surface; solid = not exterior. Open meshes leak the fill and
    // degrade to a surface shell — same as Parry's FloodFill fallback.
    std::vector<uint8_t> ext(n, 0);
    std::vector<long> stack;
    stack.reserve(1 << 16);
    auto push = [&](int x, int y, int z) {
        long i = idx3(x, y, z, d);
        if (!surf[i] && !ext[i]) {
            ext[i] = 1;
            stack.push_back(i);
        }
    };
    for (int y = 0; y < ny; y++)
        for (int z = 0; z < nz; z++) {
            push(0, y, z);
            push(nx - 1, y, z);
        }
    for (int x = 0; x < nx; x++)
        for (int z = 0; z < nz; z++) {
            push(x, 0, z);
            push(x, ny - 1, z);
        }
    for (int x = 0; x < nx; x++)
        for (int y = 0; y < ny; y++) {
            push(x, y, 0);
            push(x, y, nz - 1);
        }
    while (!stack.empty()) {
        long i = stack.back();
        stack.pop_back();
        int x = (int)(i / ((long)ny * nz));
        int y = (int)((i / nz) % ny);
        int z = (int)(i % nz);
        if (x > 0) push(x - 1, y, z);
        if (x < nx - 1) push(x + 1, y, z);
        if (y > 0) push(x, y - 1, z);
        if (y < ny - 1) push(x, y + 1, z);
        if (z > 0) push(x, y, z - 1);
        if (z < nz - 1) push(x, y, z + 1);
    }
    for (long i = 0; i < n; i++) out[i] = !ext[i];
}

// Score candidate axis-aligned planes for one part (dense local grid
// `occ` of dims `ld`): cost(plane) = dop26(left) + dop26(right)
// + alpha * |nL - nR|. Writes [best_axis, best_cut] to `out` and returns
// the best cost, or -1.0 if no candidate satisfies min_voxels.
// `axis_filter` < 0 scans all three axes at stride `pd` (the coarse
// pass); otherwise only `axis_filter` within [c_lo, c_hi] at stride 1
// (the refinement pass around the coarse winner — VHACD's
// plane_downsampling refinement).
double avt_best_plane(const uint8_t* occ, const int32_t* ld, int pd,
                      int min_voxels, float alpha, int axis_filter,
                      int c_lo, int c_hi, int32_t* out) {
    const int d[3] = {ld[0], ld[1], ld[2]};
    const long n = (long)d[0] * d[1] * d[2];
    if (pd < 1) pd = 1;
    // gather occupied cells + their 13 projections
    std::vector<int> cx, cy, cz;
    for (int x = 0; x < d[0]; x++)
        for (int y = 0; y < d[1]; y++)
            for (int z = 0; z < d[2]; z++)
                if (occ[idx3(x, y, z, d)]) {
                    cx.push_back(x);
                    cy.push_back(y);
                    cz.push_back(z);
                }
    const long m = (long)cx.size();
    if (m == 0) {
        out[0] = out[1] = -1;
        return -1.0;
    }
    std::vector<int> proj(m * 13);
    for (long i = 0; i < m; i++)
        for (int k = 0; k < 13; k++)
            proj[i * 13 + k] = DIRS[k][0] * cx[i] + DIRS[k][1] * cy[i] +
                               DIRS[k][2] * cz[i];
    // counting stride: subsample the DOP-membership sweep on big parts
    int stride = n > (512L << 10) ? 2 : 1;
    double best = -1.0;
    out[0] = out[1] = -1;
    for (int axis = 0; axis < 3; axis++) {
        if (d[axis] < 2) continue;
        if (axis_filter >= 0 && axis != axis_filter) continue;
        int lo = 1, hi = d[axis] - 1, step = pd;
        if (axis_filter >= 0) {
            lo = c_lo < 1 ? 1 : c_lo;
            hi = c_hi > d[axis] - 1 ? d[axis] - 1 : c_hi;
            step = 1;
        }
        for (int c = lo; c <= hi; c += step) {
            int mnL[13], mxL[13], mnR[13], mxR[13];
            for (int k = 0; k < 13; k++) {
                mnL[k] = mnR[k] = 1 << 30;
                mxL[k] = mxR[k] = -(1 << 30);
            }
            long nl = 0, nr = 0;
            for (long i = 0; i < m; i++) {
                int q = axis == 0 ? cx[i] : (axis == 1 ? cy[i] : cz[i]);
                int *mn, *mx;
                if (q < c) {
                    nl++;
                    mn = mnL;
                    mx = mxL;
                } else {
                    nr++;
                    mn = mnR;
                    mx = mxR;
                }
                const int* p = &proj[i * 13];
                for (int k = 0; k < 13; k++) {
                    if (p[k] < mn[k]) mn[k] = p[k];
                    if (p[k] > mx[k]) mx[k] = p[k];
                }
            }
            if (nl < min_voxels || nr < min_voxels) continue;
            long cl = 0, cr = 0;
            for (int x = 0; x < d[0]; x += stride)
                for (int y = 0; y < d[1]; y += stride)
                    for (int z = 0; z < d[2]; z += stride) {
                        int p[13];
                        for (int k = 0; k < 13; k++)
                            p[k] = DIRS[k][0] * x + DIRS[k][1] * y +
                                   DIRS[k][2] * z;
                        bool inL = true, inR = true;
                        for (int k = 0; k < 13 && (inL || inR); k++) {
                            if (p[k] < mnL[k] || p[k] > mxL[k]) inL = false;
                            if (p[k] < mnR[k] || p[k] > mxR[k]) inR = false;
                        }
                        cl += inL;
                        cr += inR;
                    }
            double scale = (double)stride * stride * stride;
            double cost =
                scale * (double)(cl + cr) + alpha * (double)std::abs(nl - nr);
            if (best < 0 || cost < best) {
                best = cost;
                out[0] = axis;
                out[1] = c;
            }
        }
    }
    return best;
}

}  // extern "C"
