// hpslam_native — first-party C++ runtime components for the TPU-native
// Hierarchical Point-SLAM framework.
//
// Replaces the reference's Open3D (C++/CUDA) dependency (SURVEY.md N2):
//   * block-sparse TSDF fusion  (o3d ScalableTSDFVolume.integrate,
//     reference src/tools/get_mesh_tsdf_fusion.py:231-266)
//   * isosurface extraction via marching tetrahedra (o3d
//     extract_triangle_mesh; tetrahedra chosen over classic marching cubes
//     for a table-free, provably-watertight-per-cell implementation)
//   * KD-tree nearest neighbour queries (o3d KDTreeFlann)
//   * PCA normal estimation (o3d estimate_normals)
//   * point-to-plane ICP (o3d registration_icp,
//     reference src/common.py:584-593)
//
// Exposed as a C ABI consumed through ctypes (hpslam_tpu/native/__init__.py).
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>
#include <array>

namespace {

// ---------------------------------------------------------------- KD-tree
struct KDNode {
    int axis;       // -1 for leaf
    float split;
    int left, right;   // children or [begin,end) into indices for leaf
    int begin, end;
};

struct KDTree {
    std::vector<float> pts;   // (n, 3)
    std::vector<int> idx;
    std::vector<KDNode> nodes;
    int n = 0;

    void build(const float* p, int count) {
        n = count;
        pts.assign(p, p + 3 * count);
        idx.resize(count);
        for (int i = 0; i < count; ++i) idx[i] = i;
        nodes.clear();
        if (count > 0) build_rec(0, count);
    }

    int build_rec(int b, int e) {
        int id = (int)nodes.size();
        nodes.push_back({});
        KDNode& nd = nodes[id];
        if (e - b <= 16) {
            nd.axis = -1; nd.begin = b; nd.end = e;
            return id;
        }
        // pick widest axis
        float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
        for (int i = b; i < e; ++i)
            for (int a = 0; a < 3; ++a) {
                float v = pts[3 * idx[i] + a];
                mn[a] = std::min(mn[a], v); mx[a] = std::max(mx[a], v);
            }
        int axis = 0;
        for (int a = 1; a < 3; ++a)
            if (mx[a] - mn[a] > mx[axis] - mn[axis]) axis = a;
        int m = (b + e) / 2;
        std::nth_element(idx.begin() + b, idx.begin() + m, idx.begin() + e,
                         [&](int i, int j) {
                             return pts[3 * i + axis] < pts[3 * j + axis];
                         });
        float split = pts[3 * idx[m] + axis];
        nd.axis = axis; nd.split = split; nd.begin = b; nd.end = e;
        int l = build_rec(b, m);
        int r = build_rec(m, e);
        nodes[id].left = l;   // (re-index: vector may have reallocated)
        nodes[id].right = r;
        return id;
    }

    void nearest_rec(int node, const float* q, int& best, float& bestd) const {
        const KDNode& nd = nodes[node];
        if (nd.axis < 0) {
            for (int i = nd.begin; i < nd.end; ++i) {
                const float* p = &pts[3 * idx[i]];
                float d = (p[0]-q[0])*(p[0]-q[0]) + (p[1]-q[1])*(p[1]-q[1])
                        + (p[2]-q[2])*(p[2]-q[2]);
                if (d < bestd) { bestd = d; best = idx[i]; }
            }
            return;
        }
        float diff = q[nd.axis] - nd.split;
        int first = diff <= 0 ? nd.left : nd.right;
        int second = diff <= 0 ? nd.right : nd.left;
        nearest_rec(first, q, best, bestd);
        if (diff * diff < bestd) nearest_rec(second, q, best, bestd);
    }

    int nearest(const float* q, float* d2out) const {
        int best = -1; float bestd = 1e30f;
        if (!nodes.empty()) nearest_rec(0, q, best, bestd);
        if (d2out) *d2out = bestd;
        return best;
    }

    void knn_rec(int node, const float* q, int k, std::vector<std::pair<float,int>>& heap) const {
        const KDNode& nd = nodes[node];
        if (nd.axis < 0) {
            for (int i = nd.begin; i < nd.end; ++i) {
                const float* p = &pts[3 * idx[i]];
                float d = (p[0]-q[0])*(p[0]-q[0]) + (p[1]-q[1])*(p[1]-q[1])
                        + (p[2]-q[2])*(p[2]-q[2]);
                if ((int)heap.size() < k) {
                    heap.push_back({d, idx[i]});
                    std::push_heap(heap.begin(), heap.end());
                } else if (d < heap.front().first) {
                    std::pop_heap(heap.begin(), heap.end());
                    heap.back() = {d, idx[i]};
                    std::push_heap(heap.begin(), heap.end());
                }
            }
            return;
        }
        float diff = q[nd.axis] - nd.split;
        int first = diff <= 0 ? nd.left : nd.right;
        int second = diff <= 0 ? nd.right : nd.left;
        knn_rec(first, q, k, heap);
        float worst = (int)heap.size() < k ? 1e30f : heap.front().first;
        if (diff * diff < worst) knn_rec(second, q, k, heap);
    }
};

// ------------------------------------------------------------ TSDF volume
struct BlockKey {
    int32_t x, y, z;
    bool operator==(const BlockKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};
struct BlockHash {
    size_t operator()(const BlockKey& k) const {
        return ((size_t)(uint32_t)k.x * 73856093u)
             ^ ((size_t)(uint32_t)k.y * 19349669u)
             ^ ((size_t)(uint32_t)k.z * 83492791u);
    }
};

constexpr int BS = 8;  // voxels per block side

struct Block {
    float tsdf[BS * BS * BS];
    float weight[BS * BS * BS];
    float color[BS * BS * BS * 3];
    Block() {
        std::fill(tsdf, tsdf + BS * BS * BS, 1.0f);
        std::fill(weight, weight + BS * BS * BS, 0.0f);
        std::fill(color, color + BS * BS * BS * 3, 0.0f);
    }
};

struct TSDFVolume {
    float voxel_size;
    float sdf_trunc;
    std::unordered_map<BlockKey, Block, BlockHash> blocks;

    float* voxel(const BlockKey& bk, int vx, int vy, int vz, float** w, float** c) {
        Block& b = blocks[bk];
        int li = (vz * BS + vy) * BS + vx;
        *w = &b.weight[li];
        *c = &b.color[3 * li];
        return &b.tsdf[li];
    }

    // Query tsdf at global voxel coords (allocated blocks only).
    bool query(int gx, int gy, int gz, float* t, float* w, float c[3]) const {
        BlockKey bk{(int32_t)std::floor((float)gx / BS),
                    (int32_t)std::floor((float)gy / BS),
                    (int32_t)std::floor((float)gz / BS)};
        auto it = blocks.find(bk);
        if (it == blocks.end()) return false;
        int vx = gx - bk.x * BS, vy = gy - bk.y * BS, vz = gz - bk.z * BS;
        int li = (vz * BS + vy) * BS + vx;
        *t = it->second.tsdf[li];
        *w = it->second.weight[li];
        c[0] = it->second.color[3 * li];
        c[1] = it->second.color[3 * li + 1];
        c[2] = it->second.color[3 * li + 2];
        return true;
    }
};

// per-thread-unsafe global registries keyed by handle
std::unordered_map<int64_t, TSDFVolume*> g_volumes;
std::unordered_map<int64_t, KDTree*> g_trees;
int64_t g_next_handle = 1;

struct MeshBuffers {
    std::vector<float> verts;
    std::vector<float> cols;
    std::vector<int32_t> faces;
};
std::unordered_map<int64_t, MeshBuffers*> g_meshes;

}  // namespace

extern "C" {

// ---------------------------------------------------------------- TSDF API
int64_t tsdf_create(float voxel_size, float sdf_trunc) {
    auto* v = new TSDFVolume();
    v->voxel_size = voxel_size;
    v->sdf_trunc = sdf_trunc;
    int64_t h = g_next_handle++;
    g_volumes[h] = v;
    return h;
}

void tsdf_destroy(int64_t h) {
    auto it = g_volumes.find(h);
    if (it != g_volumes.end()) { delete it->second; g_volumes.erase(it); }
}

// depth (H*W f32, metres; <=0 = invalid), color (H*W*3 f32 in [0,1]),
// intr = [fx, fy, cx, cy], w2c = row-major 4x4 world->camera in the
// standard CV convention (+z forward).  depth_trunc caps integration range.
void tsdf_integrate(int64_t h, const float* depth, const float* color,
                    int H, int W, const float* intr, const float* w2c,
                    float depth_trunc) {
    TSDFVolume& V = *g_volumes[h];
    const float fx = intr[0], fy = intr[1], cx = intr[2], cy = intr[3];
    const float vs = V.voxel_size, trunc = V.sdf_trunc;

    // camera->world = inverse of rigid w2c
    float R[9] = {w2c[0], w2c[1], w2c[2], w2c[4], w2c[5], w2c[6],
                  w2c[8], w2c[9], w2c[10]};
    float t[3] = {w2c[3], w2c[7], w2c[11]};
    // c2w rotation = R^T, translation = -R^T t
    float c2wR[9] = {R[0], R[3], R[6], R[1], R[4], R[7], R[2], R[5], R[8]};
    float c2wt[3] = {-(c2wR[0]*t[0] + c2wR[1]*t[1] + c2wR[2]*t[2]),
                     -(c2wR[3]*t[0] + c2wR[4]*t[1] + c2wR[5]*t[2]),
                     -(c2wR[6]*t[0] + c2wR[7]*t[1] + c2wR[8]*t[2])};

    // 1. allocate blocks along each pixel ray in [d - trunc, d + trunc]
    const int stride = 2;  // every other pixel suffices for allocation
    for (int py = 0; py < H; py += stride) {
        for (int px = 0; px < W; px += stride) {
            float d = depth[py * W + px];
            if (d <= 0 || d > depth_trunc) continue;
            float xc = (px - cx) / fx, yc = (py - cy) / fy;
            float dirc[3] = {xc, yc, 1.0f};
            float dirw[3] = {
                c2wR[0]*dirc[0] + c2wR[1]*dirc[1] + c2wR[2]*dirc[2],
                c2wR[3]*dirc[0] + c2wR[4]*dirc[1] + c2wR[5]*dirc[2],
                c2wR[6]*dirc[0] + c2wR[7]*dirc[1] + c2wR[8]*dirc[2]};
            for (float s = d - trunc; s <= d + trunc + 1e-6f; s += BS * vs * 0.5f) {
                float p[3] = {c2wt[0] + dirw[0] * s, c2wt[1] + dirw[1] * s,
                              c2wt[2] + dirw[2] * s};
                BlockKey bk{(int32_t)std::floor(p[0] / (BS * vs)),
                            (int32_t)std::floor(p[1] / (BS * vs)),
                            (int32_t)std::floor(p[2] / (BS * vs))};
                // allocate 1-neighbourhood to be safe at block borders
                for (int dz = -1; dz <= 1; ++dz)
                    for (int dy = -1; dy <= 1; ++dy)
                        for (int dx = -1; dx <= 1; ++dx)
                            V.blocks.emplace(
                                BlockKey{bk.x + dx, bk.y + dy, bk.z + dz},
                                Block());
            }
        }
    }

    // 2. integrate every allocated voxel that projects into this frame
    for (auto& kv : V.blocks) {
        const BlockKey& bk = kv.first;
        Block& blk = kv.second;
        for (int vz = 0; vz < BS; ++vz)
            for (int vy = 0; vy < BS; ++vy)
                for (int vx = 0; vx < BS; ++vx) {
                    float pw[3] = {(bk.x * BS + vx + 0.5f) * vs,
                                   (bk.y * BS + vy + 0.5f) * vs,
                                   (bk.z * BS + vz + 0.5f) * vs};
                    float pc[3] = {
                        R[0]*pw[0] + R[1]*pw[1] + R[2]*pw[2] + t[0],
                        R[3]*pw[0] + R[4]*pw[1] + R[5]*pw[2] + t[1],
                        R[6]*pw[0] + R[7]*pw[1] + R[8]*pw[2] + t[2]};
                    if (pc[2] <= 0.05f) continue;
                    int u = (int)std::lround(fx * pc[0] / pc[2] + cx);
                    int v = (int)std::lround(fy * pc[1] / pc[2] + cy);
                    if (u < 0 || u >= W || v < 0 || v >= H) continue;
                    float d = depth[v * W + u];
                    if (d <= 0 || d > depth_trunc) continue;
                    float sdf = d - pc[2];
                    if (sdf < -trunc) continue;
                    float tsdf = std::min(1.0f, sdf / trunc);
                    int li = (vz * BS + vy) * BS + vx;
                    float w0 = blk.weight[li];
                    float w1 = w0 + 1.0f;
                    blk.tsdf[li] = (blk.tsdf[li] * w0 + tsdf) / w1;
                    if (color) {
                        const float* c = &color[3 * (v * W + u)];
                        for (int a = 0; a < 3; ++a)
                            blk.color[3 * li + a] =
                                (blk.color[3 * li + a] * w0 + c[a]) / w1;
                    }
                    blk.weight[li] = w1;
                }
    }
}

// -------------------------------------------------- marching tetrahedra
namespace {
// The 6-tetrahedra decomposition of a cube (corner indices).
const int TETS[6][4] = {{0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
                        {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};
const int CORNER[8][3] = {{0,0,0}, {1,0,0}, {1,1,0}, {0,1,0},
                          {0,0,1}, {1,0,1}, {1,1,1}, {0,1,1}};

struct VertexAccum {
    std::vector<float>* verts;
    std::vector<float>* cols;
    std::vector<int32_t>* faces;
    std::unordered_map<uint64_t, int>* edge_cache;
};

inline uint64_t edge_key(uint64_t a, uint64_t b) {
    if (a > b) std::swap(a, b);
    return (a << 32) | b;
}
}  // namespace

// Extract a triangle mesh from the TSDF volume.  Returns a mesh handle;
// query sizes with mesh_counts and copy with mesh_copy.
int64_t tsdf_extract(int64_t h, float weight_thresh) {
    TSDFVolume& V = *g_volumes[h];
    auto* M = new MeshBuffers();
    std::unordered_map<uint64_t, int> edge_cache;
    const float vs = V.voxel_size;

    auto corner_value = [&](int gx, int gy, int gz, float* t, float c[3]) {
        float w;
        if (!V.query(gx, gy, gz, t, &w, c)) return false;
        return w > weight_thresh;
    };

    auto emit_vertex = [&](int64_t ga[3], int64_t gb[3], float ta, float tb,
                           const float ca[3], const float cb[3]) -> int {
        // hash on packed voxel ids (21 bits per axis, offset to positive)
        auto pack = [](const int64_t g[3]) {
            return (uint64_t)((g[0] + (1 << 20)) |
                   ((uint64_t)(g[1] + (1 << 20)) << 21) |
                   ((uint64_t)(g[2] + (1 << 20)) << 42));
        };
        uint64_t key = edge_key(pack(ga), pack(gb));
        auto it = edge_cache.find(key);
        if (it != edge_cache.end()) return it->second;
        float denom = ta - tb;
        float alpha = std::fabs(denom) < 1e-12f ? 0.5f : ta / denom;
        alpha = std::max(0.0f, std::min(1.0f, alpha));
        float p[3], c[3];
        for (int a = 0; a < 3; ++a) {
            float pa = (ga[a] + 0.5f) * vs;
            float pb = (gb[a] + 0.5f) * vs;
            p[a] = pa + alpha * (pb - pa);
            c[a] = ca[a] + alpha * (cb[a] - ca[a]);
        }
        int id = (int)(M->verts.size() / 3);
        M->verts.insert(M->verts.end(), p, p + 3);
        M->cols.insert(M->cols.end(), c, c + 3);
        edge_cache[key] = id;
        return id;
    };

    for (auto& kv : V.blocks) {
        const BlockKey& bk = kv.first;
        for (int vz = 0; vz < BS; ++vz)
            for (int vy = 0; vy < BS; ++vy)
                for (int vx = 0; vx < BS; ++vx) {
                    int64_t gx = (int64_t)bk.x * BS + vx;
                    int64_t gy = (int64_t)bk.y * BS + vy;
                    int64_t gz = (int64_t)bk.z * BS + vz;
                    float tv[8], cv[8][3];
                    int64_t gc[8][3];
                    bool ok = true;
                    for (int c = 0; c < 8 && ok; ++c) {
                        gc[c][0] = gx + CORNER[c][0];
                        gc[c][1] = gy + CORNER[c][1];
                        gc[c][2] = gz + CORNER[c][2];
                        ok = corner_value((int)gc[c][0], (int)gc[c][1],
                                          (int)gc[c][2], &tv[c], cv[c]);
                    }
                    if (!ok) continue;
                    for (const auto& tet : TETS) {
                        int vid[4] = {tet[0], tet[1], tet[2], tet[3]};
                        uint8_t code = 0;
                        for (int a = 0; a < 4; ++a)
                            if (tv[vid[a]] < 0) code |= (1 << a);
                        if (code == 0 || code == 15) continue;
                        // collect crossing edges of the tet
                        int inside[4], outside[4];
                        int ni = 0, no = 0;
                        for (int a = 0; a < 4; ++a) {
                            if (tv[vid[a]] < 0) inside[ni++] = vid[a];
                            else outside[no++] = vid[a];
                        }
                        auto mkv = [&](int ia, int ib) {
                            return emit_vertex(gc[ia], gc[ib], tv[ia], tv[ib],
                                               cv[ia], cv[ib]);
                        };
                        if (ni == 1) {
                            int a = mkv(inside[0], outside[0]);
                            int b = mkv(inside[0], outside[1]);
                            int c = mkv(inside[0], outside[2]);
                            M->faces.insert(M->faces.end(), {a, b, c});
                        } else if (ni == 3) {
                            int a = mkv(inside[0], outside[0]);
                            int b = mkv(inside[1], outside[0]);
                            int c = mkv(inside[2], outside[0]);
                            M->faces.insert(M->faces.end(), {a, b, c});
                        } else {  // ni == 2: quad -> 2 triangles
                            int a = mkv(inside[0], outside[0]);
                            int b = mkv(inside[0], outside[1]);
                            int c = mkv(inside[1], outside[1]);
                            int d = mkv(inside[1], outside[0]);
                            M->faces.insert(M->faces.end(), {a, b, c});
                            M->faces.insert(M->faces.end(), {a, c, d});
                        }
                    }
                }
    }
    int64_t mh = g_next_handle++;
    g_meshes[mh] = M;
    return mh;
}

void mesh_counts(int64_t mh, int64_t* n_verts, int64_t* n_faces) {
    MeshBuffers* M = g_meshes[mh];
    *n_verts = (int64_t)(M->verts.size() / 3);
    *n_faces = (int64_t)(M->faces.size() / 3);
}

void mesh_copy(int64_t mh, float* verts, float* cols, int32_t* faces) {
    MeshBuffers* M = g_meshes[mh];
    std::memcpy(verts, M->verts.data(), M->verts.size() * sizeof(float));
    std::memcpy(cols, M->cols.data(), M->cols.size() * sizeof(float));
    std::memcpy(faces, M->faces.data(), M->faces.size() * sizeof(int32_t));
}

void mesh_destroy(int64_t mh) {
    auto it = g_meshes.find(mh);
    if (it != g_meshes.end()) { delete it->second; g_meshes.erase(it); }
}

// ---------------------------------------------------------------- KD-tree
int64_t kdtree_build(const float* pts, int64_t n) {
    auto* t = new KDTree();
    t->build(pts, (int)n);
    int64_t h = g_next_handle++;
    g_trees[h] = t;
    return h;
}

void kdtree_destroy(int64_t h) {
    auto it = g_trees.find(h);
    if (it != g_trees.end()) { delete it->second; g_trees.erase(it); }
}

// nearest neighbour for each query; writes index and squared distance
void kdtree_nearest(int64_t h, const float* q, int64_t nq, int32_t* out_idx,
                    float* out_d2) {
    KDTree* t = g_trees[h];
    for (int64_t i = 0; i < nq; ++i)
        out_idx[i] = t->nearest(q + 3 * i, out_d2 + i);
}

void kdtree_knn(int64_t h, const float* q, int64_t nq, int k,
                int32_t* out_idx, float* out_d2) {
    KDTree* t = g_trees[h];
    std::vector<std::pair<float,int>> heap;
    for (int64_t i = 0; i < nq; ++i) {
        heap.clear();
        if (!t->nodes.empty()) t->knn_rec(0, q + 3 * i, k, heap);
        std::sort_heap(heap.begin(), heap.end());
        for (int a = 0; a < k; ++a) {
            if (a < (int)heap.size()) {
                out_d2[i * k + a] = heap[a].first;
                out_idx[i * k + a] = heap[a].second;
            } else {
                out_d2[i * k + a] = 1e30f;
                out_idx[i * k + a] = -1;
            }
        }
    }
}

// ------------------------------------------------------- normals and ICP
// PCA normals from k nearest neighbours; optionally orient towards a
// viewpoint (o3d estimate_normals + orient_normals_towards_camera_location,
// reference Mapper.py:1082-1085).
void estimate_normals(const float* pts, int64_t n, int k, const float* viewpoint,
                      float* out_normals) {
    KDTree tree;
    tree.build(pts, (int)n);
    std::vector<std::pair<float,int>> heap;
    for (int64_t i = 0; i < n; ++i) {
        heap.clear();
        tree.knn_rec(0, pts + 3 * i, k, heap);
        // covariance
        double mean[3] = {0, 0, 0};
        for (auto& pr : heap)
            for (int a = 0; a < 3; ++a) mean[a] += pts[3 * pr.second + a];
        for (int a = 0; a < 3; ++a) mean[a] /= (double)heap.size();
        double C[6] = {0, 0, 0, 0, 0, 0};  // xx xy xz yy yz zz
        for (auto& pr : heap) {
            double d[3] = {pts[3*pr.second] - mean[0],
                           pts[3*pr.second+1] - mean[1],
                           pts[3*pr.second+2] - mean[2]};
            C[0] += d[0]*d[0]; C[1] += d[0]*d[1]; C[2] += d[0]*d[2];
            C[3] += d[1]*d[1]; C[4] += d[1]*d[2]; C[5] += d[2]*d[2];
        }
        // smallest-eigenvector via inverse power iteration on (C + eps I)^-1:
        // use simple Jacobi-free approach — power iteration on
        // (trace*I - C) whose largest eigenvector is C's smallest.
        double tr = C[0] + C[3] + C[5];
        double A[9] = {tr - C[0], -C[1], -C[2],
                       -C[1], tr - C[3], -C[4],
                       -C[2], -C[4], tr - C[5]};
        double v[3] = {1.0, 1.0, 1.0};
        for (int it = 0; it < 24; ++it) {
            double w[3] = {A[0]*v[0] + A[1]*v[1] + A[2]*v[2],
                           A[3]*v[0] + A[4]*v[1] + A[5]*v[2],
                           A[6]*v[0] + A[7]*v[1] + A[8]*v[2]};
            double norm = std::sqrt(w[0]*w[0] + w[1]*w[1] + w[2]*w[2]);
            if (norm < 1e-20) break;
            v[0] = w[0]/norm; v[1] = w[1]/norm; v[2] = w[2]/norm;
        }
        if (viewpoint) {
            double to_vp[3] = {viewpoint[0] - pts[3*i],
                               viewpoint[1] - pts[3*i+1],
                               viewpoint[2] - pts[3*i+2]};
            if (v[0]*to_vp[0] + v[1]*to_vp[1] + v[2]*to_vp[2] < 0) {
                v[0] = -v[0]; v[1] = -v[1]; v[2] = -v[2];
            }
        }
        out_normals[3*i] = (float)v[0];
        out_normals[3*i+1] = (float)v[1];
        out_normals[3*i+2] = (float)v[2];
    }
}

// ------------------------------------------------------- BVH raycaster
namespace {

struct AABB {
    float mn[3] = {1e30f, 1e30f, 1e30f};
    float mx[3] = {-1e30f, -1e30f, -1e30f};
    void grow(const float* p) {
        for (int a = 0; a < 3; ++a) {
            mn[a] = std::min(mn[a], p[a]);
            mx[a] = std::max(mx[a], p[a]);
        }
    }
    void grow(const AABB& o) {
        for (int a = 0; a < 3; ++a) {
            mn[a] = std::min(mn[a], o.mn[a]);
            mx[a] = std::max(mx[a], o.mx[a]);
        }
    }
    bool hit(const float* o, const float* inv_d, float tmax) const {
        float t0 = 1e-5f, t1 = tmax;
        for (int a = 0; a < 3; ++a) {
            float ta = (mn[a] - o[a]) * inv_d[a];
            float tb = (mx[a] - o[a]) * inv_d[a];
            if (ta > tb) std::swap(ta, tb);
            t0 = std::max(t0, ta);
            t1 = std::min(t1, tb);
            if (t0 > t1) return false;
        }
        return true;
    }
};

struct BVHNode {
    AABB box;
    int left = -1, right = -1;   // children, or leaf range
    int begin = 0, end = 0;
};

struct BVH {
    std::vector<float> verts;
    std::vector<int32_t> faces;
    std::vector<int> tri_idx;
    std::vector<BVHNode> nodes;
    std::vector<float> centroids;

    void build(const float* v, int64_t nv, const int32_t* f, int64_t nf) {
        verts.assign(v, v + 3 * nv);
        faces.assign(f, f + 3 * nf);
        tri_idx.resize(nf);
        centroids.resize(3 * nf);
        for (int64_t i = 0; i < nf; ++i) {
            tri_idx[i] = (int)i;
            for (int a = 0; a < 3; ++a)
                centroids[3*i+a] = (verts[3*faces[3*i]+a]
                                  + verts[3*faces[3*i+1]+a]
                                  + verts[3*faces[3*i+2]+a]) / 3.0f;
        }
        nodes.clear();
        if (nf > 0) build_rec(0, (int)nf);
    }

    int build_rec(int b, int e) {
        int id = (int)nodes.size();
        nodes.push_back({});
        AABB box;
        for (int i = b; i < e; ++i) {
            int t = tri_idx[i];
            box.grow(&verts[3*faces[3*t]]);
            box.grow(&verts[3*faces[3*t+1]]);
            box.grow(&verts[3*faces[3*t+2]]);
        }
        nodes[id].box = box;
        if (e - b <= 4) {
            nodes[id].begin = b; nodes[id].end = e;
            return id;
        }
        int axis = 0;
        float ext[3];
        for (int a = 0; a < 3; ++a) ext[a] = box.mx[a] - box.mn[a];
        if (ext[1] > ext[0]) axis = 1;
        if (ext[2] > ext[axis]) axis = 2;
        int m = (b + e) / 2;
        std::nth_element(tri_idx.begin() + b, tri_idx.begin() + m,
                         tri_idx.begin() + e, [&](int i, int j) {
                             return centroids[3*i+axis] < centroids[3*j+axis];
                         });
        int l = build_rec(b, m);
        int r = build_rec(m, e);
        nodes[id].left = l;
        nodes[id].right = r;
        nodes[id].begin = -1;
        return id;
    }

    // Moller-Trumbore; returns t or -1
    float intersect_tri(int t, const float* o, const float* d) const {
        const float* p0 = &verts[3*faces[3*t]];
        const float* p1 = &verts[3*faces[3*t+1]];
        const float* p2 = &verts[3*faces[3*t+2]];
        float e1[3] = {p1[0]-p0[0], p1[1]-p0[1], p1[2]-p0[2]};
        float e2[3] = {p2[0]-p0[0], p2[1]-p0[1], p2[2]-p0[2]};
        float pv[3] = {d[1]*e2[2]-d[2]*e2[1], d[2]*e2[0]-d[0]*e2[2],
                       d[0]*e2[1]-d[1]*e2[0]};
        float det = e1[0]*pv[0] + e1[1]*pv[1] + e1[2]*pv[2];
        if (std::fabs(det) < 1e-12f) return -1.0f;
        float inv = 1.0f / det;
        float tv[3] = {o[0]-p0[0], o[1]-p0[1], o[2]-p0[2]};
        float u = (tv[0]*pv[0] + tv[1]*pv[1] + tv[2]*pv[2]) * inv;
        if (u < 0 || u > 1) return -1.0f;
        float qv[3] = {tv[1]*e1[2]-tv[2]*e1[1], tv[2]*e1[0]-tv[0]*e1[2],
                       tv[0]*e1[1]-tv[1]*e1[0]};
        float vv = (d[0]*qv[0] + d[1]*qv[1] + d[2]*qv[2]) * inv;
        if (vv < 0 || u + vv > 1) return -1.0f;
        float t_hit = (e2[0]*qv[0] + e2[1]*qv[1] + e2[2]*qv[2]) * inv;
        return t_hit > 1e-5f ? t_hit : -1.0f;
    }

    float cast(const float* o, const float* d) const {
        if (nodes.empty()) return -1.0f;
        float inv_d[3];
        for (int a = 0; a < 3; ++a)
            inv_d[a] = 1.0f / (std::fabs(d[a]) < 1e-12f
                               ? std::copysign(1e-12f, d[a]) : d[a]);
        float best = 1e30f;
        int stack[64];
        int sp = 0;
        stack[sp++] = 0;
        while (sp) {
            const BVHNode& nd = nodes[stack[--sp]];
            if (!nd.box.hit(o, inv_d, best)) continue;
            if (nd.begin >= 0) {
                for (int i = nd.begin; i < nd.end; ++i) {
                    float t = intersect_tri(tri_idx[i], o, d);
                    if (t > 0 && t < best) best = t;
                }
            } else {
                stack[sp++] = nd.left;
                stack[sp++] = nd.right;
            }
        }
        return best < 1e29f ? best : -1.0f;
    }
};

std::unordered_map<int64_t, BVH*> g_bvh;

}  // namespace

extern "C" {

int64_t bvh_build(const float* verts, int64_t nv, const int32_t* faces,
                  int64_t nf) {
    auto* b = new BVH();
    b->build(verts, nv, faces, nf);
    int64_t h = g_next_handle++;
    g_bvh[h] = b;
    return h;
}

void bvh_destroy(int64_t h) {
    auto it = g_bvh.find(h);
    if (it != g_bvh.end()) { delete it->second; g_bvh.erase(it); }
}

// writes t (>0) or -1 per ray
void bvh_raycast(int64_t h, const float* rays_o, const float* rays_d,
                 int64_t n, float* out_t) {
    BVH* b = g_bvh[h];
    for (int64_t i = 0; i < n; ++i)
        out_t[i] = b->cast(rays_o + 3 * i, rays_d + 3 * i);
}

}  // extern "C"

namespace {
// solve 6x6 SPD system via Cholesky; returns false if singular
bool solve66(double A[36], double b[6], double x[6]) {
    double L[36] = {0};
    for (int i = 0; i < 6; ++i) {
        for (int j = 0; j <= i; ++j) {
            double s = A[6*i+j];
            for (int kk = 0; kk < j; ++kk) s -= L[6*i+kk] * L[6*j+kk];
            if (i == j) {
                if (s <= 1e-12) return false;
                L[6*i+j] = std::sqrt(s);
            } else {
                L[6*i+j] = s / L[6*j+j];
            }
        }
    }
    double y[6];
    for (int i = 0; i < 6; ++i) {
        double s = b[i];
        for (int j = 0; j < i; ++j) s -= L[6*i+j] * y[j];
        y[i] = s / L[6*i+i];
    }
    for (int i = 5; i >= 0; --i) {
        double s = y[i];
        for (int j = i + 1; j < 6; ++j) s -= L[6*j+i] * x[j];
        x[i] = s / L[6*i+i];
    }
    return true;
}
}  // namespace

// Point-to-plane ICP: aligns src onto (tgt, tgt_normals).  init/out_T are
// row-major 4x4.  Returns fitness (inlier fraction); writes inlier RMSE.
float icp_point_to_plane(const float* src, int64_t ns, const float* tgt,
                         const float* tgt_normals, int64_t nt,
                         float max_corr_dist, int max_iter,
                         const float* init_T, float* out_T, float* out_rmse) {
    KDTree tree;
    tree.build(tgt, (int)nt);

    double T[16];
    for (int i = 0; i < 16; ++i) T[i] = init_T[i];

    double fitness = 0, rmse = 0;
    for (int iter = 0; iter < max_iter; ++iter) {
        double A[36] = {0}, b[6] = {0};
        int64_t inliers = 0;
        double sq = 0;
        for (int64_t i = 0; i < ns; ++i) {
            const float* p0 = src + 3 * i;
            float p[3] = {
                (float)(T[0]*p0[0] + T[1]*p0[1] + T[2]*p0[2] + T[3]),
                (float)(T[4]*p0[0] + T[5]*p0[1] + T[6]*p0[2] + T[7]),
                (float)(T[8]*p0[0] + T[9]*p0[1] + T[10]*p0[2] + T[11])};
            float d2;
            int j = tree.nearest(p, &d2);
            if (j < 0 || d2 > max_corr_dist * max_corr_dist) continue;
            const float* q = tgt + 3 * j;
            const float* nrm = tgt_normals + 3 * j;
            double r = (p[0]-q[0])*nrm[0] + (p[1]-q[1])*nrm[1]
                     + (p[2]-q[2])*nrm[2];
            // J = [p x n, n]
            double J[6] = {
                (double)p[1]*nrm[2] - (double)p[2]*nrm[1],
                (double)p[2]*nrm[0] - (double)p[0]*nrm[2],
                (double)p[0]*nrm[1] - (double)p[1]*nrm[0],
                nrm[0], nrm[1], nrm[2]};
            for (int a = 0; a < 6; ++a) {
                b[a] -= J[a] * r;
                for (int c2 = 0; c2 < 6; ++c2) A[6*a+c2] += J[a] * J[c2];
            }
            inliers++;
            sq += r * r;
        }
        if (inliers < 6) break;
        fitness = (double)inliers / (double)ns;
        rmse = std::sqrt(sq / (double)inliers);
        double x[6];
        for (int a = 0; a < 6; ++a) A[6*a+a] += 1e-9;
        if (!solve66(A, b, x)) break;
        // incremental transform: small-angle rotation (wx wy wz) + t
        double cx_ = std::cos(x[0]), sx_ = std::sin(x[0]);
        double cy_ = std::cos(x[1]), sy_ = std::sin(x[1]);
        double cz_ = std::cos(x[2]), sz_ = std::sin(x[2]);
        double Rz[9] = {cz_, -sz_, 0, sz_, cz_, 0, 0, 0, 1};
        double Ry[9] = {cy_, 0, sy_, 0, 1, 0, -sy_, 0, cy_};
        double Rx[9] = {1, 0, 0, 0, cx_, -sx_, 0, sx_, cx_};
        double Rzy[9], Rd[9];
        for (int a = 0; a < 3; ++a)
            for (int c2 = 0; c2 < 3; ++c2) {
                Rzy[3*a+c2] = Rz[3*a]*Ry[c2] + Rz[3*a+1]*Ry[3+c2]
                            + Rz[3*a+2]*Ry[6+c2];
            }
        for (int a = 0; a < 3; ++a)
            for (int c2 = 0; c2 < 3; ++c2) {
                Rd[3*a+c2] = Rzy[3*a]*Rx[c2] + Rzy[3*a+1]*Rx[3+c2]
                           + Rzy[3*a+2]*Rx[6+c2];
            }
        double Tn[16];
        for (int a = 0; a < 3; ++a) {
            for (int c2 = 0; c2 < 4; ++c2) {
                Tn[4*a+c2] = Rd[3*a]*T[c2] + Rd[3*a+1]*T[4+c2]
                           + Rd[3*a+2]*T[8+c2];
            }
            Tn[4*a+3] += x[3+a];
        }
        Tn[12] = 0; Tn[13] = 0; Tn[14] = 0; Tn[15] = 1;
        double delta = 0;
        for (int a = 0; a < 16; ++a) {
            delta += std::fabs(Tn[a] - T[a]);
            T[a] = Tn[a];
        }
        if (delta < 1e-8) break;
    }
    for (int i = 0; i < 16; ++i) out_T[i] = (float)T[i];
    if (out_rmse) *out_rmse = (float)rmse;
    return (float)fitness;
}

}  // extern "C"

// ----------------------------------------------- FPFH + RANSAC registration
// First-party replacement for Open3D's compute_fpfh_feature +
// registration_ransac_based_on_feature_matching (reference
// src/common.py:534-593, used by the Mapper's end-correction global stage,
// src/Mapper.py:1080-1148).
namespace {

// Darboux-frame pair features (alpha, phi, theta) — PFH/FPFH standard.
inline bool pair_features(const float* p1, const float* n1_, const float* p2,
                          const float* n2_, float f[3]) {
    double d[3] = {p2[0]-p1[0], p2[1]-p1[1], p2[2]-p1[2]};
    double dist = std::sqrt(d[0]*d[0] + d[1]*d[1] + d[2]*d[2]);
    if (dist < 1e-12) return false;
    d[0] /= dist; d[1] /= dist; d[2] /= dist;
    const float* ns_ = n1_;
    const float* nt_ = n2_;
    double a1 = n1_[0]*d[0] + n1_[1]*d[1] + n1_[2]*d[2];
    double a2 = n2_[0]*d[0] + n2_[1]*d[1] + n2_[2]*d[2];
    double sgn = 1.0;
    if (std::fabs(a1) < std::fabs(a2)) {  // swap source/target roles
        ns_ = n2_; nt_ = n1_;
        d[0] = -d[0]; d[1] = -d[1]; d[2] = -d[2];
    }
    double u[3] = {ns_[0], ns_[1], ns_[2]};
    double v[3] = {d[1]*u[2] - d[2]*u[1],
                   d[2]*u[0] - d[0]*u[2],
                   d[0]*u[1] - d[1]*u[0]};
    double vn = std::sqrt(v[0]*v[0] + v[1]*v[1] + v[2]*v[2]);
    if (vn < 1e-12) return false;
    v[0] /= vn; v[1] /= vn; v[2] /= vn;
    double w[3] = {u[1]*v[2] - u[2]*v[1],
                   u[2]*v[0] - u[0]*v[2],
                   u[0]*v[1] - u[1]*v[0]};
    (void)sgn;
    f[0] = (float)(v[0]*nt_[0] + v[1]*nt_[1] + v[2]*nt_[2]);        // alpha
    f[1] = (float)(u[0]*d[0] + u[1]*d[1] + u[2]*d[2]);              // phi
    f[2] = (float)std::atan2(w[0]*nt_[0] + w[1]*nt_[1] + w[2]*nt_[2],
                             u[0]*nt_[0] + u[1]*nt_[1] + u[2]*nt_[2]);
    return true;
}

// 33-bin FPFH (3 x 11) over radius-bounded neighbourhoods.
void compute_fpfh(const float* pts, const float* normals, int64_t n,
                  float radius, int max_nn, std::vector<float>& fpfh) {
    KDTree tree;
    tree.build(pts, (int)n);
    const float r2 = radius * radius;
    std::vector<float> spfh(n * 33, 0.0f);
    std::vector<std::vector<std::pair<float,int>>> nbrs(n);
    std::vector<std::pair<float,int>> heap;
    const double PI = 3.14159265358979323846;
    for (int64_t i = 0; i < n; ++i) {
        heap.clear();
        tree.knn_rec(0, pts + 3*i, max_nn, heap);
        auto& keep = nbrs[i];
        for (auto& pr : heap)
            if (pr.first <= r2 && pr.second != (int)i) keep.push_back(pr);
        if (keep.empty()) continue;
        float inc = 100.0f / (float)keep.size();
        for (auto& pr : keep) {
            float f[3];
            if (!pair_features(pts + 3*i, normals + 3*i,
                               pts + 3*pr.second, normals + 3*pr.second, f))
                continue;
            int b0 = (int)std::floor(11.0 * (f[0] + 1.0) / 2.0);
            int b1 = (int)std::floor(11.0 * (f[1] + 1.0) / 2.0);
            int b2 = (int)std::floor(11.0 * (f[2] + PI) / (2.0 * PI));
            b0 = std::min(std::max(b0, 0), 10);
            b1 = std::min(std::max(b1, 0), 10);
            b2 = std::min(std::max(b2, 0), 10);
            spfh[33*i + b0] += inc;
            spfh[33*i + 11 + b1] += inc;
            spfh[33*i + 22 + b2] += inc;
        }
    }
    fpfh.assign(n * 33, 0.0f);
    for (int64_t i = 0; i < n; ++i) {
        for (int b = 0; b < 33; ++b) fpfh[33*i + b] = spfh[33*i + b];
        auto& keep = nbrs[i];
        if (keep.empty()) continue;
        for (auto& pr : keep) {
            float wgt = 1.0f / std::max(pr.first, 1e-8f);  // 1/d^2 (o3d)
            for (int b = 0; b < 33; ++b)
                fpfh[33*i + b] += wgt * spfh[33*pr.second + b] /
                                  (float)keep.size();
        }
    }
}

// Kabsch: least-squares R,t from paired points (row-major 4x4 out).
bool kabsch(const double* P, const double* Q, int m, double T[16]) {
    double cp[3] = {0,0,0}, cq[3] = {0,0,0};
    for (int i = 0; i < m; ++i)
        for (int a = 0; a < 3; ++a) { cp[a] += P[3*i+a]; cq[a] += Q[3*i+a]; }
    for (int a = 0; a < 3; ++a) { cp[a] /= m; cq[a] /= m; }
    double H[9] = {0};
    for (int i = 0; i < m; ++i)
        for (int a = 0; a < 3; ++a)
            for (int b = 0; b < 3; ++b)
                H[3*a+b] += (P[3*i+a]-cp[a]) * (Q[3*i+b]-cq[b]);
    // Horn's quaternion method: largest eigenvector of the 4x4 N matrix
    double Sxx=H[0], Sxy=H[1], Sxz=H[2], Syx=H[3], Syy=H[4], Syz=H[5],
           Szx=H[6], Szy=H[7], Szz=H[8];
    double N[16] = {
        Sxx+Syy+Szz, Syz-Szy,     Szx-Sxz,     Sxy-Syx,
        Syz-Szy,     Sxx-Syy-Szz, Sxy+Syx,     Szx+Sxz,
        Szx-Sxz,     Sxy+Syx,     -Sxx+Syy-Szz,Syz+Szy,
        Sxy-Syx,     Szx+Sxz,     Syz+Szy,     -Sxx-Syy+Szz};
    // shift to make it PSD-ish, then power iteration
    double shift = 0;
    for (int i = 0; i < 4; ++i) {
        double row = 0;
        for (int j = 0; j < 4; ++j) row += std::fabs(N[4*i+j]);
        shift = std::max(shift, row);
    }
    for (int i = 0; i < 4; ++i) N[4*i+i] += shift;
    double q[4] = {1, 0.01, 0.02, 0.03};
    for (int it = 0; it < 64; ++it) {
        double w[4] = {0,0,0,0};
        for (int a = 0; a < 4; ++a)
            for (int b = 0; b < 4; ++b) w[a] += N[4*a+b] * q[b];
        double nn = std::sqrt(w[0]*w[0]+w[1]*w[1]+w[2]*w[2]+w[3]*w[3]);
        if (nn < 1e-20) return false;
        for (int a = 0; a < 4; ++a) q[a] = w[a] / nn;
    }
    double qw=q[0], qx=q[1], qy=q[2], qz=q[3];
    double R[9] = {
        1-2*(qy*qy+qz*qz), 2*(qx*qy-qw*qz),   2*(qx*qz+qw*qy),
        2*(qx*qy+qw*qz),   1-2*(qx*qx+qz*qz), 2*(qy*qz-qw*qx),
        2*(qx*qz-qw*qy),   2*(qy*qz+qw*qx),   1-2*(qx*qx+qy*qy)};
    for (int a = 0; a < 3; ++a) {
        for (int b = 0; b < 3; ++b) T[4*a+b] = R[3*a+b];
        T[4*a+3] = cq[a] - (R[3*a]*cp[0] + R[3*a+1]*cp[1] + R[3*a+2]*cp[2]);
    }
    T[12] = T[13] = T[14] = 0; T[15] = 1;
    return true;
}

struct XorShift {
    uint64_t s;
    explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9E3779B97F4A7C15ULL) {}
    uint64_t next() {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
    }
    int uniform(int n) { return (int)(next() % (uint64_t)n); }
};

}  // namespace

extern "C" {

// Global registration: FPFH feature matching + RANSAC (4-point samples,
// edge-length pruning, Kabsch), validated by nearest-neighbour inlier
// fraction on a source subsample.  Returns fitness; writes row-major 4x4.
float fpfh_ransac_register(const float* src, int64_t ns,
                           const float* src_normals,
                           const float* tgt, int64_t nt,
                           const float* tgt_normals,
                           float feature_radius, float max_corr_dist,
                           int max_iter, uint64_t seed, float* out_T) {
    for (int i = 0; i < 16; ++i) out_T[i] = (i % 5 == 0) ? 1.0f : 0.0f;
    if (ns < 8 || nt < 8) return 0.0f;

    std::vector<float> fs, ft;
    compute_fpfh(src, src_normals, ns, feature_radius, 100, fs);
    compute_fpfh(tgt, tgt_normals, nt, feature_radius, 100, ft);

    // best-match correspondences src -> tgt in 33-d feature space
    std::vector<int> corr(ns);
    for (int64_t i = 0; i < ns; ++i) {
        float best = 1e30f; int bj = 0;
        const float* fi = &fs[33*i];
        for (int64_t j = 0; j < nt; ++j) {
            const float* fj = &ft[33*j];
            float dsum = 0;
            for (int b = 0; b < 33; ++b) {
                float df = fi[b] - fj[b];
                dsum += df * df;
                if (dsum > best) break;
            }
            if (dsum < best) { best = dsum; bj = (int)j; }
        }
        corr[i] = bj;
    }

    KDTree ttree;
    ttree.build(tgt, (int)nt);
    // validation subsample
    int nv = (int)std::min<int64_t>(ns, 1000);
    std::vector<int> vids(nv);
    for (int i = 0; i < nv; ++i) vids[i] = (int)((int64_t)i * ns / nv);

    XorShift rng(seed);
    const int M = 4;
    double bestT[16]; float best_fit = 0.0f;
    for (int i = 0; i < 16; ++i) bestT[i] = (i % 5 == 0) ? 1.0 : 0.0;
    const float edge_sim = 0.9f;
    const float c2 = max_corr_dist * max_corr_dist;

    for (int it = 0; it < max_iter; ++it) {
        int ids[M];
        bool dup = false;
        for (int a = 0; a < M; ++a) {
            ids[a] = rng.uniform((int)ns);
            for (int b = 0; b < a; ++b) dup |= (ids[a] == ids[b]);
        }
        if (dup) continue;
        // edge-length similarity pruning (o3d CorrespondenceCheckerBasedOnEdgeLength)
        bool ok = true;
        for (int a = 0; a < M && ok; ++a)
            for (int b = a + 1; b < M && ok; ++b) {
                const float* pa = src + 3*ids[a];
                const float* pb = src + 3*ids[b];
                const float* qa = tgt + 3*corr[ids[a]];
                const float* qb = tgt + 3*corr[ids[b]];
                float ds = std::sqrt((pa[0]-pb[0])*(pa[0]-pb[0])
                         + (pa[1]-pb[1])*(pa[1]-pb[1])
                         + (pa[2]-pb[2])*(pa[2]-pb[2]));
                float dt = std::sqrt((qa[0]-qb[0])*(qa[0]-qb[0])
                         + (qa[1]-qb[1])*(qa[1]-qb[1])
                         + (qa[2]-qb[2])*(qa[2]-qb[2]));
                if (ds < edge_sim * dt || dt < edge_sim * ds) ok = false;
            }
        if (!ok) continue;
        double P[3*M], Q[3*M];
        for (int a = 0; a < M; ++a)
            for (int c = 0; c < 3; ++c) {
                P[3*a+c] = src[3*ids[a]+c];
                Q[3*a+c] = tgt[3*corr[ids[a]]+c];
            }
        double T[16];
        if (!kabsch(P, Q, M, T)) continue;
        // validate on the subsample
        int inl = 0;
        for (int a = 0; a < nv; ++a) {
            const float* p0 = src + 3*vids[a];
            float p[3] = {
                (float)(T[0]*p0[0] + T[1]*p0[1] + T[2]*p0[2] + T[3]),
                (float)(T[4]*p0[0] + T[5]*p0[1] + T[6]*p0[2] + T[7]),
                (float)(T[8]*p0[0] + T[9]*p0[1] + T[10]*p0[2] + T[11])};
            float d2;
            ttree.nearest(p, &d2);
            if (d2 <= c2) inl++;
        }
        float fit = (float)inl / (float)nv;
        if (fit > best_fit) {
            best_fit = fit;
            for (int i2 = 0; i2 < 16; ++i2) bestT[i2] = T[i2];
            if (best_fit > 0.97f) break;
        }
    }
    for (int i = 0; i < 16; ++i) out_T[i] = (float)bestT[i];
    return best_fit;
}

}  // extern "C"
