// rt3native: native asset-pipeline kernels for raytracer3_tpu.
//
// C++ counterpart of the reference's native mesh tooling: the meshopt-based
// asset transforms (src/assets/mod.rs:253-267: vertex-cache optimization,
// overdraw, fetch order), the standalone mesh encoder's quantization codecs
// (src/meshopt/encoder.rs:120-190: 14-bit positions, octahedral normals,
// 12-bit uvs), the analysis harness metrics (src/meshopt/meshopt.rs:362-394:
// ACMR/ATVR cache simulation), plus a binned-SAH BVH/cluster builder playing
// the role of the driver-side acceleration-structure build
// (src/renderer/vulkan/raytracing.rs:88-148) for static scenes — the TPU
// device-side LBVH (ops/bvh.py) remains the dynamic-scene path.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Vertex deduplication + reindex (the glTF importer's implicit weld).
// Returns the new vertex count; remap[i] = new index of original vertex i.
// ---------------------------------------------------------------------------
int rt3_weld_vertices(const float* attrs, int n_verts, int stride_floats,
                      int* remap_out) {
  struct Key {
    const float* p;
    int stride;
    bool operator==(const Key& o) const {
      return std::memcmp(p, o.p, sizeof(float) * stride) == 0;
    }
  };
  struct Hash {
    size_t operator()(const Key& k) const {
      // FNV-1a over bytes
      size_t h = 1469598103934665603ull;
      const unsigned char* b = reinterpret_cast<const unsigned char*>(k.p);
      for (int i = 0; i < k.stride * 4; ++i) h = (h ^ b[i]) * 1099511628211ull;
      return h;
    }
  };
  // open addressing table
  int cap = 1;
  while (cap < n_verts * 2) cap <<= 1;
  std::vector<int> table(cap, -1);
  Hash hasher;
  int next_id = 0;
  for (int i = 0; i < n_verts; ++i) {
    Key k{attrs + (size_t)i * stride_floats, stride_floats};
    size_t h = hasher(k) & (cap - 1);
    int found = -1;
    while (table[h] != -1) {
      int j = table[h];
      Key kj{attrs + (size_t)j * stride_floats, stride_floats};
      if (kj == k) { found = remap_out[j]; break; }
      h = (h + 1) & (cap - 1);
    }
    if (found >= 0) {
      remap_out[i] = found;
    } else {
      table[h] = i;
      remap_out[i] = next_id++;
    }
  }
  return next_id;
}

// ---------------------------------------------------------------------------
// Vertex-cache optimization — Tom Forsyth's linear-speed algorithm (the
// optimize_vertex_cache role, assets/mod.rs:255). In/out triangle indices.
// ---------------------------------------------------------------------------
static float forsyth_vertex_score(int cache_pos, int remaining_tris) {
  const float kCacheDecayPower = 1.5f;
  const float kLastTriScore = 0.75f;
  const float kValenceBoostScale = 2.0f;
  const float kValenceBoostPower = 0.5f;
  const int kCacheSize = 32;
  if (remaining_tris <= 0) return -1.0f;
  float score = 0.0f;
  if (cache_pos >= 0) {
    if (cache_pos < 3) {
      score = kLastTriScore;
    } else {
      float s = 1.0f - float(cache_pos - 3) / float(kCacheSize - 3);
      score = std::pow(s, kCacheDecayPower);
    }
  }
  score += kValenceBoostScale * std::pow((float)remaining_tris, -kValenceBoostPower);
  return score;
}

void rt3_optimize_vertex_cache(int* indices, int n_tris, int n_verts) {
  const int kCacheSize = 32;
  std::vector<int> valence(n_verts, 0);
  for (int i = 0; i < n_tris * 3; ++i) valence[indices[i]]++;
  std::vector<int> offsets(n_verts + 1, 0);
  for (int v = 0; v < n_verts; ++v) offsets[v + 1] = offsets[v] + valence[v];
  std::vector<int> tri_of(offsets[n_verts]);
  {
    std::vector<int> cur(offsets.begin(), offsets.end() - 1);
    for (int t = 0; t < n_tris; ++t)
      for (int k = 0; k < 3; ++k) tri_of[cur[indices[t * 3 + k]]++] = t;
  }
  std::vector<int> remaining(valence);
  std::vector<float> vscore(n_verts);
  std::vector<int> cache_pos(n_verts, -1);
  for (int v = 0; v < n_verts; ++v) vscore[v] = forsyth_vertex_score(-1, remaining[v]);

  std::vector<float> tscore(n_tris, 0.0f);
  std::vector<char> emitted(n_tris, 0);
  for (int t = 0; t < n_tris; ++t)
    for (int k = 0; k < 3; ++k) tscore[t] += vscore[indices[t * 3 + k]];

  std::vector<int> cache;
  cache.reserve(kCacheSize + 3);
  std::vector<int> out;
  out.reserve(n_tris * 3);

  int emitted_count = 0;
  int best_tri = 0;
  while (emitted_count < n_tris) {
    // find best triangle (among cache-adjacent, else global scan)
    if (best_tri < 0 || emitted[best_tri]) {
      float best = -FLT_MAX;
      best_tri = -1;
      for (int v : cache) {
        for (int o = offsets[v]; o < offsets[v + 1]; ++o) {
          int t = tri_of[o];
          if (!emitted[t] && tscore[t] > best) { best = tscore[t]; best_tri = t; }
        }
      }
      if (best_tri < 0) {
        for (int t = 0; t < n_tris; ++t)
          if (!emitted[t] && tscore[t] > best) { best = tscore[t]; best_tri = t; }
      }
    }
    int t = best_tri;
    emitted[t] = 1;
    emitted_count++;
    for (int k = 0; k < 3; ++k) {
      int v = indices[t * 3 + k];
      out.push_back(v);
      remaining[v]--;
      // move to cache front
      auto it = std::find(cache.begin(), cache.end(), v);
      if (it != cache.end()) cache.erase(it);
      cache.insert(cache.begin(), v);
    }
    if ((int)cache.size() > kCacheSize) cache.resize(kCacheSize);
    // update scores of cached vertices + their triangles; pick next best
    float best = -FLT_MAX;
    int next = -1;
    for (size_t ci = 0; ci < cache.size(); ++ci) {
      int v = cache[ci];
      vscore[v] = forsyth_vertex_score((int)ci, remaining[v]);
    }
    for (int v : cache) {
      for (int o = offsets[v]; o < offsets[v + 1]; ++o) {
        int tt = tri_of[o];
        if (emitted[tt]) continue;
        float s = 0;
        for (int k = 0; k < 3; ++k) s += vscore[indices[tt * 3 + k]];
        tscore[tt] = s;
        if (s > best) { best = s; next = tt; }
      }
    }
    best_tri = next;
  }
  std::memcpy(indices, out.data(), sizeof(int) * out.size());
}

// ---------------------------------------------------------------------------
// Vertex-fetch optimization: reorder vertices by first use in index order
// (the optimize_vertex_fetch role, assets/mod.rs:259). Returns new count.
// remap_out maps old→new vertex ids; caller permutes attribute arrays.
// ---------------------------------------------------------------------------
int rt3_optimize_vertex_fetch(int* indices, int n_tris, int n_verts,
                              int* remap_out) {
  for (int v = 0; v < n_verts; ++v) remap_out[v] = -1;
  int next_id = 0;
  for (int i = 0; i < n_tris * 3; ++i) {
    int v = indices[i];
    if (remap_out[v] < 0) remap_out[v] = next_id++;
    indices[i] = remap_out[v];
  }
  for (int v = 0; v < n_verts; ++v)
    if (remap_out[v] < 0) remap_out[v] = next_id++;
  return next_id;
}

// ---------------------------------------------------------------------------
// ACMR / ATVR cache simulation (meshopt.rs:362-394 analysis role).
// FIFO cache model of the given size.
// ---------------------------------------------------------------------------
void rt3_analyze_cache(const int* indices, int n_tris, int n_verts,
                       int cache_size, float* acmr_out, float* atvr_out) {
  std::vector<int> stamp(n_verts, -1);
  int time = 0, misses = 0;
  for (int i = 0; i < n_tris * 3; ++i) {
    int v = indices[i];
    if (stamp[v] < 0 || time - stamp[v] >= cache_size) {
      misses++;
      stamp[v] = time++;
    }
  }
  std::vector<char> used(n_verts, 0);
  int unique = 0;
  for (int i = 0; i < n_tris * 3; ++i)
    if (!used[indices[i]]) { used[indices[i]] = 1; unique++; }
  *acmr_out = n_tris ? (float)misses / n_tris : 0.0f;
  *atvr_out = unique ? (float)misses / unique : 0.0f;
}

// ---------------------------------------------------------------------------
// Quantization codecs (encoder.rs:120-190 analog).
// ---------------------------------------------------------------------------
void rt3_quantize_positions_14(const float* pos, int n, uint16_t* out,
                               float* scale_bias /* [6]: bias3, scale3 */) {
  float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  for (int i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c) {
      mn[c] = std::min(mn[c], pos[i * 3 + c]);
      mx[c] = std::max(mx[c], pos[i * 3 + c]);
    }
  const float q = 16383.0f;  // 14 bits
  for (int c = 0; c < 3; ++c) {
    scale_bias[c] = mn[c];
    scale_bias[3 + c] = (mx[c] - mn[c]) > 0 ? (mx[c] - mn[c]) : 1.0f;
  }
  for (int i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c) {
      float t = (pos[i * 3 + c] - scale_bias[c]) / scale_bias[3 + c];
      out[i * 3 + c] = (uint16_t)(t * q + 0.5f);
    }
}

void rt3_dequantize_positions_14(const uint16_t* qpos, int n,
                                 const float* scale_bias, float* out) {
  const float q = 16383.0f;
  for (int i = 0; i < n; ++i)
    for (int c = 0; c < 3; ++c)
      out[i * 3 + c] =
          scale_bias[c] + (qpos[i * 3 + c] / q) * scale_bias[3 + c];
}

// Octahedral normal encode/decode at 8 bits per component
// (encoder.rs octa-normal role; same mapping as shaders/include/packing.slang:64-87).
void rt3_encode_normals_octa8(const float* nrm, int n, uint16_t* out) {
  for (int i = 0; i < n; ++i) {
    float x = nrm[i * 3], y = nrm[i * 3 + 1], z = nrm[i * 3 + 2];
    float s = std::abs(x) + std::abs(y) + std::abs(z);
    if (s < 1e-20f) s = 1.0f;
    float u = x / s, v = y / s;
    if (z < 0) {
      float uu = (1.0f - std::abs(v)) * (u >= 0 ? 1.0f : -1.0f);
      float vv = (1.0f - std::abs(u)) * (v >= 0 ? 1.0f : -1.0f);
      u = uu; v = vv;
    }
    int qu = (int)((u * 0.5f + 0.5f) * 255.0f + 0.5f);
    int qv = (int)((v * 0.5f + 0.5f) * 255.0f + 0.5f);
    out[i] = (uint16_t)((qv << 8) | qu);
  }
}

void rt3_decode_normals_octa8(const uint16_t* enc, int n, float* out) {
  for (int i = 0; i < n; ++i) {
    float u = ((enc[i] & 0xFF) / 255.0f) * 2.0f - 1.0f;
    float v = (((enc[i] >> 8) & 0xFF) / 255.0f) * 2.0f - 1.0f;
    float z = 1.0f - std::abs(u) - std::abs(v);
    float t = std::max(-z, 0.0f);
    u -= (u >= 0 ? 1.0f : -1.0f) * t;
    v -= (v >= 0 ? 1.0f : -1.0f) * t;
    float len = std::sqrt(u * u + v * v + z * z);
    out[i * 3] = u / len;
    out[i * 3 + 1] = v / len;
    out[i * 3 + 2] = z / len;
  }
}

// ---------------------------------------------------------------------------
// Binned-SAH BVH builder over primitive AABBs. Produces the same node layout
// as ops/bvh.py (internal nodes [0, P-1), leaves [P-1, 2P-1), leaf_prim[P]).
// Higher-quality trees than LBVH for static scenes.
// ---------------------------------------------------------------------------
struct SahCtx {
  const float* bmin;
  const float* bmax;
  std::vector<float> cent;
  std::vector<int> prim;       // permuted primitive order
  std::vector<int> left, right;
  std::vector<float> nmin, nmax;
  int next_internal = 0;
  int n = 0;
};

static void sah_union(const SahCtx& c, int lo, int hi, float* mn, float* mx,
                      float* cmn, float* cmx) {
  for (int k = 0; k < 3; ++k) {
    mn[k] = FLT_MAX; mx[k] = -FLT_MAX; cmn[k] = FLT_MAX; cmx[k] = -FLT_MAX;
  }
  for (int i = lo; i < hi; ++i) {
    int p = c.prim[i];
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], c.bmin[p * 3 + k]);
      mx[k] = std::max(mx[k], c.bmax[p * 3 + k]);
      cmn[k] = std::min(cmn[k], c.cent[p * 3 + k]);
      cmx[k] = std::max(cmx[k], c.cent[p * 3 + k]);
    }
  }
}

static float half_area(const float* mn, const float* mx) {
  float dx = std::max(mx[0] - mn[0], 0.f), dy = std::max(mx[1] - mn[1], 0.f),
        dz = std::max(mx[2] - mn[2], 0.f);
  return dx * dy + dy * dz + dz * dx;
}

// Partition prim[lo, hi) in place by binned SAH over the widest centroid
// axis (median fallback); returns mid. Shared by the BVH build and the
// SAH-split clustering.
static int sah_partition_range(SahCtx& c, int lo, int hi) {
  int count = hi - lo;
  float mn[3], mx[3], cmn[3], cmx[3];
  sah_union(c, lo, hi, mn, mx, cmn, cmx);

  int axis = 0;
  float ext[3] = {cmx[0] - cmn[0], cmx[1] - cmn[1], cmx[2] - cmn[2]};
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;

  int mid = lo + count / 2;
  if (ext[axis] > 1e-12f && count > 4) {
    const int kBins = 16;
    int bin_count[kBins] = {0};
    float bin_min[kBins][3], bin_max[kBins][3];
    for (int b = 0; b < kBins; ++b)
      for (int k = 0; k < 3; ++k) { bin_min[b][k] = FLT_MAX; bin_max[b][k] = -FLT_MAX; }
    float inv = kBins / ext[axis];
    for (int i = lo; i < hi; ++i) {
      int p = c.prim[i];
      int b = std::min(kBins - 1, (int)((c.cent[p * 3 + axis] - cmn[axis]) * inv));
      bin_count[b]++;
      for (int k = 0; k < 3; ++k) {
        bin_min[b][k] = std::min(bin_min[b][k], c.bmin[p * 3 + k]);
        bin_max[b][k] = std::max(bin_max[b][k], c.bmax[p * 3 + k]);
      }
    }
    // sweep
    float lmin[kBins][3], lmax[kBins][3];
    int lcnt[kBins];
    {
      float accm[3] = {FLT_MAX, FLT_MAX, FLT_MAX}, accx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      int acc = 0;
      for (int b = 0; b < kBins; ++b) {
        acc += bin_count[b];
        for (int k = 0; k < 3; ++k) {
          accm[k] = std::min(accm[k], bin_min[b][k]);
          accx[k] = std::max(accx[k], bin_max[b][k]);
          lmin[b][k] = accm[k]; lmax[b][k] = accx[k];
        }
        lcnt[b] = acc;
      }
    }
    float best_cost = FLT_MAX;
    int best_bin = -1;
    {
      float accm[3] = {FLT_MAX, FLT_MAX, FLT_MAX}, accx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
      int acc = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        acc += bin_count[b];
        for (int k = 0; k < 3; ++k) {
          accm[k] = std::min(accm[k], bin_min[b][k]);
          accx[k] = std::max(accx[k], bin_max[b][k]);
        }
        int lc = lcnt[b - 1];
        if (lc == 0 || acc == 0) continue;
        float cost = lc * half_area(lmin[b - 1], lmax[b - 1]) +
                     acc * half_area(accm, accx);
        if (cost < best_cost) { best_cost = cost; best_bin = b; }
      }
    }
    if (best_bin > 0) {
      float split = cmn[axis] + best_bin * ext[axis] / 16.0f;
      int* pr = c.prim.data();
      int i = lo, j = hi - 1;
      while (i <= j) {
        if (c.cent[pr[i] * 3 + axis] < split) i++;
        else std::swap(pr[i], pr[j--]);
      }
      mid = i;
      if (mid == lo || mid == hi) mid = lo + count / 2;  // degenerate
    }
  }
  if (mid == lo + count / 2) {
    // median split on axis: nth_element
    std::nth_element(
        c.prim.begin() + lo, c.prim.begin() + mid, c.prim.begin() + hi,
        [&](int a, int b) { return c.cent[a * 3 + axis] < c.cent[b * 3 + axis]; });
  }
  return mid;
}

static int sah_build(SahCtx& c, int lo, int hi) {
  int count = hi - lo;
  if (count == 1) return (c.n - 1) + lo;  // leaf id = (P-1) + position

  int node = c.next_internal++;
  {
    float mn[3], mx[3], cmn[3], cmx[3];
    sah_union(c, lo, hi, mn, mx, cmn, cmx);
    for (int k = 0; k < 3; ++k) {
      c.nmin[node * 3 + k] = mn[k];
      c.nmax[node * 3 + k] = mx[k];
    }
  }
  int mid = sah_partition_range(c, lo, hi);
  c.left[node] = sah_build(c, lo, mid);
  c.right[node] = sah_build(c, mid, hi);
  return node;
}

int rt3_build_sah_bvh(const float* bmin, const float* bmax, int n,
                      int* left, int* right, float* node_min, float* node_max,
                      int* leaf_prim) {
  if (n < 2) return -1;
  SahCtx c;
  c.bmin = bmin; c.bmax = bmax; c.n = n;
  c.cent.resize((size_t)n * 3);
  for (int i = 0; i < n * 3; ++i) c.cent[i] = 0.5f * (bmin[i] + bmax[i]);
  c.prim.resize(n);
  for (int i = 0; i < n; ++i) c.prim[i] = i;
  c.left.assign(n - 1, 0);
  c.right.assign(n - 1, 0);
  c.nmin.assign((size_t)(2 * n - 1) * 3, 0.f);
  c.nmax.assign((size_t)(2 * n - 1) * 3, 0.f);
  int root = sah_build(c, 0, n);
  (void)root;
  // leaf boxes
  for (int i = 0; i < n; ++i) {
    int p = c.prim[i];
    for (int k = 0; k < 3; ++k) {
      c.nmin[(size_t)(n - 1 + i) * 3 + k] = bmin[p * 3 + k];
      c.nmax[(size_t)(n - 1 + i) * 3 + k] = bmax[p * 3 + k];
    }
    leaf_prim[i] = p;
  }
  std::memcpy(left, c.left.data(), sizeof(int) * (n - 1));
  std::memcpy(right, c.right.data(), sizeof(int) * (n - 1));
  std::memcpy(node_min, c.nmin.data(), sizeof(float) * (2 * n - 1) * 3);
  std::memcpy(node_max, c.nmax.data(), sizeof(float) * (2 * n - 1) * 3);
  return c.next_internal;  // should equal n-1
}

// ---------------------------------------------------------------------------
// SAH-guided clustering: partition primitives into clusters of <= leaf_size
// by recursive SAH/median splits (tighter cluster AABBs than Morton blocks).
// cluster_of[i] = cluster id of primitive i. Returns cluster count.
// ---------------------------------------------------------------------------
static void cluster_rec(SahCtx& c, int lo, int hi, int leaf_size,
                        int* cluster_of, int* next_cluster) {
  int count = hi - lo;
  if (count <= leaf_size) {
    int id = (*next_cluster)++;
    for (int i = lo; i < hi; ++i) cluster_of[c.prim[i]] = id;
    return;
  }
  float mn[3], mx[3], cmn[3], cmx[3];
  sah_union(c, lo, hi, mn, mx, cmn, cmx);
  int axis = 0;
  float ext[3] = {cmx[0] - cmn[0], cmx[1] - cmn[1], cmx[2] - cmn[2]};
  if (ext[1] > ext[axis]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;
  int mid = lo + count / 2;
  std::nth_element(
      c.prim.begin() + lo, c.prim.begin() + mid, c.prim.begin() + hi,
      [&](int a, int b) { return c.cent[a * 3 + axis] < c.cent[b * 3 + axis]; });
  cluster_rec(c, lo, mid, leaf_size, cluster_of, next_cluster);
  cluster_rec(c, mid, hi, leaf_size, cluster_of, next_cluster);
}

int rt3_build_clusters(const float* bmin, const float* bmax, int n,
                       int leaf_size, int* cluster_of) {
  SahCtx c;
  c.bmin = bmin; c.bmax = bmax; c.n = n;
  c.cent.resize((size_t)n * 3);
  for (int i = 0; i < n * 3; ++i) c.cent[i] = 0.5f * (bmin[i] + bmax[i]);
  c.prim.resize(n);
  for (int i = 0; i < n; ++i) c.prim[i] = i;
  int next_cluster = 0;
  cluster_rec(c, 0, n, leaf_size, cluster_of, &next_cluster);
  return next_cluster;
}

// SAH-split clustering: same contract as rt3_build_clusters but splits are
// placed by the binned-SAH sweep instead of the centroid median, so cluster
// AABBs hug geometry (walls stop being sliced through). Trade-off: splits
// are unbalanced, so clusters come out underfull on average (more cluster
// rows + node rows for the same triangles).
static void cluster_rec_sah(SahCtx& c, int lo, int hi, int leaf_size,
                            int* cluster_of, int* next_cluster) {
  int count = hi - lo;
  if (count <= leaf_size) {
    int id = (*next_cluster)++;
    for (int i = lo; i < hi; ++i) cluster_of[c.prim[i]] = id;
    return;
  }
  int mid = sah_partition_range(c, lo, hi);
  cluster_rec_sah(c, lo, mid, leaf_size, cluster_of, next_cluster);
  cluster_rec_sah(c, mid, hi, leaf_size, cluster_of, next_cluster);
}

int rt3_build_clusters_sah(const float* bmin, const float* bmax, int n,
                           int leaf_size, int* cluster_of) {
  SahCtx c;
  c.bmin = bmin; c.bmax = bmax; c.n = n;
  c.cent.resize((size_t)n * 3);
  for (int i = 0; i < n * 3; ++i) c.cent[i] = 0.5f * (bmin[i] + bmax[i]);
  c.prim.resize(n);
  for (int i = 0; i < n; ++i) c.prim[i] = i;
  int next_cluster = 0;
  cluster_rec_sah(c, 0, n, leaf_size, cluster_of, &next_cluster);
  return next_cluster;
}

// ---------------------------------------------------------------------------
// Spatial splits (SBVH-style fragments): dice the largest triangles into
// axis-plane-clipped fragments so cluster AABBs stop being inflated by big
// floor/wall triangles. A fragment references its ORIGINAL triangle — the
// intersection math (and u/v/prim_id) is untouched; only the clustering
// boxes tighten. Splitting is a greedy priority queue on fragment-box
// surface area, budgeted to at most `max_out` fragments total.
// ---------------------------------------------------------------------------
namespace {

struct Frag {
  int tri;
  int nv;            // polygon vertex count (triangle clipped by planes)
  float poly[9][3];  // up to 3 + number-of-clips vertices
  float mn[3], mx[3];
  float sa;
};

inline float frag_sa(const float* mn, const float* mx) {
  float dx = std::max(mx[0] - mn[0], 0.f), dy = std::max(mx[1] - mn[1], 0.f),
        dz = std::max(mx[2] - mn[2], 0.f);
  return dx * dy + dy * dz + dz * dx;
}

void frag_bounds(Frag& f) {
  for (int k = 0; k < 3; ++k) { f.mn[k] = FLT_MAX; f.mx[k] = -FLT_MAX; }
  for (int i = 0; i < f.nv; ++i)
    for (int k = 0; k < 3; ++k) {
      f.mn[k] = std::min(f.mn[k], f.poly[i][k]);
      f.mx[k] = std::max(f.mx[k], f.poly[i][k]);
    }
  // Inflate a hair: clip vertices are rounded, and a true-surface point at
  // a split seam must not fall outside every fragment's box.
  for (int k = 0; k < 3; ++k) {
    float eps = 1e-6f * std::max(1.f, std::max(std::fabs(f.mn[k]),
                                               std::fabs(f.mx[k])));
    f.mn[k] -= eps;
    f.mx[k] += eps;
  }
  f.sa = frag_sa(f.mn, f.mx);
}

// Sutherland–Hodgman clip of f's polygon against axis plane x[axis] <= v
// (keep_low) or >= v. Returns false if the result is empty/degenerate.
bool frag_clip(const Frag& f, int axis, float v, bool keep_low, Frag& out) {
  out.tri = f.tri;
  out.nv = 0;
  for (int i = 0; i < f.nv; ++i) {
    const float* a = f.poly[i];
    const float* b = f.poly[(i + 1) % f.nv];
    float da = keep_low ? (v - a[axis]) : (a[axis] - v);
    float db = keep_low ? (v - b[axis]) : (b[axis] - v);
    if (da >= 0) {
      if (out.nv >= 9) return false;
      for (int k = 0; k < 3; ++k) out.poly[out.nv][k] = a[k];
      out.nv++;
    }
    if ((da >= 0) != (db >= 0)) {
      float t = da / (da - db);
      if (out.nv >= 9) return false;
      for (int k = 0; k < 3; ++k)
        out.poly[out.nv][k] = a[k] + t * (b[k] - a[k]);
      out.nv++;
    }
  }
  if (out.nv < 3) return false;
  frag_bounds(out);
  return true;
}

}  // namespace

int rt3_split_fragments(const float* v0, const float* v1, const float* v2,
                        int n, int max_out, int* frag_tri, float* frag_min,
                        float* frag_max) {
  std::vector<Frag> frags(n);
  for (int i = 0; i < n; ++i) {
    Frag& f = frags[i];
    f.tri = i;
    f.nv = 3;
    for (int k = 0; k < 3; ++k) {
      f.poly[0][k] = v0[i * 3 + k];
      f.poly[1][k] = v1[i * 3 + k];
      f.poly[2][k] = v2[i * 3 + k];
    }
    frag_bounds(f);
  }
  // Greedy: always split the largest-SA fragment at the midpoint of its
  // widest axis, until the budget is exhausted or splits stop shrinking.
  auto cmp = [&](int a, int b) { return frags[a].sa < frags[b].sa; };
  std::priority_queue<int, std::vector<int>, decltype(cmp)> pq(cmp);
  for (int i = 0; i < n; ++i) pq.push(i);
  while ((int)frags.size() < max_out && !pq.empty()) {
    int fi = pq.top();
    pq.pop();
    Frag f = frags[fi];
    int axis = 0;
    float ext[3] = {f.mx[0] - f.mn[0], f.mx[1] - f.mn[1], f.mx[2] - f.mn[2]};
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    if (ext[axis] <= 1e-7f) continue;  // degenerate: stop splitting this one
    float mid = 0.5f * (f.mn[axis] + f.mx[axis]);
    Frag lo_f, hi_f;
    if (!frag_clip(f, axis, mid, true, lo_f) ||
        !frag_clip(f, axis, mid, false, hi_f))
      continue;
    // Guard against non-shrinking splits (sliver polygons).
    if (lo_f.sa + hi_f.sa > 0.99f * 2.f * f.sa) continue;
    frags[fi] = lo_f;
    frags.push_back(hi_f);
    pq.push(fi);
    pq.push((int)frags.size() - 1);
  }
  int m = (int)frags.size();
  for (int i = 0; i < m; ++i) {
    frag_tri[i] = frags[i].tri;
    for (int k = 0; k < 3; ++k) {
      frag_min[i * 3 + k] = frags[i].mn[k];
      frag_max[i * 3 + k] = frags[i].mx[k];
    }
  }
  return m;
}

// ---------------------------------------------------------------------------
// Quadric-error-metric mesh simplification (Garland–Heckbert '97 style,
// half-edge collapses onto EXISTING vertices so the caller's vertex buffer is
// reused unchanged — the same contract as the meshopt demo's `simplify`
// exercise, reference src/meshopt/meshopt.rs:559-700). From-scratch
// implementation: per-vertex plane quadrics, lazy-invalidated collapse heap,
// border-edge locking, and a normal-flip rejection test.
// ---------------------------------------------------------------------------

namespace {

struct Quadric {
  // Symmetric 4x4: a2 ab ac ad b2 bc bd c2 cd d2.
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};
  void add_plane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c; q[3] += w * a * d;
    q[4] += w * b * b; q[5] += w * b * c; q[6] += w * b * d;
    q[7] += w * c * c; q[8] += w * c * d; q[9] += w * d * d;
  }
  void add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) q[i] += o.q[i];
  }
  double error(const float* p) const {
    double x = p[0], y = p[1], z = p[2];
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z + 2 * q[3] * x +
           q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }
};

struct Collapse {
  double err;
  int u, v;        // collapse u -> v (u disappears)
  int gen;         // generation stamps of u and v at push time
  bool operator<(const Collapse& o) const { return err > o.err; }  // min-heap
};

}  // namespace

int rt3_simplify(const float* pos, int n_verts, const int* indices, int n_tris,
                 int target_tris, float max_error, int* out_indices,
                 float* out_error) {
  std::vector<Quadric> vq(n_verts);
  std::vector<int> tri(indices, indices + (size_t)n_tris * 3);
  std::vector<char> tri_dead(n_tris, 0);
  // Per-vertex incident triangle lists.
  std::vector<std::vector<int>> vtris(n_verts);
  for (int t = 0; t < n_tris; ++t)
    for (int k = 0; k < 3; ++k) vtris[tri[t * 3 + k]].push_back(t);

  auto tri_plane = [&](int t, double* abcd, double* area) {
    const float* a = pos + (size_t)tri[t * 3 + 0] * 3;
    const float* b = pos + (size_t)tri[t * 3 + 1] * 3;
    const float* c = pos + (size_t)tri[t * 3 + 2] * 3;
    double e1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
    double e2[3] = {c[0] - a[0], c[1] - a[1], c[2] - a[2]};
    double nx = e1[1] * e2[2] - e1[2] * e2[1];
    double ny = e1[2] * e2[0] - e1[0] * e2[2];
    double nz = e1[0] * e2[1] - e1[1] * e2[0];
    double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    *area = 0.5 * len;
    if (len < 1e-30) return false;
    nx /= len; ny /= len; nz /= len;
    abcd[0] = nx; abcd[1] = ny; abcd[2] = nz;
    abcd[3] = -(nx * a[0] + ny * a[1] + nz * a[2]);
    return true;
  };
  for (int t = 0; t < n_tris; ++t) {
    double p[4], area;
    if (tri_plane(t, p, &area))
      for (int k = 0; k < 3; ++k)
        vq[tri[t * 3 + k]].add_plane(p[0], p[1], p[2], p[3], area);
  }

  // Border edges (edges with exactly one incident face) lock both endpoints:
  // collapsing them erodes the open boundary (meshopt's LockBorder behavior).
  std::vector<char> locked(n_verts, 0);
  {
    std::unordered_map<uint64_t, int> edge_count;
    edge_count.reserve((size_t)n_tris * 3);
    auto ekey = [](int a, int b) {
      if (a > b) std::swap(a, b);
      return ((uint64_t)a << 32) | (uint32_t)b;
    };
    for (int t = 0; t < n_tris; ++t)
      for (int k = 0; k < 3; ++k)
        edge_count[ekey(tri[t * 3 + k], tri[t * 3 + (k + 1) % 3])]++;
    for (auto& kv : edge_count)
      if (kv.second == 1) {
        locked[(int)(kv.first >> 32)] = 1;
        locked[(int)(kv.first & 0xffffffffu)] = 1;
      }
  }

  std::vector<int> gen(n_verts, 0);
  std::priority_queue<Collapse> heap;
  auto push_edge = [&](int u, int v) {
    if (u == v) return;
    // Directional half-edge collapse u -> v keeps v's position.
    if (locked[u]) return;
    Quadric q = vq[u];
    q.add(vq[v]);
    double e = q.error(pos + (size_t)v * 3);
    heap.push({e, u, v, gen[u] + gen[v]});
  };
  {
    std::unordered_set<uint64_t> seen;
    seen.reserve((size_t)n_tris * 3);
    for (int t = 0; t < n_tris; ++t)
      for (int k = 0; k < 3; ++k) {
        int a = tri[t * 3 + k], b = tri[t * 3 + (k + 1) % 3];
        uint64_t key = ((uint64_t)std::min(a, b) << 32) | (uint32_t)std::max(a, b);
        if (seen.insert(key).second) {
          push_edge(a, b);
          push_edge(b, a);
        }
      }
  }

  int live = n_tris;
  double worst = 0.0;
  std::vector<int> remap(n_verts);
  for (int i = 0; i < n_verts; ++i) remap[i] = i;
  auto find = [&](int v) {
    while (remap[v] != v) { remap[v] = remap[remap[v]]; v = remap[v]; }
    return v;
  };

  while (live > target_tris && !heap.empty()) {
    Collapse c = heap.top();
    heap.pop();
    int u = find(c.u), v = find(c.v);
    if (u != c.u || v != c.v || u == v) continue;          // stale
    if (c.gen != gen[u] + gen[v]) continue;                // lazy invalidation
    if (max_error > 0 && c.err > (double)max_error) break;  // error budget
    // Normal-flip rejection: faces around u (not containing v) must keep
    // their orientation when u moves to v's position.
    bool flip = false;
    for (int t : vtris[u]) {
      if (tri_dead[t]) continue;
      int a = tri[t * 3], b = tri[t * 3 + 1], d = tri[t * 3 + 2];
      if (a == v || b == v || d == v) continue;
      const float* pa = pos + (size_t)a * 3;
      const float* pb = pos + (size_t)b * 3;
      const float* pd = pos + (size_t)d * 3;
      auto nrm = [&](const float* x, const float* y, const float* z, double* n) {
        double e1[3] = {y[0] - x[0], y[1] - x[1], y[2] - x[2]};
        double e2[3] = {z[0] - x[0], z[1] - x[1], z[2] - x[2]};
        n[0] = e1[1] * e2[2] - e1[2] * e2[1];
        n[1] = e1[2] * e2[0] - e1[0] * e2[2];
        n[2] = e1[0] * e2[1] - e1[1] * e2[0];
      };
      double n0[3], n1[3];
      nrm(pa, pb, pd, n0);
      const float* qa = (a == u) ? pos + (size_t)v * 3 : pa;
      const float* qb = (b == u) ? pos + (size_t)v * 3 : pb;
      const float* qd = (d == u) ? pos + (size_t)v * 3 : pd;
      nrm(qa, qb, qd, n1);
      if (n0[0] * n1[0] + n0[1] * n1[1] + n0[2] * n1[2] <= 0) {
        flip = true;
        break;
      }
    }
    if (flip) continue;

    // Commit: u merges into v.
    remap[u] = v;
    vq[v].add(vq[u]);
    gen[v]++;
    worst = std::max(worst, c.err);
    for (int t : vtris[u]) {
      if (tri_dead[t]) continue;
      int* tv = &tri[t * 3];
      for (int k = 0; k < 3; ++k)
        if (tv[k] == u) tv[k] = v;
      if (tv[0] == tv[1] || tv[1] == tv[2] || tv[0] == tv[2]) {
        tri_dead[t] = 1;
        --live;
      } else {
        vtris[v].push_back(t);
      }
    }
    vtris[u].clear();
    // Refresh collapse candidates around v.
    std::unordered_set<int> nbrs;
    for (int t : vtris[v]) {
      if (tri_dead[t]) continue;
      for (int k = 0; k < 3; ++k) {
        int w = tri[t * 3 + k];
        if (w != v) nbrs.insert(w);
      }
    }
    for (int w : nbrs) {
      push_edge(w, v);
      push_edge(v, w);
    }
  }

  int out = 0;
  for (int t = 0; t < n_tris; ++t) {
    if (tri_dead[t]) continue;
    for (int k = 0; k < 3; ++k) out_indices[out * 3 + k] = tri[t * 3 + k];
    ++out;
  }
  if (out_error) *out_error = (float)std::sqrt(std::max(worst, 0.0));
  return out;
}

}  // extern "C"
