// Native host-side runtime kernels.
//
// The reference's native surface is CUDA compute (replaced by JAX/Pallas on
// TPU); its remaining host-side hot paths — A* pathfinding over occupancy
// grids (nav/quad_helpers.py:201-258), the euclidean distance transform
// behind the SDF collision maps (validation/utils/createSDF.py), and morton
// encoding for grid bookkeeping — are implemented here in C++ for the
// host-side of the pipeline. Exposed through a plain C ABI consumed via
// ctypes (lib.py); every entry point has a pure-python fallback.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- morton
// 10-bit 3-D morton interleave (matches ops/ray_ops.py expand-bits math)
static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

void morton3d_encode(const int32_t* coords, int64_t n, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t x = expand_bits((uint32_t)coords[i * 3 + 0]);
    uint32_t y = expand_bits((uint32_t)coords[i * 3 + 1]);
    uint32_t z = expand_bits((uint32_t)coords[i * 3 + 2]);
    out[i] = (int32_t)(x | (y << 1) | (z << 2));
  }
}

// ------------------------------------------------------------------- A*
// 6-connected unit-cost A* with euclidean heuristic. Returns path length
// (#cells) or -1 when unreachable; path written as flat xyz triples.
int64_t astar3d(const uint8_t* occupied, int32_t sx, int32_t sy, int32_t sz,
                const int32_t* start, const int32_t* goal, int32_t* out_path,
                int64_t max_path) {
  const int64_t n = (int64_t)sx * sy * sz;
  auto idx = [&](int32_t x, int32_t y, int32_t z) -> int64_t {
    return ((int64_t)x * sy + y) * sz + z;
  };
  const int64_t start_i = idx(start[0], start[1], start[2]);
  const int64_t goal_i = idx(goal[0], goal[1], goal[2]);
  if (occupied[start_i] || occupied[goal_i]) return -1;

  auto heuristic = [&](int64_t i) {
    int32_t x = (int32_t)(i / ((int64_t)sy * sz));
    int32_t y = (int32_t)((i / sz) % sy);
    int32_t z = (int32_t)(i % sz);
    double dx = x - goal[0], dy = y - goal[1], dz = z - goal[2];
    return std::sqrt(dx * dx + dy * dy + dz * dz);
  };

  std::vector<float> gscore(n, std::numeric_limits<float>::infinity());
  std::vector<int64_t> came_from(n, -1);
  using Node = std::pair<double, int64_t>;
  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> open;
  gscore[start_i] = 0.f;
  open.push({heuristic(start_i), start_i});

  const int32_t nb[6][3] = {{1, 0, 0}, {-1, 0, 0}, {0, 1, 0},
                            {0, -1, 0}, {0, 0, 1}, {0, 0, -1}};
  while (!open.empty()) {
    auto [f, cur] = open.top();
    open.pop();
    if (cur == goal_i) {
      // reconstruct
      std::vector<int64_t> rev;
      for (int64_t c = cur; c != -1; c = came_from[c]) rev.push_back(c);
      int64_t len = (int64_t)rev.size();
      if (len > max_path) return -2;  // caller buffer too small
      for (int64_t k = 0; k < len; ++k) {
        int64_t c = rev[len - 1 - k];
        out_path[k * 3 + 0] = (int32_t)(c / ((int64_t)sy * sz));
        out_path[k * 3 + 1] = (int32_t)((c / sz) % sy);
        out_path[k * 3 + 2] = (int32_t)(c % sz);
      }
      return len;
    }
    int32_t x = (int32_t)(cur / ((int64_t)sy * sz));
    int32_t y = (int32_t)((cur / sz) % sy);
    int32_t z = (int32_t)(cur % sz);
    float g = gscore[cur];
    for (auto& d : nb) {
      int32_t nx = x + d[0], ny = y + d[1], nz = z + d[2];
      if (nx < 0 || nx >= sx || ny < 0 || ny >= sy || nz < 0 || nz >= sz)
        continue;
      int64_t ni = idx(nx, ny, nz);
      if (occupied[ni]) continue;
      float tentative = g + 1.0f;
      if (tentative < gscore[ni]) {
        gscore[ni] = tentative;
        came_from[ni] = cur;
        open.push({tentative + heuristic(ni), ni});
      }
    }
  }
  return -1;
}

// ------------------------------------------------------------------ EDT
// Exact squared euclidean distance transform (Felzenszwalb & Huttenlocher),
// separable 1-D passes — the math behind scipy distance_transform_edt used
// by the reference's SDF builder.
static void edt_1d(const float* f, float* d, int n, std::vector<int>& v,
                   std::vector<float>& z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<float>::infinity();
  z[1] = std::numeric_limits<float>::infinity();
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.0f * q - 2.0f * v[k]);
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<float>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    float dq = q - v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

void distance_transform_edt(const uint8_t* free_space, int32_t sx, int32_t sy,
                            int32_t sz, float* out) {
  const float INF = 1e20f;
  const int64_t n = (int64_t)sx * sy * sz;
  std::vector<float> buf(n);
  for (int64_t i = 0; i < n; ++i) buf[i] = free_space[i] ? INF : 0.0f;

  int maxdim = std::max(sx, std::max(sy, sz));
  std::vector<float> f(maxdim), d(maxdim);
  std::vector<int> v(maxdim);
  std::vector<float> z(maxdim + 1);

  // pass along z (contiguous)
  for (int64_t xy = 0; xy < (int64_t)sx * sy; ++xy) {
    float* row = &buf[xy * sz];
    std::memcpy(f.data(), row, sz * sizeof(float));
    edt_1d(f.data(), row, sz, v, z);
  }
  // pass along y
  for (int32_t x = 0; x < sx; ++x) {
    for (int32_t zz = 0; zz < sz; ++zz) {
      for (int32_t y = 0; y < sy; ++y)
        f[y] = buf[((int64_t)x * sy + y) * sz + zz];
      edt_1d(f.data(), d.data(), sy, v, z);
      for (int32_t y = 0; y < sy; ++y)
        buf[((int64_t)x * sy + y) * sz + zz] = d[y];
    }
  }
  // pass along x
  for (int32_t y = 0; y < sy; ++y) {
    for (int32_t zz = 0; zz < sz; ++zz) {
      for (int32_t x = 0; x < sx; ++x)
        f[x] = buf[((int64_t)x * sy + y) * sz + zz];
      edt_1d(f.data(), d.data(), sx, v, z);
      for (int32_t x = 0; x < sx; ++x)
        buf[((int64_t)x * sy + y) * sz + zz] = d[x];
    }
  }
  for (int64_t i = 0; i < n; ++i) out[i] = std::sqrt(buf[i]);
}

}  // extern "C"
