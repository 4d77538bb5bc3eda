// Fast grid router for host-side route compilation.
//
// The reference delegates route tracing to CARLA's C++ GlobalRoutePlanner
// over the OpenDRIVE graph; our importer routes over rasterized road masks
// instead. The Python/scipy Dijkstra costs ~10-15 s per long route on the
// big towns — this native A* over the same downsampled grid runs in
// milliseconds. Exposed via a C ABI for ctypes (no pybind11 dependency).
//
// Grid semantics match maps/routing.RoadRouter: 8-connected cells, edge
// cost = step length * 0.5*(penalty(src)+penalty(dst)) with
// penalty = 1 + 2*clip(1 - inside_m/3, 0, 1) pushing paths toward the
// road interior.

#include <cstdint>
#include <cmath>
#include <queue>
#include <vector>

namespace {

struct Node {
  float f;
  int32_t idx;
  bool operator<(const Node& o) const { return f > o.f; }  // min-heap
};

}  // namespace

extern "C" {

// grid: h*w uint8 occupancy (1 = road). penalty: h*w float node penalties.
// start/goal: cell indices (y*w + x). out_path: caller buffer of
// max_path int32 cell indices. Returns path length (goal..start order
// reversed to start..goal), or -1 if unreachable / error.
int32_t route_grid(const uint8_t* grid, const float* penalty,
                   int32_t h, int32_t w, int32_t start, int32_t goal,
                   float cell_m, int32_t* out_path, int32_t max_path) {
  const int32_t n = h * w;
  if (start < 0 || start >= n || goal < 0 || goal >= n) return -1;
  if (!grid[start] || !grid[goal]) return -1;

  std::vector<float> dist(n, std::numeric_limits<float>::infinity());
  std::vector<int32_t> pred(n, -1);
  std::priority_queue<Node> open;

  const int32_t gy = goal / w, gx = goal % w;
  auto heuristic = [&](int32_t idx) {
    const int32_t y = idx / w, x = idx % w;
    const float dy = static_cast<float>(y - gy);
    const float dx = static_cast<float>(x - gx);
    return std::sqrt(dx * dx + dy * dy) * cell_m;  // admissible (pen >= 1)
  };

  dist[start] = 0.0f;
  open.push({heuristic(start), start});

  const int32_t dyv[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
  const int32_t dxv[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
  const float len[8] = {1.41421356f, 1.f, 1.41421356f, 1.f,
                        1.f, 1.41421356f, 1.f, 1.41421356f};

  while (!open.empty()) {
    const Node cur = open.top();
    open.pop();
    const int32_t u = cur.idx;
    if (u == goal) break;
    if (cur.f > dist[u] + heuristic(u) + 1e-4f) continue;  // stale
    const int32_t uy = u / w, ux = u % w;
    for (int k = 0; k < 8; ++k) {
      const int32_t vy = uy + dyv[k], vx = ux + dxv[k];
      if (vy < 0 || vy >= h || vx < 0 || vx >= w) continue;
      const int32_t v = vy * w + vx;
      if (!grid[v]) continue;
      const float cost =
          len[k] * cell_m * 0.5f * (penalty[u] + penalty[v]);
      const float nd = dist[u] + cost;
      if (nd < dist[v]) {
        dist[v] = nd;
        pred[v] = u;
        open.push({nd + heuristic(v), v});
      }
    }
  }

  if (pred[goal] < 0 && goal != start) return -1;
  // walk back
  int32_t count = 0;
  for (int32_t c = goal; c >= 0 && count < max_path; c = pred[c]) {
    out_path[count++] = c;
    if (c == start) break;
  }
  if (count == 0 || out_path[count - 1] != start) return -1;
  // reverse in place to start..goal
  for (int32_t i = 0; i < count / 2; ++i) {
    const int32_t t = out_path[i];
    out_path[i] = out_path[count - 1 - i];
    out_path[count - 1 - i] = t;
  }
  return count;
}

}  // extern "C"
