// Native host-side helpers for starframe-tpu.
//
// The reference's native tier is Rust (SURVEY.md §2 language note); the hot
// simulation path here is XLA-compiled, so the native tier covers the host
// orchestration work that would otherwise be Python loops:
//   - greedy graph coloring of the joint/constraint topology (SURVEY.md §7.5,
//     BASELINE.json:5 "graph-colored constraint batches"), run at scene build
//     time so the solver can do exact Gauss-Seidel over color batches;
//   - a brute-force AABB pair oracle used by tests/tools on big scenes;
//   - trajectory comparison for golden-replay tooling.
//
// Build: g++ -O3 -shared -fPIC coloring.cpp -o _libsf_native.so (see
// native/__init__.py, which builds lazily and falls back to Python).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Greedy coloring of a constraint graph: constraints i, j conflict when they
// share a body (excluding negative/static sentinel bodies, which can be
// written by any number of constraints). Returns the number of colors used,
// or -1 on error. colors[] must hold n entries.
int32_t sf_greedy_color(const int32_t* body_a, const int32_t* body_b,
                        int32_t n, const uint8_t* active,
                        const uint8_t* body_is_static, int32_t n_bodies,
                        int32_t* colors) {
  if (n < 0 || n_bodies < 0) return -1;
  // adjacency via per-body constraint lists
  std::vector<std::vector<int32_t>> by_body(n_bodies);
  auto track = [&](int32_t b, int32_t ci) {
    if (b >= 0 && b < n_bodies && !(body_is_static && body_is_static[b]))
      by_body[b].push_back(ci);
  };
  for (int32_t i = 0; i < n; i++) {
    colors[i] = 0;
    if (active && !active[i]) continue;
    track(body_a[i], i);
    track(body_b[i], i);
  }
  int32_t max_color = 0;
  std::vector<int32_t> used;
  for (int32_t i = 0; i < n; i++) {
    if (active && !active[i]) { colors[i] = 0; continue; }
    used.clear();
    auto collect = [&](int32_t b) {
      if (b < 0 || b >= n_bodies) return;
      if (body_is_static && body_is_static[b]) return;
      for (int32_t j : by_body[b])
        if (j < i) used.push_back(colors[j]);
    };
    collect(body_a[i]);
    collect(body_b[i]);
    std::sort(used.begin(), used.end());
    int32_t c = 0;
    for (int32_t u : used) {
      if (u == c) c++;
      else if (u > c) break;
    }
    colors[i] = c;
    if (c + 1 > max_color) max_color = c + 1;
  }
  return max_color;
}

// Brute-force AABB pair oracle: writes up to max_pairs (a, b) index pairs;
// returns the total number of overlapping pairs found (may exceed max_pairs).
int64_t sf_bruteforce_pairs(const float* lo, const float* hi, int32_t m,
                            const uint8_t* active, const int32_t* body_idx,
                            int32_t* out_a, int32_t* out_b, int64_t max_pairs) {
  int64_t count = 0;
  for (int32_t i = 0; i < m; i++) {
    if (active && !active[i]) continue;
    for (int32_t j = i + 1; j < m; j++) {
      if (active && !active[j]) continue;
      if (body_idx && body_idx[i] >= 0 && body_idx[i] == body_idx[j]) continue;
      const float* li = lo + 2 * i; const float* hi_i = hi + 2 * i;
      const float* lj = lo + 2 * j; const float* hj = hi + 2 * j;
      if (li[0] <= hj[0] && lj[0] <= hi_i[0] && li[1] <= hj[1] && lj[1] <= hi_i[1]) {
        if (count < max_pairs) { out_a[count] = i; out_b[count] = j; }
        count++;
      }
    }
  }
  return count;
}

// Max |a - b| over n floats (trajectory comparison for replay tooling).
float sf_max_abs_diff(const float* a, const float* b, int64_t n) {
  float m = 0.0f;
  for (int64_t i = 0; i < n; i++) {
    float d = a[i] - b[i];
    if (d < 0) d = -d;
    if (d > m) m = d;
  }
  return m;
}

}  // extern "C"
