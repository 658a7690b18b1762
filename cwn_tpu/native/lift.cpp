// Native lifting kernels: chordless-cycle (induced ring) enumeration.
//
// This is the TPU build's replacement for the role graph-tool's C++
// subgraph-isomorphism plays in the reference lift
// (/root/reference/data/utils.py:300-330): finding all induced cycles of
// length 3..max_k.  Same algorithm and canonicalisation as the Python
// implementation in cwn_tpu/lift/rings.py (root-minimal DFS over induced
// paths, direction fixed by v1 < closing vertex), ~50x faster.
//
// C ABI for ctypes:
//   find_induced_cycles(n, m, edges_u, edges_v, max_k,
//                       out, out_capacity) -> int64
// `out` receives rings as [len, v0, v1, ...] records; the return value is
// the total number of int32 slots required (call again with a larger
// buffer if it exceeds out_capacity).  Returns -1 on invalid input.

#include <cstdint>
#include <vector>
#include <algorithm>

namespace {

struct Graph {
  int32_t n;
  std::vector<std::vector<int32_t>> adj;
  std::vector<std::vector<uint64_t>> adj_bits;  // bitset per vertex

  bool connected(int32_t a, int32_t b) const {
    return (adj_bits[a][b >> 6] >> (b & 63)) & 1;
  }
};

void build_graph(Graph& g, int32_t n, int64_t m, const int32_t* eu,
                 const int32_t* ev) {
  g.n = n;
  g.adj.assign(n, {});
  g.adj_bits.assign(n, std::vector<uint64_t>((n + 63) / 64, 0));
  for (int64_t e = 0; e < m; ++e) {
    int32_t u = eu[e], v = ev[e];
    if (u == v || u < 0 || v < 0 || u >= n || v >= n) continue;
    if (!g.connected(u, v)) {
      g.adj[u].push_back(v);
      g.adj[v].push_back(u);
      g.adj_bits[u][v >> 6] |= uint64_t(1) << (v & 63);
      g.adj_bits[v][u >> 6] |= uint64_t(1) << (u & 63);
    }
  }
  for (auto& nb : g.adj) std::sort(nb.begin(), nb.end());
}

// DFS over induced paths rooted at r (all other vertices > r).  A path
// [r, v1, ..., tip] is extended only with vertices adjacent to the tip and
// to no other path vertex; adjacency to r closes a ring (recorded iff
// v1 < closing vertex, deduplicating the two directions).
void dfs_rings(const Graph& g, int32_t r, int32_t max_k,
               std::vector<int32_t>& path, std::vector<uint64_t>& in_path,
               std::vector<std::vector<int32_t>>& rings) {
  int32_t tip = path.back();
  for (int32_t w : g.adj[tip]) {
    if (w <= r) continue;
    if ((in_path[w >> 6] >> (w & 63)) & 1) continue;
    // Chordless: w must not touch any interior path vertex (path[1..-2]).
    bool chord = false;
    for (size_t i = 1; i + 1 < path.size(); ++i) {
      if (g.connected(w, path[i])) { chord = true; break; }
    }
    if (chord) continue;
    if (g.connected(w, r)) {
      // Closing edge; record if canonical direction and length >= 3.
      if (path.size() >= 2 && path[1] < w) {
        std::vector<int32_t> ring(path);
        ring.push_back(w);
        rings.push_back(std::move(ring));
      }
      continue;  // extending through w would keep the chord (w, r)
    }
    if ((int32_t)path.size() + 1 < max_k) {
      path.push_back(w);
      in_path[w >> 6] |= uint64_t(1) << (w & 63);
      dfs_rings(g, r, max_k, path, in_path, rings);
      in_path[w >> 6] &= ~(uint64_t(1) << (w & 63));
      path.pop_back();
    }
  }
}

}  // namespace

extern "C" int64_t find_induced_cycles(
    int32_t n, int64_t m, const int32_t* edges_u, const int32_t* edges_v,
    int32_t max_k, int32_t* out, int64_t out_capacity) {
  if (n < 0 || m < 0 || max_k < 0) return -1;
  std::vector<std::vector<int32_t>> rings;
  if (max_k >= 3 && n > 0) {
    Graph g;
    build_graph(g, n, m, edges_u, edges_v);
    std::vector<int32_t> path;
    std::vector<uint64_t> in_path((n + 63) / 64, 0);
    for (int32_t r = 0; r < n; ++r) {
      int32_t bigger = 0;
      for (int32_t x : g.adj[r]) bigger += (x > r);
      if (bigger < 2) continue;
      for (int32_t v1 : g.adj[r]) {
        if (v1 <= r) continue;
        path.clear();
        std::fill(in_path.begin(), in_path.end(), 0);
        path.push_back(r);
        path.push_back(v1);
        in_path[r >> 6] |= uint64_t(1) << (r & 63);
        in_path[v1 >> 6] |= uint64_t(1) << (v1 & 63);
        dfs_rings(g, r, max_k, path, in_path, rings);
      }
    }
  }
  // Canonical order: by length, then by sorted vertex tuple (matches the
  // Python implementation's ordering).
  std::vector<std::pair<std::vector<int32_t>, size_t>> keys;
  keys.reserve(rings.size());
  for (size_t i = 0; i < rings.size(); ++i) {
    std::vector<int32_t> k(rings[i]);
    std::sort(k.begin(), k.end());
    k.insert(k.begin(), (int32_t)rings[i].size());
    keys.emplace_back(std::move(k), i);
  }
  std::sort(keys.begin(), keys.end());

  int64_t needed = 0;
  for (const auto& r : rings) needed += 1 + (int64_t)r.size();
  if (needed > out_capacity) return needed;

  int64_t pos = 0;
  for (const auto& [key, idx] : keys) {
    const auto& r = rings[idx];
    out[pos++] = (int32_t)r.size();
    for (int32_t v : r) out[pos++] = v;
  }
  return needed;
}
