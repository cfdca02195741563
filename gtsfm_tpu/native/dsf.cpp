// Union-find (disjoint-set forest) track formation — native core.
//
// TPU-native framework's replacement for GTSAM's C++ DSF used by the
// reference at gtsfm/data_association/cpp_dsf_tracks_estimator.py:74
// (gtsam.gtsfm.tracksFromPairwiseMatches). Graph hooking/compression is
// pointer-chasing work that gains nothing from XLA; it runs on host between
// the device-side matching and triangulation stages.
//
// Exposed C ABI (ctypes):
//   dsf_components(n_nodes, n_edges, edges_u, edges_v, out_root) -> void
//     edges_*: int64 arrays. out_root[i] = canonical root of node i.
//
// Build: g++ -O3 -march=native -shared -fPIC dsf.cpp -o libdsf.so

#include <cstdint>
#include <vector>

namespace {

struct DSF {
  std::vector<int64_t> parent;
  std::vector<int32_t> rank;

  explicit DSF(int64_t n) : parent(n), rank(n, 0) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }

  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    // Path compression.
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }

  void unite(int64_t a, int64_t b) {
    int64_t ra = find(a), rb = find(b);
    if (ra == rb) return;
    if (rank[ra] < rank[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    if (rank[ra] == rank[rb]) ++rank[ra];
  }
};

}  // namespace

extern "C" {

void dsf_components(int64_t n_nodes, int64_t n_edges, const int64_t* edges_u,
                    const int64_t* edges_v, int64_t* out_root) {
  DSF dsf(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) dsf.unite(edges_u[e], edges_v[e]);
  for (int64_t i = 0; i < n_nodes; ++i) out_root[i] = dsf.find(i);
}

// Largest connected component over an image-level graph (for view-graph
// pruning, reference gtsfm/utils/graph.py:20-60). out_keep[i] = 1 if node i
// is in the largest component.
void dsf_largest_component(int64_t n_nodes, int64_t n_edges,
                           const int64_t* edges_u, const int64_t* edges_v,
                           uint8_t* out_keep) {
  DSF dsf(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) dsf.unite(edges_u[e], edges_v[e]);
  std::vector<int64_t> count(n_nodes, 0);
  // Only nodes that appear in at least one edge belong to the graph.
  std::vector<uint8_t> present(n_nodes, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    present[edges_u[e]] = 1;
    present[edges_v[e]] = 1;
  }
  for (int64_t i = 0; i < n_nodes; ++i)
    if (present[i]) ++count[dsf.find(i)];
  int64_t best_root = -1, best = 0;
  for (int64_t i = 0; i < n_nodes; ++i)
    if (count[i] > best) { best = count[i]; best_root = i; }
  for (int64_t i = 0; i < n_nodes; ++i)
    out_keep[i] = (present[i] && best_root >= 0 && dsf.find(i) == best_root) ? 1 : 0;
}

}  // extern "C"
