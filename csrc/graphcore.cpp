// graphcore — native host-side graph data engine for gat_pytorch_tpu.
//
// TPU-native counterpart of the C++/CUDA data machinery the reference leans
// on (torch-scatter / torch-sparse wheels + PyG DataLoader batching; see
// reference env/gat_req_mac_version.yml and models/GATModel.py:273-287).
// The TPU does the math; this library owns the host data path that feeds it:
// self-loop canonicalisation, destination stable-sort (counting sort, O(E)),
// CSR offset construction, block-diagonal batching, and uniform neighbour
// sampling — all operating on raw int64/float32 buffers exposed via ctypes
// (no pybind11 in this image).
//
// Build: make -C csrc   (produces gat_pytorch_tpu/graph/_graphcore.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <unordered_set>
#include <vector>

extern "C" {

// Drop existing self-loops, append one (i,i) per node.
// in:  senders/receivers length e, num_nodes n
// out: out_senders/out_receivers, capacity >= e + n. Returns new edge count.
int64_t gc_add_remaining_self_loops(const int64_t* senders,
                                    const int64_t* receivers,
                                    int64_t e, int64_t n,
                                    int64_t* out_senders,
                                    int64_t* out_receivers) {
  int64_t k = 0;
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] != receivers[i]) {
      out_senders[k] = senders[i];
      out_receivers[k] = receivers[i];
      ++k;
    }
  }
  for (int64_t v = 0; v < n; ++v) {
    out_senders[k] = v;
    out_receivers[k] = v;
    ++k;
  }
  return k;
}

// Stable counting-sort of edges by receiver. O(E + N).
// num_nodes must be > max(receivers). Outputs sorted (senders, receivers)
// and the permutation applied (for reordering edge attributes host-side).
void gc_sort_by_destination(const int64_t* senders, const int64_t* receivers,
                            int64_t e, int64_t n,
                            int64_t* out_senders, int64_t* out_receivers,
                            int64_t* out_perm) {
  std::vector<int64_t> count(static_cast<size_t>(n) + 1, 0);
  for (int64_t i = 0; i < e; ++i) count[receivers[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) count[v + 1] += count[v];
  for (int64_t i = 0; i < e; ++i) {
    int64_t pos = count[receivers[i]]++;
    out_senders[pos] = senders[i];
    out_receivers[pos] = receivers[i];
    out_perm[pos] = i;
  }
}

// CSR row offsets from a dst-sorted receiver array. out has n+1 entries.
void gc_csr_offsets(const int64_t* receivers, int64_t e, int64_t n,
                    int64_t* out_offsets) {
  std::memset(out_offsets, 0, sizeof(int64_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) out_offsets[receivers[i] + 1]++;
  for (int64_t v = 0; v < n; ++v) out_offsets[v + 1] += out_offsets[v];
}

// Block-diagonal batching of g graphs (the reference's PyG DataLoader
// collation, models/GATModel.py:273-287): offsets node ids of graph i by
// sum of previous graphs' node counts. Inputs are the concatenated edge
// lists plus per-graph (node_count, edge_count). Writes offset edge ids and
// per-node graph ids.
void gc_block_diagonal(const int64_t* senders, const int64_t* receivers,
                       const int64_t* node_counts, const int64_t* edge_counts,
                       int64_t num_graphs,
                       int64_t* out_senders, int64_t* out_receivers,
                       int64_t* out_graph_ids) {
  int64_t node_off = 0, edge_off = 0;
  for (int64_t gi = 0; gi < num_graphs; ++gi) {
    const int64_t ne = edge_counts[gi];
    for (int64_t i = 0; i < ne; ++i) {
      out_senders[edge_off + i] = senders[edge_off + i] + node_off;
      out_receivers[edge_off + i] = receivers[edge_off + i] + node_off;
    }
    const int64_t nn = node_counts[gi];
    for (int64_t v = 0; v < nn; ++v) out_graph_ids[node_off + v] = gi;
    node_off += nn;
    edge_off += ne;
  }
}

// Uniform neighbour sampling WITHOUT replacement: for each seed node,
// sample exactly min(k, degree) distinct in-edge slots, each k-subset
// equally likely (Floyd's algorithm, O(k) per node). Distinctness
// matters downstream: GAT attention is degree-sensitive, so duplicate
// sampled edges would bias the segment softmax (data/sampling.py
// docstring contract). Operates on the CSR (offsets, senders) view.
// out_src/out_dst have capacity num_seeds*k; returns number written.
int64_t gc_sample_neighbors(const int64_t* offsets, const int64_t* senders,
                            const int64_t* seeds, int64_t num_seeds,
                            int64_t k, uint64_t seed,
                            int64_t* out_src, int64_t* out_dst) {
  std::mt19937_64 rng(seed);
  std::unordered_set<int64_t> picked;
  int64_t w = 0;
  for (int64_t s = 0; s < num_seeds; ++s) {
    const int64_t v = seeds[s];
    const int64_t lo = offsets[v], hi = offsets[v + 1];
    const int64_t deg = hi - lo;
    if (deg <= 0) continue;
    if (deg <= k) {
      for (int64_t i = lo; i < hi; ++i) {
        out_src[w] = senders[i];
        out_dst[w] = v;
        ++w;
      }
    } else {
      // Floyd: for j in [deg-k, deg): draw t ~ U[0, j]; add t unless
      // already picked, else add j. Yields a uniform k-subset of [0,deg).
      picked.clear();
      for (int64_t j = deg - k; j < deg; ++j) {
        std::uniform_int_distribution<int64_t> dist(0, j);
        const int64_t t = dist(rng);
        const int64_t slot = picked.insert(t).second ? t : j;
        if (slot != t) picked.insert(slot);
        out_src[w] = senders[lo + slot];
        out_dst[w] = v;
        ++w;
      }
    }
  }
  return w;
}

// Reverse Cuthill-McKee ordering over the SYMMETRISED adjacency of the
// edge list: BFS from a minimum-degree root per component, neighbours
// visited in ascending-degree order, final labelling reversed. Minimises
// the bandwidth max|new(src)-new(dst)| so that dst-sorted edge tiles read
// src rows from a narrow window — the enabler for the windowed (VMEM-
// resident) node->edge gather kernels (docs/PERF.md round-2 close: a
// random row gather costs a full 4 KB tile per edge; a banded one streams).
// out_order[i] = old node id placed at new position i. Self-loops ignored.
void gc_rcm_order(const int64_t* senders, const int64_t* receivers,
                  int64_t e, int64_t n, int64_t* out_order) {
  // symmetric CSR (each non-loop edge contributes both directions)
  std::vector<int64_t> deg(static_cast<size_t>(n) + 1, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] == receivers[i]) continue;
    deg[senders[i] + 1]++;
    deg[receivers[i] + 1]++;
  }
  std::vector<int64_t> off(deg);
  for (int64_t v = 0; v < n; ++v) off[v + 1] += off[v];
  std::vector<int64_t> adj(off[n]);
  std::vector<int64_t> cur(off.begin(), off.end() - 1);
  for (int64_t i = 0; i < e; ++i) {
    if (senders[i] == receivers[i]) continue;
    adj[cur[senders[i]]++] = receivers[i];
    adj[cur[receivers[i]]++] = senders[i];
  }
  auto degree = [&](int64_t v) { return off[v + 1] - off[v]; };

  // nodes sorted by degree once: BFS roots are taken in this order, and
  // it doubles as the tie-break-free neighbour ordering base
  std::vector<int64_t> by_deg(n);
  for (int64_t v = 0; v < n; ++v) by_deg[v] = v;
  std::stable_sort(by_deg.begin(), by_deg.end(),
                   [&](int64_t a, int64_t b) { return degree(a) < degree(b); });

  std::vector<char> seen(n, 0);
  std::vector<int64_t> queue;
  queue.reserve(n);
  std::vector<int64_t> nbrs;
  int64_t w = 0;
  for (int64_t root_i = 0; root_i < n; ++root_i) {
    const int64_t root = by_deg[root_i];
    if (seen[root]) continue;
    seen[root] = 1;
    size_t head = queue.size();
    queue.push_back(root);
    while (head < queue.size()) {
      const int64_t v = queue[head++];
      out_order[w++] = v;
      nbrs.clear();
      for (int64_t j = off[v]; j < off[v + 1]; ++j) {
        const int64_t u = adj[j];
        if (!seen[u]) {
          seen[u] = 1;
          nbrs.push_back(u);
        }
      }
      // (degree, id) order — matches the numpy spec's unique+argsort
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int64_t a, int64_t b) {
                  const int64_t da = degree(a), db = degree(b);
                  return da != db ? da < db : a < b;
                });
      for (int64_t u : nbrs) queue.push_back(u);
    }
  }
  // reverse (the "R" in RCM: reversing Cuthill-McKee provably never
  // increases, and usually reduces, the profile)
  for (int64_t i = 0; i < n / 2; ++i) {
    std::swap(out_order[i], out_order[n - 1 - i]);
  }
}

}  // extern "C"
