// het_tpu native graph preprocessing library.
//
// C++ replacements for the host-side heavy lifting of HeteroGraph
// construction (het_tpu/graph/build.py): the canonical (dst, rel, src)
// edge sort, degree counting, and unique-(relation, node) extraction.
// This plays the role the reference's CPU thrust converters play
// (hrt/include/DGLHackKernel/OpExport/DataConverters.inc.h) — the TPU
// compute path needs none of it at runtime, but graph ingest at
// wikikg2/mag scale (16-21M edges) is sort-bound on the host, and a
// counting/radix sort beats numpy's comparison lexsort several-fold.
//
// Exposed as a plain C ABI consumed through ctypes
// (het_tpu/graph/native.py); all arrays are caller-allocated.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// Stable counting sort of edges by key; writes the permutation.
// keys must lie in [0, num_keys).
void hetg_counting_sort(const int64_t* keys, int64_t n, int64_t num_keys,
                        const int64_t* order_in, int64_t* order_out) {
  std::vector<int64_t> counts(static_cast<size_t>(num_keys) + 1, 0);
  for (int64_t i = 0; i < n; ++i) counts[keys[order_in ? order_in[i] : i] + 1]++;
  for (int64_t k = 0; k < num_keys; ++k) counts[k + 1] += counts[k];
  for (int64_t i = 0; i < n; ++i) {
    int64_t e = order_in ? order_in[i] : i;
    order_out[counts[keys[e]]++] = e;
  }
}

// Canonical edge order: stable sort by (dst, rel, src) via three LSD
// counting passes.  order_out receives the permutation (canonical
// position -> original edge index).
void hetg_canonical_sort(const int64_t* src, const int64_t* dst,
                         const int64_t* rel, int64_t n, int64_t num_nodes,
                         int64_t num_rels, int64_t* order_out) {
  std::vector<int64_t> tmp1(n), tmp2(n);
  hetg_counting_sort(src, n, num_nodes + 1, nullptr, tmp1.data());
  hetg_counting_sort(rel, n, num_rels, tmp1.data(), tmp2.data());
  hetg_counting_sort(dst, n, num_nodes + 1, tmp2.data(), order_out);
}

// Degree histogram: counts[v] = #occurrences of v in ids.
void hetg_bincount(const int64_t* ids, int64_t n, int64_t num_bins,
                   int64_t* counts) {
  std::memset(counts, 0, sizeof(int64_t) * num_bins);
  for (int64_t i = 0; i < n; ++i) counts[ids[i]]++;
}

// Unique (rel, node) pairs over edges sorted any way.
// Outputs: n_unique; uniq_rel/uniq_node (caller-allocated, size >= n);
// inverse (size n): edge -> index into the unique list (which is sorted
// by (rel, node)).  Returns n_unique.
int64_t hetg_unique_pairs(const int64_t* rel, const int64_t* node, int64_t n,
                          int64_t num_nodes, int64_t num_rels,
                          int64_t* uniq_rel, int64_t* uniq_node,
                          int64_t* inverse) {
  // sort edge indices by key = rel * num_nodes + node via two counting
  // passes (node minor, rel major)
  std::vector<int64_t> tmp(n), order(n);
  hetg_counting_sort(node, n, num_nodes + 1, nullptr, tmp.data());
  hetg_counting_sort(rel, n, num_rels, tmp.data(), order.data());
  int64_t nu = 0;
  int64_t prev_r = -1, prev_v = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t e = order[i];
    if (rel[e] != prev_r || node[e] != prev_v) {
      prev_r = rel[e];
      prev_v = node[e];
      uniq_rel[nu] = prev_r;
      uniq_node[nu] = prev_v;
      nu++;
    }
    inverse[e] = nu - 1;
  }
  return nu;
}

// Degree-descending "infidel" sort of nodes for load balancing
// (reference: hrt/python/utils/coo_sorters.py:173) — returns node order.
void hetg_degree_sort(const int64_t* deg, int64_t num_nodes,
                      int64_t* node_order) {
  std::vector<int64_t> idx(num_nodes);
  for (int64_t i = 0; i < num_nodes; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return deg[a] > deg[b];
  });
  std::memcpy(node_order, idx.data(), sizeof(int64_t) * num_nodes);
}

// Uniform fanout in-neighborhood sampling (the minibatch sampler hot
// loop; reference: DGL dataloader sampling consumed by
// convert_sampled_iteration_to_mydgl_graph,
// hrt/python/utils/mydglgraph_converters.py:18-103).
//
// ptr/nbr_src/nbr_rel: in-CSR over destinations (ptr size num_nodes+1).
// seeds get local ids [0, n_seeds); discovered nodes follow in discovery
// order.  Per frontier node, takes all in-edges when deg <= fanout, else
// `fanout` distinct ones (Floyd's sampling).  Outputs are caller-
// allocated: edges_* sized >= max_edges, node_map >= max_nodes; sampling
// stops adding a node's edges if either capacity would overflow.
// Returns the edge count; *n_nodes_out receives the node count.
int64_t hetg_sample_fanout(const int64_t* ptr, const int64_t* nbr_src,
                           const int64_t* nbr_rel, const int64_t* seeds,
                           int64_t n_seeds, int64_t fanout, int64_t num_hops,
                           uint64_t rng_seed, int64_t num_nodes,
                           int64_t max_edges, int64_t max_nodes,
                           int64_t* edges_s, int64_t* edges_d,
                           int64_t* edges_r, int64_t* node_map,
                           int64_t* n_nodes_out) {
  std::vector<int64_t> local(num_nodes, -1);
  std::vector<int64_t> frontier, next;
  std::mt19937_64 rng(rng_seed);
  int64_t n_nodes = 0, n_edges = 0;
  for (int64_t i = 0; i < n_seeds && n_nodes < max_nodes; ++i) {
    int64_t s = seeds[i];
    if (local[s] < 0) {
      local[s] = n_nodes;
      node_map[n_nodes++] = s;
      frontier.push_back(s);
    }
  }
  std::vector<int64_t> picks;
  for (int64_t hop = 0; hop < num_hops; ++hop) {
    next.clear();
    for (int64_t v : frontier) {
      int64_t lo = ptr[v], hi = ptr[v + 1], deg = hi - lo;
      if (deg == 0) continue;
      picks.clear();
      if (deg <= fanout) {
        for (int64_t t = lo; t < hi; ++t) picks.push_back(t);
      } else {
        // Floyd's algorithm: fanout distinct draws from [lo, hi)
        for (int64_t j = deg - fanout; j < deg; ++j) {
          int64_t t = lo + static_cast<int64_t>(rng() % (uint64_t)(j + 1));
          if (std::find(picks.begin(), picks.end(), t) != picks.end())
            t = lo + j;
          picks.push_back(t);
        }
      }
      if (n_edges + static_cast<int64_t>(picks.size()) > max_edges) break;
      for (int64_t t : picks) {
        int64_t u = nbr_src[t];
        if (local[u] < 0) {
          if (n_nodes >= max_nodes) continue;
          local[u] = n_nodes;
          node_map[n_nodes++] = u;
          next.push_back(u);
        }
        edges_s[n_edges] = local[u];
        edges_d[n_edges] = local[v];
        edges_r[n_edges] = nbr_rel[t];
        n_edges++;
      }
    }
    frontier.swap(next);
    if (frontier.empty()) break;
  }
  *n_nodes_out = n_nodes;
  return n_edges;
}

int64_t hetg_version() { return 2; }

}  // extern "C"
