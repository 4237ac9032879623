// Constrained minimum-degree elimination ordering (CCOLAMD-class).
//
// Native replacement for the reference's SuiteSparse CCOLAMD binding
// (reference src/external/suitesparse/ccolamd.pyx — shipped broken there;
// see SURVEY §7.4).  Operates on the variable adjacency graph in CSR form;
// cmember groups are eliminated in ascending order, and within a group the
// minimum-degree vertex (ties: lowest index) is eliminated, with its
// neighborhood clique-connected, exactly matching the Python fallback in
// nfisam_tpu/graph/ordering.py.
//
// Build: g++ -O2 -shared -fPIC -o libnfisam_ordering.so ordering.cc

#include <cstddef>
#include <cstdint>
#include <set>
#include <vector>

extern "C" {

// Returns 0 on success. perm[k] = index of the k-th eliminated vertex.
int nfisam_constrained_min_degree(int n, const int* indptr,
                                  const int* indices, const int* cmember,
                                  int* perm) {
  if (n <= 0) return 0;
  std::vector<std::set<int>> adj(n);
  for (int i = 0; i < n; ++i) {
    for (int k = indptr[i]; k < indptr[i + 1]; ++k) {
      int j = indices[k];
      if (j < 0 || j >= n) return 1;
      if (j != i) {
        adj[i].insert(j);
        adj[j].insert(i);
      }
    }
  }
  std::vector<char> alive(n, 1);
  std::set<int> groups;
  for (int i = 0; i < n; ++i) groups.insert(cmember[i]);

  int pos = 0;
  for (int group : groups) {
    std::set<int> members;
    for (int i = 0; i < n; ++i) {
      if (alive[i] && cmember[i] == group) members.insert(i);
    }
    while (!members.empty()) {
      // min (live degree, index)
      int best = -1;
      std::size_t best_deg = 0;
      for (int v : members) {
        std::size_t deg = 0;
        for (int nb : adj[v]) {
          if (alive[nb]) ++deg;
        }
        if (best < 0 || deg < best_deg) {
          best = v;
          best_deg = deg;
        }
      }
      // clique-connect the live neighborhood of `best`
      std::vector<int> nbrs;
      for (int nb : adj[best]) {
        if (alive[nb]) nbrs.push_back(nb);
      }
      for (std::size_t a = 0; a < nbrs.size(); ++a) {
        adj[nbrs[a]].erase(best);
        for (std::size_t b = a + 1; b < nbrs.size(); ++b) {
          adj[nbrs[a]].insert(nbrs[b]);
          adj[nbrs[b]].insert(nbrs[a]);
        }
      }
      alive[best] = 0;
      members.erase(best);
      perm[pos++] = best;
    }
  }
  return pos == n ? 0 : 1;
}

}  // extern "C"
