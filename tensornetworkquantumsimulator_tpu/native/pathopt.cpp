// Optimal contraction-order search: exact dynamic programming over subsets.
//
// Native counterpart of the reference's TensorOperations.optimaltree
// (`contraction_sequences.jl:15-26`).  The generic engine calls this for
// every BP message/vertex contraction; results are memoised Python-side,
// but cold-cache workloads (new circuits, new graphs) hit the search often
// enough that the Python DP in opt_einsum shows up in profiles.
//
// Algorithm: Held-Karp-style DP over connected subsets of tensors,
// minimizing total scalar multiplication cost; standard for n <= ~20.
// Index metadata comes in flattened arrays via the C ABI (ctypes).
//
// Build: g++ -O2 -shared -fPIC -o libpathopt.so pathopt.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {
  double cost;
  uint64_t left;   // subset bitmask of the left operand (0 = leaf)
  uint64_t right;  // subset bitmask of the right operand
  std::vector<int> dims_per_index;  // unused; kept for clarity
};

// free (output) index mask of a subset: indices appearing in the subset and
// also outside it (or in the final output)
static uint64_t subset_inds(const std::vector<uint64_t>& tensor_inds,
                            uint64_t subset) {
  uint64_t out = 0;
  for (size_t i = 0; i < tensor_inds.size(); ++i)
    if (subset >> i & 1) out |= tensor_inds[i];
  return out;
}

}  // namespace

extern "C" {

// inputs:
//   n            — number of tensors (n <= 24)
//   num_inds     — number of distinct indices (<= 64)
//   ind_dims     — dims of each index [num_inds]
//   tensor_inds  — bitmask of indices per tensor [n]
// output:
//   path_out     — 2*(n-1) ints: pairs (i, j) in SSA numbering
//                  (operands 0..n-1, results n, n+1, ...)
// returns 0 on success, nonzero on failure (caller falls back).
int optimal_path(int n, int num_inds, const double* ind_dims,
                 const uint64_t* tensor_inds, int* path_out) {
  if (n < 2 || n > 24 || num_inds > 64) return 1;
  std::vector<uint64_t> tinds(tensor_inds, tensor_inds + n);

  // which indices survive to the final output: appear in exactly one tensor
  std::vector<int> count(num_inds, 0);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < num_inds; ++k)
      if (tinds[i] >> k & 1) count[k]++;
  uint64_t output_mask = 0;
  for (int k = 0; k < num_inds; ++k)
    if (count[k] == 1) output_mask |= 1ull << k;

  const uint64_t full = (n == 64) ? ~0ull : ((1ull << n) - 1);

  auto inds_of = [&](uint64_t s) { return subset_inds(tinds, s); };
  auto size_of = [&](uint64_t ind_mask) {
    double sz = 1.0;
    for (int k = 0; k < num_inds; ++k)
      if (ind_mask >> k & 1) sz *= ind_dims[k];
    return sz;
  };

  // external indices of a subset: those shared with the complement or output
  auto external_of = [&](uint64_t s) {
    uint64_t inside = inds_of(s);
    uint64_t outside = inds_of(full & ~s) | output_mask;
    return inside & outside;
  };

  std::unordered_map<uint64_t, Entry> best;
  for (int i = 0; i < n; ++i) best[1ull << i] = {0.0, 0, 0, {}};

  // enumerate subsets by popcount
  std::vector<std::vector<uint64_t>> by_size(n + 1);
  for (uint64_t s = 1; s <= full; ++s)
    by_size[__builtin_popcountll(s)].push_back(s);

  for (int sz = 2; sz <= n; ++sz) {
    for (uint64_t s : by_size[sz]) {
      double best_cost = -1.0;
      uint64_t best_l = 0, best_r = 0;
      // iterate proper sub-subsets; canonicalize l < r
      for (uint64_t l = (s - 1) & s; l; l = (l - 1) & s) {
        uint64_t r = s & ~l;
        if (l > r) continue;
        auto it_l = best.find(l), it_r = best.find(r);
        if (it_l == best.end() || it_r == best.end()) continue;
        uint64_t el = external_of(l), er = external_of(r);
        // contraction cost: product over union of external index sets
        double cost = size_of(el | er) + it_l->second.cost + it_r->second.cost;
        if (best_cost < 0 || cost < best_cost) {
          best_cost = cost;
          best_l = l;
          best_r = r;
        }
      }
      if (best_cost >= 0) best[s] = {best_cost, best_l, best_r, {}};
    }
  }

  if (best.find(full) == best.end()) return 2;

  // emit SSA pairs by post-order traversal
  std::unordered_map<uint64_t, int> ssa;
  for (int i = 0; i < n; ++i) ssa[1ull << i] = i;
  int next_id = n;
  int pos = 0;
  // iterative post-order
  std::vector<uint64_t> stack = {full};
  std::vector<uint64_t> order;
  while (!stack.empty()) {
    uint64_t s = stack.back();
    stack.pop_back();
    if (__builtin_popcountll(s) < 2) continue;
    order.push_back(s);
    stack.push_back(best[s].left);
    stack.push_back(best[s].right);
  }
  for (auto it = order.rbegin(); it != order.rend(); ++it) {
    uint64_t s = *it;
    int a = ssa[best[s].left];
    int b = ssa[best[s].right];
    path_out[2 * pos] = a;
    path_out[2 * pos + 1] = b;
    ssa[s] = next_id++;
    ++pos;
  }
  return pos == n - 1 ? 0 : 3;
}
}
