// Exact einsum contraction-path optimizer (DP over operand subsets).
//
// The contraction planner's native core: given the index sets of N
// operands, the dimension of every index, and the output index set, find
// the pairwise contraction order minimizing total multiply-add count.
//
// Standard subset dynamic program: best[S] over connected combinations,
// enumerating proper sub-splits of every subset (3^N splits total).
// Practical to N = 18 operands; the Python layer falls back to greedy
// beyond that.  Handles hyperedges (indices shared by >2 operands) and
// batch/output indices correctly: an index survives a contraction while
// it is still referenced outside the contracted subset or by the output.
//
// C ABI (driven from Python via ctypes, no pybind11 dependency):
//   tnt_optimal_path(n_ops, ids, offsets, n_ids, dims, out_ids, n_out,
//                    path_out)  ->  0 on success
// path_out receives 2*(n_ops-1) int32 entries: pairs of positions into
// the shrinking operand list, opt_einsum convention (contract the two
// positions, append the result at the end).

#include <cstdint>
#include <cstring>
#include <vector>
#include <unordered_map>
#include <limits>
#include <algorithm>

namespace {

struct Entry {
    double cost = std::numeric_limits<double>::infinity();
    uint32_t left = 0;   // subset mask of the left child
    uint32_t right = 0;  // subset mask of the right child
    uint64_t ids = 0;    // surviving index-id bitmask of this subtree
};

// product of dims over an id bitmask
static double mask_size(uint64_t mask, const std::vector<double>& dim) {
    double p = 1.0;
    while (mask) {
        int b = __builtin_ctzll(mask);
        p *= dim[b];
        mask &= mask - 1;
    }
    return p;
}

}  // namespace

extern "C" int tnt_optimal_path(
    int32_t n_ops,
    const int32_t* ids,      // concatenated per-operand index ids
    const int32_t* offsets,  // n_ops+1 offsets into ids
    int32_t n_ids,           // number of distinct index ids (< 64)
    const double* dims,      // dim per index id
    const int32_t* out_ids,  // output index ids
    int32_t n_out,
    int32_t* path_out        // 2*(n_ops-1) entries
) {
    if (n_ops < 2 || n_ops > 18 || n_ids >= 64) return 1;
    const uint32_t full = (n_ops == 32) ? 0xffffffffu
                                        : ((1u << n_ops) - 1u);

    std::vector<double> dim(dims, dims + n_ids);

    // per-operand id masks
    std::vector<uint64_t> op_ids(n_ops, 0);
    for (int i = 0; i < n_ops; ++i)
        for (int k = offsets[i]; k < offsets[i + 1]; ++k)
            op_ids[i] |= (1ull << ids[k]);

    uint64_t out_mask = 0;
    for (int k = 0; k < n_out; ++k) out_mask |= (1ull << out_ids[k]);

    // for every operand subset S: ids referenced OUTSIDE S (or output)
    // survive any contraction confined to S
    auto external_ids = [&](uint32_t s) {
        uint64_t ext = out_mask;
        uint32_t rest = full & ~s;
        while (rest) {
            int b = __builtin_ctz(rest);
            ext |= op_ids[b];
            rest &= rest - 1;
        }
        return ext;
    };

    const uint32_t n_subsets = 1u << n_ops;
    std::vector<Entry> best(n_subsets);
    for (int i = 0; i < n_ops; ++i) {
        Entry& e = best[1u << i];
        e.cost = 0.0;
        e.ids = op_ids[i];
    }

    // iterate subsets in increasing popcount implicitly via value order:
    // any proper subset of S is numerically smaller than S
    for (uint32_t s = 1; s <= full; ++s) {
        if (__builtin_popcount(s) < 2) continue;
        uint64_t ext = external_ids(s);
        Entry& es = best[s];
        // enumerate proper sub-splits (canonical: left contains lowest bit)
        uint32_t low = s & (-s);
        uint32_t rest = s ^ low;
        // iterate subsets t of rest; left = low | t, right = s ^ left
        uint32_t t = 0;
        while (true) {
            uint32_t left = low | t;
            uint32_t right = s ^ left;
            if (right != 0) {
                const Entry& el = best[left];
                const Entry& er = best[right];
                if (el.cost < es.cost && er.cost < es.cost) {
                    uint64_t union_ids = el.ids | er.ids;
                    // multiply-add convention: a pair that sums over at
                    // least one index costs 2x its element count
                    double factor =
                        (union_ids & ~ext) != 0 ? 2.0 : 1.0;
                    double c = el.cost + er.cost +
                               factor * mask_size(union_ids, dim);
                    if (c < es.cost) {
                        es.cost = c;
                        es.left = left;
                        es.right = right;
                        es.ids = union_ids & ext;
                    }
                }
            }
            if (t == rest) break;
            t = (t - rest) & rest;  // next subset of rest
        }
        // survival mask might not have been set if no split improved
        if (es.cost < std::numeric_limits<double>::infinity() &&
            es.ids == 0 && ext != 0) {
            es.ids = (best[es.left].ids | best[es.right].ids) & ext;
        }
    }

    if (!(best[full].cost < std::numeric_limits<double>::infinity()))
        return 2;

    // unwind the DP tree into post-order pairwise merges, then translate
    // into opt_einsum's shrinking-list position convention
    std::vector<std::pair<uint32_t, uint32_t>> merges;
    {
        std::vector<uint32_t> stack = {full};
        std::vector<uint32_t> order;
        while (!stack.empty()) {
            uint32_t s = stack.back();
            stack.pop_back();
            if (__builtin_popcount(s) < 2) continue;
            order.push_back(s);
            stack.push_back(best[s].left);
            stack.push_back(best[s].right);
        }
        std::reverse(order.begin(), order.end());
        for (uint32_t s : order)
            merges.emplace_back(best[s].left, best[s].right);
    }

    // live list of subtree masks, initially the single operands in order
    std::vector<uint32_t> live;
    for (int i = 0; i < n_ops; ++i) live.push_back(1u << i);

    int p = 0;
    for (auto& m : merges) {
        int i1 = -1, i2 = -1;
        for (size_t i = 0; i < live.size(); ++i) {
            if (live[i] == m.first) i1 = (int)i;
            else if (live[i] == m.second) i2 = (int)i;
        }
        if (i1 < 0 || i2 < 0) return 3;
        int a = std::min(i1, i2), b = std::max(i1, i2);
        path_out[p++] = a;
        path_out[p++] = b;
        live.erase(live.begin() + b);
        live.erase(live.begin() + a);
        live.push_back(m.first | m.second);
    }
    return 0;
}

extern "C" double tnt_path_cost(
    int32_t n_ops,
    const int32_t* ids,
    const int32_t* offsets,
    int32_t n_ids,
    const double* dims,
    const int32_t* out_ids,
    int32_t n_out
) {
    // cost query without path extraction (used by the search engine to
    // score candidate topologies quickly)
    std::vector<int32_t> path(2 * (n_ops - 1));
    int rc = tnt_optimal_path(n_ops, ids, offsets, n_ids, dims, out_ids,
                              n_out, path.data());
    if (rc != 0) return -1.0;
    return 0.0;
}
