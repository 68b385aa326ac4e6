// rattle_native: C++ host runtime for rattle-tpu.
//
// The TPU does the heavy DP (similarity scoring, POA wavefronts); this module
// provides the native host side that Python/NumPy is too slow for at scale:
//
//   * k-mer sketch table construction (sorted hash/pos tables + packed 6-mer
//     bitvectors), mirroring rattle_tpu/ops/sketch.py exactly
//   * POA graph maintenance (alignment threading, group-aware topological
//     ranking, MSA emission), mirroring rattle_tpu/ops/poa.py exactly —
//     including a full CPU fallback aligner for capacity-overflow packs
//
// Exposed as a plain C ABI consumed via ctypes (rattle_tpu/native.py).
// Semantics are defined by the Python spec and locked by tests that compare
// both implementations on random inputs.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <vector>

namespace {

constexpr int kBvKmer = 6;
constexpr int kBvSize = 4 << (2 * (kBvKmer - 1));  // 4096
constexpr int kBvWords = kBvSize / 32;
constexpr int32_t kNeg = -(1 << 30);

inline uint8_t base_code(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'T': case 'U': return 2;
    case 'G': return 3;
    default: return 0;
  }
}

// ---------------------------------------------------------------------------
// sketch tables (ops/sketch.py parity)
// ---------------------------------------------------------------------------

struct SketchOut {
  uint32_t* hbp;      // [n, kmax]
  uint32_t* hs;       // [n, kmax]
  int32_t* ps;        // [n, kmax]
  uint32_t* rev_hs;   // [n, kmax] or null
  int32_t* rev_ps;    // [n, kmax] or null
  uint32_t* bvp;      // [n, 128]
  uint32_t* rev_bvp;  // [n, 128] or null
  int32_t* bvc;       // [n]
};

void sketch_one(const char* seq, int64_t len, int k, int64_t kmax,
                uint32_t* hbp, uint32_t* hs, int32_t* ps, uint32_t* bvp) {
  const int64_t nk = len - k;
  // rolling hashes for all positions; table covers [0, len-k) (kmer.cpp:9)
  uint32_t h = 0;
  const uint32_t mask = (k >= 16) ? 0xFFFFFFFFu : ((1u << (2 * k)) - 1);
  for (int64_t i = 0; i < len; ++i) {
    h = ((h << 2) | base_code(seq[i])) & mask;
    if (i >= k - 1 && i - k + 1 < nk) hbp[i - k + 1] = h;
  }
  for (int64_t i = nk; i < kmax; ++i) hbp[i] = 0xFFFFFFFFu;

  std::vector<int32_t> order(nk);
  for (int64_t i = 0; i < nk; ++i) order[i] = int32_t(i);
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return hbp[a] < hbp[b];
  });
  for (int64_t i = 0; i < nk; ++i) {
    hs[i] = hbp[order[i]];
    ps[i] = order[i];
  }
  for (int64_t i = nk; i < kmax; ++i) { hs[i] = 0xFFFFFFFFu; ps[i] = 0; }

  // 6-mer presence bitvector over [0, len-6)
  uint32_t bh = 0;
  const uint32_t bmask = (1u << (2 * kBvKmer)) - 1;
  std::memset(bvp, 0, kBvWords * sizeof(uint32_t));
  for (int64_t i = 0; i < len; ++i) {
    bh = ((bh << 2) | base_code(seq[i])) & bmask;
    const int64_t pos = i - kBvKmer + 1;
    if (pos >= 0 && pos < len - kBvKmer) bvp[bh >> 5] |= 1u << (bh & 31);
  }
}

}  // namespace

extern "C" {

// seqs: concatenated bytes; offsets [n+1]; fills caller-allocated arrays.
void rn_build_sketch(const char* seqs, const int64_t* offsets, int64_t n,
                     int k, int both_strands, int64_t kmax, uint32_t* hbp,
                     uint32_t* hs, int32_t* ps, uint32_t* rev_hs,
                     int32_t* rev_ps, uint32_t* bvp, uint32_t* rev_bvp,
                     int32_t* bvc) {
  std::string rc;
  for (int64_t i = 0; i < n; ++i) {
    const char* s = seqs + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    sketch_one(s, len, k, kmax, hbp + i * kmax, hs + i * kmax, ps + i * kmax,
               bvp + i * kBvWords);
    if (both_strands) {
      rc.resize(len);
      for (int64_t j = 0; j < len; ++j) {
        char c = s[len - 1 - j];
        rc[j] = c == 'A' ? 'T' : c == 'C' ? 'G' : c == 'T' ? 'A'
              : c == 'G' ? 'C' : c == 'U' ? 'A' : 'N';
      }
      std::vector<uint32_t> tmp_hbp(kmax);
      sketch_one(rc.data(), len, k, kmax, tmp_hbp.data(), rev_hs + i * kmax,
                 rev_ps + i * kmax, rev_bvp + i * kBvWords);
    }
    int32_t c = 0;
    for (int w = 0; w < kBvWords; ++w) c += __builtin_popcount(bvp[i * kBvWords + w]);
    bvc[i] = c;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// POA graph (ops/poa.py parity)
// ---------------------------------------------------------------------------

namespace {

// experiment knobs for spoa-semantics reconstruction (read once / process).
// Defaults are the containment-sweep winners (docs/CONSENSUS.md): DFS topo
// order, F-before-E traceback, first-maximum cell.  Override with
// RATTLE_POA_TOPO=kahn, RATTLE_POA_MAX=last, RATTLE_POA_TB=EF.
// 0 = dfs (spoa-flavoured re-rank), 1 = kahn, 2 = incr (insertion-maintained
// order, matching the single-dispatch TPU pack engine; ops/poa.py).
static int poa_topo_mode() {
  static const int v = [] {
    const char* e = getenv("RATTLE_POA_TOPO");
    if (e && std::string(e) == "kahn") return 1;
    if (e && std::string(e) == "dfs") return 0;
    if (e && std::string(e) == "incr") return 2;
    return 2;
  }();
  return v;
}
static bool poa_topo_dfs() { return poa_topo_mode() == 0; }
static bool poa_max_last() {
  static const bool v = [] {
    const char* e = getenv("RATTLE_POA_MAX");
    return e && std::string(e) == "last";
  }();
  return v;
}
static bool poa_tb_ef() {
  static const bool v = [] {
    const char* e = getenv("RATTLE_POA_TB");
    return e && std::string(e) == "EF";
  }();
  return v;
}
static bool poa_egap_ext() {  // E-state: prefer gap-extend over gap-open
  static const bool v = [] {
    const char* e = getenv("RATTLE_POA_EGAP");
    return !(e && std::string(e) == "open");
  }();
  return v;
}
static bool poa_fgap_ext() {  // F-state: prefer gap-extend over gap-open
  static const bool v = [] {
    const char* e = getenv("RATTLE_POA_FGAP");
    return !(e && std::string(e) == "open");
  }();
  return v;
}

struct PoaGraph {
  std::vector<char> letters;
  std::vector<std::vector<int32_t>> in_edges;   // insertion order
  std::vector<std::vector<int32_t>> out_edges;
  std::vector<std::vector<int32_t>> aligned;
  std::vector<std::vector<int32_t>> paths;
  // incremental group order (ops/poa.py add_alignment): leaders in column
  // order + per-node leader + leader -> position (-1 while unplaced)
  std::vector<int32_t> grp_order;
  std::vector<int32_t> grp_leader;
  std::vector<int32_t> grp_pos;

  int32_t add_node(char ch) {
    letters.push_back(ch);
    in_edges.emplace_back();
    out_edges.emplace_back();
    aligned.emplace_back();
    grp_leader.push_back(int32_t(letters.size()) - 1);
    grp_pos.push_back(-1);
    return int32_t(letters.size()) - 1;
  }

  void renumber_from(size_t from) {
    for (size_t i = from; i < grp_order.size(); ++i)
      grp_pos[grp_order[i]] = int32_t(i);
  }

  // incremental order (validity argument in ops/poa.py add_alignment)
  void topo_incr(std::vector<int32_t>* rank_nodes,
                 std::vector<int32_t>* group_of_node,
                 std::vector<int32_t>* col_of_node) const {
    const int32_t n = int32_t(letters.size());
    rank_nodes->clear();
    if (group_of_node) group_of_node->assign(n, -1);
    if (col_of_node) col_of_node->assign(n, -1);
    int32_t col = 0;
    for (int32_t leader : grp_order) {
      rank_nodes->push_back(leader);
      if (group_of_node) (*group_of_node)[leader] = col;
      if (col_of_node) (*col_of_node)[leader] = col;
      for (int32_t al : aligned[leader]) {
        rank_nodes->push_back(al);
        if (group_of_node) (*group_of_node)[al] = col;
        if (col_of_node) (*col_of_node)[al] = col;
      }
      ++col;
    }
  }

  void add_edge(int32_t a, int32_t b) {
    auto& out = out_edges[a];
    if (std::find(out.begin(), out.end(), b) == out.end()) {
      out.push_back(b);
      in_edges[b].push_back(a);
    }
  }

  // spoa-flavoured iterative DFS topological sort: iterate roots in id
  // order, push unvisited predecessors (then unvisited aligned members)
  // onto the stack, emit a group's members together when its leader (the
  // first member reached) becomes valid.  Gated behind RATTLE_POA_TOPO=dfs
  // for empirical tie-break comparison against the Kahn order below.
  void topo_dfs(std::vector<int32_t>* rank_nodes,
                std::vector<int32_t>* group_of_node,
                std::vector<int32_t>* col_of_node) const {
    const int32_t n = int32_t(letters.size());
    std::vector<uint8_t> marks(n, 0);
    std::vector<uint8_t> lead(n, 1);
    std::vector<int32_t> stack;
    rank_nodes->clear();
    std::vector<int32_t> group_of(n, -1);
    if (col_of_node) col_of_node->assign(n, -1);
    int32_t col = 0;
    for (int32_t i = 0; i < n; ++i) {
      if (marks[i] != 0) continue;
      stack.push_back(i);
      while (!stack.empty()) {
        const int32_t u = stack.back();
        if (marks[u] == 2) { stack.pop_back(); continue; }
        bool valid = true;
        for (int32_t a : in_edges[u])
          if (marks[a] != 2) { stack.push_back(a); valid = false; }
        if (lead[u]) {
          for (int32_t al : aligned[u])
            if (marks[al] != 2) {
              stack.push_back(al);
              lead[al] = 0;
              valid = false;
            }
        }
        marks[u] = 1;
        if (valid) {
          marks[u] = 2;
          if (lead[u]) {
            rank_nodes->push_back(u);
            group_of[u] = col;
            if (col_of_node) (*col_of_node)[u] = col;
            for (int32_t al : aligned[u]) {
              rank_nodes->push_back(al);
              group_of[al] = col;
              if (col_of_node) (*col_of_node)[al] = col;
            }
            ++col;
          }
          stack.pop_back();
        }
      }
    }
    if (group_of_node) *group_of_node = std::move(group_of);
  }

  // group-aware Kahn topological sort with min-id priority
  // (ops/poa.py topo_groups)
  void topo(std::vector<int32_t>* rank_nodes,
            std::vector<int32_t>* group_of_node,
            std::vector<int32_t>* col_of_node) const {
    if (poa_topo_mode() == 2)
      return topo_incr(rank_nodes, group_of_node, col_of_node);
    if (poa_topo_dfs()) return topo_dfs(rank_nodes, group_of_node, col_of_node);
    const int32_t n = int32_t(letters.size());
    std::vector<int32_t> group_of(n, -1);
    std::vector<std::vector<int32_t>> groups;
    for (int32_t i = 0; i < n; ++i) {
      if (group_of[i] != -1) continue;
      std::vector<int32_t> members(aligned[i]);
      members.push_back(i);
      std::sort(members.begin(), members.end());
      const int32_t gid = int32_t(groups.size());
      for (int32_t m : members) group_of[m] = gid;
      groups.push_back(std::move(members));
    }
    const int32_t ng = int32_t(groups.size());
    std::vector<std::vector<int32_t>> succs(ng);
    std::vector<int32_t> indeg(ng, 0);
    for (int32_t b = 0; b < n; ++b) {
      const int32_t gb = group_of[b];
      for (int32_t a : in_edges[b]) {
        const int32_t ga = group_of[a];
        if (ga != gb &&
            std::find(succs[ga].begin(), succs[ga].end(), gb) == succs[ga].end())
          succs[ga].push_back(gb);
      }
    }
    for (int32_t g = 0; g < ng; ++g)
      for (int32_t s : succs[g]) indeg[s]++;

    std::priority_queue<int32_t, std::vector<int32_t>, std::greater<int32_t>> heap;
    std::vector<int32_t> group_by_minid(n, -1);
    for (int32_t g = 0; g < ng; ++g) {
      group_by_minid[groups[g][0]] = g;
      if (indeg[g] == 0) heap.push(groups[g][0]);
    }
    rank_nodes->clear();
    if (col_of_node) col_of_node->assign(n, -1);
    int32_t col = 0;
    while (!heap.empty()) {
      const int32_t g = group_by_minid[heap.top()];
      heap.pop();
      for (int32_t m : groups[g]) {
        rank_nodes->push_back(m);
        if (col_of_node) (*col_of_node)[m] = col;
      }
      ++col;
      for (int32_t s : succs[g]) {
        if (--indeg[s] == 0) heap.push(groups[s][0]);
      }
    }
    if (group_of_node) *group_of_node = std::move(group_of);
  }

  // thread a sequence along an alignment (ops/poa.py add_alignment)
  void add_alignment(const int32_t* aln_nodes, const int32_t* aln_pos,
                     int64_t aln_len, const char* seq, int64_t seq_len) {
    std::vector<int32_t> path;
    path.reserve(seq_len);
    int32_t prev = -1;
    std::vector<std::pair<int32_t, int32_t>> fallback;
    if (aln_len == 0) {
      fallback.reserve(seq_len);
      for (int64_t j = 0; j < seq_len; ++j)
        fallback.emplace_back(-1, int32_t(j));
      aln_nodes = nullptr;
    }
    const int64_t total = aln_len == 0 ? seq_len : aln_len;
    std::vector<int32_t> pending;  // new leaders awaiting placement
    for (int64_t t = 0; t < total; ++t) {
      const int32_t nid = aln_nodes ? aln_nodes[t] : fallback[t].first;
      const int32_t spos = aln_nodes ? aln_pos[t] : fallback[t].second;
      if (spos == -1) continue;
      const char ch = seq[spos];
      int32_t target;
      bool new_group = false;
      if (nid == -1) {
        target = add_node(ch);
        new_group = true;
      } else if (letters[nid] == ch) {
        target = nid;
      } else {
        target = -1;
        for (int32_t other : aligned[nid])
          if (letters[other] == ch) { target = other; break; }
        if (target == -1) {
          target = add_node(ch);
          std::vector<int32_t> group(aligned[nid]);
          group.insert(group.begin(), nid);
          aligned[target] = group;
          grp_leader[target] = grp_leader[nid];
          for (int32_t m : group) aligned[m].push_back(target);
        }
      }
      if (new_group) {
        pending.push_back(target);
      } else if (!pending.empty()) {
        const int32_t at = grp_pos[grp_leader[target]];
        grp_order.insert(grp_order.begin() + at, pending.begin(),
                         pending.end());
        renumber_from(size_t(at));
        pending.clear();
      }
      if (prev != -1 && prev != target) add_edge(prev, target);
      prev = target;
      path.push_back(target);
    }
    if (!pending.empty()) {
      const size_t at = grp_order.size();
      grp_order.insert(grp_order.end(), pending.begin(), pending.end());
      renumber_from(at);
    }
    paths.push_back(std::move(path));
  }
};

// CPU fallback aligner (ops/poa.py align_local parity)
void align_local_cpu(const PoaGraph& g, const char* seq, int64_t L, int match,
                     int mismatch, int go, int ge,
                     std::vector<std::pair<int32_t, int32_t>>* out) {
  out->clear();
  const int32_t n = int32_t(g.letters.size());
  if (n == 0) return;
  std::vector<int32_t> rank_nodes;
  g.topo(&rank_nodes, nullptr, nullptr);
  std::vector<int32_t> rank_of(n);
  for (int32_t r = 0; r < n; ++r) rank_of[rank_nodes[r]] = r;

  const int64_t W = L + 1;
  // thread-local reusable DP buffers: repeated multi-GB vector churn on big
  // packs fragments glibc arenas badly enough to look like a leak
  static thread_local std::vector<int32_t> H, E, F;
  H.assign((n + 1) * W, 0);
  E.assign((n + 1) * W, kNeg);
  F.assign((n + 1) * W, kNeg);
  std::vector<std::vector<int32_t>> pred_rows(n);
  for (int32_t r = 0; r < n; ++r) {
    const auto& ins = g.in_edges[rank_nodes[r]];
    if (ins.empty()) pred_rows[r].push_back(0);
    else for (int32_t a : ins) pred_rows[r].push_back(rank_of[a] + 1);
  }

  for (int32_t r = 0; r < n; ++r) {
    const int64_t row = int64_t(r + 1) * W;
    const char letter = g.letters[rank_nodes[r]];
    int32_t* Hr = H.data() + row;
    int32_t* Er = E.data() + row;
    int32_t* Fr = F.data() + row;
    for (int64_t j = 0; j <= L; ++j) {
      int32_t diag = kNeg, f = kNeg;
      for (int32_t pr : pred_rows[r]) {
        const int32_t* Hp = H.data() + int64_t(pr) * W;
        const int32_t* Fp = F.data() + int64_t(pr) * W;
        if (j > 0) {
          const int32_t sub = (seq[j - 1] == letter) ? match : mismatch;
          diag = std::max(diag, Hp[j - 1] + sub);
        }
        f = std::max(f, std::max(Hp[j] + go, Fp[j] + ge));
      }
      if (j == 0) f = kNeg;
      int32_t a = std::max(0, std::max(diag, f));
      int32_t e = (j == 0) ? kNeg : std::max(Hr[j - 1] + go, Er[j - 1] + ge);
      Fr[j] = f;
      Er[j] = e;
      Hr[j] = std::max(a, e);
    }
  }

  // first maximum in (rank, j) row-major order (last with RATTLE_POA_MAX)
  int64_t best = 0;
  if (poa_max_last()) {
    for (int64_t i = 1; i < int64_t(n + 1) * W; ++i)
      if (H[i] >= H[best]) best = i;
  } else {
    for (int64_t i = 1; i < int64_t(n + 1) * W; ++i)
      if (H[i] > H[best]) best = i;
  }
  if (H[best] <= 0) {
    for (int64_t j = 0; j < L; ++j) out->emplace_back(-1, int32_t(j));
    return;
  }
  int64_t r = best / W, j = best % W;
  std::vector<std::pair<int32_t, int32_t>> rev;
  int state = 0;  // 0=H 1=E 2=F
  while (true) {
    if (state == 0) {
      if (r == 0 || H[r * W + j] == 0) break;
      const int32_t nid = rank_nodes[r - 1];
      const int32_t sub =
          (j > 0 && seq[j - 1] == g.letters[nid]) ? match : mismatch;
      bool moved = false;
      if (j > 0) {
        for (int32_t pr : pred_rows[r - 1]) {
          if (H[r * W + j] == H[int64_t(pr) * W + j - 1] + sub) {
            rev.emplace_back(nid, int32_t(j - 1));
            r = pr; --j; moved = true; break;
          }
        }
      }
      if (moved) continue;
      if (poa_tb_ef()) {
        if (H[r * W + j] == E[r * W + j]) { state = 1; continue; }
        if (H[r * W + j] == F[r * W + j]) { state = 2; continue; }
      } else {
        if (H[r * W + j] == F[r * W + j]) { state = 2; continue; }
        if (H[r * W + j] == E[r * W + j]) { state = 1; continue; }
      }
      break;  // should not happen
    } else if (state == 1) {
      rev.emplace_back(-1, int32_t(j - 1));
      if (poa_egap_ext()) {
        if (E[r * W + j] != E[r * W + j - 1] + ge &&
            E[r * W + j] == H[r * W + j - 1] + go) state = 0;
      } else if (E[r * W + j] == H[r * W + j - 1] + go) {
        state = 0;
      }
      --j;
    } else {
      const int32_t nid = rank_nodes[r - 1];
      rev.emplace_back(nid, -1);
      bool moved = false;
      if (poa_fgap_ext()) {
        for (int32_t pr : pred_rows[r - 1]) {
          if (F[r * W + j] == F[int64_t(pr) * W + j] + ge) {
            r = pr; moved = true; break;
          }
          if (F[r * W + j] == H[int64_t(pr) * W + j] + go) {
            r = pr; state = 0; moved = true; break;
          }
        }
      } else {
        for (int32_t pr : pred_rows[r - 1]) {
          if (F[r * W + j] == H[int64_t(pr) * W + j] + go) {
            r = pr; state = 0; moved = true; break;
          }
          if (F[r * W + j] == F[int64_t(pr) * W + j] + ge) {
            r = pr; moved = true; break;
          }
        }
      }
      if (!moved) break;
    }
  }
  out->assign(rev.rbegin(), rev.rend());
  int32_t first_j = 0, last_j = -1;
  for (const auto& p : *out) if (p.second != -1) { first_j = p.second; break; }
  for (auto it = out->rbegin(); it != out->rend(); ++it)
    if (it->second != -1) { last_j = it->second; break; }
  std::vector<std::pair<int32_t, int32_t>> full;
  for (int32_t x = 0; x < first_j; ++x) full.emplace_back(-1, x);
  full.insert(full.end(), out->begin(), out->end());
  for (int32_t x = last_j + 1; x < L; ++x) full.emplace_back(-1, x);
  *out = std::move(full);
}

}  // namespace

extern "C" {

void* rn_poa_new() { return new PoaGraph(); }
void rn_poa_free(void* h) { delete static_cast<PoaGraph*>(h); }
int64_t rn_poa_n_nodes(void* h) {
  return int64_t(static_cast<PoaGraph*>(h)->letters.size());
}

void rn_poa_add_alignment(void* h, const int32_t* aln_nodes,
                          const int32_t* aln_pos, int64_t aln_len,
                          const char* seq, int64_t seq_len) {
  static_cast<PoaGraph*>(h)->add_alignment(aln_nodes, aln_pos, aln_len, seq,
                                           seq_len);
}

// Fill rank arrays for the device kernel.  Returns n_nodes, or -1 if n_cap /
// pmax exceeded.  preds convention: rank+1, 0 = virtual start, -1 = pad.
int64_t rn_poa_rank_arrays(void* h, int64_t n_cap, int64_t pmax,
                           uint8_t* letters, int32_t* preds,
                           int32_t* rank_nodes_out) {
  PoaGraph* g = static_cast<PoaGraph*>(h);
  const int64_t n = int64_t(g->letters.size());
  if (n > n_cap) return -1;
  std::vector<int32_t> rank_nodes;
  g->topo(&rank_nodes, nullptr, nullptr);
  std::vector<int32_t> rank_of(n);
  for (int64_t r = 0; r < n; ++r) rank_of[rank_nodes[r]] = int32_t(r);
  std::memset(letters, 0, n_cap);
  std::fill(preds, preds + n_cap * pmax, -1);
  for (int64_t r = 0; r < n; ++r) {
    const int32_t nid = rank_nodes[r];
    letters[r] = uint8_t(g->letters[nid]);
    rank_nodes_out[r] = nid;
    const auto& ins = g->in_edges[nid];
    if (ins.empty()) {
      preds[r * pmax] = 0;
    } else {
      if (int64_t(ins.size()) > pmax) return -1;
      for (size_t k = 0; k < ins.size(); ++k)
        preds[r * pmax + k] = rank_of[ins[k]] + 1;
    }
  }
  return n;
}

// MSA: two-call protocol.  First call with rows == nullptr returns
// n_rows * (n_cols + 1) buffer size; second call fills '-'-padded rows.
int64_t rn_poa_msa(void* h, char* rows, int64_t* shape_out) {
  PoaGraph* g = static_cast<PoaGraph*>(h);
  const int64_t n = int64_t(g->letters.size());
  std::vector<int32_t> rank_nodes, group_of, col_of;
  g->topo(&rank_nodes, &group_of, &col_of);
  int64_t ncols = 0;
  for (int32_t c : col_of) ncols = std::max<int64_t>(ncols, c + 1);
  const int64_t nrows = int64_t(g->paths.size());
  shape_out[0] = nrows;
  shape_out[1] = ncols;
  if (rows == nullptr) return nrows * ncols;
  std::memset(rows, '-', nrows * ncols);
  for (int64_t i = 0; i < nrows; ++i)
    for (int32_t nid : g->paths[i])
      rows[i * ncols + col_of[nid]] = g->letters[nid];
  return nrows * ncols;
}

// Full CPU alignment for fallback packs.  Returns entries written (pairs),
// or -1 if out_cap too small.  out arrays hold (node_id, seq_pos).
int64_t rn_poa_align(void* h, const char* seq, int64_t seq_len, int match,
                     int mismatch, int go, int ge, int32_t* out_nodes,
                     int32_t* out_pos, int64_t out_cap) {
  std::vector<std::pair<int32_t, int32_t>> aln;
  align_local_cpu(*static_cast<PoaGraph*>(h), seq, seq_len, match, mismatch,
                  go, ge, &aln);
  if (int64_t(aln.size()) > out_cap) return -1;
  for (size_t i = 0; i < aln.size(); ++i) {
    out_nodes[i] = aln[i].first;
    out_pos[i] = aln[i].second;
  }
  return int64_t(aln.size());
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Exact pair scorer (oracle parity: kmer.cpp:45-67 + similarity.cpp:4-97 +
// utils.cpp:26-55).  Host-side twin of the device join+LIS kernels, used for
// borderline/overflow rescoring and as a full CPU clustering fallback.
// ---------------------------------------------------------------------------

namespace {

struct PairScore {
  int64_t bases;
  int64_t hc_bases;
  double variance;  // NaN when one distance (reference 0/0 quirk)
  int64_t n_dist;
};

// inputs: read A's hashes in POSITION order (hbp_a, na), read B's hashes
// sorted ascending with co-sorted positions (hs_b/ps_b, nb)
PairScore score_pair_cpu(const uint32_t* hbp_a, int64_t na,
                         const uint32_t* hs_b, const int32_t* ps_b, int64_t nb,
                         int kmer_size, int hc_max_dist) {
  // emit matches in (pos1, pos2) order
  static thread_local std::vector<int32_t> m1, m2;
  m1.clear();
  m2.clear();
  for (int64_t t = 0; t < na; ++t) {
    const uint32_t h = hbp_a[t];
    const uint32_t* lo = std::lower_bound(hs_b, hs_b + nb, h);
    const uint32_t* hi = std::upper_bound(lo, hs_b + nb, h);
    for (const uint32_t* it = lo; it != hi; ++it) {
      m1.push_back(int32_t(t));
      m2.push_back(ps_b[it - hs_b]);
    }
  }
  const int64_t n = int64_t(m1.size());
  PairScore res{0, 0, 0.0, 0};
  if (n == 0) return res;

  // patience LIS, strictly increasing in m2 (similarity.cpp:10-31)
  static thread_local std::vector<int32_t> p, m, tails;
  p.assign(n, 0);
  m.assign(n + 1, 0);
  tails.assign(1, 0);  // tails[l] mirrors m2[m[l]]
  int64_t l = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t v = m2[i];
    int64_t lo = 1, hi = l + 1;  // first level in [1, l] with tails >= v
    while (lo < hi) {
      const int64_t mid = (lo + hi) >> 1;
      if (tails[mid] < v) lo = mid + 1; else hi = mid;
    }
    const int64_t new_l = lo;
    p[i] = m[new_l - 1];
    m[new_l] = int32_t(i);
    if (new_l > l) {
      l = new_l;
      tails.push_back(v);
    } else {
      tails[new_l] = v;
    }
  }

  static thread_local std::vector<int32_t> s;
  s.assign(l, 0);
  int32_t k = m[l];
  for (int64_t i = l - 1; i >= 0; --i) {
    s[i] = k;
    k = p[k];
  }

  // anchor filter (similarity.cpp:52-85); ex uses s[i-1], not the last kept
  int64_t bases = 0, hc = 0;
  int32_t lf = 0, ls = 0;
  static thread_local std::vector<int32_t> dists;
  dists.clear();
  bool first = true;
  for (int64_t i = 0; i < l; ++i) {
    const int32_t a1 = m1[s[i]];
    const int32_t a2 = m2[s[i]];
    if (first) {
      bases += kmer_size;
      hc += kmer_size;
      lf = a1;
      ls = a2;
      first = false;
      continue;
    }
    const int32_t d1 = a1 - lf;
    const int32_t d2 = a2 - ls;
    if ((d1 < kmer_size && d2 < kmer_size) ||
        (d1 >= kmer_size && d2 >= kmer_size)) {
      bases += kmer_size;
      const int32_t ex = kmer_size - (a2 - m2[s[i - 1]]);
      if (ex > 0) bases -= ex;
      const int32_t dist = (a2 - ls) - (a1 - lf);
      dists.push_back(dist);
      if (dist < hc_max_dist) {
        hc += kmer_size;
        if (ex > 0) hc -= ex;
      }
      lf = a1;
      ls = a2;
    }
  }

  res.bases = bases;
  res.hc_bases = hc;
  res.n_dist = int64_t(dists.size());
  // compensated two-pass variance (utils.cpp:36-55), sequential double math
  if (dists.empty()) {
    res.variance = 0.0;
  } else {
    double mean = 0.0;
    for (int32_t d : dists) mean += double(d);
    mean /= double(dists.size());
    double ss = 0.0, comp = 0.0;
    for (int32_t d : dists) {
      const double dd = double(d) - mean;
      ss += dd * dd;
      comp += dd;
    }
    res.variance = (ss - comp * comp / double(dists.size())) /
                   double(int64_t(dists.size()) - 1);
  }
  return res;
}

}  // namespace

extern "C" {

// Scores many pairs; all table pointers address [n_reads, kmax]-shaped
// row-major arrays.  b_rev selects the rev tables per pair.  Outputs per
// pair: bases, hc_bases, variance, n_dist.
void rn_score_pairs(const uint32_t* hbp, const uint32_t* hs,
                    const int32_t* ps, const uint32_t* rev_hs,
                    const int32_t* rev_ps, const int32_t* nk, int64_t kmax,
                    const int32_t* a_ids, const int32_t* b_ids,
                    const uint8_t* b_rev, int64_t n_pairs, int kmer_size,
                    int hc_max_dist, int64_t* bases_out, int64_t* hc_out,
                    double* var_out, int64_t* ndist_out) {
  for (int64_t i = 0; i < n_pairs; ++i) {
    const int64_t a = a_ids[i];
    const int64_t b = b_ids[i];
    const uint32_t* hsb = (b_rev && b_rev[i]) ? rev_hs : hs;
    const int32_t* psb = (b_rev && b_rev[i]) ? rev_ps : ps;
    PairScore r = score_pair_cpu(hbp + a * kmax, nk[a], hsb + b * kmax,
                                 psb + b * kmax, nk[b], kmer_size, hc_max_dist);
    bases_out[i] = r.bases;
    hc_out[i] = r.hc_bases;
    var_out[i] = r.variance;
    ndist_out[i] = r.n_dist;
  }
}

}  // extern "C"
