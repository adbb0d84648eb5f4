// scd_tpu native min-cost-flow solver.
//
// The reference delegates its size-constrained k-means E-step to OR-Tools'
// C++ SimpleMinCostFlow through a Cython shim (reference
// local_utils/k_means_constrained/mincostflow_vectorized_.pyx and
// sskm_constrained.py:331-356).  This is an independent implementation of
// the same problem class, written for this framework:
//
//  - cost-scaling push-relabel (Goldberg-Tarjan), the same algorithm family
//    OR-Tools uses, for large instances;
//  - successive-shortest-paths with Dijkstra potentials as a second,
//    simpler solver used to cross-validate on small instances.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image):
//
//   scd_mcf_solve(...)            -- generic MCF over an arc list
//   scd_constrained_assign(...)   -- builds the k-means size-constraint
//                                    graph internally and returns labels
//
// Graph for constrained assignment (same formulation as the reference,
// sskm_constrained.py:277-328): X-nodes supply 1 each; per cluster a dummy
// C' receives arcs from every X with the (rounded) distance cost; C' -> C
// with capacity size_max; C -> artificial sink with capacity n_X; C demands
// size_min, the artificial node absorbs the remainder.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

namespace {

using i64 = long long;

struct Graph {
  int n = 0;
  std::vector<int> first;      // per node: first arc index (-1 none)
  std::vector<int> next_arc;   // per arc: next arc of same tail
  std::vector<int> to;         // per arc: head node
  std::vector<i64> cap;        // per arc: residual capacity
  std::vector<i64> cost;       // per arc: cost (negated on reverse arc)

  explicit Graph(int n_nodes) : n(n_nodes), first(n_nodes, -1) {}

  void reserve(size_t m) {
    next_arc.reserve(2 * m);
    to.reserve(2 * m);
    cap.reserve(2 * m);
    cost.reserve(2 * m);
  }

  int add_edge(int u, int v, i64 c, i64 w) {
    int a = static_cast<int>(to.size());
    to.push_back(v); cap.push_back(c); cost.push_back(w);
    next_arc.push_back(first[u]); first[u] = a;
    to.push_back(u); cap.push_back(0); cost.push_back(-w);
    next_arc.push_back(first[v]); first[v] = a + 1;
    return a;
  }

  int tail_of(int a) const { return to[a ^ 1]; }
};

// ---------------------------------------------------------------- cost scaling

class CostScaling {
 public:
  CostScaling(Graph& g, std::vector<i64> supply)
      : g_(g), excess_(std::move(supply)), price_(g.n, 0), cur_(g.n, -1) {}

  // Returns true on success (all excesses settled at eps-optimality -> optimal
  // after the final eps < 1 round with integer costs).
  bool solve() {
    const i64 scale = static_cast<i64>(g_.n) + 1;
    i64 max_cost = 0;
    for (size_t a = 0; a < g_.cost.size(); a += 2) {
      g_.cost[a] *= scale;
      g_.cost[a + 1] *= scale;
      max_cost = std::max(max_cost, std::llabs(g_.cost[a]));
    }
    i64 eps = std::max<i64>(max_cost, 1);
    const i64 alpha = 16;
    while (true) {
      eps = std::max<i64>(1, eps / alpha);
      if (!refine(eps)) return false;
      if (eps == 1) break;
    }
    return true;
  }

 private:
  i64 reduced(int a, int u) const {
    return g_.cost[a] + price_[u] - price_[g_.to[a]];
  }

  bool refine(i64 eps) {
    // Saturate every negative-reduced-cost residual arc.
    for (int u = 0; u < g_.n; ++u) {
      for (int a = g_.first[u]; a != -1; a = g_.next_arc[a]) {
        if (g_.cap[a] > 0 && reduced(a, u) < 0) {
          i64 d = g_.cap[a];
          excess_[u] -= d;
          excess_[g_.to[a]] += d;
          g_.cap[a] -= d;
          g_.cap[a ^ 1] += d;
        }
      }
      cur_[u] = g_.first[u];
    }
    std::queue<int> active;
    std::vector<char> in_queue(g_.n, 0);
    for (int u = 0; u < g_.n; ++u) {
      if (excess_[u] > 0) { active.push(u); in_queue[u] = 1; }
    }
    // Discharge loop. The relabel count bound gives termination; we add a
    // generous safety counter so a logic bug cannot hang the host process.
    long long guard = 0;
    const long long guard_max =
        40LL * static_cast<long long>(g_.n) * static_cast<long long>(g_.n) +
        static_cast<long long>(g_.cost.size()) * 64LL;
    while (!active.empty()) {
      int u = active.front(); active.pop(); in_queue[u] = 0;
      while (excess_[u] > 0) {
        if (++guard > guard_max) return false;
        int a = cur_[u];
        if (a == -1) {  // relabel
          i64 best = std::numeric_limits<i64>::min();
          for (int b = g_.first[u]; b != -1; b = g_.next_arc[b]) {
            if (g_.cap[b] > 0) {
              best = std::max(best, price_[g_.to[b]] - g_.cost[b]);
            }
          }
          if (best == std::numeric_limits<i64>::min()) return false;  // stuck
          price_[u] = best - eps;
          cur_[u] = g_.first[u];
          continue;
        }
        if (g_.cap[a] > 0 && reduced(a, u) < 0) {  // push
          int v = g_.to[a];
          i64 d = std::min(excess_[u], g_.cap[a]);
          g_.cap[a] -= d;
          g_.cap[a ^ 1] += d;
          excess_[u] -= d;
          excess_[v] += d;
          if (excess_[v] > 0 && !in_queue[v]) { active.push(v); in_queue[v] = 1; }
        } else {
          cur_[u] = g_.next_arc[a];
        }
      }
    }
    for (int u = 0; u < g_.n; ++u) {
      if (excess_[u] != 0) return false;  // infeasible
    }
    return true;
  }

  Graph& g_;
  std::vector<i64> excess_;
  std::vector<i64> price_;
  std::vector<int> cur_;
};

// ------------------------------------------------- successive shortest paths

class SSP {
 public:
  SSP(Graph& g, std::vector<i64> supply)
      : g_(g), excess_(std::move(supply)), pot_(g.n, 0) {}

  bool solve() {
    std::vector<int> sources, sinks;
    for (int u = 0; u < g_.n; ++u) {
      if (excess_[u] > 0) sources.push_back(u);
    }
    for (int s : sources) {
      while (excess_[s] > 0) {
        if (!augment(s)) return false;
      }
    }
    return true;
  }

 private:
  bool augment(int s) {
    const i64 INF = std::numeric_limits<i64>::max();
    std::vector<i64> dist(g_.n, INF);
    std::vector<int> parent_arc(g_.n, -1);
    using QE = std::pair<i64, int>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    dist[s] = 0;
    pq.push({0, s});
    while (!pq.empty()) {
      auto [d, u] = pq.top(); pq.pop();
      if (d > dist[u]) continue;
      for (int a = g_.first[u]; a != -1; a = g_.next_arc[a]) {
        if (g_.cap[a] <= 0) continue;
        int v = g_.to[a];
        i64 nd = d + g_.cost[a] + pot_[u] - pot_[v];
        if (nd < dist[v]) {
          dist[v] = nd;
          parent_arc[v] = a;
          pq.push({nd, v});
        }
      }
    }
    // nearest reachable node with negative excess
    int t = -1;
    i64 best = INF;
    for (int u = 0; u < g_.n; ++u) {
      if (excess_[u] < 0 && dist[u] < best) { best = dist[u]; t = u; }
    }
    if (t == -1) return false;
    for (int u = 0; u < g_.n; ++u) {
      if (dist[u] < INF) pot_[u] += dist[u];
    }
    i64 push = std::min(excess_[s], -excess_[t]);
    for (int v = t; v != s;) {
      int a = parent_arc[v];
      push = std::min(push, g_.cap[a]);
      v = g_.tail_of(a);
    }
    for (int v = t; v != s;) {
      int a = parent_arc[v];
      g_.cap[a] -= push;
      g_.cap[a ^ 1] += push;
      v = g_.tail_of(a);
    }
    excess_[s] -= push;
    excess_[t] += push;
    return true;
  }

  Graph& g_;
  std::vector<i64> excess_;
  std::vector<i64> pot_;
};

}  // namespace

extern "C" {

// Generic MCF over an explicit arc list. out_flow receives per-arc flow.
// method: 0 = auto (cost-scaling), 1 = SSP, 2 = cost-scaling.
// Returns 0 on optimal, 1 on infeasible/failure.
int scd_mcf_solve(int32_t n_nodes, int64_t n_arcs, const int32_t* tail,
                  const int32_t* head, const int32_t* cap,
                  const int32_t* cost, const int32_t* supply,
                  int64_t* out_flow, int32_t method) {
  Graph g(n_nodes);
  g.reserve(static_cast<size_t>(n_arcs));
  std::vector<int> arc_ids(n_arcs);
  for (int64_t i = 0; i < n_arcs; ++i) {
    arc_ids[i] = g.add_edge(tail[i], head[i], cap[i], cost[i]);
  }
  std::vector<i64> sup(n_nodes);
  for (int i = 0; i < n_nodes; ++i) sup[i] = supply[i];

  bool ok;
  if (method == 1) {
    ok = SSP(g, std::move(sup)).solve();
  } else {
    ok = CostScaling(g, std::move(sup)).solve();
  }
  if (!ok) return 1;
  for (int64_t i = 0; i < n_arcs; ++i) {
    out_flow[i] = g.cap[arc_ids[i] ^ 1];  // reverse residual == flow
  }
  return 0;
}

// Size-constrained nearest-centroid assignment (the ConSSKM E-step).
// costs: row-major [n_x, n_c] int32 (pre-rounded, reference rounds
// 1000*sqrt(dist)); out_labels: [n_x] int32.
int scd_constrained_assign(int32_t n_x, int32_t n_c, const int32_t* costs,
                           int32_t size_min, int32_t size_max,
                           int32_t* out_labels, int32_t method) {
  if (static_cast<i64>(size_min) * n_c > n_x) return 2;       // infeasible
  if (static_cast<i64>(size_max) * n_c < n_x) return 2;       // infeasible
  const int x0 = 0;                 // X nodes: [0, n_x)
  const int cd0 = n_x;              // C' dummies: [n_x, n_x + n_c)
  const int c0 = n_x + n_c;         // C nodes
  const int art = n_x + 2 * n_c;    // artificial sink
  Graph g(art + 1);
  g.reserve(static_cast<size_t>(n_x) * n_c + 2 * n_c);

  // X -> C' unit arcs carry the assignment; arc id of (i, j) is 2*(i*n_c+j)
  // because edges are added in row-major order first.
  for (int i = 0; i < n_x; ++i) {
    for (int j = 0; j < n_c; ++j) {
      g.add_edge(x0 + i, cd0 + j, 1, costs[static_cast<i64>(i) * n_c + j]);
    }
  }
  for (int j = 0; j < n_c; ++j) g.add_edge(cd0 + j, c0 + j, size_max, 0);
  for (int j = 0; j < n_c; ++j) g.add_edge(c0 + j, art, n_x, 0);

  std::vector<i64> sup(art + 1, 0);
  for (int i = 0; i < n_x; ++i) sup[x0 + i] = 1;
  for (int j = 0; j < n_c; ++j) sup[c0 + j] = -static_cast<i64>(size_min);
  sup[art] = -(static_cast<i64>(n_x) - static_cast<i64>(n_c) * size_min);

  bool ok;
  if (method == 1) {
    ok = SSP(g, std::move(sup)).solve();
  } else {
    ok = CostScaling(g, std::move(sup)).solve();
  }
  if (!ok) return 1;

  for (int i = 0; i < n_x; ++i) {
    int lab = -1;
    for (int j = 0; j < n_c; ++j) {
      int a = 2 * (static_cast<int>(static_cast<i64>(i) * n_c + j));
      if (g.cap[a ^ 1] > 0) { lab = j; break; }  // unit arc carries flow
    }
    if (lab < 0) return 3;
    out_labels[i] = lab;
  }
  return 0;
}

}  // extern "C"
