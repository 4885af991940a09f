// Native host-side graph kernels for vq_gnn_tpu.
//
// The reference leans on torch_sparse/torch_cluster C++/CUDA for per-batch
// subgraph extraction, random walks and METIS partitioning (SURVEY §2.2).
// On TPU the per-batch work is host CPU; these kernels keep the input
// pipeline off the Python interpreter's critical path.
//
// Exposed via a plain C ABI consumed with ctypes (vq_gnn_tpu/native/lib.py).
//
// Build: make -C vq_gnn_tpu/native   (produces libvqgnn_graph.so)

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

typedef struct {
  int64_t n_fo;   // number of boundary (B') nodes
  int64_t n_e;    // number of edges
  int64_t *fo;    // [n_fo] global boundary ids (sorted)
  int64_t *er;    // [n_e] local edge rows (batch i -> i, boundary j -> B + j)
  int64_t *ec;    // [n_e] local edge cols
  float *ev;      // [n_e] edge values
} SubgraphResult;

// 1-hop subgraph with the [B || B'] layout, matching the reference
// _k_hop_subgraph (vq_gnn_v2/dataloader.py:98-148).  train_flag keeps all
// edges among the subset; eval keeps only batch rows.
SubgraphResult *vq_khop(const int64_t *rowptr, const int64_t *col,
                        const float *val, int64_t num_N, const int64_t *batch,
                        int64_t B, int train_flag) {
  // position map: -1 unseen, >=0 local index
  std::vector<int64_t> pos(num_N, -1);
  for (int64_t i = 0; i < B; ++i) pos[batch[i]] = i;

  // boundary = neighbors of batch rows not in batch; collect sorted unique
  std::vector<char> seen(num_N, 0);
  std::vector<int64_t> fo;
  for (int64_t i = 0; i < B; ++i) {
    int64_t v = batch[i];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e) {
      int64_t u = col[e];
      if (pos[u] < 0 && !seen[u]) {
        seen[u] = 1;
        fo.push_back(u);
      }
    }
  }
  std::sort(fo.begin(), fo.end());
  for (size_t j = 0; j < fo.size(); ++j) pos[fo[j]] = B + (int64_t)j;

  std::vector<int64_t> er, ec;
  std::vector<float> ev;
  auto emit_row = [&](int64_t v, bool filter_cols) {
    int64_t r = pos[v];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e) {
      int64_t c = pos[col[e]];
      if (filter_cols && c < 0) continue;
      er.push_back(r);
      ec.push_back(c);
      ev.push_back(val[e]);
    }
  };
  if (train_flag) {
    for (int64_t i = 0; i < B; ++i) emit_row(batch[i], true);
    for (int64_t j = 0; j < (int64_t)fo.size(); ++j) emit_row(fo[j], true);
  } else {
    // eval: batch rows only; every col of a batch row is in the subset
    for (int64_t i = 0; i < B; ++i) emit_row(batch[i], true);
  }

  auto *res = (SubgraphResult *)malloc(sizeof(SubgraphResult));
  res->n_fo = (int64_t)fo.size();
  res->n_e = (int64_t)er.size();
  res->fo = (int64_t *)malloc(sizeof(int64_t) * fo.size());
  res->er = (int64_t *)malloc(sizeof(int64_t) * er.size());
  res->ec = (int64_t *)malloc(sizeof(int64_t) * ec.size());
  res->ev = (float *)malloc(sizeof(float) * ev.size());
  memcpy(res->fo, fo.data(), sizeof(int64_t) * fo.size());
  memcpy(res->er, er.data(), sizeof(int64_t) * er.size());
  memcpy(res->ec, ec.data(), sizeof(int64_t) * ec.size());
  memcpy(res->ev, ev.data(), sizeof(float) * ev.size());
  return res;
}

void vq_free_subgraph(SubgraphResult *r) {
  if (!r) return;
  free(r->fo);
  free(r->er);
  free(r->ec);
  free(r->ev);
  free(r);
}

// Slot-ELL construction from row-sorted COO (see ops/spmm.py:build_ell_host).
// Splits each row's edges into slots of K; emits (slot row, K cols, K vals)
// padded with (num_rows, num_rows, 0).  out_* are preallocated: ell_row
// [S_pad], ell_col/ell_val [S_pad*K] row-major.
// Rows are dense: a row with no edges still gets one zero-valued dustbin
// slot so sorted slot rows are gap-free over [0, num_rows) — the invariant
// the windowed Pallas segment-sum relies on (ops/pallas_segsum.py).
void vq_build_ell(const int64_t *row, const int64_t *col, const float *val,
                  int64_t E, int64_t num_rows, int64_t K, int64_t S_pad,
                  int32_t *ell_row, int32_t *ell_col, float *ell_val) {
  for (int64_t s = 0; s < S_pad; ++s) ell_row[s] = (int32_t)num_rows;
  for (int64_t i = 0; i < S_pad * K; ++i) {
    ell_col[i] = (int32_t)num_rows;
    ell_val[i] = 0.0f;
  }
  int64_t sid = -1, k = 0, e = 0;
  for (int64_t r = 0; r < num_rows; ++r) {
    if (e >= E || row[e] != r) {  // empty row: one dustbin slot
      ++sid;
      ell_row[sid] = (int32_t)r;
      continue;
    }
    k = K;  // force a fresh slot for this row's first edge
    for (; e < E && row[e] == r; ++e) {
      if (k == K) {
        ++sid;
        k = 0;
        ell_row[sid] = (int32_t)r;
      }
      ell_col[sid * K + k] = (int32_t)col[e];
      ell_val[sid * K + k] = val[e];
      ++k;
    }
  }
}

// Uniform random walk (torch_cluster semantics: isolated nodes stay put).
// out is [n, length+1] row-major, preallocated by the caller.
void vq_random_walk(const int64_t *rowptr, const int64_t *col, int64_t num_N,
                    const int64_t *starts, int64_t n, int64_t length,
                    uint64_t seed, int64_t *out) {
  std::mt19937_64 gen(seed);
  for (int64_t i = 0; i < n; ++i) {
    int64_t cur = starts[i];
    out[i * (length + 1)] = cur;
    for (int64_t s = 0; s < length; ++s) {
      int64_t deg = rowptr[cur + 1] - rowptr[cur];
      if (deg > 0) cur = col[rowptr[cur] + (int64_t)(gen() % (uint64_t)deg)];
      out[i * (length + 1) + s + 1] = cur;
    }
  }
}

// Greedy BFS-grow balanced partitioner (METIS stand-in for the cluster
// sampler, reference misc.py:93-112).  Grows parts from low-degree seeds to
// the balanced target size; BFS frontiers keep parts connected, which is
// what drives the low inter/intra edge ratio the sampler needs.
void vq_partition(const int64_t *rowptr, const int64_t *col, int64_t num_N,
                  int32_t num_parts, int32_t *cluster) {
  const int64_t target = (num_N + num_parts - 1) / num_parts;
  std::vector<int32_t> assign(num_N, -1);

  // seeds in ascending-degree order
  std::vector<int64_t> order(num_N);
  for (int64_t i = 0; i < num_N; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return (rowptr[a + 1] - rowptr[a]) < (rowptr[b + 1] - rowptr[b]);
  });

  std::vector<int64_t> queue;
  queue.reserve(num_N);
  int64_t seed_cursor = 0;
  for (int32_t part = 0; part < num_parts; ++part) {
    int64_t size = 0;
    queue.clear();
    size_t head = 0;
    while (size < target) {
      if (head >= queue.size()) {
        // refill from the next unassigned seed
        while (seed_cursor < num_N && assign[order[seed_cursor]] >= 0)
          ++seed_cursor;
        if (seed_cursor >= num_N) break;
        queue.push_back(order[seed_cursor]);
      }
      int64_t v = queue[head++];
      if (assign[v] >= 0) continue;
      assign[v] = part;
      ++size;
      for (int64_t e = rowptr[v]; e < rowptr[v + 1]; ++e) {
        int64_t u = col[e];
        if (assign[u] < 0) queue.push_back(u);
      }
    }
    if (seed_cursor >= num_N && size == 0) {
      // ran out of nodes; remaining parts stay empty
    }
  }
  // any stragglers (disconnected tails) go to the last part
  for (int64_t i = 0; i < num_N; ++i)
    cluster[i] = assign[i] >= 0 ? assign[i] : num_parts - 1;
}

}  // extern "C"
