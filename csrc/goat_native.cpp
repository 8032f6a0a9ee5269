// Native runtime components for vln_goat_tpu (C ABI, loaded via ctypes).
//
// TPU-era replacements for the reference's native pieces (SURVEY.md §2.3/2.4):
// - apsp / nearest_view: the rendering-free MatterSim graph core
//   (connectivity graph -> all-pairs shortest paths + discretized-view
//   candidate geometry) that map_nav_src/r2r/env.py obtains from the
//   MatterSim C++ simulator and nx.all_pairs_dijkstra;
// - bleu_stats: corpus BLEU n-gram counting (fairseq/clib/libbleu
//   equivalent; live-path analogue reverie/bleu_coco);
// - edit_distance_batch: batched Levenshtein (fairseq/clib/libnat
//   equivalent);
// - bucket_by_size: batch-by-size token bucketing
//   (fairseq/data/data_utils_fast.pyx equivalent);
// - kmeans_lloyd: Lloyd iterations (sklearnex KMeans stand-in for the
//   front-door picker; the JAX on-device version is the hot path).
//
// Build: make -C csrc   (produces libgoat_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// All-pairs shortest paths over a weighted undirected graph.
// edges: E pairs (a[i], b[i]) with weight w[i].  Outputs row-major [V, V]:
// dist (FLT_MAX-ish 1e30 when unreachable), hops (#edges), nexthop (first
// node after the source on the shortest path; -1 unreachable, diag = self).
void apsp(int V, int E, const int32_t* ea, const int32_t* eb, const float* w,
          float* dist, int32_t* hops, int32_t* nexthop) {
  std::vector<std::vector<std::pair<int, float>>> adj(V);
  for (int i = 0; i < E; ++i) {
    adj[ea[i]].push_back({eb[i], w[i]});
    adj[eb[i]].push_back({ea[i], w[i]});
  }
  const float INF = 1e30f;
  std::vector<float> d(V);
  std::vector<int> h(V), pred(V);
  using QE = std::pair<float, int>;
  for (int s = 0; s < V; ++s) {
    std::fill(d.begin(), d.end(), INF);
    std::fill(h.begin(), h.end(), 0);
    std::fill(pred.begin(), pred.end(), -1);
    d[s] = 0.f;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    pq.push({0.f, s});
    while (!pq.empty()) {
      auto [du, u] = pq.top();
      pq.pop();
      if (du > d[u]) continue;
      for (auto [v, wv] : adj[u]) {
        float nd = du + wv;
        if (nd < d[v] - 1e-12f) {
          d[v] = nd;
          h[v] = h[u] + 1;
          pred[v] = u;
          pq.push({nd, v});
        }
      }
    }
    for (int t = 0; t < V; ++t) {
      dist[(size_t)s * V + t] = d[t];
      hops[(size_t)s * V + t] = h[t];
      if (t == s) {
        nexthop[(size_t)s * V + t] = t;
      } else if (pred[t] < 0) {
        nexthop[(size_t)s * V + t] = -1;
      } else {
        int cur = t, first = t;
        while (pred[cur] != s && pred[cur] >= 0) {
          cur = pred[cur];
          first = cur;
        }
        nexthop[(size_t)s * V + t] = (pred[cur] == s) ? first : -1;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Nearest discretized 36-view index for directions (heading, elevation):
// argmin over view centers of dh^2 + de^2 with heading wrap (the net effect
// of the reference's 36-view candidate sweep, r2r/env.py:249-314).
void nearest_view(int n, const float* heading, const float* elev,
                  int32_t* out) {
  const float rad30 = 0.5235987755982988f;
  const float twopi = 6.283185307179586f;
  for (int i = 0; i < n; ++i) {
    float best = 1e30f;
    int bi = 0;
    for (int ix = 0; ix < 36; ++ix) {
      float vh = (ix % 12) * rad30;
      float ve = (ix / 12 - 1) * rad30;
      float dh = std::remainder(heading[i] - vh, twopi);
      float de = elev[i] - ve;
      float c = dh * dh + de * de;
      if (c < best) {
        best = c;
        bi = ix;
      }
    }
    out[i] = bi;
  }
}

// ---------------------------------------------------------------------------
// BLEU n-gram statistics for one (hypothesis, multi-reference) pair.
// Accumulates clipped/total counts for n in [1, max_n] and the closest
// reference length.  Caller reduces across the corpus and applies BP.
static uint64_t hash_gram(const int32_t* a, int n) {
  uint64_t h = 1469598103934665603ull;
  for (int i = 0; i < n; ++i) {
    h ^= (uint64_t)(uint32_t)a[i];
    h *= 1099511628211ull;
  }
  return h;
}

void bleu_stats(int hyp_len, const int32_t* hyp, int n_refs,
                const int32_t* ref_lens, const int32_t* refs_flat, int max_n,
                int64_t* clipped, int64_t* totals, int32_t* closest_ref_len) {
  int best_diff = 1 << 30, best_len = 0;
  for (int r = 0; r < n_refs; ++r) {
    int diff = std::abs(ref_lens[r] - hyp_len);
    if (diff < best_diff || (diff == best_diff && ref_lens[r] < best_len)) {
      best_diff = diff;
      best_len = ref_lens[r];
    }
  }
  *closest_ref_len = best_len;

  for (int n = 1; n <= max_n; ++n) {
    if (hyp_len < n) continue;
    std::map<uint64_t, int> hyp_cnt, ref_max;
    for (int i = 0; i + n <= hyp_len; ++i) hyp_cnt[hash_gram(hyp + i, n)]++;
    int o = 0;
    for (int r = 0; r < n_refs; ++r) {
      std::map<uint64_t, int> rc;
      for (int i = 0; i + n <= ref_lens[r]; ++i)
        rc[hash_gram(refs_flat + o + i, n)]++;
      for (auto& kv : rc) {
        auto it = ref_max.find(kv.first);
        if (it == ref_max.end() || it->second < kv.second)
          ref_max[kv.first] = kv.second;
      }
      o += ref_lens[r];
    }
    for (auto& kv : hyp_cnt) {
      totals[n - 1] += kv.second;
      auto it = ref_max.find(kv.first);
      if (it != ref_max.end())
        clipped[n - 1] += std::min(kv.second, it->second);
    }
  }
}

// ---------------------------------------------------------------------------
// Batched Levenshtein edit distance (insert/delete/substitute cost 1).
void edit_distance_batch(int B, int maxa, int maxb, const int32_t* a,
                         const int32_t* la, const int32_t* b,
                         const int32_t* lb, int32_t* out) {
  std::vector<int> prev(maxb + 1), cur(maxb + 1);
  for (int i = 0; i < B; ++i) {
    const int32_t* xa = a + (size_t)i * maxa;
    const int32_t* xb = b + (size_t)i * maxb;
    int n = la[i], m = lb[i];
    for (int j = 0; j <= m; ++j) prev[j] = j;
    for (int r = 1; r <= n; ++r) {
      cur[0] = r;
      for (int j = 1; j <= m; ++j) {
        int sub = prev[j - 1] + (xa[r - 1] != xb[j - 1]);
        cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
      }
      std::swap(prev, cur);
    }
    out[i] = prev[m];
  }
}

// ---------------------------------------------------------------------------
// Greedy batch-by-size bucketing: given per-item sizes (any order), fill
// batches so that batch_tokens >= (#items * max_size_in_batch) stays under
// max_tokens and #items <= max_items.  Writes batch id per item (in the
// given order); returns the number of batches.
int bucket_by_size(int n, const int32_t* sizes, int max_tokens, int max_items,
                   int32_t* batch_ids) {
  int bid = 0, cnt = 0, bmax = 0;
  for (int i = 0; i < n; ++i) {
    int s = sizes[i];
    int nmax = std::max(bmax, s);
    if (cnt > 0 && ((cnt + 1) * nmax > max_tokens || cnt + 1 > max_items)) {
      ++bid;
      cnt = 0;
      bmax = 0;
      nmax = s;
    }
    batch_ids[i] = bid;
    ++cnt;
    bmax = nmax;
  }
  return n > 0 ? bid + 1 : 0;
}

// ---------------------------------------------------------------------------
// KMeans Lloyd iterations (centers pre-seeded by the caller).
void kmeans_lloyd(int n, int d, int k, int iters, const float* x,
                  float* centers, int32_t* assign) {
  std::vector<double> sums((size_t)k * d);
  std::vector<int> cnts(k);
  for (int it = 0; it < iters; ++it) {
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(cnts.begin(), cnts.end(), 0);
    for (int i = 0; i < n; ++i) {
      const float* xi = x + (size_t)i * d;
      float best = 1e30f;
      int bi = 0;
      for (int c = 0; c < k; ++c) {
        const float* cc = centers + (size_t)c * d;
        float dist = 0.f;
        for (int j = 0; j < d; ++j) {
          float t = xi[j] - cc[j];
          dist += t * t;
        }
        if (dist < best) {
          best = dist;
          bi = c;
        }
      }
      assign[i] = bi;
      cnts[bi]++;
      double* sc = sums.data() + (size_t)bi * d;
      for (int j = 0; j < d; ++j) sc[j] += xi[j];
    }
    for (int c = 0; c < k; ++c) {
      if (cnts[c] == 0) continue;
      float* cc = centers + (size_t)c * d;
      const double* sc = sums.data() + (size_t)c * d;
      for (int j = 0; j < d; ++j) cc[j] = (float)(sc[j] / cnts[c]);
    }
  }
}

}  // extern "C"
