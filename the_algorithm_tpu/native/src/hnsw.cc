// HNSW approximate-nearest-neighbor index (host-side, C++).
//
// Equivalent capability to the reference's Java implementation
// (ann/src/main/java/com/twitter/ann/hnsw/HnswIndex.java: insert at :153,
// searchKnn at :538): hierarchical small-world graph per Malkov & Yashunin,
// greedy descent through upper layers, beam search (ef) at layer 0,
// bidirectional links pruned to M (2M at layer 0). The reference supports
// concurrent insert via per-item lock striping + a volatile entry point; we
// use one std::shared_mutex (searches shared, inserts exclusive) — the
// host-side index here feeds offline builds and CPU serving paths, where
// insert throughput is not the bottleneck (TPU paths use the exact scans).
//
// Metrics match ann/common/Metric.scala:88-222: L2, InnerProduct (negated as
// a distance), Cosine (1 - cos). Serialization mirrors the capability of
// scala/.../serialization (SerializableHnsw): flat binary dump/load.
//
// C ABI only (ctypes-friendly); no external dependencies.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <shared_mutex>
#include <unordered_set>
#include <vector>

namespace {

enum MetricKind : int32_t { kL2 = 0, kInnerProduct = 1, kCosine = 2 };

struct Node {
  int64_t id;
  int32_t level;
  // neighbors[l] = vector of internal indices at layer l (0..level)
  std::vector<std::vector<int32_t>> neighbors;
};

struct HnswIndex {
  int32_t dim;
  int32_t metric;
  int32_t m;                // max links per node, layers > 0
  int32_t m0;               // max links at layer 0 (2·m)
  int32_t ef_construction;
  double level_mult;        // 1 / ln(m)
  int32_t entry_point = -1;
  int32_t max_level = -1;
  std::vector<float> data;      // [n, dim] (cosine: stored L2-normalized)
  std::vector<Node> nodes;
  std::mt19937_64 rng;
  mutable std::shared_mutex lock;

  float dist(const float* a, const float* b) const {
    float acc = 0.f;
    if (metric == kL2) {
      for (int32_t i = 0; i < dim; ++i) {
        float d = a[i] - b[i];
        acc += d * d;
      }
      return acc;  // squared L2 ranks identically
    }
    for (int32_t i = 0; i < dim; ++i) acc += a[i] * b[i];
    return metric == kCosine ? 1.f - acc : -acc;
  }

  const float* vec(int32_t idx) const { return data.data() + (size_t)idx * dim; }

  // beam search within one layer: returns up to ef closest (dist, idx),
  // ascending by distance.
  std::vector<std::pair<float, int32_t>> search_layer(
      const float* q, int32_t entry, int32_t layer, int32_t ef) const {
    std::priority_queue<std::pair<float, int32_t>> best;  // max-heap: worst on top
    std::priority_queue<std::pair<float, int32_t>,
                        std::vector<std::pair<float, int32_t>>,
                        std::greater<>> frontier;  // min-heap
    std::unordered_set<int32_t> visited;
    float d0 = dist(q, vec(entry));
    best.emplace(d0, entry);
    frontier.emplace(d0, entry);
    visited.insert(entry);
    while (!frontier.empty()) {
      auto [d, u] = frontier.top();
      if (d > best.top().first && (int32_t)best.size() >= ef) break;
      frontier.pop();
      const auto& nbrs = nodes[u].neighbors[layer];
      for (int32_t v : nbrs) {
        if (!visited.insert(v).second) continue;
        float dv = dist(q, vec(v));
        if ((int32_t)best.size() < ef || dv < best.top().first) {
          best.emplace(dv, v);
          frontier.emplace(dv, v);
          if ((int32_t)best.size() > ef) best.pop();
        }
      }
    }
    std::vector<std::pair<float, int32_t>> out(best.size());
    for (size_t i = best.size(); i-- > 0;) {
      out[i] = best.top();
      best.pop();
    }
    return out;
  }

  // Neighbor selection per the paper's Algorithm 4 (the diversity
  // heuristic): a candidate is kept only if it is closer to the query than
  // to every already-selected neighbor — this preserves links *between*
  // natural clusters, without which closest-M pruning disconnects the graph
  // (recall plateaus regardless of ef). Pruned candidates back-fill any
  // remaining slots (keepPrunedConnections).
  std::vector<std::pair<float, int32_t>> select_heuristic(
      std::vector<std::pair<float, int32_t>> cand, int32_t max_links) const {
    if ((int32_t)cand.size() <= max_links) return cand;
    std::sort(cand.begin(), cand.end());
    std::vector<std::pair<float, int32_t>> out, discarded;
    for (auto& c : cand) {
      if ((int32_t)out.size() >= max_links) break;
      bool diverse = true;
      for (auto& s : out) {
        if (dist(vec(c.second), vec(s.second)) < c.first) {
          diverse = false;
          break;
        }
      }
      (diverse ? out : discarded).push_back(c);
    }
    for (auto& c : discarded) {
      if ((int32_t)out.size() >= max_links) break;
      out.push_back(c);
    }
    return out;
  }

  void prune(int32_t u, int32_t layer, int32_t max_links) {
    auto& nbrs = nodes[u].neighbors[layer];
    if ((int32_t)nbrs.size() <= max_links) return;
    std::vector<std::pair<float, int32_t>> scored;
    scored.reserve(nbrs.size());
    for (int32_t v : nbrs) scored.emplace_back(dist(vec(u), vec(v)), v);
    auto kept = select_heuristic(std::move(scored), max_links);
    nbrs.clear();
    for (auto& c : kept) nbrs.push_back(c.second);
  }

  int32_t insert(const float* v_in, int64_t id) {
    std::unique_lock<std::shared_mutex> guard(lock);
    int32_t idx = (int32_t)nodes.size();
    data.resize((size_t)(idx + 1) * dim);
    float* v = data.data() + (size_t)idx * dim;
    std::memcpy(v, v_in, sizeof(float) * dim);
    if (metric == kCosine) {
      float n = 0.f;
      for (int32_t i = 0; i < dim; ++i) n += v[i] * v[i];
      n = std::sqrt(std::max(n, 1e-30f));
      for (int32_t i = 0; i < dim; ++i) v[i] /= n;
    }
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    int32_t level =
        (int32_t)std::floor(-std::log(std::max(unif(rng), 1e-12)) * level_mult);
    Node node;
    node.id = id;
    node.level = level;
    node.neighbors.resize(level + 1);
    nodes.push_back(std::move(node));

    if (entry_point < 0) {
      entry_point = idx;
      max_level = level;
      return idx;
    }
    int32_t ep = entry_point;
    // greedy descent through layers above the node's level
    for (int32_t l = max_level; l > level; --l) {
      bool improved = true;
      float d = dist(v, vec(ep));
      while (improved) {
        improved = false;
        for (int32_t u : nodes[ep].neighbors[l]) {
          float du = dist(v, vec(u));
          if (du < d) {
            d = du;
            ep = u;
            improved = true;
          }
        }
      }
    }
    // connect at each layer ≤ min(level, max_level)
    for (int32_t l = std::min(level, max_level); l >= 0; --l) {
      auto cand = search_layer(v, ep, l, ef_construction);
      ep = cand.front().second;
      auto selected = select_heuristic(cand, m);
      auto& mine = nodes[idx].neighbors[l];
      for (auto& [d, u] : selected) {
        mine.push_back(u);
        nodes[u].neighbors[l].push_back(idx);
        prune(u, l, l == 0 ? m0 : m);
      }
    }
    if (level > max_level) {
      max_level = level;
      entry_point = idx;
    }
    return idx;
  }

  int32_t search(const float* q_in, int32_t k, int32_t ef, int64_t* out_ids,
                 float* out_dists) const {
    std::shared_lock<std::shared_mutex> guard(lock);
    if (entry_point < 0) return 0;
    std::vector<float> qbuf(q_in, q_in + dim);
    float* q = qbuf.data();
    if (metric == kCosine) {
      float n = 0.f;
      for (int32_t i = 0; i < dim; ++i) n += q[i] * q[i];
      n = std::sqrt(std::max(n, 1e-30f));
      for (int32_t i = 0; i < dim; ++i) q[i] /= n;
    }
    int32_t ep = entry_point;
    for (int32_t l = max_level; l > 0; --l) {
      bool improved = true;
      float d = dist(q, vec(ep));
      while (improved) {
        improved = false;
        for (int32_t u : nodes[ep].neighbors[l]) {
          float du = dist(q, vec(u));
          if (du < d) {
            d = du;
            ep = u;
            improved = true;
          }
        }
      }
    }
    auto cand = search_layer(q, ep, 0, std::max(ef, k));
    int32_t n = std::min((int32_t)cand.size(), k);
    for (int32_t i = 0; i < n; ++i) {
      out_ids[i] = nodes[cand[i].second].id;
      // report true L2 (not squared) to match Metric.scala conventions
      out_dists[i] =
          metric == kL2 ? std::sqrt(std::max(cand[i].first, 0.f)) : cand[i].first;
    }
    return n;
  }
};

constexpr uint64_t kMagic = 0x484e53575450ull;  // "TPWSNH"

}  // namespace

extern "C" {

void* tpurecsys_hnsw_create(int32_t dim, int32_t metric, int32_t m,
                            int32_t ef_construction, uint64_t seed) {
  auto* h = new HnswIndex();
  h->dim = dim;
  h->metric = metric;
  h->m = m;
  h->m0 = 2 * m;
  h->ef_construction = ef_construction;
  h->level_mult = 1.0 / std::log((double)m);
  h->rng.seed(seed);
  return h;
}

void tpurecsys_hnsw_free(void* h) { delete (HnswIndex*)h; }

uint64_t tpurecsys_hnsw_size(void* h) {
  return ((HnswIndex*)h)->nodes.size();
}

int32_t tpurecsys_hnsw_insert(void* h, const float* vec, int64_t id) {
  return ((HnswIndex*)h)->insert(vec, id);
}

// batch insert: n vectors laid out [n, dim]
void tpurecsys_hnsw_insert_batch(void* h, const float* vecs,
                                 const int64_t* ids, uint64_t n) {
  auto* idx = (HnswIndex*)h;
  for (uint64_t i = 0; i < n; ++i)
    idx->insert(vecs + i * idx->dim, ids[i]);
}

int32_t tpurecsys_hnsw_search(void* h, const float* q, int32_t k, int32_t ef,
                              int64_t* out_ids, float* out_dists) {
  return ((HnswIndex*)h)->search(q, k, ef, out_ids, out_dists);
}

int tpurecsys_hnsw_save(void* hp, const char* path) {
  auto* h = (HnswIndex*)hp;
  std::shared_lock<std::shared_mutex> guard(h->lock);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint64_t n = h->nodes.size();
  uint64_t header[8] = {kMagic, (uint64_t)h->dim, (uint64_t)h->metric,
                        (uint64_t)h->m, (uint64_t)h->ef_construction,
                        n, (uint64_t)(int64_t)h->entry_point,
                        (uint64_t)(int64_t)h->max_level};
  std::fwrite(header, sizeof(header), 1, f);
  std::fwrite(h->data.data(), sizeof(float), n * h->dim, f);
  for (auto& node : h->nodes) {
    int64_t meta[2] = {node.id, node.level};
    std::fwrite(meta, sizeof(meta), 1, f);
    for (int32_t l = 0; l <= node.level; ++l) {
      uint32_t cnt = (uint32_t)node.neighbors[l].size();
      std::fwrite(&cnt, sizeof(cnt), 1, f);
      std::fwrite(node.neighbors[l].data(), sizeof(int32_t), cnt, f);
    }
  }
  std::fclose(f);
  return 0;
}

void* tpurecsys_hnsw_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint64_t header[8];
  if (std::fread(header, sizeof(header), 1, f) != 1 || header[0] != kMagic) {
    std::fclose(f);
    return nullptr;
  }
  auto* h = (HnswIndex*)tpurecsys_hnsw_create(
      (int32_t)header[1], (int32_t)header[2], (int32_t)header[3],
      (int32_t)header[4], 0);
  uint64_t n = header[5];
  h->entry_point = (int32_t)(int64_t)header[6];
  h->max_level = (int32_t)(int64_t)header[7];
  h->data.resize(n * h->dim);
  if (n && std::fread(h->data.data(), sizeof(float), n * h->dim, f) !=
               n * h->dim) {
    std::fclose(f);
    delete h;
    return nullptr;
  }
  h->nodes.resize(n);
  for (uint64_t i = 0; i < n; ++i) {
    int64_t meta[2];
    if (std::fread(meta, sizeof(meta), 1, f) != 1) {
      std::fclose(f);
      delete h;
      return nullptr;
    }
    h->nodes[i].id = meta[0];
    h->nodes[i].level = (int32_t)meta[1];
    h->nodes[i].neighbors.resize(meta[1] + 1);
    for (int32_t l = 0; l <= (int32_t)meta[1]; ++l) {
      uint32_t cnt;
      if (std::fread(&cnt, sizeof(cnt), 1, f) != 1) {
        std::fclose(f);
        delete h;
        return nullptr;
      }
      h->nodes[i].neighbors[l].resize(cnt);
      if (cnt && std::fread(h->nodes[i].neighbors[l].data(), sizeof(int32_t),
                            cnt, f) != cnt) {
        std::fclose(f);
        delete h;
        return nullptr;
      }
    }
  }
  std::fclose(f);
  return h;
}

}  // extern "C"
