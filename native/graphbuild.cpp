// Native ETL kernels for sldm_gnn_tpu.
//
// The reference's graph construction runs an interpreted O(V^2)*O(F) Python
// double loop per pack (/root/reference/src/gbuilder.py:85-110) and an
// O(S^2) map-edge loop (:392-424). The framework's default path vectorizes
// these in numpy (build/tensorize.py); this library is the production ETL
// path: multi-threaded C++ with the exact same emission order and
// numerics, exposed through a C ABI consumed via ctypes
// (sldm_gnn_tpu/build/native.py).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <vector>

#include <limits>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Pass 1: count trajectory-proximity edges per source vehicle.
//   xy:       [V, F, 2] float32 (recentered positions)
//   presence: [V, F] float32 (>0.5 == present)
//   counts:   [V] int64 output — edges emitted by source row i
void traj_edge_count(const float* xy, const float* presence, int64_t V,
                     int64_t F, float radius, int64_t* counts) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t i = 0; i < V; ++i) {
    int64_t c = 0;
    const float* xi = xy + i * F * 2;
    const float* pi = presence + i * F;
    for (int64_t j = 0; j < V; ++j) {
      if (i == j) continue;
      const float* xj = xy + j * F * 2;
      const float* pj = presence + j * F;
      float dmin = INFINITY;
      for (int64_t f = 0; f < F; ++f) {
        if (pi[f] > 0.5f && pj[f] > 0.5f) {
          float dx = xi[f * 2] - xj[f * 2];
          float dy = xi[f * 2 + 1] - xj[f * 2 + 1];
          float d = std::sqrt(dx * dx + dy * dy);
          if (d < dmin) dmin = d;
        }
      }
      if (dmin <= radius) ++c;
    }
    counts[i] = c;
  }
}

// Pass 2: fill edges + attributes using the prefix offsets of pass 1.
//   offsets: [V] int64 — exclusive prefix sum of counts
//   edge_src/edge_dst: [E] int32; edge_attr: [E, 4] float32
//   (min, max, mean, mean-square distance over co-present frames)
void traj_edge_fill(const float* xy, const float* presence, int64_t V,
                    int64_t F, float radius, const int64_t* offsets,
                    int32_t* edge_src, int32_t* edge_dst, float* edge_attr) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t i = 0; i < V; ++i) {
    int64_t pos = offsets[i];
    const float* xi = xy + i * F * 2;
    const float* pi = presence + i * F;
    for (int64_t j = 0; j < V; ++j) {
      if (i == j) continue;
      const float* xj = xy + j * F * 2;
      const float* pj = presence + j * F;
      float dmin = INFINITY, dmax = -INFINITY;
      double dsum = 0.0, d2sum = 0.0;
      int64_t cnt = 0;
      for (int64_t f = 0; f < F; ++f) {
        if (pi[f] > 0.5f && pj[f] > 0.5f) {
          float dx = xi[f * 2] - xj[f * 2];
          float dy = xi[f * 2 + 1] - xj[f * 2 + 1];
          float d = std::sqrt(dx * dx + dy * dy);
          if (d < dmin) dmin = d;
          if (d > dmax) dmax = d;
          dsum += d;
          d2sum += (double)d * d;
          ++cnt;
        }
      }
      if (cnt > 0 && dmin <= radius) {
        edge_src[pos] = (int32_t)i;
        edge_dst[pos] = (int32_t)j;
        edge_attr[pos * 4 + 0] = dmin;
        edge_attr[pos * 4 + 1] = dmax;
        edge_attr[pos * 4 + 2] = (float)(dsum / cnt);
        edge_attr[pos * 4 + 3] = (float)(d2sum / cnt);
        ++pos;
      }
    }
  }
}

// Map-graph edge rules (gbuilder.py:392-424 semantics; see
// build/map_builder.py for the rule description). Pass 1: counts per i.
void map_edge_count(const float* start, const float* end, const float* width,
                    const uint8_t* allow_left, const uint8_t* allow_right,
                    int64_t S, float max_angle_rad, float prox_thresh,
                    float fwd_thresh, int64_t* counts) {
  std::vector<float> ang(S), cx(S), cy(S), len2(S);
  for (int64_t i = 0; i < S; ++i) {
    float dx = end[i * 2] - start[i * 2];
    float dy = end[i * 2 + 1] - start[i * 2 + 1];
    ang[i] = std::atan2(dy, dx);
    cx[i] = (start[i * 2] + end[i * 2]) * 0.5f;
    cy[i] = (start[i * 2 + 1] + end[i * 2 + 1]) * 0.5f;
    len2[i] = dx * dx + dy * dy;
  }
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < S; ++i) {
    int64_t c = 0;
    for (int64_t j = 0; j < S; ++j) {
      if (i == j) continue;
      float delta = std::fabs(ang[i] - ang[j]);
      if (delta < max_angle_rad) {
        // clamped projection of shorter centroid onto longer segment
        int64_t a = (len2[j] > len2[i]) ? j : i;  // longer
        int64_t b = (len2[j] > len2[i]) ? i : j;  // shorter
        float Ax = start[a * 2], Ay = start[a * 2 + 1];
        float ABx = end[a * 2] - Ax, ABy = end[a * 2 + 1] - Ay;
        float ACx = cx[b] - Ax, ACy = cy[b] - Ay;
        float denom = ABx * ABx + ABy * ABy;
        float t = (ACx * ABx + ACy * ABy) / denom;
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        float Px = Ax + t * ABx, Py = Ay + t * ABy;
        float raw = std::sqrt((cx[b] - Px) * (cx[b] - Px) +
                              (cy[b] - Py) * (cy[b] - Py));
        float adj = raw - (width[i] + width[j]) * 0.5f;
        if (adj < prox_thresh &&
            ((allow_right[i] && allow_left[j]) ||
             (allow_left[i] && allow_right[j])))
          ++c;
      } else {
        float dx = end[i * 2] - start[j * 2];
        float dy = end[i * 2 + 1] - start[j * 2 + 1];
        if (std::sqrt(dx * dx + dy * dy) < fwd_thresh) ++c;
      }
    }
    counts[i] = c;
  }
}

void map_edge_fill(const float* start, const float* end, const float* width,
                   const uint8_t* allow_left, const uint8_t* allow_right,
                   int64_t S, float max_angle_rad, float prox_thresh,
                   float fwd_thresh, const int64_t* offsets, int64_t* edge_src,
                   int64_t* edge_dst) {
  std::vector<float> ang(S), cx(S), cy(S), len2(S);
  for (int64_t i = 0; i < S; ++i) {
    float dx = end[i * 2] - start[i * 2];
    float dy = end[i * 2 + 1] - start[i * 2 + 1];
    ang[i] = std::atan2(dy, dx);
    cx[i] = (start[i * 2] + end[i * 2]) * 0.5f;
    cy[i] = (start[i * 2 + 1] + end[i * 2 + 1]) * 0.5f;
    len2[i] = dx * dx + dy * dy;
  }
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < S; ++i) {
    int64_t pos = offsets[i];
    for (int64_t j = 0; j < S; ++j) {
      if (i == j) continue;
      bool emit = false;
      float delta = std::fabs(ang[i] - ang[j]);
      if (delta < max_angle_rad) {
        int64_t a = (len2[j] > len2[i]) ? j : i;
        int64_t b = (len2[j] > len2[i]) ? i : j;
        float Ax = start[a * 2], Ay = start[a * 2 + 1];
        float ABx = end[a * 2] - Ax, ABy = end[a * 2 + 1] - Ay;
        float ACx = cx[b] - Ax, ACy = cy[b] - Ay;
        float denom = ABx * ABx + ABy * ABy;
        float t = (ACx * ABx + ACy * ABy) / denom;
        if (t < 0.f) t = 0.f;
        if (t > 1.f) t = 1.f;
        float Px = Ax + t * ABx, Py = Ay + t * ABy;
        float raw = std::sqrt((cx[b] - Px) * (cx[b] - Px) +
                              (cy[b] - Py) * (cy[b] - Py));
        float adj = raw - (width[i] + width[j]) * 0.5f;
        emit = adj < prox_thresh &&
               ((allow_right[i] && allow_left[j]) ||
                (allow_left[i] && allow_right[j]));
      } else {
        float dx = end[i * 2] - start[j * 2];
        float dy = end[i * 2 + 1] - start[j * 2 + 1];
        emit = std::sqrt(dx * dx + dy * dy) < fwd_thresh;
      }
      if (emit) {
        edge_src[pos] = i;
        edge_dst[pos] = j;
        ++pos;
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Blocked-edge layout builder (host prep for the Pallas SpMM kernels).
//
// Replicates sldm_gnn_tpu/graph/csr.py::block_edges functionally: edges are
// grouped by (dst_block, src_block), chunked into EC-edge chunks (weight-0
// padding), every dst block gets at least one chunk, per-dst-block chunk
// counts are padded to a multiple of step_chunks, and chunks are ordered by
// ascending dst block. Chunk order within a block may differ from the
// Python path (sums are order-independent); parity tests compare SpMM
// outputs. Two-call API: be_plan builds an opaque context and reports the
// chunk count; be_fill copies the arrays out and frees the context.
// ---------------------------------------------------------------------------

#include <algorithm>
#include <cstring>

namespace {
struct BEContext {
  std::vector<int32_t> meta;       // [W, 2]
  std::vector<int32_t> src_local;  // [W, ec]
  std::vector<int32_t> dst_local;  // [W, ec]
  std::vector<float> weight;       // [W, ec]
  std::vector<int32_t> edge_id;    // [W, ec]
  int64_t ec = 0;
};
}  // namespace

extern "C" {

void* be_plan(const int64_t* src, const int64_t* dst, const float* w,
              int64_t E, int64_t num_nodes_padded, int64_t tile, int64_t ec,
              int64_t step_chunks, int64_t* out_num_chunks) {
  const int64_t nb = std::max<int64_t>((num_nodes_padded + tile - 1) / tile, 1);
  auto* ctx = new BEContext();
  ctx->ec = ec;
  {
    // pre-size: known upper bound on chunks avoids doubling reallocations
    const int64_t max_chunks = (E + ec - 1) / ec + nb * std::max<int64_t>(step_chunks, 1);
    ctx->meta.reserve(2 * max_chunks);
    ctx->src_local.reserve(max_chunks * ec);
    ctx->dst_local.reserve(max_chunks * ec);
    ctx->weight.reserve(max_chunks * ec);
    ctx->edge_id.reserve(max_chunks * ec);
  }

  // sort edge ids by (dst_block, src_block): pack (group_key, edge_id)
  // into one uint64 so the sort runs on contiguous keys without the
  // comparator's per-compare divisions (stable by construction). Falls
  // back to a comparator sort when E or the key range overflow the packing.
  std::vector<int64_t> order(E);
  if (E < (1ll << 28) && nb * nb < (1ll << 36)) {
    std::vector<uint64_t> keyed(E);
    for (int64_t i = 0; i < E; ++i) {
      const uint64_t key = (uint64_t)((dst[i] / tile) * nb + (src[i] / tile));
      keyed[i] = (key << 28) | (uint64_t)i;
    }
    std::sort(keyed.begin(), keyed.end());
    for (int64_t i = 0; i < E; ++i)
      order[i] = (int64_t)(keyed[i] & ((1ull << 28) - 1));
  } else {
    for (int64_t i = 0; i < E; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      const int64_t ka = (dst[a] / tile) * nb + (src[a] / tile);
      const int64_t kb = (dst[b] / tile) * nb + (src[b] / tile);
      if (ka != kb) return ka < kb;
      return a < b;  // stable
    });
  }

  auto emit_chunk = [&](int32_t db, int32_t sb) {
    ctx->meta.push_back(db);
    ctx->meta.push_back(sb);
    ctx->src_local.insert(ctx->src_local.end(), ec, 0);
    ctx->dst_local.insert(ctx->dst_local.end(), ec, 0);
    ctx->weight.insert(ctx->weight.end(), ec, 0.0f);
    ctx->edge_id.insert(ctx->edge_id.end(), ec, 0);
  };

  int64_t i = 0;
  for (int64_t db = 0; db < nb; ++db) {
    int64_t chunks_this_db = 0;
    // consume all groups for this dst block
    while (i < E && dst[order[i]] / tile == db) {
      const int64_t sb = src[order[i]] / tile;
      // one (db, sb) group
      int64_t slot = ec;  // force new chunk at group start
      while (i < E && dst[order[i]] / tile == db && src[order[i]] / tile == sb) {
        if (slot == ec) {
          emit_chunk((int32_t)db, (int32_t)sb);
          ++chunks_this_db;
          slot = 0;
        }
        const int64_t e = order[i];
        const int64_t base = ((int64_t)(ctx->meta.size() / 2) - 1) * ec;
        ctx->src_local[base + slot] = (int32_t)(src[e] - sb * tile);
        ctx->dst_local[base + slot] = (int32_t)(dst[e] - db * tile);
        ctx->weight[base + slot] = w ? w[e] : 1.0f;
        ctx->edge_id[base + slot] = (int32_t)e;
        ++slot;
        ++i;
      }
    }
    if (chunks_this_db == 0) {
      emit_chunk((int32_t)db, 0);  // coverage chunk
      ++chunks_this_db;
    }
    if (step_chunks > 1) {
      while (chunks_this_db % step_chunks) {
        emit_chunk((int32_t)db, 0);
        ++chunks_this_db;
      }
    }
  }
  if (i != E) {
    // edges whose dst block falls outside [0, nb) would be silently lost
    delete ctx;
    *out_num_chunks = -1;
    return nullptr;
  }
  *out_num_chunks = (int64_t)(ctx->meta.size() / 2);
  return ctx;
}

void be_free(void* handle) { delete (BEContext*)handle; }

void be_fill(void* handle, int32_t* meta, int32_t* src_local,
             int32_t* dst_local, float* weight, int32_t* edge_id) {
  auto* ctx = (BEContext*)handle;
  std::memcpy(meta, ctx->meta.data(), ctx->meta.size() * sizeof(int32_t));
  std::memcpy(src_local, ctx->src_local.data(),
              ctx->src_local.size() * sizeof(int32_t));
  std::memcpy(dst_local, ctx->dst_local.data(),
              ctx->dst_local.size() * sizeof(int32_t));
  std::memcpy(weight, ctx->weight.data(), ctx->weight.size() * sizeof(float));
  std::memcpy(edge_id, ctx->edge_id.data(),
              ctx->edge_id.size() * sizeof(int32_t));
  delete ctx;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Dense-block adjacency builder (ops/spmm_dense.py fast path).
//
// Groups edges by destination block, enumerates each block's unique source
// blocks in ascending order (matching the python builder's lexsort slot
// order), and scatter-adds edge weights into per-pair dense [tile, tile]
// adjacency tiles. Two-call API mirroring be_plan/be_fill: da_plan groups
// edges and reports s_max; da_fill writes A and src_blk and frees the
// context. Parallel over destination blocks — each owns its A rows.
// ---------------------------------------------------------------------------

namespace {
struct DAContext {
  int64_t nb = 0, tile = 0, E = 0;
  std::vector<int64_t> offsets;  // [nb+1] edge-group boundaries
  std::vector<int64_t> order;    // [E] edge ids grouped by dst block
  const int64_t* src = nullptr;  // borrowed; caller keeps arrays alive
  const int64_t* dst = nullptr;
};
}  // namespace

extern "C" {

void* da_plan(const int64_t* src, const int64_t* dst, int64_t E,
              int64_t num_dst_blocks, int64_t tile, int64_t* out_s_max) {
  auto* ctx = new DAContext();
  ctx->nb = num_dst_blocks;
  ctx->tile = tile;
  ctx->E = E;
  ctx->src = src;
  ctx->dst = dst;

  // counting sort by dst block
  ctx->offsets.assign(num_dst_blocks + 1, 0);
  for (int64_t e = 0; e < E; ++e) ctx->offsets[dst[e] / tile + 1]++;
  for (int64_t b = 0; b < num_dst_blocks; ++b) ctx->offsets[b + 1] += ctx->offsets[b];
  ctx->order.resize(E);
  {
    std::vector<int64_t> cursor(ctx->offsets.begin(), ctx->offsets.end() - 1);
    for (int64_t e = 0; e < E; ++e) ctx->order[cursor[dst[e] / tile]++] = e;
  }

  int64_t s_max = 1;
#pragma omp parallel for schedule(dynamic) reduction(max : s_max)
  for (int64_t b = 0; b < num_dst_blocks; ++b) {
    std::vector<int64_t> sbs;
    sbs.reserve(8);
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t sb = src[ctx->order[k]] / tile;
      if (std::find(sbs.begin(), sbs.end(), sb) == sbs.end()) sbs.push_back(sb);
    }
    if ((int64_t)sbs.size() > s_max) s_max = (int64_t)sbs.size();
  }
  *out_s_max = s_max;
  return ctx;
}

// A: [nb, s_max, tile, tile] float32, zero-initialized by the caller.
// src_blk: [nb, s_max] int32, zero-initialized by the caller.
void da_fill(void* handle, const float* w, int64_t s_max, float* A,
             int32_t* src_blk) {
  auto* ctx = static_cast<DAContext*>(handle);
  const int64_t tile = ctx->tile;
  const int64_t nb = ctx->nb;
#pragma omp parallel for schedule(dynamic)
  for (int64_t b = 0; b < nb; ++b) {
    // unique src blocks in ascending order (python lexsort slot parity)
    std::vector<int64_t> sbs;
    sbs.reserve(8);
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t sb = ctx->src[ctx->order[k]] / tile;
      auto it = std::lower_bound(sbs.begin(), sbs.end(), sb);
      if (it == sbs.end() || *it != sb) sbs.insert(it, sb);
    }
    for (size_t s = 0; s < sbs.size(); ++s) src_blk[b * s_max + s] = (int32_t)sbs[s];
    float* Ab = A + b * s_max * tile * tile;
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t e = ctx->order[k];
      const int64_t sb = ctx->src[e] / tile;
      const int64_t slot =
          std::lower_bound(sbs.begin(), sbs.end(), sb) - sbs.begin();
      const int64_t i = ctx->dst[e] - b * tile;
      const int64_t j = ctx->src[e] - sb * tile;
      Ab[(slot * tile + i) * tile + j] += w[e];
    }
  }
  delete ctx;
}

// int8 count-tile fill for the factored mean layout (A = diag(1/deg) @
// counts, ops/spmm_dense.py): same grouping as da_fill but each edge adds
// 1 to an int8 tile — no [nb, s_max, T, T] float32 transient (9+ GB at
// ~50M edges on this 2-CPU host). Counts saturate at 127; the returned
// max count lets the caller reject overflow exactly like the numpy path.
// A / src_blk zero-initialized by the caller. Frees the context.
int64_t da_fill_i8(void* handle, int64_t s_max, int8_t* A, int32_t* src_blk) {
  auto* ctx = static_cast<DAContext*>(handle);
  const int64_t tile = ctx->tile;
  const int64_t nb = ctx->nb;
  int64_t cmax = 0;
#pragma omp parallel for schedule(dynamic) reduction(max : cmax)
  for (int64_t b = 0; b < nb; ++b) {
    std::vector<int64_t> sbs;
    sbs.reserve(8);
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t sb = ctx->src[ctx->order[k]] / tile;
      auto it = std::lower_bound(sbs.begin(), sbs.end(), sb);
      if (it == sbs.end() || *it != sb) sbs.insert(it, sb);
    }
    for (size_t s = 0; s < sbs.size(); ++s) src_blk[b * s_max + s] = (int32_t)sbs[s];
    int8_t* Ab = A + b * s_max * tile * tile;
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t e = ctx->order[k];
      const int64_t sb = ctx->src[e] / tile;
      const int64_t slot =
          std::lower_bound(sbs.begin(), sbs.end(), sb) - sbs.begin();
      const int64_t i = ctx->dst[e] - b * tile;
      const int64_t j = ctx->src[e] - sb * tile;
      int8_t& cell = Ab[(slot * tile + i) * tile + j];
      const int64_t c = (int64_t)cell + 1;
      if (c > cmax) cmax = c;
      if (cell < 127) cell = (int8_t)c;
    }
  }
  delete ctx;
  return cmax;
}

// Banded int8 count fill (ops/spmm_banded.py): slot = src_block - bo[b]
// where bo[b] is the block's minimum source block. Writes bo (int32[nb])
// and A (int8[nb, s_span, T, T], zero-initialized by caller). Returns the
// max count (int8-overflow check), or -1 if any block's span exceeds
// s_span (caller rebuilds with a larger span or falls back). Frees ctx.
int64_t da_fill_banded_i8(void* handle, int64_t s_span, int8_t* A,
                          int32_t* bo_out) {
  auto* ctx = static_cast<DAContext*>(handle);
  const int64_t tile = ctx->tile;
  const int64_t nb = ctx->nb;
  int64_t cmax = 0;
  bool overflow = false;
#pragma omp parallel for schedule(dynamic) reduction(max : cmax) reduction(|| : overflow)
  for (int64_t b = 0; b < nb; ++b) {
    int64_t bo = b, hi = b;  // empty blocks window themselves
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t sb = ctx->src[ctx->order[k]] / tile;
      if (k == ctx->offsets[b]) { bo = sb; hi = sb; }
      else { bo = std::min(bo, sb); hi = std::max(hi, sb); }
    }
    if (hi - bo + 1 > s_span) { overflow = true; continue; }
    bo_out[b] = (int32_t)bo;
    int8_t* Ab = A + b * s_span * tile * tile;
    for (int64_t k = ctx->offsets[b]; k < ctx->offsets[b + 1]; ++k) {
      const int64_t e = ctx->order[k];
      const int64_t sb = ctx->src[e] / tile;
      const int64_t i = ctx->dst[e] - b * tile;
      const int64_t j = ctx->src[e] - sb * tile;
      int8_t& cell = Ab[((sb - bo) * tile + i) * tile + j];
      const int64_t c = (int64_t)cell + 1;
      if (c > cmax) cmax = c;
      if (cell < 127) cell = (int8_t)c;
    }
  }
  delete ctx;
  return overflow ? -1 : cmax;
}

void da_free(void* handle) { delete static_cast<DAContext*>(handle); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Incremental sliding-window push (serve path).
//
// The numerical core of sldm_gnn_tpu/build/online.py
// IncrementalGraphOnlineCreator.push_arrays: at serving sizes (cap<=64)
// the numpy implementation is dispatch-bound (~30 small-array ops at
// ~10 us each); this single call does the same work in a few us.
// Semantics mirror the numpy path exactly — see the parity test
// (tests/test_native.py::test_incr_push_matches_numpy): f64 subtract-on-
// evict accumulators, lazy min/max with first-occurrence frame ties,
// eviction maintenance BEFORE the new frame lands, distances over ALL
// slots with presence-masked accumulation. Compiled with
// -ffp-contract=off so the float distance math matches numpy (no fma).
// Slot resolution, ring bookkeeping, and the periodic exact refresh stay
// in Python.
// ---------------------------------------------------------------------------

extern "C" {

void incr_push(
    int64_t cap, int64_t F, int64_t pos, int64_t evict,
    const int64_t* slots, int64_t n,
    const float* px, const float* py, const float* speed,
    const float* sin_a, const float* cos_a,
    const float* wl,             // [cap, 2] width,length
    float* x,                    // [cap, F, 6]
    uint8_t* present,            // [cap, F] (numpy bool view)
    float* d,                    // [F, cap, cap]
    double* dsum, double* d2sum, // [cap, cap]
    int64_t* cnt,                // [cap, cap]
    float* dmin, int32_t* dmin_pos,
    float* dmax, int32_t* dmax_pos) {
  const float INF = std::numeric_limits<float>::infinity();
  float* dpos = d + (size_t)pos * cap * cap;

  if (evict) {
    // subtract the evicted frame's contribution while its presence
    // column is still set (the numpy co_old outer product)
    for (int64_t i = 0; i < cap; ++i) {
      if (!present[i * F + pos]) continue;
      for (int64_t j = 0; j < cap; ++j) {
        if (!present[j * F + pos]) continue;
        const size_t ij = (size_t)i * cap + j;
        // the numpy evict path squares in FLOAT32 before the f64
        // subtract (d_old * d_old * co_old) — replicate exactly
        const float dvf = dpos[ij];
        dsum[ij] -= (double)dvf;
        d2sum[ij] -= (double)(dvf * dvf);
        cnt[ij] -= 1;
      }
    }
    for (int64_t i = 0; i < cap; ++i) present[i * F + pos] = 0;
    // lazy min/max maintenance: empty pairs reset; pairs whose extremum
    // lived in the evicted frame recompute over the ring (first minimal
    // frame wins ties, matching np.argmin/argmax)
    for (int64_t i = 0; i < cap; ++i) {
      for (int64_t j = 0; j < cap; ++j) {
        const size_t ij = (size_t)i * cap + j;
        if (cnt[ij] == 0) {
          dmin[ij] = INF;  dmin_pos[ij] = -1;
          dmax[ij] = -INF; dmax_pos[ij] = -1;
        } else if (dmin_pos[ij] == (int32_t)pos ||
                   dmax_pos[ij] == (int32_t)pos) {
          float bm = INF, bM = -INF;
          int32_t bmp = -1, bMp = -1;
          for (int64_t f = 0; f < F; ++f) {
            if (present[i * F + f] && present[j * F + f]) {
              const float dv = d[(size_t)f * cap * cap + ij];
              if (dv < bm) { bm = dv; bmp = (int32_t)f; }
              if (dv > bM) { bM = dv; bMp = (int32_t)f; }
            }
          }
          dmin[ij] = bm;  dmin_pos[ij] = bmp;
          dmax[ij] = bM;  dmax_pos[ij] = bMp;
        }
      }
    }
  }

  // clear the ring column to absent-frame features, then land the frame
  for (int64_t i = 0; i < cap; ++i) {
    float* xi = x + ((size_t)i * F + pos) * 6;
    xi[0] = -wl[i * 2 + 1] * 0.5f;
    xi[1] = 0.0f; xi[2] = 0.0f; xi[3] = 0.0f;
    xi[4] = 1.0f; xi[5] = 0.0f;
  }
  for (int64_t r = 0; r < n; ++r) {
    const int64_t s = slots[r];
    float* xs = x + ((size_t)s * F + pos) * 6;
    xs[0] = px[r]; xs[1] = py[r]; xs[2] = speed[r];
    xs[3] = sin_a[r]; xs[4] = cos_a[r]; xs[5] = 1.0f;
    present[s * F + pos] = 1;
  }

  // pairwise distances of the incoming frame over ALL slots (presence
  // masks the accumulators, exactly like the numpy outer product)
  for (int64_t i = 0; i < cap; ++i) {
    const float* xi = x + ((size_t)i * F + pos) * 6;
    const uint8_t pi = present[i * F + pos];
    for (int64_t j = 0; j < cap; ++j) {
      const size_t ij = (size_t)i * cap + j;
      const float* xj = x + ((size_t)j * F + pos) * 6;
      const float dx = xi[0] - xj[0];
      const float dy = xi[1] - xj[1];
      const float dv = sqrtf(dx * dx + dy * dy);
      dpos[ij] = dv;
      if (pi && present[j * F + pos]) {
        const double dvd = (double)dv;
        dsum[ij] += dvd;
        d2sum[ij] += dvd * dvd;
        cnt[ij] += 1;
        if (dv < dmin[ij]) { dmin[ij] = dv; dmin_pos[ij] = (int32_t)pos; }
        if (dv > dmax[ij]) { dmax[ij] = dv; dmax_pos[ij] = (int32_t)pos; }
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Incremental window edge emission (serve path, sibling of incr_push):
// extract the valid (cnt>0, dmin<=r, i!=j) pairs of the live-slot
// restriction in i-major order and compute their [dmin, dmax, dmean,
// dmsq] attributes — the numpy version is ~15 small-array dispatches
// per emitted window. dmean/dmsq divide in double then cast to float,
// matching the numpy (dsum/cnt).astype(float32). Returns the edge count.
// ---------------------------------------------------------------------------

extern "C" {

int64_t incr_window_edges(
    int64_t cap, const int64_t* sl, int64_t V, float m_radius,
    const float* dmin, const float* dmax,
    const double* dsum, const double* d2sum, const int64_t* cnt,
    int32_t* ei_src, int32_t* ei_dst, float* attr /* [V*V, 4] */) {
  int64_t k = 0;
  for (int64_t i = 0; i < V; ++i) {
    const int64_t a = sl[i];
    for (int64_t j = 0; j < V; ++j) {
      if (i == j) continue;
      const int64_t b = sl[j];
      const size_t ab = (size_t)a * cap + b;
      if (cnt[ab] <= 0 || !(dmin[ab] <= m_radius)) continue;
      // mirror the numpy argwhere(valid) i-major order exactly
      // (edge_index rows are [src=ii, dst=jj], traj_edge_fill order)
      ei_src[k] = (int32_t)i;
      ei_dst[k] = (int32_t)j;
      const double c = (double)cnt[ab];
      attr[k * 4 + 0] = dmin[ab];
      attr[k * 4 + 1] = dmax[ab];
      attr[k * 4 + 2] = (float)(dsum[ab] / c);
      attr[k * 4 + 3] = (float)(d2sum[ab] / c);
      ++k;
    }
  }
  return k;
}

}  // extern "C"
