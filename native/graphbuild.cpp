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
