// csremap — first-party conservative remap weight generator
// (lat-lon <-> equiangular cubed sphere).
//
// Role parity: the reference (jweyn/DLWP-CS) shells out to TempestRemap C++
// binaries (GenerateCSMesh / GenerateOverlapMesh / GenerateOfflineMap) to
// build conservative offline maps (SURVEY.md §2 row 15, §2a). This tool is
// the TPU-native framework's first-party replacement: it emits conservative
// weights as a COO sparse matrix consumed by dlwp_cs_tpu.remap (application
// itself runs in JAX on-device).
//
// Two methods:
//
//   --method exact (default): EXACT spherical overlap areas, the
//     TempestRemap-equivalent. Each cubed-sphere cell (4 great-circle
//     edges; gnomonic projection maps its edges to great circles) is
//     clipped against each candidate lat-lon cell — two meridian
//     half-spaces (great planes), then two latitude planes (z = sin(lat),
//     which introduce small-circle edges) — with a spherical
//     Sutherland-Hodgman that tracks mixed edge types. The clipped
//     polygon's area is the boundary integral of (sin(phi) - 1) d(lambda):
//     latitude arcs contribute (sin(phi)-1)*dlambda in closed form; a
//     great arc A->B contributes the signed solid angle of the triangle
//     (A, B, NorthPole) via the van Oosterom-Strackee formula (the two
//     meridian closures contribute 0). Everything is closed-form double
//     arithmetic; per-pair areas are exact to rounding. Both directions
//     come from ONE pair-area computation (ll2cs rows normalize by the CS
//     cell, cs2ll rows by the LL cell; overlap areas are symmetric).
//
//   --method sampled: first-order k x k sub-cell sampling (round-1 path,
//     kept for cross-validation): each target cell's solid angle is
//     partitioned into k x k sub-cells with exact closed-form solid
//     angles; each sub-cell's center is located in the source grid.
//
// Row sums are exactly 1 by construction in both methods; the exact method
// additionally preserves global integrals to rounding (column sums equal
// source-cell areas — tests/test_csremap_tool.py asserts ~1e-12).
//
// Geometry conventions match dlwp_cs_tpu.geometry.cubed_sphere exactly
// (same face charts, [face, i(eta), j(xi)] ordering); the cross-check test
// lives in tests/test_csremap_tool.py.
//
// Usage:
//   csremap --mode ll2cs --nlat 181 --nlon 360 --ncs 48 \
//           [--method exact|sampled] [--samples 8] [--lat-centered 0|1] \
//           --out weights.bin
//   csremap --mode cs2ll ... (same flags; source/target swap)
//
// Output format (little-endian):
//   magic  "CSRM"    (4 bytes)
//   version  u32 = 1
//   n_target u32, n_source u32, nnz u64
//   rows i32[nnz], cols i32[nnz], vals f64[nnz]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kTol = 1e-13;

struct Vec3 {
  double x, y, z;
};

Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
double dot(const Vec3& a, const Vec3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }
Vec3 normalize(const Vec3& a) {
  double n = norm(a);
  return {a.x / n, a.y / n, a.z / n};
}
Vec3 add(const Vec3& a, const Vec3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
Vec3 scale(const Vec3& a, double s) { return {a.x * s, a.y * s, a.z * s}; }

// Face charts: MUST match dlwp_cs_tpu/geometry/cubed_sphere.py.
Vec3 face_xyz(int face, double xi, double eta) {
  switch (face) {
    case 0: return {1.0, xi, eta};
    case 1: return {-xi, 1.0, eta};
    case 2: return {-1.0, -xi, eta};
    case 3: return {xi, -1.0, eta};
    case 4: return {-eta, xi, 1.0};
    default: return {eta, xi, -1.0};  // face 5
  }
}

int containing_face(const Vec3& p) {
  double ax = std::fabs(p.x), ay = std::fabs(p.y), az = std::fabs(p.z);
  if (ax >= ay && ax >= az) return p.x > 0 ? 0 : 2;
  if (ay >= ax && ay >= az) return p.y > 0 ? 1 : 3;
  return p.z > 0 ? 4 : 5;
}

// Local (xi, eta) gnomonic coordinates on `face` (chart inverses).
void face_local(int face, const Vec3& p, double* xi, double* eta) {
  switch (face) {
    case 0: *xi = p.y / p.x; *eta = p.z / p.x; return;
    case 1: *xi = -p.x / p.y; *eta = p.z / p.y; return;
    case 2: *xi = p.y / p.x; *eta = -p.z / p.x; return;
    case 3: *xi = -p.x / p.y; *eta = -p.z / p.y; return;
    case 4: *xi = p.y / p.z; *eta = -p.x / p.z; return;
    default: *xi = -p.y / p.z; *eta = -p.x / p.z; return;  // face 5
  }
}

// Antiderivative for the solid angle of a gnomonic rectangle.
double solid_angle_F(double xi, double eta) {
  return std::atan(xi * eta / std::sqrt(1.0 + xi * xi + eta * eta));
}

double rect_solid_angle(double xi1, double xi2, double eta1, double eta2) {
  return solid_angle_F(xi2, eta2) - solid_angle_F(xi1, eta2) -
         solid_angle_F(xi2, eta1) + solid_angle_F(xi1, eta1);
}

struct LatLonGrid {
  int nlat, nlon;
  bool centered;  // cell-centered (no pole rows) vs pole-inclusive nodes
  // Cell boundaries in sin(lat) for conservative areas.
  double lat_edge(int i) const {  // i in [0, nlat]
    if (centered) return -kPi / 2 + i * kPi / nlat;
    // pole-inclusive node grid: cells are midpoints between nodes, clamped
    double lo = -kPi / 2 + (i - 0.5) * kPi / (nlat - 1);
    if (i <= 0) return -kPi / 2;
    if (i >= nlat) return kPi / 2;
    return lo;
  }
  double lon_edge(int j) const {
    if (centered) return j * 2 * kPi / nlon;
    return (j - 0.5) * 2 * kPi / nlon;
  }
  int lat_index(double lat) const {
    if (centered) {
      int i = static_cast<int>(std::floor((lat + kPi / 2) / (kPi / nlat)));
      return std::min(std::max(i, 0), nlat - 1);
    }
    int i = static_cast<int>(std::lround((lat + kPi / 2) / (kPi / (nlat - 1))));
    return std::min(std::max(i, 0), nlat - 1);
  }
  int lon_index(double lon) const {
    double t = std::fmod(lon, 2 * kPi);
    if (t < 0) t += 2 * kPi;
    int j;
    if (centered) {
      j = static_cast<int>(std::floor(t / (2 * kPi / nlon)));
    } else {
      j = static_cast<int>(std::lround(t / (2 * kPi / nlon))) % nlon;
    }
    return std::min(std::max(j, 0), nlon - 1);
  }
  double cell_area(int i, int j) const {
    (void)j;
    return (std::sin(lat_edge(i + 1)) - std::sin(lat_edge(i))) * 2 * kPi / nlon;
  }
};

struct Coo {
  std::vector<int32_t> rows, cols;
  std::vector<double> vals;
};

// Accumulate (row, col, w) with per-row dedup via small linear scan.
void add_weight(std::vector<std::pair<int32_t, double>>& row_acc, int32_t col,
                double w) {
  for (auto& kv : row_acc) {
    if (kv.first == col) {
      kv.second += w;
      return;
    }
  }
  row_acc.emplace_back(col, w);
}

// ===========================================================================
// Exact spherical clipping engine
// ===========================================================================

// Spherical polygon with mixed edge types. Edge k runs from v[k] to
// v[(k+1)%n]; etype[k] == 0 means great-circle arc (the minor arc; all our
// arcs are < pi), etype[k] == 1 means latitude small-circle arc at
// z = v[k].z, travelling the SHORT way in longitude (valid because every
// polygon is first clipped to a lon wedge of width < pi).
struct SPoly {
  std::vector<Vec3> v;
  std::vector<int> etype;
  // 2 vertices is a valid LENS (arc + closing boundary arc), not empty
  bool empty() const { return v.size() < 2; }
};

// Point on the great arc from a to b at fraction of the subtended angle.
Vec3 slerp(const Vec3& a, const Vec3& b, double t) {
  double ang = std::atan2(norm(cross(a, b)), dot(a, b));
  if (ang < kTol) return a;
  double s = std::sin(ang);
  return normalize(add(scale(a, std::sin((1 - t) * ang) / s),
                       scale(b, std::sin(t * ang) / s)));
}

// Crossings of the great arc a->b with plane n.r = 0, as fractions of the
// arc angle in (0, 1); appends to ts.
void great_plane_crossings(const Vec3& a, const Vec3& b, const Vec3& n,
                           std::vector<double>* ts) {
  Vec3 u = a;
  Vec3 w = add(b, scale(a, -dot(a, b)));
  double wn = norm(w);
  if (wn < kTol) return;
  w = scale(w, 1.0 / wn);
  double T = std::atan2(norm(cross(a, b)), dot(a, b));  // arc angle
  double cu = dot(n, u), cw = dot(n, w);
  double R = std::hypot(cu, cw);
  if (R < kTol) return;  // arc lies in the plane
  // cu*cos(t) + cw*sin(t) = 0  ->  t = atan2(-cu, cw) (+ pi)
  double t0 = std::atan2(-cu, cw);
  for (double t : {t0, t0 + kPi, t0 - kPi}) {
    if (t > kTol && t < T - kTol) ts->push_back(t / T);
  }
}

// Crossings of the great arc a->b with plane z = z0 (fractions in (0,1)).
void great_z_crossings(const Vec3& a, const Vec3& b, double z0,
                       std::vector<double>* ts) {
  Vec3 u = a;
  Vec3 w = add(b, scale(a, -dot(a, b)));
  double wn = norm(w);
  if (wn < kTol) return;
  w = scale(w, 1.0 / wn);
  double T = std::atan2(norm(cross(a, b)), dot(a, b));
  double cu = u.z, cw = w.z;
  double R = std::hypot(cu, cw);
  if (R < std::fabs(z0) - kTol) return;  // never reaches the parallel
  if (R < kTol) return;
  // cu cos t + cw sin t = z0 -> R sin(t + psi) = z0, psi = atan2(cu, cw)
  double psi = std::atan2(cu, cw);
  double s = std::min(std::max(z0 / R, -1.0), 1.0);
  double base = std::asin(s);
  for (double tt : {base - psi, kPi - base - psi}) {
    for (double t : {tt, tt + 2 * kPi, tt - 2 * kPi}) {
      if (t > kTol && t < T - kTol) ts->push_back(t / T);
    }
  }
}

// Short-way longitude difference from a to b in (-pi, pi].
double dlon(const Vec3& a, const Vec3& b) {
  double d = std::atan2(b.y, b.x) - std::atan2(a.y, a.x);
  while (d > kPi) d -= 2 * kPi;
  while (d <= -kPi) d += 2 * kPi;
  return d;
}

// Point on the latitude arc from a to b (short way) at lon fraction t.
Vec3 lat_lerp(const Vec3& a, const Vec3& b, double t) {
  double la = std::atan2(a.y, a.x);
  double lon = la + t * dlon(a, b);
  double c = std::hypot(a.x, a.y);
  return {c * std::cos(lon), c * std::sin(lon), a.z};
}

// Crossings of the latitude arc a->b (z const) with plane n.r = 0
// (fractions of the lon span in (0,1)).  n is horizontal (meridian plane).
void lat_plane_crossings(const Vec3& a, const Vec3& b, const Vec3& n,
                         std::vector<double>* ts) {
  double c = std::hypot(a.x, a.y);
  if (c < kTol) return;
  double la = std::atan2(a.y, a.x);
  double D = dlon(a, b);
  if (std::fabs(D) < kTol) return;
  // n.x c cos(lon) + n.y c sin(lon) + n.z z = 0
  double A = n.x * c, B = n.y * c, C = n.z * a.z;
  double R = std::hypot(A, B);
  if (R < std::fabs(C) - kTol || R < kTol) return;
  double psi = std::atan2(A, B);  // A cos + B sin = R sin(lon + psi)
  double s = std::min(std::max(-C / R, -1.0), 1.0);
  double base = std::asin(s);
  for (double ll : {base - psi, kPi - base - psi}) {
    for (double lon : {ll, ll + 2 * kPi, ll - 2 * kPi}) {
      double t = (lon - la) / D;
      if (t > kTol && t < 1 - kTol) ts->push_back(t);
    }
  }
}

// Generic Sutherland-Hodgman on the sphere. `inside(P) >= 0` keeps P.
// `crossings(a, b, etype)` returns sorted fractions where the edge crosses
// the boundary; `point_at(a, b, etype, t)` evaluates the edge; `new_etype`
// is the type of edges created along the clip boundary.
template <typename InsideF, typename CrossF, typename PointF>
SPoly clip(const SPoly& poly, InsideF inside, CrossF crossings, PointF point_at,
           int new_etype) {
  SPoly out;
  size_t n = poly.v.size();
  if (n < 2) return out;
  // 1. collect the kept sub-segments of every edge, in boundary order
  struct Seg {
    Vec3 p0, p1;
    int et;
  };
  std::vector<Seg> segs;
  for (size_t i = 0; i < n; ++i) {
    const Vec3& A = poly.v[i];
    const Vec3& B = poly.v[(i + 1) % n];
    int et = poly.etype[i];
    std::vector<double> ts = crossings(A, B, et);
    std::sort(ts.begin(), ts.end());
    std::vector<double> knots;
    knots.push_back(0.0);
    for (double t : ts) knots.push_back(t);
    knots.push_back(1.0);
    for (size_t k = 0; k + 1 < knots.size(); ++k) {
      if (knots[k + 1] - knots[k] < 1e-12) continue;  // degenerate sliver
      double tm = 0.5 * (knots[k] + knots[k + 1]);
      if (inside(point_at(A, B, et, tm)) < 0) continue;
      Vec3 p0 = (knots[k] == 0.0) ? A : point_at(A, B, et, knots[k]);
      Vec3 p1 = (knots[k + 1] == 1.0) ? B : point_at(A, B, et, knots[k + 1]);
      if (norm(add(p0, scale(p1, -1.0))) < 1e-12) continue;
      segs.push_back({p0, p1, et});
    }
  }
  // A SINGLE kept sub-segment is a lens: the sub-arc plus one closing
  // clip-boundary edge (a latitude arc bulged over by a great arc).
  // Discarding it dropped the lens area from every column it touched.
  if (segs.empty()) return out;
  // 2. stitch: consecutive kept segments either share an endpoint (the
  // boundary continues along the original polygon) or are bridged by a
  // new clip-boundary edge.  This also handles cuts that pass exactly
  // through a polygon vertex (the endpoint-grazing case).
  for (size_t k = 0; k < segs.size(); ++k) {
    const Seg& s = segs[k];
    const Seg& nx = segs[(k + 1) % segs.size()];
    out.v.push_back(s.p0);
    out.etype.push_back(s.et);
    if (norm(add(s.p1, scale(nx.p0, -1.0))) > 1e-12) {
      out.v.push_back(s.p1);
      out.etype.push_back(new_etype);
    }
  }
  if (out.v.size() < 2) out.v.clear(), out.etype.clear();
  return out;
}

SPoly clip_great_plane(const SPoly& poly, const Vec3& n) {
  return clip(
      poly, [&](const Vec3& p) { return dot(n, p) + kTol; },
      [&](const Vec3& a, const Vec3& b, int et) {
        std::vector<double> ts;
        if (et == 0) great_plane_crossings(a, b, n, &ts);
        else lat_plane_crossings(a, b, n, &ts);
        return ts;
      },
      [&](const Vec3& a, const Vec3& b, int et, double t) {
        return et == 0 ? slerp(a, b, t) : lat_lerp(a, b, t);
      },
      0);
}

// keep z >= z0 (sign=+1) or z <= z0 (sign=-1); new edges are latitude arcs.
SPoly clip_z(const SPoly& poly, double z0, int sign) {
  return clip(
      poly, [&](const Vec3& p) { return sign * (p.z - z0) + kTol; },
      [&](const Vec3& a, const Vec3& b, int et) {
        std::vector<double> ts;
        if (et == 0) great_z_crossings(a, b, z0, &ts);
        // latitude edges are z-parallel: no crossings
        return ts;
      },
      [&](const Vec3& a, const Vec3& b, int et, double t) {
        return et == 0 ? slerp(a, b, t) : lat_lerp(a, b, t);
      },
      1);
}

// Exact area of a clipped spherical polygon via the boundary integral of
// (sin(phi) -/+ 1) dlambda.  The form (sin(phi)-1) dlambda is smooth at the
// NORTH pole (coefficient -> 0) but singular at the south; (sin(phi)+1)
// dlambda is the mirror.  Pick the closure pole by the polygon's
// hemisphere so the singular pole never touches the region (polygons are
// at most one cubed-sphere cell in size).  Latitude arcs contribute in
// closed form; a great arc A->B contributes the signed van
// Oosterom-Strackee solid angle of (B, A, pole) — the two meridian
// closures carry zero (numerically verified identity, see tests).
double spoly_area(const SPoly& poly) {
  if (poly.empty()) return 0.0;
  double zsum = 0.0;
  for (const auto& v : poly.v) zsum += v.z;
  double pz = zsum >= 0.0 ? 1.0 : -1.0;  // closure pole: far hemisphere
  const Vec3 P{0.0, 0.0, pz};
  double acc = 0.0;
  size_t n = poly.v.size();
  for (size_t i = 0; i < n; ++i) {
    const Vec3& A = poly.v[i];
    const Vec3& B = poly.v[(i + 1) % n];
    if (poly.etype[i] == 1) {
      acc += (A.z - pz) * dlon(A, B);
    } else {
      double det = dot(B, cross(A, P));
      double den = 1.0 + dot(A, B) + dot(B, P) + dot(P, A);
      acc += 2.0 * std::atan2(det, den);
    }
  }
  return std::fabs(acc);
}

// Pair-area sink: thread-local COO of (cs_cell, ll_cell, overlap_area).
struct PairSink {
  std::vector<int32_t> cs, ll;
  std::vector<double> area;
};

// Exact overlap areas between every CS cell and its candidate LL cells.
// Parallel over faces; results concatenated.
void exact_pair_areas(const LatLonGrid& g, int ncs, PairSink* out) {
  double step = (kPi / 2) / ncs;
  std::vector<PairSink> sinks(6);
  auto work = [&](int f) {
    PairSink& sink = sinks[f];
    for (int i = 0; i < ncs; ++i) {
      for (int j = 0; j < ncs; ++j) {
        double a1 = -kPi / 4 + j * step, a2 = a1 + step;  // xi angles
        double b1 = -kPi / 4 + i * step, b2 = b1 + step;  // eta angles
        double x1 = std::tan(a1), x2 = std::tan(a2);
        double e1 = std::tan(b1), e2 = std::tan(b2);
        SPoly cell;
        cell.v = {normalize(face_xyz(f, x1, e1)), normalize(face_xyz(f, x2, e1)),
                  normalize(face_xyz(f, x2, e2)), normalize(face_xyz(f, x1, e2))};
        cell.etype = {0, 0, 0, 0};
        // lat/lon bounding box by sampling the 4 edges
        bool has_pole =
            (f == 4 || f == 5) && x1 < kTol && x2 > -kTol && e1 < kTol && e2 > -kTol;
        double lat_lo = kPi, lat_hi = -kPi;
        double lon_c = 0.0;  // wrap-reference longitude (first corner)
        double lon_lo = kPi, lon_hi = -kPi;
        const int M = 16;
        bool first = true;
        for (int e = 0; e < 4; ++e) {
          const Vec3& A = cell.v[e];
          const Vec3& B = cell.v[(e + 1) % 4];
          for (int m = 0; m <= M; ++m) {
            Vec3 p = slerp(A, B, double(m) / M);
            double lat = std::asin(std::min(std::max(p.z, -1.0), 1.0));
            double lon = std::atan2(p.y, p.x);
            lat_lo = std::min(lat_lo, lat);
            lat_hi = std::max(lat_hi, lat);
            if (first) {
              lon_c = lon;
              first = false;
            }
            double d = lon - lon_c;
            while (d > kPi) d -= 2 * kPi;
            while (d <= -kPi) d += 2 * kPi;
            lon_lo = std::min(lon_lo, d);
            lon_hi = std::max(lon_hi, d);
          }
        }
        if (has_pole) {
          if (f == 4) lat_hi = kPi / 2;
          else lat_lo = -kPi / 2;
          lon_lo = -kPi;
          lon_hi = kPi;
        }
        int cs_idx = (f * ncs + i) * ncs + j;
        // candidate LL index windows (+margin; sampling is approximate)
        int i_lo = std::max(0, g.lat_index(lat_lo) - 1);
        int i_hi = std::min(g.nlat - 1, g.lat_index(lat_hi) + 1);
        double lon_step = 2 * kPi / g.nlon;
        int width = std::min<int>(
            g.nlon, static_cast<int>((lon_hi - lon_lo) / lon_step) + 4);
        int j_c = g.lon_index(lon_c + lon_lo);
        for (int ii = i_lo; ii <= i_hi; ++ii) {
          double zlo = std::sin(g.lat_edge(ii));
          double zhi = std::sin(g.lat_edge(ii + 1));
          for (int jo = 0; jo < width; ++jo) {
            int jj = (j_c + jo) % g.nlon;
            double l1 = g.lon_edge(jj), l2 = g.lon_edge(jj + 1);
            // meridian half-space normals: keep lon in [l1, l2]
            Vec3 n1{-std::sin(l1), std::cos(l1), 0.0};   // east of l1
            Vec3 n2{std::sin(l2), -std::cos(l2), 0.0};   // west of l2
            SPoly p = clip_great_plane(cell, n1);
            if (p.empty()) continue;
            p = clip_great_plane(p, n2);
            if (p.empty()) continue;
            p = clip_z(p, zlo, +1);
            if (p.empty()) continue;
            p = clip_z(p, zhi, -1);
            if (p.empty()) continue;
            double area = spoly_area(p);
            if (area > 1e-16) {
              sink.cs.push_back(cs_idx);
              sink.ll.push_back(ii * g.nlon + jj);
              sink.area.push_back(area);
            }
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int f = 0; f < 6; ++f) threads.emplace_back(work, f);
  for (auto& th : threads) th.join();
  for (auto& s : sinks) {
    out->cs.insert(out->cs.end(), s.cs.begin(), s.cs.end());
    out->ll.insert(out->ll.end(), s.ll.begin(), s.ll.end());
    out->area.insert(out->area.end(), s.area.begin(), s.area.end());
  }
}

// Assemble normalized COO from pair areas. target_is_cs selects direction.
Coo pairs_to_coo(const PairSink& pairs, int n_cs_cells, int n_ll_cells,
                 bool target_is_cs) {
  int n_t = target_is_cs ? n_cs_cells : n_ll_cells;
  std::vector<std::vector<std::pair<int32_t, double>>> rows(n_t);
  for (size_t k = 0; k < pairs.area.size(); ++k) {
    int32_t r = target_is_cs ? pairs.cs[k] : pairs.ll[k];
    int32_t c = target_is_cs ? pairs.ll[k] : pairs.cs[k];
    add_weight(rows[r], c, pairs.area[k]);
  }
  Coo out;
  for (int r = 0; r < n_t; ++r) {
    double total = 0.0;
    for (auto& kv : rows[r]) total += kv.second;
    if (total <= 0.0) continue;  // e.g. unused: shouldn't happen (full cover)
    for (auto& kv : rows[r]) {
      out.rows.push_back(r);
      out.cols.push_back(kv.first);
      out.vals.push_back(kv.second / total);
    }
  }
  return out;
}

// ===========================================================================
// Sampled (first-order) method — round-1 path, kept for cross-validation
// ===========================================================================

// ll2cs: target = CS cells, source = LL cells.
Coo build_ll2cs_sampled(const LatLonGrid& g, int ncs, int k) {
  int n_t = 6 * ncs * ncs;
  std::vector<std::vector<std::pair<int32_t, double>>> rows(n_t);
  double step = (kPi / 2) / ncs;
  auto work = [&](int f0, int f1) {
    for (int f = f0; f < f1; ++f) {
      for (int i = 0; i < ncs; ++i) {      // eta rows
        for (int j = 0; j < ncs; ++j) {    // xi cols
          int row = (f * ncs + i) * ncs + j;
          double a0 = -kPi / 4 + j * step, b0 = -kPi / 4 + i * step;
          auto& acc = rows[row];
          double total = 0.0;
          for (int si = 0; si < k; ++si) {
            for (int sj = 0; sj < k; ++sj) {
              double xi1 = std::tan(a0 + sj * step / k);
              double xi2 = std::tan(a0 + (sj + 1) * step / k);
              double eta1 = std::tan(b0 + si * step / k);
              double eta2 = std::tan(b0 + (si + 1) * step / k);
              double w = rect_solid_angle(xi1, xi2, eta1, eta2);
              double xm = std::tan(a0 + (sj + 0.5) * step / k);
              double em = std::tan(b0 + (si + 0.5) * step / k);
              Vec3 p = face_xyz(f, xm, em);
              double r = std::sqrt(p.x * p.x + p.y * p.y + p.z * p.z);
              double lat = std::asin(p.z / r);
              double lon = std::atan2(p.y, p.x);
              int32_t col = g.lat_index(lat) * g.nlon + g.lon_index(lon);
              add_weight(acc, col, w);
              total += w;
            }
          }
          for (auto& kv : acc) kv.second /= total;
        }
      }
    }
  };
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> threads;
  // parallel over faces (6)
  for (unsigned t = 0; t < std::min(nt, 6u); ++t) {
    int f0 = t, f1 = t + 1;
    threads.emplace_back(work, f0, f1);
  }
  for (unsigned f = threads.size(); f < 6; ++f) work(f, f + 1);
  for (auto& th : threads) th.join();
  Coo out;
  for (int r = 0; r < n_t; ++r)
    for (auto& kv : rows[r]) {
      out.rows.push_back(r);
      out.cols.push_back(kv.first);
      out.vals.push_back(kv.second);
    }
  return out;
}

// cs2ll: target = LL cells, source = CS cells. Sample uniformly in
// (sin(lat), lon) — exactly area-uniform — k x k per LL cell.
Coo build_cs2ll_sampled(const LatLonGrid& g, int ncs, int k) {
  int n_t = g.nlat * g.nlon;
  std::vector<std::vector<std::pair<int32_t, double>>> rows(n_t);
  auto work = [&](int i0, int i1) {
    for (int i = i0; i < i1; ++i) {
      double s1 = std::sin(g.lat_edge(i)), s2 = std::sin(g.lat_edge(i + 1));
      for (int j = 0; j < g.nlon; ++j) {
        double l1 = g.lon_edge(j), l2 = g.lon_edge(j + 1);
        int row = i * g.nlon + j;
        auto& acc = rows[row];
        double wsub = 1.0 / (k * k);
        for (int si = 0; si < k; ++si) {
          double s = s1 + (s2 - s1) * (si + 0.5) / k;
          double lat = std::asin(std::min(std::max(s, -1.0), 1.0));
          for (int sj = 0; sj < k; ++sj) {
            double lon = l1 + (l2 - l1) * (sj + 0.5) / k;
            Vec3 p{std::cos(lat) * std::cos(lon), std::cos(lat) * std::sin(lon),
                   std::sin(lat)};
            int f = containing_face(p);
            double xi, eta;
            face_local(f, p, &xi, &eta);
            double step = (kPi / 2) / ncs;
            int cj = static_cast<int>(
                std::floor((std::atan(xi) + kPi / 4) / step));
            int ci = static_cast<int>(
                std::floor((std::atan(eta) + kPi / 4) / step));
            cj = std::min(std::max(cj, 0), ncs - 1);
            ci = std::min(std::max(ci, 0), ncs - 1);
            int32_t col = (f * ncs + ci) * ncs + cj;
            add_weight(acc, col, wsub);
          }
        }
      }
    }
  };
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min<unsigned>(nt, g.nlat);
  std::vector<std::thread> threads;
  int chunk = (g.nlat + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int i0 = t * chunk, i1 = std::min<int>(g.nlat, i0 + chunk);
    if (i0 >= i1) break;
    threads.emplace_back(work, i0, i1);
  }
  for (auto& th : threads) th.join();
  Coo out;
  for (int r = 0; r < n_t; ++r)
    for (auto& kv : rows[r]) {
      out.rows.push_back(r);
      out.cols.push_back(kv.first);
      out.vals.push_back(kv.second);
    }
  return out;
}

bool write_coo(const char* path, const Coo& coo, uint32_t n_t, uint32_t n_s) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  uint32_t version = 1;
  uint64_t nnz = coo.rows.size();
  // every fwrite checked: a disk-full short write must NOT exit 0 with a
  // truncated weight file (a pipeline checking the exit code would cache it)
  bool ok = std::fwrite("CSRM", 1, 4, f) == 4 &&
            std::fwrite(&version, 4, 1, f) == 1 &&
            std::fwrite(&n_t, 4, 1, f) == 1 &&
            std::fwrite(&n_s, 4, 1, f) == 1 &&
            std::fwrite(&nnz, 8, 1, f) == 1 &&
            std::fwrite(coo.rows.data(), 4, nnz, f) == nnz &&
            std::fwrite(coo.cols.data(), 4, nnz, f) == nnz &&
            std::fwrite(coo.vals.data(), 8, nnz, f) == nnz;
  ok = (std::fclose(f) == 0) && ok;
  return ok;
}

// Clip-engine self-test (run with --selftest-clip): a quad whose top edge
// is a great arc between two same-latitude points BULGES poleward of them;
// clipping at a z0 between the endpoint latitude and the arc apex keeps a
// LENS bounded by one arc sub-segment plus one latitude closing arc — the
// single-kept-segment case the engine used to silently drop.  PASS iff the
// two half-areas partition the quad to machine precision.
int selftest_clip() {
  auto ll = [](double lat_deg, double lon_deg) -> Vec3 {
    double la = lat_deg * kPi / 180.0, lo = lon_deg * kPi / 180.0;
    return {std::cos(la) * std::cos(lo), std::cos(la) * std::sin(lo),
            std::sin(la)};
  };
  SPoly quad;
  quad.v = {ll(20, -30), ll(20, 30), ll(40, 30), ll(40, -30)};
  quad.etype = {0, 0, 0, 0};
  // arc apex between (40, +-30): tan(apex) = tan(40)/cos(30) -> ~44.1 deg
  double z0 = std::sin(42.0 * kPi / 180.0);
  SPoly lens = clip_z(quad, z0, +1);
  SPoly rest = clip_z(quad, z0, -1);
  double a_full = spoly_area(quad);
  double a_lens = spoly_area(lens);
  double a_rest = spoly_area(rest);
  double defect = std::fabs(a_lens + a_rest - a_full);
  bool ok = a_lens > 1e-6 && defect < 1e-12;
  std::fprintf(stderr,
               "selftest-clip: lens=%.6e rest=%.6e full=%.6e defect=%.3e %s\n",
               a_lens, a_rest, a_full, defect, ok ? "PASS" : "FAIL");
  return ok ? 0 : 1;
}

}  // namespace

int main(int argc, char** argv) {
  std::string mode, out_path, method = "exact";
  int nlat = 0, nlon = 0, ncs = 0, samples = 8;
  bool centered = true;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* { return (i + 1 < argc) ? argv[++i] : ""; };
    if (a == "--selftest-clip") return selftest_clip();
    if (a == "--mode") mode = next();
    else if (a == "--nlat") nlat = std::atoi(next());
    else if (a == "--nlon") nlon = std::atoi(next());
    else if (a == "--ncs") ncs = std::atoi(next());
    else if (a == "--samples") samples = std::atoi(next());
    else if (a == "--method") method = next();
    else if (a == "--lat-centered") centered = std::atoi(next()) != 0;
    else if (a == "--out") out_path = next();
    else {
      std::fprintf(stderr, "unknown flag %s\n", a.c_str());
      return 2;
    }
  }
  if ((mode != "ll2cs" && mode != "cs2ll") || nlat < 2 || nlon < 4 ||
      ncs < 2 || samples < 1 || out_path.empty() ||
      (method != "exact" && method != "sampled")) {
    std::fprintf(stderr,
                 "usage: csremap --mode ll2cs|cs2ll --nlat H --nlon W "
                 "--ncs N [--method exact|sampled] [--samples k] "
                 "[--lat-centered 0|1] --out FILE\n");
    return 2;
  }
  LatLonGrid g{nlat, nlon, centered};
  Coo coo;
  uint32_t n_t, n_s;
  uint32_t n_cs_cells = 6u * ncs * ncs;
  uint32_t n_ll_cells = static_cast<uint32_t>(nlat) * nlon;
  if (method == "exact") {
    PairSink pairs;
    exact_pair_areas(g, ncs, &pairs);
    coo = pairs_to_coo(pairs, n_cs_cells, n_ll_cells, mode == "ll2cs");
  } else if (mode == "ll2cs") {
    coo = build_ll2cs_sampled(g, ncs, samples);
  } else {
    coo = build_cs2ll_sampled(g, ncs, samples);
  }
  if (mode == "ll2cs") {
    n_t = n_cs_cells;
    n_s = n_ll_cells;
  } else {
    n_t = n_ll_cells;
    n_s = n_cs_cells;
  }
  if (!write_coo(out_path.c_str(), coo, n_t, n_s)) {
    std::fprintf(stderr, "cannot write %s\n", out_path.c_str());
    return 1;
  }
  std::fprintf(stderr,
               "csremap: %s/%s n_target=%u n_source=%u nnz=%zu -> %s\n",
               mode.c_str(), method.c_str(), n_t, n_s, coo.rows.size(),
               out_path.c_str());
  return 0;
}
