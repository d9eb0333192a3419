// csremap — first-party conservative remap weight generator
// (lat-lon <-> equiangular cubed sphere).
//
// Role parity: the reference (jweyn/DLWP-CS) shells out to TempestRemap C++
// binaries (GenerateCSMesh / GenerateOverlapMesh / GenerateOfflineMap) to
// build conservative offline maps (SURVEY.md §2 row 15, §2a). This tool is
// the TPU-native framework's first-party replacement: it emits first-order
// conservative weights as a COO sparse matrix consumed by
// dlwp_cs_tpu.remap (application itself runs in JAX on-device).
//
// Method: each *target* cell's solid angle is partitioned into k x k
// sub-cells with exact closed-form solid angles; each sub-cell's center is
// located in the *source* grid, and its exact area fraction becomes the
// weight. Row sums are exactly 1 by construction (first-order conservative;
// exact polygon clipping a la TempestRemap is a planned refinement).
//
// Geometry conventions match dlwp_cs_tpu.geometry.cubed_sphere exactly
// (same face charts, [face, i(eta), j(xi)] ordering); the cross-check test
// lives in tests/test_csremap_tool.py.
//
// Usage:
//   csremap --mode ll2cs --nlat 181 --nlon 360 --ncs 48 \
//           [--samples 8] [--lat-centered 0|1] --out weights.bin
//   csremap --mode cs2ll ... (same flags; source/target swap)
//
// Output format (little-endian):
//   magic  "CSRM"    (4 bytes)
//   version  u32 = 1
//   n_target u32, n_source u32, nnz u64
//   rows i32[nnz], cols i32[nnz], vals f64[nnz]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct Vec3 {
  double x, y, z;
};

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

// ll2cs: target = CS cells, source = LL cells.
Coo build_ll2cs(const LatLonGrid& g, int ncs, int k) {
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
Coo build_cs2ll(const LatLonGrid& g, int ncs, int k) {
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
  std::fwrite("CSRM", 1, 4, f);
  std::fwrite(&version, 4, 1, f);
  std::fwrite(&n_t, 4, 1, f);
  std::fwrite(&n_s, 4, 1, f);
  std::fwrite(&nnz, 8, 1, f);
  std::fwrite(coo.rows.data(), 4, nnz, f);
  std::fwrite(coo.cols.data(), 4, nnz, f);
  std::fwrite(coo.vals.data(), 8, nnz, f);
  std::fclose(f);
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  std::string mode, out_path;
  int nlat = 0, nlon = 0, ncs = 0, samples = 8;
  bool centered = true;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> const char* { return (i + 1 < argc) ? argv[++i] : ""; };
    if (a == "--mode") mode = next();
    else if (a == "--nlat") nlat = std::atoi(next());
    else if (a == "--nlon") nlon = std::atoi(next());
    else if (a == "--ncs") ncs = std::atoi(next());
    else if (a == "--samples") samples = std::atoi(next());
    else if (a == "--lat-centered") centered = std::atoi(next()) != 0;
    else if (a == "--out") out_path = next();
    else {
      std::fprintf(stderr, "unknown flag %s\n", a.c_str());
      return 2;
    }
  }
  if ((mode != "ll2cs" && mode != "cs2ll") || nlat < 2 || nlon < 4 ||
      ncs < 2 || samples < 1 || out_path.empty()) {
    std::fprintf(stderr,
                 "usage: csremap --mode ll2cs|cs2ll --nlat H --nlon W "
                 "--ncs N [--samples k] [--lat-centered 0|1] --out FILE\n");
    return 2;
  }
  LatLonGrid g{nlat, nlon, centered};
  Coo coo;
  uint32_t n_t, n_s;
  if (mode == "ll2cs") {
    coo = build_ll2cs(g, ncs, samples);
    n_t = 6u * ncs * ncs;
    n_s = static_cast<uint32_t>(nlat) * nlon;
  } else {
    coo = build_cs2ll(g, ncs, samples);
    n_t = static_cast<uint32_t>(nlat) * nlon;
    n_s = 6u * ncs * ncs;
  }
  if (!write_coo(out_path.c_str(), coo, n_t, n_s)) {
    std::fprintf(stderr, "cannot write %s\n", out_path.c_str());
    return 1;
  }
  std::fprintf(stderr, "csremap: %s n_target=%u n_source=%u nnz=%zu -> %s\n",
               mode.c_str(), n_t, n_s, coo.rows.size(), out_path.c_str());
  return 0;
}
