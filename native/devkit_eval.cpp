// Standalone KITTI devkit-protocol evaluator (independent oracle).
//
// A from-scratch C++ twin of the official KITTI devkit
// (ref:kitti_split1/devkit/cpp/evaluate_object.cpp:41-944): same
// difficulty gates, ignore semantics, greedy matching, 41-point recall
// discretization and precision envelope — implemented independently of
// m3dssd_tpu/eval/ (different polygon clipper: Sutherland-Hodgman here vs
// corner-test + fan triangulation there) so the two paths cross-check each
// other rather than sharing a re-derivation.
//
// Deviations from the literal devkit (documented, both match eval.py):
//   * DontCare areas absorb unmatched detections only for the IMAGE metric;
//     the devkit also runs its dc loop for GROUND/BOX3D where DontCare rows
//     have degenerate 3D fields (-1000/-1) and the overlap is meaningless.
//   * AP is reported directly (AP11 = mean of envelope samples 0,4,..,40;
//     AP-R40 = mean of samples 1..40) instead of writing gnuplot files.
//
// Usage: devkit_eval <gt_dir> <dt_dir>
// Output lines: "<Class> <image|ground|box3d|aos> <AP11 e> <m> <h> <R40 e> <m> <h>"
//
// Build: g++ -O3 -std=c++17 -o devkit_eval devkit_eval.cpp

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <numeric>
#include <string>
#include <vector>

namespace {

constexpr int N_SAMPLE_PTS = 41;
constexpr double NO_DETECTION = -10000000.0;
const int MIN_HEIGHT[3] = {40, 25, 25};
const int MAX_OCCLUSION[3] = {0, 1, 2};
const double MAX_TRUNCATION[3] = {0.15, 0.3, 0.5};
const char* CLASS_NAMES[3] = {"car", "pedestrian", "cyclist"};
// min overlap per (metric, class); all rows identical in the devkit
const double MIN_OVERLAP[3][3] = {
    {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}};

enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

struct Obj {
  std::string type;
  double truncation, occlusion, alpha;
  double x1, y1, x2, y2;       // 2D box
  double h, w, l;              // dimensions
  double t1, t2, t3;           // location (camera: x, y, z)
  double ry;
  double thresh;               // detection score (gt: unused)
};

std::string lower(std::string s) {
  for (auto& c : s) c = std::tolower(c);
  return s;
}

// ---------------------------------------------------------------- parsing

std::vector<Obj> load_objects(const std::string& path, bool is_det) {
  std::vector<Obj> out;
  FILE* fp = std::fopen(path.c_str(), "r");
  if (!fp) return out;
  char line[1024];
  while (std::fgets(line, sizeof(line), fp)) {
    Obj o{};
    char type[128];
    double trash;
    int n;
    if (is_det) {
      n = std::sscanf(line,
                      "%127s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                      "%lf %lf %lf",
                      type, &trash, &trash, &o.alpha, &o.x1, &o.y1, &o.x2,
                      &o.y2, &o.h, &o.w, &o.l, &o.t1, &o.t2, &o.t3, &o.ry,
                      &o.thresh);
      if (n < 16) continue;
    } else {
      n = std::sscanf(line,
                      "%127s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                      "%lf %lf",
                      type, &o.truncation, &o.occlusion, &o.alpha, &o.x1,
                      &o.y1, &o.x2, &o.y2, &o.h, &o.w, &o.l, &o.t1, &o.t2,
                      &o.t3, &o.ry);
      if (n < 15) continue;
    }
    o.type = type;
    out.push_back(o);
  }
  std::fclose(fp);
  return out;
}

// --------------------------------------------------------------- overlaps

double image_overlap(const Obj& a, const Obj& b, int criterion) {
  const double x1 = std::max(a.x1, b.x1), y1 = std::max(a.y1, b.y1);
  const double x2 = std::min(a.x2, b.x2), y2 = std::min(a.y2, b.y2);
  const double iw = x2 - x1, ih = y2 - y1;
  if (iw <= 0 || ih <= 0) return 0.0;
  const double inter = iw * ih;
  const double aa = (a.x2 - a.x1) * (a.y2 - a.y1);
  const double bb = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / aa;
  if (criterion == 1) return inter / bb;
  return inter / (aa + bb - inter);
}

struct P2 { double x, y; };

// BEV footprint corners in the (x, z) ground plane (devkit toPolygon)
std::vector<P2> bev_poly(const Obj& g) {
  const double c = std::cos(g.ry), s = std::sin(g.ry);
  const double lx[4] = {g.l / 2, g.l / 2, -g.l / 2, -g.l / 2};
  const double lz[4] = {g.w / 2, -g.w / 2, -g.w / 2, g.w / 2};
  std::vector<P2> p(4);
  for (int i = 0; i < 4; ++i) {
    p[i].x = c * lx[i] + s * lz[i] + g.t1;
    p[i].y = -s * lx[i] + c * lz[i] + g.t3;
  }
  return p;
}

double poly_area(const std::vector<P2>& p) {
  double a = 0;
  for (size_t i = 0, n = p.size(); i < n; ++i) {
    const P2& u = p[i];
    const P2& v = p[(i + 1) % n];
    a += u.x * v.y - v.x * u.y;
  }
  return std::fabs(a) / 2.0;
}

// Sutherland-Hodgman: clip convex subject polygon by convex clip polygon
std::vector<P2> clip_convex(std::vector<P2> subject,
                            const std::vector<P2>& clip) {
  // clip polygon orientation (signed area) decides the inside half-plane
  double sa = 0;
  for (size_t i = 0, n = clip.size(); i < n; ++i)
    sa += clip[i].x * clip[(i + 1) % n].y - clip[(i + 1) % n].x * clip[i].y;
  const double orient = sa >= 0 ? 1.0 : -1.0;

  for (size_t i = 0, n = clip.size(); i < n && !subject.empty(); ++i) {
    const P2 A = clip[i], B = clip[(i + 1) % n];
    auto side = [&](const P2& p) {
      return orient *
             ((B.x - A.x) * (p.y - A.y) - (B.y - A.y) * (p.x - A.x));
    };
    std::vector<P2> out;
    for (size_t j = 0, m = subject.size(); j < m; ++j) {
      const P2 P = subject[j], Q = subject[(j + 1) % m];
      const double sp = side(P), sq = side(Q);
      if (sp >= 0) out.push_back(P);
      if ((sp > 0 && sq < 0) || (sp < 0 && sq > 0)) {
        const double t = sp / (sp - sq);
        out.push_back({P.x + t * (Q.x - P.x), P.y + t * (Q.y - P.y)});
      }
    }
    subject = std::move(out);
  }
  return subject;
}

double ground_overlap(const Obj& d, const Obj& g, int criterion) {
  const auto dp = bev_poly(d), gp = bev_poly(g);
  const double inter = poly_area(clip_convex(dp, gp));
  const double da = poly_area(dp), ga = poly_area(gp);
  if (criterion == 0) return inter / da;
  if (criterion == 1) return inter / ga;
  return inter / (da + ga - inter);
}

double box3d_overlap(const Obj& d, const Obj& g, int criterion) {
  const auto dp = bev_poly(d), gp = bev_poly(g);
  const double inter_area = poly_area(clip_convex(dp, gp));
  const double ymax = std::min(d.t2, g.t2);
  const double ymin = std::max(d.t2 - d.h, g.t2 - g.h);
  const double inter = inter_area * std::max(0.0, ymax - ymin);
  const double dv = d.h * d.l * d.w, gv = g.h * g.l * g.w;
  if (criterion == 0) return inter / dv;
  if (criterion == 1) return inter / gv;
  return inter / (dv + gv - inter);
}

double overlap(const Obj& d, const Obj& g, Metric metric, int criterion) {
  switch (metric) {
    case IMAGE: return image_overlap(d, g, criterion);
    case GROUND: return ground_overlap(d, g, criterion);
    default: return box3d_overlap(d, g, criterion);
  }
}

// ---------------------------------------------------------------- protocol

std::vector<double> get_thresholds(std::vector<double> v, double n_gt) {
  std::sort(v.begin(), v.end(), std::greater<double>());
  std::vector<double> t;
  double current_recall = 0;
  for (size_t i = 0; i < v.size(); ++i) {
    const double l_recall = (i + 1) / n_gt;
    const double r_recall =
        (i < v.size() - 1) ? (i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < v.size() - 1)
      continue;
    t.push_back(v[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

void clean_data(int cls, const std::vector<Obj>& gt,
                const std::vector<Obj>& det, std::vector<int>& ignored_gt,
                std::vector<Obj>& dc, std::vector<int>& ignored_det,
                int& n_gt, int difficulty) {
  for (const auto& g : gt) {
    const double height = g.y2 - g.y1;
    int valid_class;
    const std::string t = lower(g.type);
    if (t == CLASS_NAMES[cls])
      valid_class = 1;
    else if (cls == 1 && t == "person_sitting")
      valid_class = 0;
    else if (cls == 0 && t == "van")
      valid_class = 0;
    else
      valid_class = -1;
    const bool ignore = g.occlusion > MAX_OCCLUSION[difficulty] ||
                        g.truncation > MAX_TRUNCATION[difficulty] ||
                        height <= MIN_HEIGHT[difficulty];
    if (valid_class == 1 && !ignore) {
      ignored_gt.push_back(0);
      n_gt++;
    } else if (valid_class == 0 || (ignore && valid_class == 1)) {
      ignored_gt.push_back(1);
    } else {
      ignored_gt.push_back(-1);
    }
  }
  for (const auto& g : gt)
    if (lower(g.type) == "dontcare") dc.push_back(g);
  for (const auto& d : det) {
    const int valid_class = lower(d.type) == CLASS_NAMES[cls] ? 1 : -1;
    const int height = static_cast<int>(std::fabs(d.y1 - d.y2));
    if (height < MIN_HEIGHT[difficulty])
      ignored_det.push_back(1);
    else if (valid_class == 1)
      ignored_det.push_back(0);
    else
      ignored_det.push_back(-1);
  }
}

struct PrData {
  double similarity = 0;
  std::vector<double> v;
  int tp = 0, fp = 0, fn = 0;
};

PrData compute_statistics(int cls, const std::vector<Obj>& gt,
                          const std::vector<Obj>& det,
                          const std::vector<Obj>& dc,
                          const std::vector<int>& ignored_gt,
                          const std::vector<int>& ignored_det,
                          bool compute_fp, Metric metric, bool compute_aos,
                          double thresh) {
  PrData stat;
  std::vector<double> delta;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> ignored_threshold(det.size(), false);
  if (compute_fp)
    for (size_t i = 0; i < det.size(); ++i)
      if (det[i].thresh < thresh) ignored_threshold[i] = true;

  for (size_t i = 0; i < gt.size(); ++i) {
    if (ignored_gt[i] == -1) continue;
    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ignored_threshold[j])
        continue;
      const double ol = overlap(det[j], gt[i], metric, -1);
      const double min_ol = MIN_OVERLAP[metric][cls];
      if (!compute_fp && ol > min_ol && det[j].thresh > valid_detection) {
        det_idx = static_cast<int>(j);
        valid_detection = det[j].thresh;
      } else if (compute_fp && ol > min_ol &&
                 (ol > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = ol;
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && ol > min_ol &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }

    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      stat.fn++;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      stat.tp++;
      stat.v.push_back(det[det_idx].thresh);
      if (compute_aos) delta.push_back(gt[i].alpha - det[det_idx].alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t i = 0; i < det.size(); ++i)
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1 ||
            ignored_threshold[i]))
        stat.fp++;
    // DontCare absorption — IMAGE metric only (see file header)
    int nstuff = 0;
    if (metric == IMAGE) {
      for (const auto& d : dc) {
        for (size_t j = 0; j < det.size(); ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ignored_threshold[j])
            continue;
          if (image_overlap(det[j], d, 0) > MIN_OVERLAP[metric][cls]) {
            assigned[j] = true;
            nstuff++;
          }
        }
      }
    }
    stat.fp -= nstuff;
    if (compute_aos) {
      std::vector<double> tmp(stat.fp, 0.0);
      for (double d : delta) tmp.push_back((1.0 + std::cos(d)) / 2.0);
      if (stat.tp > 0 || stat.fp > 0)
        stat.similarity = std::accumulate(tmp.begin(), tmp.end(), 0.0);
      else
        stat.similarity = -1;
    }
  }
  return stat;
}

bool eval_class(int cls, const std::vector<std::vector<Obj>>& groundtruth,
                const std::vector<std::vector<Obj>>& detections,
                bool compute_aos, std::vector<double>& precision,
                std::vector<double>& aos, int difficulty, Metric metric) {
  int n_gt = 0;
  std::vector<double> v;
  std::vector<std::vector<int>> ignored_gt, ignored_det;
  std::vector<std::vector<Obj>> dontcare;

  for (size_t i = 0; i < groundtruth.size(); ++i) {
    std::vector<int> i_gt, i_det;
    std::vector<Obj> dc;
    clean_data(cls, groundtruth[i], detections[i], i_gt, dc, i_det, n_gt,
               difficulty);
    ignored_gt.push_back(i_gt);
    ignored_det.push_back(i_det);
    dontcare.push_back(dc);
    PrData pr = compute_statistics(cls, groundtruth[i], detections[i], dc,
                                   i_gt, i_det, false, metric, false, 0);
    for (double s : pr.v) v.push_back(s);
  }
  if (n_gt == 0) return false;

  const std::vector<double> thresholds = get_thresholds(v, n_gt);
  std::vector<PrData> pr(thresholds.size());
  for (size_t i = 0; i < groundtruth.size(); ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      PrData tmp = compute_statistics(
          cls, groundtruth[i], detections[i], dontcare[i], ignored_gt[i],
          ignored_det[i], true, metric, compute_aos, thresholds[t]);
      pr[t].tp += tmp.tp;
      pr[t].fp += tmp.fp;
      pr[t].fn += tmp.fn;
      if (tmp.similarity != -1) pr[t].similarity += tmp.similarity;
    }
  }

  precision.assign(N_SAMPLE_PTS, 0);
  if (compute_aos) aos.assign(N_SAMPLE_PTS, 0);
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] = pr[i].tp / double(pr[i].tp + pr[i].fp);
    if (compute_aos) aos[i] = pr[i].similarity / double(pr[i].tp + pr[i].fp);
  }
  for (size_t i = 0; i < thresholds.size(); ++i) {
    precision[i] =
        *std::max_element(precision.begin() + i, precision.end());
    if (compute_aos)
      aos[i] = *std::max_element(aos.begin() + i, aos.end());
  }
  return true;
}

double ap11(const std::vector<double>& prec) {
  double s = 0;
  for (int i = 0; i < N_SAMPLE_PTS; i += 4) s += prec[i];
  return s / 11.0 * 100.0;
}

double ap_r40(const std::vector<double>& prec) {
  double s = 0;
  for (int i = 1; i < N_SAMPLE_PTS; ++i) s += prec[i];
  return s / 40.0 * 100.0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <gt_dir> <dt_dir>\n", argv[0]);
    return 2;
  }
  const std::string gt_dir = argv[1], dt_dir = argv[2];

  // image ids = 6-digit txts present in the detection dir
  std::vector<std::string> ids;
  if (DIR* d = opendir(dt_dir.c_str())) {
    while (dirent* e = readdir(d)) {
      const std::string n = e->d_name;
      if (n.size() == 10 && n.substr(6) == ".txt" &&
          n.find_first_not_of("0123456789") == 6)
        ids.push_back(n.substr(0, 6));
    }
    closedir(d);
  }
  std::sort(ids.begin(), ids.end());
  if (ids.empty()) {
    std::fprintf(stderr, "no result files in %s\n", dt_dir.c_str());
    return 2;
  }

  std::vector<std::vector<Obj>> gt, dt;
  bool compute_aos = true;
  for (const auto& id : ids) {
    gt.push_back(load_objects(gt_dir + "/" + id + ".txt", false));
    dt.push_back(load_objects(dt_dir + "/" + id + ".txt", true));
    for (const auto& o : dt.back())
      if (o.alpha == -10) compute_aos = false;
  }

  const char* CLASS_PRINT[3] = {"Car", "Pedestrian", "Cyclist"};
  const char* METRIC_PRINT[3] = {"image", "ground", "box3d"};
  for (int cls = 0; cls < 3; ++cls) {
    for (int metric = 0; metric < 3; ++metric) {
      const bool aos_here = compute_aos && metric == IMAGE;
      std::vector<double> p[3], a[3];
      bool ok = true;
      for (int diff = 0; diff < 3 && ok; ++diff)
        ok = eval_class(cls, gt, dt, aos_here, p[diff], a[diff], diff,
                        static_cast<Metric>(metric));
      if (!ok) continue;
      std::printf("%s %s %.6f %.6f %.6f %.6f %.6f %.6f\n", CLASS_PRINT[cls],
                  METRIC_PRINT[metric], ap11(p[0]), ap11(p[1]), ap11(p[2]),
                  ap_r40(p[0]), ap_r40(p[1]), ap_r40(p[2]));
      if (aos_here)
        std::printf("%s aos %.6f %.6f %.6f %.6f %.6f %.6f\n", CLASS_PRINT[cls],
                    ap11(a[0]), ap11(a[1]), ap11(a[2]), ap_r40(a[0]),
                    ap_r40(a[1]), ap_r40(a[2]));
    }
  }
  return 0;
}
