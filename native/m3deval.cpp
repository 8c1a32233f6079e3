// Native KITTI evaluation kernels: rotated-rectangle IoU and the greedy
// detection-matching statistics loop.
//
// C++ replacement for the reference's numba / numba.cuda evaluation engine
// (ref:lib/eval/rotate_iou.py device kernels, ref:lib/eval/eval.py:157-336
// compute_statistics_jit / fused_compute_statistics). Exposed via a plain C
// ABI and bound from Python with ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libm3deval.so m3deval.cpp
//
// Semantics notes (kept bit-compatible with the Python implementation in
// m3dssd_tpu/eval/, which is itself a re-derivation of the reference):
//  * rotated rect corners use the clockwise convention
//    (x' = c*x + s*y + cx ; y' = -s*x + c*y + cy)
//  * corner containment uses a scale-aware epsilon; edge crossing uses the
//    strict double-sided sign test
//  * intersection area = fan triangulation of the angle-sorted point set

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Pt { double x, y; };

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
  return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// rbbox: [cx, cy, xd, yd, angle] -> 4 clockwise corners
inline void rbbox_corners(const double* b, Pt c[4]) {
  const double ca = std::cos(b[4]), sa = std::sin(b[4]);
  const double lx[4] = {-b[2] / 2, -b[2] / 2, b[2] / 2, b[2] / 2};
  const double ly[4] = {-b[3] / 2, b[3] / 2, b[3] / 2, -b[3] / 2};
  for (int i = 0; i < 4; ++i) {
    c[i].x = ca * lx[i] + sa * ly[i] + b[0];
    c[i].y = -sa * lx[i] + ca * ly[i] + b[1];
  }
}

inline bool point_in_quad(const Pt& p, const Pt c[4]) {
  const double abx = c[1].x - c[0].x, aby = c[1].y - c[0].y;
  const double adx = c[3].x - c[0].x, ady = c[3].y - c[0].y;
  const double apx = p.x - c[0].x, apy = p.y - c[0].y;
  const double abab = abx * abx + aby * aby;
  const double abap = abx * apx + aby * apy;
  const double adad = adx * adx + ady * ady;
  const double adap = adx * apx + ady * apy;
  const double e1 = 1e-9 * abab, e2 = 1e-9 * adad;
  return (abab - abap >= -e1) && (abap >= -e1) && (adad - adap >= -e2) &&
         (adap >= -e2);
}

inline bool seg_intersect(const Pt& a, const Pt& b, const Pt& c, const Pt& d,
                          Pt* out) {
  const double area_abc = cross(a, b, c);
  const double area_abd = cross(a, b, d);
  if (area_abc * area_abd >= 0) return false;
  const double area_cda = cross(c, d, a);
  const double area_cdb = area_cda + area_abc - area_abd;
  if (area_cda * area_cdb >= 0) return false;
  const double t = area_cda / (area_abd - area_abc);
  out->x = a.x + t * (b.x - a.x);
  out->y = a.y + t * (b.y - a.y);
  return true;
}

// intersection area of two rotated rectangles
double rect_intersection_area(const double* b1, const double* b2) {
  Pt c1[4], c2[4];
  rbbox_corners(b1, c1);
  rbbox_corners(b2, c2);

  Pt pts[24];
  int n = 0;
  for (int i = 0; i < 4; ++i)
    if (point_in_quad(c1[i], c2)) pts[n++] = c1[i];
  for (int i = 0; i < 4; ++i)
    if (point_in_quad(c2[i], c1)) pts[n++] = c2[i];
  Pt x;
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j)
      if (seg_intersect(c1[i], c1[(i + 1) & 3], c2[j], c2[(j + 1) & 3], &x))
        pts[n++] = x;
  if (n < 3) return 0.0;

  // sort by angle around the centroid
  Pt ctr{0, 0};
  for (int i = 0; i < n; ++i) { ctr.x += pts[i].x; ctr.y += pts[i].y; }
  ctr.x /= n; ctr.y /= n;
  double ang[24];
  int idx[24];
  for (int i = 0; i < n; ++i) {
    ang[i] = std::atan2(pts[i].y - ctr.y, pts[i].x - ctr.x);
    idx[i] = i;
  }
  std::sort(idx, idx + n, [&](int a, int b) { return ang[a] < ang[b]; });

  // fan triangulation rooted at the first sorted point
  double area = 0.0;
  const Pt& p0 = pts[idx[0]];
  for (int i = 1; i + 1 < n; ++i)
    area += std::abs(cross(p0, pts[idx[i]], pts[idx[i + 1]])) / 2.0;
  return area;
}

}  // namespace

extern "C" {

// boxes [n,5], qboxes [k,5] -> out [n,k]
// criterion: -1 IoU, 0 /area1, 1 /area2, 2 raw intersection
void rotated_iou(const double* boxes, int64_t n, const double* qboxes,
                 int64_t k, int criterion, double* out) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < k; ++j) {
      const double* b1 = boxes + i * 5;
      const double* b2 = qboxes + j * 5;
      const double inter = rect_intersection_area(b1, b2);
      const double a1 = b1[2] * b1[3], a2 = b2[2] * b2[3];
      double v;
      switch (criterion) {
        case -1: v = inter / (a1 + a2 - inter); break;
        case 0: v = inter / a1; break;
        case 1: v = inter / a2; break;
        default: v = inter;
      }
      out[i * k + j] = v;
    }
  }
}

// camera-frame 3D box overlap: boxes [n,7] = [x,y,z,l,h,w,ry]
// (ref:lib/eval/eval.py:119-160)
void d3_box_overlap(const double* boxes, int64_t n, const double* qboxes,
                    int64_t k, int criterion, double* out) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < k; ++j) {
      const double* b = boxes + i * 7;
      const double* q = qboxes + j * 7;
      const double rb[5] = {b[0], b[2], b[3], b[5], b[6]};
      const double rq[5] = {q[0], q[2], q[3], q[5], q[6]};
      const double rinc = rect_intersection_area(rb, rq);
      double v = 0.0;
      if (rinc > 0) {
        const double ymax = std::min(b[1], q[1]);
        const double ymin = std::max(b[1] - b[4], q[1] - q[4]);
        const double ih = ymax - ymin;
        if (ih > 0) {
          const double inter = ih * rinc;
          const double v1 = b[3] * b[4] * b[5];
          const double v2 = q[3] * q[4] * q[5];
          double ua;
          switch (criterion) {
            case -1: ua = v1 + v2 - inter; break;
            case 0: ua = v1; break;
            case 1: ua = v2; break;
            default: ua = 1.0;
          }
          v = inter / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

// 2D image-plane overlap (no +1), criterion as above
// boxes [n,4], qboxes [k,4] -> out [n,k]
void image_box_overlap(const double* boxes, int64_t n, const double* qboxes,
                       int64_t k, int criterion, double* out) {
  for (int64_t j = 0; j < k; ++j) {
    const double* q = qboxes + j * 4;
    const double qarea = (q[2] - q[0]) * (q[3] - q[1]);
    for (int64_t i = 0; i < n; ++i) {
      const double* b = boxes + i * 4;
      double v = 0.0;
      const double iw = std::min(b[2], q[2]) - std::max(b[0], q[0]);
      if (iw > 0) {
        const double ih = std::min(b[3], q[3]) - std::max(b[1], q[1]);
        if (ih > 0) {
          double ua;
          const double barea = (b[2] - b[0]) * (b[3] - b[1]);
          switch (criterion) {
            case -1: ua = barea + qarea - iw * ih; break;
            case 0: ua = barea; break;
            case 1: ua = qarea; break;
            default: ua = 1.0;
          }
          v = iw * ih / ua;
        }
      }
      out[i * k + j] = v;
    }
  }
}

// Greedy matching for one image at one score threshold
// (ref:lib/eval/eval.py:157-275). Returns the tp count written into
// thresholds_out when collect_thresholds != 0.
//
// overlaps: [ndt, ngt] row-major; gt_datas [ngt,5] (bbox, alpha);
// dt_datas [ndt,6] (bbox, alpha, score); dc_bboxes [ndc,4].
// out4: {tp, fp, fn, similarity}.
int64_t compute_statistics(const double* overlaps, const double* gt_datas,
                           int64_t ngt, const double* dt_datas, int64_t ndt,
                           const int64_t* ignored_gt,
                           const int64_t* ignored_det,
                           const double* dc_bboxes, int64_t ndc, int metric,
                           double min_overlap, double thresh, int compute_fp,
                           int compute_aos, double* out4,
                           double* thresholds_out) {
  constexpr double NO_DETECTION = -10000000.0;
  std::vector<char> assigned(ndt, 0), ign_thresh(ndt, 0);
  if (compute_fp) {
    for (int64_t i = 0; i < ndt; ++i)
      if (dt_datas[i * 6 + 5] < thresh) ign_thresh[i] = 1;
  }
  int64_t tp = 0, fp = 0, fn = 0;
  double similarity = 0.0;
  std::vector<double> delta;
  int64_t nth = 0;

  for (int64_t i = 0; i < ngt; ++i) {
    if (ignored_gt[i] == -1) continue;
    int64_t det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0.0;
    bool assigned_ignored_det = false;

    for (int64_t j = 0; j < ndt; ++j) {
      if (ignored_det[j] == -1 || assigned[j] || ign_thresh[j]) continue;
      const double overlap = overlaps[j * ngt + i];
      const double dt_score = dt_datas[j * 6 + 5];
      if (!compute_fp && overlap > min_overlap &&
          dt_score > valid_detection) {
        det_idx = j;
        valid_detection = dt_score;
      } else if (compute_fp && overlap > min_overlap &&
                 (overlap > max_overlap || assigned_ignored_det) &&
                 ignored_det[j] == 0) {
        max_overlap = overlap;
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && overlap > min_overlap &&
                 valid_detection == NO_DETECTION && ignored_det[j] == 1) {
        det_idx = j;
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DETECTION && ignored_gt[i] == 0) {
      ++fn;
    } else if (valid_detection != NO_DETECTION &&
               (ignored_gt[i] == 1 || ignored_det[det_idx] == 1)) {
      assigned[det_idx] = 1;
    } else if (valid_detection != NO_DETECTION) {
      ++tp;
      if (thresholds_out) thresholds_out[nth++] = dt_datas[det_idx * 6 + 5];
      if (compute_aos)
        delta.push_back(gt_datas[i * 5 + 4] - dt_datas[det_idx * 6 + 4]);
      assigned[det_idx] = 1;
    }
  }

  if (compute_fp) {
    for (int64_t i = 0; i < ndt; ++i)
      if (!(assigned[i] || ignored_det[i] == -1 || ignored_det[i] == 1 ||
            ign_thresh[i]))
        ++fp;
    int64_t nstuff = 0;
    if (metric == 0 && ndc > 0) {
      for (int64_t i = 0; i < ndc; ++i) {
        const double* dc = dc_bboxes + i * 4;
        for (int64_t j = 0; j < ndt; ++j) {
          if (assigned[j] || ignored_det[j] == -1 || ignored_det[j] == 1 ||
              ign_thresh[j])
            continue;
          const double* b = dt_datas + j * 6;  // bbox in first 4
          const double iw = std::min(b[2], dc[2]) - std::max(b[0], dc[0]);
          const double ih = std::min(b[3], dc[3]) - std::max(b[1], dc[1]);
          double ov = 0.0;
          if (iw > 0 && ih > 0) {
            const double barea = (b[2] - b[0]) * (b[3] - b[1]);
            ov = iw * ih / barea;  // criterion 0
          }
          if (ov > min_overlap) {
            assigned[j] = 1;
            ++nstuff;
          }
        }
      }
    }
    fp -= nstuff;
    if (compute_aos) {
      double s = 0.0;
      for (double d : delta) s += (1.0 + std::cos(d)) / 2.0;
      similarity = (tp > 0 || fp > 0) ? s : -1.0;
    }
  }
  out4[0] = (double)tp;
  out4[1] = (double)fp;
  out4[2] = (double)fn;
  out4[3] = similarity;
  return nth;
}

// Threshold-fused accumulation for one image
// (ref:lib/eval/eval.py:290-336 fused_compute_statistics): adds
// tp/fp/fn/similarity into pr [nthresh, 4] for every threshold.
void fused_statistics(const double* overlaps, const double* gt_datas,
                      int64_t ngt, const double* dt_datas, int64_t ndt,
                      const int64_t* ignored_gt, const int64_t* ignored_det,
                      const double* dc_bboxes, int64_t ndc, int metric,
                      double min_overlap, const double* thresholds,
                      int64_t nthresh, int compute_aos, double* pr) {
  for (int64_t t = 0; t < nthresh; ++t) {
    double out4[4];
    compute_statistics(overlaps, gt_datas, ngt, dt_datas, ndt, ignored_gt,
                       ignored_det, dc_bboxes, ndc, metric, min_overlap,
                       thresholds[t], /*compute_fp=*/1, compute_aos, out4,
                       nullptr);
    pr[t * 4 + 0] += out4[0];
    pr[t * 4 + 1] += out4[1];
    pr[t * 4 + 2] += out4[2];
    if (out4[3] != -1.0) pr[t * 4 + 3] += out4[3];
  }
}

}  // extern "C"
