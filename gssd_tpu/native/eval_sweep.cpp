// Greedy TP/FP assignment for AP evaluation.
//
// Same protocol as the reference's host sweep (test_ap_iobb.py:252-303):
// predictions are visited in descending-score order; each claims its
// best-overlap ground-truth box in the same image if the overlap clears
// the threshold and the gt is unclaimed, else it is a false positive.
// metric 0 = IoU (intersection / union), 1 = IoBB (intersection /
// predicted-box area, :273-278).

#include <cstddef>
#include <cstdint>
#include <vector>

extern "C" {

// preds: [n_pred, 6] rows (image_idx, score, x1, y1, x2, y2), already
//        sorted by score descending.
// gt_offsets: [n_images + 1] prefix offsets into gt_boxes.
// gt_boxes: [total_gt, 4].
// tp/fp out: [n_pred] uint8.
void eval_sweep(const double* preds, int64_t n_pred,
                const int64_t* gt_offsets, int64_t n_images,
                const double* gt_boxes, double threshold, int32_t metric,
                uint8_t* tp, uint8_t* fp) {
  int64_t total_gt = gt_offsets[n_images];
  std::vector<uint8_t> claimed(static_cast<size_t>(total_gt), 0);
  for (int64_t i = 0; i < n_pred; ++i) {
    const double* row = preds + i * 6;
    const int64_t img = static_cast<int64_t>(row[0]);
    tp[i] = 0;
    fp[i] = 1;
    if (img < 0 || img >= n_images) continue;
    const int64_t beg = gt_offsets[img];
    const int64_t end = gt_offsets[img + 1];
    if (beg == end) continue;
    const double px1 = row[2], py1 = row[3], px2 = row[4], py2 = row[5];
    const double parea = (px2 - px1) * (py2 - py1);
    double best = -1.0;
    int64_t best_j = -1;
    for (int64_t j = beg; j < end; ++j) {
      const double* g = gt_boxes + j * 4;
      const double ix1 = px1 > g[0] ? px1 : g[0];
      const double iy1 = py1 > g[1] ? py1 : g[1];
      const double ix2 = px2 < g[2] ? px2 : g[2];
      const double iy2 = py2 < g[3] ? py2 : g[3];
      const double iw = ix2 - ix1 > 0 ? ix2 - ix1 : 0;
      const double ih = iy2 - iy1 > 0 ? iy2 - iy1 : 0;
      const double inter = iw * ih;
      double denom;
      if (metric == 1) {
        denom = parea;
      } else {
        const double garea = (g[2] - g[0]) * (g[3] - g[1]);
        denom = garea + parea - inter;
      }
      const double ov = denom > 1e-12 ? inter / denom : 0.0;
      if (ov > best) {
        best = ov;
        best_j = j;
      }
    }
    if (best > threshold && best_j >= 0 && !claimed[best_j]) {
      tp[i] = 1;
      fp[i] = 0;
      claimed[best_j] = 1;
    }
  }
}

}  // extern "C"
