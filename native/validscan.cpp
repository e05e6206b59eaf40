// Native host-side data engine for prdisagg_tpu.
//
// Replaces the reference's numba-JIT kernels (compute_valid_indices.py:74-93)
// and the skimage view_as_windows gather (gan_train_cwgangp_pixelnorm.py:154)
// with compiled C++: the offline valid-patch scan and the packed patch
// extraction that builds the HBM-resident training store from a (possibly
// memmapped) multi-hundred-GB radar tensor, one day resident at a time.
//
// Build: make -C native   (produces libprdisagg_native.so, ctypes ABI)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Scan one day slab (nh, ny, nx) for valid ndomain x ndomain boxes.
//
// A box at (ii, jj) is valid iff its daily-sum window contains no NaN and at
// least n_thresh gridpoints exceed tp_thresh.  Sweep positions follow
// range(0, n - ndomain (+1 if include_last), stride) — the reference's
// boundary semantics by default.
//
// out_yx receives up to cap (ii, jj) int32 pairs; returns the number found
// (which may exceed cap — caller must size cap >= max possible boxes).
int prdisagg_valid_scan_day(const float* day, int64_t nh, int64_t ny,
                            int64_t nx, int ndomain, int stride,
                            float tp_thresh, int n_thresh, int include_last,
                            int32_t* out_yx, int64_t cap) {
  const int64_t plane = ny * nx;
  // daily sum (NaN propagates, matching np.sum over the hour axis)
  std::vector<double> daily(plane, 0.0);
  for (int64_t h = 0; h < nh; ++h) {
    const float* src = day + h * plane;
    for (int64_t i = 0; i < plane; ++i) daily[i] += (double)src[i];
  }

  // summed-area tables over {is-nan} and {exceeds-threshold} masks
  const int64_t sw = nx + 1;
  std::vector<int32_t> sat_nan((ny + 1) * sw, 0);
  std::vector<int32_t> sat_exc((ny + 1) * sw, 0);
  for (int64_t y = 0; y < ny; ++y) {
    int32_t row_nan = 0, row_exc = 0;
    for (int64_t x = 0; x < nx; ++x) {
      const double v = daily[y * nx + x];
      const bool is_nan = std::isnan(v);
      row_nan += is_nan ? 1 : 0;
      row_exc += (!is_nan && v > (double)tp_thresh) ? 1 : 0;
      sat_nan[(y + 1) * sw + (x + 1)] = sat_nan[y * sw + (x + 1)] + row_nan;
      sat_exc[(y + 1) * sw + (x + 1)] = sat_exc[y * sw + (x + 1)] + row_exc;
    }
  }

  auto box = [&](const std::vector<int32_t>& sat, int64_t y0, int64_t x0) {
    const int64_t y1 = y0 + ndomain, x1 = x0 + ndomain;
    return sat[y1 * sw + x1] - sat[y0 * sw + x1] - sat[y1 * sw + x0] +
           sat[y0 * sw + x0];
  };

  const int64_t y_stop = ny - ndomain + (include_last ? 1 : 0);
  const int64_t x_stop = nx - ndomain + (include_last ? 1 : 0);
  int64_t found = 0;
  for (int64_t ii = 0; ii < y_stop; ii += stride) {
    for (int64_t jj = 0; jj < x_stop; jj += stride) {
      if (box(sat_nan, ii, jj) == 0 && box(sat_exc, ii, jj) >= n_thresh) {
        if (found < cap) {
          out_yx[2 * found] = (int32_t)ii;
          out_yx[2 * found + 1] = (int32_t)jj;
        }
        ++found;
      }
    }
  }
  return (int)found;
}

// Gather S patches (nh, nd, nd) from a contiguous (D, nh, ny, nx) tensor into
// a packed (S, nh, nd, nd) output.  idx rows are (tidx, yidx, xidx) int32.
void prdisagg_gather_patches(const float* data, int64_t D, int64_t nh,
                             int64_t ny, int64_t nx, const int32_t* idx,
                             int64_t S, int nd, float* out) {
  const int64_t plane = ny * nx;
  const int64_t day_sz = nh * plane;
  const int64_t patch_plane = (int64_t)nd * nd;
  for (int64_t s = 0; s < S; ++s) {
    const int64_t t = idx[3 * s], y = idx[3 * s + 1], x = idx[3 * s + 2];
    const float* day = data + t * day_sz;
    float* dst = out + s * nh * patch_plane;
    for (int64_t h = 0; h < nh; ++h) {
      const float* src = day + h * plane + y * nx + x;
      for (int r = 0; r < nd; ++r) {
        std::memcpy(dst + h * patch_plane + (int64_t)r * nd, src + (int64_t)r * nx,
                    sizeof(float) * nd);
      }
    }
  }
}

// Gather patches for one day only: day slab (nh, ny, nx), boxes (B, 2) of
// (yidx, xidx) — the streaming building block when the full tensor is a
// memmap that must not be materialized.
void prdisagg_gather_patches_day(const float* day, int64_t nh, int64_t ny,
                                 int64_t nx, const int32_t* yx, int64_t B,
                                 int nd, float* out) {
  const int64_t plane = ny * nx;
  const int64_t patch_plane = (int64_t)nd * nd;
  for (int64_t b = 0; b < B; ++b) {
    const int64_t y = yx[2 * b], x = yx[2 * b + 1];
    float* dst = out + b * nh * patch_plane;
    for (int64_t h = 0; h < nh; ++h) {
      const float* src = day + h * plane + y * nx + x;
      for (int r = 0; r < nd; ++r) {
        std::memcpy(dst + h * patch_plane + (int64_t)r * nd, src + (int64_t)r * nx,
                    sizeof(float) * nd);
      }
    }
  }
}

}  // extern "C"
