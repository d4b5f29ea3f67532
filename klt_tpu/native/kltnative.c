/* Native host runtime for the TPU KLT engine.
 *
 * Holds the inherently sequential scalar algorithms that surround the TPU
 * compute path: the tie-exact descending quicksort over (x, y, response)
 * candidate triples and the greedy minimum-distance suppression.  Both
 * follow the behavioural contract of the reference's selection stage
 * (src/V1/selectGoodFeatures.c:62-96 sort scheme, :102-239 suppression) so
 * that equal-response candidates are ordered and accepted identically —
 * a prerequisite for matching the reference's golden feature tables.
 *
 * Built as a shared library, bound via ctypes (see __init__.py).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define KLT_NOT_FOUND (-1)

/* ------------------------------------------------------------------ */
/* Descending sort of (x, y, v) int32 triples by v.                    */
/*                                                                     */
/* Hoare partition with the middle element swapped to the front as the */
/* pivot, recursing into the smaller side — the exact scheme the       */
/* reference uses, so ties land in the same relative order.            */
/* ------------------------------------------------------------------ */

static inline void swap_triple(int32_t *a, int64_t i, int64_t j)
{
  int32_t t0 = a[3 * i], t1 = a[3 * i + 1], t2 = a[3 * i + 2];
  a[3 * i] = a[3 * j];
  a[3 * i + 1] = a[3 * j + 1];
  a[3 * i + 2] = a[3 * j + 2];
  a[3 * j] = t0;
  a[3 * j + 1] = t1;
  a[3 * j + 2] = t2;
}

void klt_sort_points_desc(int32_t *a, int64_t n)
{
  while (n > 1) {
    int64_t i = 0, j = n, left;
    swap_triple(a, 0, n / 2); /* median-guess pivot to the front */
    for (;;) {
      do {
        j--;
      } while (a[3 * j + 2] < a[2]);
      do {
        i++;
      } while (i < j && a[3 * i + 2] > a[2]);
      if (i >= j)
        break;
      swap_triple(a, i, j);
    }
    swap_triple(a, j, 0);
    left = j;
    /* tail-recurse into the larger side, recurse into the smaller */
    if (left < n - (j + 1)) {
      klt_sort_points_desc(a, left);
      a += 3 * (j + 1);
      n = n - (j + 1);
    } else {
      klt_sort_points_desc(a + 3 * (j + 1), n - (j + 1));
      n = left;
    }
  }
}

/* ------------------------------------------------------------------ */
/* Greedy minimum-distance suppression.                                */
/* ------------------------------------------------------------------ */

static inline void stamp_neighborhood(uint8_t *map, int32_t x, int32_t y,
                                      int32_t rad, int32_t ncols,
                                      int32_t nrows)
{
  int32_t x0 = x - rad, x1 = x + rad, y0 = y - rad, y1 = y + rad;
  int32_t ix, iy;
  if (x0 < 0) x0 = 0;
  if (y0 < 0) y0 = 0;
  if (x1 > ncols - 1) x1 = ncols - 1;
  if (y1 > nrows - 1) y1 = nrows - 1;
  for (iy = y0; iy <= y1; iy++)
    for (ix = x0; ix <= x1; ix++)
      map[(int64_t)iy * ncols + ix] = 1;
}

/* Walks the sorted candidate list, accepting each point whose
 * neighborhood is still empty and whose response clears min_eigenvalue.
 * With overwrite_all == 0, surviving features (fval[i] >= 0) keep their
 * slots and pre-stamp the occupancy map (replacement mode).  Slots left
 * unfilled are marked NOT_FOUND with x = y = -1.
 */
void klt_min_dist_suppress(const int32_t *pts, int64_t npts,
                           float *fx, float *fy, int32_t *fval,
                           int64_t nfeat, int32_t ncols, int32_t nrows,
                           int32_t mindist, int32_t min_eigenvalue,
                           int32_t overwrite_all)
{
  uint8_t *map = (uint8_t *)calloc((size_t)ncols * nrows, 1);
  int64_t slot = 0, p;
  int32_t rad = mindist - 1; /* the scan below works with mindist-1 */

  if (min_eigenvalue < 1)
    min_eigenvalue = 1;
  if (rad < -1)
    rad = -1;

  if (!overwrite_all) {
    for (p = 0; p < nfeat; p++)
      if (fval[p] >= 0)
        stamp_neighborhood(map, (int32_t)fx[p], (int32_t)fy[p], rad,
                           ncols, nrows);
  }

  for (p = 0; p < npts; p++) {
    int32_t x = pts[3 * p], y = pts[3 * p + 1], v = pts[3 * p + 2];

    while (!overwrite_all && slot < nfeat && fval[slot] >= 0)
      slot++;
    if (slot >= nfeat)
      break;

    if (!map[(int64_t)y * ncols + x] && v >= min_eigenvalue) {
      fx[slot] = (float)x;
      fy[slot] = (float)y;
      fval[slot] = v;
      slot++;
      stamp_neighborhood(map, x, y, rad, ncols, nrows);
    }
  }

  /* Candidates exhausted: remaining writable slots become NOT_FOUND. */
  for (; slot < nfeat; slot++) {
    if (overwrite_all || fval[slot] < 0) {
      fx[slot] = -1.0f;
      fy[slot] = -1.0f;
      fval[slot] = KLT_NOT_FOUND;
    }
  }

  free(map);
}
