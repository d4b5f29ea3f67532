/* Reference-CPU timing driver for BASELINE configs the reference never
 * shipped a benchmark for (affine @ 2000 features, replacement @ 500).
 * Links against a scratch build of the reference (like gen_fixtures.c);
 * only calls its public API.
 *
 * Optional 8th arg: path of a KLTFT1 binary feature table to dump the
 * per-frame tracks into (KLTStoreFeatureList + WriteFeatureTable,
 * src/V1/storeFeatures.c:15-40 / writeFeatures.c:326-443) — the
 * accuracy oracle for bench.py's per-config drift/status fields. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include "pnmio.h"
#include "klt.h"

static double now_s(void) {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

int main(int argc, char **argv)
{
  const char *dir = argc > 1 ? argv[1] : "/root/reference/data/images_laptops";
  int n_feat = argc > 2 ? atoi(argv[2]) : 2000;
  int n_frames = argc > 3 ? atoi(argv[3]) : 6;
  int affine = argc > 4 ? atoi(argv[4]) : 2;
  int replace = argc > 5 ? atoi(argv[5]) : 0;
  int first = argc > 6 ? atoi(argv[6]) : 1;
  const char *table_out = argc > 7 ? argv[7] : NULL;
  int pyr_levels = argc > 8 ? atoi(argv[8]) : 0;   /* 0 = keep default */
  int subsampling = argc > 9 ? atoi(argv[9]) : 0;
  char path[512];
  int ncols, nrows, i;
  unsigned char *img1, *img2, *fr;
  KLT_TrackingContext tc = KLTCreateTrackingContext();
  KLT_FeatureList fl = KLTCreateFeatureList(n_feat);
  KLT_FeatureTable ft = NULL;

  KLTSetVerbosity(0);
  tc->sequentialMode = TRUE;
  tc->affineConsistencyCheck = affine;
  if (pyr_levels > 0 && subsampling > 0) {
    /* mirror KLTChangeTCPyramid's direct field writes for an explicit
     * (levels, subsampling) pair, then rederive the border */
    tc->nPyramidLevels = pyr_levels;
    tc->subsampling = subsampling;
    KLTUpdateTCBorder(tc);
  }
  if (table_out)
    ft = KLTCreateFeatureTable(n_frames, n_feat);

  snprintf(path, sizeof path, "%s/img%d.pgm", dir, first);
  img1 = pgmReadFile(path, NULL, &ncols, &nrows);
  img2 = (unsigned char *)malloc(ncols * nrows);
  KLTSelectGoodFeatures(tc, img1, ncols, nrows, fl);
  if (ft)
    KLTStoreFeatureList(fl, ft, 0);

  double t0 = now_s();
  for (i = 1; i < n_frames; i++) {
    snprintf(path, sizeof path, "%s/img%d.pgm", dir, first + i);
    fr = pgmReadFile(path, NULL, &ncols, &nrows);
    memcpy(img2, fr, ncols * nrows);
    free(fr);
    KLTTrackFeatures(tc, img1, img2, ncols, nrows, fl);
    if (replace)
      KLTReplaceLostFeatures(tc, img2, ncols, nrows, fl);
    if (ft)
      KLTStoreFeatureList(fl, ft, i);
    memcpy(img1, img2, ncols * nrows);
  }
  double dt = (now_s() - t0) / (n_frames - 1);
  printf("%s n_feat=%d affine=%d replace=%d: %.1f ms/pair = %.2f fps\n",
         dir, n_feat, affine, replace, dt * 1e3, 1.0 / dt);
  if (ft)
    KLTWriteFeatureTable(ft, (char *)table_out, NULL);
  return 0;
}
