// Minimal FFTW3 API shim for benchmarking the reference programs on Linux.
// Implements plan/execute for 1-D complex DFTs (power-of-two via radix-2,
// double precision) -- enough for every reference program's usage.
#ifndef FFTW3_SHIM_H
#define FFTW3_SHIM_H
#include <math.h>
#include <stdlib.h>
#include <string.h>

typedef double fftw_complex[2];
#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_ESTIMATE 0

typedef struct fftw_plan_s {
  int n; int sign; fftw_complex* in; fftw_complex* out;
} *fftw_plan;

static inline fftw_plan fftw_plan_dft_1d(int n, fftw_complex* in, fftw_complex* out,
                                         int sign, unsigned flags) {
  (void)flags;
  fftw_plan p = (fftw_plan)malloc(sizeof(struct fftw_plan_s));
  p->n = n; p->sign = sign; p->in = in; p->out = out;
  return p;
}

static inline void fftw_shim_dft(int n, int sign, const fftw_complex* in, fftw_complex* out) {
  // iterative radix-2 DIT; n must be a power of two (true for all reference uses)
  int levels = 0; while ((1 << levels) < n) levels++;
  for (int i = 0; i < n; i++) {
    int j = 0, t = i;
    for (int b = 0; b < levels; b++) { j = (j << 1) | (t & 1); t >>= 1; }
    out[j][0] = in[i][0]; out[j][1] = in[i][1];
  }
  for (int size = 2; size <= n; size <<= 1) {
    int half = size >> 1;
    double ang = sign * 2.0 * M_PI / size;
    for (int start = 0; start < n; start += size) {
      for (int k = 0; k < half; k++) {
        double wr = cos(ang * k), wi = sin(ang * k);
        double* a = out[start + k];
        double* b = out[start + k + half];
        double tr = wr * b[0] - wi * b[1];
        double ti = wr * b[1] + wi * b[0];
        b[0] = a[0] - tr; b[1] = a[1] - ti;
        a[0] += tr; a[1] += ti;
      }
    }
  }
}

static inline void fftw_execute(fftw_plan p) {
  fftw_complex* tmp = (fftw_complex*)malloc(sizeof(fftw_complex) * p->n);
  memcpy(tmp, p->in, sizeof(fftw_complex) * p->n);
  fftw_shim_dft(p->n, p->sign, tmp, p->out);
  free(tmp);
}

static inline void fftw_destroy_plan(fftw_plan p) { free(p); }
#endif
