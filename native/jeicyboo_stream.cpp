// Native streaming runner: block-streams PCM files through the compat
// kernels with zero Python in the data path -- the framework's equivalent of
// the reference's L0/L1 runtime (fopen/fread/process/fwrite loop), built as
// a real tool: buffered I/O, explicit state, proper exit codes.
//
//   jeicyboo_stream geq  IN(.wav|.pcm) OUT.pcm  [--skip-header]
//   jeicyboo_stream nlms IN REF EST ERR         [--skip-header]
//
// Uses the same strict-FP kernels as the Python bindings
// (jeicyboo_native.cpp), so output is bit-identical to the oracle/binaries.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <string>
#include <vector>

extern "C" {
int16_t jb_c_short(double v);
void jb_geq_process(const int16_t*, int64_t, const double*, const double*,
                    int16_t*, int16_t*, int16_t*);
void jb_nlms_process(const int16_t*, const int16_t*, int64_t, double*,
                     int16_t*, int16_t*, int16_t*);
}

// GEQ coefficients: computed host-side in Python normally; the standalone
// runner recomputes the reference formulas (7Band_GEQ.cpp:136-257) with the
// default gains so it needs no side files.
static const double kPi = 3.141592;
static const double kFs = 48000.0;
static const double kQ = 4.318;
static const double kFreqs[7] = {44.0, 125.0, 250.0, 500.0, 2000.0, 6000.0, 11313.0};
static const double kGains[7] = {12.0, 12.0, 0.0, 0.0, 3.0, 0.0, -12.0};

static void calc_coefficients(double b[7][3], double a[7][3]) {
  double K[7], V[7];
  const double r = 1.0 / kQ;
  for (int k = 0; k < 7; k++) {
    K[k] = tan(kPi * kFreqs[k] / kFs);
    V[k] = pow(10.0, kGains[k] / 20.0);
    if (V[k] < 1) V[k] = 1.0 / V[k];
  }
  // band 0: bass booster (gain +12 > 0)
  {
    double k0 = K[0], v0 = V[0];
    double d = 1 + r * k0 + k0 * k0;
    b[0][0] = (1 + sqrt(v0) * r * k0 + v0 * k0 * k0) / d;
    b[0][1] = (2 * (v0 * k0 * k0 - 1)) / d;
    b[0][2] = (1 - sqrt(v0) * r * k0 + v0 * k0 * k0) / d;
    a[0][0] = 0.0;
    a[0][1] = (2 * (k0 * k0 - 1)) / d;
    a[0][2] = (1 - r * k0 + k0 * k0) / d;
  }
  // band 6: treble cut (gain -12)
  {
    double k6 = K[6], v6 = V[6];
    double d = v6 + r * sqrt(v6) * k6 + k6 * k6;
    b[6][0] = (1 + r * k6 + k6 * k6) / d;
    b[6][1] = (2 * (k6 * k6 - 1)) / d;
    b[6][2] = (1 - r * k6 + k6 * k6) / d;
    double d2 = 1 + r / sqrt(v6) * k6 + (k6 * k6) / v6;
    a[6][0] = 0.0;
    a[6][1] = (2 * ((k6 * k6) / v6 - 1)) / d2;
    a[6][2] = (1 - r / sqrt(v6) * k6 + (k6 * k6) / v6) / d2;
  }
  // bands 1..5: peak (reference quirk: a2 uses K[k-1])
  for (int k = 1; k <= 5; k++) {
    double kb = K[k], vb = V[k], ka2 = K[k - 1];
    if (kGains[k] > 0) {
      double d = 1 + (1 / kQ) * kb + kb * kb;
      b[k][0] = (1 + (vb / kQ) * kb + kb * kb) / d;
      b[k][1] = (2 * (kb * kb - 1)) / d;
      b[k][2] = (1 - (vb / kQ) * kb + kb * kb) / d;
      a[k][0] = 0.0;
      a[k][1] = b[k][1];
      a[k][2] = (1 - (1 / kQ) * ka2 + kb * kb) / d;
    } else {
      double d = 1 + (vb / kQ) * kb + kb * kb;
      b[k][0] = (1 + (1.0 / kQ) * kb + kb * kb) / d;
      b[k][1] = (2 * (kb * kb - 1)) / d;
      b[k][2] = (1 - (1.0 / kQ) * kb + kb * kb) / d;
      a[k][0] = 0.0;
      a[k][1] = b[k][1];
      a[k][2] = (1 - (vb / kQ) * ka2 + kb * kb) / d;
    }
  }
}

static FILE* open_input(const char* path, bool skip_header) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    fprintf(stderr, "cannot open %s\n", path);
    return nullptr;
  }
  if (skip_header) fseek(f, 44, SEEK_SET);
  return f;
}

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s geq IN OUT [--skip-header]\n"
            "       %s nlms IN REF EST ERR [--skip-header]\n",
            argv[0], argv[0]);
    return 2;
  }
  std::string cmd = argv[1];
  bool skip = false;
  for (int i = 2; i < argc; i++)
    if (!strcmp(argv[i], "--skip-header")) skip = true;

  if (cmd == "geq") {
    FILE* in = open_input(argv[2], skip);
    FILE* out = fopen(argv[3], "wb");
    if (!in || !out) return 1;
    double b[7][3], a[7][3];
    calc_coefficients(b, a);
    int16_t keep_in[14] = {0}, keep_out[14] = {0};
    std::vector<int16_t> buf(512), res(512);
    size_t got;
    // reference main loop semantics: partial final reads keep the stale tail
    while ((got = fread(buf.data(), sizeof(int16_t), 512, in)) > 0) {
      jb_geq_process(buf.data(), 512, &b[0][0], &a[0][0], keep_in, keep_out,
                     res.data());
      fwrite(res.data(), sizeof(int16_t), 512, out);
    }
    fclose(in);
    fclose(out);
    return 0;
  }
  if (cmd == "nlms") {
    if (argc < 6) return 2;
    FILE* in = open_input(argv[2], skip);
    FILE* ref = fopen(argv[3], "rb");  // reference file header never skipped
    FILE* est = fopen(argv[4], "wb");
    FILE* err = fopen(argv[5], "wb");
    if (!in || !ref || !est || !err) return 1;
    std::vector<double> coeff(256, 0.0);
    std::vector<int16_t> keep(255, 0);
    std::vector<int16_t> x(1024), r(1024), e(1024), d(1024);
    int64_t block = 0;
    while (fread(x.data(), sizeof(int16_t), 1024, in) > 0 &&
           fread(r.data(), sizeof(int16_t), 1024, ref) > 0) {
      jb_nlms_process(x.data(), r.data(), 1, coeff.data(), keep.data(),
                      e.data(), d.data());
      if (block > 0) {  // first block not written (NormalLMS.cpp:132-135)
        fwrite(e.data(), sizeof(int16_t), 1024, est);
        fwrite(d.data(), sizeof(int16_t), 1024, err);
      }
      block++;
    }
    fclose(in);
    fclose(ref);
    fclose(est);
    fclose(err);
    return 0;
  }
  fprintf(stderr, "unknown command %s\n", cmd.c_str());
  return 2;
}
