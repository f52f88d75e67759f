/* Smoke test for the C/Fortran API (capi.cpp): the native-code analogue
 * of the reference's examples/ex_eigs_dseq.c — build a 1-D Laplacian,
 * solve through all three entry modes (CSR, matvec callback, F77
 * binding), check eigenvalues against the analytic spectrum
 * lambda_i = 2 - 2 cos(i*pi/(n+1)).
 *
 * Build+run:  make -C native test_capi
 *             PYTHONPATH=. JAX_PLATFORMS=cpu ./native/test_capi
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef void (*ptpu_matvec_f)(const double *x, double *y, int block_size,
                              void *ctx);
extern int ptpu_eigsh_csr(long long n, long long nnz, const long long *indptr,
                          const long long *indices, const double *data, int k,
                          const char *which, double tol, const char *method,
                          double sigma, double *evals, double *evecs,
                          double *resnorms);
extern int ptpu_eigsh_matvec(long long n, ptpu_matvec_f matvec, void *ctx,
                             int k, const char *which, double tol,
                             const char *method, double sigma,
                             long long max_matvecs, double *evals,
                             double *evecs, double *resnorms);
extern int ptpu_svds_csr(long long m, long long n, long long nnz,
                         const long long *indptr, const long long *indices,
                         const double *data, int k, const char *which,
                         double tol, double *svals, double *u, double *v);
extern void ptpu_eigsh_csr_(const long long *n, const long long *nnz,
                            const long long *indptr, const long long *indices,
                            const double *data, const int *k,
                            const int *target, const double *tol,
                            const double *sigma, double *evals, double *evecs,
                            double *resnorms, int *ierr);
extern const char *ptpu_last_error(void);
extern long long ptpu_svds_params_create(void);
extern int ptpu_svds_params_free(long long h);
extern int ptpu_svds_params_set(long long h, const char *label,
                                const char *value);
extern int ptpu_svds_params_set_method(long long h, const char *method,
                                       const char *m1, const char *m2);
extern int ptpu_svds_params_get(long long h, const char *label, double *out);
extern int ptpu_svds_run(long long h, long long m, long long n, long long nnz,
                         const long long *indptr, const long long *indices,
                         const double *data, double *svals, double *u,
                         double *v, double *resnorms);
extern long long ptpu_params_create(void);
extern int ptpu_params_free(long long h);
extern int ptpu_params_set(long long h, const char *label, const char *value);
extern int ptpu_params_set_method(long long h, const char *method);
extern int ptpu_params_get(long long h, const char *label, double *out);
extern int ptpu_eigsh_run(long long h, long long n, long long nnz,
                          const long long *indptr, const long long *indices,
                          const double *data, double *evals, double *evecs,
                          double *resnorms);

#define N 120
#define K 3

/* tridiagonal (-1, 2, -1) Laplacian in CSR */
static long long indptr[N + 1], indices[3 * N];
static double data[3 * N];
static long long nnz = 0;

static void build_csr(void) {
  long long p = 0;
  for (long long i = 0; i < N; i++) {
    indptr[i] = p;
    if (i > 0) { indices[p] = i - 1; data[p++] = -1.0; }
    indices[p] = i; data[p++] = 2.0;
    if (i < N - 1) { indices[p] = i + 1; data[p++] = -1.0; }
  }
  indptr[N] = nnz = p;
}

/* the same operator as a matvec callback (column-major blocks) */
static void lap_matvec(const double *x, double *y, int bs, void *ctx) {
  (void)ctx;
  for (int b = 0; b < bs; b++) {
    const double *xc = x + (long long)b * N;
    double *yc = y + (long long)b * N;
    for (int i = 0; i < N; i++) {
      double v = 2.0 * xc[i];
      if (i > 0) v -= xc[i - 1];
      if (i < N - 1) v -= xc[i + 1];
      yc[i] = v;
    }
  }
}

static double exact(int i) { /* i-th smallest, 1-based */
  return 2.0 - 2.0 * cos(M_PI * i / (N + 1));
}

static int check(const char *name, const double *evals,
                 const double *resnorms) {
  int bad = 0;
  for (int i = 0; i < K; i++) {
    double err = fabs(evals[i] - exact(i + 1));
    if (err > 1e-8 || resnorms[i] > 1e-7) bad++;
    printf("  %s eval[%d] = %.12f (exact %.12f, err %.2e, rnorm %.2e)\n",
           name, i, evals[i], exact(i + 1), err, resnorms[i]);
  }
  return bad;
}

int main(void) {
  double evals[K], resnorms[K];
  static double evecs[(long long)N * K];
  int bad = 0, rc;

  build_csr();

  rc = ptpu_eigsh_csr(N, nnz, indptr, indices, data, K, "SA", 1e-10, "", 0.0,
                      evals, evecs, resnorms);
  if (rc) { printf("eigsh_csr rc=%d: %s\n", rc, ptpu_last_error()); return 1; }
  bad += check("csr", evals, resnorms);

  rc = ptpu_eigsh_matvec(N, lap_matvec, NULL, K, "SA", 1e-10, "", 0.0, 0,
                         evals, evecs, resnorms);
  if (rc) { printf("eigsh_matvec rc=%d: %s\n", rc, ptpu_last_error()); return 1; }
  bad += check("matvec", evals, resnorms);

  { /* F77 binding: target code 0 = smallest */
    long long n = N, nz = nnz;
    int k = K, target = 0, ierr = -1;
    double tol = 1e-10, sigma = 0.0;
    ptpu_eigsh_csr_(&n, &nz, indptr, indices, data, &k, &target, &tol,
                    &sigma, evals, evecs, resnorms, &ierr);
    if (ierr) { printf("f77 ierr=%d: %s\n", ierr, ptpu_last_error()); return 1; }
    bad += check("f77", evals, resnorms);
  }

  { /* svds on a rectangular slice of the Laplacian (first N-20 columns) */
    static double svals[K], u[(long long)N * K], v[(long long)(N - 20) * K];
    /* build CSR of the N x (N-20) submatrix */
    static long long ip2[N + 1], ix2[3 * N];
    static double d2[3 * N];
    long long p = 0;
    for (long long i = 0; i < N; i++) {
      ip2[i] = p;
      for (long long q = indptr[i]; q < indptr[i + 1]; q++)
        if (indices[q] < N - 20) { ix2[p] = indices[q]; d2[p++] = data[q]; }
    }
    ip2[N] = p;
    rc = ptpu_svds_csr(N, N - 20, p, ip2, ix2, d2, K, "LM", 1e-9, svals, u, v);
    if (rc) { printf("svds_csr rc=%d: %s\n", rc, ptpu_last_error()); return 1; }
    printf("  svds svals: %.6f %.6f %.6f (expect < 4.0, descending set)\n",
           svals[0], svals[1], svals[2]);
    for (int i = 0; i < K; i++)
      if (!(svals[i] > 0.0 && svals[i] < 4.0)) bad++;
  }

  { /* parameter-object surface: JDQMR + interior target via the full
     * configuration API (primme_params_create/set_method/set_member
     * analogue, include/primme_eigs.h:461-477) */
    long long h = ptpu_params_create();
    double out = 0.0;
    if (h <= 0) { printf("params_create: %s\n", ptpu_last_error()); return 1; }
    rc = ptpu_params_set(h, "numEvals", "3");
    rc |= ptpu_params_set(h, "eps", "1e-10");
    rc |= ptpu_params_set(h, "target", "primme_closest_abs");
    rc |= ptpu_params_set(h, "targetShifts", "1.2");
    rc |= ptpu_params_set_method(h, "PRIMME_JDQMR");
    rc |= ptpu_params_set(h, "maxBlockSize", "2"); /* overrides the preset */
    if (rc) { printf("params_set: %s\n", ptpu_last_error()); return 1; }
    rc = ptpu_params_get(h, "maxBlockSize", &out);
    if (rc || out != 2.0) { printf("params_get maxBlockSize=%g rc=%d\n", out, rc); return 1; }
    if (ptpu_params_set(h, "noSuchMember", "1") == 0) {
      printf("params_set accepted an unknown label\n"); return 1;
    }
    rc = ptpu_eigsh_run(h, N, nnz, indptr, indices, data, evals, evecs,
                        resnorms);
    if (rc) { printf("eigsh_run rc=%d: %s\n", rc, ptpu_last_error()); return 1; }
    /* the 3 eigenvalues closest to 1.2: find them from the exact set */
    for (int i = 0; i < K; i++) {
      double best = 1e30;
      for (int j = 1; j <= N; j++) {
        double d = fabs(evals[i] - exact(j));
        if (d < best) best = d;
      }
      if (best > 1e-8 || fabs(evals[i] - 1.2) > 0.08 || resnorms[i] > 1e-7)
        bad++;
      printf("  run eval[%d] = %.12f (dist to spectrum %.2e, rnorm %.2e)\n",
             i, evals[i], best, resnorms[i]);
    }
    if (ptpu_params_free(h) != 0 || ptpu_params_free(h) == 0) {
      printf("params_free lifecycle broken\n"); return 1;
    }
  }

  { /* svds parameter-object surface: smallest triplets of the N x (N-20)
     * slice through the primme_svds_params analogue */
    static double svals[K], u[(long long)N * K], v[(long long)(N - 20) * K];
    static double srn[K];
    static long long ip2[N + 1], ix2[3 * N];
    static double d2[3 * N];
    long long p = 0, h;
    double out = 0.0;
    for (long long i = 0; i < N; i++) {
      ip2[i] = p;
      for (long long q = indptr[i]; q < indptr[i + 1]; q++)
        if (indices[q] < N - 20) { ix2[p] = indices[q]; d2[p++] = data[q]; }
    }
    ip2[N] = p;
    h = ptpu_svds_params_create();
    if (h <= 0) { printf("svds_params_create: %s\n", ptpu_last_error()); return 1; }
    rc = ptpu_svds_params_set(h, "numSvals", "3");
    rc |= ptpu_svds_params_set(h, "eps", "1e-9");
    rc |= ptpu_svds_params_set(h, "target", "primme_svds_smallest");
    rc |= ptpu_svds_params_set(h, "primme.maxBlockSize", "2");
    rc |= ptpu_svds_params_set_method(h, "primme_svds_hybrid", "", "JDQMR");
    if (rc) { printf("svds_params_set: %s\n", ptpu_last_error()); return 1; }
    rc = ptpu_svds_params_get(h, "numSvals", &out);
    if (rc || out != 3.0) { printf("svds_params_get numSvals=%g\n", out); return 1; }
    rc = ptpu_svds_run(h, N, N - 20, p, ip2, ix2, d2, svals, u, v, srn);
    if (rc) { printf("svds_run rc=%d: %s\n", rc, ptpu_last_error()); return 1; }
    printf("  svds_run svals: %.6f %.6f %.6f (smallest of the slice)\n",
           svals[0], svals[1], svals[2]);
    for (int i = 0; i < K; i++)
      if (!(svals[i] > 0.0 && svals[i] < 1.0 && srn[i] < 1e-7)) bad++;
    if (ptpu_svds_params_free(h) != 0) { printf("svds_params_free\n"); return 1; }
  }

  if (bad) { printf("FAILED (%d checks)\n", bad); return 1; }
  printf("CAPI OK\n");
  return 0;
}
