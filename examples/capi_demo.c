/* C-ABI demo: two-subdomain overlapping Schwarz on a 2-D Laplacian,
 * driven entirely from C through libhpddm_tpu_c (the reference's
 * examples/schwarz.c role for the exportable interface,
 * interface/HPDDM.h:66-123).
 *
 * The 20x20 5-point Laplacian is split into two overlapping horizontal
 * strips sharing two grid rows; the POU is 1 on owned rows and 0 on each
 * strip's outermost shared row (the exchange-correctness rule).  Solves
 * with one-level RAS GMRES and checks the global residual, plus a local
 * Numfact/Solve round-trip.
 *
 * Build & run: see tests/test_capi.py (PYTHONPATH must reach hpddm_tpu).
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../hpddm_tpu/native/hpddm_tpu_c.h"

#define NX 20
#define NY 20

/* assemble the 5-point Laplacian on rows [r0, r1) x NX, columns
 * restricted to the same range; Dirichlet via diagonal shift is not
 * needed — the global operator includes boundary identity behavior by
 * simply dropping outside couplings */
static long long strip_matrix(int r0, int r1) {
  int n = (r1 - r0) * NX;
  double *a = malloc(sizeof(double) * n * 5);
  int *ia = malloc(sizeof(int) * (n + 1));
  int *ja = malloc(sizeof(int) * n * 5);
  int nnz = 0;
  ia[0] = 0;
  for (int r = r0; r < r1; ++r)
    for (int c = 0; c < NX; ++c) {
      int i = (r - r0) * NX + c;
      if (r > r0) { a[nnz] = -1.0; ja[nnz++] = i - NX; }
      if (c > 0) { a[nnz] = -1.0; ja[nnz++] = i - 1; }
      a[nnz] = 4.0; ja[nnz++] = i;
      if (c < NX - 1) { a[nnz] = -1.0; ja[nnz++] = i + 1; }
      if (r < r1 - 1) { a[nnz] = -1.0; ja[nnz++] = i + NX; }
      ia[i + 1] = nnz;
    }
  long long h = HpddmTpuMatrixCSRCreate(n, n, nnz, a, ia, ja, 0);
  free(a); free(ia); free(ja);
  return h;
}

int main(void) {
  if (HpddmTpuInit() != 0) { fprintf(stderr, "init failed\n"); return 1; }
  HpddmTpuOptionSet("-hpddm_tol 1e-8 -hpddm_max_it 200");
  if (fabs(HpddmTpuOptionVal("tol") - 1e-8) > 1e-20) {
    fprintf(stderr, "option round-trip failed\n");
    return 1;
  }

  /* strips: rows [0, 11) and [9, 20) — shared grid rows 9, 10 */
  int r0[2] = {0, 9}, r1[2] = {11, 20};
  long long mats[2] = {strip_matrix(0, 11), strip_matrix(9, 20)};

  /* local Numfact/Solve round-trip on subdomain 0 */
  {
    int n = 11 * NX;
    double *b = malloc(sizeof(double) * n), *x = malloc(sizeof(double) * n),
           *y = malloc(sizeof(double) * n);
    for (int i = 0; i < n; ++i) b[i] = 1.0 + 0.001 * i;
    long long f = HpddmTpuSubdomainNumfact(mats[0]);
    HpddmTpuSubdomainSolve(f, b, x, 1);
    HpddmTpuCSRMM(mats[0], x, y, 1);
    double err = 0.0;
    for (int i = 0; i < n; ++i) err = fmax(err, fabs(y[i] - b[i]));
    printf("local numfact/solve max err: %.2e\n", err);
    if (err > 1e-4) return 1;
    HpddmTpuSubdomainDestroy(f);
    free(b); free(x); free(y);
  }

  long long sch = HpddmTpuSchwarzCreate(2);
  for (int s = 0; s < 2; ++s) {
    int n = (r1[s] - r0[s]) * NX;
    int nbr = 1 - s;
    int shared = 2 * NX;                 /* grid rows 9 and 10 */
    int *map = malloc(sizeof(int) * shared);
    int base = (9 - r0[s]) * NX;         /* local index of grid row 9 */
    for (int k = 0; k < shared; ++k) map[k] = base + k;
    double *d = malloc(sizeof(double) * n);
    for (int i = 0; i < n; ++i) d[i] = 1.0;
    /* outermost shared row gets POU 0: row 10 for strip 0, row 9 for 1 */
    int zero_row = (s == 0) ? 10 : 9;
    for (int k = 0; k < NX; ++k) d[(zero_row - r0[s]) * NX + k] = 0.0;
    int sizes[1] = {shared};
    HpddmTpuSchwarzSetSubdomain(sch, s, mats[s], 1, &nbr, sizes, map, d);
    free(map); free(d);
  }
  if (HpddmTpuSchwarzBuild(sch) != 0) {
    fprintf(stderr, "build failed\n");
    return 1;
  }

  double *f[2], *x[2];
  for (int s = 0; s < 2; ++s) {
    int n = (r1[s] - r0[s]) * NX;
    f[s] = malloc(sizeof(double) * n);
    x[s] = malloc(sizeof(double) * n);
    for (int i = 0; i < n; ++i) f[s][i] = 1.0;
  }
  int its = HpddmTpuSolve(sch, f, x, 2, 1);
  double nr = -1.0;
  HpddmTpuSchwarzComputeResidual(sch, x, f, &nr, 2, 1);
  printf("its=%d residual=%.2e\n", its, nr);
  /* solutions must agree on the shared rows */
  double diff = 0.0;
  for (int k = 0; k < 2 * NX; ++k)
    diff = fmax(diff, fabs(x[0][9 * NX + k] - x[1][k]));
  printf("overlap agreement: %.2e\n", diff);
  HpddmTpuSchwarzDestroy(sch);
  if (its <= 0 || its > 100 || nr > 1e-5 || diff > 1e-5) return 1;
  printf("PASS\n");
  return 0;
}
