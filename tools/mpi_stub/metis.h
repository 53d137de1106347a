/* METIS shim for the reference parity builds (no METIS on this image).
 *
 * np=1 (round 4): never called (generateFromFile partitions only when
 * sizeWorld > 1).  np>1 (round 5, multi-rank stub): provides a real
 * k-way partition so schwarzFromFile runs:
 *
 *   - if HPDDM_STUB_PARTITION names a file, reads one part id per vertex
 *     (ascii) — the parity tests write the partition computed by OUR
 *     partitioner (hpddm_tpu.models.fromfile.partition_kway) so both
 *     implementations solve the IDENTICAL decomposition and iteration
 *     counts are directly comparable;
 *   - otherwise: deterministic greedy graph growing (smallest part claims
 *     the next frontier vertex), self-loops ignored.
 *
 * Signature follows METIS v5 (generateFromFile.cpp:63-64 passes the CSR
 * arrays directly, 0-based at the call site, diagonal included).
 */
#ifndef HPDDM_TPU_METIS_STUB_H
#define HPDDM_TPU_METIS_STUB_H

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define METIS_VER_MAJOR 5
#define METIS_OK 1

static inline int METIS_PartGraphKway(int *nvtxs, int *ncon, int *xadj,
                                      int *adjncy, int *vwgt, int *vsize,
                                      int *adjwgt, int *nparts, float *tpwgts,
                                      float *ubvec, int *options, int *objval,
                                      int *part)
{
  (void)ncon; (void)vwgt; (void)vsize; (void)adjwgt; (void)tpwgts;
  (void)ubvec; (void)options;
  const int n = *nvtxs, k = *nparts;
  int i;
  const char *pf = getenv("HPDDM_STUB_PARTITION");
  if (pf && pf[0]) {
    FILE *f = fopen(pf, "r");
    if (!f) { fprintf(stderr, "metis stub: cannot open %s\n", pf); exit(99); }
    for (i = 0; i < n; ++i)
      if (fscanf(f, "%d", part + i) != 1 || part[i] < 0 || part[i] >= k) {
        fprintf(stderr, "metis stub: bad partition file %s at %d\n", pf, i);
        exit(99);
      }
    fclose(f);
    if (objval) *objval = 0;
    return METIS_OK;
  }
  /* greedy graph growing: k seeds spread by index, smallest part grows */
  {
    int *size = (int *)calloc((size_t)k, sizeof(int));
    int *queue = (int *)malloc((size_t)n * sizeof(int));
    int *qh = (int *)calloc((size_t)k, sizeof(int));
    int *qt = (int *)calloc((size_t)k, sizeof(int));
    int **qs = (int **)malloc((size_t)k * sizeof(int *));
    int p, done = 0;
    (void)queue;
    for (i = 0; i < n; ++i) part[i] = -1;
    for (p = 0; p < k; ++p) {
      int seed = (int)(((long long)p * n) / k);
      while (seed < n && part[seed] != -1) ++seed;
      if (seed >= n) for (seed = 0; seed < n && part[seed] != -1; ++seed) {}
      qs[p] = (int *)malloc((size_t)n * sizeof(int));
      part[seed] = p;
      qs[p][qt[p]++] = seed;
      ++size[p];
      ++done;
    }
    while (done < n) {
      int best = 0;
      for (p = 1; p < k; ++p) if (size[p] < size[best]) best = p;
      p = best;
      {
        int v = -1, j;
        while (qh[p] < qt[p]) {         /* frontier vertex of part p */
          int u = qs[p][qh[p]];
          for (j = xadj[u]; j < xadj[u + 1]; ++j)
            if (adjncy[j] != u && part[adjncy[j]] == -1) { v = adjncy[j]; break; }
          if (v >= 0) break;
          ++qh[p];
        }
        if (v < 0)                       /* disconnected: any free vertex */
          for (j = 0; j < n; ++j) if (part[j] == -1) { v = j; break; }
        part[v] = p;
        qs[p][qt[p]++] = v;
        ++size[p];
        ++done;
      }
    }
    for (p = 0; p < k; ++p) free(qs[p]);
    free(qs); free(qt); free(qh); free(queue); free(size);
  }
  if (objval) *objval = 0;
  return METIS_OK;
}

#endif
