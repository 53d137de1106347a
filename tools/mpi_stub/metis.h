/* Build-only METIS shim for the sequential (np=1) reference parity build:
 * generateFromFile.cpp only calls METIS when sizeWorld > 1, which is
 * unreachable with the single-process MPI stub — the symbol just has to
 * exist to compile/link. */
#ifndef HPDDM_TPU_METIS_STUB_H
#define HPDDM_TPU_METIS_STUB_H

#include <stdio.h>
#include <stdlib.h>

#define METIS_VER_MAJOR 5
#define METIS_OK 1

static inline int METIS_PartGraphKway(int *nvtxs, int *ncon, int *xadj,
                                      int *adjncy, int *vwgt, int *vsize,
                                      int *adjwgt, int *nparts, float *tpwgts,
                                      float *ubvec, int *options, int *objval,
                                      int *part)
{
  (void)nvtxs; (void)ncon; (void)xadj; (void)adjncy; (void)vwgt; (void)vsize;
  (void)adjwgt; (void)nparts; (void)tpwgts; (void)ubvec; (void)options;
  (void)objval; (void)part;
  fprintf(stderr, "metis stub: unreachable in a 1-rank run\n");
  exit(99);
}

#endif
