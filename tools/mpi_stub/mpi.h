/* MPI stub for building the reference HPDDM examples WITHOUT MPI, in two
 * modes, for cross-implementation parity tests (tools/refparity.py):
 *
 *   default             — single-process np=1 semantics (round 4): every
 *                         collective is a copy, point-to-point aborts as
 *                         unreachable.  Header-only static inline.
 *   -DHPDDM_STUB_MULTIRANK — single-MACHINE multi-rank runtime (round 5):
 *                         MPI_Init forks HPDDM_STUB_NP processes wired by
 *                         socketpairs; point-to-point, waits, and the
 *                         collectives are implemented for real in
 *                         mpi_multirank.cpp (same directory; compile and
 *                         link it alongside).
 *
 * Datatype values encode (kind << 8 | byte size): the multi-rank
 * reductions need type identity, the np=1 copies only the size.
 */
#ifndef HPDDM_TPU_MPI_STUB_H
#define HPDDM_TPU_MPI_STUB_H

#include <string.h>
#include <stdlib.h>
#include <stdio.h>
#include <time.h>

#define MPI_VERSION 3
#define MPI_MAJOR_VERSION 3
#define MPI_MINOR_VERSION 1

typedef int MPI_Comm;
typedef int MPI_Group;
typedef int MPI_Op;
typedef void *MPI_Request;
typedef int MPI_Datatype; /* value == (kind << 8) | sizeof(one element) */
typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR, count_bytes; } MPI_Status;
typedef void(MPI_User_function)(void *, void *, int *, MPI_Datatype *);

#define MPI_SUCCESS 0
#define MPI_COMM_NULL ((MPI_Comm)0)
#define MPI_COMM_WORLD ((MPI_Comm)91)
#define MPI_COMM_SELF ((MPI_Comm)92)
#define MPI_GROUP_NULL ((MPI_Group)0)
#define MPI_REQUEST_NULL ((MPI_Request)0)
#define MPI_OP_NULL ((MPI_Op)0)
#define MPI_SUM ((MPI_Op)101)
#define MPI_MAX ((MPI_Op)102)
#define MPI_MIN ((MPI_Op)103)
#define MPI_BOR ((MPI_Op)104)
#define MPI_LOR ((MPI_Op)105)

/* kind: 0 raw bytes, 1 signed int, 2 unsigned int, 3 real, 4 complex */
#define MPI_STUB_T(k, s) ((MPI_Datatype)(((k) << 8) | (s)))
#define MPI_STUB_SIZE(t) ((int)((t) & 0xff))
#define MPI_DATATYPE_NULL ((MPI_Datatype)0)
#define MPI_BYTE MPI_STUB_T(0, 1)
#define MPI_CHAR MPI_STUB_T(1, 1)
#define MPI_UNSIGNED_CHAR MPI_STUB_T(2, 1)
#define MPI_SHORT MPI_STUB_T(1, 2)
#define MPI_UNSIGNED_SHORT MPI_STUB_T(2, 2)
#define MPI_INT MPI_STUB_T(1, 4)
#define MPI_UNSIGNED MPI_STUB_T(2, 4)
#define MPI_FLOAT MPI_STUB_T(3, 4)
#define MPI_LONG MPI_STUB_T(1, 8)
#define MPI_UNSIGNED_LONG MPI_STUB_T(2, 8)
#define MPI_LONG_LONG MPI_STUB_T(1, 8)
#define MPI_UNSIGNED_LONG_LONG MPI_STUB_T(2, 8)
#define MPI_DOUBLE MPI_STUB_T(3, 8)
#define MPI_C_COMPLEX MPI_STUB_T(4, 8)
#define MPI_C_FLOAT_COMPLEX MPI_STUB_T(4, 8)
#define MPI_C_DOUBLE_COMPLEX MPI_STUB_T(4, 16)

#define MPI_IN_PLACE ((void *)(-1))
#define MPI_STATUS_IGNORE ((MPI_Status *)0)
#define MPI_STATUSES_IGNORE ((MPI_Status *)0)
#define MPI_ANY_SOURCE (-1)
#define MPI_ANY_TAG (-1)
#define MPI_UNDEFINED (-32766)
#define MPI_IDENT 0
#define MPI_CONGRUENT 1
#define MPI_SIMILAR 2
#define MPI_UNEQUAL 3
#define MPI_THREAD_SINGLE 0
#define MPI_THREAD_FUNNELED 1
#define MPI_THREAD_SERIALIZED 2
#define MPI_THREAD_MULTIPLE 3

#ifdef HPDDM_STUB_MULTIRANK
/* ------------------------------------------------------------------ *
 * Multi-rank mode: real implementations live in mpi_multirank.cpp.   *
 * ------------------------------------------------------------------ */
#ifdef __cplusplus
extern "C" {
#endif
int MPI_Init(int *argc, char ***argv);
int MPI_Init_thread(int *argc, char ***argv, int req, int *prov);
int MPI_Finalize(void);
int MPI_Finalized(int *flag);
int MPI_Initialized(int *flag);
int MPI_Abort(MPI_Comm c, int code);
double MPI_Wtime(void);
int MPI_Comm_size(MPI_Comm c, int *s);
int MPI_Comm_rank(MPI_Comm c, int *r);
int MPI_Comm_dup(MPI_Comm c, MPI_Comm *out);
int MPI_Comm_free(MPI_Comm *c);
int MPI_Comm_group(MPI_Comm c, MPI_Group *g);
int MPI_Comm_create(MPI_Comm c, MPI_Group g, MPI_Comm *out);
int MPI_Comm_compare(MPI_Comm a, MPI_Comm b, int *res);
int MPI_Barrier(MPI_Comm c);
int MPI_Group_size(MPI_Group g, int *s);
int MPI_Group_incl(MPI_Group g, int n, const int *ranks, MPI_Group *out);
int MPI_Group_excl(MPI_Group g, int n, const int *ranks, MPI_Group *out);
int MPI_Group_range_incl(MPI_Group g, int n, int ranges[][3], MPI_Group *out);
int MPI_Group_free(MPI_Group *g);
int MPI_Op_create(MPI_User_function *fn, int commute, MPI_Op *op);
int MPI_Op_free(MPI_Op *op);
int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op, MPI_Comm c);
int MPI_Exscan(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op, MPI_Comm c);
int MPI_Bcast(void *b, int n, MPI_Datatype t, int root, MPI_Comm c);
int MPI_Allgather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, MPI_Comm c);
int MPI_Gather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c);
int MPI_Scatter(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c);
int MPI_Allgatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, MPI_Comm c);
int MPI_Gatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, int root, MPI_Comm c);
int MPI_Scatterv(const void *s, const int *sn, const int *displs, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c);
int MPI_Igather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq);
int MPI_Igatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq);
int MPI_Iscatter(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq);
int MPI_Iscatterv(const void *s, const int *sn, const int *displs, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq);
int MPI_Isend(const void *b, int n, MPI_Datatype t, int dst, int tag, MPI_Comm c, MPI_Request *rq);
int MPI_Irecv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c, MPI_Request *rq);
int MPI_Send(const void *b, int n, MPI_Datatype t, int dst, int tag, MPI_Comm c);
int MPI_Recv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c, MPI_Status *st);
int MPI_Wait(MPI_Request *rq, MPI_Status *st);
int MPI_Waitall(int n, MPI_Request *rqs, MPI_Status *sts);
int MPI_Waitany(int n, MPI_Request *rqs, int *index, MPI_Status *st);
int MPI_Testall(int n, MPI_Request *rqs, int *flag, MPI_Status *sts);
int MPI_Get_count(const MPI_Status *st, MPI_Datatype t, int *count);
#ifdef __cplusplus
}
#endif

#else /* !HPDDM_STUB_MULTIRANK ------------------------------------------ *
       * Single-process np=1 semantics (round 4), header-only.           *
       * --------------------------------------------------------------- */

static inline int MPI_Init(int *argc, char ***argv) { (void)argc; (void)argv; return 0; }
static inline int MPI_Init_thread(int *argc, char ***argv, int req, int *prov) { (void)argc; (void)argv; (void)req; if (prov) *prov = MPI_THREAD_MULTIPLE; return 0; }
static inline int MPI_Finalize(void) { return 0; }
static inline int MPI_Finalized(int *flag) { if (flag) *flag = 0; return 0; }
static inline int MPI_Initialized(int *flag) { if (flag) *flag = 1; return 0; }
static inline int MPI_Abort(MPI_Comm c, int code) { (void)c; exit(code ? code : 1); }
static inline double MPI_Wtime(void) { struct timespec t; clock_gettime(CLOCK_MONOTONIC, &t); return (double)t.tv_sec + 1e-9 * (double)t.tv_nsec; }

static inline int MPI_Comm_size(MPI_Comm c, int *s) { (void)c; *s = 1; return 0; }
static inline int MPI_Comm_rank(MPI_Comm c, int *r) { (void)c; *r = 0; return 0; }
static inline int MPI_Comm_dup(MPI_Comm c, MPI_Comm *out) { *out = c; return 0; }
static inline int MPI_Comm_free(MPI_Comm *c) { *c = MPI_COMM_NULL; return 0; }
static inline int MPI_Comm_group(MPI_Comm c, MPI_Group *g) { (void)c; *g = 1; return 0; }
static inline int MPI_Comm_create(MPI_Comm c, MPI_Group g, MPI_Comm *out) { (void)g; *out = c; return 0; }
static inline int MPI_Comm_compare(MPI_Comm a, MPI_Comm b, int *res) { *res = (a == b) ? MPI_IDENT : MPI_CONGRUENT; return 0; }
static inline int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }

static inline int MPI_Group_incl(MPI_Group g, int n, const int *ranks, MPI_Group *out) { (void)g; (void)n; (void)ranks; *out = 1; return 0; }
static inline int MPI_Group_excl(MPI_Group g, int n, const int *ranks, MPI_Group *out) { (void)g; (void)n; (void)ranks; *out = 1; return 0; }
static inline int MPI_Group_range_incl(MPI_Group g, int n, int ranges[][3], MPI_Group *out) { (void)g; (void)n; (void)ranges; *out = 1; return 0; }
static inline int MPI_Group_free(MPI_Group *g) { *g = MPI_GROUP_NULL; return 0; }

static inline int MPI_Op_create(MPI_User_function *fn, int commute, MPI_Op *op) { (void)fn; (void)commute; *op = 106; return 0; }
static inline int MPI_Op_free(MPI_Op *op) { *op = MPI_OP_NULL; return 0; }

/* one-rank collectives: identity / copy */
static inline int mpi_stub_copy_(const void *src, void *dst, long long bytes)
{
  if (src != MPI_IN_PLACE && src != dst && bytes > 0) memcpy(dst, src, (size_t)bytes);
  return 0;
}
static inline int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op, MPI_Comm c) { (void)op; (void)c; return mpi_stub_copy_(s, r, (long long)n * MPI_STUB_SIZE(t)); }
static inline int MPI_Exscan(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op, MPI_Comm c) { (void)s; (void)r; (void)n; (void)t; (void)op; (void)c; return 0; /* rank 0 result undefined */ }
static inline int MPI_Bcast(void *b, int n, MPI_Datatype t, int root, MPI_Comm c) { (void)b; (void)n; (void)t; (void)root; (void)c; return 0; }
static inline int MPI_Allgather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, MPI_Comm c) { (void)rn; (void)rt; (void)c; return mpi_stub_copy_(s, r, (long long)sn * MPI_STUB_SIZE(st)); }
static inline int MPI_Gather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c) { (void)rn; (void)rt; (void)root; (void)c; return mpi_stub_copy_(s, r, (long long)sn * MPI_STUB_SIZE(st)); }
static inline int MPI_Scatter(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c) { (void)rn; (void)rt; (void)root; (void)c; return mpi_stub_copy_(s, r, (long long)sn * MPI_STUB_SIZE(st)); }
static inline int MPI_Allgatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, MPI_Comm c)
{
  (void)c;
  if (s == MPI_IN_PLACE) return 0;
  return mpi_stub_copy_(s, (char *)r + (displs ? (long long)displs[0] * MPI_STUB_SIZE(rt) : 0), sn ? (long long)sn * MPI_STUB_SIZE(st) : (long long)rn[0] * MPI_STUB_SIZE(rt));
}
static inline int MPI_Gatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, int root, MPI_Comm c) { (void)root; return MPI_Allgatherv(s, sn, st, r, rn, displs, rt, c); }
static inline int MPI_Scatterv(const void *s, const int *sn, const int *displs, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c)
{
  (void)rn; (void)rt; (void)root; (void)c;
  if (r == MPI_IN_PLACE || s == MPI_IN_PLACE) return 0;
  return mpi_stub_copy_((const char *)s + (displs ? (long long)displs[0] * MPI_STUB_SIZE(st) : 0), r, (long long)sn[0] * MPI_STUB_SIZE(st));
}

/* nonblocking collectives: complete immediately */
static inline int MPI_Igather(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq) { *rq = MPI_REQUEST_NULL; return MPI_Gather(s, sn, st, r, rn, rt, root, c); }
static inline int MPI_Igatherv(const void *s, int sn, MPI_Datatype st, void *r, const int *rn, const int *displs, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq) { *rq = MPI_REQUEST_NULL; return MPI_Gatherv(s, sn, st, r, rn, displs, rt, root, c); }
static inline int MPI_Iscatter(const void *s, int sn, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq) { *rq = MPI_REQUEST_NULL; return MPI_Scatter(s, sn, st, r, rn, rt, root, c); }
static inline int MPI_Iscatterv(const void *s, const int *sn, const int *displs, MPI_Datatype st, void *r, int rn, MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq) { *rq = MPI_REQUEST_NULL; return MPI_Scatterv(s, sn, displs, st, r, rn, rt, root, c); }

/* point-to-point: unreachable at one rank (no neighbors) */
static inline int mpi_stub_no_p2p_(const char *fn)
{
  fprintf(stderr, "mpi_stub: %s called in a 1-rank run — unreachable by construction\n", fn);
  exit(99);
}
static inline int MPI_Isend(const void *b, int n, MPI_Datatype t, int dst, int tag, MPI_Comm c, MPI_Request *rq) { (void)b; (void)n; (void)t; (void)dst; (void)tag; (void)c; (void)rq; return mpi_stub_no_p2p_("MPI_Isend"); }
static inline int MPI_Irecv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c, MPI_Request *rq) { (void)b; (void)n; (void)t; (void)src; (void)tag; (void)c; (void)rq; return mpi_stub_no_p2p_("MPI_Irecv"); }
static inline int MPI_Send(const void *b, int n, MPI_Datatype t, int dst, int tag, MPI_Comm c) { (void)b; (void)n; (void)t; (void)dst; (void)tag; (void)c; return mpi_stub_no_p2p_("MPI_Send"); }
static inline int MPI_Recv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c, MPI_Status *st) { (void)b; (void)n; (void)t; (void)src; (void)tag; (void)c; (void)st; return mpi_stub_no_p2p_("MPI_Recv"); }

static inline int MPI_Wait(MPI_Request *rq, MPI_Status *st) { *rq = MPI_REQUEST_NULL; if (st) { st->MPI_SOURCE = 0; st->MPI_TAG = 0; st->MPI_ERROR = 0; st->count_bytes = 0; } return 0; }
static inline int MPI_Waitall(int n, MPI_Request *rqs, MPI_Status *sts) { int i; for (i = 0; i < n; ++i) MPI_Wait(rqs + i, sts ? sts + i : 0); return 0; }
static inline int MPI_Waitany(int n, MPI_Request *rqs, int *index, MPI_Status *st)
{
  (void)rqs; (void)st;
  *index = (n > 0) ? 0 : MPI_UNDEFINED; /* pending requests are always NULL here */
  return 0;
}
static inline int MPI_Testall(int n, MPI_Request *rqs, int *flag, MPI_Status *sts) { (void)n; (void)rqs; (void)sts; if (flag) *flag = 1; return 0; }
static inline int MPI_Get_count(const MPI_Status *st, MPI_Datatype t, int *count) { *count = st ? st->count_bytes / (MPI_STUB_SIZE(t) ? MPI_STUB_SIZE(t) : 1) : 0; return 0; }

#endif /* HPDDM_STUB_MULTIRANK */
#endif /* HPDDM_TPU_MPI_STUB_H */
