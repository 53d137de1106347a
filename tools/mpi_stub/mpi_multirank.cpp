/* Single-machine multi-rank MPI runtime for the reference parity harness.
 *
 * Purpose (VERDICT r4 missing #1): run the ACTUAL reference HPDDM Schwarz
 * examples at np in {2,4,5} so the two-level GenEO-RAS pipeline — halo
 * exchange, partition of unity, GEVP, coarse operator — produces
 * reference-derived iteration windows, not just the np=1 Jacobi path.
 *
 * Design: MPI_Init forks HPDDM_STUB_NP-1 children; every unordered rank
 * pair shares one full-duplex SOCK_STREAM socketpair created before the
 * fork.  No progress thread: sends are *buffered* (the payload is copied
 * at post time, so Isend requests complete immediately — legal MPI
 * semantics) and queued; every blocking call (waits, Recv, collectives)
 * runs a progress loop that drains pending nonblocking writes and reads,
 * so two ranks streaming large messages at each other cannot deadlock on
 * kernel socket buffers.  Collectives are implemented over point-to-point
 * with reserved tags (a per-communicator call counter — every rank calls
 * collectives on a communicator in the same order, so the tags agree).
 * Communicator context ids are derived deterministically from the parent
 * context and a per-parent creation counter (all members of the parent
 * execute the same creation sequence), so message matching by
 * (source, tag, context) is consistent without any negotiation.
 *
 * Implemented subset = what the reference's no-PETSc build actually
 * calls (see the catalog in tools/refparity.py): Isend/Irecv/Send/Recv,
 * Wait/Waitall/Waitany/Testall/Get_count, Allreduce (incl. MPI_Op_create
 * user functions, HPDDM_preconditioner.hpp:27-42), Barrier, Bcast,
 * Gather(v)/Scatter(v)/Allgather(v)/Exscan, the I-variants (blocking,
 * immediately complete — fine: HPDDM_ICOLLECTIVE is off), and
 * communicator/group management (dup/free/group/create/incl/excl/
 * range_incl/compare).
 */
#define HPDDM_STUB_MULTIRANK 1
#include "mpi.h"

#include <errno.h>
#include <fcntl.h>
#include <poll.h>
#include <signal.h>
#include <stdint.h>
#include <sys/prctl.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

#include <algorithm>
#include <complex>
#include <cstring>
#include <deque>
#include <list>
#include <map>
#include <vector>

namespace {

struct Hdr {
  int32_t src, tag, ctx, pad;
  int64_t nbytes;
};

struct Message {
  int src, tag, ctx;
  std::vector<char> data;
};

struct Req {
  bool done = false;
  bool recv = false;
  void *buf = nullptr;
  long long cap = 0;
  int src = 0, tag = 0, ctx = 0;
  MPI_Status st{};
};

struct OutMsg {
  std::vector<char> packet;  // header + payload, contiguous
  size_t written = 0;
};

struct InState {
  char hdr[sizeof(Hdr)];
  size_t hgot = 0;
  std::vector<char> payload;
  size_t pgot = 0;
  bool in_payload = false;
};

struct CommInfo {
  std::vector<int> wr;   // world ranks, comm rank i -> wr[i]
  int my = -1;           // my comm rank
  int ctx = 0;
  uint32_t coll_seq = 0; // per-comm collective call counter (tag basis)
  uint32_t mk_seq = 0;   // per-comm child-communicator counter (ctx basis)
};

struct State {
  bool initialized = false, finalized = false;
  int np = 1, rank = 0;
  std::vector<int> fds;                    // per world rank, -1 for self
  std::vector<pid_t> children;             // rank 0 only
  pid_t parent = 0;                        // nonzero on children
  std::vector<std::deque<OutMsg>> outq;    // per world rank
  std::vector<InState> ins;                // per world rank
  std::vector<char> dead;                  // peer exited (EOF seen)
  std::deque<Message> unexpected;
  std::list<Req *> posted;
  std::map<int, CommInfo> comms;           // handle -> info
  std::map<int, std::vector<int>> groups;  // handle -> world ranks
  std::map<int, MPI_User_function *> ops;  // handle -> user fn
  int next_comm = 100, next_group = 500, next_op = 200;
};

State g;

const int COLL_TAG_BASE = 1 << 24;

void die(const char *msg)
{
  fprintf(stderr, "mpi_multirank[rank %d]: fatal: %s (%s)\n", g.rank, msg,
          strerror(errno));
  fflush(stderr);
  _exit(98);
}

CommInfo *info(MPI_Comm c)
{
  auto it = g.comms.find(c);
  if (it == g.comms.end()) die("unknown communicator handle");
  return &it->second;
}

uint32_t mix_ctx(uint32_t parent, uint32_t seq)
{
  uint32_t x = parent * 1000003u + seq * 7919u + 0x9e3779b9u;
  x ^= x >> 16;
  x *= 0x45d9f3bu;
  x ^= x >> 13;
  return (x & 0x3fffffffu) | 2u;  // never 0/1 (world/self)
}

/* ---------------- progress engine (single-threaded) ----------------- */

bool flush_one(int wr_rank)
{
  // returns true if any progress was made
  bool progressed = false;
  auto &q = g.outq[wr_rank];
  int fd = g.fds[wr_rank];
  while (!q.empty()) {
    OutMsg &m = q.front();
    ssize_t k = write(fd, m.packet.data() + m.written,
                      m.packet.size() - m.written);
    if (k > 0) {
      m.written += (size_t)k;
      progressed = true;
      if (m.written == m.packet.size()) {
        q.pop_front();
        continue;
      }
    } else if (k < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      break;
    } else if (k < 0 && errno == EINTR) {
      continue;
    } else if (k < 0 && (errno == EPIPE || errno == ECONNRESET)) {
      // peer exited (past its Finalize barrier): anything still queued
      // to it can no longer be needed by a correct program
      q.clear();
      break;
    } else {
      die("peer write failed");
    }
  }
  return progressed;
}

void deliver(Message &&msg)
{
  for (auto it = g.posted.begin(); it != g.posted.end(); ++it) {
    Req *r = *it;
    if (r->ctx == msg.ctx &&
        (r->src == MPI_ANY_SOURCE || r->src == msg.src) &&
        (r->tag == MPI_ANY_TAG || r->tag == msg.tag)) {
      long long nb = (long long)msg.data.size();
      if (nb > r->cap) nb = r->cap;  // truncation: HPDDM sizes correctly
      if (nb > 0) memcpy(r->buf, msg.data.data(), (size_t)nb);
      r->st.MPI_SOURCE = msg.src;
      r->st.MPI_TAG = msg.tag;
      r->st.MPI_ERROR = 0;
      r->st.count_bytes = (int)nb;
      r->done = true;
      g.posted.erase(it);
      return;
    }
  }
  g.unexpected.push_back(std::move(msg));
}

bool read_one(int wr_rank)
{
  bool progressed = false;
  int fd = g.fds[wr_rank];
  InState &s = g.ins[wr_rank];
  for (;;) {
    if (!s.in_payload) {
      ssize_t k = read(fd, s.hdr + s.hgot, sizeof(Hdr) - s.hgot);
      if (k > 0) {
        s.hgot += (size_t)k;
        progressed = true;
        if (s.hgot == sizeof(Hdr)) {
          Hdr h;
          memcpy(&h, s.hdr, sizeof(Hdr));
          s.payload.resize((size_t)h.nbytes);
          s.pgot = 0;
          s.in_payload = true;
          if (h.nbytes == 0) {
            deliver(Message{h.src, h.tag, h.ctx, std::move(s.payload)});
            s.payload = std::vector<char>();
            s.hgot = 0;
            s.in_payload = false;
          }
          continue;
        }
      } else if (k == 0) {
        // EOF: the peer exited past its Finalize barrier; the stream
        // returned all buffered data before this point
        close(fd);
        g.fds[wr_rank] = -1;
        g.dead[wr_rank] = 1;
        break;
      } else if (errno == EAGAIN || errno == EWOULDBLOCK) {
        break;
      } else if (errno == EINTR) {
        continue;
      } else {
        die("peer read failed");
      }
    } else {
      ssize_t k = read(fd, s.payload.data() + s.pgot,
                       s.payload.size() - s.pgot);
      if (k > 0) {
        s.pgot += (size_t)k;
        progressed = true;
        if (s.pgot == s.payload.size()) {
          Hdr h;
          memcpy(&h, s.hdr, sizeof(Hdr));
          deliver(Message{h.src, h.tag, h.ctx, std::move(s.payload)});
          s.payload = std::vector<char>();
          s.hgot = 0;
          s.in_payload = false;
        }
        continue;
      } else if (k == 0) {
        close(fd);
        g.fds[wr_rank] = -1;
        g.dead[wr_rank] = 1;
        break;
      } else if (errno == EAGAIN || errno == EWOULDBLOCK) {
        break;
      } else if (errno == EINTR) {
        continue;
      } else {
        die("peer read failed");
      }
    }
  }
  return progressed;
}

bool progress()
{
  bool any = false;
  for (int r = 0; r < g.np; ++r)
    if (r != g.rank && g.fds[r] >= 0) {
      if (flush_one(r)) any = true;
      if (read_one(r)) any = true;
    }
  return any;
}

void progress_block()
{
  // one progress pass; if nothing moved, poll() until something can
  if (progress()) return;
  for (Req *r : g.posted)
    if (r->src >= 0 && g.dead[(size_t)r->src])
      die("receive posted from a rank that already exited");
  std::vector<pollfd> pfds;
  for (int r = 0; r < g.np; ++r)
    if (r != g.rank && g.fds[r] >= 0) {
      pollfd p{};
      p.fd = g.fds[r];
      p.events = POLLIN;
      if (!g.outq[r].empty()) p.events |= POLLOUT;
      pfds.push_back(p);
    }
  if (pfds.empty()) return;
  (void)poll(pfds.data(), (nfds_t)pfds.size(), 200);
  progress();
}

void post_send(int dst_world, int tag, int ctx, const void *buf,
               long long nbytes)
{
  if (dst_world != g.rank && g.dead[(size_t)dst_world]) return;  // peer gone
  if (dst_world == g.rank) {  // self-message: deliver directly
    Message m;
    m.src = g.rank;
    m.tag = tag;
    m.ctx = ctx;
    m.data.assign((const char *)buf, (const char *)buf + nbytes);
    deliver(std::move(m));
    return;
  }
  OutMsg om;
  Hdr h{(int32_t)g.rank, (int32_t)tag, (int32_t)ctx, 0, nbytes};
  om.packet.resize(sizeof(Hdr) + (size_t)nbytes);
  memcpy(om.packet.data(), &h, sizeof(Hdr));
  if (nbytes > 0)
    memcpy(om.packet.data() + sizeof(Hdr), buf, (size_t)nbytes);
  g.outq[dst_world].push_back(std::move(om));
  flush_one(dst_world);  // opportunistic drain
}

Req *post_recv(void *buf, long long cap, int src_world, int tag, int ctx)
{
  // match unexpected first (arrival order), else leave posted
  for (auto it = g.unexpected.begin(); it != g.unexpected.end(); ++it) {
    if (it->ctx == ctx &&
        (src_world == MPI_ANY_SOURCE || it->src == src_world) &&
        (tag == MPI_ANY_TAG || it->tag == tag)) {
      Req *r = new Req;
      r->recv = true;
      long long nb = (long long)it->data.size();
      if (nb > cap) nb = cap;
      if (nb > 0) memcpy(buf, it->data.data(), (size_t)nb);
      r->st.MPI_SOURCE = it->src;
      r->st.MPI_TAG = it->tag;
      r->st.MPI_ERROR = 0;
      r->st.count_bytes = (int)nb;
      r->done = true;
      g.unexpected.erase(it);
      return r;
    }
  }
  Req *r = new Req;
  r->recv = true;
  r->buf = buf;
  r->cap = cap;
  r->src = src_world;
  r->tag = tag;
  r->ctx = ctx;
  g.posted.push_back(r);
  return r;
}

void wait_req(Req *r)
{
  while (!r->done) progress_block();
}

void blocking_recv(void *buf, long long cap, int src_world, int tag, int ctx,
                   MPI_Status *st)
{
  Req *r = post_recv(buf, cap, src_world, tag, ctx);
  wait_req(r);
  if (st) *st = r->st;
  delete r;
}

/* ------------------------- reductions ------------------------------- */

template <class T>
void fold_buf(const T *in, T *inout, int n, MPI_Op op)
{
  switch (op) {
  case MPI_SUM:
    for (int i = 0; i < n; ++i) inout[i] = inout[i] + in[i];
    break;
  case MPI_MAX:
    for (int i = 0; i < n; ++i) inout[i] = std::max(inout[i], in[i]);
    break;
  case MPI_MIN:
    for (int i = 0; i < n; ++i) inout[i] = std::min(inout[i], in[i]);
    break;
  default:
    die("unsupported builtin op for this datatype");
  }
}

template <class T>
void fold_int(const T *in, T *inout, int n, MPI_Op op)
{
  switch (op) {
  case MPI_BOR:
    for (int i = 0; i < n; ++i) inout[i] = (T)(inout[i] | in[i]);
    break;
  case MPI_LOR:
    for (int i = 0; i < n; ++i) inout[i] = (T)(inout[i] || in[i]);
    break;
  default:
    fold_buf(in, inout, n, op);
  }
}

template <class T>
void fold_cplx(const T *in, T *inout, int n, MPI_Op op)
{
  if (op != MPI_SUM) die("complex reductions support MPI_SUM only");
  for (int i = 0; i < n; ++i) inout[i] += in[i];
}

void apply_op(MPI_Op op, MPI_Datatype t, const void *in, void *inout, int n)
{
  if (op >= 200) {  // user-created (HPDDM's buildTwo op): fn(in, inout)
    auto it = g.ops.find(op);
    if (it == g.ops.end()) die("unknown user op");
    it->second(const_cast<void *>(in), inout, &n, &t);
    return;
  }
  int kind = (t >> 8) & 0xff, size = t & 0xff;
  switch (kind) {
  case 1:  // signed
    if (size == 1) fold_int((const int8_t *)in, (int8_t *)inout, n, op);
    else if (size == 2) fold_int((const int16_t *)in, (int16_t *)inout, n, op);
    else if (size == 4) fold_int((const int32_t *)in, (int32_t *)inout, n, op);
    else fold_int((const int64_t *)in, (int64_t *)inout, n, op);
    break;
  case 2:  // unsigned
    if (size == 1) fold_int((const uint8_t *)in, (uint8_t *)inout, n, op);
    else if (size == 2) fold_int((const uint16_t *)in, (uint16_t *)inout, n, op);
    else if (size == 4) fold_int((const uint32_t *)in, (uint32_t *)inout, n, op);
    else fold_int((const uint64_t *)in, (uint64_t *)inout, n, op);
    break;
  case 3:  // real
    if (size == 4) fold_buf((const float *)in, (float *)inout, n, op);
    else fold_buf((const double *)in, (double *)inout, n, op);
    break;
  case 4:  // complex
    if (size == 8)
      fold_cplx((const std::complex<float> *)in,
                (std::complex<float> *)inout, n, op);
    else
      fold_cplx((const std::complex<double> *)in,
                (std::complex<double> *)inout, n, op);
    break;
  default:
    die("raw-byte reduction");
  }
}

int coll_tag(CommInfo *ci)
{
  return COLL_TAG_BASE + (int)(ci->coll_seq++ & 0xffffffu);
}

}  // namespace

/* ------------------------------ API --------------------------------- */

extern "C" {

int MPI_Init(int *argc, char ***argv)
{
  (void)argc;
  (void)argv;
  if (g.initialized) return 0;
  const char *np_env = getenv("HPDDM_STUB_NP");
  g.np = np_env ? atoi(np_env) : 1;
  if (g.np < 1) g.np = 1;
  if (g.np > 64) die("HPDDM_STUB_NP too large");
  signal(SIGPIPE, SIG_IGN);
  fflush(stdout);
  fflush(stderr);

  // socketpair per unordered pair, created pre-fork so all inherit
  std::vector<std::vector<int>> sp(g.np, std::vector<int>(g.np, -1));
  std::vector<std::vector<int>> sp2(g.np, std::vector<int>(g.np, -1));
  for (int i = 0; i < g.np; ++i)
    for (int j = i + 1; j < g.np; ++j) {
      int fds[2];
      if (socketpair(AF_UNIX, SOCK_STREAM, 0, fds) != 0)
        die("socketpair");
      sp[i][j] = fds[0];   // i's end
      sp2[i][j] = fds[1];  // j's end
    }

  g.rank = 0;
  for (int r = 1; r < g.np; ++r) {
    pid_t pid = fork();
    if (pid < 0) die("fork");
    if (pid == 0) {
      g.rank = r;
      g.children.clear();
      g.parent = getppid();
      prctl(PR_SET_PDEATHSIG, SIGKILL);  // die with the launcher
      break;
    }
    g.children.push_back(pid);
  }

  // keep only my endpoints; close the rest
  g.fds.assign(g.np, -1);
  for (int i = 0; i < g.np; ++i)
    for (int j = i + 1; j < g.np; ++j) {
      if (i == g.rank)
        g.fds[j] = sp[i][j];
      else
        close(sp[i][j]);
      if (j == g.rank)
        g.fds[i] = sp2[i][j];
      else
        close(sp2[i][j]);
    }
  for (int r = 0; r < g.np; ++r)
    if (g.fds[r] >= 0) {
      int fl = fcntl(g.fds[r], F_GETFL, 0);
      fcntl(g.fds[r], F_SETFL, fl | O_NONBLOCK);
    }
  g.outq.assign(g.np, {});
  g.ins.assign(g.np, InState{});
  g.dead.assign(g.np, 0);

  CommInfo world;
  for (int r = 0; r < g.np; ++r) world.wr.push_back(r);
  world.my = g.rank;
  world.ctx = 0;
  g.comms[MPI_COMM_WORLD] = world;
  CommInfo self;
  self.wr = {g.rank};
  self.my = 0;
  self.ctx = 1;
  g.comms[MPI_COMM_SELF] = self;
  g.initialized = true;
  return 0;
}

int MPI_Init_thread(int *argc, char ***argv, int req, int *prov)
{
  (void)req;
  if (prov) *prov = MPI_THREAD_SERIALIZED;
  return MPI_Init(argc, argv);
}

int MPI_Finalize(void)
{
  if (g.finalized) return 0;
  MPI_Barrier(MPI_COMM_WORLD);
  // drain every pending write so peers never see a truncated stream
  for (;;) {
    bool empty = true;
    for (int r = 0; r < g.np; ++r)
      if (!g.dead[r] && !g.outq[r].empty()) empty = false;
    if (empty) break;
    progress_block();
  }
  g.finalized = true;
  if (g.rank == 0) {
    int worst = 0;
    for (pid_t pid : g.children) {
      int stst = 0;
      waitpid(pid, &stst, 0);
      int code = WIFEXITED(stst) ? WEXITSTATUS(stst)
                                 : (WIFSIGNALED(stst) ? 97 : 0);
      worst = std::max(worst, code);
    }
    if (worst) {
      fflush(stdout);
      _exit(worst);  // propagate a child's oracle failure
    }
  }
  return 0;
}

int MPI_Finalized(int *flag)
{
  if (flag) *flag = g.finalized ? 1 : 0;
  return 0;
}

int MPI_Initialized(int *flag)
{
  if (flag) *flag = g.initialized ? 1 : 0;
  return 0;
}

int MPI_Abort(MPI_Comm c, int code)
{
  (void)c;
  fprintf(stderr, "mpi_multirank[rank %d]: MPI_Abort(%d)\n", g.rank, code);
  fflush(stderr);
  for (pid_t pid : g.children) kill(pid, SIGTERM);
  if (g.parent) kill(g.parent, SIGTERM);
  _exit(code ? code : 1);
}

double MPI_Wtime(void)
{
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return (double)t.tv_sec + 1e-9 * (double)t.tv_nsec;
}

/* -------------------- communicators & groups ------------------------ */

int MPI_Comm_size(MPI_Comm c, int *s)
{
  *s = (int)info(c)->wr.size();
  return 0;
}

int MPI_Comm_rank(MPI_Comm c, int *r)
{
  *r = info(c)->my;
  return 0;
}

int MPI_Comm_dup(MPI_Comm c, MPI_Comm *out)
{
  CommInfo *ci = info(c);
  CommInfo d = *ci;
  d.ctx = (int)mix_ctx((uint32_t)ci->ctx, ci->mk_seq++);
  d.coll_seq = d.mk_seq = 0;
  int h = g.next_comm++;
  g.comms[h] = d;
  *out = h;
  return 0;
}

int MPI_Comm_free(MPI_Comm *c)
{
  if (c && *c != MPI_COMM_WORLD && *c != MPI_COMM_SELF) g.comms.erase(*c);
  if (c) *c = MPI_COMM_NULL;
  return 0;
}

int MPI_Comm_group(MPI_Comm c, MPI_Group *gr)
{
  int h = g.next_group++;
  g.groups[h] = info(c)->wr;
  *gr = h;
  return 0;
}

int MPI_Comm_create(MPI_Comm c, MPI_Group gr, MPI_Comm *out)
{
  CommInfo *ci = info(c);
  int ctx = (int)mix_ctx((uint32_t)ci->ctx, ci->mk_seq++);
  auto it = g.groups.find(gr);
  if (it == g.groups.end()) die("unknown group handle");
  const std::vector<int> &wr = it->second;
  auto pos = std::find(wr.begin(), wr.end(), g.rank);
  if (pos == wr.end()) {
    *out = MPI_COMM_NULL;
    return 0;
  }
  CommInfo d;
  d.wr = wr;
  d.my = (int)(pos - wr.begin());
  d.ctx = ctx;
  int h = g.next_comm++;
  g.comms[h] = d;
  *out = h;
  return 0;
}

int MPI_Comm_compare(MPI_Comm a, MPI_Comm b, int *res)
{
  if (a == b) {
    *res = MPI_IDENT;
    return 0;
  }
  CommInfo *ia = info(a), *ib = info(b);
  *res = (ia->wr == ib->wr) ? MPI_CONGRUENT : MPI_UNEQUAL;
  return 0;
}

int MPI_Group_size(MPI_Group gr, int *s)
{
  auto it = g.groups.find(gr);
  *s = it == g.groups.end() ? 0 : (int)it->second.size();
  return 0;
}

int MPI_Group_incl(MPI_Group gr, int n, const int *ranks, MPI_Group *out)
{
  auto it = g.groups.find(gr);
  if (it == g.groups.end()) die("unknown group handle");
  std::vector<int> wr;
  for (int i = 0; i < n; ++i) wr.push_back(it->second[(size_t)ranks[i]]);
  int h = g.next_group++;
  g.groups[h] = wr;
  *out = h;
  return 0;
}

int MPI_Group_excl(MPI_Group gr, int n, const int *ranks, MPI_Group *out)
{
  auto it = g.groups.find(gr);
  if (it == g.groups.end()) die("unknown group handle");
  std::vector<char> drop(it->second.size(), 0);
  for (int i = 0; i < n; ++i) drop[(size_t)ranks[i]] = 1;
  std::vector<int> wr;
  for (size_t i = 0; i < it->second.size(); ++i)
    if (!drop[i]) wr.push_back(it->second[i]);
  int h = g.next_group++;
  g.groups[h] = wr;
  *out = h;
  return 0;
}

int MPI_Group_range_incl(MPI_Group gr, int n, int ranges[][3], MPI_Group *out)
{
  auto it = g.groups.find(gr);
  if (it == g.groups.end()) die("unknown group handle");
  std::vector<int> wr;
  for (int i = 0; i < n; ++i) {
    int first = ranges[i][0], last = ranges[i][1], stride = ranges[i][2];
    if (stride == 0) die("zero stride in Group_range_incl");
    if (stride > 0)
      for (int r = first; r <= last; r += stride)
        wr.push_back(it->second[(size_t)r]);
    else
      for (int r = first; r >= last; r += stride)
        wr.push_back(it->second[(size_t)r]);
  }
  int h = g.next_group++;
  g.groups[h] = wr;
  *out = h;
  return 0;
}

int MPI_Group_free(MPI_Group *gr)
{
  if (gr && *gr != MPI_GROUP_NULL) g.groups.erase(*gr);
  if (gr) *gr = MPI_GROUP_NULL;
  return 0;
}

int MPI_Op_create(MPI_User_function *fn, int commute, MPI_Op *op)
{
  (void)commute;
  int h = g.next_op++;
  g.ops[h] = fn;
  *op = h;
  return 0;
}

int MPI_Op_free(MPI_Op *op)
{
  if (op && *op != MPI_OP_NULL) g.ops.erase(*op);
  if (op) *op = MPI_OP_NULL;
  return 0;
}

/* ------------------------- point-to-point --------------------------- */

int MPI_Isend(const void *b, int n, MPI_Datatype t, int dst, int tag,
              MPI_Comm c, MPI_Request *rq)
{
  CommInfo *ci = info(c);
  post_send(ci->wr[(size_t)dst], tag, ci->ctx, b,
            (long long)n * MPI_STUB_SIZE(t));
  Req *r = new Req;  // buffered: complete at post time
  r->done = true;
  *rq = (MPI_Request)r;
  return 0;
}

int MPI_Irecv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c,
              MPI_Request *rq)
{
  CommInfo *ci = info(c);
  int src_world = src == MPI_ANY_SOURCE ? MPI_ANY_SOURCE
                                        : ci->wr[(size_t)src];
  Req *r = post_recv(b, (long long)n * MPI_STUB_SIZE(t), src_world, tag,
                     ci->ctx);
  *rq = (MPI_Request)r;
  return 0;
}

int MPI_Send(const void *b, int n, MPI_Datatype t, int dst, int tag,
             MPI_Comm c)
{
  MPI_Request rq;
  MPI_Isend(b, n, t, dst, tag, c, &rq);
  return MPI_Wait(&rq, MPI_STATUS_IGNORE);
}

int MPI_Recv(void *b, int n, MPI_Datatype t, int src, int tag, MPI_Comm c,
             MPI_Status *st)
{
  MPI_Request rq;
  MPI_Irecv(b, n, t, src, tag, c, &rq);
  return MPI_Wait(&rq, st);
}

int MPI_Wait(MPI_Request *rq, MPI_Status *st)
{
  if (*rq == MPI_REQUEST_NULL) {
    if (st) {
      st->MPI_SOURCE = MPI_ANY_SOURCE;
      st->MPI_TAG = MPI_ANY_TAG;
      st->MPI_ERROR = 0;
      st->count_bytes = 0;
    }
    return 0;
  }
  Req *r = (Req *)*rq;
  wait_req(r);
  if (st) *st = r->st;
  delete r;
  *rq = MPI_REQUEST_NULL;
  return 0;
}

int MPI_Waitall(int n, MPI_Request *rqs, MPI_Status *sts)
{
  for (int i = 0; i < n; ++i)
    MPI_Wait(rqs + i, sts ? sts + i : MPI_STATUS_IGNORE);
  return 0;
}

int MPI_Waitany(int n, MPI_Request *rqs, int *index, MPI_Status *st)
{
  bool any = false;
  for (int i = 0; i < n; ++i)
    if (rqs[i] != MPI_REQUEST_NULL) any = true;
  if (!any) {
    *index = MPI_UNDEFINED;
    return 0;
  }
  for (;;) {
    for (int i = 0; i < n; ++i) {
      if (rqs[i] == MPI_REQUEST_NULL) continue;
      Req *r = (Req *)rqs[i];
      if (r->done) {
        if (st) *st = r->st;
        delete r;
        rqs[i] = MPI_REQUEST_NULL;
        *index = i;
        return 0;
      }
    }
    progress_block();
  }
}

int MPI_Testall(int n, MPI_Request *rqs, int *flag, MPI_Status *sts)
{
  progress();
  for (int i = 0; i < n; ++i)
    if (rqs[i] != MPI_REQUEST_NULL && !((Req *)rqs[i])->done) {
      if (flag) *flag = 0;
      return 0;
    }
  for (int i = 0; i < n; ++i)
    MPI_Wait(rqs + i, sts ? sts + i : MPI_STATUS_IGNORE);
  if (flag) *flag = 1;
  return 0;
}

int MPI_Get_count(const MPI_Status *st, MPI_Datatype t, int *count)
{
  int sz = MPI_STUB_SIZE(t);
  *count = st ? st->count_bytes / (sz ? sz : 1) : 0;
  return 0;
}

/* -------------------------- collectives ----------------------------- */

int MPI_Barrier(MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  if (size == 1) return 0;
  int tag = coll_tag(ci);
  char tok = 1;
  if (ci->my == 0) {
    for (int i = 1; i < size; ++i)
      blocking_recv(&tok, 1, ci->wr[(size_t)i], tag, ci->ctx, nullptr);
    for (int i = 1; i < size; ++i)
      post_send(ci->wr[(size_t)i], tag, ci->ctx, &tok, 1);
  } else {
    post_send(ci->wr[0], tag, ci->ctx, &tok, 1);
    blocking_recv(&tok, 1, ci->wr[0], tag, ci->ctx, nullptr);
  }
  return 0;
}

int MPI_Bcast(void *b, int n, MPI_Datatype t, int root, MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  if (size == 1) return 0;
  int tag = coll_tag(ci);
  long long nb = (long long)n * MPI_STUB_SIZE(t);
  if (ci->my == root) {
    for (int i = 0; i < size; ++i)
      if (i != root) post_send(ci->wr[(size_t)i], tag, ci->ctx, b, nb);
  } else {
    blocking_recv(b, nb, ci->wr[(size_t)root], tag, ci->ctx, nullptr);
  }
  return 0;
}

int MPI_Gatherv(const void *s, int sn, MPI_Datatype st_, void *r,
                const int *rn, const int *displs, MPI_Datatype rt, int root,
                MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  int tag = coll_tag(ci);
  int esz = MPI_STUB_SIZE(rt);
  if (ci->my == root) {
    for (int i = 0; i < size; ++i) {
      char *dst = (char *)r + (long long)displs[i] * esz;
      long long cap = (long long)rn[i] * esz;
      if (i == root) {
        if (s != MPI_IN_PLACE && (const char *)s != dst && cap > 0) {
          long long nb = (long long)sn * MPI_STUB_SIZE(st_);
          memcpy(dst, s, (size_t)(nb < cap ? nb : cap));
        }
      } else {
        blocking_recv(dst, cap, ci->wr[(size_t)i], tag, ci->ctx, nullptr);
      }
    }
  } else {
    long long nb = s == MPI_IN_PLACE ? 0 : (long long)sn * MPI_STUB_SIZE(st_);
    post_send(ci->wr[(size_t)root], tag, ci->ctx, s, nb);
  }
  return 0;
}

int MPI_Gather(const void *s, int sn, MPI_Datatype st_, void *r, int rn,
               MPI_Datatype rt, int root, MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  std::vector<int> counts((size_t)size, rn), displs((size_t)size);
  for (int i = 0; i < size; ++i) displs[(size_t)i] = i * rn;
  // non-roots may pass rn=0/rt=NULL; only root uses counts/displs
  if (ci->my != root) return MPI_Gatherv(s, sn, st_, r, nullptr, nullptr, rt, root, c);
  return MPI_Gatherv(s, sn, st_, r, counts.data(), displs.data(), rt, root, c);
}

int MPI_Scatterv(const void *s, const int *sn, const int *displs,
                 MPI_Datatype st_, void *r, int rn, MPI_Datatype rt, int root,
                 MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  int tag = coll_tag(ci);
  int esz = MPI_STUB_SIZE(st_);
  if (ci->my == root) {
    for (int i = 0; i < size; ++i) {
      const char *src = (const char *)s + (long long)displs[i] * esz;
      long long nb = (long long)sn[i] * esz;
      if (i == root) {
        if (r != MPI_IN_PLACE && (char *)r != src && nb > 0) {
          long long cap = (long long)rn * MPI_STUB_SIZE(rt);
          memcpy(r, src, (size_t)(cap && cap < nb ? cap : nb));
        }
      } else {
        post_send(ci->wr[(size_t)i], tag, ci->ctx, src, nb);
      }
    }
  } else {
    blocking_recv(r, (long long)rn * MPI_STUB_SIZE(rt),
                  ci->wr[(size_t)root], tag, ci->ctx, nullptr);
  }
  return 0;
}

int MPI_Scatter(const void *s, int sn, MPI_Datatype st_, void *r, int rn,
                MPI_Datatype rt, int root, MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  if (ci->my != root)
    return MPI_Scatterv(nullptr, nullptr, nullptr, st_, r, rn, rt, root, c);
  std::vector<int> counts((size_t)size, sn), displs((size_t)size);
  for (int i = 0; i < size; ++i) displs[(size_t)i] = i * sn;
  return MPI_Scatterv(s, counts.data(), displs.data(), st_, r, rn, rt, root, c);
}

int MPI_Allgatherv(const void *s, int sn, MPI_Datatype st_, void *r,
                   const int *rn, const int *displs, MPI_Datatype rt,
                   MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  // every rank has rn/displs: gather to comm rank 0, then bcast the span
  const void *sbuf = s;
  if (s == MPI_IN_PLACE && ci->my != 0)
    sbuf = (const char *)r + (long long)displs[ci->my] * MPI_STUB_SIZE(rt);
  std::vector<int> counts(rn, rn + size);
  MPI_Gatherv(ci->my == 0 ? (s == MPI_IN_PLACE ? MPI_IN_PLACE : s) : sbuf,
              s == MPI_IN_PLACE ? rn[ci->my] : sn,
              s == MPI_IN_PLACE ? rt : st_, r, rn, displs, rt, 0, c);
  long long span = 0;
  for (int i = 0; i < size; ++i)
    span = std::max(span, (long long)displs[i] + rn[i]);
  return MPI_Bcast(r, (int)span, rt, 0, c);
}

int MPI_Allgather(const void *s, int sn, MPI_Datatype st_, void *r, int rn,
                  MPI_Datatype rt, MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  std::vector<int> counts((size_t)size, rn), displs((size_t)size);
  for (int i = 0; i < size; ++i) displs[(size_t)i] = i * rn;
  return MPI_Allgatherv(s, sn, st_, r, counts.data(), displs.data(), rt, c);
}

int MPI_Allreduce(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op,
                  MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  long long nb = (long long)n * MPI_STUB_SIZE(t);
  if (s != MPI_IN_PLACE && s != r && nb > 0) memcpy(r, s, (size_t)nb);
  if (size == 1) return 0;
  int tag = coll_tag(ci);
  if (ci->my == 0) {
    // fold contributions in ascending comm rank (deterministic)
    std::vector<char> tmp((size_t)nb);
    for (int i = 1; i < size; ++i) {
      blocking_recv(tmp.data(), nb, ci->wr[(size_t)i], tag, ci->ctx,
                    nullptr);
      apply_op(op, t, tmp.data(), r, n);
    }
    for (int i = 1; i < size; ++i)
      post_send(ci->wr[(size_t)i], tag, ci->ctx, r, nb);
  } else {
    post_send(ci->wr[0], tag, ci->ctx, r, nb);
    blocking_recv(r, nb, ci->wr[0], tag, ci->ctx, nullptr);
  }
  return 0;
}

int MPI_Exscan(const void *s, void *r, int n, MPI_Datatype t, MPI_Op op,
               MPI_Comm c)
{
  CommInfo *ci = info(c);
  int size = (int)ci->wr.size();
  long long nb = (long long)n * MPI_STUB_SIZE(t);
  if (size == 1) return 0;  // rank 0 result undefined
  int tag = coll_tag(ci);
  const void *my = s == MPI_IN_PLACE ? r : s;
  if (ci->my == 0) {
    // prefix[i] = fold of ranks 0..i-1, computed serially at comm root
    std::vector<char> acc((size_t)nb), contrib((size_t)nb);
    memcpy(acc.data(), my, (size_t)nb);
    for (int i = 1; i < size; ++i) {
      post_send(ci->wr[(size_t)i], tag, ci->ctx, acc.data(), nb);
      if (i + 1 < size) {
        blocking_recv(contrib.data(), nb, ci->wr[(size_t)i], tag, ci->ctx,
                      nullptr);
        apply_op(op, t, contrib.data(), acc.data(), n);
      }
    }
  } else {
    if (ci->my + 1 < size)
      post_send(ci->wr[0], tag, ci->ctx, my, nb);
    blocking_recv(r, nb, ci->wr[0], tag, ci->ctx, nullptr);
  }
  return 0;
}

/* nonblocking collectives: blocking + immediately-complete request
 * (HPDDM_ICOLLECTIVE is off in the parity builds; these exist so the
 * symbols resolve and stay correct if ever enabled with waits). */
int MPI_Igather(const void *s, int sn, MPI_Datatype st_, void *r, int rn,
                MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq)
{
  *rq = MPI_REQUEST_NULL;
  return MPI_Gather(s, sn, st_, r, rn, rt, root, c);
}

int MPI_Igatherv(const void *s, int sn, MPI_Datatype st_, void *r,
                 const int *rn, const int *displs, MPI_Datatype rt, int root,
                 MPI_Comm c, MPI_Request *rq)
{
  *rq = MPI_REQUEST_NULL;
  return MPI_Gatherv(s, sn, st_, r, rn, displs, rt, root, c);
}

int MPI_Iscatter(const void *s, int sn, MPI_Datatype st_, void *r, int rn,
                 MPI_Datatype rt, int root, MPI_Comm c, MPI_Request *rq)
{
  *rq = MPI_REQUEST_NULL;
  return MPI_Scatter(s, sn, st_, r, rn, rt, root, c);
}

int MPI_Iscatterv(const void *s, const int *sn, const int *displs,
                  MPI_Datatype st_, void *r, int rn, MPI_Datatype rt,
                  int root, MPI_Comm c, MPI_Request *rq)
{
  *rq = MPI_REQUEST_NULL;
  return MPI_Scatterv(s, sn, displs, st_, r, rn, rt, root, c);
}

}  // extern "C"
