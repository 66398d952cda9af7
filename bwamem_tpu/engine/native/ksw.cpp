// Native batched banded-SW extension (host runtime hot path).
//
// Provenance: the inner extension loop re-expresses the scalar definition
// of ksw_extend2 from Heng Li's bwa (ksw.c, MIT license, (c) 2011 by
// Attractive Chaos <attractor@live.co.uk>); bit-exact parity with that
// routine is a framework requirement (see LICENSES.md).  The batching,
// OpenMP scheduling, and ABI around it are original to this project.
//
// Same exact semantics as engine/extend.py::ksw_extend2 (the validated
// oracle for [EXT] ksw.c's ksw_extend2 behavior: adaptive window with
// stale-cell semantics, Z-drop, M==0 reset, gscore tie-breaks).  This is
// the C++ runtime component of the framework (SURVEY.md section 7: native
// where the reference's runtime is native); the TPU kernel
// (ops/extend_tpu.py) covers the device path.
//
// C ABI (ctypes; see ../native_ksw.py):
//   void bwamem_ksw_extend_batch(...)
// Jobs are flattened: sequences concatenated in qbuf/tbuf with per-job
// offsets.  Output: 6 int32 per job {score, qle, tle, gtle, gscore,
// max_off}.  OpenMP-parallel across jobs.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct EH {
  int32_t h, e;
};

void ksw_extend_one(const uint8_t* q, int qlen, const uint8_t* t, int tlen,
                    const int8_t* mat,  // 5x5
                    int o_del, int e_del, int o_ins, int e_ins, int w,
                    int end_bonus, int zdrop, int h0, int32_t* out6) {
  const int m = 5;
  const int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
  std::vector<int8_t> qp((size_t)m * qlen);
  for (int k = 0; k < m; ++k) {
    const int8_t* p = &mat[k * m];
    for (int j = 0; j < qlen; ++j) qp[(size_t)k * qlen + j] = p[q[j]];
  }
  std::vector<EH> eh(qlen + 1);
  std::memset(eh.data(), 0, sizeof(EH) * (qlen + 1));
  // first row
  eh[0].h = h0;
  if (qlen > 0) {
    eh[1].h = h0 > oe_ins ? h0 - oe_ins : 0;
    int j = 2;
    for (; j <= qlen && eh[j - 1].h > e_ins; ++j) eh[j].h = eh[j - 1].h - e_ins;
  }
  // adjust the band width
  int max_sc = mat[0];
  for (int i = 1; i < m * m; ++i) max_sc = std::max(max_sc, (int)mat[i]);
  int max_ins = (int)((double)(qlen * max_sc + end_bonus - o_ins) / e_ins + 1.);
  w = std::min(w, std::max(max_ins, 1));
  int max_del = (int)((double)(qlen * max_sc + end_bonus - o_del) / e_del + 1.);
  w = std::min(w, std::max(max_del, 1));

  int maxv = h0, max_i = -1, max_j = -1, max_ie = -1, gscore = -1, max_off = 0;
  int beg = 0, end = qlen;
  for (int i = 0; i < tlen; ++i) {
    int f = 0, mrow = 0, mj = -1;
    const int8_t* qrow = &qp[(size_t)t[i] * qlen];
    if (beg < i - w) beg = i - w;
    if (end > i + w + 1) end = i + w + 1;
    if (end > qlen) end = qlen;
    int h1;
    if (beg == 0) {
      h1 = h0 - (o_del + e_del * (i + 1));
      if (h1 < 0) h1 = 0;
    } else {
      h1 = 0;
    }
    for (int j = beg; j < end; ++j) {
      EH* p = &eh[j];
      int M = p->h, e = p->e;
      p->h = h1;
      M = M ? M + qrow[j] : 0;
      int h = M > e ? M : e;
      h = h > f ? h : f;
      h1 = h;
      mj = mrow > h ? mj : j;
      mrow = mrow > h ? mrow : h;
      int tt = M - oe_del;
      tt = tt > 0 ? tt : 0;
      e -= e_del;
      e = e > tt ? e : tt;
      p->e = e;
      tt = M - oe_ins;
      tt = tt > 0 ? tt : 0;
      f -= e_ins;
      f = f > tt ? f : tt;
    }
    eh[end].h = h1;
    eh[end].e = 0;
    if (end == qlen) {
      if (gscore <= h1) {
        max_ie = i;
        gscore = h1;
      }
    }
    if (mrow == 0) break;
    if (mrow > maxv) {
      maxv = mrow;
      max_i = i;
      max_j = mj;
      if (max_off < std::abs(mj - i)) max_off = std::abs(mj - i);
    } else if (zdrop > 0) {
      if (i - max_i > mj - max_j) {
        if (maxv - mrow - ((i - max_i) - (mj - max_j)) * e_del > zdrop) break;
      } else {
        if (maxv - mrow - ((mj - max_j) - (i - max_i)) * e_ins > zdrop) break;
      }
    }
    // shrink the window
    int j = beg;
    while (j < end && eh[j].h == 0 && eh[j].e == 0) ++j;
    beg = j;
    j = end;
    while (j >= beg && eh[j].h == 0 && eh[j].e == 0) --j;
    end = j + 2 < qlen ? j + 2 : qlen;
  }
  out6[0] = maxv;
  out6[1] = max_j + 1;
  out6[2] = max_i + 1;
  out6[3] = max_ie + 1;
  out6[4] = gscore;
  out6[5] = max_off;
}

}  // namespace

extern "C" {

void bwamem_ksw_extend_batch(
    int64_t n_jobs, const uint8_t* qbuf, const int64_t* qoff,
    const int32_t* qlen, const uint8_t* tbuf, const int64_t* toff,
    const int32_t* tlen, const int8_t* mat, int o_del, int e_del, int o_ins,
    int e_ins, int zdrop, const int32_t* h0, const int32_t* w,
    const int32_t* end_bonus, int32_t* out) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t i = 0; i < n_jobs; ++i) {
    ksw_extend_one(qbuf + qoff[i], qlen[i], tbuf + toff[i], tlen[i], mat,
                   o_del, e_del, o_ins, e_ins, w[i], end_bonus[i], zdrop,
                   h0[i], out + i * 6);
  }
}

}  // extern "C"
