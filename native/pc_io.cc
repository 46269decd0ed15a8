// Reference-format snapshot codec (Fortran unformatted sequential files).
//
// The reference writes one var.dat per rank via io_dist
// (src/io_dist.f90:110-167 output_snap): record 1 is the ghosted field
// array f(mx,my,mz,nv) in Fortran column-major order, record 2 is
// [t, x(mx), y(my), z(mz), dx, dy, dz (, deltay if shear)], each wrapped
// in 4-byte record-length markers; optional tagged persist records follow
// (src/persist.f90).  This codec reads/writes that format for float32 and
// float64 payloads, converting to/from this framework's C-order
// (nv, nx, ny, nz) layout in parallel.
//
// Exposed as a plain C API for ctypes.  Compile:
//   g++ -O3 -march=native -shared -fPIC -o libpc_io.so pc_io.cc -lpthread
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxErr = 512;
thread_local char g_err[kMaxErr] = {0};

void set_err(const char* msg) { snprintf(g_err, kMaxErr, "%s", msg); }

struct Rec {
  long offset;  // payload start
  uint32_t len;
};

// Scan the record structure of a Fortran unformatted sequential file.
bool scan_records(FILE* f, std::vector<Rec>* recs) {
  if (fseek(f, 0, SEEK_END) != 0) return false;
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  long pos = 0;
  while (pos + 8 <= size) {
    uint32_t head = 0, tail = 0;
    if (fseek(f, pos, SEEK_SET) != 0 || fread(&head, 4, 1, f) != 1) break;
    long payload = pos + 4;
    if (payload + head + 4 > (unsigned long)size) break;
    if (fseek(f, payload + head, SEEK_SET) != 0 ||
        fread(&tail, 4, 1, f) != 1 || tail != head) {
      set_err("corrupt record marker");
      return false;
    }
    recs->push_back({payload, head});
    pos = payload + head + 4;
  }
  return !recs->empty();
}

// Parallel transpose: Fortran (mx,my,mz,nv) -> C (nv,mx,my,mz) contiguous
// with z minor, i.e. out[v][i][j][k] = in[i + mx*(j + my*(k + mz*v))].
template <typename T>
void f2c_transpose(const T* in, T* out, long mx, long my, long mz, long nv) {
  int nthreads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  for (int tid = 0; tid < nthreads; ++tid) {
    ts.emplace_back([=]() {
      for (long v = 0; v < nv; ++v)
        for (long i = tid; i < mx; i += nthreads)
          for (long j = 0; j < my; ++j) {
            const T* src = in + i + mx * (j + my * (0 + mz * v));
            T* dst = out + (((v * mx + i) * my + j) * mz);
            for (long k = 0; k < mz; ++k) dst[k] = src[(size_t)k * mx * my];
          }
    });
  }
  for (auto& t : ts) t.join();
}

template <typename T>
void c2f_transpose(const T* in, T* out, long mx, long my, long mz, long nv) {
  int nthreads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  for (int tid = 0; tid < nthreads; ++tid) {
    ts.emplace_back([=]() {
      for (long v = 0; v < nv; ++v)
        for (long i = tid; i < mx; i += nthreads)
          for (long j = 0; j < my; ++j) {
            const T* src = in + (((v * mx + i) * my + j) * mz);
            T* dst = out + i + mx * (j + my * (0 + mz * v));
            for (long k = 0; k < mz; ++k) dst[(size_t)k * mx * my] = src[k];
          }
    });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

const char* pc_io_last_error() { return g_err; }

// Read var.dat: fills fields (nv*mx*my*mz, C-order), t (1), x (mx), y (my),
// z (mz), dxyz (3), deltay (1; untouched if absent).  wordsize: 4 or 8.
// Returns 0 on success.
int pc_read_var(const char* path, long mx, long my, long mz, long nv,
                int wordsize, void* fields, double* t, double* x, double* y,
                double* z, double* dxyz, double* deltay, int* has_deltay) {
  FILE* f = fopen(path, "rb");
  if (!f) { set_err("cannot open file"); return 1; }
  std::vector<Rec> recs;
  if (!scan_records(f, &recs) || recs.size() < 2) {
    fclose(f); set_err("bad record structure"); return 2;
  }
  size_t npts = (size_t)mx * my * mz * nv;
  if (recs[0].len != npts * wordsize) {
    fclose(f);
    snprintf(g_err, kMaxErr,
             "field record is %u bytes, expected %zu (mx=%ld my=%ld mz=%ld "
             "nv=%ld ws=%d)", recs[0].len, npts * wordsize, mx, my, mz, nv,
             wordsize);
    return 3;
  }
  std::vector<char> buf(recs[0].len);
  fseek(f, recs[0].offset, SEEK_SET);
  if (fread(buf.data(), 1, recs[0].len, f) != recs[0].len) {
    fclose(f); set_err("short read of field record"); return 4;
  }
  if (wordsize == 4)
    f2c_transpose((const float*)buf.data(), (float*)fields, mx, my, mz, nv);
  else
    f2c_transpose((const double*)buf.data(), (double*)fields, mx, my, mz, nv);

  // trailer record: t, x, y, z, dx, dy, dz [, deltay]
  size_t base = (size_t)(1 + mx + my + mz + 3) * wordsize;
  const Rec& r = recs[1];
  *has_deltay = (r.len == base + (size_t)wordsize) ? 1 : 0;
  if (r.len != base && !*has_deltay) {
    fclose(f); set_err("unexpected trailer record length"); return 5;
  }
  std::vector<char> tb(r.len);
  fseek(f, r.offset, SEEK_SET);
  if (fread(tb.data(), 1, r.len, f) != r.len) {
    fclose(f); set_err("short read of trailer"); return 6;
  }
  auto get = [&](size_t idx) -> double {
    if (wordsize == 4) return ((const float*)tb.data())[idx];
    return ((const double*)tb.data())[idx];
  };
  size_t o = 0;
  *t = get(o++);
  for (long i = 0; i < mx; ++i) x[i] = get(o++);
  for (long i = 0; i < my; ++i) y[i] = get(o++);
  for (long i = 0; i < mz; ++i) z[i] = get(o++);
  for (int i = 0; i < 3; ++i) dxyz[i] = get(o++);
  if (*has_deltay) *deltay = get(o++);
  fclose(f);
  return 0;
}

// Write var.dat in the reference layout from C-order fields.
int pc_write_var(const char* path, long mx, long my, long mz, long nv,
                 int wordsize, const void* fields, double t, const double* x,
                 const double* y, const double* z, const double* dxyz,
                 double deltay, int has_deltay) {
  FILE* f = fopen(path, "wb");
  if (!f) { set_err("cannot open file for write"); return 1; }
  size_t npts = (size_t)mx * my * mz * nv;
  std::vector<char> buf(npts * wordsize);
  if (wordsize == 4)
    c2f_transpose((const float*)fields, (float*)buf.data(), mx, my, mz, nv);
  else
    c2f_transpose((const double*)fields, (double*)buf.data(), mx, my, mz, nv);
  auto wrec = [&](const void* data, uint32_t len) {
    fwrite(&len, 4, 1, f);
    fwrite(data, 1, len, f);
    fwrite(&len, 4, 1, f);
  };
  wrec(buf.data(), (uint32_t)(npts * wordsize));

  size_t ntr = 1 + mx + my + mz + 3 + (has_deltay ? 1 : 0);
  std::vector<char> tb(ntr * wordsize);
  auto put = [&](size_t idx, double v) {
    if (wordsize == 4) ((float*)tb.data())[idx] = (float)v;
    else ((double*)tb.data())[idx] = v;
  };
  size_t o = 0;
  put(o++, t);
  for (long i = 0; i < mx; ++i) put(o++, x[i]);
  for (long i = 0; i < my; ++i) put(o++, y[i]);
  for (long i = 0; i < mz; ++i) put(o++, z[i]);
  for (int i = 0; i < 3; ++i) put(o++, dxyz[i]);
  if (has_deltay) put(o++, deltay);
  wrec(tb.data(), (uint32_t)(ntr * wordsize));
  int rc = fclose(f) == 0 ? 0 : 7;
  if (rc) set_err("close failed");
  return rc;
}

}  // extern "C"
