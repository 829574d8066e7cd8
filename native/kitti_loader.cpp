// Native KITTI velodyne loader — host-side I/O fast path.
//
// TPU-native analogue of the reference's C++ reader stack (reference:
// src/models/io/kitti_reader.cpp + read_file.hpp:307-327 and the dedicated
// reader thread in src/core_node/kitti_reader_nodelet.cpp:60-70). The
// reference reads one float at a time through fstream on a nodelet thread;
// here a single read() pulls the whole file and a pthread pool loads many
// scans concurrently so host I/O overlaps device compute.
//
// Exposed via ctypes (no pybind11 in this image):
//   kitti_read_bin(path, out, cap)            -> npoints (finite-filtered)
//   kitti_read_batch(paths, n, out, cap, nthreads) -> per-file counts
//
// Build: make -C native   (produces libkitti_loader.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// Read one .bin of float32 x,y,z,intensity records into out[cap*4],
// dropping non-finite points. Returns point count or -1 on error.
long read_bin_impl(const char* path, float* out, long cap) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return -1;
  }
  long nrec = static_cast<long>(st.st_size / (4 * sizeof(float)));
  long want = nrec < cap ? nrec : cap;
  long n = 0;
  // stream in 1 MiB chunks straight into the caller's buffer region,
  // compacting non-finite records in place.
  const long CHUNK = (1 << 20) / (4 * sizeof(float));
  float* buf = new float[CHUNK * 4];
  long read_recs = 0;
  while (read_recs < want) {
    long todo = want - read_recs < CHUNK ? want - read_recs : CHUNK;
    ssize_t got = ::read(fd, buf, todo * 4 * sizeof(float));
    if (got <= 0) break;
    long recs = got / (4 * sizeof(float));
    for (long i = 0; i < recs; ++i) {
      const float* p = buf + i * 4;
      if (std::isfinite(p[0]) && std::isfinite(p[1]) && std::isfinite(p[2]) &&
          std::isfinite(p[3])) {
        std::memcpy(out + n * 4, p, 4 * sizeof(float));
        ++n;
      }
    }
    read_recs += recs;
  }
  delete[] buf;
  ::close(fd);
  return n;
}

struct BatchJob {
  const char* const* paths;
  float* out;        // nfiles * cap * 4 floats
  long* counts;      // nfiles
  long cap;
  long nfiles;
  long next;         // work index
  pthread_mutex_t mu;
};

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  for (;;) {
    pthread_mutex_lock(&job->mu);
    long i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->nfiles) return nullptr;
    job->counts[i] = read_bin_impl(job->paths[i], job->out + i * job->cap * 4,
                                   job->cap);
  }
}

}  // namespace

extern "C" {

long kitti_read_bin(const char* path, float* out, long cap) {
  return read_bin_impl(path, out, cap);
}

// Load nfiles scans concurrently with nthreads workers.
// out must hold nfiles*cap*4 floats; counts receives per-file point counts.
void kitti_read_batch(const char* const* paths, long nfiles, float* out,
                      long cap, long* counts, long nthreads) {
  if (nthreads < 1) nthreads = 1;
  if (nthreads > nfiles) nthreads = nfiles;
  BatchJob job{paths, out, counts, cap, nfiles, 0, PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  if (nthreads > 64) nthreads = 64;
  for (long t = 0; t < nthreads; ++t)
    pthread_create(&tids[t], nullptr, batch_worker, &job);
  for (long t = 0; t < nthreads; ++t) pthread_join(tids[t], nullptr);
}

}  // extern "C"
