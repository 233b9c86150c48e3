// YUV4MPEG2 stream reader/writer + threaded prefetch ring.
//
// The reference runs as a VapourSynth plugin and leans on the host for
// all frame IO and for the prefetching scheduler that overlaps frame
// production with consumption (fmParallel getFrame concurrency,
// readme.rst:19).  This is the standalone TPU-native framework's
// equivalent host runtime: a C++ y4m demuxer/muxer and a ring-buffered
// reader thread so host IO and decode overlap device compute.  Exposed
// as a plain C ABI consumed from Python via ctypes
// (mvtools_tpu/io/y4m.py).
//
// Format: https://wiki.multimedia.cx/index.php/YUV4MPEG2 — header
// "YUV4MPEG2 W<w> H<h> F<n>:<d> I<i> A<a>:<b> C<fmt>\n", frames as
// "FRAME...\n" + planar data.  C420*/C422/C444/Cmono plus 16-bit
// variants (C420p16 etc.).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Y4MInfo {
  int width = 0;
  int height = 0;
  int fps_num = 25;
  int fps_den = 1;
  int sub_w = 1;   // chroma subsampling ratios
  int sub_h = 1;
  int bits = 8;
  int planes = 3;
};

size_t plane_bytes(const Y4MInfo& info, int plane) {
  size_t w = info.width, h = info.height;
  if (plane > 0) {
    w /= info.sub_w;
    h /= info.sub_h;
  }
  return w * h * (info.bits > 8 ? 2 : 1);
}

size_t frame_bytes(const Y4MInfo& info) {
  size_t total = 0;
  for (int p = 0; p < info.planes; p++) total += plane_bytes(info, p);
  return total;
}

bool parse_colorspace(const char* tag, Y4MInfo* info) {
  // base format
  if (!strncmp(tag, "mono", 4)) {
    info->planes = 1;
    info->sub_w = info->sub_h = 1;
    tag += 4;
  } else if (!strncmp(tag, "420", 3)) {
    info->planes = 3;
    info->sub_w = info->sub_h = 2;
    tag += 3;
    // skip jpeg/mpeg2/paldv siting suffixes: a 'p' only marks bit depth
    // when followed by a digit (C420p10), otherwise it is part of the
    // suffix (C420jpeg, C420mpeg2, C420paldv)
    while (*tag && !(*tag == 'p' && isdigit((unsigned char)tag[1])) &&
           !isdigit((unsigned char)*tag))
      tag++;
  } else if (!strncmp(tag, "422", 3)) {
    info->planes = 3;
    info->sub_w = 2;
    info->sub_h = 1;
    tag += 3;
  } else if (!strncmp(tag, "444", 3)) {
    info->planes = 3;
    info->sub_w = info->sub_h = 1;
    tag += 3;
  } else {
    return false;
  }
  info->bits = 8;
  if (*tag == 'p') {
    info->bits = atoi(tag + 1);
    if (info->bits < 8 || info->bits > 16) return false;
  }
  return true;
}

struct Reader {
  FILE* f = nullptr;
  Y4MInfo info;
  // prefetch ring
  std::vector<std::vector<uint8_t>> ring;
  std::vector<bool> full;
  size_t head = 0, tail = 0;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread worker;
  std::atomic<bool> eof{false}, stop{false};

  ~Reader() {
    stop = true;
    cv_empty.notify_all();
    cv_full.notify_all();
    if (worker.joinable()) worker.join();
    if (f) fclose(f);
  }

  bool read_frame_into(uint8_t* dst) {
    char line[256];
    if (!fgets(line, sizeof(line), f)) return false;
    if (strncmp(line, "FRAME", 5) != 0) return false;
    size_t need = frame_bytes(info);
    return fread(dst, 1, need, f) == need;
  }

  void run() {
    const size_t n = ring.size();
    while (!stop) {
      std::unique_lock<std::mutex> lk(mu);
      cv_empty.wait(lk, [&] { return stop || !full[head % n]; });
      if (stop) break;
      lk.unlock();
      if (!read_frame_into(ring[head % n].data())) {
        eof = true;
        cv_full.notify_all();
        break;
      }
      lk.lock();
      full[head % n] = true;
      head++;
      cv_full.notify_all();
    }
  }
};

struct Writer {
  FILE* f = nullptr;
  Y4MInfo info;
  ~Writer() {
    if (f) fclose(f);
  }
};

}  // namespace

extern "C" {

// ---- reader ---------------------------------------------------------------

void* y4m_open_read(const char* path, int prefetch) {
  auto* r = new Reader();
  r->f = strcmp(path, "-") ? fopen(path, "rb") : stdin;
  if (!r->f) {
    delete r;
    return nullptr;
  }
  char line[1024];
  if (!fgets(line, sizeof(line), r->f) ||
      strncmp(line, "YUV4MPEG2", 9) != 0) {
    delete r;
    return nullptr;
  }
  bool have_c = false;
  for (char* tok = strtok(line + 9, " \n"); tok;
       tok = strtok(nullptr, " \n")) {
    switch (tok[0]) {
      case 'W': r->info.width = atoi(tok + 1); break;
      case 'H': r->info.height = atoi(tok + 1); break;
      case 'F': sscanf(tok + 1, "%d:%d", &r->info.fps_num,
                       &r->info.fps_den); break;
      case 'C':
        if (!parse_colorspace(tok + 1, &r->info)) {
          delete r;
          return nullptr;
        }
        have_c = true;
        break;
      default: break;
    }
  }
  if (!have_c) {  // default 420 (spec)
    r->info.planes = 3;
    r->info.sub_w = r->info.sub_h = 2;
    r->info.bits = 8;
  }
  if (r->info.width <= 0 || r->info.height <= 0) {
    delete r;
    return nullptr;
  }
  if (prefetch < 2) prefetch = 2;
  r->ring.resize(prefetch);
  r->full.assign(prefetch, false);
  for (auto& b : r->ring) b.resize(frame_bytes(r->info));
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// info out: [w, h, fps_num, fps_den, sub_w, sub_h, bits, planes]
void y4m_info(void* handle, int* out) {
  auto* r = static_cast<Reader*>(handle);
  out[0] = r->info.width;
  out[1] = r->info.height;
  out[2] = r->info.fps_num;
  out[3] = r->info.fps_den;
  out[4] = r->info.sub_w;
  out[5] = r->info.sub_h;
  out[6] = r->info.bits;
  out[7] = r->info.planes;
}

long long y4m_frame_bytes(void* handle) {
  auto* r = static_cast<Reader*>(handle);
  return (long long)frame_bytes(r->info);
}

// returns 1 on success, 0 at end of stream
int y4m_read_frame(void* handle, uint8_t* dst) {
  auto* r = static_cast<Reader*>(handle);
  const size_t n = r->ring.size();
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_full.wait(lk, [&] {
    return r->full[r->tail % n] || r->eof || r->stop;
  });
  if (!r->full[r->tail % n]) return 0;
  memcpy(dst, r->ring[r->tail % n].data(), frame_bytes(r->info));
  r->full[r->tail % n] = false;
  r->tail++;
  r->cv_empty.notify_all();
  return 1;
}

void y4m_close_read(void* handle) { delete static_cast<Reader*>(handle); }

// ---- writer ---------------------------------------------------------------

void* y4m_open_write(const char* path, int width, int height, int fps_num,
                     int fps_den, int sub_w, int sub_h, int bits,
                     int planes) {
  auto* w = new Writer();
  w->f = strcmp(path, "-") ? fopen(path, "wb") : stdout;
  if (!w->f) {
    delete w;
    return nullptr;
  }
  w->info.width = width;
  w->info.height = height;
  w->info.fps_num = fps_num;
  w->info.fps_den = fps_den;
  w->info.sub_w = sub_w;
  w->info.sub_h = sub_h;
  w->info.bits = bits;
  w->info.planes = planes;
  std::string c;
  if (planes == 1) {
    c = "mono";
  } else if (sub_w == 2 && sub_h == 2) {
    c = "420";
  } else if (sub_w == 2 && sub_h == 1) {
    c = "422";
  } else {
    c = "444";
  }
  if (bits > 8) c += "p" + std::to_string(bits);
  fprintf(w->f, "YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n", width, height,
          fps_num, fps_den, c.c_str());
  return w;
}

int y4m_write_frame(void* handle, const uint8_t* src) {
  auto* w = static_cast<Writer*>(handle);
  fputs("FRAME\n", w->f);
  size_t need = frame_bytes(w->info);
  return fwrite(src, 1, need, w->f) == need ? 1 : 0;
}

void y4m_close_write(void* handle) { delete static_cast<Writer*>(handle); }

}  // extern "C"
