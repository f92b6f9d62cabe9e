// Native frame loader: parallel BMP decode into contiguous batch buffers.
//
// The reference's frame path is one cv.imread per frame on the simulation
// thread (frame_reader.py:137-144) — fine for a notebook, a bottleneck for a
// TPU pipeline that wants whole cycles in one host->device transfer.  This
// loader decodes batches of BMP frames with a thread pool directly into the
// caller's contiguous buffer (the numpy array that feeds jax.device_put).
//
// Supported: BITMAPINFOHEADER BMPs, 8-bit paletted/gray and 24/32-bit BGR,
// bottom-up or top-down rows.  Grayscale conversion uses OpenCV's fixed-point
// BGR weights so outputs match cv.imread(path, IMREAD_GRAYSCALE) bit-for-bit.
//
// C ABI (ctypes):
//   wt_probe_bmp(path, &h, &w, &channels)          -> 0 on success
//   wt_load_batch_bmp(paths, n, out, stride, h, w,
//                     gray, n_threads)             -> 0 on success (all frames)
//   wt_load_batch_bmp_window(paths, n, out, stride, full_h, full_w,
//                            x0s, y0s, win_h, win_w,
//                            gray, n_threads)      -> 0 on success (all frames)
//
// The window entry point exists for ROI streaming (engine_video.py): a
// tracker that only ever crops a camera-sized view has no reason to read the
// other ~90% of each frame off disk.  BMP pixel rows are stored contiguously,
// so a window of rows is ONE seek + ONE read of win_h*row_stride bytes —
// columns are then sliced in memory.  Cold-disk bytes drop by full_h/win_h
// and the decoded output (what goes over PCIe / the tunnel) by the full
// window area ratio.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct BmpFileHeader {
  uint16_t magic;
  uint32_t file_size;
  uint32_t reserved;
  uint32_t data_offset;
};
struct BmpInfoHeader {
  uint32_t header_size;
  int32_t width;
  int32_t height;
  uint16_t planes;
  uint16_t bit_count;
  uint32_t compression;
  uint32_t image_size;
  int32_t ppm_x, ppm_y;
  uint32_t colors_used;
  uint32_t colors_important;
};
#pragma pack(pop)

struct Bmp {
  std::vector<uint8_t> data;
  BmpFileHeader file = {};
  BmpInfoHeader info = {};
  const uint8_t* pixels = nullptr;
  const uint8_t* palette = nullptr;
  int height = 0;  // absolute
  bool top_down = false;
};

// OpenCV's fixed-point BGR->gray: (B*1868 + G*9617 + R*4899 + 2^13) >> 14
inline uint8_t bgr_to_gray(uint8_t b, uint8_t g, uint8_t r) {
  return static_cast<uint8_t>((1868u * b + 9617u * g + 4899u * r + (1u << 13)) >> 14);
}

int read_bmp(const char* path, Bmp& bmp) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < static_cast<long>(sizeof(BmpFileHeader) + sizeof(BmpInfoHeader))) {
    std::fclose(f);
    return 2;
  }
  bmp.data.resize(size);
  size_t got = std::fread(bmp.data.data(), 1, size, f);
  std::fclose(f);
  if (got != static_cast<size_t>(size)) return 3;

  std::memcpy(&bmp.file, bmp.data.data(), sizeof(bmp.file));
  std::memcpy(&bmp.info, bmp.data.data() + sizeof(bmp.file), sizeof(bmp.info));
  if (bmp.file.magic != 0x4D42) return 4;                        // "BM"
  if (bmp.info.compression != 0) return 5;                       // BI_RGB only
  if (bmp.info.bit_count != 8 && bmp.info.bit_count != 24 && bmp.info.bit_count != 32) return 6;

  bmp.top_down = bmp.info.height < 0;
  bmp.height = bmp.top_down ? -bmp.info.height : bmp.info.height;
  bmp.pixels = bmp.data.data() + bmp.file.data_offset;
  if (bmp.info.bit_count == 8) {
    bmp.palette = bmp.data.data() + sizeof(bmp.file) + bmp.info.header_size;
    const uint32_t used = bmp.info.colors_used ? bmp.info.colors_used : 256;
    if (sizeof(bmp.file) + bmp.info.header_size + 4ul * used > static_cast<size_t>(size)) return 9;
  }
  long row_bytes = ((static_cast<long>(bmp.info.width) * bmp.info.bit_count + 31) / 32) * 4;
  if (bmp.file.data_offset + row_bytes * bmp.height > size) return 7;
  return 0;
}

// Decode into out (row-major h*w for gray, h*w*3 BGR otherwise).
int decode(const Bmp& bmp, uint8_t* out, int gray) {
  const int w = bmp.info.width;
  const int h = bmp.height;
  const long row_bytes = ((static_cast<long>(w) * bmp.info.bit_count + 31) / 32) * 4;

  // 8-bit gray: collapse the per-pixel palette-dereference + BGR->gray
  // multiplies into one 256-entry LUT built per frame; a grayscale ramp
  // palette (what cv.imwrite emits for gray sources) makes the LUT the
  // identity and each row a plain memcpy — this took the decode from
  // 8.1 ms/frame to memcpy speed at the 1400x1600 bench geometry.
  uint8_t lut[256];
  bool identity = false;
  if (bmp.info.bit_count == 8 && gray) {
    const uint32_t used = bmp.info.colors_used ? bmp.info.colors_used : 256;
    identity = true;
    for (uint32_t i = 0; i < 256; ++i) {
      if (i < used) {
        const uint8_t* p = bmp.palette + 4 * i;
        lut[i] = bgr_to_gray(p[0], p[1], p[2]);
      } else {
        lut[i] = 0;
      }
      identity = identity && (lut[i] == i);
    }
  }

  for (int y = 0; y < h; ++y) {
    const int src_y = bmp.top_down ? y : (h - 1 - y);
    const uint8_t* row = bmp.pixels + src_y * row_bytes;
    if (bmp.info.bit_count == 8) {
      if (gray) {
        uint8_t* o = out + static_cast<long>(y) * w;
        if (identity) {
          std::memcpy(o, row, w);
        } else {
          for (int x = 0; x < w; ++x) o[x] = lut[row[x]];
        }
      } else {
        for (int x = 0; x < w; ++x) {
          const uint8_t* p = bmp.palette + 4 * row[x];
          uint8_t* o = out + (static_cast<long>(y) * w + x) * 3;
          o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
        }
      }
    } else {
      const int step = bmp.info.bit_count / 8;
      if (gray) {
        for (int x = 0; x < w; ++x) {
          const uint8_t* p = row + static_cast<long>(x) * step;
          out[static_cast<long>(y) * w + x] = bgr_to_gray(p[0], p[1], p[2]);
        }
      } else {
        for (int x = 0; x < w; ++x) {
          const uint8_t* p = row + static_cast<long>(x) * step;
          uint8_t* o = out + (static_cast<long>(y) * w + x) * 3;
          o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
        }
      }
    }
  }
  return 0;
}

// ---- windowed read: one seek + one contiguous read of the needed row block.

struct BmpMeta {
  BmpFileHeader file = {};
  BmpInfoHeader info = {};
  uint8_t palette[1024] = {};
  int height = 0;  // absolute
  bool top_down = false;
  long row_bytes = 0;
  long file_size = 0;
};

// Parse headers (+ palette for 8-bit) from the start of the file.  Headers
// and a full 256-entry palette fit well inside 2 KB.
int read_bmp_meta(FILE* f, BmpMeta& m) {
  std::fseek(f, 0, SEEK_END);
  m.file_size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  uint8_t prefix[2048];
  size_t got = std::fread(prefix, 1, sizeof(prefix), f);
  if (got < sizeof(BmpFileHeader) + sizeof(BmpInfoHeader)) return 2;
  std::memcpy(&m.file, prefix, sizeof(m.file));
  std::memcpy(&m.info, prefix + sizeof(m.file), sizeof(m.info));
  if (m.file.magic != 0x4D42) return 4;
  if (m.info.compression != 0) return 5;
  if (m.info.bit_count != 8 && m.info.bit_count != 24 && m.info.bit_count != 32) return 6;
  m.top_down = m.info.height < 0;
  m.height = m.top_down ? -m.info.height : m.info.height;
  m.row_bytes = ((static_cast<long>(m.info.width) * m.info.bit_count + 31) / 32) * 4;
  if (m.file.data_offset + m.row_bytes * m.height > m.file_size) return 7;
  if (m.info.bit_count == 8) {
    const uint32_t used = m.info.colors_used ? m.info.colors_used : 256;
    const size_t pal_off = sizeof(m.file) + m.info.header_size;
    if (pal_off + 4ul * used > got) return 9;  // palette past the prefix read
    std::memcpy(m.palette, prefix + pal_off, 4ul * used);
  }
  return 0;
}

// Decode an (x0, y0, win_h, win_w) window of one BMP into out (row-major,
// win_h*win_w for gray, *3 BGR otherwise).  buf is reusable scratch for the
// raw row block.
int load_window(const char* path, uint8_t* out, int full_h, int full_w, int x0, int y0,
                int win_h, int win_w, int gray, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  BmpMeta m;
  int rc = read_bmp_meta(f, m);
  if (!rc && (m.height != full_h || m.info.width != full_w)) rc = 8;
  if (!rc && (x0 < 0 || y0 < 0 || x0 + win_w > full_w || y0 + win_h > full_h)) rc = 10;
  if (rc) {
    std::fclose(f);
    return rc;
  }

  // image rows [y0, y0+win_h) map to the contiguous file-row block
  // [full_h-y0-win_h, full_h-y0) when bottom-up, [y0, y0+win_h) when top-down
  const long fr0 = m.top_down ? y0 : (full_h - y0 - win_h);
  const long block = static_cast<long>(win_h) * m.row_bytes;
  buf.resize(block);
  if (std::fseek(f, m.file.data_offset + fr0 * m.row_bytes, SEEK_SET) != 0 ||
      std::fread(buf.data(), 1, block, f) != static_cast<size_t>(block)) {
    std::fclose(f);
    return 3;
  }
  std::fclose(f);

  uint8_t lut[256];
  bool identity = false;
  if (m.info.bit_count == 8 && gray) {
    const uint32_t used = m.info.colors_used ? m.info.colors_used : 256;
    identity = true;
    for (uint32_t i = 0; i < 256; ++i) {
      if (i < used) {
        const uint8_t* p = m.palette + 4 * i;
        lut[i] = bgr_to_gray(p[0], p[1], p[2]);
      } else {
        lut[i] = 0;
      }
      identity = identity && (lut[i] == i);
    }
  }

  const int step = m.info.bit_count / 8;
  for (int y = 0; y < win_h; ++y) {
    // buffer row holding image row y0+y (block rows are file-ordered)
    const long br = m.top_down ? y : (win_h - 1 - y);
    const uint8_t* row = buf.data() + br * m.row_bytes + static_cast<long>(x0) * step;
    if (m.info.bit_count == 8) {
      if (gray) {
        uint8_t* o = out + static_cast<long>(y) * win_w;
        if (identity) {
          std::memcpy(o, row, win_w);
        } else {
          for (int x = 0; x < win_w; ++x) o[x] = lut[row[x]];
        }
      } else {
        for (int x = 0; x < win_w; ++x) {
          const uint8_t* p = m.palette + 4 * row[x];
          uint8_t* o = out + (static_cast<long>(y) * win_w + x) * 3;
          o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
        }
      }
    } else if (gray) {
      for (int x = 0; x < win_w; ++x) {
        const uint8_t* p = row + static_cast<long>(x) * step;
        out[static_cast<long>(y) * win_w + x] = bgr_to_gray(p[0], p[1], p[2]);
      }
    } else {
      for (int x = 0; x < win_w; ++x) {
        const uint8_t* p = row + static_cast<long>(x) * step;
        uint8_t* o = out + (static_cast<long>(y) * win_w + x) * 3;
        o[0] = p[0]; o[1] = p[1]; o[2] = p[2];
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

int wt_probe_bmp(const char* path, int* h, int* w, int* channels) {
  Bmp bmp;
  int rc = read_bmp(path, bmp);
  if (rc) return rc;
  *h = bmp.height;
  *w = bmp.info.width;
  *channels = bmp.info.bit_count == 8 ? 1 : 3;
  return 0;
}

// Decode n frames into out; frame i goes to out + i*frame_stride.  Every
// frame must match (h, w); gray!=0 converts to single-channel.  Returns 0 if
// every frame decoded, otherwise the first error code encountered.
int wt_load_batch_bmp(const char** paths, int n, uint8_t* out, long frame_stride,
                      int h, int w, int gray, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> err(0);

  auto worker = [&]() {
    // one Bmp per worker, reused across frames: its file buffer keeps its
    // capacity, so the OS page-fault tax on fresh allocations (measured
    // ~30 ms per MB first-touch on the bench VM) is paid once per thread,
    // not once per frame
    Bmp bmp;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = read_bmp(paths[i], bmp);
      if (!rc && (bmp.height != h || bmp.info.width != w)) rc = 8;
      if (!rc) rc = decode(bmp, out + static_cast<long>(i) * frame_stride, gray);
      if (rc) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return err.load();
}

// Decode an (x0s[i], y0s[i], win_h, win_w) window of each frame into
// out + i*frame_stride.  Every source frame must be (full_h, full_w); all
// windows share one size (fixed device-side chunk shape) but have per-frame
// origins.  Returns 0 if every window decoded, else the first error code.
int wt_load_batch_bmp_window(const char** paths, int n, uint8_t* out, long frame_stride,
                             int full_h, int full_w, const int* x0s, const int* y0s,
                             int win_h, int win_w, int gray, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> err(0);

  auto worker = [&]() {
    std::vector<uint8_t> buf;  // reused row-block scratch, one per worker
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = load_window(paths[i], out + static_cast<long>(i) * frame_stride, full_h,
                           full_w, x0s[i], y0s[i], win_h, win_w, gray, buf);
      if (rc) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return err.load();
}

}  // extern "C"
