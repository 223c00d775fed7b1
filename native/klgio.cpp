// Native .klg log decoder for cofusion_tpu — C-ABI shared library used via ctypes.
//
// Plays the role of the reference's KlgLogReader (GUI/Tools/KlgLogReader.cpp:41-128)
// + JPEGLoader (GUI/Tools/JPEGLoader.h): per frame the format is
//   int64 timestamp, int32 depthSize, int32 rgbSize,
//   depth payload (zlib-compressed uint16 millimeters, or raw when
//   depthSize == w*h*2), rgb payload (JPEG, or raw 3-byte pixels when
//   rgbSize == w*h*3), with a leading int32 frame count.
//
// Differences from the reference: this is a pure decoder with an explicit seek
// index (built lazily) so random access / rewind / fast-forward are O(1) instead
// of a file-pointer stack; conversion to float meters happens here so Python
// receives ready-to-upload arrays.
//
// Build: make -C native   (links against system zlib + libjpeg)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <zlib.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpegErrorExit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Returns 0 on success. Output is tightly-packed RGB (w*h*3).
int decodeJpeg(const unsigned char* src, unsigned long src_len, unsigned char* dst,
               int expect_w, int expect_h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpegErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(src), src_len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) != expect_w ||
      static_cast<int>(cinfo.output_height) != expect_h) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  const int stride = expect_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = dst + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct KlgFile {
  FILE* fp = nullptr;
  int32_t num_frames = 0;
  int width = 0;
  int height = 0;
  int current = 0;
  std::vector<long> offsets;  // lazily grown seek index (frame -> file offset)
  std::vector<unsigned char> depth_buf;
  std::vector<unsigned char> rgb_buf;
  std::vector<unsigned char> depth_raw;  // decompressed uint16 mm
};

}  // namespace

extern "C" {

void* klg_open(const char* path, int width, int height) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return nullptr;
  auto* k = new KlgFile();
  k->fp = fp;
  k->width = width;
  k->height = height;
  if (std::fread(&k->num_frames, sizeof(int32_t), 1, fp) != 1) {
    std::fclose(fp);
    delete k;
    return nullptr;
  }
  k->offsets.push_back(std::ftell(fp));
  const size_t npix = static_cast<size_t>(width) * height;
  k->depth_buf.resize(npix * 2 + 1024);
  k->rgb_buf.resize(npix * 3 + 1024);
  k->depth_raw.resize(npix * 2);
  return k;
}

int klg_num_frames(void* handle) { return static_cast<KlgFile*>(handle)->num_frames; }

int klg_current(void* handle) { return static_cast<KlgFile*>(handle)->current; }

// Decode the next frame into depth_m (float32 meters, h*w) and rgb (uint8 h*w*3).
// Returns 0 on success, <0 on error/EOF.  timestamp_out may be null.
int klg_next(void* handle, float* depth_m, unsigned char* rgb, int64_t* timestamp_out) {
  auto* k = static_cast<KlgFile*>(handle);
  if (k->current >= k->num_frames) return -1;

  int64_t ts;
  int32_t depth_size, rgb_size;
  if (std::fread(&ts, sizeof(int64_t), 1, k->fp) != 1) return -2;
  if (std::fread(&depth_size, sizeof(int32_t), 1, k->fp) != 1) return -2;
  if (std::fread(&rgb_size, sizeof(int32_t), 1, k->fp) != 1) return -2;
  const size_t npix = static_cast<size_t>(k->width) * k->height;
  if (depth_size <= 0 || static_cast<size_t>(depth_size) > k->depth_buf.size()) return -3;
  if (rgb_size < 0 || static_cast<size_t>(rgb_size) > k->rgb_buf.size()) return -3;
  if (std::fread(k->depth_buf.data(), 1, depth_size, k->fp) != static_cast<size_t>(depth_size))
    return -2;
  if (rgb_size > 0 &&
      std::fread(k->rgb_buf.data(), 1, rgb_size, k->fp) != static_cast<size_t>(rgb_size))
    return -2;

  // depth: raw or zlib uint16 mm -> float meters
  const uint16_t* mm = nullptr;
  if (static_cast<size_t>(depth_size) == npix * 2) {
    mm = reinterpret_cast<const uint16_t*>(k->depth_buf.data());
  } else {
    uLongf dlen = static_cast<uLongf>(npix * 2);
    if (uncompress(k->depth_raw.data(), &dlen, k->depth_buf.data(), depth_size) != Z_OK)
      return -4;
    mm = reinterpret_cast<const uint16_t*>(k->depth_raw.data());
  }
  for (size_t i = 0; i < npix; ++i) depth_m[i] = mm[i] * 0.001f;

  // rgb: raw or JPEG
  if (rgb_size == 0) {
    std::memset(rgb, 0, npix * 3);
  } else if (static_cast<size_t>(rgb_size) == npix * 3) {
    std::memcpy(rgb, k->rgb_buf.data(), npix * 3);
  } else {
    if (decodeJpeg(k->rgb_buf.data(), rgb_size, rgb, k->width, k->height) != 0) return -5;
  }

  if (timestamp_out) *timestamp_out = ts;
  k->current++;
  if (static_cast<size_t>(k->current) >= k->offsets.size())
    k->offsets.push_back(std::ftell(k->fp));
  return 0;
}

// Skip frames without decoding (KlgLogReader::fastForward semantics).
int klg_skip(void* handle, int n) {
  auto* k = static_cast<KlgFile*>(handle);
  for (int i = 0; i < n && k->current < k->num_frames; ++i) {
    int64_t ts;
    int32_t depth_size, rgb_size;
    if (std::fread(&ts, sizeof(int64_t), 1, k->fp) != 1) return -2;
    if (std::fread(&depth_size, sizeof(int32_t), 1, k->fp) != 1) return -2;
    if (std::fread(&rgb_size, sizeof(int32_t), 1, k->fp) != 1) return -2;
    if (std::fseek(k->fp, depth_size + rgb_size, SEEK_CUR) != 0) return -2;
    k->current++;
    if (static_cast<size_t>(k->current) >= k->offsets.size())
      k->offsets.push_back(std::ftell(k->fp));
  }
  return k->current;
}

// Seek to an already-visited frame index (rewind / getPrevious).
int klg_seek(void* handle, int frame) {
  auto* k = static_cast<KlgFile*>(handle);
  if (frame < 0 || static_cast<size_t>(frame) >= k->offsets.size()) return -1;
  if (std::fseek(k->fp, k->offsets[frame], SEEK_SET) != 0) return -2;
  k->current = frame;
  return 0;
}

void klg_close(void* handle) {
  auto* k = static_cast<KlgFile*>(handle);
  if (k->fp) std::fclose(k->fp);
  delete k;
}

// Encoder (for tests and dataset conversion): writes one frame; pass
// compress_depth=1 to zlib the uint16 payload.  Returns 0 on success.
int klg_write_frame(FILE* fp, int64_t ts, const uint16_t* depth_mm, const unsigned char* rgb,
                    int width, int height, int compress_depth) {
  const size_t npix = static_cast<size_t>(width) * height;
  std::vector<unsigned char> dbuf;
  int32_t depth_size;
  const unsigned char* dptr;
  if (compress_depth) {
    uLongf cap = compressBound(static_cast<uLong>(npix * 2));
    dbuf.resize(cap);
    if (compress(dbuf.data(), &cap, reinterpret_cast<const unsigned char*>(depth_mm),
                 static_cast<uLong>(npix * 2)) != Z_OK)
      return -1;
    depth_size = static_cast<int32_t>(cap);
    dptr = dbuf.data();
  } else {
    depth_size = static_cast<int32_t>(npix * 2);
    dptr = reinterpret_cast<const unsigned char*>(depth_mm);
  }
  int32_t rgb_size = static_cast<int32_t>(npix * 3);
  if (std::fwrite(&ts, sizeof(int64_t), 1, fp) != 1) return -2;
  if (std::fwrite(&depth_size, sizeof(int32_t), 1, fp) != 1) return -2;
  if (std::fwrite(&rgb_size, sizeof(int32_t), 1, fp) != 1) return -2;
  if (std::fwrite(dptr, 1, depth_size, fp) != static_cast<size_t>(depth_size)) return -2;
  if (std::fwrite(rgb, 1, rgb_size, fp) != static_cast<size_t>(rgb_size)) return -2;
  return 0;
}

int klg_write(const char* path, int num_frames, int width, int height,
              const int64_t* timestamps, const uint16_t* depths_mm,
              const unsigned char* rgbs, int compress_depth) {
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return -1;
  int32_t n = num_frames;
  if (std::fwrite(&n, sizeof(int32_t), 1, fp) != 1) {
    std::fclose(fp);
    return -2;
  }
  const size_t npix = static_cast<size_t>(width) * height;
  for (int i = 0; i < num_frames; ++i) {
    if (klg_write_frame(fp, timestamps[i], depths_mm + i * npix, rgbs + i * npix * 3, width,
                        height, compress_depth) != 0) {
      std::fclose(fp);
      return -3;
    }
  }
  std::fclose(fp);
  return 0;
}

}  // extern "C"
