// Native batch image loader: decode (JPEG/PNG) + bilinear resize + RGB
// normalise, multi-threaded, no GIL.
//
// The reference's image path is scipy.misc imread/imresize (C-backed,
// preprocess.py:88-90) plus per-item PIL in DataLoader worker *processes*
// (data_loader.py:28-32). This library replaces both for the online
// pipeline: one call decodes a whole batch of files into a caller-provided
// uint8 [N, size, size, 3] buffer using a C++ thread pool — Python threads
// stay free, and throughput scales with host cores instead of being
// GIL-bound.
//
// Grayscale is promoted to RGB and alpha dropped (matching
// preprocess.py:94-97 / data_loader.py:29 semantics). Failed decodes
// zero-fill their slot and are reported via the per-image status array.
//
// Build: make -C csrc   (links -ljpeg -lpng)

#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<unsigned char> data;  // RGB8
  int w = 0, h = 0;
};

// --- JPEG ------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // forces grayscale/CMYK -> RGB
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->data.resize(static_cast<size_t>(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        out->data.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg downgrades corrupt-data conditions (premature EOF, extraneous
  // bytes) to warnings and silently returns a part-gray image; PIL's strict
  // default raises on those files. Treat any corrupt-data warning as a
  // failed decode so both paths agree (the Python loader then applies the
  // caller's corrupt policy).
  bool clean = jerr.mgr.num_warnings == 0;
  jpeg_destroy_decompress(&cinfo);
  return clean;
}

// --- PNG (simplified libpng16 API) ----------------------------------------

bool decode_png(const char* path, Image* out) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  image.format = PNG_FORMAT_RGB;
  out->w = image.width;
  out->h = image.height;
  out->data.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// --- dispatch + resize -----------------------------------------------------

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t n = std::fread(magic, 1, 8, f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    std::rewind(f);
    ok = decode_jpeg(f, out);
    std::fclose(f);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    std::fclose(f);
    ok = decode_png(path, out);
  } else {
    std::fclose(f);
  }
  return ok && out->w > 0 && out->h > 0;
}

// Bilinear squash-resize to size x size (the imresize semantics the
// reference's offline pass uses — no aspect preservation).
void resize_bilinear(const Image& src, int size, unsigned char* dst) {
  const float sx = static_cast<float>(src.w) / size;
  const float sy = static_cast<float>(src.h) / size;
  for (int y = 0; y < size; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < size; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.data[(static_cast<size_t>(y0) * src.w + x0) * 3 + c];
        float v01 = src.data[(static_cast<size_t>(y0) * src.w + x1) * 3 + c];
        float v10 = src.data[(static_cast<size_t>(y1) * src.w + x0) * 3 + c];
        float v11 = src.data[(static_cast<size_t>(y1) * src.w + x1) * 3 + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                  wy * ((1 - wx) * v10 + wx * v11);
        dst[(static_cast<size_t>(y) * size + x) * 3 + c] =
            static_cast<unsigned char>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

// paths: n NUL-terminated strings concatenated ('\0'-separated).
// out: caller buffer [n, size, size, 3] uint8. status: n bytes (1 = ok).
// Returns the number of successfully decoded images.
int load_images_batch(const char* paths, int n, int size,
                      unsigned char* out, unsigned char* status,
                      int n_threads) {
  std::vector<const char*> files;
  files.reserve(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files.push_back(p);
    p += std::strlen(p) + 1;
  }
  if (n_threads < 1) n_threads = 1;
  const size_t stride = static_cast<size_t>(size) * size * 3;

  auto work = [&](int tid) {
    for (int i = tid; i < n; i += n_threads) {
      Image img;
      if (decode_file(files[i], &img)) {
        resize_bilinear(img, size, out + stride * i);
        status[i] = 1;
      } else {
        std::memset(out + stride * i, 0, stride);
        status[i] = 0;
      }
    }
  };
  if (n_threads == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
    for (auto& t : threads) t.join();
  }
  int ok = 0;
  for (int i = 0; i < n; ++i) ok += status[i];
  return ok;
}

}  // extern "C"
