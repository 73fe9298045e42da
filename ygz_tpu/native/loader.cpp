// Native dataset loader: multi-threaded read + decode + grayscale-float
// conversion with a bounded prefetch queue.
//
// The reference's dataset drivers decode images synchronously on the
// tracking thread via cv::imread (Examples/*/*.cc); at real-time rates
// the decode sits on the latency-critical path. This loader runs a
// worker pool that keeps N frames decoded ahead of the consumer, so the
// Python tracking loop only ever memcpy's a ready float32 buffer while
// the TPU computes. PNG via libpng, JPEG via libjpeg, PGM natively.
//
// C ABI (driven from Python through ctypes — no pybind11 dependency):
//   void* ygz_loader_create(const char** paths, int n, int n_workers,
//                           int queue_cap);
//   int   ygz_loader_next(void* h, float* out, int cap, int* w, int* h);
//         -> frame index (or -1 at end / -2 error / -3 buffer too small)
//   void  ygz_loader_destroy(void* h);

#include <atomic>
#include <cctype>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <map>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
    int index = -1;
    int width = 0;
    int height = 0;
    std::vector<float> pixels;  // grayscale, [0, 255]
    bool ok = false;
};

// ---------------------------------------------------------------- decoders

bool decode_png(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    unsigned char header[8];
    if (std::fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(f);
        return false;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             nullptr, nullptr, nullptr);
    if (!png) {
        std::fclose(f);
        return false;
    }
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        std::fclose(f);
        return false;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(f);
        return false;
    }
    png_init_io(png, f);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    // normalize everything to 8-bit gray
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (depth == 16) png_set_strip_16(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
        color == PNG_COLOR_TYPE_RGB_ALPHA)
        png_set_rgb_to_gray_fixed(png, 1, -1, -1);
    png_read_update_info(png, info);

    std::vector<unsigned char> row(png_get_rowbytes(png, info));
    out->width = static_cast<int>(w);
    out->height = static_cast<int>(h);
    out->pixels.resize(static_cast<size_t>(w) * h);
    for (png_uint_32 y = 0; y < h; ++y) {
        png_read_row(png, row.data(), nullptr);
        float* dst = out->pixels.data() + static_cast<size_t>(y) * w;
        for (png_uint_32 x = 0; x < w; ++x)
            dst[x] = static_cast<float>(row[x]);
    }
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(f);
    return true;
}

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        std::fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_GRAYSCALE;
    jpeg_start_decompress(&cinfo);
    out->width = cinfo.output_width;
    out->height = cinfo.output_height;
    out->pixels.resize(static_cast<size_t>(out->width) * out->height);
    std::vector<unsigned char> row(out->width);
    unsigned char* rp = row.data();
    while (cinfo.output_scanline < cinfo.output_height) {
        int y = cinfo.output_scanline;
        jpeg_read_scanlines(&cinfo, &rp, 1);
        float* dst = out->pixels.data() + static_cast<size_t>(y) * out->width;
        for (int x = 0; x < out->width; ++x)
            dst[x] = static_cast<float>(row[x]);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return true;
}

// Reads the next PGM header integer, skipping whitespace and '#' comments
// (both legal anywhere in the header per the netpbm spec). Returns -1 on EOF
// or malformed input.
int pgm_next_int(FILE* f) {
    int c;
    for (;;) {
        c = std::fgetc(f);
        if (c == EOF) return -1;
        if (c == '#') {
            while (c != EOF && c != '\n') c = std::fgetc(f);
            continue;
        }
        if (!std::isspace(c)) break;
    }
    int v = 0;
    bool any = false;
    while (c != EOF && std::isdigit(c)) {
        v = v * 10 + (c - '0');
        any = true;
        c = std::fgetc(f);
    }
    return any ? v : -1;
}

bool decode_pgm(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    char magic[3] = {0};
    if (std::fscanf(f, "%2s", magic) != 1 || std::strcmp(magic, "P5") != 0) {
        std::fclose(f);
        return false;
    }
    int w = pgm_next_int(f);
    int h = pgm_next_int(f);
    int maxv = pgm_next_int(f);
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 65535) {
        std::fclose(f);
        return false;
    }
    // pgm_next_int consumed the single whitespace after maxval already,
    // so the stream now points at the first binary sample
    out->width = w;
    out->height = h;
    out->pixels.resize(static_cast<size_t>(w) * h);
    if (maxv < 256) {
        std::vector<unsigned char> buf(static_cast<size_t>(w) * h);
        if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f);
            return false;
        }
        const float s = 255.0f / maxv;
        for (size_t i = 0; i < buf.size(); ++i)
            out->pixels[i] = static_cast<float>(buf[i]) * s;
    } else {
        std::vector<unsigned char> buf(static_cast<size_t>(w) * h * 2);
        if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
            std::fclose(f);
            return false;
        }
        for (size_t i = 0; i < out->pixels.size(); ++i) {
            unsigned v = (static_cast<unsigned>(buf[2 * i]) << 8) | buf[2 * i + 1];
            out->pixels[i] = static_cast<float>(v) * (255.0f / maxv);
        }
    }
    std::fclose(f);
    return true;
}

bool decode_any(const std::string& path, Image* out) {
    auto dot = path.rfind('.');
    std::string ext = dot == std::string::npos ? "" : path.substr(dot + 1);
    for (auto& c : ext) c = static_cast<char>(tolower(c));
    if (ext == "png") return decode_png(path.c_str(), out);
    if (ext == "jpg" || ext == "jpeg") return decode_jpeg(path.c_str(), out);
    if (ext == "pgm") return decode_pgm(path.c_str(), out);
    // try all
    return decode_png(path.c_str(), out) || decode_jpeg(path.c_str(), out) ||
           decode_pgm(path.c_str(), out);
}

// ---------------------------------------------------------------- loader

class Prefetcher {
  public:
    Prefetcher(std::vector<std::string> paths, int n_workers, int cap)
        : paths_(std::move(paths)), cap_(cap) {
        n_workers = std::max(1, n_workers);
        for (int i = 0; i < n_workers; ++i)
            workers_.emplace_back([this] { WorkerLoop(); });
    }

    ~Prefetcher() {
        {
            std::lock_guard<std::mutex> lk(mu_);
            stop_ = true;
        }
        cv_space_.notify_all();
        cv_ready_.notify_all();
        for (auto& t : workers_) t.join();
    }

    // Blocks until the next frame IN ORDER is decoded.
    std::unique_ptr<Image> Next() {
        std::unique_lock<std::mutex> lk(mu_);
        if (next_out_ >= static_cast<int>(paths_.size())) return nullptr;
        cv_ready_.wait(lk, [this] {
            return stop_ || done_.count(next_out_) > 0;
        });
        if (stop_) return nullptr;
        auto it = done_.find(next_out_);
        auto img = std::move(it->second);
        done_.erase(it);
        ++next_out_;
        cv_space_.notify_all();
        return img;
    }

  private:
    void WorkerLoop() {
        for (;;) {
            int idx;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_space_.wait(lk, [this] {
                    return stop_ ||
                           (next_in_ < static_cast<int>(paths_.size()) &&
                            static_cast<int>(done_.size()) + in_flight_ < cap_);
                });
                if (stop_ || next_in_ >= static_cast<int>(paths_.size()))
                    return;
                idx = next_in_++;
                ++in_flight_;
            }
            auto img = std::make_unique<Image>();
            img->index = idx;
            img->ok = decode_any(paths_[idx], img.get());
            {
                std::lock_guard<std::mutex> lk(mu_);
                done_[idx] = std::move(img);
                --in_flight_;
            }
            cv_ready_.notify_all();
        }
    }

    std::vector<std::string> paths_;
    int cap_;
    std::mutex mu_;
    std::condition_variable cv_ready_, cv_space_;
    std::map<int, std::unique_ptr<Image>> done_;
    std::vector<std::thread> workers_;
    int next_in_ = 0;
    int next_out_ = 0;
    int in_flight_ = 0;
    bool stop_ = false;
};

}  // namespace

extern "C" {

void* ygz_loader_create(const char** paths, int n, int n_workers,
                        int queue_cap) {
    std::vector<std::string> v(paths, paths + n);
    return new Prefetcher(std::move(v), n_workers, std::max(2, queue_cap));
}

int ygz_loader_next(void* handle, float* out, int out_capacity,
                    int* width, int* height) {
    auto* p = static_cast<Prefetcher*>(handle);
    auto img = p->Next();
    if (!img) return -1;
    if (!img->ok) return -2;
    if (static_cast<int>(img->pixels.size()) > out_capacity) return -3;
    std::memcpy(out, img->pixels.data(), img->pixels.size() * sizeof(float));
    *width = img->width;
    *height = img->height;
    return img->index;
}

void ygz_loader_destroy(void* handle) {
    delete static_cast<Prefetcher*>(handle);
}

// single-shot decode (no prefetcher) for ad-hoc use
int ygz_decode(const char* path, float* out, int out_capacity,
               int* width, int* height) {
    Image img;
    if (!decode_any(path, &img)) return -2;
    if (static_cast<int>(img.pixels.size()) > out_capacity) return -3;
    std::memcpy(out, img.pixels.data(), img.pixels.size() * sizeof(float));
    *width = img.width;
    *height = img.height;
    return 0;
}

}  // extern "C"
