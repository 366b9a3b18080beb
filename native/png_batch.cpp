// Native batch PNG→grayscale decoder for the host data pipeline.
//
// The reference's training loaders decode spectrogram PNGs one at a time in
// Python (PIL Image.open(...).convert("L"), reference src/helpers.py:141 and
// torchvision ImageFolder via src/diff_utils.py:61-136); here a C++ thread
// pool decodes a whole batch into a caller-owned uint8 [batch, H*W] buffer —
// no per-sample Python in the hot path. Inflate is zlib; the RGB→L weights
// are PIL's exact ITU-R 601-2 integer rounding (L = (R·19595 + G·38470 +
// B·7471 + 0x8000) >> 16) so outputs are bit-identical to the PIL path.
//
// Supported: 8-bit depth, non-interlaced; color types 0 (gray), 2 (RGB),
// 3 (palette), 4 (gray+alpha), 6 (RGBA). Anything else (16-bit, Adam7)
// reports ok=0 for that row and the Python wrapper falls back to PIL.
//
// C ABI (ctypes):
//   int png_batch_load_gray(const char** paths, int n,
//                           unsigned char* out, long out_stride,
//                           int expect_h, int expect_w,
//                           unsigned char* ok, int num_threads);
// Returns the number of successfully decoded images; rows whose file fails
// to parse or whose dimensions differ from (expect_h, expect_w) are zeroed
// with ok[i] = 0.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct Chunks {
    uint32_t width = 0, height = 0;
    uint8_t bit_depth = 0, color_type = 0, interlace = 1;
    std::vector<uint8_t> idat;
    std::vector<uint8_t> palette;  // RGB triples
};

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | p[3];
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (size <= 0) { fclose(f); return false; }
    buf->resize(size_t(size));
    bool ok = fread(buf->data(), 1, size_t(size), f) == size_t(size);
    fclose(f);
    return ok;
}

bool parse_chunks(const std::vector<uint8_t>& data, Chunks* out) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (data.size() < 8 || memcmp(data.data(), sig, 8) != 0) return false;
    size_t pos = 8;
    bool saw_ihdr = false;
    while (pos + 8 <= data.size()) {
        uint32_t len = be32(&data[pos]);
        if (pos + 12 + len > data.size()) return false;
        const uint8_t* type = &data[pos + 4];
        const uint8_t* body = &data[pos + 8];
        if (memcmp(type, "IHDR", 4) == 0) {
            if (len != 13) return false;
            out->width = be32(body);
            out->height = be32(body + 4);
            out->bit_depth = body[8];
            out->color_type = body[9];
            out->interlace = body[12];
            saw_ihdr = true;
        } else if (memcmp(type, "PLTE", 4) == 0) {
            out->palette.assign(body, body + len);
        } else if (memcmp(type, "IDAT", 4) == 0) {
            out->idat.insert(out->idat.end(), body, body + len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + len;  // len + type + crc (crc unchecked: we wrote these files)
    }
    return saw_ihdr && !out->idat.empty();
}

bool inflate_idat(const std::vector<uint8_t>& idat, std::vector<uint8_t>* raw) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return false;
    zs.next_in = const_cast<Bytef*>(idat.data());
    zs.avail_in = uInt(idat.size());
    zs.next_out = raw->data();
    zs.avail_out = uInt(raw->size());
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    return rc == Z_STREAM_END && zs.total_out == raw->size();
}

inline uint8_t paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return uint8_t(a);
    if (pb <= pc) return uint8_t(b);
    return uint8_t(c);
}

// PIL's exact RGB→L conversion (libImaging/Convert.c L24 + >>16 rounding).
inline uint8_t rgb_to_l(uint8_t r, uint8_t g, uint8_t b) {
    return uint8_t((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

bool decode_gray(const char* path, uint8_t* out, int expect_h, int expect_w) {
    std::vector<uint8_t> file;
    if (!read_file(path, &file)) return false;
    Chunks c;
    if (!parse_chunks(file, &c)) return false;
    if (c.bit_depth != 8 || c.interlace != 0) return false;
    if (int(c.height) != expect_h || int(c.width) != expect_w) return false;

    int channels;
    switch (c.color_type) {
        case 0: channels = 1; break;  // gray
        case 2: channels = 3; break;  // RGB
        case 3: channels = 1; break;  // palette index
        case 4: channels = 2; break;  // gray + alpha
        case 6: channels = 4; break;  // RGBA
        default: return false;
    }
    if (c.color_type == 3 && c.palette.size() < 3) return false;

    const size_t stride = size_t(c.width) * channels;
    std::vector<uint8_t> raw(c.height * (stride + 1));
    if (!inflate_idat(c.idat, &raw)) return false;

    std::vector<uint8_t> prev(stride, 0);
    std::vector<uint8_t> cur(stride);
    const int bpp = channels;  // bytes per pixel (8-bit)
    for (uint32_t y = 0; y < c.height; ++y) {
        const uint8_t* src = &raw[y * (stride + 1)];
        uint8_t filter = src[0];
        ++src;
        switch (filter) {
            case 0:
                memcpy(cur.data(), src, stride);
                break;
            case 1:
                for (size_t x = 0; x < stride; ++x)
                    cur[x] = uint8_t(src[x] + (x >= size_t(bpp) ? cur[x - bpp] : 0));
                break;
            case 2:
                for (size_t x = 0; x < stride; ++x) cur[x] = uint8_t(src[x] + prev[x]);
                break;
            case 3:
                for (size_t x = 0; x < stride; ++x) {
                    int left = x >= size_t(bpp) ? cur[x - bpp] : 0;
                    cur[x] = uint8_t(src[x] + ((left + prev[x]) >> 1));
                }
                break;
            case 4:
                for (size_t x = 0; x < stride; ++x) {
                    int left = x >= size_t(bpp) ? cur[x - bpp] : 0;
                    int up_left = x >= size_t(bpp) ? prev[x - bpp] : 0;
                    cur[x] = uint8_t(src[x] + paeth(left, prev[x], up_left));
                }
                break;
            default:
                return false;
        }
        uint8_t* dst = out + size_t(y) * c.width;
        switch (c.color_type) {
            case 0:
                memcpy(dst, cur.data(), c.width);
                break;
            case 2:
                for (uint32_t x = 0; x < c.width; ++x)
                    dst[x] = rgb_to_l(cur[3 * x], cur[3 * x + 1], cur[3 * x + 2]);
                break;
            case 3:
                for (uint32_t x = 0; x < c.width; ++x) {
                    size_t pi = size_t(cur[x]) * 3;
                    if (pi + 2 >= c.palette.size()) pi = 0;
                    dst[x] = rgb_to_l(c.palette[pi], c.palette[pi + 1], c.palette[pi + 2]);
                }
                break;
            case 4:
                for (uint32_t x = 0; x < c.width; ++x) dst[x] = cur[2 * x];
                break;
            case 6:
                for (uint32_t x = 0; x < c.width; ++x)
                    dst[x] = rgb_to_l(cur[4 * x], cur[4 * x + 1], cur[4 * x + 2]);
                break;
        }
        std::swap(prev, cur);
    }
    return true;
}

}  // namespace

extern "C" int png_batch_load_gray(const char** paths, int n, unsigned char* out,
                                   long out_stride, int expect_h, int expect_w,
                                   unsigned char* ok, int num_threads) {
    if (n <= 0) return 0;
    std::atomic<int> next(0), good(0);
    int workers = num_threads > 0 ? (num_threads < n ? num_threads : n) : 1;
    auto run = [&]() {
        for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
            uint8_t* dst = out + size_t(i) * out_stride;
            bool success = decode_gray(paths[i], dst, expect_h, expect_w);
            if (!success) memset(dst, 0, size_t(expect_h) * expect_w);
            ok[i] = success ? 1 : 0;
            if (success) good.fetch_add(1);
        }
    };
    if (workers == 1) {
        run();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(workers);
        for (int w = 0; w < workers; ++w) pool.emplace_back(run);
        for (auto& t : pool) t.join();
    }
    return good.load();
}

// ---------------------------------------------------------------------------
// Batch RGB PNG ENCODER — the other half of the bulk-export path.
//
// The reference's gen_specs/birdnet_all_spec bulk export writes one viridis
// PNG per 6-s window via plt.imsave (reference helpers.py:103): for the
// paper's 640 h corpus that is ~384k files, and PIL's single-threaded
// zlib-level-6 encode (~10-25 ms/image) — not the mel math — is the wall.
// Here scanlines are Sub-filtered (cheap, effective on smooth colormaps)
// and deflated at a configurable level in a thread pool, one file per row
// of the caller's [n, H, W, 3] uint8 buffer.
//
// C ABI (ctypes):
//   int png_batch_save_rgb(const char** paths, int n,
//                          const unsigned char* rgb, int h, int w,
//                          unsigned char* ok, int num_threads, int level);

namespace {

void put_be32(std::vector<uint8_t>* out, uint32_t v) {
    out->push_back(uint8_t(v >> 24));
    out->push_back(uint8_t(v >> 16));
    out->push_back(uint8_t(v >> 8));
    out->push_back(uint8_t(v));
}

void put_chunk(std::vector<uint8_t>* out, const char type[4],
               const uint8_t* data, size_t len) {
    put_be32(out, uint32_t(len));
    size_t type_at = out->size();
    out->insert(out->end(), type, type + 4);
    out->insert(out->end(), data, data + len);
    uint32_t crc = uint32_t(crc32(0L, out->data() + type_at, uInt(4 + len)));
    put_be32(out, crc);
}

bool encode_rgb_mem(const uint8_t* rgb, int h, int w, int level,
                    std::vector<uint8_t>* png) {
    const size_t row = size_t(w) * 3;
    // Sub-filtered scanlines: filter byte 1 + per-byte left delta
    std::vector<uint8_t> raw((row + 1) * size_t(h));
    for (int y = 0; y < h; ++y) {
        uint8_t* dst = raw.data() + size_t(y) * (row + 1);
        const uint8_t* src = rgb + size_t(y) * row;
        dst[0] = 1;  // Sub
        dst[1] = src[0]; dst[2] = src[1]; dst[3] = src[2];
        for (size_t x = 3; x < row; ++x) dst[1 + x] = uint8_t(src[x] - src[x - 3]);
    }

    uLongf bound = compressBound(uLong(raw.size()));
    std::vector<uint8_t> deflated(bound);
    if (compress2(deflated.data(), &bound, raw.data(), uLong(raw.size()),
                  level) != Z_OK)
        return false;
    deflated.resize(bound);

    png->clear();
    png->reserve(deflated.size() + 128);
    static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    png->insert(png->end(), sig, sig + 8);
    uint8_t ihdr[13];
    ihdr[0] = uint8_t(uint32_t(w) >> 24); ihdr[1] = uint8_t(uint32_t(w) >> 16);
    ihdr[2] = uint8_t(uint32_t(w) >> 8);  ihdr[3] = uint8_t(w);
    ihdr[4] = uint8_t(uint32_t(h) >> 24); ihdr[5] = uint8_t(uint32_t(h) >> 16);
    ihdr[6] = uint8_t(uint32_t(h) >> 8);  ihdr[7] = uint8_t(h);
    ihdr[8] = 8;   // bit depth
    ihdr[9] = 2;   // color type RGB
    ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
    put_chunk(png, "IHDR", ihdr, sizeof(ihdr));
    put_chunk(png, "IDAT", deflated.data(), deflated.size());
    put_chunk(png, "IEND", nullptr, 0);
    return true;
}

bool encode_rgb(const char* path, const uint8_t* rgb, int h, int w, int level) {
    std::vector<uint8_t> png;
    if (!encode_rgb_mem(rgb, h, w, level, &png)) return false;
    FILE* f = fopen(path, "wb");
    if (!f) return false;
    bool okw = fwrite(png.data(), 1, png.size(), f) == png.size();
    fclose(f);
    return okw;
}

}  // namespace

// In-memory variant for the serving path: encode [n, H, W, 3] uint8 images
// into a caller-owned [n, capacity] byte buffer. out_lens[i] = encoded byte
// count, or -1 on failure / overflow (caller falls back to PIL for that row).
// Capacity must be >= compressBound(h*(3w+1)) + 128; the Python wrapper
// computes this. Avoids one file round-trip per HTTP response image.
extern "C" int png_batch_encode_rgb(const unsigned char* rgb, int n, int h, int w,
                                    unsigned char* out, long capacity,
                                    long* out_lens, int num_threads, int level) {
    if (n <= 0) return 0;
    if (level < 0 || level > 9) level = 3;
    std::atomic<int> next(0), good(0);
    int workers = num_threads > 0 ? (num_threads < n ? num_threads : n) : 1;
    const size_t img = size_t(h) * w * 3;
    auto run = [&]() {
        std::vector<uint8_t> png;
        for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
            bool success = encode_rgb_mem(rgb + size_t(i) * img, h, w, level, &png) &&
                           long(png.size()) <= capacity;
            if (success) {
                memcpy(out + size_t(i) * capacity, png.data(), png.size());
                out_lens[i] = long(png.size());
                good.fetch_add(1);
            } else {
                out_lens[i] = -1;
            }
        }
    };
    if (workers == 1) {
        run();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(workers);
        for (int t = 0; t < workers; ++t) pool.emplace_back(run);
        for (auto& t : pool) t.join();
    }
    return good.load();
}

extern "C" int png_batch_save_rgb(const char** paths, int n, const unsigned char* rgb,
                                  int h, int w, unsigned char* ok, int num_threads,
                                  int level) {
    if (n <= 0) return 0;
    if (level < 0 || level > 9) level = 3;
    std::atomic<int> next(0), good(0);
    int workers = num_threads > 0 ? (num_threads < n ? num_threads : n) : 1;
    const size_t img = size_t(h) * w * 3;
    auto run = [&]() {
        for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
            bool success = encode_rgb(paths[i], rgb + size_t(i) * img, h, w, level);
            ok[i] = success ? 1 : 0;
            if (success) good.fetch_add(1);
        }
    };
    if (workers == 1) {
        run();
    } else {
        std::vector<std::thread> pool;
        pool.reserve(workers);
        for (int t = 0; t < workers; ++t) pool.emplace_back(run);
        for (auto& t : pool) t.join();
    }
    return good.load();
}
