// Native batch WAV decoder/slicer for the host data pipeline.
//
// The reference's preprocessing walks wav files one at a time through
// librosa's Python loader (reference src/helpers.py:83, src/gen_specs.py);
// here the host-side decode is a C++ thread pool that fills a caller-owned
// float32 [batch, clip_samples] buffer directly (mono mixdown, PCM16/24/32
// and float32 WAVs, begin/end-time slice semantics), which Python hands to
// jax.device_put — no per-sample Python in the hot path.
//
// C ABI (ctypes):
//   int wav_batch_load(const char** paths, int n,
//                      const double* begin_times, const double* end_times,
//                      double clip_seconds, float* out, long out_stride,
//                      int* sample_rates, int num_threads);
// Returns the number of successfully decoded clips; failed rows are zeroed
// with sample_rates[i] = 0.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavData {
    std::vector<float> samples;  // mono
    int sample_rate = 0;
};

bool read_u32(FILE* f, uint32_t* v) { return fread(v, 4, 1, f) == 1; }
bool read_u16(FILE* f, uint16_t* v) { return fread(v, 2, 1, f) == 1; }

bool load_wav_file(const char* path, WavData* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    char riff[4], wave[4];
    uint32_t riff_size;
    if (fread(riff, 1, 4, f) != 4 || !read_u32(f, &riff_size) || fread(wave, 1, 4, f) != 4 ||
        memcmp(riff, "RIFF", 4) != 0 || memcmp(wave, "WAVE", 4) != 0) {
        fclose(f);
        return false;
    }
    uint16_t format = 0, channels = 0, bits = 0;
    uint32_t sample_rate = 0;
    bool got_fmt = false;
    while (true) {
        char id[4];
        uint32_t size;
        if (fread(id, 1, 4, f) != 4 || !read_u32(f, &size)) break;
        if (memcmp(id, "fmt ", 4) == 0) {
            uint32_t byte_rate;
            uint16_t block_align;
            if (!read_u16(f, &format) || !read_u16(f, &channels) || !read_u32(f, &sample_rate) ||
                !read_u32(f, &byte_rate) || !read_u16(f, &block_align) || !read_u16(f, &bits)) break;
            if (size > 16) fseek(f, size - 16, SEEK_CUR);
            got_fmt = true;
        } else if (memcmp(id, "data", 4) == 0) {
            if (!got_fmt || channels == 0) break;
            std::vector<uint8_t> raw(size);
            if (fread(raw.data(), 1, size, f) != size) break;
            const size_t bytes_per = bits / 8;
            const size_t frames = size / (bytes_per * channels);
            out->samples.resize(frames);
            out->sample_rate = static_cast<int>(sample_rate);
            const float inv_ch = 1.0f / channels;
            for (size_t i = 0; i < frames; ++i) {
                float acc = 0.0f;
                for (int c = 0; c < channels; ++c) {
                    const uint8_t* p = raw.data() + (i * channels + c) * bytes_per;
                    float v = 0.0f;
                    if (format == 3 && bits == 32) {  // IEEE float
                        float fv;
                        memcpy(&fv, p, 4);
                        v = fv;
                    } else if (bits == 16) {
                        int16_t s;
                        memcpy(&s, p, 2);
                        v = s / 32768.0f;
                    } else if (bits == 24) {
                        int32_t s = (p[0] << 8) | (p[1] << 16) | (p[2] << 24);
                        v = (s >> 8) / 8388608.0f;
                    } else if (bits == 32) {
                        int32_t s;
                        memcpy(&s, p, 4);
                        v = s / 2147483648.0f;
                    }
                    acc += v;
                }
                out->samples[i] = acc * inv_ch;
            }
            fclose(f);
            return true;
        } else {
            fseek(f, size + (size & 1), SEEK_CUR);
        }
    }
    fclose(f);
    return false;
}

// Reference slice semantics (helpers.py:84-87): clip_seconds window from
// int(begin_time); if short, the window ending at int(end_time); zero-pad
// degenerate tails.
void slice_clip(const WavData& wav, double begin_time, double end_time, double clip_seconds,
                float* out, long n_out) {
    const long sr = wav.sample_rate;
    const long n = static_cast<long>(clip_seconds * sr);
    const long total = static_cast<long>(wav.samples.size());
    long start = static_cast<long>(static_cast<long long>(begin_time) * sr);
    if (start + n > total || start < 0) {
        long end = static_cast<long>(static_cast<long long>(end_time) * sr);
        if (end > total) end = total;
        start = end - n;
        if (start < 0) start = 0;
    }
    long avail = total - start;
    if (avail > n) avail = n;
    if (avail < 0) avail = 0;
    long copy = avail < n_out ? avail : n_out;
    memcpy(out, wav.samples.data() + start, copy * sizeof(float));
    if (copy < n_out) memset(out + copy, 0, (n_out - copy) * sizeof(float));
}

}  // namespace

extern "C" int wav_batch_load(const char** paths, int n, const double* begin_times,
                              const double* end_times, double clip_seconds, float* out,
                              long out_stride, int* sample_rates, int num_threads) {
    std::atomic<int> next(0), ok(0);
    if (num_threads < 1) num_threads = 1;
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            WavData wav;
            if (load_wav_file(paths[i], &wav) && wav.sample_rate > 0) {
                slice_clip(wav, begin_times[i], end_times[i], clip_seconds, out + i * out_stride,
                           out_stride);
                sample_rates[i] = wav.sample_rate;
                ok.fetch_add(1);
            } else {
                memset(out + i * out_stride, 0, out_stride * sizeof(float));
                sample_rates[i] = 0;
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return ok.load();
}
