// Native audio runtime: PCM conversion + WAV framing.
//
// The reference has no native code (SURVEY §2: 100% Python; its heavy math
// lives in torch kernels). In this framework the TPU compute path is
// JAX/XLA/Pallas; this library covers the host-side serving hot path —
// float32 -> int16 PCM with peak normalization and WAV container framing —
// called from Python via ctypes (audio/native.py), with a numpy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC pcm.cpp -o libttspcm.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstddef>

extern "C" {

// float32 [-1,1]-ish -> int16 PCM. If the peak exceeds 1.0 the signal is
// normalized by the peak (same policy as audio/wav.py::encode_wav).
// Returns the peak value observed.
float pcm_f32_to_i16(const float* in, int16_t* out, size_t n) {
    float peak = 0.0f;
    for (size_t i = 0; i < n; ++i) {
        float a = std::fabs(in[i]);
        if (a > peak) peak = a;
    }
    const float scale = (peak > 1.0f) ? (32767.0f / peak) : 32767.0f;
    for (size_t i = 0; i < n; ++i) {
        float v = in[i] * scale;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        out[i] = (int16_t)std::lrintf(v);
    }
    return peak;
}

// int16 -> float32 (decode path).
void pcm_i16_to_f32(const int16_t* in, float* out, size_t n) {
    const float inv = 1.0f / 32767.0f;
    for (size_t i = 0; i < n; ++i) out[i] = in[i] * inv;
}

// Write a 44-byte PCM WAV header for mono 16-bit audio into `dst`.
void wav_header(uint8_t* dst, uint32_t num_samples, uint32_t sample_rate) {
    const uint32_t data_bytes = num_samples * 2;
    const uint32_t riff_size = 36 + data_bytes;
    const uint16_t channels = 1, bits = 16;
    const uint32_t byte_rate = sample_rate * channels * bits / 8;
    const uint16_t block_align = channels * bits / 8;
    std::memcpy(dst, "RIFF", 4);
    std::memcpy(dst + 4, &riff_size, 4);
    std::memcpy(dst + 8, "WAVEfmt ", 8);
    const uint32_t fmt_size = 16;
    const uint16_t pcm_tag = 1;
    std::memcpy(dst + 16, &fmt_size, 4);
    std::memcpy(dst + 20, &pcm_tag, 2);
    std::memcpy(dst + 22, &channels, 2);
    std::memcpy(dst + 24, &sample_rate, 4);
    std::memcpy(dst + 28, &byte_rate, 4);
    std::memcpy(dst + 32, &block_align, 2);
    std::memcpy(dst + 34, &bits, 2);
    std::memcpy(dst + 36, "data", 4);
    std::memcpy(dst + 40, &data_bytes, 4);
}

// Concatenate int16 clips (lengths[i] samples each) with optional silence
// gaps (gap_samples zeros between clips) into `out`. Returns total samples.
size_t pcm_concat_i16(const int16_t* const* clips, const size_t* lengths,
                      size_t num_clips, size_t gap_samples, int16_t* out) {
    size_t pos = 0;
    for (size_t c = 0; c < num_clips; ++c) {
        std::memcpy(out + pos, clips[c], lengths[c] * 2);
        pos += lengths[c];
        if (c + 1 < num_clips && gap_samples) {
            std::memset(out + pos, 0, gap_samples * 2);
            pos += gap_samples;
        }
    }
    return pos;
}

}  // extern "C"
