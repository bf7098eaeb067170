// grail_tpu native host runtime: transcriber + WAV encoder.
//
// The reference implements its whole host pipeline natively (no_std Rust);
// in this framework the device path is JAX/Pallas and the host-side
// variable-length text frontend + PCM encoding are the native tier. The
// transcriber reproduces the exact automaton of the reference
// (/root/reference/src/lib.rs:1098-1207): incremental binary-search range
// narrowing over a sorted ruleset (Rust partition_point probe order),
// greedy longest-prefix match, silence on dead ends, no backtracking.
//
// C ABI only (consumed via ctypes). Build: `make -C native`.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Ruleset {
    std::vector<std::string> strings;              // sorted
    std::vector<std::vector<int32_t>> phonemes;
};

// Rust <[T]>::partition_point probe order on [lo, hi).
template <typename Pred>
int64_t partition_point(int64_t lo, int64_t hi, Pred pred) {
    int64_t left = lo, right = hi;
    while (left < right) {
        int64_t mid = (left + right) / 2;
        if (pred(mid)) left = mid + 1; else right = mid;
    }
    return left;
}

inline int nth_char(const std::string& s, size_t i) {
    return i < s.size() ? static_cast<unsigned char>(s[i]) : -1;
}

}  // namespace

extern "C" {

// Opaque ruleset handle ------------------------------------------------------

// Returns nullptr if any rule string is empty: an empty rule matches at
// every position without consuming input, so the transcriber loop would
// spin forever (the Python Language class validates this too; the guard
// covers direct C ABI users).
void* gn_ruleset_new(const char* const* strings, const int32_t* phonemes_flat,
                     const int32_t* phoneme_offsets, int32_t n_rules) {
    for (int32_t i = 0; i < n_rules; ++i) {
        if (strings[i] == nullptr || strings[i][0] == '\0') return nullptr;
    }
    auto* rs = new Ruleset();
    rs->strings.reserve(n_rules);
    rs->phonemes.reserve(n_rules);
    for (int32_t i = 0; i < n_rules; ++i) {
        rs->strings.emplace_back(strings[i]);
        rs->phonemes.emplace_back(phonemes_flat + phoneme_offsets[i],
                                  phonemes_flat + phoneme_offsets[i + 1]);
    }
    return rs;
}

void gn_ruleset_free(void* handle) { delete static_cast<Ruleset*>(handle); }

// Transcription --------------------------------------------------------------
//
// Returns the number of phonemes written (<= out_cap); always consumes the
// whole input (whole-string transcription, end-of-input flushes the final
// match). ASCII-oriented like the reference's to_ascii_lowercase path
// (non-ASCII bytes are treated as opaque symbols).

int32_t gn_transcribe(void* handle, const char* text, int32_t text_len,
                      int32_t case_sensitive, int32_t* out, int32_t out_cap) {
    const Ruleset& rs = *static_cast<const Ruleset*>(handle);
    const int64_t n_rules = static_cast<int64_t>(rs.strings.size());
    int32_t n_out = 0;
    int64_t pos = 0;

    auto peek = [&](int64_t p) -> int {
        if (p >= text_len) return -1;
        unsigned char c = text[p];
        if (!case_sensitive && c < 0x80 && c >= 'A' && c <= 'Z') c += 32;
        return c;
    };
    auto emit = [&](const std::vector<int32_t>& ph) {
        for (int32_t v : ph) { if (n_out < out_cap) out[n_out++] = v; }
    };
    static const std::vector<int32_t> kSilence = {0};

    if (n_rules == 0) {
        while (pos < text_len) { emit(kSilence); ++pos; }
        return n_out;
    }

    while (true) {
        int64_t search_min = 0, search_max = n_rules;
        size_t index = 0;
        const std::vector<int32_t>* buffer = nullptr;
        while (buffer == nullptr) {
            int c = peek(pos);
            if (c < 0) return n_out;  // end of input at loop top -> done

            int64_t new_min = partition_point(search_min, search_max, [&](int64_t m) {
                int ch = nth_char(rs.strings[m], index);
                return ch < 0 ? true : ch < c;
            });
            int64_t new_max = partition_point(search_min, search_max, [&](int64_t m) {
                int ch = nth_char(rs.strings[m], index);
                return ch < 0 ? false : ch <= c;
            });

            if (new_min >= new_max && rs.strings[search_min].size() == index) {
                buffer = &rs.phonemes[search_min];           // exact-prefix rule
            } else if (new_min >= new_max) {
                buffer = &kSilence;                           // dead end
                ++pos;                                        // consume garbage
                // the automaton walks BYTES; the reference walks chars. An
                // unmatched multi-byte UTF-8 char must emit ONE silence,
                // not one per byte: skip its continuation bytes. (When a
                // partial rule match already consumed part of the char,
                // pos sits mid-sequence and the skip is a no-op beyond the
                // current char — matching the Python/Rust char automaton.)
                while (pos < text_len &&
                       (static_cast<unsigned char>(text[pos]) & 0xC0) == 0x80)
                    ++pos;
            } else {
                search_min = new_min;
                search_max = new_max;
                ++index;
                ++pos;
                if (peek(pos) < 0 && rs.strings[search_min].size() == index) {
                    buffer = &rs.phonemes[search_min];        // final exact match
                } else if (peek(pos) < 0) {
                    buffer = &kSilence;                       // dangling prefix
                }
            }
        }
        emit(*buffer);
    }
}

// Sequencer drift simulation --------------------------------------------------
//
// Exact element end-samples of the reference's f32 countdown: the reference
// Sequencer decrements `time` by 1/sr in float32 EVERY sample
// (src/lib.rs:859-887), so element boundaries drift several samples/second
// off the drift-free floor(cumsum*sr). The Python frontend retargets scores
// to these boundaries (synth/score.py:_reference_boundary_samples); this is
// the same per-sample loop in native code — sequential IEEE-754 float32 ops
// (SSE2 scalar; no FMA pattern exists in (t-dt)+L so -O2 cannot contract),
// bit-identical to NumPy's f32 subtract.accumulate, ~50x faster on the
// serving frontend's feed path. Entry step per element: t = (t - dt) + L
// (same op order as src/lib.rs:864-887); residual t < 0 carries into the
// next element. counts_cum[i] = cumulative end sample of element i;
// residuals[i] = countdown residual after element i (the t0 of a stream
// continuing there).

// Returns -1 on success, or the index of an element whose countdown
// STALLS: once t exceeds ~256 s (44.1 kHz), f32 t - dt == t, so the
// crossing is unreachable — the reference iterator itself would spin on
// that element forever. Callers raise instead of hanging the host.
// (Renamed from gn_drift_boundaries when the stall guard + return code
// were added; the loader degrades to the NumPy twin on a stale .so.)
int64_t gn_drift_boundaries2(const float* lengths, int64_t e, float sr,
                             float t0, int64_t* counts_cum,
                             float* residuals) {
    const float dt = 1.0f / sr;
    float t = t0;
    int64_t cum = 0;
    for (int64_t i = 0; i < e; ++i) {
        if (!(lengths[i] == lengths[i])) return i;   // NaN length: the
        // NumPy twin raises on it; silently carrying a NaN residual would
        // collapse every later element to a 1-sample boundary
        t = (t - dt) + lengths[i];
        int64_t count = 1;                   // the entry sample
        // negated comparison so a NaN length terminates instead of spinning
        while (!(t - dt < 0.0f) && t == t) {
            const float t2 = t - dt;
            if (t2 == t) return i;           // no progress: stalled element
            t = t2;
            ++count;
        }
        cum += count;
        counts_cum[i] = cum;
        residuals[i] = t;
    }
    return -1;
}

// WAV encoding ---------------------------------------------------------------
//
// 16-bit mono PCM with the reference's `(x * i16::MAX) as i16` truncation
// semantics (examples/cli.rs:28-67). out must hold 44 + 2*n bytes.

int64_t gn_encode_wav(const float* data, int64_t n, int32_t sample_rate,
                      uint8_t* out) {
    // RIFF sizes are uint32: past ~2^31 samples the header would silently
    // wrap while the sample loop wrote the full 2n bytes. Error instead
    // (the pure-Python encoder's struct.pack fails loudly at the same
    // bound); callers raise on a negative return.
    if (n < 0 || static_cast<uint64_t>(n) * 2u + 36u > 0xFFFFFFFFull) {
        return -1;
    }
    const uint32_t payload = static_cast<uint32_t>(n * 2);
    auto put_u32 = [&](int64_t off, uint32_t v) {
        out[off] = v & 0xFF; out[off + 1] = (v >> 8) & 0xFF;
        out[off + 2] = (v >> 16) & 0xFF; out[off + 3] = (v >> 24) & 0xFF;
    };
    auto put_u16 = [&](int64_t off, uint16_t v) {
        out[off] = v & 0xFF; out[off + 1] = (v >> 8) & 0xFF;
    };
    std::memcpy(out, "RIFF", 4);
    put_u32(4, 36 + payload);
    std::memcpy(out + 8, "WAVE", 4);
    std::memcpy(out + 12, "fmt ", 4);
    put_u32(16, 16);
    put_u16(20, 1);
    put_u16(22, 1);
    put_u32(24, static_cast<uint32_t>(sample_rate));
    put_u32(28, static_cast<uint32_t>(sample_rate) * 2);
    put_u16(32, 2);
    put_u16(34, 16);
    std::memcpy(out + 36, "data", 4);
    put_u32(40, payload);
    for (int64_t i = 0; i < n; ++i) {
        float v = data[i] * 32767.0f;
        // Rust `as i16`: truncate toward zero, saturate, NaN -> 0
        // (the C float->int cast is UB for NaN; Rust defines it as 0)
        if (v != v) v = 0.0f;
        if (v > 32767.0f) v = 32767.0f;
        if (v < -32768.0f) v = -32768.0f;
        int16_t s = static_cast<int16_t>(v);
        out[44 + 2 * i] = static_cast<uint16_t>(s) & 0xFF;
        out[44 + 2 * i + 1] = (static_cast<uint16_t>(s) >> 8) & 0xFF;
    }
    return 44 + payload;
}

}  // extern "C"
