// Native twin of the sequential float32 oracle (grail_tpu/oracle/reference.py).
//
// The Python oracle is a per-sample pure-Python port of the reference's
// iterator pipeline (/root/reference/src/lib.rs: Sequencer :813-953, Jitter
// :723-805, Synthesize :467-600) — the behavioral golden every fast path is
// gated against. It costs ~8 min per 60 s of audio, which bounds how wide
// the fidelity corpus can go. This file is the SAME state machines written
// independently in C++ with strict per-op float32 IEEE-754 rounding
// (-ffp-contract=off in the Makefile; every expression mirrors the Python
// oracle's parse tree), bit-identical to the NumPy oracle and ~3 orders of
// magnitude faster. Two independently-written oracles agreeing bit-for-bit
// is also the strongest ground-truth evidence available in an environment
// with no rustc (tests/test_native_oracle.py pins the equality).
//
// C ABI only (consumed via ctypes from grail_tpu/runtime/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kNF = 8;  // NUM_FORMANTS

// ---- Lehmer RNG (reference random_f32, src/lib.rs:36-55) -------------------

inline float state_to_f32(uint32_t s) {
    uint32_t bits = (s >> 9) | 0x3F800000u;
    float f;
    std::memcpy(&f, &bits, 4);
    return (f - 1.5f) * 2.0f;
}

struct Rng {
    uint32_t state;
    float next() {
        state = state * 16807u + 1u;
        return state_to_f32(state);
    }
};

// Rust f32::min = IEEE minNum: a NaN first operand yields the other one.
// The zero-blend corner relies on it: (0.0/0.0).min(1.0) == 1.0 holds the
// current element (src/lib.rs:899). fminf has exactly these semantics.
inline float alpha_of(float time, float blend) {
    return fminf(time / blend, 1.0f);
}

// ---- value noise (reference ValueNoise / ArrayValueNoise,
//      src/lib.rs:218-307). NOTE each generator snapshots the shared RNG at
//      construction and then draws from ITS OWN copy — the generators'
//      future draws overlap the same Lehmer stream (the reference's layout).

struct ValueNoise {
    float current, next_v, phase;
    Rng rng;
    explicit ValueNoise(Rng& shared) {
        current = shared.next();
        next_v = shared.next();
        phase = 0.0f;
        rng = shared;  // copy of the state after the two init draws
    }
    float next(float inc) {
        phase = phase + inc;
        if (phase > 1.0f) {
            phase = phase - 1.0f;
            current = next_v;
            next_v = rng.next();
        }
        return current * (1.0f - phase) + next_v * phase;
    }
};

struct ArrayValueNoise {
    float current[kNF], next_v[kNF];
    float phase;
    Rng rng;
    explicit ArrayValueNoise(Rng& shared) {
        for (int i = 0; i < kNF; ++i) {  // interleaved: current[i], next[i]
            current[i] = shared.next();
            next_v[i] = shared.next();
        }
        phase = 0.0f;
        rng = shared;
    }
    void next(float inc, float* out) {
        phase = phase + inc;
        if (phase > 1.0f) {
            phase = phase - 1.0f;
            for (int i = 0; i < kNF; ++i) current[i] = next_v[i];
            for (int i = 0; i < kNF; ++i) next_v[i] = rng.next();
        }
        const float ip = 1.0f - phase;
        for (int i = 0; i < kNF; ++i)
            out[i] = current[i] * ip + next_v[i] * phase;
    }
};

// ---- SynthesisElem (the 4-case sequencer blend writes into this) ------------

struct Elem {
    float frequency;
    float ff[kNF], fbw[kNF], fsm[kNF], fbr[kNF], ftb[kNF], famp[kNF];
};

// math approximations (core/approx.py np_* op order; part of the sound)
inline float exp_approx(float x) {
    const float o = 1.0f - x;
    const float o2 = o * o;
    return (o2 * o2) * o;
}

inline float tan_approx(float x) {
    // num = ((1-x)*x) * (5 - ((4*(x+0.5)) * (0.5-x)))
    // den = ((x+0.5) * (5 - ((4*(1-x)) * x))) * (0.5-x)
    const float num = ((1.0f - x) * x) *
                      (5.0f - ((4.0f * (x + 0.5f)) * (0.5f - x)));
    const float den = ((x + 0.5f) * (5.0f - ((4.0f * (1.0f - x)) * x))) *
                      (0.5f - x);
    return num / den;
}

// Full reference DSP chain downstream of selection (see the public entry
// points below). jitter_mode / carrier_mode select semantic variants for
// divergence attribution (the "lab" entry point):
//   jitter_mode  0 = reference f32 phase accumulation (src/lib.rs:236-249)
//                1 = drift-free closed form i = floor(f32(k)*inc) — the
//                    pre-r4 production schedule (synth/jitter.py history)
//   carrier_mode 0 = reference f32 phase accumulation (src/lib.rs:520-525)
//                1 = production Q32 fixed point: uint32 wraparound cumsum of
//                    (f * 2^32) casts, dequantized per sample
//                    (synth/synthesize.py:carrier_phase)
// `phase_out` (nullable): when set, the chain records the PRE-update
// carrier phase of every sample — the value polyBLEP/saw consume
// (src/lib.rs:520-525) — and SKIPS the formant-filter tail (the phase
// depends only on the frequency chain, so the track costs ~1/4 of the
// full oracle). `out` may be null in that mode.
static int64_t oracle_chain_impl(
        const int32_t* present, const float* length, const float* blend,
        const float* frequency, const float* ff, const float* fbw,
        const float* fsm, const float* fbr, const float* ftb,
        const float* famp, int64_t e, float sample_rate,
        uint32_t jitter_seed, float jf, float jdf, float jdff, float jda,
        float* out, int64_t out_cap,
        int32_t jitter_mode, int32_t carrier_mode,
        float* phase_out = nullptr) {
    for (int64_t i = 0; i < e; ++i) {
        if (!(length[i] - length[i] == 0.0f)) return -2 - i;  // inf or NaN
    }

    // jitter state (oracle_jitter: three generators built from one seed)
    Rng shared{jitter_seed};
    ValueNoise freq_noise(shared);
    ArrayValueNoise formant_freq_noise(shared);
    ArrayValueNoise formant_amp_noise(shared);
    const float half_jda = 0.5f * jda;
    int64_t jk = 0, jcell = 0;  // drift-free schedule state (jitter_mode 1)

    // synthesize state (reference Synthesize init, src/lib.rs:587-596)
    float phase = 0.0f;
    uint32_t qsum = 0;  // Q32 carrier accumulator (carrier_mode 1)
    float state_a[kNF] = {0}, state_b[kNF] = {0}, state_c[kNF] = {0};
    Rng synth_rng{0};

    // sequencer state machine (oracle_sequence, src/lib.rs:856-932):
    // cur/next are Optional<SequenceElem>; the element's PARAMS are
    // Optional too (silent specials). -1 encodes "no SequenceElem".
    int64_t pulled = 0;  // elements handed out so far
    auto pull = [&]() -> int64_t { return pulled < e ? pulled++ : -1; };
    int64_t cur = -1, nxt = -1;
    float time = 0.0f;
    const float dt = 1.0f / sample_rate;

    const float silent_q = 0.25f;
    int64_t n_out = 0;
    Elem ej;  // the jittered element of the current sample

    while (true) {
        time = time - dt;
        if (time < 0.0f) {
            if (cur >= 0 && nxt >= 0) {
                cur = nxt;
                nxt = pull();
                time = time + length[cur];
            } else if (cur < 0 && nxt < 0) {
                cur = pull();
                nxt = pull();
                if (cur >= 0) time = time + length[cur];
            } else {
                return n_out;
            }
        }

        const bool has_b = cur >= 0 && present[cur] != 0;
        const bool has_c = nxt >= 0 && present[nxt] != 0;
        const float* bf = has_b ? ff + cur * kNF : nullptr;

        if (cur < 0) return n_out;

        // ---- 4-case crossfade (NpElem.blend: out = self*(1-a) + other*a)
        if (has_b && has_c) {
            // yield c.blend(b, alpha): self = next's params, other = cur's
            const float a = alpha_of(time, blend[cur]);
            const float ia = 1.0f - a;
            const int64_t ci = nxt * kNF, bi = cur * kNF;
            ej.frequency = frequency[nxt] * ia + frequency[cur] * a;
            for (int i = 0; i < kNF; ++i) {
                ej.ff[i] = ff[ci + i] * ia + ff[bi + i] * a;
                ej.fbw[i] = fbw[ci + i] * ia + fbw[bi + i] * a;
                ej.fsm[i] = fsm[ci + i] * ia + fsm[bi + i] * a;
                ej.fbr[i] = fbr[ci + i] * ia + fbr[bi + i] * a;
                ej.ftb[i] = ftb[ci + i] * ia + ftb[bi + i] * a;
                ej.famp[i] = famp[ci + i] * ia + famp[bi + i] * a;
            }
        } else if (has_b) {
            // yield b.copy_silent().blend(b, alpha): all fields b*(1-a)+b*a
            // except amp = 0*(1-a) + amp*a
            const float a = alpha_of(time, blend[cur]);
            const float ia = 1.0f - a;
            const int64_t bi = cur * kNF;
            ej.frequency = frequency[cur] * ia + frequency[cur] * a;
            for (int i = 0; i < kNF; ++i) {
                ej.ff[i] = bf[i] * ia + bf[i] * a;
                ej.fbw[i] = fbw[bi + i] * ia + fbw[bi + i] * a;
                ej.fsm[i] = fsm[bi + i] * ia + fsm[bi + i] * a;
                ej.fbr[i] = fbr[bi + i] * ia + fbr[bi + i] * a;
                ej.ftb[i] = ftb[bi + i] * ia + ftb[bi + i] * a;
                ej.famp[i] = 0.0f * ia + famp[bi + i] * a;
            }
        } else if (has_c) {
            // yield c.blend(c.copy_silent(), alpha): fields c*(1-a)+c*a,
            // amp = amp*(1-a) + 0*a
            const float a = alpha_of(time, blend[cur]);
            const float ia = 1.0f - a;
            const int64_t ci = nxt * kNF;
            ej.frequency = frequency[nxt] * ia + frequency[nxt] * a;
            for (int i = 0; i < kNF; ++i) {
                ej.ff[i] = ff[ci + i] * ia + ff[ci + i] * a;
                ej.fbw[i] = fbw[ci + i] * ia + fbw[ci + i] * a;
                ej.fsm[i] = fsm[ci + i] * ia + fsm[ci + i] * a;
                ej.fbr[i] = fbr[ci + i] * ia + fbr[ci + i] * a;
                ej.ftb[i] = ftb[ci + i] * ia + ftb[ci + i] * a;
                ej.famp[i] = famp[ci + i] * ia + 0.0f * a;
            }
        } else {
            // NpElem.silent(): 0.25 freqs, zero breath/turb/amp
            ej.frequency = silent_q;
            for (int i = 0; i < kNF; ++i) {
                ej.ff[i] = silent_q;
                ej.fbw[i] = silent_q;
                ej.fsm[i] = silent_q;
                ej.fbr[i] = 0.0f;
                ej.ftb[i] = 0.0f;
                ej.famp[i] = 0.0f;
            }
        }

        // ---- jitter (oracle_jitter, src/lib.rs:750-798)
        {
            float fn, ffn[kNF], fan[kNF];
            if (jitter_mode == 0) {
                fn = freq_noise.next(jf);
                formant_freq_noise.next(jf, ffn);
                formant_amp_noise.next(jf, fan);
            } else {
                // drift-free schedule: cell i = floor(f32(k)*inc), shared by
                // all three generators (their f32 phases are identical);
                // f32 ops mirror synth/jitter.py:jitter_values
                ++jk;
                const float ph = static_cast<float>(jk) * jf;
                const int64_t i = static_cast<int64_t>(floorf(ph));
                const float phi = ph - static_cast<float>(i);
                while (jcell < i) {
                    freq_noise.current = freq_noise.next_v;
                    freq_noise.next_v = freq_noise.rng.next();
                    for (int j = 0; j < kNF; ++j) {
                        formant_freq_noise.current[j] = formant_freq_noise.next_v[j];
                    }
                    for (int j = 0; j < kNF; ++j) {
                        formant_freq_noise.next_v[j] = formant_freq_noise.rng.next();
                    }
                    for (int j = 0; j < kNF; ++j) {
                        formant_amp_noise.current[j] = formant_amp_noise.next_v[j];
                    }
                    for (int j = 0; j < kNF; ++j) {
                        formant_amp_noise.next_v[j] = formant_amp_noise.rng.next();
                    }
                    ++jcell;
                }
                const float ip = 1.0f - phi;
                fn = freq_noise.current * ip + freq_noise.next_v * phi;
                for (int j = 0; j < kNF; ++j) {
                    ffn[j] = formant_freq_noise.current[j] * ip +
                             formant_freq_noise.next_v[j] * phi;
                }
                for (int j = 0; j < kNF; ++j) {
                    fan[j] = formant_amp_noise.current[j] * ip +
                             formant_amp_noise.next_v[j] * phi;
                }
            }
            ej.frequency = ej.frequency + (fn * jdf);
            for (int i = 0; i < kNF; ++i)
                ej.ff[i] = ej.ff[i] + ffn[i] * jdff;
            for (int i = 0; i < kNF; ++i) {
                const float d = (fan[i] + 1.0f) * half_jda;
                ej.famp[i] = ej.famp[i] * (1.0f - d);
            }
        }

        // ---- synthesize (oracle_synthesize, src/lib.rs:497-578)
        {
            const float f = ej.frequency;
            if (carrier_mode != 0) {
                // production Q32 track: dequantize the exclusive prefix sum
                // (u32 -> f32 rounds to nearest, * 2^-32 is exact)
                phase = static_cast<float>(qsum) * (1.0f / 4294967296.0f);
            }
            if (phase_out != nullptr) {
                if (n_out >= out_cap) return -1;
                phase_out[n_out++] = phase;
                phase = phase + f;
                if (phase >= 1.0f) phase = phase - 1.0f;
                continue;
            }
            float polyblep;
            if (phase < f) {
                const float t = phase / f;
                polyblep = (2.0f * t) - (t * t) - 1.0f;
            } else if (phase > 1.0f - f) {
                const float t = (phase - 1.0f) / f;
                polyblep = (t * t) + (2.0f * t) + 1.0f;
            } else {
                polyblep = 0.0f;
            }
            const float saw = (2.0f * phase - 1.0f) - polyblep;

            if (carrier_mode == 0) {
                phase = phase + f;
                if (phase >= 1.0f) phase = phase - 1.0f;
            } else {
                // (f * 2^32) rounds in f32, cast truncates, u32 add wraps —
                // the XLA core's carrier_phase semantics
                qsum += static_cast<uint32_t>(f * 4294967296.0f);
            }

            const float noise = synth_rng.next();

            float v1[kNF];
            for (int i = 0; i < kNF; ++i) {
                const float breath = ej.fbr[i];
                const float noise_wave = saw * (1.0f - breath) + noise * breath;
                const float al = exp_approx(ej.fsm[i]);
                state_a[i] = state_a[i] + (1.0f - al) * (noise_wave - state_a[i]);
                const float turb = ej.ftb[i];
                const float turbulence_wave =
                    state_a[i] * (1.0f * (1.0f - turb) + noise * turb);
                const float v0 = turbulence_wave * ej.famp[i];

                const float g = tan_approx(ej.ff[i]);
                const float k = ej.fbw[i] / ej.ff[i];
                const float a1 = 1.0f / (1.0f + g * (g + k));
                const float a2 = g * a1;
                const float a3 = g * a2;

                const float v3 = v0 - state_c[i];
                v1[i] = a1 * state_b[i] + a2 * v3;
                const float v2 = (state_c[i] + a2 * state_b[i]) + a3 * v3;
                state_b[i] = 2.0f * v1[i] - state_b[i];
                state_c[i] = 2.0f * v2 - state_c[i];
            }
            float s = 0.0f;  // Rust iter().sum(): sequential left fold
            for (int i = 0; i < kNF; ++i) s = s + v1[i];
            if (n_out >= out_cap) return -1;
            out[n_out++] = s * 0.5f;
        }
    }
}

}  // namespace

extern "C" {

// Full reference DSP chain downstream of selection: SequenceElems ->
// sequencer -> jitter -> synthesize -> samples. Element i has sound
// parameters iff present[i] != 0 (SILENCE/STOP/undefined rows pass 0; their
// field rows are ignored). Per-formant fields are [e][8] row-major.
//
// Returns the number of samples written; -1 if out_cap was exceeded;
// -2 - i if element i has a non-finite length (the Python oracle would
// never terminate on it either — callers must reject such scores).
int64_t gn_oracle_dsp_chain(const int32_t* present, const float* length,
                            const float* blend, const float* frequency,
                            const float* ff, const float* fbw,
                            const float* fsm, const float* fbr,
                            const float* ftb, const float* famp, int64_t e,
                            float sample_rate, uint32_t jitter_seed,
                            float jf, float jdf, float jdff, float jda,
                            float* out, int64_t out_cap) {
    return oracle_chain_impl(present, length, blend, frequency, ff, fbw, fsm,
                             fbr, ftb, famp, e, sample_rate, jitter_seed, jf,
                             jdf, jdff, jda, out, out_cap, 0, 0);
}

// Divergence-attribution twin: same chain with selectable jitter/carrier
// semantics (see oracle_chain_impl). Never on a production or gold path —
// it exists to measure which f32-accumulation behaviors the device paths
// must reproduce to meet the -60 dB gate (docs/PARITY.md).
int64_t gn_oracle_dsp_chain_lab(const int32_t* present, const float* length,
                                const float* blend, const float* frequency,
                                const float* ff, const float* fbw,
                                const float* fsm, const float* fbr,
                                const float* ftb, const float* famp,
                                int64_t e, float sample_rate,
                                uint32_t jitter_seed, float jf, float jdf,
                                float jdff, float jda, float* out,
                                int64_t out_cap, int32_t jitter_mode,
                                int32_t carrier_mode) {
    return oracle_chain_impl(present, length, blend, frequency, ff, fbw, fsm,
                             fbr, ftb, famp, e, sample_rate, jitter_seed, jf,
                             jdf, jdff, jda, out, out_cap, jitter_mode,
                             carrier_mode);
}

// Reference value-noise phase schedule simulator (src/lib.rs:236-249): the
// f32 accumulation `phase += inc; if (phase > 1) phase -= 1` shared by the
// three jitter generators (identical f32 phase sequences). Produces, for T
// steps from `phase0`, the post-wrap per-sample phase phi[k] and the
// cumulative wrap count cell[k] (cells entered since this call's start,
// INCLUDING a wrap at sample k). Returns the total wrap count; final state
// for continuation is (phi[T-1], base_cell + return). The production device
// paths consume these arrays in place of the closed form floor(k*inc),
// which drifts from the reference by whole cells over ~10^6 samples.
// Reference carrier phase track: the PRE-update f32 phase of every sample
// (the value polyBLEP and the saw consume; src/lib.rs:520-525, update
// `phase += f; if (phase >= 1) phase -= 1`). Runs the full frequency chain
// (sequencer -> jitter -> phase recurrence) and skips the filter tail.
// Device paths consume this track in place of the Q32 fixed-point
// accumulator, whose rounding-free sum drifts from the reference's f32
// recurrence by ~0.1 cycles over 86 s (-60.7 dB alone; docs/PARITY.md).
// Same argument conventions and error returns as gn_oracle_dsp_chain.
int64_t gn_carrier_phase_track(const int32_t* present, const float* length,
                               const float* blend, const float* frequency,
                               const float* ff, const float* fbw,
                               const float* fsm, const float* fbr,
                               const float* ftb, const float* famp,
                               int64_t e, float sample_rate,
                               uint32_t jitter_seed, float jf, float jdf,
                               float jdff, float jda,
                               float* phase_out, int64_t cap) {
    return oracle_chain_impl(present, length, blend, frequency, ff, fbw, fsm,
                             fbr, ftb, famp, e, sample_rate, jitter_seed, jf,
                             jdf, jdff, jda, nullptr, cap, 0, 0, phase_out);
}

int64_t gn_jitter_phase_schedule(float inc, float phase0, int64_t T,
                                 float* phi, int32_t* cell) {
    float phase = phase0;
    int64_t wraps = 0;
    for (int64_t k = 0; k < T; ++k) {
        phase = phase + inc;
        if (phase > 1.0f) {
            phase = phase - 1.0f;
            ++wraps;
        }
        phi[k] = phase;
        cell[k] = static_cast<int32_t>(wraps);
    }
    return wraps;
}

}  // extern "C"
