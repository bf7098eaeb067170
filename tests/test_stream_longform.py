"""Long-form streaming parity (VERDICT r3 next #7).

A >= 60 s session served block-by-block through StreamSession.read — with
a tiny jitter horizon so the lattice window slides dozens of times and the
rolling score rebases repeatedly — must match the one-shot batch path.
The window/rebase machinery's failure modes (clamped slides, drift-residual
mistakes, lattice re-draw misalignment) only appear at depth; the short
equivalence tests never reach them.
"""

import numpy as np

from grail_tpu.api import synthesize
from grail_tpu.runtime.stream import StreamSession
from grail_tpu.utils import sample_error_db

# ~130 phonemes at the stub intonator's 0.5 s each -> ~65 s of audio
TEXT = ("the quick brown fox jumps over the lazy dog while seventeen "
        "machines hum along in the hall and the formants drift on")


def test_stream_long_form_matches_batch():
    # the stream core's semantics: xla block core + the exact f32 reference
    # carrier (streams carry it in SynthState.phase since round 5). The
    # batch twin pins the same device recurrence over the same frequency
    # chain (exact_carrier='kernel' -> carrier_scan), so the comparison
    # isolates the window-slide/rebase machinery at -90 dB depth.
    batch = synthesize(TEXT, voice="plain", language="english",
                       backend="xla", exact_carrier="kernel")
    assert len(batch) >= 60 * 44100

    s = StreamSession(voice="plain", language="english", block=4096,
                      jitter_horizon_s=4.0)
    s.feed(TEXT)
    s.flush()
    stream = s.read(len(batch))

    # the machinery under test actually engaged, many times over
    slides = s._lat_base / (4.0 * 44100 * float(s.voice.jitter_frequency))
    assert s._lat_base > 0 and slides > 10, s._lat_base
    assert len(s._elements) < 40          # rolling score kept rebased
    assert s._jitter_pos >= len(batch)    # absolute clock never rebased

    assert np.isfinite(stream).all()
    db = sample_error_db(stream, batch)
    assert db < -90, db
