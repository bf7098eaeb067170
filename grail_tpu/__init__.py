"""grail_tpu — a TPU-native formant speech-synthesis framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of the grail-rs
formant synthesizer (text -> phonemes -> intonation -> voice parameters ->
sequenced/jittered per-sample scores -> formant DSP), redesigned for TPU:
batched block synthesis, associative-scan IIR state, fused Pallas kernels,
and pjit/shard_map data-parallel scaling over device meshes.
"""

__version__ = "0.1.0"

from .api import (synthesize, synthesize_batch, synthesize_score,
                  synthesize_scores, text_to_score)
from .core.constants import DEFAULT_SAMPLE_RATE, NUM_FORMANTS
from .synth.elem import SynthesisElem
from .text.phonemes import Phoneme
from .text.language import Language, TranscriptionRule
from .text.intonate import PhonemeElem, intonate
from .text.transcribe import transcribe, transcribe_chars
from .voices import Voice, VoiceSpec, PhonemeSpec, get_voice, register_voice, voice_names
from .languages import get_language, register_language, language_names

__all__ = [
    "synthesize", "synthesize_batch", "synthesize_score",
    "synthesize_scores", "text_to_score",
    "DEFAULT_SAMPLE_RATE", "NUM_FORMANTS",
    "SynthesisElem", "Phoneme", "Language", "TranscriptionRule",
    "PhonemeElem", "intonate", "transcribe", "transcribe_chars",
    "Voice", "VoiceSpec", "PhonemeSpec", "get_voice", "register_voice", "voice_names",
    "get_language", "register_language", "language_names",
]
