from .reference import (
    NpElem, NpSequenceElem, NpVoice,
    oracle_dsp_chain, oracle_intonate, oracle_jitter, oracle_pipeline,
    oracle_select, oracle_sequence, oracle_synthesize,
)

__all__ = [
    "NpElem", "NpSequenceElem", "NpVoice",
    "oracle_dsp_chain", "oracle_intonate", "oracle_jitter",
    "oracle_pipeline", "oracle_select", "oracle_sequence",
    "oracle_synthesize",
]
