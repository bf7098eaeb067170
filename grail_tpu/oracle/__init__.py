from .native import (
    gold_dsp_chain, native_oracle_available, native_oracle_dsp_chain,
)
from .reference import (
    NpElem, NpSequenceElem, NpVoice,
    oracle_dsp_chain, oracle_intonate, oracle_jitter, oracle_pipeline,
    oracle_select, oracle_sequence, oracle_synthesize,
)

__all__ = [
    "NpElem", "NpSequenceElem", "NpVoice",
    "gold_dsp_chain", "native_oracle_available", "native_oracle_dsp_chain",
    "oracle_dsp_chain", "oracle_intonate", "oracle_jitter",
    "oracle_pipeline", "oracle_select", "oracle_sequence",
    "oracle_synthesize",
]
