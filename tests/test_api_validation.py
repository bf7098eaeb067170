"""Input-validation regression tests for api.py (round-3 review)."""

import numpy as np
import pytest

from grail_tpu.api import synthesize_batch, synthesize_score, synthesize_scores, text_to_score
from grail_tpu.runtime.stream import StreamPool


def test_unknown_backend_is_loud():
    s = text_to_score("ae")
    for bad in ("Fused", "fsed", "tpu", ""):
        with pytest.raises(ValueError, match="unknown backend"):
            synthesize_scores([s], backend=bad)
        with pytest.raises(ValueError, match="unknown backend"):
            synthesize_score(s, "generic", backend=bad)
    with pytest.raises(ValueError, match="backend"):
        StreamPool(2, backend="pallas")


def test_batch_rejects_bare_string():
    with pytest.raises(TypeError, match="sequence of strings"):
        synthesize_batch("hello")


def test_batch_empty_inputs():
    assert synthesize_batch([]) == []
    assert synthesize_scores([]) == []


def test_seed_count_mismatch_is_loud():
    with pytest.raises(AssertionError, match="one seed per"):
        synthesize_batch(["ae", "ea"], seeds=[1], backend="xla")
    s = text_to_score("ae")
    with pytest.raises(AssertionError, match="one seed per"):
        synthesize_scores([s, s], seeds=[1, 2, 3], backend="xla")


def test_valid_backends_still_run():
    out = synthesize_batch(["ae"], backend="xla")[0]
    assert np.isfinite(out).all() and len(out) > 0
