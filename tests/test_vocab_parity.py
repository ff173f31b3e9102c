"""Vocabulary differential test vs the reference datautils (HF download
shimmed with the embedded static char vocab)."""

import pytest

from wav2vecsegmenter_tpu.data.vocab import BaseVocabulary, UppercasedCharVocabulary

from .test_pipeline_parity import REFERENCE, _load_reference_modules

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference not mounted")


def test_base_vocab_matches_reference():
    _, ref_datautils, _ = _load_reference_modules()
    ours = BaseVocabulary()
    theirs = ref_datautils.BaseVocabulary()
    assert ours.get_vocab() == theirs.get_vocab()
    for attr in ("boundary_token_id", "nonboundary_token_id", "pad_token_id",
                 "sep_token_id", "vocab_size", "n_special_tokens"):
        assert getattr(ours, attr) == getattr(theirs, attr)


def test_upperchar_vocab_matches_reference():
    _, ref_datautils, _ = _load_reference_modules()
    ours = UppercasedCharVocabulary()
    theirs = ref_datautils.UppercasedCharVocabulary()
    assert ours.get_vocab() == theirs.get_vocab()
    assert ours.vocab_size == theirs.vocab_size == 36
