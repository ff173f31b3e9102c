"""Training-data parity: window targets and grids vs the reference dataset
code (imported with shimmed torchaudio) on the same corpus TSVs."""

import numpy as np
import pytest
import yaml

from wav2vecsegmenter_tpu.data.datasets import FixedSegmentationDataset
from wav2vecsegmenter_tpu.data.prep import prepare_dataset_for_segmentation

from .helpers import make_speechlike_wav
from .test_pipeline_parity import REFERENCE, _load_reference_modules

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference not mounted")


@pytest.fixture(autouse=True)
def _pandas_int_shim():
    """The reference targets pandas<2 where int(single_elem_Series) worked;
    restore that behavior so the oracle runs under pandas 3."""
    import pandas as pd

    if not hasattr(pd.Series, "__int__"):
        pd.Series.__int__ = lambda self: int(self.iloc[0])
        yield
        del pd.Series.__int__
    else:
        yield


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    ws = tmp_path_factory.mktemp("dataparity")
    wav_dir = ws / "wav"
    wav_dir.mkdir()
    make_speechlike_wav(wav_dir / "talkX.wav", duration_secs=33.7, seed=5)
    rows = []
    t = 0.4
    while t + 2.5 < 33.7:
        rows.append({"duration": 2.1, "offset": round(t, 3),
                     "speaker_id": "NA", "wav": "talkX.wav"})
        t += 2.9
    with open(ws / "dev.yaml", "w") as f:
        yaml.dump(rows, f)
    talks_tsv, segments_tsv = prepare_dataset_for_segmentation(
        ws / "dev.yaml", wav_dir, ws, split="dev"
    )
    return str(talks_tsv), str(segments_tsv)


@pytest.mark.parametrize("iteration,inference_times", [(0, 1), (1, 3)])
def test_fixed_dataset_targets_match_reference(corpus, iteration,
                                               inference_times):
    talks_tsv, segments_tsv = corpus
    ref_dataset, _, _ = _load_reference_modules()

    seg_len = 6
    ref = ref_dataset.FixedSegmentationDataset(
        talks_tsv, segments_tsv, seg_len, inference_times)
    ref.generate_fixed_segments("talkX", iteration)

    ours = FixedSegmentationDataset(talks_tsv, segments_tsv, seg_len,
                                    inference_times)
    ours.generate_fixed_segments("talkX", iteration)

    assert len(ours) == len(ref)
    assert ours.duration_outframes == ref.duration_outframes
    for i in range(len(ours)):
        wav_o, tgt_o, s_o, e_o = ours[i]
        wav_r, tgt_r, s_r, e_r = ref[i]
        assert (s_o, e_o) == (int(s_r), int(e_r))
        np.testing.assert_allclose(wav_o, wav_r.numpy(), atol=1e-7)
        np.testing.assert_array_equal(tgt_o, tgt_r.numpy())


def test_pos_class_percentage_matches_reference(corpus):
    talks_tsv, segments_tsv = corpus
    ref_dataset, _, _ = _load_reference_modules()

    from wav2vecsegmenter_tpu.data.datasets import RandomSegmentationDataset

    # same RNG seed path: both use np.random.RandomState-style seeding of the
    # global/legacy generator; compare the class balance statistic, which is
    # grid-dependent — use the same seed so grids match
    seed = 123
    ref = ref_dataset.RandomSegmentationDataset(
        talks_tsv, segments_tsv, 6, seed=seed)
    ours = RandomSegmentationDataset(talks_tsv, segments_tsv, 6, seed=seed)
    assert len(ours) == len(ref)
    assert ours.pos_class_percentage == pytest.approx(
        ref.pos_class_percentage, rel=1e-9)
    for i in (0, len(ours) - 1):
        wav_o, tgt_o, s_o, e_o = ours[i]
        wav_r, tgt_r, s_r, e_r = ref[i]
        assert (s_o, e_o) == (int(s_r), int(e_r))
        np.testing.assert_array_equal(tgt_o, tgt_r.numpy())
