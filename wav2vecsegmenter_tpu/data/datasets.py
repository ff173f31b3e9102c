"""Segmentation datasets: random training grids and fixed inference grids.

TSV contracts follow the SHAS data prep the reference consumes
(lib/dataset.py:36-41): ``talks.tsv`` with columns (id, path, total_frames),
``segments.tsv`` with (talk_id, start, end) in input-space frames.  Target
construction replicates lib/dataset.py:68-144 (per-talk binary frame vector
-> per-window (start, end) spans in output space, with the overlap bump).

Unlike the reference's torch Dataset/DataLoader pair, these are plain
iterables that yield numpy examples; batching/normalization lives in
collate.py and threading in loader.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core.frames import inframes_to_outframes
from ..core.windows import fixed_window_grid, random_window_grid
from .audio import assert_sample_rate, read_wav_window


class SegmentationCorpus:
    """talks + true segments for a split (base of both dataset flavors)."""

    def __init__(self, talk_list: str, segments_list: str) -> None:
        self.talks_df = pd.read_csv(talk_list, sep="\t", index_col=0)
        self.segments_df = pd.read_csv(segments_list, sep="\t", index_col=0)
        # transcripts for the CTC task: the reference left this unloaded
        # (lib/dataset.py:45 "[TODO] load self.tgt_text"); here an optional
        # ``tgt_text`` column in segments.tsv carries them (data/prep.py
        # writes it when the MuST-C split has a transcript file)
        self.has_text = "tgt_text" in self.segments_df.columns
        self._text_index: dict | None = None  # talk_id -> (starts, ends, texts)

    def _talk_text_index(self, talk_id):
        """Per-talk start-sorted (starts, ends, texts) arrays, built once.

        window_transcript is called for EVERY window at EVERY per-epoch
        dataset regeneration; a full segments_df boolean scan + sort per
        call is O(windows x total_segments) pandas work on the host hot
        path — this groups once and makes each lookup a binary search."""
        if self._text_index is None:
            idx = {}
            cols = self.segments_df.sort_values("start")
            for tid, g in cols.groupby("talk_id", sort=False):
                texts = [str(t).strip()
                         if (isinstance(t, str) or not pd.isna(t)) else ""
                         for t in g.tgt_text]
                idx[tid] = (g.start.to_numpy(), g.end.to_numpy(), texts)
            self._text_index = idx
        return self._text_index.get(talk_id)

    def window_transcript(self, talk_id, start: int, end: int) -> str:
        """Transcript of the window [start, end) in input-space frames:
        texts of the true segments FULLY contained in the window, joined by
        spaces.  Partially-overlapping segments are excluded — their text
        covers audio outside the window and would misalign the CTC targets;
        their in-window audio stays unlabeled (a conservative cost CTC
        absorbs via blanks)."""
        entry = self._talk_text_index(talk_id)
        if entry is None:
            return ""
        starts, ends, texts = entry
        lo = int(np.searchsorted(starts, start, side="left"))
        out = []
        for i in range(lo, len(starts)):
            if starts[i] > end:
                break  # start-sorted: no later segment can be contained
            if ends[i] <= end and texts[i]:
                out.append(texts[i])
        return " ".join(out)

    def talk_ids(self) -> list:
        return self.talks_df["id"].tolist()

    def talk_row(self, talk_id):
        return self.talks_df.loc[self.talks_df["id"] == talk_id].iloc[0]

    def talk_label_vector(self, talk_id) -> np.ndarray:
        """Binary 1/0 per input-space frame: inside a true segment or not
        (reference lib/dataset.py:83-87)."""
        row = self.talk_row(talk_id)
        labels = np.zeros(int(row["total_frames"]), dtype=np.uint8)
        for _, sgm in self.segments_df.loc[
            self.segments_df.talk_id == talk_id
        ].iterrows():
            labels[int(sgm.start) : int(sgm.end)] = 1
        return labels


def window_targets(labels_window: np.ndarray) -> list[tuple[int, int]]:
    """True (start, end) spans of a window in OUTPUT space.

    Replicates reference _get_targets_for_segment (lib/dataset.py:99-127)
    including the +1 bump when a span's rounded start collides with the
    previous span's end."""
    lw = labels_window
    change = list(np.where(lw[1:] != lw[:-1])[0] + 1)
    targets: list[tuple[int, int]] = []
    for s, e in zip([0] + change, change + [len(lw)]):
        if lw[s] == 1:
            so = int(inframes_to_outframes(s))
            eo = int(inframes_to_outframes(e))
            if targets and so <= targets[-1][1]:
                so += 1
            targets.append((so, eo))
    return targets


def construct_target(spans: list[tuple[int, int]], duration_inframes: int) -> np.ndarray:
    """Window spans -> dense binary target in output space
    (reference _construct_target, lib/dataset.py:129-144)."""
    target_len = int(inframes_to_outframes(duration_inframes))
    target = np.zeros(target_len, dtype=np.float32)
    for s, e in spans:
        target[s : min(e, target_len + 1)] = 1
    return target


class _GridDataset:
    """Windows over a corpus with optional targets; yields numpy examples
    (waveform, target|None, start_out, end_out)."""

    def __init__(self, corpus: SegmentationCorpus):
        self.corpus = corpus
        # rows: (talk_id, path, start_in, end_in, spans)
        self.rows: list = []
        # parallel to rows when the corpus carries tgt_text (CTC task)
        self.transcripts: list[str] = []
        self.n_pos = 0
        self.n_all = 0
        # set by fixed-grid subclasses (talk-sequential access); None for
        # the random training dataset (shuffled corpus-wide access)
        self._wav_cache = None

    def _add_talk_windows(self, talk_id, starts, ends) -> None:
        row = self.corpus.talk_row(talk_id)
        labels = self.corpus.talk_label_vector(talk_id)
        for s, e in zip(starts, ends):
            spans = window_targets(labels[s:e])
            self.rows.append((talk_id, row["path"], int(s), int(e), spans))
            self.n_pos += sum(ee - ss for ss, ee in spans)
            self.n_all += int(inframes_to_outframes(e - s))
            if self.corpus.has_text:
                self.transcripts.append(
                    self.corpus.window_transcript(talk_id, int(s), int(e)))

    def transcript(self, idx: int) -> str:
        """Window transcript for the CTC task ('' without a tgt_text
        column)."""
        return self.transcripts[idx] if self.transcripts else ""

    @property
    def pos_class_percentage(self) -> float:
        return self.n_pos / max(1, self.n_all)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int):
        talk_id, path, s, e, spans = self.rows[idx]
        if self._wav_cache is not None:
            waveform = self._wav_cache.window(path, s, e - s)
        else:
            waveform = read_wav_window(path, s, e - s)
        target = construct_target(spans, e - s)
        start = int(inframes_to_outframes(s + 1e-6))
        end = int(inframes_to_outframes(e + 1e-6))
        return waveform, target, start, end


class RandomSegmentationDataset(_GridDataset):
    """Fresh random segmentation of every talk; regenerated each epoch
    (reference lib/dataset.py:147-257)."""

    def __init__(self, talk_list, segments_list, segment_length,
                 seed: int | None = None):
        super().__init__(SegmentationCorpus(talk_list, segments_list))
        rng = np.random.RandomState(seed)
        self.segment_length = segment_length
        for _, talk in self.corpus.talks_df.iterrows():
            starts, ends = random_window_grid(
                int(talk["total_frames"]), segment_length, rng
            )
            self._add_talk_windows(talk["id"], starts, ends)


class FixedSegmentationDataset(_GridDataset):
    """Fixed-length segmentation of one talk (or all), per inference pass
    (reference lib/dataset.py:335-497)."""

    def __init__(self, talk_list, segments_list, segment_length,
                 inference_times: int = 1):
        super().__init__(SegmentationCorpus(talk_list, segments_list))
        from .audio import WaveformCache

        self.segment_length = segment_length
        self.inference_times = inference_times
        self.duration_outframes: int | None = None
        self._wav_cache = WaveformCache(2)

    def generate_fixed_segments(self, talk_id, iteration: int) -> None:
        self.rows = []
        self.transcripts = []
        row = self.corpus.talk_row(talk_id)
        total = int(row["total_frames"])
        self.duration_outframes = int(inframes_to_outframes(total))
        starts, ends = fixed_window_grid(
            total, self.segment_length, self.inference_times, iteration
        )
        self._add_talk_windows(talk_id, starts, ends)

    def generate_fixed_segments_all_talks(self, iteration: int) -> None:
        self.rows = []
        self.transcripts = []
        for _, talk in self.corpus.talks_df.iterrows():
            total = int(talk["total_frames"])
            starts, ends = fixed_window_grid(
                total, self.segment_length, self.inference_times, iteration
            )
            self._add_talk_windows(talk["id"], starts, ends)

    def release_cache(self) -> None:
        """Drop decoded waveforms between evals: this dataset lives for the
        whole training run (train/loop.py eval_gen), and the capacity-2
        cache would otherwise pin ~2 talks of float32 audio while idle."""
        self._wav_cache.clear()


class FixedSegmentationDatasetNoTarget:
    """Sliding windows over a single wav, no targets — the inference-product
    path (reference lib/dataset.py:571-668)."""

    def __init__(self, path_to_wav, segment_length: float = 20,
                 inference_times: int = 1):
        from .audio import WaveformCache

        self.path_to_wav = str(path_to_wav)
        self.segment_length = segment_length
        self.inference_times = inference_times
        self.duration_inframes = assert_sample_rate(path_to_wav)
        self.duration_outframes = int(
            inframes_to_outframes(self.duration_inframes))
        self.starts = np.array([], int)
        self.ends = np.array([], int)
        # one talk: decode once, slice every window of every pass from
        # memory (the reference seek-reads the file per window,
        # lib/dataset.py:659-663)
        self._wav_cache = WaveformCache(1)

    def fixed_length_segmentation(self, iteration: int) -> None:
        self.starts, self.ends = fixed_window_grid(
            self.duration_inframes, self.segment_length,
            self.inference_times, iteration,
        )

    def __len__(self) -> int:
        return len(self.starts)

    def __getitem__(self, idx: int):
        s, e = int(self.starts[idx]), int(self.ends[idx])
        waveform = self._wav_cache.window(self.path_to_wav, s, e - s)
        start = int(inframes_to_outframes(s + 1e-6))
        end = int(inframes_to_outframes(e + 1e-6))
        return waveform, None, start, end
