"""Batched, thread-prefetched data loading.

Replaces torch DataLoader worker processes (reference train.py:237,
inference.py:83) with a thread pool: wav decoding is I/O + memcpy bound and
releases the GIL in numpy, so threads overlap host decode with device compute
(double buffering happens naturally through the prefetch queue + JAX's async
dispatch).

``RandomDataloaderGenerator`` / ``FixedDataloaderGenerator`` keep the
reference's generator API (lib/dataset.py:671-813) so task configs
instantiate them by `_target_` unchanged.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..core.frames import secs_to_inframes
from .collate import collate, collate_autoreg, out_len_for
from .datasets import (
    FixedSegmentationDataset,
    RandomSegmentationDataset,
)


def audio_bucket_lengths(segment_length_secs: float) -> tuple[int, int]:
    """(standard, tail) static audio lengths: windows are at most
    segment_length + 2 s after the reference's short-tail merge
    (lib/dataset.py:632-636)."""
    std = int(secs_to_inframes(segment_length_secs))
    tail = int(secs_to_inframes(segment_length_secs + 2))
    return std, tail


class BatchIterator:
    """Iterates a dataset in order (or shuffled), collating into static-shape
    batches and prefetching ahead of the consumer."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        segment_length_secs: float,
        shuffle: bool = False,
        seed: int | None = None,
        num_threads: int = 4,
        prefetch: int = 2,
        pad_token_id: float = 0.0,
        autoregression: bool = False,
        sep_token_id: int = 3,
        device_normalize: bool = False,
        remainder_ladder: bool = False,
        min_multiple: int = 1,
        ctc_vocab=None,
    ) -> None:
        # CTC task: collate encoded window transcripts alongside the frame
        # targets (dataset.transcript(idx); data/datasets.py)
        self.ctc_vocab = ctc_vocab
        self.dataset = dataset
        self.batch_size = batch_size
        self.std_len, self.tail_len = audio_bucket_lengths(segment_length_secs)
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.pad_token_id = pad_token_id
        self.autoregression = autoregression
        self.sep_token_id = sep_token_id
        self.device_normalize = device_normalize
        self.remainder_ladder = remainder_ladder
        self.min_multiple = max(1, int(min_multiple))

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def _bucket_for(self, examples) -> tuple[int, int]:
        max_len = max(len(ex[0]) for ex in examples)
        audio_len = self.std_len if max_len <= self.std_len else self.tail_len
        return audio_len, out_len_for(audio_len)

    def _slots_for(self, n: int) -> int:
        """Static row count for a batch of ``n`` real examples.

        Without the ladder every batch pads to ``batch_size``; with it, a
        final partial batch runs at the smallest power-of-two slot count
        >= n (rounded up to ``min_multiple`` for mesh divisibility) so a
        sweep's remainder batches stop spending ~90% of their rows on dead
        compute.  The examples sharing the batch are unchanged, so the
        batch-max normalization window is identical — the reference's own
        final DataLoader batch has exactly n rows, making a right-sized
        batch *more* faithful, not less (lib/datautils.py:120-125).  Cost:
        one extra XLA program per (slot count, audio bucket) actually seen.
        """
        if not self.remainder_ladder or n >= self.batch_size:
            return self.batch_size
        m = self.min_multiple
        slots = 1
        while slots < n:
            slots *= 2
        slots = ((slots + m - 1) // m) * m
        return min(slots, self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed)
            rng.shuffle(order)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """q.put that gives up when the consumer abandoned iteration —
            a plain put would block forever on the full prefetch queue and
            leak the producer + its pool for the life of the process."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as pool:
                    idx_batches = [
                        order[i : i + self.batch_size]
                        for i in range(0, len(order), self.batch_size)
                    ]
                    # pipeline: submit example loads batch by batch
                    for idx in idx_batches:
                        if stop.is_set():
                            return
                        examples = list(pool.map(self.dataset.__getitem__, idx))
                        audio_len, out_len = self._bucket_for(examples)
                        slots = self._slots_for(len(examples))
                        if self.autoregression:
                            batch = collate_autoreg(
                                examples, slots, audio_len, out_len,
                                int(self.pad_token_id), self.sep_token_id,
                            )
                        else:
                            transcripts = (
                                [self.dataset.transcript(i) for i in idx]
                                if self.ctc_vocab is not None else None)
                            batch = collate(
                                examples, slots, audio_len, out_len,
                                self.pad_token_id,
                                device_normalize=self.device_normalize,
                                transcripts=transcripts,
                                ctc_vocab=self.ctc_vocab,
                            )
                        if not put_or_stop(batch):
                            return
            except BaseException as e:  # surface worker errors to consumer
                put_or_stop(e)
                return
            put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class RandomDataloaderGenerator:
    """Per-epoch random resegmentation (reference lib/dataset.py:671-734)."""

    def __init__(
        self,
        talk_list,
        segments_list,
        segment_length,
        batch_size,
        num_workers=4,
        autoregression: bool = False,
        vocab=None,
        seed: int | None = None,
        device_normalize: bool = False,
        ctc: bool = False,
    ) -> None:
        self.ctc = ctc
        self.device_normalize = device_normalize
        self.talk_list = talk_list
        self.segments_list = segments_list
        self.segment_length = segment_length
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.autoregression = autoregression
        self.vocab = vocab
        self._rng = np.random.RandomState(seed)
        self.dataset = None

    def skip_epoch_seeds(self, n: int) -> None:
        """Advance the per-epoch seed stream without building datasets
        (resume: a run restarted at epoch k must regenerate epoch k with
        the same seed an uninterrupted run would have used)."""
        for _ in range(max(0, int(n))):
            self._rng.randint(0, 2**31 - 1)

    def generate(self) -> BatchIterator:
        seed = int(self._rng.randint(0, 2**31 - 1))
        self.dataset = RandomSegmentationDataset(
            self.talk_list, self.segments_list, self.segment_length, seed
        )
        return BatchIterator(
            self.dataset,
            self.batch_size,
            self.segment_length,
            shuffle=True,
            seed=seed,
            num_threads=self.num_workers,
            pad_token_id=self.vocab.pad_token_id if self.vocab else 0.0,
            autoregression=self.autoregression,
            sep_token_id=self.vocab.sep_token_id if self.vocab else 3,
            device_normalize=self.device_normalize and not self.autoregression,
            ctc_vocab=self.vocab if self.ctc else None,
        )


class FixedDataloaderGenerator:
    """Fixed-grid eval/inference loaders (reference lib/dataset.py:737-813)."""

    def __init__(
        self,
        talk_list,
        segments_list,
        segment_length,
        batch_size,
        num_workers=4,
        inference_times: int = 1,
        autoregression: bool = False,
        vocab=None,
        device_normalize: bool = False,
        remainder_ladder: bool = False,
        min_multiple: int = 1,
        ctc: bool = False,
    ) -> None:
        self.ctc = ctc
        # right-size each talk's final partial batch (see _slots_for); the
        # train loop flips this from runtime.infer_remainder_ladder
        self.remainder_ladder = remainder_ladder
        self.min_multiple = min_multiple
        self.device_normalize = device_normalize
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.segment_length = segment_length
        self.vocab = vocab
        self.autoregression = autoregression
        self.dataset = FixedSegmentationDataset(
            talk_list, segments_list, segment_length, inference_times
        )

    def generate(self, talk_id, iteration: int) -> BatchIterator:
        if talk_id == "":
            self.dataset.generate_fixed_segments_all_talks(iteration)
        else:
            self.dataset.generate_fixed_segments(talk_id, iteration)
        return BatchIterator(
            self.dataset,
            self.batch_size,
            self.segment_length,
            shuffle=False,
            num_threads=self.num_workers,
            pad_token_id=self.vocab.pad_token_id if self.vocab else 0.0,
            autoregression=self.autoregression,
            sep_token_id=self.vocab.sep_token_id if self.vocab else 3,
            device_normalize=self.device_normalize and not self.autoregression,
            remainder_ladder=self.remainder_ladder,
            # mesh runs need every ladder slot count divisible by the data
            # axis (the train loop sets this alongside remainder_ladder)
            min_multiple=self.min_multiple,
            ctc_vocab=self.vocab if self.ctc else None,
        )

    def get_talk_ids(self) -> list:
        return self.dataset.corpus.talk_ids()
