"""
Host input pipeline: dataset factory, batching loader with background
prefetch, and batch unwrapping (reference data/load_data.py).

The loader assembles numpy batches on worker threads and keeps a bounded
prefetch queue so video decode / resize overlaps TPU compute — the reference
relies on torch DataLoader worker processes for the same purpose.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from textocvp_tpu.core.config import CONFIG, get_available_configs
from textocvp_tpu.data.tokenizers import get_tokenizer


def load_data(exp_params: dict, split: str = "train"):
    """Dataset factory keyed by the config registry (reference load_data.py:12-50)."""
    db_params = dict(exp_params["dataset"])
    db_name = db_params.pop("dataset_name")
    available = get_available_configs("datasets")
    if db_name not in available:
        raise NotImplementedError(f"Dataset {db_name!r} not available. Use one of {available}")

    tokenizer_name = db_params.pop("tokenizer", "T5")
    # uint8-on-the-wire (data/wire.py): ship uint8 to the device, normalize
    # there. 4x fewer host→device bytes and no host float conversion.
    uint8_wire = bool(db_params.pop("uint8_wire", False))
    db_params.setdefault("uint8_output", uint8_wire)
    if db_name in ("CATER_Easy", "CATER_Hard"):
        from textocvp_tpu.data.datasets import CATER

        dataset = CATER(split=split, mode="easy" if db_name == "CATER_Easy" else "hard",
                        **db_params)
    elif db_name == "CLIPort":
        from textocvp_tpu.data.datasets import CLIPort

        dataset = CLIPort(split=split, **db_params)
    elif db_name == "Synthetic":
        from textocvp_tpu.data.synthetic import SyntheticBalls

        n = db_params.pop("num_train_seqs", 64) if split == "train" \
            else db_params.pop("num_eval_seqs", 16)
        db_params.pop("num_eval_seqs", None)
        db_params.pop("num_train_seqs", None)
        db_params.pop("root", None)
        dataset = SyntheticBalls(split=split, num_seqs=n, **db_params)
    else:
        raise NotImplementedError(f"Dataset {db_name!r} not wired up")

    vocab = getattr(dataset, "vocabulary", None)
    dataset.tokenizer = get_tokenizer(tokenizer_name, vocabulary=vocab)
    return dataset


class DataLoader:
    """
    Iterates a dataset in batches of ``(videos, caption_info)`` where videos
    is (B, T, H, W, C) float32 and caption_info carries the collate contract
    {caption, caption_tokens, caption_lengths, attn_masks}
    (reference Cater.py:170-187).

    ``num_workers`` threads fetch items; up to ``prefetch`` assembled batches
    are buffered ahead of the consumer.

    Multi-host: with ``process_count > 1`` each process loads only its own
    1/process_count slice of every global batch (contiguous rows, same
    shuffle order on every host thanks to the shared seed), matching the
    ('dcn', 'data') global-batch sharding assembled by
    ``parallel.mesh.shard_batch``. ``batch_size`` stays the GLOBAL batch
    size. Ragged final batches are padded GLOBALLY (repeating the last row)
    up to ``pad_to_multiple`` — every process then emits the same number of
    equally-sized batches, so no process launches a collective the others
    skip; the batch info carries ``num_valid`` (the unpadded global row
    count) for callers to slice per-sample outputs.
    """

    def __init__(self, dataset, batch_size: int = 8, shuffle: bool = False,
                 num_workers: Optional[int] = None, prefetch: int = 2,
                 drop_last: bool = False, seed: int = 14,
                 process_index: int = 0, process_count: int = 1,
                 pad_to_multiple: Optional[int] = None,
                 worker_type: str = "thread"):
        assert worker_type in ("thread", "process")
        assert 0 <= process_index < process_count
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes")
        if process_count > 1 and pad_to_multiple is None:
            pad_to_multiple = process_count
        if pad_to_multiple is not None and pad_to_multiple % process_count:
            raise ValueError(
                f"pad_to_multiple {pad_to_multiple} must be a multiple of "
                f"process_count {process_count}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = CONFIG["num_workers"] if num_workers is None else num_workers
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.pad_to_multiple = pad_to_multiple
        # "process" sidesteps the GIL for decode-heavy datasets (requires a
        # picklable dataset); "thread" suffices when PIL/imageio release the
        # GIL during decode. bench_loader.py measures both.
        self.worker_type = worker_type

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> list[tuple[np.ndarray, int]]:
        """Per-batch (this process's index slice, global valid-row count)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
        batches = [order[i : i + self.batch_size] for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        out = []
        for b in batches:
            valid = len(b)
            if self.pad_to_multiple is not None and valid % self.pad_to_multiple:
                target = ((valid + self.pad_to_multiple - 1)
                          // self.pad_to_multiple) * self.pad_to_multiple
                b = np.concatenate([b, np.full(target - valid, b[-1])])
            if self.process_count > 1:
                # contiguous per-process slice of each (padded) GLOBAL batch,
                # matching the row order
                # jax.make_array_from_process_local_data expects for a
                # ('dcn', 'data')-sharded global array. Padding is at the
                # global tail, so [:num_valid] on the assembled array drops it.
                per = len(b) // self.process_count
                b = b[self.process_index * per : (self.process_index + 1) * per]
            out.append((b, valid))
        return out

    def _collate(self, items, num_valid: int):
        videos = np.stack([it[0] for it in items], axis=0)
        if videos.dtype != np.uint8:  # uint8-on-the-wire stays uint8
            videos = videos.astype(np.float32)
        captions = [it[1] for it in items]
        info = {"caption": captions}
        tokenizer = getattr(self.dataset, "tokenizer", None)
        if tokenizer is not None:
            info.update(tokenizer(captions))
        if self.pad_to_multiple is not None:
            info["num_valid"] = num_valid
        return videos, info

    def __iter__(self) -> Iterator:
        # propagate the epoch BEFORE batches ship to workers so random-start
        # sampling is deterministic per (seed, epoch, idx) under any worker
        # schedule (process workers receive the dataset after this call)
        set_epoch = getattr(self.dataset, "set_epoch", None)
        if set_epoch is not None:
            set_epoch(self._epoch)
        batches = self._batch_indices()
        self._epoch += 1
        if self.num_workers <= 0:
            for idxs, valid in batches:
                yield self._collate([self.dataset[int(i)] for i in idxs], valid)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                if self.worker_type == "process":
                    from concurrent.futures import ProcessPoolExecutor

                    # the dataset ships to each worker ONCE (initializer);
                    # maps carry only indices
                    with ProcessPoolExecutor(
                        max_workers=self.num_workers,
                        initializer=_init_worker, initargs=(self.dataset,),
                    ) as pool:
                        for idxs, valid in batches:
                            items = list(pool.map(_fetch_item,
                                                  [int(i) for i in idxs]))
                            q.put(self._collate(items, valid))
                else:
                    with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                        for idxs, valid in batches:
                            items = list(pool.map(lambda i: self.dataset[int(i)], idxs))
                            q.put(self._collate(items, valid))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        thread.join()


_WORKER_DATASET = None


def _init_worker(dataset):
    """ProcessPoolExecutor initializer: install the dataset once per worker."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _fetch_item(idx: int):
    """Module-level fetcher so ProcessPoolExecutor pickles only the index."""
    return _WORKER_DATASET[idx]


def unwrap_batch(batch) -> tuple[np.ndarray, dict]:
    """(videos, others) split (reference load_data.py:77-91)."""
    videos, caption_info = batch
    return videos, dict(caption_info)
