"""Host-side pair loader: pad, batch, per-host shard, prefetch.

Replaces the reference's torch DataLoader + collate stack (reference:
geotransformer/utils/data.py:223-253, utils/torch.py:48-77) — but does NOT
precompute the neighbor pyramid on the host: padding is the only host work;
the pyramid is built on device inside the jitted step
(rdmnet_tpu/graph/pyramid.py). Multi-host data parallelism shards the
metadata by process index (replaces DistributedSampler,
reference utils/torch.py:58-60).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from rdmnet_tpu.data.datasets import RegistrationPairDataset


def choose_bucket(num_points: int, bucket_caps) -> int:
    """Pick the smallest bucket whose level-0 capacity fits ``num_points``
    (falls back to the largest). ``bucket_caps``: ascending level-0 caps.
    Each bucket corresponds to one compiled variant of the jitted step —
    static-shape point-count bucketing instead of dynamic shapes."""
    for i, cap in enumerate(bucket_caps):
        if num_points <= cap:
            return i
    return len(bucket_caps) - 1


def pad_points_np(points: np.ndarray, cap: int, pad_coord: float = 1.0e9):
    n = min(len(points), cap)
    out = np.full((cap, 3), pad_coord, np.float32)
    out[:n] = points[:n]
    return out, np.int32(n)


class PairLoader:
    """Yields numpy batches: dict with ref/src padded points, counts, GT.

    The jitted step converts these into PairBatch pytrees via
    build_pair_batch (vmapped), entirely on device.
    """

    def __init__(
        self,
        dataset: RegistrationPairDataset,
        cap: int,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 7351,
        num_hosts: int = 1,
        host_id: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.cap = cap
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.rng = np.random.RandomState(seed)
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch

    def __len__(self):
        # every host yields the SAME count (padded sharding, see _indices)
        n = -(-len(self.dataset) // self.num_hosts)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        # per-host strided shard, PADDED so every host gets the same number
        # of items (torch DistributedSampler semantics): an unequal split
        # would have some hosts dispatch one extra jitted step whose
        # cross-host collectives never match on the others — deadlock
        per_host = -(-len(idx) // self.num_hosts)
        total = per_host * self.num_hosts
        if total > len(idx):
            idx = np.concatenate([idx, idx[: total - len(idx)]])
        return idx[self.host_id :: self.num_hosts]

    def _make_batch(self, items):
        ref_pts, ref_cnt, src_pts, src_cnt, tfs = [], [], [], [], []
        ref_drop, src_drop = [], []
        metas = []
        for it in items:
            rp, rc = pad_points_np(it["ref_points"], self.cap)
            sp, sc = pad_points_np(it["src_points"], self.cap)
            ref_pts.append(rp)
            ref_cnt.append(rc)
            src_pts.append(sp)
            src_cnt.append(sc)
            # level-0 truncation telemetry (clouds larger than the bucket cap)
            ref_drop.append(np.int32(max(0, len(it["ref_points"]) - self.cap)))
            src_drop.append(np.int32(max(0, len(it["src_points"]) - self.cap)))
            tfs.append(it["transform"])
            metas.append(
                {"seq_id": it["seq_id"], "ref_frame": it["ref_frame"],
                 "src_frame": it["src_frame"]}
            )
        return {
            "ref_points": np.stack(ref_pts),
            "ref_counts": np.stack(ref_cnt),
            "src_points": np.stack(src_pts),
            "src_counts": np.stack(src_cnt),
            "ref_dropped": np.stack(ref_drop),
            "src_dropped": np.stack(src_drop),
            "transform": np.stack(tfs),
            "metadata": metas,
        }

    def _iter_sync(self, skip_batches: int = 0) -> Iterator[dict]:
        indices = self._indices()
        nb = len(indices) // self.batch_size if self.drop_last else -(-len(indices) // self.batch_size)
        for b in range(skip_batches, nb):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            items = [self.dataset[int(i)] for i in chunk]
            # repeat last item to fill a ragged tail batch; batch_valid marks
            # the repeats so metric aggregation can exclude them
            n_real = len(items)
            while len(items) < self.batch_size:
                items.append(items[-1])
            batch = self._make_batch(items)
            batch["batch_valid"] = (
                np.arange(self.batch_size) < n_real
            )
            yield batch

    def peek(self) -> dict:
        """First batch, loaded synchronously (no prefetch thread) — for
        shape/compile probes that will not consume the full iterator."""
        return next(self._iter_sync())

    def __iter__(self) -> Iterator[dict]:
        return self.iter_from(0)

    def iter_from(self, skip_batches: int = 0) -> Iterator[dict]:
        """Iterate starting at batch ``skip_batches`` of this pass (the skip
        is index-level: skipped items are never loaded). Used by
        CycleLoader to resume an iteration-budget run mid-pass."""
        if self.prefetch <= 0:
            yield from self._iter_sync(skip_batches)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        # set when the consumer abandons the iterator: the worker's queue
        # puts would otherwise block forever on the full bounded queue,
        # leaking the thread plus prefetch+1 pinned batches per epoch
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self._iter_sync(skip_batches):
                    if not put(batch):
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                # surface dataset/IO failures to the training loop instead of
                # silently truncating the epoch
                put(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
