"""Dataset registry + loader (reference data/__init__.py:18-104).

``create_dataset(opt)`` resolves ``--dataset_mode`` through the explicit
registry and wraps the dataset in a :class:`DataLoader` that shuffles,
optionally prefetches samples with host threads, and assembles batch dicts
of stacked numpy arrays (leading batch axis), ready for ``jax.device_put``.
"""

from __future__ import annotations

import concurrent.futures as _fut
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils.registry import DATASETS
from . import singleskit as _singleskit  # noqa: F401 — registers 'singleskit'
from . import patchskit as _patchskit    # noqa: F401 — registers 'patchskit'
from . import skit as _skit              # noqa: F401 — registers 'skit'
from . import legacy as _legacy          # noqa: F401 — single/unaligned/singleimage/template


def get_option_setter(dataset_name: str):
    return DATASETS.get(dataset_name).modify_commandline_options


def find_dataset_using_name(dataset_name: str):
    return DATASETS.get(dataset_name)


class DataLoader:
    """Shuffling, thread-prefetching batch iterator over a map-style dataset."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 num_workers: int = 0, drop_last: bool = False, seed: int = 0,
                 max_dataset_size: Optional[int] = None,
                 cache_on_device: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        # device-resident batch cache (--cache_data_device): the augmented
        # samples are FIXED across epochs (disk-cached at build), so on
        # tunneled/remote hosts the per-iteration host->device transfer
        # (~13 s for a 38 MB flagship sample over the axon tunnel) can be
        # paid once and reused every epoch.  Keyed by the sample-index tuple
        # so per-epoch shuffling still hits (batch_size=1 always hits).
        self._dev_cache: Optional[Dict] = {} if cache_on_device else None
        n = len(dataset)
        if max_dataset_size:
            n = min(n, max_dataset_size)
        self._n = n

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        if self.drop_last:
            return self._n // self.batch_size
        return (self._n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idx = np.arange(self._n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        batches = [order[i : i + self.batch_size]
                   for i in range(0, self._n, self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def fetch(batch_idx):
            if self._dev_cache is None:
                return collate([self.dataset[int(i)] for i in batch_idx])
            # cache PER SAMPLE (bounded by the dataset size), not per batch
            # index tuple: with shuffle and batch_size>1 the tuples change
            # every epoch, which would pin a fresh full batch on device per
            # miss (~38 MB/sample at the flagship) and leak HBM unboundedly
            import jax
            per = []
            for i in batch_idx:
                i = int(i)
                if i not in self._dev_cache:
                    one = collate([self.dataset[i]])
                    # sample_idx stays host-side: set_input reads it back as
                    # numpy (a device round-trip per step on tunneled backends)
                    self._dev_cache[i] = {
                        k: (jax.device_put(v)
                            if k != "sample_idx"
                            and isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
                            else v)
                        for k, v in one.items()}
                per.append(self._dev_cache[i])
            if len(per) == 1:
                return per[0]
            import jax.numpy as jnp
            out = {}
            for k in per[0]:
                vals = [p[k] for p in per]
                out[k] = (np.concatenate(vals, 0)
                          if isinstance(vals[0], np.ndarray)
                          else jnp.concatenate(vals, 0))
            return out

        if self.num_workers <= 0:
            for b in batches:
                yield fetch(b)
            return
        # bounded submit-ahead window: keeps at most a few batches in flight
        # so full-res sample dicts don't pile up in RAM when the consumer is
        # slower than the workers.
        import collections
        window = max(2, 2 * self.num_workers)
        with _fut.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            inflight = collections.deque()
            it = iter(batches)
            for b in it:
                inflight.append(pool.submit(fetch, b))
                if len(inflight) >= window:
                    break
            for b in it:
                yield inflight.popleft().result()
                inflight.append(pool.submit(fetch, b))
            while inflight:
                yield inflight.popleft().result()


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack sample dicts on a new leading batch axis (shared keys only)."""
    keys = set(samples[0])
    for s in samples[1:]:
        keys &= set(s)
    out = {}
    for k in keys:
        vals = [np.asarray(s[k]) for s in samples]
        out[k] = np.stack(vals, axis=0)
    return out


def create_dataset(opt):
    cls = DATASETS.get(opt.dataset_mode)
    dataset = cls(opt)
    return DataLoader(
        dataset,
        batch_size=getattr(opt, "batch_size", 1),
        shuffle=not getattr(opt, "serial_batches", False),
        num_workers=getattr(opt, "num_threads", 0),
        drop_last=bool(getattr(opt, "isTrain", True)),
        seed=getattr(opt, "seed", 0),
        max_dataset_size=getattr(opt, "max_dataset_size", None),
        cache_on_device=bool(getattr(opt, "cache_data_device", False)),
    )
