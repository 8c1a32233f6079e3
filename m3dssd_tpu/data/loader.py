"""Host input pipeline: weighted sampling + multi-threaded prefetch batching.

TPU-native replacement for the reference's torch DataLoader + worker-process
target computation (ref:lib/dataloader.py:894-906). Per-sample work (decode,
augment, anchor target assignment) runs in a thread pool — the heavy pieces
(cv2 warp, numpy IoU matmuls) release the GIL — and finished fixed-shape
batches are staged in a bounded queue so host prep overlaps device steps.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .. import geometry as geo


def balance_samples(conf, imdb) -> np.ndarray:
    """Image sampling weights by fg/empty status (ref:lib/imdb_util.py:563-613)."""
    weights = np.ones(len(imdb))
    if conf.fg_image_ratio >= 0:
        valid_inds, empty_inds = [], []
        for i, imobj in enumerate(imdb):
            scale = conf.test_scale[0] / imobj.imH
            igns, rmvs = geo.determine_ignores(imobj.gts, conf.lbls, conf.ilbls,
                                               conf.min_gt_vis, conf.min_gt_h,
                                               conf.max_gt_h, scale)
            valid = int(((~igns) & (~rmvs)).sum())
            weights[i] = valid
            (valid_inds if valid > 0 else empty_inds).append(i)
        if conf.fg_image_ratio != 2:
            if valid_inds:
                weights[valid_inds] = len(imdb) * conf.fg_image_ratio / len(valid_inds)
            if empty_inds:
                weights[empty_inds] = len(imdb) * (1 - conf.fg_image_ratio) / len(empty_inds)
    s = weights.sum()
    if s <= 0:
        weights[:] = 1.0 / len(weights)
    else:
        weights /= s
    return weights


def collate(samples) -> Dict[str, np.ndarray]:
    """Stack per-image sample dicts into fixed-shape batch arrays.

    Output keys match what the jitted train step consumes:
      images [B,H,W,3] f32; labels [B,N] i32; labels_fg/bg/ign [B,N] i8;
      bbox_2d [B,N,4] f32; bbox_3d [B,N,7] f32; any_val [B] i32.
    """
    batch = {"images": np.stack([s["input"] for s in samples], axis=0)}
    if "target" in samples[0]:
        t0 = samples[0]["target"]
        for k in t0:
            batch[k] = np.stack([np.asarray(s["target"][k]) for s in samples], axis=0)
        # regression targets go channel-major [B, P, N] (lane-friendly on
        # device; the host transpose here is trivial)
        for k in ("bbox_2d", "bbox_3d"):
            batch[k] = np.ascontiguousarray(batch[k].transpose(0, 2, 1))
    elif "gt" in samples[0]:
        # on-device target path (pre_compute_target=False): padded gts only
        for k in samples[0]["gt"]:
            batch[k] = np.stack([s["gt"][k] for s in samples], axis=0)
    # camera matrices travel with the batch (needed by the 3D-projection /
    # rotated-IoU loss capabilities)
    if "meta" in samples[0] and "p2_inv" in samples[0]["meta"]:
        batch["p2_inv"] = np.stack(
            [np.asarray(s["meta"]["p2_inv"], np.float32) for s in samples], 0)
    return batch


class TrainLoader:
    """Weighted-random, threaded, prefetching batch iterator."""

    def __init__(self, dataset, batch_size: int, num_workers: int = 8,
                 seed: int = 0, prefetch: int = 4,
                 weights: Optional[np.ndarray] = None,
                 pack_s2d: bool = False, upload_bf16: Optional[bool] = None,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # multi-host batch slicing: `batch_size` stays the GLOBAL batch;
        # every process draws the identical global index vector (same seeded
        # rng) but decodes/augments/yields ONLY its own contiguous slice of
        # it (rows [p*B/np, (p+1)*B/np)) — matching the process-major 'data'
        # placement of parallel.shard_batch(per_host=True). Per-sample aug
        # rngs key on the GLOBAL slot, so the assembled global batch is
        # bitwise identical to the single-process one (tested,
        # tests/test_multihost.py).
        assert batch_size % max(process_count, 1) == 0, \
            (batch_size, process_count)
        self.process_index = process_index
        self.process_count = max(process_count, 1)
        self.local_batch = batch_size // self.process_count
        self._draws = 0     # monotone batch-draw counter for per-sample rngs
        self.weights = weights if weights is not None else balance_samples(
            dataset.conf, dataset.imdb)
        self.num_workers = num_workers
        self.prefetch = prefetch
        # pack_s2d: space-to-depth pack images host-side (free exact
        # relayout; saves the device-side pack copy — models/dla.py)
        self.pack_s2d = pack_s2d
        # bf16 image upload for bf16-compute models: exactly
        # compute-identical (the model casts its input to bf16 anyway) and
        # halves the host->device image bytes — the same trick the eval
        # driver uses (inference/test_driver.py). Default: on iff the
        # model computes in bf16.
        if upload_bf16 is None:
            upload_bf16 = getattr(dataset.conf, "compute_dtype",
                                  "float32") == "bfloat16"
        self.upload_bf16 = upload_bf16
        # to_device: jax.device_put each batch from the PRODUCER thread so
        # the host->device transfer overlaps the previous device step (the
        # main thread would otherwise upload synchronously at dispatch
        # time). Leave False under a mesh — shard_batch does its own
        # placement. The trainer flips this on for single-device runs.
        self.to_device = False
        self.steps_per_epoch = max(1, len(dataset) // batch_size)

    def _sample_indices(self) -> np.ndarray:
        return self.rng.choice(len(self.dataset), size=self.batch_size,
                               replace=True, p=self.weights)

    def batches(self, num_steps: int) -> Iterator[Dict[str, np.ndarray]]:
        """Yield `num_steps` batches with background prefetch."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for _ in range(num_steps):
                    if stop.is_set():
                        return
                    idx = self._sample_indices()
                    # per-sample seeded rngs: augmentation randomness is a
                    # pure function of (seed, draw, GLOBAL slot), NOT of
                    # which prefetch thread runs first or which process
                    # materializes the slot — batches are reproducible and
                    # process-split-invariant
                    draw = self._draws
                    self._draws += 1
                    lo = self.process_index * self.local_batch
                    args = [(int(i), np.random.default_rng(
                        (self.seed, draw, lo + s)))
                        for s, i in enumerate(idx[lo:lo + self.local_batch])]
                    samples = list(pool.map(
                        lambda a: self.dataset.sample(a[0], rng=a[1]), args))
                    batch = collate(samples)
                    if self.pack_s2d:
                        from ..models.dla import space_to_depth_np
                        batch["images"] = space_to_depth_np(batch["images"])
                    if self.upload_bf16:
                        import ml_dtypes
                        batch["images"] = batch["images"].astype(
                            ml_dtypes.bfloat16)
                    if self.to_device:
                        import jax
                        batch = jax.device_put(batch)
                    q.put(batch)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            for _ in range(num_steps):
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


class EvalLoader:
    """Sequential bs=1 iterator over a validation/test dataset."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            yield self.dataset[i]
