"""KITTI dataset parsing and the image database (imdb).

Re-derivation of the reference's data layer (ref:lib/imdb_util.py:317-560,
ref:lib/dataloader.py:682-922): calibration/label parsing, imdb build with a
pickle cache, and a Dataset facade that produces per-image training dicts.
"""

from __future__ import annotations

import logging
import os
import pickle
import re
from glob import glob
from typing import List, Optional

import numpy as np

from .. import geometry as geo


class AttrDict(dict):
    """Minimal attribute-style dict (replacement for easydict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


_FLOAT = r"[-+]?\d*\.\d+|[-+]?\d+"


def read_kitti_cal(calfile: str) -> np.ndarray:
    """Parse the P2 camera projection matrix into a padded 4x4
    (ref:lib/imdb_util.py:317-355)."""
    p2 = None
    with open(calfile, "r") as f:
        for line in f:
            if not line.startswith("P2:"):
                continue
            vals = [float(v) for v in line.split()[1:]]
            if len(vals) != 12:
                continue
            p2 = np.zeros([4, 4], dtype=np.float64)
            p2[:3, :] = np.array(vals).reshape(3, 4)
            p2[3, 3] = 1.0
    if p2 is None:
        raise ValueError(f"no P2 line in {calfile}")
    return p2


def read_kitti_poses(posefile: str) -> List[np.ndarray]:
    """Parse a KITTI odometry pose file into padded 4x4 matrices
    (ref:lib/imdb_util.py:358-417 — unused by the reference's train/test
    path, kept for API completeness). Each line carries a row-major 3x4
    pose; the 4th row is [0, 0, 0, 1]."""
    poses = []
    with open(posefile, "r") as f:
        for line in f:
            vals = line.split()
            if len(vals) != 12:
                continue
            try:
                row = [float(v) for v in vals]
            except ValueError:
                continue
            p = np.zeros([4, 4], dtype=float)
            p[:3, :] = np.array(row).reshape(3, 4)
            p[3, 3] = 1.0
            poses.append(p)
    return poses


_LABEL_RE = re.compile(
    r"([a-zA-Z\-\?\_]+)" + r"\s+(%s)" % _FLOAT * 14 + r"\s*((%s)?)\s*$" % _FLOAT)


def read_kitti_label(file: str, p2: np.ndarray, use_3d_for_2d: bool = False) -> List[AttrDict]:
    """Parse a KITTI label file (ref:lib/imdb_util.py:419-560).

    Produces per-object AttrDicts with the reference's fields, notably
    `bbox_full` = [x, y, w, h] and `bbox_3d` =
    [cx2d, cy2d, cz2d, w3d, h3d, l3d, alpha, cx3d, cy3d, cz3d, rotY]
    where (cx2d, cy2d) is the projected 3D center and cy3d is re-centered to
    the box middle (the raw KITTI y is the bottom face).
    """
    gts = []
    with open(file, "r") as f:
        for line in f:
            m = _LABEL_RE.match(line.strip())
            if m is None:
                continue
            g = m.groups()
            cls = g[0]
            trunc, occ, alpha = float(g[1]), float(g[2]), float(g[3])
            x, y, x2, y2 = (float(g[i]) for i in range(4, 8))
            h3d, w3d, l3d = float(g[8]), float(g[9]), float(g[10])
            cx3d, cy3d, cz3d = float(g[11]), float(g[12]), float(g[13])
            rotY = float(g[14])

            ign = False
            cy3d -= h3d / 2  # re-center from bottom face to box center
            elevation = 1.65 - cy3d

            width = x2 - x + 1
            height = y2 - y + 1

            if use_3d_for_2d and h3d > 0 and w3d > 0 and l3d > 0:
                verts, c3d = geo.project_3d(p2, cx3d, cy3d, cz3d, w3d, h3d, l3d,
                                            rotY, return_3d=True)
                if np.any(c3d[2, :] <= 0):
                    ign = True
                else:
                    x, y = verts[:, 0].min(), verts[:, 1].min()
                    x2, y2 = verts[:, 0].max(), verts[:, 1].max()
                    width = x2 - x + 1
                    height = y2 - y + 1

            coord = p2 @ np.array([cx3d, cy3d, cz3d, 1.0])
            cx, cy, cz2d = coord[0] / coord[2], coord[1] / coord[2], coord[2]

            vis = {0: 1.0, 1: 0.66, 2: 0.33}.get(int(occ), 0.0)
            rotY = float(geo.snap_to_pi(rotY))
            alpha = float(geo.convert_rot_to_alpha(rotY, cz3d, cx3d))

            obj = AttrDict(
                elevation=elevation, cls=cls, occ=occ > 0, ign=ign,
                visibility=vis, trunc=trunc, alpha=alpha, rotY=rotY,
                bbox_full=np.array([x, y, width, height], dtype=np.float64),
                bbox_3d=[cx, cy, cz2d, w3d, h3d, l3d, alpha, cx3d, cy3d, cz3d, rotY],
                center_3d=[cx3d, cy3d, cz3d],
            )
            gts.append(obj)
    return gts


_PHASE_DIR = {"train": "training", "val_train": "training",
              "validation": "validation", "test": "testing"}


def build_imdb(conf, data_root: str, phase: str,
               cache_folder: Optional[str] = None) -> List[AttrDict]:
    """Scan a KITTI-layout dataset into an in-memory imdb, with pickle cache
    (ref:lib/dataloader.py:740-878)."""
    fname = ("train" if phase == "val_train" else phase) + "_imdb.pkl"
    if cache_folder and os.path.exists(os.path.join(cache_folder, fname)):
        logging.info("Preloading imdb.")
        with open(os.path.join(cache_folder, fname), "rb") as f:
            return pickle.load(f)

    imdb = []
    for dbind, db in enumerate(getattr(conf, f"datasets_{phase}")):
        base = os.path.join(data_root, db["name"], _PHASE_DIR.get(phase, phase))
        im_folder = os.path.join(base, "image_2")
        cal_folder = os.path.join(base, "calib")
        ann_folder = os.path.join(base, "label_2") if phase == "train" else None

        for impath in sorted(glob(os.path.join(im_folder, "*" + db["im_ext"]))):
            iid = os.path.splitext(os.path.basename(impath))[0]
            if "_" in iid:
                continue  # auxiliary frame (video_det <id>_NN), not an image id
            p2 = read_kitti_cal(os.path.join(cal_folder, iid + ".txt"))
            gts = None
            if ann_folder is not None:
                gts = read_kitti_label(os.path.join(ann_folder, iid + ".txt"),
                                       p2, conf.use_3d_for_2d)
            import cv2
            im = cv2.imread(impath)
            obj = AttrDict(id=iid, gts=gts, p2=p2, p2_inv=np.linalg.inv(p2),
                           path=impath, imH=im.shape[0], imW=im.shape[1],
                           dbname=db["name"], scale=db["scale"], dbind=dbind)
            imdb.append(obj)

    if cache_folder:
        os.makedirs(cache_folder, exist_ok=True)
        with open(os.path.join(cache_folder, fname), "wb") as f:
            pickle.dump(imdb, f)
    return imdb


class Kitti3DDataset:
    """Dataset facade: imdb + anchors/stats + per-item sample production.

    Mirrors ref:lib/dataloader.py:682-1012 (`Kitti_Dataset_torch`) without
    torch: items are numpy dicts; batching/prefetch lives in `loader.py`.
    """

    def __init__(self, conf, data_root: str, phase: str = "train",
                 cache_folder: Optional[str] = None, imdb=None):
        from ..anchors import generate_anchors, compute_bbox_stats, locate_anchors
        from .augment import Augmentation, Preprocess

        self.conf = conf
        self.phase = phase
        self.imdb = imdb if imdb is not None else build_imdb(
            conf, data_root, "train" if phase == "val_train" else phase, cache_folder)

        if conf.anchors is None and phase == "train":
            generate_anchors(conf, self.imdb, cache_folder)
            compute_bbox_stats(conf, self.imdb, cache_folder)

        if phase == "train":
            self.transform = Augmentation(conf)
            self._rois = locate_anchors(conf.anchors, conf.feat_size, conf.feat_stride)
        else:
            self.transform = Preprocess(conf.test_scale, conf.image_means, conf.image_stds)
            self._rois = None

        # eval-phase decoded-sample cache (byte-capped, insertion order):
        # repeated evals of the same split (trainer eval-every-N-epochs,
        # watch_eval) skip PNG decode + resize + normalize (~55 ms/image on
        # a 1-core host — the eval loop is host-bound there, PERF.md).
        # Eval samples are deterministic (Preprocess has no randomness), so
        # caching is exact. conf.eval_image_cache_mb = 0 disables.
        self._cache_cap = (int(getattr(conf, "eval_image_cache_mb", 0))
                           * (1 << 20) if phase != "train" else 0)
        self._cache: dict = {}
        self._cache_bytes = 0

    def __len__(self):
        return len(self.imdb)

    @property
    def rois(self):
        return self._rois

    def read_image(self, index: int) -> np.ndarray:
        """Read the image; with conf.video_det, stack `video_count` previous
        frames (KITTI `<id>_NN.png` convention) as extra channel groups,
        repeating the current frame when a previous one is missing
        (ref:lib/imdb_util.py:224-266)."""
        import cv2
        path = self.imdb[index].path
        im = cv2.imread(path)
        if not getattr(self.conf, "video_det", False):
            return im
        base, ext = os.path.splitext(path)
        frames = [im]
        for k in range(1, self.conf.video_count + 1):
            prev = f"{base}_{k:02d}{ext}"
            pim = cv2.imread(prev) if os.path.exists(prev) else None
            frames.append(pim if pim is not None else im)
        return np.concatenate(frames, axis=2)

    def __getitem__(self, index: int):
        return self.sample(index)

    def sample(self, index: int, rng=None):
        """Produce one sample: image [H,W,3] float32 (normalized, RGB) plus,
        for training, the precomputed target dict
        (ref:lib/dataloader.py:924-982).

        `rng`: optional per-sample np.random.Generator for the train-phase
        augmentations. The loader passes one seeded by (seed, draw, slot) so
        batches are bit-reproducible no matter how the prefetch threads
        interleave; without it the transforms fall back to the global
        np.random (reference behavior, non-reproducible under threading)."""
        import copy
        from ..targets import build_targets

        if self._cache_cap and index in self._cache:
            return self._cache[index]

        im = self.read_image(index)
        imobj = copy.deepcopy(self.imdb[index])
        im, imobj = self.transform(im, imobj, rng=rng)
        # BGR -> RGB per 3-channel group (ref:lib/dataloader.py:942-947)
        groups = [im[:, :, i:i + 3][:, :, ::-1] for i in range(0, im.shape[2], 3)]
        im = np.ascontiguousarray(np.concatenate(groups, axis=2))

        sample = {"input": im.astype(np.float32),
                  "meta": {"p2": imobj.p2, "p2_inv": imobj.p2_inv,
                           "imH": imobj.imH, "imW": imobj.imW,
                           "scale_factor": imobj.get("scale_factor", 1.0),
                           "id": imobj.id}}
        if self.phase == "train":
            if self.conf.pre_compute_target:
                sample["target"] = build_targets(self.conf, imobj,
                                                 rois=self._rois)
            else:
                # on-device target path: ship only padded gts with the batch
                # (targets are assigned inside the jitted train step —
                # targets.build_gt_arrays / ops/targets_device.py)
                from ..targets import build_gt_arrays
                sample["gt"] = build_gt_arrays(self.conf, imobj)
        elif self._cache_cap and self._cache_bytes < self._cache_cap:
            self._cache[index] = sample
            self._cache_bytes += sample["input"].nbytes
        return sample
