"""Host-side image augmentation pipeline.

Re-derivation of ref:lib/augmentations.py. The geometrically interesting
transforms rewrite 3D ground truth consistently with the image warp:

  * RandomMirror   — horizontal flip; mirrors the projected 3D center x and
                     reflects rotY, recomputing alpha from the back-projected
                     ray (ref:lib/augmentations.py:324-372).
  * RandomTransform — random scale + center-shift affine warp; projected 3D
                     centers move with the affine, depth divides by the scale,
                     and the full 3D center is re-derived by back-projection
                     (ref:lib/augmentations.py:164-234).

All transforms take and return (image HxWx3 float32 BGR, imobj) like the
reference so test/train pipelines compose identically.
"""

from __future__ import annotations

import math

import numpy as np

from .. import geometry as geo


class Compose:
    """Chain of transforms. `rng` (optional) is threaded through to every
    transform: a per-sample seeded generator makes augmentation
    deterministic regardless of loader threading (the prefetch pool calls
    __getitem__ concurrently — drawing from a shared/global rng there would
    make batches depend on thread interleaving)."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, imobj=None, rng=None):
        for t in self.transforms:
            img, imobj = t(img, imobj, rng=rng)
        return img, imobj


class ConvertToFloat:
    def __call__(self, image, imobj=None, rng=None):
        return image.astype(np.float32), imobj


class Normalize:
    """x/255, subtract imagenet mean, divide std (ref:lib/augmentations.py:44-57)."""

    def __init__(self, mean, stds):
        self.mean = np.array(mean, dtype=np.float32)
        self.stds = np.array(stds, dtype=np.float32)

    def __call__(self, image, imobj=None, rng=None):
        image = image.astype(np.float32) / 255.0
        reps = image.shape[2] // self.mean.shape[0]
        image -= np.tile(self.mean, reps)
        image /= np.tile(self.stds, reps)
        return image, imobj


class Padding:
    """Zero-pad bottom/right to the crop size (ref:lib/augmentations.py:135-160)."""

    def __init__(self, size):
        self.size = size

    def __call__(self, image, imobj=None, rng=None):
        h, w = image.shape[:2]
        padded = np.zeros((self.size[0], self.size[1], image.shape[2]),
                          dtype=image.dtype)
        padded[:min(h, self.size[0]), :min(w, self.size[1])] = \
            image[:self.size[0], :self.size[1]]
        if imobj is not None:
            imobj.scale_factor = 1.0
        return padded, imobj


class RandomMirror:
    def __init__(self, mirror_prob, rng=None):
        self.mirror_prob = mirror_prob
        self.rng = rng if rng is not None else np.random

    def __call__(self, image, imobj, rng=None):
        rng = rng if rng is not None else self.rng
        if rng.random() > self.mirror_prob:
            return image, imobj
        image = np.ascontiguousarray(image[:, ::-1, :])
        W = image.shape[1]
        for gt in imobj.gts:
            if "bbox_full" in gt:
                gt.bbox_full[0] = W - gt.bbox_full[0] - gt.bbox_full[2]
            if "bbox_3d" in gt:
                gt.bbox_3d[0] = W - gt.bbox_3d[0] - 1
                rotY = gt.bbox_3d[10]
                rotY = (-math.pi - rotY) if rotY < 0 else (math.pi - rotY)
                rotY = float(geo.snap_to_pi(rotY))
                cx2d, cy2d, cz2d = gt.bbox_3d[0], gt.bbox_3d[1], gt.bbox_3d[2]
                coord3d = imobj.p2_inv @ np.array([cx2d * cz2d, cy2d * cz2d, cz2d, 1.0])
                alpha = float(geo.convert_rot_to_alpha(rotY, coord3d[2], coord3d[0]))
                gt.bbox_3d[10] = rotY
                gt.bbox_3d[6] = alpha
        return image, imobj


def _affine_scale_about(cx, cy, scale):
    """2x3 affine for uniform scale about (cx, cy) — equivalent to
    cv2.getRotationMatrix2D(center, 0, scale)."""
    return np.array([[scale, 0.0, (1 - scale) * cx],
                     [0.0, scale, (1 - scale) * cy]], dtype=np.float64)


class RandomTransform:
    """Random scale + shift warp to the crop size (ref:lib/augmentations.py:164-234)."""

    def __init__(self, distort_prob=0.7, shift=0.1, scale=0.4,
                 dst_h=384, dst_w=1280, rng=None):
        self.distort_prob = distort_prob
        self.shift = shift
        self.scale = scale
        self.dst = (dst_w, dst_h)
        self.rng = rng if rng is not None else np.random

    def __call__(self, im, imobj=None, rng=None):
        rng = rng if rng is not None else self.rng
        if rng.random() < self.distort_prob:
            scale = float(np.clip(rng.standard_normal() * self.scale,
                                  -self.scale, self.scale) + 1)
            cx = im.shape[1] * (0.5 + float(np.clip(
                rng.standard_normal() * self.shift,
                -2 * self.shift, 2 * self.shift)))
            cy = im.shape[0] * (0.5 + float(np.clip(
                rng.standard_normal() * self.shift,
                -2 * self.shift, 2 * self.shift)))
            aug = True
        else:
            scale, cx, cy, aug = 1.0, im.shape[1] * 0.5, im.shape[0] * 0.5, False

        mat = _affine_scale_about(cx, cy, scale)
        import cv2
        if im.shape[2] <= 4:
            im = cv2.warpAffine(im, mat, self.dst)
        else:
            # cv2 caps channels at 4: warp 3-channel groups (video_det stacks)
            im = np.concatenate(
                [cv2.warpAffine(im[:, :, i:i + 3], mat, self.dst)
                 for i in range(0, im.shape[2], 3)], axis=2)

        if imobj is not None:
            imobj.scale_factor = scale
            if "gts" in imobj and aug:
                for gt in imobj.gts:
                    if "bbox_full" in gt:
                        gt.bbox_full[2:4] *= scale
                        gt.bbox_full[0:2] = mat @ np.array(
                            [gt.bbox_full[0], gt.bbox_full[1], 1.0])
                    if "bbox_3d" in gt:
                        cxy = mat @ np.array([gt.bbox_3d[0], gt.bbox_3d[1], 1.0])
                        cz2d = gt.bbox_3d[2] / scale
                        gt.bbox_3d[0:3] = [cxy[0], cxy[1], cz2d]
                        c3d = imobj.p2_inv @ np.array(
                            [cxy[0] * cz2d, cxy[1] * cz2d, cz2d, 1.0])
                        gt.center_3d = [c3d[0], c3d[1], c3d[2]]
                        gt.bbox_3d[7:10] = [c3d[0], c3d[1], c3d[2]]
                        gt.bbox_3d[10] = float(geo.convert_alpha_to_rot(
                            gt.bbox_3d[6], c3d[2], c3d[0]))
        return im, imobj


class PhotometricDistort:
    """HSV/contrast/brightness jitter (ref:lib/augmentations.py:236-430).

    Disabled in all reference configs (distort_prob = -1); provided for
    capability parity.
    """

    def __init__(self, distort_prob, rng=None):
        self.p = distort_prob
        self.rng = rng if rng is not None else np.random

    def __call__(self, image, imobj=None, rng=None):
        import cv2
        rng = rng if rng is not None else self.rng
        image = image.copy()
        if rng.random() <= self.p:  # brightness
            image += rng.uniform(-32, 32)
        if rng.random() <= self.p:  # contrast
            image *= rng.uniform(0.5, 1.5)
        hsv = cv2.cvtColor(np.clip(image, 0, 255), cv2.COLOR_BGR2HSV)
        if rng.random() <= self.p:  # saturation
            hsv[:, :, 1] *= rng.uniform(0.5, 1.5)
        if rng.random() <= self.p:  # hue
            hsv[:, :, 0] = (hsv[:, :, 0] + rng.uniform(-18, 18)) % 360.0
        image = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
        if rng.random() <= self.p:  # contrast (second chance)
            image *= rng.uniform(0.5, 1.5)
        return image, imobj


class Augmentation:
    """Train pipeline (ref:lib/augmentations.py:433-469)."""

    def __init__(self, conf, rng=None):
        steps = [ConvertToFloat()]
        if conf.distort_prob > 0:
            steps.append(PhotometricDistort(conf.distort_prob, rng))
        steps += [
            RandomMirror(conf.mirror_prob, rng),
            RandomTransform(conf.trans_prob, conf.shift, conf.scale_trans,
                            dst_h=conf.crop_size[0], dst_w=conf.crop_size[1], rng=rng),
            Normalize(conf.image_means, conf.image_stds),
        ]
        self.augment = Compose(steps)

    def __call__(self, img, imobj, rng=None):
        """rng: optional per-sample np.random.Generator — the loader passes
        one seeded by (loader seed, draw, slot) so batches are reproducible
        under threaded prefetch."""
        return self.augment(img, imobj, rng=rng)


class Preprocess:
    """Eval pipeline: pad + normalize (ref:lib/augmentations.py:472-492)."""

    def __init__(self, size, mean, stds):
        self.preprocess = Compose([ConvertToFloat(), Padding(size),
                                   Normalize(mean, stds)])

    def __call__(self, img, imobj=None, rng=None):
        # deterministic — rng accepted for a uniform transform interface
        return self.preprocess(img, imobj)
