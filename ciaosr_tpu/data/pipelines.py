"""Host-side data pipeline ops (numpy), mmedit-pipeline-compatible surface.

Each op is a callable ``op(results: dict) -> dict``. Keys follow the
reference protocol: 'lq', 'gt', 'coord', 'cell', 'scale', '*_path'
(/root/reference/configs/001_..._rdn_...py:56-120 pipeline op list; local
variants at /root/reference/mmedited/datasets/pipelines/).

Images are HWC float32/uint8 numpy arrays (we never adopt CHW — the device
side is NHWC). Randomness: ops draw from ``results['_rng']`` (a
numpy Generator) when present, else a module-level default — unlike the
reference's in-place op state (SURVEY.md §8.10), ops here are stateless.
"""

from __future__ import annotations

import os

import numpy as np

from ciaosr_tpu.config.registry import PIPELINES
from ciaosr_tpu.core.coords import make_coord_np, make_cell_np
from ciaosr_tpu.core.resize import imresize_np

_DEFAULT_RNG = np.random.default_rng()


def _rng(results):
    return results.get("_rng", _DEFAULT_RNG)


@PIPELINES.register(name="LoadImageFromFile")
class LoadImageFromFile:
    """Read an image from ``results[f'{key}_path']`` into ``results[key]``
    as HWC uint8 in the requested channel order (default rgb)."""

    def __init__(self, io_backend="disk", key="gt", flag="color",
                 channel_order="rgb", **kwargs):
        self.key = key
        self.channel_order = channel_order

    def __call__(self, results):
        path = results[f"{self.key}_path"]
        try:
            import cv2
            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise IOError(f"failed to read {path}")
            if self.channel_order == "rgb":
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        except ImportError:  # pragma: no cover
            from PIL import Image
            img = np.asarray(Image.open(path).convert("RGB"))
            if self.channel_order == "bgr":
                img = img[..., ::-1]
        results[self.key] = img
        results[f"{self.key}_ori_shape"] = img.shape
        return results


@PIPELINES.register(name="RescaleToZeroOne")
class RescaleToZeroOne:
    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for k in self.keys:
            results[k] = results[k].astype(np.float32) / 255.0
        return results


@PIPELINES.register(name="RandomDownSampling")
class RandomDownSampling:
    """Train-time LQ synthesis: uniform scale ∈ [min, max); crop an HR patch
    of round(patch·s) and bicubic-downsample to the LR patch; or (eval) the
    whole image mod-cropped to an integer LR grid.

    backend: 'matlab' (MATLAB-exact, default — the variant the authors kept
    in-tree, random_bicubic_sampling.py:11-97), 'pillow', or 'cv2'.
    """

    def __init__(self, scale_min=1.0, scale_max=4.0, patch_size=None,
                 interpolation="bicubic", backend="matlab"):
        assert scale_max >= scale_min
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.patch_size = patch_size
        self.interpolation = interpolation
        self.backend = backend

    def _resize(self, img, size, scale):
        if self.backend == "matlab":
            return imresize_np(img, size=size, scale=1.0 / scale)
        if self.backend == "pillow":  # pragma: no cover - optional
            from PIL import Image
            pil = Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8))
            pil = pil.resize((size[1], size[0]), Image.BICUBIC)
            return np.asarray(pil).astype(np.float32) / 255.0
        import cv2
        return cv2.resize(img, (size[1], size[0]),
                          interpolation=cv2.INTER_CUBIC)

    def __call__(self, results):
        img = results["gt"]
        rng = _rng(results)
        if self.scale_max == self.scale_min:
            scale = self.scale_min
        else:
            scale = rng.uniform(self.scale_min, self.scale_max)
        if self.patch_size is None:
            h_lr = int(img.shape[0] / scale + 1e-9)
            w_lr = int(img.shape[1] / scale + 1e-9)
            gt = img[: round(h_lr * scale), : round(w_lr * scale)]
            lq = self._resize(gt, (h_lr, w_lr), scale)
        else:
            w_lr = self.patch_size
            w_hr = round(w_lr * scale)
            x0 = int(rng.integers(0, img.shape[0] - w_hr + 1))
            y0 = int(rng.integers(0, img.shape[1] - w_hr + 1))
            gt = img[x0:x0 + w_hr, y0:y0 + w_hr]
            lq = self._resize(gt, (w_lr, w_lr), scale)
        results["gt"] = gt
        results["lq"] = lq
        results["scale"] = scale
        return results


@PIPELINES.register(name="Flip")
class Flip:
    def __init__(self, keys, flip_ratio=0.5, direction="horizontal"):
        assert direction in ("horizontal", "vertical")
        self.keys = keys
        self.flip_ratio = flip_ratio
        self.axis = 1 if direction == "horizontal" else 0

    def __call__(self, results):
        if _rng(results).random() < self.flip_ratio:
            for k in self.keys:
                results[k] = np.ascontiguousarray(
                    np.flip(results[k], axis=self.axis))
        return results


@PIPELINES.register(name="RandomTransposeHW")
class RandomTransposeHW:
    def __init__(self, keys, transpose_ratio=0.5):
        self.keys = keys
        self.transpose_ratio = transpose_ratio

    def __call__(self, results):
        if _rng(results).random() < self.transpose_ratio:
            for k in self.keys:
                results[k] = np.ascontiguousarray(
                    results[k].transpose(1, 0, 2))
        return results


@PIPELINES.register(name="ImageToTensor")
class ImageToTensor:
    """Layout marker in the reference (HWC→CHW); our device layout is NHWC,
    so this only asserts float32 HWC. Kept for config-surface parity."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for k in self.keys:
            arr = results[k]
            if arr.ndim == 2:
                arr = arr[..., None]
            results[k] = np.ascontiguousarray(arr.astype(np.float32))
        return results


@PIPELINES.register(name="GenerateCoordinateAndCell")
class GenerateCoordinateAndCell:
    """Coordinate/cell generation + optional query subsampling.

    Training (sample_quantity set): flatten gt to (N,3) and take
    ``sample_quantity`` queries — a random permutation (is_shuffle=True) or
    a contiguous run from a random start (is_shuffle=False — required for
    image-shaped GAN/perceptual losses; generate_assistant.py:72-90).
    Eval (scale set, no sampling): full grid for the target size.
    """

    def __init__(self, sample_quantity=None, scale=None, target_size=None,
                 is_shuffle=True):
        self.sample_quantity = sample_quantity
        self.scale = scale
        self.target_size = target_size
        self.is_shuffle = is_shuffle

    def __call__(self, results):
        if self.target_size is not None:
            target = tuple(self.target_size)
        elif "gt" in results and results["gt"].ndim == 3:
            target = results["gt"].shape[:2]
        elif self.scale is not None and "lq" in results:
            target = (round(results["lq"].shape[0] * self.scale),
                      round(results["lq"].shape[1] * self.scale))
        else:
            raise KeyError("cannot infer target size for coordinates")

        coord = make_coord_np(target)
        cell = make_cell_np(target)

        if self.sample_quantity is not None and "gt" in results:
            gt_flat = results["gt"].reshape(-1, results["gt"].shape[-1])
            n = gt_flat.shape[0]
            rng = _rng(results)
            if self.is_shuffle:
                sel = rng.permutation(n)[: self.sample_quantity]
            else:
                start = int(rng.integers(0, n - self.sample_quantity + 1))
                sel = np.arange(start, start + self.sample_quantity)
            coord = coord[sel]
            cell = cell[sel]
            results["gt"] = np.ascontiguousarray(gt_flat[sel])
            if "gt_unsharp" in results:
                unsharp = results["gt_unsharp"].reshape(
                    -1, results["gt_unsharp"].shape[-1])
                results["gt_unsharp"] = np.ascontiguousarray(unsharp[sel])

        results["coord"] = coord
        results["cell"] = cell
        results["target_size"] = target
        return results


@PIPELINES.register(name="RandomBicubicSampling")
class RandomBicubicSampling(RandomDownSampling):
    """MATLAB-exact random bicubic LQ synthesis — the reference's in-tree
    drop-in for RandomDownSampling (random_bicubic_sampling.py:11-97);
    identical to our RandomDownSampling with the 'matlab' backend."""

    def __init__(self, scale_min=1.0, scale_max=4.0, patch_size=None,
                 interpolation="bicubic", **kwargs):
        super().__init__(scale_min=scale_min, scale_max=scale_max,
                         patch_size=patch_size, interpolation=interpolation,
                         backend="matlab")


@PIPELINES.register(name="GenerateCoordinateAndCell1")
class GenerateCoordinateAndCell1(GenerateCoordinateAndCell):
    """Reference local variant (generate_assistant.py:8-102): same math,
    plus gt_unsharp subsampling — already handled by the base op."""


@PIPELINES.register(name="GenerateCoordinateAndCell2")
class GenerateCoordinateAndCell2:
    """Super-sampling-eval variant — exact reference semantics
    (generate_assistant.py:105-192), shim-parity-tested:

    * gt present: gt is ALWAYS flattened to (H·W, C) row-major; the target
      grid is (round(H/scale·scale1), round(W/scale·scale1)) — the
      reference's two-step arithmetic, kept verbatim because round() on
      the intermediate differs from round(H·scale1/scale) at float edges.
    * sampling (sample_quantity set + gt): indices drawn WITHOUT
      replacement over the TARGET grid length index both coord and the
      flattened gt — faithful to the reference, including its quirk that
      gt and the target grid have different lengths when scale1 != scale
      (IndexError when the target is larger, misaligned pairing when
      smaller; only scale1 == scale is self-consistent).
    * no gt: requires target_size (len >= 2), full grid.

    Pure: target size goes to results['target_size'] instead of mutating
    self (reference defect SURVEY.md §8.10). RNG comes from the pipeline
    results' generator rather than the legacy np.random global.
    """

    def __init__(self, sample_quantity=None, scale=None, scale1=None,
                 target_size=None):
        self.sample_quantity = sample_quantity
        self.scale = scale
        self.scale1 = scale1
        self.target_size = target_size

    def __call__(self, results):
        if "gt" in results:
            gt = results["gt"]
            h, w = gt.shape[:2]
            results["gt"] = np.ascontiguousarray(
                gt.reshape(-1, gt.shape[-1]))
            h_lr, w_lr = h / self.scale, w / self.scale
            target = (round(h_lr * self.scale1), round(w_lr * self.scale1))
        else:
            assert self.target_size is not None and \
                len(self.target_size) >= 2
            target = tuple(self.target_size[-2:])

        coord = make_coord_np(target)
        if self.sample_quantity is not None and "gt" in results:
            rng = _rng(results)
            sel = rng.choice(len(coord), self.sample_quantity,
                             replace=False)
            coord = coord[sel]
            results["gt"] = np.ascontiguousarray(results["gt"][sel])

        cell = np.ones_like(coord)
        cell[:, 0] *= 2 / target[-2]
        cell[:, 1] *= 2 / target[-1]
        results["coord"] = coord
        results["cell"] = cell
        results["target_size"] = target
        return results


@PIPELINES.register(name="RandomCrop")
class RandomCrop:
    """GT-only random crop (crop.py:49-96)."""

    def __init__(self, patch_size, keys=("gt",)):
        self.patch_size = patch_size
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        for k in self.keys:
            img = results[k]
            h, w = img.shape[:2]
            p = self.patch_size
            y0 = int(rng.integers(0, max(h - p, 0) + 1))
            x0 = int(rng.integers(0, max(w - p, 0) + 1))
            results[k] = img[y0:y0 + p, x0:x0 + p]
        return results


@PIPELINES.register(name="ContinuousPairedRandomCrop")
class ContinuousPairedRandomCrop:
    """Paired crop at a continuous (float) scale (crop.py:99-171): crop an
    lq patch and the gt patch at int-scaled offsets/sizes."""

    def __init__(self, lq_patch_size, keys=("lq", "gt")):
        self.lq_patch_size = lq_patch_size
        self.keys = keys

    def __call__(self, results):
        lq, gt = results["lq"], results["gt"]
        scale = gt.shape[0] / lq.shape[0]
        p = self.lq_patch_size
        rng = _rng(results)
        y0 = int(rng.integers(0, lq.shape[0] - p + 1))
        x0 = int(rng.integers(0, lq.shape[1] - p + 1))
        gp = round(p * scale)
        results["lq"] = lq[y0:y0 + p, x0:x0 + p]
        yg, xg = round(y0 * scale), round(x0 * scale)
        results["gt"] = gt[yg:yg + gp, xg:xg + gp]
        return results


@PIPELINES.register(name="Collect")
class Collect:
    def __init__(self, keys, meta_keys=()):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        out = {k: results[k] for k in self.keys}
        out["meta"] = {k: results.get(k) for k in self.meta_keys}
        for extra in ("scale", "target_size"):
            if extra in results:
                out["meta"].setdefault(extra, results[extra])
        return out


@PIPELINES.register(name="Crop")
class Crop:
    """Random (or center) crop of given keys (mmedit Crop surface)."""

    def __init__(self, keys, crop_size, random_crop=True, **kwargs):
        self.keys = keys
        self.crop_size = crop_size  # (h, w)
        self.random_crop = random_crop

    def __call__(self, results):
        ch, cw = self.crop_size
        rng = _rng(results)
        for k in self.keys:
            img = results[k]
            h, w = img.shape[:2]
            if self.random_crop:
                y0 = int(rng.integers(0, max(h - ch, 0) + 1))
                x0 = int(rng.integers(0, max(w - cw, 0) + 1))
            else:
                y0, x0 = max(0, (h - ch) // 2), max(0, (w - cw) // 2)
            results[k] = img[y0:y0 + ch, x0:x0 + cw]
        return results


@PIPELINES.register(name="ModCrop")
class ModCrop:
    """Crop gt to a multiple of results['scale'] (crop.py:7-45)."""

    def __init__(self, key="gt"):
        self.key = key

    def __call__(self, results):
        img = results[self.key]
        scale = int(results.get("scale", 1))
        h, w = img.shape[:2]
        results[self.key] = img[: h - h % scale, : w - w % scale]
        return results


@PIPELINES.register(name="PairedRandomCrop")
class PairedRandomCrop:
    """Paired lq/gt random crop at a fixed integer scale."""

    def __init__(self, gt_patch_size):
        self.gt_patch_size = gt_patch_size

    def __call__(self, results):
        lq, gt = results["lq"], results["gt"]
        scale = gt.shape[0] // lq.shape[0]
        lq_patch = self.gt_patch_size // scale
        rng = _rng(results)
        y0 = int(rng.integers(0, lq.shape[0] - lq_patch + 1))
        x0 = int(rng.integers(0, lq.shape[1] - lq_patch + 1))
        results["lq"] = lq[y0:y0 + lq_patch, x0:x0 + lq_patch]
        results["gt"] = gt[y0 * scale:y0 * scale + self.gt_patch_size,
                           x0 * scale:x0 * scale + self.gt_patch_size]
        return results


@PIPELINES.register(name="PairedRandomCropwScale")
class PairedRandomCropwScale:
    """Paired crop with the scale inferred (as a FLOAT) from the gt/lq size
    ratio (crop.py:174-245): lq patch fixed, gt patch = int(lq·scale),
    gt offsets = int(lq offsets · scale). Only requires equal h/w ratios."""

    def __init__(self, lq_patch_size):
        self.lq_patch_size = lq_patch_size

    def __call__(self, results):
        lq = results["lq"]
        gt = results["gt"]
        h_lq, w_lq = lq.shape[:2]
        h_gt, w_gt = gt.shape[:2]
        scale = h_gt / h_lq
        if h_gt / h_lq != w_gt / w_lq:
            raise ValueError(
                f"Scale mismatches: GT {(h_gt, w_gt)} is not {scale}x of "
                f"LQ {(h_lq, w_lq)}")
        p = self.lq_patch_size
        if h_lq < p or w_lq < p:
            raise ValueError(f"LQ {(h_lq, w_lq)} smaller than patch {p}")
        gp = int(p * scale)
        rng = _rng(results)
        y0 = int(rng.integers(0, h_lq - p + 1))
        x0 = int(rng.integers(0, w_lq - p + 1))
        results["lq"] = lq[y0:y0 + p, x0:x0 + p]
        yg, xg = int(y0 * scale), int(x0 * scale)
        results["gt"] = gt[yg:yg + gp, xg:xg + gp]
        return results


@PIPELINES.register(name="CopyValues")
class CopyValues:
    def __init__(self, src_keys, dst_keys):
        self.src_keys = src_keys
        self.dst_keys = dst_keys

    def __call__(self, results):
        for s, d in zip(self.src_keys, self.dst_keys):
            results[d] = np.copy(results[s]) \
                if isinstance(results[s], np.ndarray) else results[s]
        return results


@PIPELINES.register(name="Quantize")
class Quantize:
    """Round float [0,1] images to 8-bit levels (stay float)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for k in self.keys:
            results[k] = np.clip(
                np.round(results[k] * 255.0) / 255.0, 0.0, 1.0
            ).astype(np.float32)
        return results


class Compose:
    def __init__(self, ops):
        from ciaosr_tpu.config.registry import build_from_cfg
        self.ops = [op if callable(op) and not isinstance(op, dict)
                    else build_from_cfg(op, PIPELINES) for op in ops]

    def __call__(self, results):
        for op in self.ops:
            results = op(results)
            if results is None:
                return None
        return results
