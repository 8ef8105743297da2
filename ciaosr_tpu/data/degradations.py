"""Real-ESRGAN-style degradation pipeline ops (host-side numpy/cv2).

Behavioral spec: /root/reference/mmedited/datasets/pipelines/
random_degradations.py — the live subset used by the 002 configs
(configs/002_real_gan_...py:100-246): RandomBlur (iso/aniso/generalized/
plateau/sinc kernel zoo, per-call parameter sampling, prob gate),
RandomResize (up/down/keep with random interp), RandomNoise
(gaussian/poisson with gray-noise prob), RandomJPEGCompression,
RandomScaleResize1 (resize lq relative to GT size), DegradationsWithShuffle
(grouped shuffle), UnsharpMasking. Kernel math follows the public
Real-ESRGAN formulations the reference delegates to (mmedit blur_kernels).
"""

from __future__ import annotations

import numpy as np

from ciaosr_tpu.config.registry import PIPELINES

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# ----------------------------------------------------------- kernel zoo --

def _mesh(ks: int):
    ax = np.arange(ks) - (ks - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], -1)  # (ks, ks, 2)


def _sigma_matrix(sigma_x, sigma_y, theta):
    d = np.array([[sigma_x ** 2, 0], [0, sigma_y ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def gaussian_kernel(ks, sigma_x, sigma_y=None, theta=0.0, isotropic=True):
    if isotropic:
        sigma_y, theta = sigma_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh(ks)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", xy, inv, xy))
    return (k / k.sum()).astype(np.float32)


def generalized_gaussian_kernel(ks, sigma_x, sigma_y=None, theta=0.0,
                                beta=1.0, isotropic=True):
    if isotropic:
        sigma_y, theta = sigma_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh(ks)
    q = np.einsum("hwi,ij,hwj->hw", xy, inv, xy)
    k = np.exp(-0.5 * np.power(q, beta))
    return (k / k.sum()).astype(np.float32)


def plateau_kernel(ks, sigma_x, sigma_y=None, theta=0.0, beta=1.0,
                   isotropic=True):
    if isotropic:
        sigma_y, theta = sigma_x, 0.0
    inv = np.linalg.inv(_sigma_matrix(sigma_x, sigma_y, theta))
    xy = _mesh(ks)
    q = np.einsum("hwi,ij,hwj->hw", xy, inv, xy)
    k = 1.0 / (np.power(q, beta) + 1.0)
    return (k / k.sum()).astype(np.float32)


def sinc_kernel(ks, omega):
    """Circular low-pass (jinc) filter with cutoff omega."""
    from scipy.special import j1
    ax = np.arange(ks) - (ks - 1) / 2.0
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx ** 2 + yy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = omega * j1(omega * r) / (2 * np.pi * r)
    k[(ks - 1) // 2, (ks - 1) // 2] = omega ** 2 / (4 * np.pi)
    return (k / k.sum()).astype(np.float32)


def random_mixed_kernel(rng, kernel_list, kernel_prob, ks, sigma_x, sigma_y,
                        rotate, beta_gau, beta_pla, omega):
    ktype = rng.choice(kernel_list, p=kernel_prob)
    if ktype == "iso":
        return gaussian_kernel(ks, sigma_x, isotropic=True)
    if ktype == "aniso":
        return gaussian_kernel(ks, sigma_x, sigma_y, rotate, isotropic=False)
    if ktype == "generalized_iso":
        return generalized_gaussian_kernel(ks, sigma_x, beta=beta_gau,
                                           isotropic=True)
    if ktype == "generalized_aniso":
        return generalized_gaussian_kernel(ks, sigma_x, sigma_y, rotate,
                                           beta=beta_gau, isotropic=False)
    if ktype == "plateau_iso":
        return plateau_kernel(ks, sigma_x, beta=beta_pla, isotropic=True)
    if ktype == "plateau_aniso":
        return plateau_kernel(ks, sigma_x, sigma_y, rotate, beta=beta_pla,
                              isotropic=False)
    if ktype == "sinc":
        return sinc_kernel(ks, omega)
    raise ValueError(f"unknown kernel type {ktype}")


def _rng(results):
    return results.get("_rng", np.random.default_rng())


def _as_list(x):
    return ([x], True) if isinstance(x, np.ndarray) else (list(x), False)


# ------------------------------------------------------------ pipelines --

@PIPELINES.register(name="RandomBlur")
class RandomBlur:
    """Kernel-zoo blur with per-frame parameter walk and prob gate
    (random_degradations.py:25-139)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def _kernels(self, rng, n):
        p = self.params
        ks = int(rng.choice(p["kernel_size"]))
        sx_rng = p.get("sigma_x", [0, 0])
        sy_rng = p.get("sigma_y", [0, 0])
        rot_rng = p.get("rotate_angle", [-np.pi, np.pi])
        bg_rng = p.get("beta_gaussian", [0.5, 4])
        bp_rng = p.get("beta_plateau", [1, 2])
        om_rng = p.get("omega")
        if om_rng is None:  # Real-ESRGAN default cutoff rule
            om_rng = [np.pi / 3, np.pi] if ks < 13 else [np.pi / 5, np.pi]
        sx = rng.uniform(*sx_rng)
        sy = rng.uniform(*sy_rng)
        rot = rng.uniform(*rot_rng)
        bg = rng.uniform(*bg_rng)
        bp = rng.uniform(*bp_rng)
        om = rng.uniform(*om_rng)
        kernels = []
        for _ in range(n):
            kernels.append(random_mixed_kernel(
                rng, p["kernel_list"], p["kernel_prob"], ks, sx, sy, rot,
                bg, bp, om))
            # parameter walk (video path) only when *_step provided
            if any(p.get(k, 0) for k in ("sigma_x_step", "sigma_y_step",
                                         "rotate_angle_step",
                                         "beta_gaussian_step",
                                         "beta_plateau_step", "omega_step")):
                sx = np.clip(sx + rng.uniform(-p.get("sigma_x_step", 0),
                                              p.get("sigma_x_step", 0)),
                             *sx_rng)
                sy = np.clip(sy + rng.uniform(-p.get("sigma_y_step", 0),
                                              p.get("sigma_y_step", 0)),
                             *sy_rng)
                rot = np.clip(rot + rng.uniform(
                    -p.get("rotate_angle_step", 0),
                    p.get("rotate_angle_step", 0)), *rot_rng)
                bg = np.clip(bg + rng.uniform(-p.get("beta_gaussian_step", 0),
                                              p.get("beta_gaussian_step", 0)),
                             *bg_rng)
                bp = np.clip(bp + rng.uniform(-p.get("beta_plateau_step", 0),
                                              p.get("beta_plateau_step", 0)),
                             *bp_rng)
                om = np.clip(om + rng.uniform(-p.get("omega_step", 0),
                                              p.get("omega_step", 0)),
                             *om_rng)
        return kernels

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        for key in self.keys:
            imgs, single = _as_list(results[key])
            kernels = self._kernels(rng, len(imgs))
            out = [cv2.filter2D(img, -1, k)
                   for img, k in zip(imgs, kernels)]
            results[key] = out[0] if single else out
        return results


_CV2_INTERP = {"bilinear": 1, "bicubic": 2, "area": 3, "lanczos": 4}


@PIPELINES.register(name="RandomResize")
class RandomResize:
    """Up/down/keep resize by a random factor with random interpolation
    (mmedit RandomResize surface; configs/002_...py:137-145)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        p = self.params
        mode = rng.choice(["up", "down", "keep"], p=p["resize_mode_prob"])
        lo, hi = p["resize_scale"]
        if mode == "up":
            scale = rng.uniform(1, hi)
        elif mode == "down":
            scale = rng.uniform(lo, 1)
        else:
            scale = 1.0
        interp = _CV2_INTERP[rng.choice(p["resize_opt"],
                                        p=p.get("resize_prob"))]
        ts = p.get("target_size")
        for key in self.keys:
            imgs, single = _as_list(results[key])
            out = []
            for img in imgs:
                h, w = img.shape[:2]
                size = ts or (int(h * scale), int(w * scale))
                out.append(cv2.resize(img, (size[1], size[0]),
                                      interpolation=interp))
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RandomNoise")
class RandomNoise:
    """Gaussian / Poisson noise with gray-noise probability (mmedit
    RandomNoise surface; configs/002_...py:146-156)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def _gaussian(self, rng, img):
        p = self.params
        sigma = rng.uniform(*p["gaussian_sigma"]) / 255.0
        if rng.uniform() < p.get("gaussian_gray_noise_prob", 0):
            noise = rng.normal(0, sigma, img.shape[:2] + (1,))
        else:
            noise = rng.normal(0, sigma, img.shape)
        return (img + noise).astype(np.float32)

    def _poisson(self, rng, img):
        p = self.params
        scale = rng.uniform(*p["poisson_scale"])
        gray = rng.uniform() < p.get("poisson_gray_noise_prob", 0)
        base = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2GRAY)[
            ..., None] if gray else img
        vals = 10 ** np.ceil(np.log10(len(np.unique(
            (np.clip(base, 0, 1) * 255).round().astype(np.uint8)))))
        noisy = rng.poisson(np.clip(base, 0, 1) * vals) / vals
        noise = (noisy - np.clip(base, 0, 1)) * scale
        return (img + noise).astype(np.float32)

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        p = self.params
        ntype = rng.choice(p["noise_type"], p=p.get("noise_prob"))
        for key in self.keys:
            imgs, single = _as_list(results[key])
            fn = self._gaussian if ntype == "gaussian" else self._poisson
            out = [fn(rng, img) for img in imgs]
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RandomJPEGCompression")
class RandomJPEGCompression:
    """cv2 encode/decode at uniform quality
    (random_degradations.py:141-193)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        quality = int(rng.integers(*self.params["quality"]))
        enc = [int(cv2.IMWRITE_JPEG_QUALITY), quality]
        for key in self.keys:
            imgs, single = _as_list(results[key])
            out = []
            for img in imgs:
                u8 = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
                _, buf = cv2.imencode(".jpg", u8[..., ::-1], enc)
                dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
                out.append(dec.astype(np.float32) / 255.0)
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RandomScaleResize1")
class RandomScaleResize:
    """Resize lq to int(gt_size / U(scale_min, scale_max)) with random
    interpolation (random_degradations.py:1156-1225)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        p = self.params
        h, w = results["gt"].shape[:2]
        interp = _CV2_INTERP[rng.choice(p["resize_opt"],
                                        p=p.get("resize_prob"))]
        ts = p.get("target_size")
        if ts is None:
            factor = 1.0 / rng.uniform(p["scale_min"], p["scale_max"])
            h_out, w_out = h * factor, w * factor
            if p.get("is_size_even", False):
                h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
            ts = (int(h_out), int(w_out))
        imgs, single = _as_list(results["lq"])
        out = [cv2.resize(img, ts[::-1], interpolation=interp)
               for img in imgs]
        results["lq"] = out[0] if single else out
        return results


@PIPELINES.register(name="DegradationsWithShuffle")
@PIPELINES.register(name="DegradationsWithShuffle1")
class DegradationsWithShuffle:
    """Apply a list of degradations in shuffled order; list entries that
    are themselves lists keep their internal order
    (random_degradations.py:1238-1303)."""

    def __init__(self, degradations, keys, shuffle_idx=None):
        self.keys = keys
        self.shuffle_idx = shuffle_idx
        self.degradations = [self._build(d) for d in degradations]

    def _build(self, cfg):
        from ciaosr_tpu.config.registry import build_from_cfg
        if isinstance(cfg, (list, tuple)):
            return [self._build(c) for c in cfg]
        cfg = dict(cfg)
        cfg.setdefault("keys", self.keys)
        return build_from_cfg(cfg, PIPELINES)

    def __call__(self, results):
        rng = _rng(results)
        if self.shuffle_idx is None:
            order = rng.permutation(len(self.degradations))
        else:
            order = list(range(len(self.degradations)))
            sub = [order[i] for i in self.shuffle_idx]
            rng.shuffle(sub)
            for i, v in zip(self.shuffle_idx, sub):
                order[i] = v
        for i in order:
            deg = self.degradations[int(i)]
            if isinstance(deg, list):
                for d in deg:
                    results = d(results)
            else:
                results = deg(results)
        return results


@PIPELINES.register(name="UnsharpMasking")
class UnsharpMasking:
    """USM sharpening producing '{key}_unsharp' (mmedit UnsharpMasking:
    gaussian residual, threshold mask, weighted add)."""

    def __init__(self, keys, kernel_size=51, sigma=0, weight=0.5,
                 threshold=10):
        self.keys = keys
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.weight = weight
        self.threshold = threshold
        k = cv2.getGaussianKernel(kernel_size, sigma)
        self.kernel = (k @ k.T).astype(np.float64)

    def _usm(self, img):
        blur = cv2.filter2D(img, -1, self.kernel)
        residual = img - blur
        mask = (np.abs(residual) * 255 > self.threshold).astype(np.float32)
        soft_mask = cv2.filter2D(mask, -1, self.kernel)
        sharp = np.clip(img + self.weight * residual, 0, 1)
        return (soft_mask * sharp + (1 - soft_mask) * img).astype(np.float32)

    def __call__(self, results):
        for key in self.keys:
            imgs, single = _as_list(results[key])
            out = [self._usm(img) for img in imgs]
            results[f"{key}_unsharp"] = out[0] if single else out
        return results


# ---------------------------------------------------------------------------
# Extended noise/resize zoo (random_degradations.py:342-519, 809-1044).
# No shipped config consumes these; kept for surface completeness. The
# PyAV/video chain (UVSRDegradation :196, RandomVideoCompression :275,
# OldRandomNoise :520 — asserts `av` at init) is a declared non-goal
# (SURVEY.md §7), and NorResize (:1045) is unrunnable as written
# (undefined `img`/`self.patch_size`) — neither is rebuilt.
# ---------------------------------------------------------------------------


def _nonblind_concat(img, level):
    return np.concatenate(
        [img, np.broadcast_to(np.float32(level),
                              (img.shape[0], img.shape[1], 1))], axis=2)


@PIPELINES.register(name="RandomGaussianNoise")
class RandomGaussianNoise:
    """Per-call uniform sigma Gaussian noise; `nonblind_noise` appends the
    sigma as an extra channel (random_degradations.py:342-384)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def _apply(self, rng, imgs, level):
        out = []
        for img in imgs:
            noisy = (img + rng.normal(0, 1, img.shape) * level
                     ).astype(np.float32)
            out.append(_nonblind_concat(noisy, level)
                       if self.params.get("nonblind_noise") else noisy)
        return out

    def _level(self, rng):
        lo, hi = self.params["gaussian_sigma"]
        return rng.uniform(lo, hi) / 255.0

    def __call__(self, results):
        rng = _rng(results)
        for key in self.keys:
            # fresh level per key (the reference calls its per-key apply
            # method once per key, random_degradations.py:376-378)
            level = self._level(rng)
            imgs, single = _as_list(results[key])
            out = self._apply(rng, imgs, level)
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RandomGaussianNoisewithPro")
class RandomGaussianNoisewithPro(RandomGaussianNoise):
    """Variant drawing the level from `gaussian_beta` with prob `prob`,
    else `gaussian_sigma` (random_degradations.py:387-432)."""

    def _level(self, rng):
        key = ("gaussian_beta" if rng.uniform() < self.params["prob"]
               else "gaussian_sigma")
        lo, hi = self.params[key]
        return rng.uniform(lo, hi) / 255.0


@PIPELINES.register(name="RandomClipGaussianNoise")
class RandomClipGaussianNoise(RandomGaussianNoise):
    """Gaussian noise with the noisy image clipped to [0, 1]
    (random_degradations.py:435-477)."""

    def _apply(self, rng, imgs, level):
        out = []
        for img in imgs:
            noisy = np.clip(img + rng.normal(0, 1, img.shape) * level,
                            0, 1).astype(np.float32)
            out.append(_nonblind_concat(noisy, level)
                       if self.params.get("nonblind_noise") else noisy)
        return out


@PIPELINES.register(name="RandomLevel")
class RandomLevel:
    """Append a uniform noise-level plane as an extra channel
    (random_degradations.py:480-517)."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        for key in self.keys:
            # fresh level per key (reference _apply_level per key)
            level = rng.uniform(*self.params["sigma"]) / 255.0
            imgs, single = _as_list(results[key])
            out = [_nonblind_concat(img, level) for img in imgs]
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RealRandomNoise")
class RealRandomNoise:
    """Shuffled gaussian/poisson/speckle/JPEG noise chain with per-frame
    level walks (random_degradations.py:809-963). gaussian and jpeg
    always run; poisson/speckle are gated by `other_prob`; order is
    shuffled with prob `shuffle_prob`."""

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def _gaussian(self, rng, imgs):
        p = self.params
        lo, hi = p["gaussian_sigma"]
        sigma = rng.uniform(lo, hi) / 255.0
        step = p.get("gaussian_sigma_step", 0)
        gray = rng.uniform() < p["gaussian_gray_noise_prob"]
        out = []
        for img in imgs:
            shape = img.shape[:2] + (1,) if gray else img.shape
            out.append((img + rng.normal(0, 1, shape) * sigma
                        ).astype(np.float32))
            sigma = np.clip(sigma + rng.uniform(-step, step) / 255.0,
                            lo / 255.0, hi / 255.0)
        return out

    def _poisson(self, rng, imgs):
        p = self.params
        lo, hi = p["poisson_scale"]
        scale = rng.uniform(lo, hi)
        step = p.get("poisson_scale_step", 0)
        gray = rng.uniform() < p["poisson_gray_noise_prob"]
        out = []
        for img in imgs:
            base = cv2.cvtColor(img.astype(np.float32),
                                cv2.COLOR_RGB2GRAY)[..., None] if gray \
                else img
            base = np.clip((base * 255.0).round(), 0, 255) / 255.0
            vals = 2 ** np.ceil(np.log2(len(np.unique(base))))
            noise = rng.poisson(base * vals) / vals - base
            out.append((img + noise * scale).astype(np.float32))
            scale = np.clip(scale + rng.uniform(-step, step), lo, hi)
        return out

    def _speckle(self, rng, imgs):
        from scipy.linalg import orth
        lo, hi = self.params["speckle_level"]
        out = []
        for img in imgs:
            level = int(rng.integers(lo, hi + 1))
            img = np.clip(img, 0, 1)
            r = rng.uniform()
            if r > 0.6:
                img = img + img * rng.normal(0, level / 255.0, img.shape
                                             ).astype(np.float32)
            elif r < 0.4:
                img = img + img * rng.normal(
                    0, level / 255.0, (*img.shape[:2], 1)).astype(np.float32)
            else:
                L = hi / 255.0
                D = np.diag(rng.random(3))
                U = orth(rng.random((3, 3)))
                cov = U.T @ D @ U
                img = img + img * rng.multivariate_normal(
                    np.zeros(3), np.abs(L ** 2 * cov), img.shape[:2]
                ).astype(np.float32)
            out.append(np.clip(img, 0, 1).astype(np.float32))
        return out

    def _jpeg(self, rng, imgs):
        lo, hi = self.params["quality_range"]
        out = []
        for img in imgs:
            q = int(rng.integers(lo, hi + 1))
            u8 = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
            _, buf = cv2.imencode(".jpg", u8[..., ::-1],
                                  [int(cv2.IMWRITE_JPEG_QUALITY), q])
            dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
            out.append(dec.astype(np.float32) / 255.0)
        return out

    def _chain(self, rng, imgs):
        p = self.params
        order = list(range(len(p["noise_type"])))
        if rng.uniform() < p["shuffle_prob"]:
            order = list(rng.permutation(order))
        for i in order:
            ntype = p["noise_type"][i]
            if ntype == "gaussian":
                imgs = self._gaussian(rng, imgs)
            elif ntype == "poisson":
                if rng.uniform() < p["other_prob"]:
                    imgs = self._poisson(rng, imgs)
            elif ntype == "speckle":
                if rng.uniform() < p["other_prob"]:
                    imgs = self._speckle(rng, imgs)
            elif ntype == "jpeg":
                imgs = self._jpeg(rng, imgs)
            else:
                raise NotImplementedError(
                    f'"noise_type" [{ntype}] is not implemented.')
        return imgs

    def __call__(self, results):
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        for key in self.keys:
            imgs, single = _as_list(results[key])
            out = self._chain(rng, imgs)
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="RealRandomResize")
class RealRandomResize:
    """Down-up (or up-down) resize round trip at a random scale and
    interpolation, back to the original size
    (random_degradations.py:964-1043)."""

    _INTERP = dict(bilinear=cv2.INTER_LINEAR, bicubic=cv2.INTER_CUBIC,
                   area=cv2.INTER_AREA, lanczos=cv2.INTER_LANCZOS4)

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys

    def __call__(self, results):
        rng = _rng(results)
        p = self.params
        if rng.uniform() > p.get("prob", 1):
            return results
        opt = str(rng.choice(p["resize_opt"], p=p.get("resize_prob"))).lower()
        if opt not in self._INTERP:
            raise NotImplementedError(f"resize_opt [{opt}] is not "
                                      "implemented")
        interp = self._INTERP[opt]
        mode = rng.choice(["up", "down", "keep"], p=p["resize_mode_prob"])
        lo, hi = p["resize_scale"]
        scale = (rng.uniform(1, hi) if mode == "up"
                 else rng.uniform(lo, 1) if mode == "down" else 1.0)
        for key in self.keys:
            imgs, single = _as_list(results[key])
            h, w = imgs[0].shape[:2]
            h_out, w_out = h * scale, w * scale
            if p.get("is_size_even", False):
                h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
            tgt = (int(w_out), int(h_out))
            out = [cv2.resize(cv2.resize(img, tgt, interpolation=interp),
                              (w, h), interpolation=interp) for img in imgs]
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="UVSRDegradation")
class UVSRDegradation:
    """Video → frame-fused LR degradation (random_degradations.py:196-267):
    5-frame reflection-padded temporal mean, stride-s temporal decimation
    (keep-first), and MATLAB-bicubic 1/s spatial downsample per frame.

    Frames are numpy (T, H, W, C); the reference's torch tensors map 1:1.
    """

    def __init__(self, params, keys):
        if params.get("fuse_frames", 5) != 5:
            raise ValueError("fuse_frames must be 5 (reference :229)")
        self.params = params
        self.keys = keys

    def _apply(self, imgs):
        imgs = np.asarray(imgs, np.float32)
        t = imgs.shape[0]
        if t <= 5:
            raise ValueError("need more than fuse_frames frames")
        # reflection pad [1,0] front / [-2,-3] back, then 5-wide means
        padded = np.concatenate([imgs[1:2], imgs[0:1], imgs,
                                 imgs[-2:-1], imgs[-3:-2]], axis=0)
        fused = np.stack([padded[i - 2:i + 3].mean(axis=0)
                          for i in range(2, len(padded) - 2)], axis=0)
        if self.params.get("down", True):
            sf = self.params["scale"]
            if sf[1] != sf[2]:
                raise ValueError("spatial scales must match (:254)")
            fused = fused[::sf[0]]
            from ciaosr_tpu.core.resize import imresize_np
            fused = np.stack([imresize_np(f, scale=1.0 / sf[1])
                              for f in fused], axis=0)
        return fused

    def __call__(self, results):
        for key in self.keys:
            results[key] = self._apply(results[key])
        return results


def _require_av():
    try:
        import av  # noqa: F401
        return av
    except ImportError as e:  # pragma: no cover - av absent in CI
        raise ImportError(
            "PyAV is required for video compression degradations "
            "(reference random_degradations.py:288 `assert has_av`); "
            "install `av` or drop the video-compression entries") from e


@PIPELINES.register(name="RandomVideoCompression")
class RandomVideoCompression:
    """mp4 encode/decode round trip at a random codec/bitrate
    (random_degradations.py:275-339). Requires PyAV, like the reference."""

    def __init__(self, params, keys):
        self.av = _require_av()
        self.params = params
        self.keys = keys

    def _compress(self, rng, imgs):  # pragma: no cover - needs av
        import io
        av = self.av
        codec = str(rng.choice(self.params["codec"],
                               p=self.params.get("codec_prob")))
        lo, hi = self.params["bitrate"]
        bitrate = int(rng.integers(lo, hi + 1))
        buf = io.BytesIO()
        with av.open(buf, "w", "mp4") as container:
            stream = container.add_stream(codec, rate=1)
            stream.height, stream.width = imgs[0].shape[:2]
            stream.pix_fmt = "yuv420p"
            stream.bit_rate = bitrate
            for img in imgs:
                u8 = (np.clip(img, 0, 1) * 255.0).round().astype(np.uint8)
                frame = av.VideoFrame.from_ndarray(u8, format="rgb24")
                frame.pict_type = "NONE"
                for packet in stream.encode(frame):
                    container.mux(packet)
            for packet in stream.encode():
                container.mux(packet)
        out = []
        with av.open(buf, "r", "mp4") as container:
            if container.streams.video:
                for frame in container.decode(video=0):
                    out.append(frame.to_rgb().to_ndarray().astype(
                        np.float32) / 255.0)
        return out

    def __call__(self, results):  # pragma: no cover - needs av
        rng = _rng(results)
        if rng.uniform() > self.params.get("prob", 1):
            return results
        for key in self.keys:
            imgs, single = _as_list(results[key])
            out = self._compress(rng, imgs)
            results[key] = out[0] if single else out
        return results


@PIPELINES.register(name="OldRandomNoise")
class OldRandomNoise(RealRandomNoise):
    """KAIR-style paired (lq, gt) video degradation chain
    (random_degradations.py:520-815): 16 shuffled slots of blur / resize
    round-trip / gaussian / poisson / speckle / JPEG / video compression /
    random shift, applied to `gt` to synthesize `lq` while tracking a
    clean copy.

    Defects in the reference NOT replicated (SURVEY.md §8 discipline):
    its `_add_blur`/`_add_resize` reference their output lists outside the
    probability gate (UnboundLocalError when the gate misses) and
    `_add_resize` returns the last frame instead of the lists — here the
    gates no-op correctly and lists flow through. Video-compression slots
    require PyAV (reference asserts at __init__; we only require it when
    the params actually configure a codec).
    """

    def __init__(self, params, keys):
        super().__init__(params, keys)
        if "codec" in params:
            self.av = _require_av()

    def _blur_pair(self, rng, imgs, hqs):
        if rng.random() >= self.params.get("blur_prob", 0.5):
            return imgs, hqs
        from scipy.ndimage import convolve
        sf = int(rng.choice(self.params.get("sf", [2, 3, 4])))
        wd = 2.0 + 0.2 * sf
        ks = 2 * int(rng.integers(2, 12)) + 3
        k = gaussian_kernel(ks, wd * rng.random() + 1e-6)[..., None]
        blur = lambda im: convolve(im, k, mode="mirror").astype(np.float32)
        return [blur(i) for i in imgs], [blur(h) for h in hqs]

    def _resize_pair(self, rng, imgs, hqs):
        interp = int(rng.choice(self.params.get("inter_method", [1, 2, 3])))
        r = rng.random()
        sf = (rng.uniform(1, 2) if r > 0.75
              else rng.uniform(0.5, 1) if r < 0.25 else 1.0)
        if sf == 1.0:
            return imgs, hqs

        def rt(im):
            h0, w0 = im.shape[:2]
            w1, h1 = int(sf * w0) // 2 * 2, int(sf * h0) // 2 * 2
            im = cv2.resize(im, (w1, h1), interpolation=interp)
            im = cv2.resize(im, (w0, h0), interpolation=interp)
            return np.clip(im, 0.0, 1.0).astype(np.float32)

        return [rt(i) for i in imgs], [rt(h) for h in hqs]

    def _shift_pair(self, rng, imgs, hqs):
        if rng.random() >= self.params.get("shift_prob", 0.5):
            return imgs, hqs
        dy = 2 * int(rng.integers(0, 5))   # even: video-codec constraint
        dx = 2 * int(rng.integers(0, 5))
        return ([i[dy:, dx:] for i in imgs], [h[dy:, dx:] for h in hqs])

    def __call__(self, results):
        rng = _rng(results)
        gt, single = _as_list(results["gt"])
        imgs = [np.asarray(g, np.float32).copy() for g in gt]
        hqs = [np.asarray(g, np.float32).copy() for g in gt]
        n_deg = 16
        order = (list(rng.permutation(n_deg))
                 if rng.random() < self.params.get("shuffle_prob", 0.5)
                 else list(range(n_deg)))
        for i in order:
            if i == 0:
                imgs, hqs = self._blur_pair(rng, imgs, hqs)
            elif i in (1, 8):
                imgs, hqs = self._resize_pair(rng, imgs, hqs)
            elif i in (2, 9):
                imgs = self._gaussian(rng, imgs)
            elif i in (3, 10):
                imgs = self._poisson(rng, imgs)
            elif i in (4, 11):
                imgs = self._speckle(rng, imgs)
            elif i in (6, 14):
                imgs = self._jpeg(rng, imgs)
            elif i in (7, 15) and "codec" in self.params:
                imgs = RandomVideoCompression._compress(self, rng, imgs)
            elif i == 13:
                imgs, hqs = self._shift_pair(rng, imgs, hqs)
        results["lq"] = imgs[0] if single else imgs
        results["gt"] = hqs[0] if single else hqs
        return results


@PIPELINES.register(name="NorResize")
class NorResize:
    """Fixed-interpolation resize to a mode/scale-derived (or given)
    target size (random_degradations.py:1045-1155).

    The reference version is broken as written — it unconditionally
    references an undefined ``img`` in a leftover crop block (:1088-1091)
    and would NameError on any call; no config consumes it. This is the
    intended behavior with that block removed (defect ledger, SURVEY.md
    §8 discipline).
    """

    _INTERP = dict(bilinear=cv2.INTER_LINEAR, bicubic=cv2.INTER_CUBIC,
                   area=cv2.INTER_AREA, lanczos=cv2.INTER_LANCZOS4)

    def __init__(self, params, keys):
        self.params = params
        self.keys = keys
        if params["resize_opt"] not in self._INTERP:
            raise NotImplementedError(
                f"resize_opt [{params['resize_opt']}] is not implemented")

    def __call__(self, results):
        rng = _rng(results)
        p = self.params
        interp = self._INTERP[p["resize_opt"]]
        target_size = p.get("target_size")
        resize_step = p.get("resize_step", 0) if target_size is None else 0
        for key in self.keys:
            imgs, single = _as_list(results[key])
            h, w = imgs[0].shape[:2]
            if target_size is None:
                mode = rng.choice(["up", "down", "keep"],
                                  p=p["resize_mode_prob"])
                lo, hi = p["resize_scale"]
                scale = (rng.uniform(1, hi) if mode == "up"
                         else rng.uniform(lo, 1) if mode == "down" else 1.0)
                if p.get("patch_size"):
                    h = w = p["patch_size"]
                h_out, w_out = h * scale, w * scale
                if p.get("is_size_even", False):
                    h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
                tgt = (int(h_out), int(w_out))
            else:
                tgt = tuple(target_size)
            out = []
            for img in imgs:
                out.append(cv2.resize(img, tgt[::-1], interpolation=interp))
                if resize_step:
                    lo, hi = p["resize_scale"]
                    scale = np.clip(
                        scale + rng.uniform(-resize_step, resize_step),
                        lo, hi)
                    h_out, w_out = h * scale, w * scale
                    if p.get("is_size_even", False):
                        h_out, w_out = 2 * (h_out // 2), 2 * (w_out // 2)
                    tgt = (int(h_out), int(w_out))
            results[key] = out[0] if single else out
        return results
