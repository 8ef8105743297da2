"""Host-side evaluation metrics: PSNR / SSIM (MATLAB-faithful) and NIQE.

Behavioral spec: /root/reference/mmedited/core/evaluation/metrics.py:181-318
(psnr, ssim) and :340-532 (niqe). Images are uint8-range ([0, 255]) HWC
arrays; ``convert_to='y'`` converts BGR→Y (BT.601) before scoring;
``crop_border`` trims each edge.

These run on host (numpy/cv2) — metric evaluation is not device work.
"""

from __future__ import annotations

import functools
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is expected in this image
    cv2 = None

from ciaosr_tpu.core.color import bgr2ycbcr


def _reorder(img: np.ndarray, input_order: str) -> np.ndarray:
    if input_order not in ("HWC", "CHW"):
        raise ValueError(f"Wrong input_order {input_order}")
    if img.ndim == 2:
        return img[..., None]
    if input_order == "CHW":
        return img.transpose(1, 2, 0)
    return img


def _to_y(img: np.ndarray) -> np.ndarray:
    return bgr2ycbcr(img.astype(np.float32) / 255.0, y_only=True) * 255.0


def psnr(img1: np.ndarray, img2: np.ndarray, crop_border: int = 0,
         input_order: str = "HWC", convert_to: str | None = None) -> float:
    """PSNR on [0,255]-range images; 20·log10(255/√MSE)."""
    assert img1.shape == img2.shape, f"shapes differ: {img1.shape} vs {img2.shape}"
    img1 = _reorder(img1, input_order).astype(np.float32)
    img2 = _reorder(img2, input_order).astype(np.float32)
    if isinstance(convert_to, str) and convert_to.lower() == "y":
        img1, img2 = _to_y(img1), _to_y(img2)
    elif convert_to is not None:
        raise ValueError("convert_to must be 'y' or None")
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    if cv2 is not None:
        k = cv2.getGaussianKernel(size, sigma)
    else:
        x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
        k = np.exp(-(x ** 2) / (2 * sigma ** 2))[:, None]
        k /= k.sum()
    return np.outer(k, k.T)


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM: 11×11 σ=1.5 Gaussian window, MATLAB constants,
    valid-region crop [5:-5] (metrics.py:229-261)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window()

    if cv2 is not None:
        def filt(x):
            return cv2.filter2D(x, -1, window)[5:-5, 5:-5]
    else:  # pragma: no cover
        from scipy.signal import correlate2d

        def filt(x):
            return correlate2d(x, window, mode="valid")

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 ** 2) - mu1_sq
    sigma2_sq = filt(img2 ** 2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return float(ssim_map.mean())


def ssim(img1: np.ndarray, img2: np.ndarray, crop_border: int = 0,
         input_order: str = "HWC", convert_to: str | None = None) -> float:
    """Mean per-channel SSIM with the MATLAB-faithful protocol."""
    assert img1.shape == img2.shape, f"shapes differ: {img1.shape} vs {img2.shape}"
    img1 = _reorder(img1, input_order)
    img2 = _reorder(img2, input_order)
    if isinstance(convert_to, str) and convert_to.lower() == "y":
        img1 = _to_y(img1.astype(np.float32))[..., None]
        img2 = _to_y(img2.astype(np.float32))[..., None]
    elif convert_to is not None:
        raise ValueError("convert_to must be 'y' or None")
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    return float(np.mean([_ssim_single(img1[..., i], img2[..., i])
                          for i in range(img1.shape[2])]))


# ---------------------------------------------------------------------------
# NIQE (no-reference). Needs pristine MVG parameters fitted offline — a
# fitted-constant table (36-dim MVG mean/covariance + 7x7 Gaussian window),
# vendored at core/data/niqe_pris_params.npz via tools/convert_niqe_params.py
# from the reference blob (mmedited/core/evaluation/niqe_pris_params.npz,
# reference metrics.py:13-20). Resolution order: explicit path arg >
# CIAOSR_NIQE_PARAMS env > vendored default.
# ---------------------------------------------------------------------------

_VENDORED_NIQE_PARAMS = os.path.join(os.path.dirname(__file__), "data",
                                     "niqe_pris_params.npz")


def _load_niqe_params(path: str | None = None):
    path = (path or os.environ.get("CIAOSR_NIQE_PARAMS")
            or _VENDORED_NIQE_PARAMS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"NIQE pristine parameters not found at {path}. Regenerate the "
            "vendored table with tools/convert_niqe_params.py, or point "
            "CIAOSR_NIQE_PARAMS at a niqe_pris_params.npz file "
            "(mu_pris_param, cov_pris_param, gaussian_window).")
    data = np.load(path)
    return (data["mu_pris_param"], data["cov_pris_param"],
            data["gaussian_window"])


@functools.lru_cache(maxsize=1)
def _aggd_alpha_grid():
    """Candidate shape parameters on the standard MATLAB-niqe grid
    ([0.2, 10] step 1e-3) with the generalized-Gaussian moment ratio
    rho(a) = Γ(2/a)² / (Γ(1/a)·Γ(3/a)) each maps to.  Fitting inverts
    rho by nearest-table-entry lookup; cached — it never changes."""
    from scipy.special import gamma as G
    alphas = np.arange(0.2, 10.001, 0.001)
    inv = 1.0 / alphas
    return alphas, G(2 * inv) ** 2 / (G(inv) * G(3 * inv))


def _fit_aggd(x: np.ndarray):
    """Moment-match an asymmetric generalized Gaussian to the samples.

    Returns (alpha, beta_left, beta_right) — the shape and per-side
    scales NIQE uses as features.  Same estimator family as MATLAB
    niqe/BRISQUE (behavioral spec: reference metrics.py:340-380)."""
    from scipy.special import gamma as G
    x = np.ravel(x)
    neg, pos = x[x < 0], x[x > 0]
    s_left = np.sqrt(np.mean(neg ** 2)) if neg.size else 0.0
    s_right = np.sqrt(np.mean(pos ** 2)) if pos.size else 0.0
    # asymmetry-corrected moment ratio E|x|²/E x² → invert rho(alpha)
    asym = s_left / s_right if s_right > 0 else np.inf
    ratio = np.mean(np.abs(x)) ** 2 / np.mean(x ** 2)
    target = ratio * (asym ** 3 + 1) * (asym + 1) / (asym ** 2 + 1) ** 2
    alphas, rho = _aggd_alpha_grid()
    alpha = alphas[np.argmin((rho - target) ** 2)]
    side_scale = np.sqrt(G(1 / alpha) / G(3 / alpha))
    return alpha, s_left * side_scale, s_right * side_scale


# neighbor directions for the paired-product features: horizontal,
# vertical, and the two diagonals
_NIQE_SHIFTS = ((0, 1), (1, 0), (1, 1), (1, -1))


def _compute_niqe_feature(mscn: np.ndarray) -> list:
    """The 18 per-block NIQE features: AGGD fit of the MSCN coefficients
    themselves (alpha, mean scale) plus, for each of the four neighbor
    products, (alpha, asymmetry mean, beta_l, beta_r)."""
    from scipy.special import gamma as G
    alpha, b_l, b_r = _fit_aggd(mscn)
    feat = [alpha, (b_l + b_r) / 2]
    for shift in _NIQE_SHIFTS:
        alpha, b_l, b_r = _fit_aggd(mscn * np.roll(mscn, shift, axis=(0, 1)))
        feat += [alpha, (b_r - b_l) * (G(2 / alpha) / G(1 / alpha)),
                 b_l, b_r]
    return feat


def niqe_core(img: np.ndarray, mu_pris, cov_pris, gaussian_window,
              block_size_h: int = 96, block_size_w: int = 96) -> float:
    """NIQE over a grayscale [0,255] image — two scales, MATLAB-bicubic
    half-downsample between scales (metrics.py:400-512)."""
    from ciaosr_tpu.core.resize import imresize_np

    img = img.astype(np.float64)
    h, w = img.shape
    num_block_h = h // block_size_h
    num_block_w = w // block_size_w
    img = img[: num_block_h * block_size_h, : num_block_w * block_size_w]

    distparam = []
    for scale in (1, 2):
        if cv2 is not None:
            mu = cv2.filter2D(img, -1, gaussian_window,
                              borderType=cv2.BORDER_REPLICATE)
            sigma = np.sqrt(np.abs(
                cv2.filter2D(img ** 2, -1, gaussian_window,
                             borderType=cv2.BORDER_REPLICATE) - mu ** 2))
        else:  # pragma: no cover
            from scipy.ndimage import correlate
            mu = correlate(img, gaussian_window, mode="nearest")
            sigma = np.sqrt(np.abs(
                correlate(img ** 2, gaussian_window, mode="nearest") - mu ** 2))
        img_norm = (img - mu) / (sigma + 1)

        feats = []
        # block COUNT stays fixed across scales; only the slice size
        # halves (reference metrics.py:448-456 — the half-size image has
        # the same number of 48-px blocks as the full-size has 96-px)
        for idx_h in range(num_block_h):
            for idx_w in range(num_block_w):
                block = img_norm[
                    idx_h * block_size_h // scale:(idx_h + 1) * block_size_h // scale,
                    idx_w * block_size_w // scale:(idx_w + 1) * block_size_w // scale]
                feats.append(_compute_niqe_feature(block))
        distparam.append(np.array(feats))
        if scale == 1:
            img = imresize_np(img / 255.0, scale=0.5) * 255.0
            img = img.astype(np.float64)

    distparam = np.concatenate(distparam, axis=1)
    mu_distparam = np.nanmean(distparam, axis=0)
    distparam_no_nan = distparam[~np.isnan(distparam).any(axis=1)]
    cov_distparam = np.cov(distparam_no_nan, rowvar=False)
    invcov_param = np.linalg.pinv((cov_pris + cov_distparam) / 2)
    # the official file stores mu as (1, 36); accept either layout
    diff = np.ravel(mu_pris) - mu_distparam
    return float(np.sqrt(diff @ invcov_param @ diff))


def niqe(img: np.ndarray, crop_border: int = 0, input_order: str = "HWC",
         convert_to: str = "y", params_path: str | None = None) -> float:
    """NIQE entry matching the reference protocol (metrics.py:460-532)."""
    mu_pris, cov_pris, gaussian_window = _load_niqe_params(params_path)
    img = _reorder(np.squeeze(img), input_order if img.ndim == 3 else "HWC")
    if img.ndim == 3 and img.shape[2] == 3:
        if convert_to.lower() == "y":
            img = _to_y(img.astype(np.float32))
        elif convert_to.lower() == "gray":
            if cv2 is None:  # pragma: no cover
                raise RuntimeError("cv2 required for gray conversion")
            img = cv2.cvtColor(img.astype(np.float32) / 255.0,
                               cv2.COLOR_BGR2GRAY) * 255.0
    else:
        img = np.squeeze(img)
    img = np.round(img)
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return niqe_core(img, mu_pris, cov_pris, gaussian_window)


# ---------------------------------------------------------------------------
# Matting metrics (reference metrics.py:25-151). Part of the reference's
# metric surface (inherited from mmediting's evaluation module); kept for
# API completeness — no shipped config consumes them.
# ---------------------------------------------------------------------------

def _check_matting_inputs(alpha, trimap, pred_alpha):
    if alpha.ndim != 2 or trimap.ndim != 2 or pred_alpha.ndim != 2:
        raise ValueError(
            "alpha, trimap and pred_alpha must all be 2-D; got "
            f"{alpha.shape}, {trimap.shape}, {pred_alpha.shape}")
    if not ((pred_alpha[trimap == 0] == 0).all()
            and (pred_alpha[trimap == 255] == 255).all()):
        raise ValueError("pred_alpha should be masked by trimap before "
                         "evaluation")


def sad(alpha: np.ndarray, trimap: np.ndarray,
        pred_alpha: np.ndarray) -> float:
    """Sum of absolute differences, /1000 (reference metrics.py:25-37)."""
    _check_matting_inputs(alpha, trimap, pred_alpha)
    diff = np.abs(pred_alpha.astype(np.float64) / 255
                  - alpha.astype(np.float64) / 255)
    return float(diff.sum() / 1000)


def matting_mse(alpha: np.ndarray, trimap: np.ndarray,
                pred_alpha: np.ndarray) -> float:
    """MSE over the unknown (trimap==128) region (metrics.py:39-55)."""
    _check_matting_inputs(alpha, trimap, pred_alpha)
    weight_sum = int((trimap == 128).sum())
    if weight_sum == 0:
        return 0.0
    diff = (pred_alpha.astype(np.float64) / 255
            - alpha.astype(np.float64) / 255)
    return float((diff ** 2).sum() / weight_sum)


def _gauss_gradient(img: np.ndarray, sigma: float) -> np.ndarray:
    """Gaussian-derivative gradient magnitude (the reference imports
    mmedit's gauss_gradient; same construction: separable G(x)·G'(y)
    kernels, L2-normalized, replicate-padded filter2D, magnitude)."""
    epsilon = 1e-2
    half = int(np.ceil(
        sigma * np.sqrt(-2 * np.log(np.sqrt(2 * np.pi) * sigma * epsilon))))
    size = 2 * half + 1
    x = np.arange(size, dtype=np.float64) - half
    g = np.exp(-x ** 2 / (2 * sigma ** 2)) / (sigma * np.sqrt(2 * np.pi))
    dg = -x * g / sigma ** 2
    kx = g[:, None] * dg[None, :]          # d/dx (columns)
    kx /= np.sqrt((kx ** 2).sum())
    ky = kx.T
    gx = cv2.filter2D(img.astype(np.float64), -1, kx,
                      borderType=cv2.BORDER_REPLICATE)
    gy = cv2.filter2D(img.astype(np.float64), -1, ky,
                      borderType=cv2.BORDER_REPLICATE)
    return np.sqrt(gx ** 2 + gy ** 2)


def gradient_error(alpha: np.ndarray, trimap: np.ndarray,
                   pred_alpha: np.ndarray, sigma: float = 1.4) -> float:
    """Gradient error over the unknown region, /1000
    (reference metrics.py:57-90)."""
    _check_matting_inputs(alpha, trimap, pred_alpha)
    alpha = alpha.astype(np.float64)
    pred_alpha = pred_alpha.astype(np.float64)
    alpha_n = np.zeros_like(alpha)
    pred_n = np.zeros_like(pred_alpha)
    cv2.normalize(alpha, alpha_n, 1.0, 0.0, cv2.NORM_MINMAX)
    cv2.normalize(pred_alpha, pred_n, 1.0, 0.0, cv2.NORM_MINMAX)
    a_grad = _gauss_gradient(alpha_n, sigma).astype(np.float32)
    p_grad = _gauss_gradient(pred_n, sigma).astype(np.float32)
    loss = ((a_grad - p_grad) ** 2 * (trimap == 128)).sum()
    return float(loss / 1000)


def connectivity(alpha: np.ndarray, trimap: np.ndarray,
                 pred_alpha: np.ndarray, step: float = 0.1) -> float:
    """Connectivity error (reference metrics.py:92-151): per threshold,
    the largest 4-connected component of the GT∩pred binarization defines
    a round-down map; φ-differences ≥0.15 are penalized over the unknown
    region, /1000."""
    _check_matting_inputs(alpha, trimap, pred_alpha)
    alpha = alpha.astype(np.float32) / 255
    pred_alpha = pred_alpha.astype(np.float32) / 255
    thresh_steps = np.arange(0, 1 + step, step)
    round_down_map = -np.ones_like(alpha)
    for i in range(1, len(thresh_steps)):
        inter = ((alpha >= thresh_steps[i])
                 & (pred_alpha >= thresh_steps[i])).astype(np.uint8)
        _, labels, stats, _ = cv2.connectedComponentsWithStats(
            inter, connectivity=4)
        sizes = stats[1:, -1]
        omega = np.zeros_like(alpha)
        if len(sizes) != 0:
            omega[labels == int(np.argmax(sizes)) + 1] = 1
        mask = (round_down_map == -1) & (omega == 0)
        round_down_map[mask] = thresh_steps[i - 1]
    round_down_map[round_down_map == -1] = 1
    a_diff = alpha - round_down_map
    p_diff = pred_alpha - round_down_map
    a_phi = 1 - a_diff * (a_diff >= 0.15)
    p_phi = 1 - p_diff * (p_diff >= 0.15)
    return float(np.abs(a_phi - p_phi)[trimap == 128].sum() / 1000)


# reference name (metrics.py:39) — kept as an alias; `matting_mse` is the
# primary to avoid clashing with pixel-MSE in user code
mse = matting_mse
