"""Task-layer restorers: train/val/test orchestration around CiaoSRNet.

Behavioral spec: /root/reference/mmedited/models/restorers/ciaosr.py:18-257
(CiaoSR) and basic_restorer.py:17-237. The reference's dynamic-shape
``clip_test`` tiling loop and ``batched_predict`` query chunking become
static-shape XLA programs here: one compile per (tile, scale-bucket),
query chunks via lax.map (SURVEY.md §5.7).
"""

from __future__ import annotations

import logging
from fractions import Fraction
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger("ciaosr_tpu.restorers")

from ciaosr_tpu.config.registry import MODELS
from ciaosr_tpu.core.coords import make_coord_cell
from ciaosr_tpu.core.metrics import psnr, ssim
from ciaosr_tpu.core.color import tensor2img
from ciaosr_tpu.models.builder import build_generator


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


# phase-count ceiling for dense rational-scale decoding on the XLA path:
# the phase loop unrolls py·px·|shifts| branches into one XLA program, so
# pathological ratios (e.g. 449/192) must fall back to the per-query
# gather path. The fused Pallas path grids over phases instead of
# unrolling, so its ceiling is far higher (SMEM table size only).
_MAX_GRID_PHASES = 128
_MAX_PALLAS_PHASES = 4096


def _rational_pallas_ok(gen, h: int, w: int, py: int, qy: int,
                        px: int, qx: int) -> bool:
    """Host-side gate: can this rational decode ride the fused halo
    kernel? (generator opted into Pallas + geometry expressible)."""
    from ciaosr_tpu.ops.pallas.decoder_kernel import rational_halo_supported
    return (gen.use_pallas and py * px <= _MAX_PALLAS_PHASES
            and rational_halo_supported(h, w, py, qy, px, qx,
                                        gen.local_size))


def as_scale_fraction(s) -> Fraction:
    """Normalize a user-facing scale (int, float, str '7/3', Fraction) to
    an exact Fraction. Floats are snapped to the nearest small rational
    (denominator ≤ 64) when within float-literal distance, so a config's
    ``scale=2.5`` or ``scale=7/3`` (a Python float!) round-trips to 5/2
    and 7/3 instead of the exact binary expansion."""
    if isinstance(s, Fraction):
        return s
    if isinstance(s, int):
        return Fraction(s)
    if isinstance(s, str):
        return Fraction(s)
    f = Fraction(s)            # exact binary value of the float
    snap = f.limit_denominator(64)
    return snap if abs(float(snap) - float(f)) < 1e-9 else f


@MODELS.register(name="CiaoSR")
class CiaoSRRestorer:
    """Classical (bicubic-degradation) CiaoSR restorer.

    Holds the flax generator plus the normalization protocol
    (ciaosr.py:52-58: DIV2K rgb_mean/std buffers) and the eval engine.
    Parameters are external pytrees (functional style) — training state
    lives in ciaosr_tpu.train.
    """

    allowed_metrics = {"PSNR": psnr, "SSIM": ssim}
    batch_keys = ("lq", "gt", "coord", "cell")

    def __init__(self, generator: dict, rgb_mean=(0.4488, 0.4371, 0.4040),
                 rgb_std=(1.0, 1.0, 1.0), pixel_loss: dict | None = None,
                 train_cfg: Any = None, test_cfg: Any = None):
        self.generator = build_generator(generator)
        self.rgb_mean = jnp.asarray(rgb_mean, dtype=jnp.float32)
        self.rgb_std = jnp.asarray(rgb_std, dtype=jnp.float32)
        self.pixel_loss_cfg = pixel_loss
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg or {}
        self.eval_bsize = self.generator.eval_bsize
        self._jit_cache: dict = {}

    # ------------------------------------------------------------- init --
    def init_params(self, rng, lq_shape=(1, 48, 48, 3), n_queries: int = 64):
        coord = jnp.zeros((lq_shape[0], n_queries, 2), jnp.float32)
        cell = jnp.full((lq_shape[0], n_queries, 2), 0.01, jnp.float32)
        # jit the init: eager init dispatches hundreds of tiny ops (very
        # slow on high-latency device links)
        return jax.jit(self.generator.init)(
            rng, jnp.zeros(lq_shape, jnp.float32), coord, cell)

    # ---------------------------------------------------------- forward --
    def normalize(self, img: jnp.ndarray) -> jnp.ndarray:
        return (img - self.rgb_mean) / self.rgb_std

    def denormalize(self, rgb: jnp.ndarray) -> jnp.ndarray:
        return rgb * self.rgb_std + self.rgb_mean

    def train_forward(self, params, lq, gt, coord, cell):
        """Normalized L1 training objective (ciaosr.py:80-93).
        Returns (loss, pred)."""
        lq_n = self.normalize(lq)
        gt_n = (gt - self.rgb_mean) / self.rgb_std
        pred = self.generator.apply(params, lq_n, coord, cell,
                                    self.generator.use_pallas)
        loss = jnp.mean(jnp.abs(pred - gt_n))
        return loss, pred

    # ------------------------------------------------------- eval paths --
    def _predict_fn(self, h: int, w: int, q_pad: int, chunk: int):
        """Compiled full-image predictor for static (H, W, Q) shapes."""
        key = ("pred", h, w, q_pad, chunk)
        if key not in self._jit_cache:
            gen = self.generator

            @jax.jit
            def run(params, lq, coord, cell):
                lq_n = (lq - self.rgb_mean) / self.rgb_std
                feature = gen.apply(params, lq_n, gen.use_pallas,
                                    method="gen_feature")
                # CSA is a per-image map — compute ONCE, not per chunk
                nl = gen.apply(params, feature, method="nl_feature") \
                    if gen.non_local_attn else None
                n_chunks = q_pad // chunk
                coord_c = coord.reshape(coord.shape[0], n_chunks, chunk, 2)
                cell_c = cell.reshape(cell.shape[0], n_chunks, chunk, 2)

                def one(args):
                    co, ce = args  # (B, chunk, 2) each
                    return gen.apply(params, feature, lq_n, co, ce, nl,
                                     method="query_rgb")

                preds = jax.lax.map(
                    one, (coord_c.transpose(1, 0, 2, 3),
                          cell_c.transpose(1, 0, 2, 3)))
                pred = preds.transpose(1, 0, 2, 3).reshape(
                    coord.shape[0], q_pad, -1)
                pred = pred * self.rgb_std + self.rgb_mean
                return jnp.clip(pred, 0.0, 1.0)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _grid_fn(self, h: int, w: int, scale: int):
        """Compiled dense-grid predictor (integer scales — the fast path)."""
        key = ("grid", h, w, scale)
        if key not in self._jit_cache:
            gen = self.generator

            @jax.jit
            def run(params, lq):
                lq_n = (lq - self.rgb_mean) / self.rgb_std
                feature = gen.apply(params, lq_n, gen.use_pallas,
                                    method="gen_feature")
                if gen.use_pallas:
                    img = gen.apply(params, feature, lq_n, scale,
                                    method="query_rgb_grid_pallas")
                else:
                    # batched tiles multiply decoder activations by B —
                    # shrink the phase group to keep peak memory constant
                    # (B=2/pg=2 is the measured XLA sweet spot on v5e)
                    pg = 2 if lq.shape[0] <= 2 else 1
                    img = gen.apply(params, feature, lq_n, scale, pg,
                                    method="query_rgb_grid")
                img = img * self.rgb_std + self.rgb_mean
                return jnp.clip(img, 0.0, 1.0)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _grid_rational_fn(self, h: int, w: int, py: int, qy: int,
                          px: int, qx: int):
        """Compiled dense-grid predictor for rational scales py/qy × px/qx.
        Pallas generators route through the fused halo kernel
        (query_rgb_grid_rational_pallas) when the geometry is expressible
        (decoder_kernel.rational_halo_supported); otherwise the XLA dense
        path (query_rgb_grid_rational) runs — with a log line so sharded
        or perf-sensitive callers can see the fused path was skipped."""
        key = ("gridr", h, w, py, qy, px, qx)
        if key not in self._jit_cache:
            gen = self.generator
            use_pallas = _rational_pallas_ok(gen, h, w, py, qy, px, qx)
            if gen.use_pallas and not use_pallas:
                logger.warning(
                    "rational decode %d/%d x %d/%d at %dx%d: geometry not "
                    "expressible for the fused halo kernel - falling back "
                    "to the XLA dense path", py, qy, px, qx, h, w)

            @jax.jit
            def run(params, lq):
                lq_n = (lq - self.rgb_mean) / self.rgb_std
                feature = gen.apply(params, lq_n, gen.use_pallas,
                                    method="gen_feature")
                if use_pallas:
                    img = gen.apply(params, feature, lq_n, py, qy, px, qx,
                                    method="query_rgb_grid_rational_pallas")
                else:
                    pg = 2 if lq.shape[0] <= 2 else 1
                    img = gen.apply(params, feature, lq_n, py, qy, px, qx,
                                    pg, method="query_rgb_grid_rational")
                img = img * self.rgb_std + self.rgb_mean
                return jnp.clip(img, 0.0, 1.0)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def predict(self, params, lq: np.ndarray, target_shape) -> np.ndarray:
        """Full-image arbitrary-scale SR: lq (H,W,3) float32 [0,1] →
        (th, tw, 3) float32 [0,1].

        Integer-scale targets take the dense-grid path (query_rgb_grid);
        rational targets with a tractable phase count take the rational
        dense-grid path (query_rgb_grid_rational); everything else falls
        back to per-query chunked decoding (batched_predict semantics,
        eval_bsize) under one jit."""
        th, tw = target_shape
        h_, w_ = lq.shape[:2]
        if th % h_ == 0 and tw % w_ == 0 and th // h_ == tw // w_ \
                and th // h_ >= 1:
            fn = self._grid_fn(h_, w_, th // h_)
            out = fn(params, jnp.asarray(lq[None]))
            return np.asarray(out[0])
        sy, sx = Fraction(th, h_), Fraction(tw, w_)
        if sy >= 1 and sx >= 1:
            n_ph = sy.numerator * sx.numerator
            if (n_ph <= _MAX_GRID_PHASES
                    or _rational_pallas_ok(self.generator, h_, w_,
                                           sy.numerator, sy.denominator,
                                           sx.numerator, sx.denominator)):
                fn = self._grid_rational_fn(
                    h_, w_, sy.numerator, sy.denominator,
                    sx.numerator, sx.denominator)
                out = fn(params, jnp.asarray(lq[None]))
                return np.asarray(out[0])
            logger.warning(
                "rational target %dx%d from %dx%d needs %d dense phases "
                "(> %d) and is not fused-expressible - falling back to "
                "the per-query gather path (~16x slower); prefer tiled "
                "eval (test_cfg.tile) or a q-friendly target size",
                th, tw, h_, w_, n_ph, _MAX_GRID_PHASES)
        q = th * tw
        chunk = min(self.eval_bsize or q, q)
        q_pad = _ceil_to(q, chunk)
        coord, cell = make_coord_cell((th, tw))
        coord = np.asarray(coord)
        cell = np.asarray(cell)
        if q_pad > q:
            coord = np.concatenate(
                [coord, np.zeros((q_pad - q, 2), np.float32)], axis=0)
            cell = np.concatenate(
                [cell, np.full((q_pad - q, 2), 0.5, np.float32)], axis=0)
        h, w = lq.shape[:2]
        fn = self._predict_fn(h, w, q_pad, chunk)
        pred = fn(params, jnp.asarray(lq[None]), jnp.asarray(coord[None]),
                  jnp.asarray(cell[None]))
        return np.asarray(pred[0, :q]).reshape(th, tw, 3)

    def _tiled_group_fn(self, tile: int, scale: Fraction,
                        allow_pallas: bool = True, mesh=None):
        """One jitted call per tile group: dense-grid decode of the batch +
        on-device overlap-add (positions as traced args — one program for
        every group and image). allow_pallas=False keeps the XLA grid path
        (auto-partitionable under a mesh). Mosaic kernels are NOT
        auto-partitionable — with ``mesh`` the decode instead runs under
        ``jax.shard_map`` over the tile-batch axis, so each chip executes
        the fused Pallas path on its local tile shard (per-shard shapes
        are concrete inside shard_map); the tile outputs then ride ICI
        once into the replicated overlap-add, as before.
        Rational scales decode via query_rgb_grid_rational (XLA)."""
        scale = Fraction(scale)
        p, q = scale.numerator, scale.denominator
        mesh_key = None if mesh is None else (
            tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat))
        key = ("tgroup", tile, p, q, allow_pallas, mesh_key)
        if key not in self._jit_cache:
            gen = self.generator
            out_t = tile * p // q

            rational_pallas = (allow_pallas and q > 1
                               and _rational_pallas_ok(gen, tile, tile,
                                                       p, q, p, q))

            def decode(params, lq_tiles):
                lq_n = (lq_tiles - self.rgb_mean) / self.rgb_std
                feature = gen.apply(params, lq_n,
                                    gen.use_pallas and allow_pallas,
                                    method="gen_feature")
                if rational_pallas:
                    img = gen.apply(params, feature, lq_n, p, q, p, q,
                                    method="query_rgb_grid_rational_pallas")
                elif q > 1:
                    pg = 2 if lq_tiles.shape[0] <= 2 else 1
                    img = gen.apply(params, feature, lq_n, p, q, p, q, pg,
                                    method="query_rgb_grid_rational")
                elif gen.use_pallas and allow_pallas:
                    img = gen.apply(params, feature, lq_n, p,
                                    method="query_rgb_grid_pallas")
                else:
                    pg = 2 if lq_tiles.shape[0] <= 2 else 1
                    img = gen.apply(params, feature, lq_n, p, pg,
                                    method="query_rgb_grid")
                # NO clip here: the reference accumulates raw tile outputs
                # and clamps once AFTER overlap-averaging (ciaosr.py:
                # 160-163 denorm+clamp runs on clip_test's E/W quotient);
                # clipping per tile would disagree wherever a prediction
                # leaves [0,1] under one tile but not its neighbor
                return img * self.rgb_std + self.rgb_mean

            if mesh is not None:
                from jax.sharding import PartitionSpec as P
                axis = mesh.axis_names[0]
                # check_vma=False: pallas_call out_shapes carry no vma
                # annotation, and the body is embarrassingly parallel
                # over tiles (no collectives to validate)
                decode_fn = jax.shard_map(decode, mesh=mesh,
                                          in_specs=(P(), P(axis)),
                                          out_specs=P(axis),
                                          check_vma=False)
            else:
                decode_fn = decode

            @jax.jit
            def run(params, acc, cnt, lq_tiles, ys, xs, mask):
                img = decode_fn(params, lq_tiles)

                def body(j, carry):
                    a, c = carry
                    m = mask[j]
                    patch = jax.lax.dynamic_slice(
                        a, (ys[j], xs[j], 0), (out_t, out_t, 3))
                    a = jax.lax.dynamic_update_slice(
                        a, patch + img[j] * m, (ys[j], xs[j], 0))
                    cpatch = jax.lax.dynamic_slice(
                        c, (ys[j], xs[j], 0), (out_t, out_t, 1))
                    c = jax.lax.dynamic_update_slice(
                        c, cpatch + m, (ys[j], xs[j], 0))
                    return a, c

                return jax.lax.fori_loop(0, lq_tiles.shape[0], body,
                                         (acc, cnt))

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def predict_tiled(self, params, lq: np.ndarray, scale,
                      tile: int, tile_overlap: int = 32,
                      mesh=None) -> np.ndarray:
        """Overlap-average tiling (clip_test, ciaosr.py:218-257) with
        static tile shapes: every tile is (tile, tile) on the LR grid →
        a single XLA program reused across tiles and images.

        Rational scales p/q are supported BEYOND the reference (whose
        clip_test computes float tensor-slice bounds for non-integer
        ``sf`` and crashes, ciaosr.py:245-255): tile size and tile starts
        snap down to multiples of q so every HR tile position tile·p/q is
        integral, and the image is reflect-padded to a q-multiple first
        (output cropped back), so tiled ×2.5 is exact instead of silently
        flooring to ×2.

        With ``mesh`` (1-D, axis 'data'), tile groups shard across chips —
        the spatial analogue of sequence parallelism (SURVEY.md §5.7):
        each chip encodes/decodes its tiles, the overlap-add runs on the
        replicated accumulator (tile outputs ride ICI once)."""
        scale = as_scale_fraction(scale)
        p, q = scale.numerator, scale.denominator
        h, w = lq.shape[:2]
        th, tw = round(h * p / q), round(w * p / q)
        if q > 1 and (h % q or w % q):
            hp, wp = _ceil_to(h, q), _ceil_to(w, q)
            lq = np.pad(lq, ((0, hp - h), (0, wp - w), (0, 0)),
                        mode="reflect")
            h, w = hp, wp
        tile = min(tile, h, w) // q * q
        if tile <= 0:
            raise ValueError(f"tile too small for scale {p}/{q}")
        stride = max(tile - tile_overlap, q) // q * q
        hs = sorted(set(list(range(0, h - tile, stride)) + [h - tile]))
        ws = sorted(set(list(range(0, w - tile, stride)) + [w - tile]))
        out_t = tile * p // q
        # accumulate on DEVICE: per-tile predictions never cross the host
        # link (only the final image does)
        acc = jnp.zeros((h * p // q, w * p // q, 3), jnp.float32)
        cnt = jnp.zeros((h * p // q, w * p // q, 1), jnp.float32)

        tiles = [(hi, wi) for hi in hs for wi in ws]
        # default single-tile groups: dispatches pipeline in-order, so
        # batching only grows the HBM working set (measured ~4% slower at
        # B=2 on the 192-tile protocol); tile_batch in test_cfg overrides
        # (multi-chip sharding below still widens to a per-chip multiple)
        tb = int(self.test_cfg.get("tile_batch", 1)) if hasattr(
            self.test_cfg, "get") else 1

        tile_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_dev = int(mesh.devices.size)
            tb = max(1, tb // n_dev) * n_dev     # per-chip batch × chips
            repl = NamedSharding(mesh, P())
            tile_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
            params = jax.device_put(params, repl)
            acc = jax.device_put(acc, repl)
            cnt = jax.device_put(cnt, repl)

        # tiles ride the dense-grid fast path, batched; one jitted call
        # per group does decode + on-device overlap-add. Under a mesh the
        # decode runs in shard_map over the tile axis, which makes the
        # fused Pallas kernels legal per shard (per-shard shapes are
        # concrete) — integer scales AND fused-expressible rational
        # scales both qualify; only non-Pallas generators and
        # non-expressible rational geometries (XLA decode,
        # auto-partitionable) skip it
        use_shmap = mesh is not None and self.generator.use_pallas and (
            q == 1 or _rational_pallas_ok(self.generator, tile, tile,
                                          p, q, p, q))
        if mesh is not None and self.generator.use_pallas and not use_shmap:
            logger.warning(
                "sharded tiled eval at scale %d/%d tile %d: rational "
                "geometry not expressible for the fused halo kernel - "
                "decoding via the auto-partitioned XLA path", p, q, tile)
        group_fn = self._tiled_group_fn(
            tile, scale,
            allow_pallas=(mesh is None) or use_shmap,
            mesh=mesh if use_shmap else None)

        for i in range(0, len(tiles), tb):
            group = tiles[i:i + tb]
            n = len(group)
            pad = tb - n if (n < tb and (len(tiles) > tb or mesh is not None)
                             ) else 0
            lq_tiles = np.stack(
                [lq[hi:hi + tile, wi:wi + tile] for hi, wi in group]
                + [np.zeros((tile, tile, 3), np.float32)] * pad)
            ys = np.asarray([hi * p // q for hi, _ in group]
                            + [0] * pad, np.int32)
            xs = np.asarray([wi * p // q for _, wi in group]
                            + [0] * pad, np.int32)
            mask = np.asarray([1.0] * n + [0.0] * pad, np.float32)
            lq_tiles = jnp.asarray(lq_tiles) if tile_sh is None else \
                jax.device_put(lq_tiles, tile_sh)
            acc, cnt = group_fn(params, acc, cnt, lq_tiles,
                                jnp.asarray(ys), jnp.asarray(xs),
                                jnp.asarray(mask))
        # denorm commutes with the overlap average; the clamp must follow
        # it (ciaosr.py:160-163 clamps the E/W quotient, not the tiles)
        out = np.clip(np.asarray(acc / cnt), 0.0, 1.0).astype(np.float32)
        return out[:th, :tw]   # crop the q-alignment pad (no-op for q == 1)

    def forward_test(self, params, lq: np.ndarray, target_shape=None,
                     scale=None, mesh=None) -> np.ndarray:
        """Reference forward_test dispatch (ciaosr.py:141-169): tiled when
        test_cfg.tile is set, otherwise full-image chunked prediction.
        Non-integer scales are exact on both paths (no int() flooring;
        the reference's own clip_test crashes on them)."""
        cfg = self.test_cfg
        tile = cfg.get("tile") if hasattr(cfg, "get") else None
        if tile:
            s = as_scale_fraction(scale if scale is not None
                                  else cfg.get("scale"))
            return self.predict_tiled(params, lq, s, int(tile),
                                      int(cfg.get("tile_overlap", 32)),
                                      mesh=mesh)
        if target_shape is None:
            s = float(as_scale_fraction(
                scale if scale is not None else cfg.get("scale")))
            target_shape = (round(lq.shape[0] * s), round(lq.shape[1] * s))
        return self.predict(params, lq, target_shape)

    def evaluate(self, output: np.ndarray, gt: np.ndarray) -> dict:
        """Metric protocol (basic_restorer.py:101-124): uint8 BGR images,
        crop_border + convert_to from test_cfg."""
        cfg = self.test_cfg
        crop_border = cfg.get("crop_border", 0)
        convert_to = cfg.get("convert_to")
        out_img = tensor2img(output)
        gt_img = tensor2img(gt)
        results = {}
        for name in cfg.get("metrics", ["PSNR"]):
            fn = self.allowed_metrics[name]
            results[name] = fn(out_img, gt_img, crop_border=crop_border,
                               convert_to=convert_to)
        return results


@MODELS.register(name="BasicRestorer")
class BasicRestorer:
    """Generic fixed-scale SR restorer (basic_restorer.py:17-237): wraps
    any lq→sr generator (EDSRNet/RDNNet, models/basic_sr.py) with the L1
    training objective, the PSNR/SSIM eval protocol, and the window-pad
    ``clip_generator`` test path (:175-191)."""

    allowed_metrics = {"PSNR": psnr, "SSIM": ssim}
    batch_keys = ("lq", "gt")

    def __init__(self, generator: dict, pixel_loss: dict | None = None,
                 train_cfg: Any = None, test_cfg: Any = None):
        from ciaosr_tpu.config.registry import BACKBONES, build_from_cfg
        import ciaosr_tpu.models.basic_sr  # noqa: F401 (registry)

        self.generator = build_from_cfg(dict(generator), BACKBONES)
        self.pixel_loss_cfg = pixel_loss
        self.train_cfg = train_cfg
        self.test_cfg = test_cfg or {}
        self._jit_cache: dict = {}

    def init_params(self, rng, lq_shape=(1, 48, 48, 3), **_):
        return jax.jit(self.generator.init)(
            rng, jnp.zeros(lq_shape, jnp.float32))

    def train_forward(self, params, lq, gt):
        """L1 objective on full images (basic_restorer.py:205-224)."""
        pred = self.generator.apply(params, lq)
        return jnp.mean(jnp.abs(pred - gt)), pred

    def _sr_fn(self, h: int, w: int):
        key = ("sr", h, w)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda params, lq: jnp.clip(
                    self.generator.apply(params, lq), 0.0, 1.0))
        return self._jit_cache[key]

    def predict(self, params, lq: np.ndarray, target_shape=None):
        """lq (H,W,3) → sr; reflect-pads H,W to the generator's window
        multiple and crops the output back (clip_generator semantics)."""
        h, w = lq.shape[:2]
        win = int(self.test_cfg.get("window_size", 1) or 1)
        ph, pw = _ceil_to(h, win), _ceil_to(w, win)
        if (ph, pw) != (h, w):
            lq = np.pad(lq, ((0, ph - h), (0, pw - w), (0, 0)),
                        mode="reflect")
        sr = self._sr_fn(ph, pw)(params, jnp.asarray(lq[None]))[0]
        s = int(getattr(self.generator, "upscale_factor", 1))
        return np.asarray(sr[:h * s, :w * s])

    def forward_test(self, params, lq: np.ndarray, target_shape=None,
                     scale=None, mesh=None):
        return self.predict(params, lq)

    evaluate = CiaoSRRestorer.evaluate
