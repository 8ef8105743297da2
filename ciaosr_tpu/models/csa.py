"""Cross-Scale (non-local) Attention — batched einsum formulation.

Behavioral spec: CrossScaleAttention at
/root/reference/mmedited/models/common/arch_csnln.py:407-531. The reference
runs a Python loop over the batch with data-dependent F.conv2d /
F.conv_transpose2d per sample (its worst serialization, SURVEY.md §3.4).

TPU-native reformulation (same numerics):
  correlation   = patch matmul   einsum('bpk,blk->bpl')   [MXU]
  reconstruction = attn @ patch-bank matmul + overlap-add  [MXU + VPU]
The data-dependent convolutions disappear entirely; everything is batched.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ciaosr_tpu.ops.neighborhood import extract_patches_same
from ciaosr_tpu.ops.sampling import interpolate_bilinear
from ciaosr_tpu.utils.init import torch_kernel_init, torch_bias_init


def _overlap_add(k_maps: jnp.ndarray, hp: int, wp: int, s: int,
                 channels: int) -> jnp.ndarray:
    """Scatter position-blended (3s×3s) kernels at stride s (padding=s).

    k_maps: (B, Hp*Wp, (3s)^2*C) tap-major → (B, s*Hp, s*Wp, C).
    Equivalent to conv_transpose2d(attn, kernels, stride=s, padding=s)
    (arch_csnln.py:511) with the per-position blended kernel K[p] =
    Σ_l attn[p,l]·raw_w[l] precomputed by matmul.

    Derivation: input position i pastes kernel row u at output s·i - s + u;
    writing output y = s·i' + a (a∈[0,s)) gives u = s·t + a with
    t = i' - i + 1 ∈ {0,1,2}; so out[s·i'+a] = Σ_t K[i'+1-t][s·t+a].
    """
    b = k_maps.shape[0]
    k6 = k_maps.reshape(b, hp, wp, 3, s, 3, s, channels)
    out = jnp.zeros((b, hp, wp, s, s, channels), k_maps.dtype)
    padded = jnp.pad(k6, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0),
                          (0, 0), (0, 0)))
    for t in range(3):
        for r in range(3):
            di, dj = 1 - t, 1 - r  # source = i' + di
            src = padded[:, 1 + di:1 + di + hp, 1 + dj:1 + dj + wp,
                         t, :, r, :, :]
            out = out + src
    # (B, Hp, s, Wp, s, C) → (B, s*Hp, s*Wp, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * s, wp * s, channels)
    return out


def _stencil_reconstruct(attn: jnp.ndarray, embed: jnp.ndarray, hp: int,
                         wp: int, s: int, channels: int) -> jnp.ndarray:
    """Differentiable XLA form of the round-4 stencil factorization
    (ops/pallas/csa_attention.py round-4 section; f64-exact vs the
    einsum + overlap-add path in tests/test_csa_stencil.py):

        out[s·i'+a, s·j'+b] = Σ_l M[(i',j'), l] · P_ab[l],
        M = Σ_{d∈{-1,0,1}²} diag-shift_d(attn),  P_ab[l] = embed[s·l+ab]

    — a 9-point diagonal stencil on the (P, L) attention map plus ONE
    (P, L)@(L, s²C) matmul, replacing the 9s²C-bank einsum and the
    (B, P, (3s)²C) k_maps intermediate. Used by the TRAINING (autodiff)
    path; eval uses the fused kernels."""
    b = attn.shape[0]
    hq, wq = hp // s, wp // s
    a5 = attn.reshape(b, hp, wp, hq, wq)
    padded = jnp.pad(a5, ((0, 0), (1, 1), (1, 1), (1, 1), (1, 1)))
    m = None
    for dy in range(3):
        for dx in range(3):
            sl = padded[:, dy:dy + hp, dx:dx + wp, dy:dy + hq,
                        dx:dx + wq]
            m = sl if m is None else m + sl
    # phase-plane stack P_ab[l]: embed[s·u+a, s·v+b] -> (B, L, s²C)
    ph = embed.reshape(b, hq, s, wq, s, channels)
    ph = ph.transpose(0, 1, 3, 2, 4, 5).reshape(b, hq * wq,
                                                s * s * channels)
    if attn.dtype != jnp.float32:
        ph = ph.astype(attn.dtype)
    out = jnp.einsum("bpl,blk->bpk", m.reshape(b, hp * wp, hq * wq), ph,
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, hp, wp, s, s, channels).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, hp * s, wp * s, channels)
    return out


# VMEM admission headroom per TPU generation. The fused CSA kernels were
# tiled and measured on v5e (128 MiB VMEM/core, ~100 MiB scoped-vmem
# ceiling in practice); 85 MiB leaves headroom for Mosaic's own buffers.
# v4/v5p/v6e share the 128 MiB VMEM size, so the same headroom is safe
# there (tiling *targets* stay v5e-measured — a perf, not correctness,
# approximation). Unknown TPU generations fall back to a conservative
# 12 MiB (v2/v3-class cores have 16 MiB) — they under-admit rather than
# mis-admit. Override: CIAOSR_CSA_VMEM_BUDGET (bytes).
_VMEM_BUDGET_MEASURED = 85 * 1024 * 1024
_VMEM_BUDGET_FALLBACK = 12 * 1024 * 1024
_VMEM_128MIB_KINDS = ("v4", "v5", "v6")  # device_kind substrings


def vmem_budget() -> int:
    """CSA-kernel VMEM admission budget for the current backend."""
    import os
    env = os.environ.get("CIAOSR_CSA_VMEM_BUDGET")
    if env:
        return int(env)
    try:
        import jax
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover — uninitialized backend
        return _VMEM_BUDGET_MEASURED
    if dev.platform != "tpu":
        # CPU interpret mode (tests) has no VMEM limit; mirror the
        # production (v5e) decisions so admission tests pin them
        return _VMEM_BUDGET_MEASURED
    kind = getattr(dev, "device_kind", "") or ""
    if any(g in kind.lower().replace("tpu ", "")
           for g in _VMEM_128MIB_KINDS):
        return _VMEM_BUDGET_MEASURED
    import logging
    logging.getLogger(__name__).warning(
        "fused_admission: unknown TPU generation %r — using the "
        "conservative %d MiB VMEM budget (set CIAOSR_CSA_VMEM_BUDGET "
        "after sweeping tools/sweep_csa*.py on this hardware)",
        kind, _VMEM_BUDGET_FALLBACK >> 20)
    return _VMEM_BUDGET_FALLBACK


def fused_admission(hp: int, wp: int, s: int, channels: int, cr: int,
                    es: int, batch: int = 1) -> tuple[str, int | None, int]:
    """Which CSA kernel a geometry gets, with its (rows, tl) tiling.

    Returns ("stencil" | "resident" | "windowed" | "streaming", rows, tl).
    The fused kernels need 8-aligned widths (wp, wp/s — strip epilogue /
    row slicing). Admission order is measured, not theoretical
    (PERF_NOTES round 4): the resident strip kernel wins whenever it
    fits VMEM (no HBM intermediate; RDN 192-tile 13.56 ms vs stencil
    14.40); where it doesn't, "stencil" — the stencil-factored
    two-kernel path (csa_attention.py round-4 section), ~5× fewer
    FLOPs — beats the windowed strip kernel by ~1.65× (SwinIR 192-tile
    33.28 → 20.16 ms) at the cost of round-tripping its Ā (P, L_pad)
    intermediate through HBM (gated on that footprint; huge untiled
    maps fall through). The windowed strip variant streams per-instance
    element-offset windows and is the last fused resort. ``es`` is the
    compute element size (2 for bf16, 4 for f32) — resident operands
    inherit it.

    The VMEM budget is derived from the device (see vmem_budget()); the
    decision is logged at DEBUG level.
    """
    decision = _fused_admission_impl(hp, wp, s, channels, cr, es, batch)
    import logging
    logging.getLogger(__name__).debug(
        "fused_admission(hp=%d, wp=%d, s=%d, C=%d, cr=%d, es=%d, B=%d) "
        "-> %s (rows=%s, tl=%d, budget=%d MiB)", hp, wp, s, channels, cr,
        es, batch, decision[0], decision[1], decision[2],
        vmem_budget() >> 20)
    return decision


def _fused_admission_impl(hp: int, wp: int, s: int, channels: int, cr: int,
                          es: int, batch: int = 1
                          ) -> tuple[str, int | None, int]:
    from ciaosr_tpu.ops.pallas.csa_attention import aligned_channels

    budget = vmem_budget()
    rows = [r for r in range(1, 9) if hp % r == 0 and (r * wp) % 8 == 0]
    if not (rows and hp % s == 0 and wp % 8 == 0 and (wp // s) % 8 == 0):
        return "streaming", None, 1024
    c_eff = aligned_channels(s, channels)

    # single-kernel stencil first: Ā never leaves VMEM (no HBM
    # intermediate AND a single score sweep — the two-kernel stencil
    # pays both), so it wins at BOTH production geometries when its Ā
    # scratch fits (RDN 192-tile rows=6 10.60 ms vs resident 13.56;
    # SwinIR rows=4 17.29 vs two-kernel 20.16 —
    # tools/sweep_csa_stencil_fused.py on-chip). Gates: per-tile max
    # history needs n_l ≤ 128 lanes; Ā (TPH, L_pad+2hc) bf16 + banks
    # must fit the 100 MB scoped VMEM. P-tile target is sc2-dependent
    # (measured): small phase planes amortize the halo recompute with a
    # taller tile (RDN sc2=256 → 1152); wide ones want the smaller
    # acc/out block (SwinIR sc2=768 → 768; rows=6 there is 28.86 ms).
    wq_f = wp // s
    l_act_f = (hp // s) * wq_f
    tl_f = min(1024, -(-l_act_f // 128) * 128)
    l_pad_f = -(-l_act_f // tl_f) * tl_f
    if l_pad_f // tl_f <= 128:
        sc2_f = s * s * c_eff
        hr_f = wp + 8
        hc_f = -(-(wq_f + 1) // 128) * 128
        tp_target = 1152 if sc2_f <= 256 else 768
        for rsf in sorted(rows, key=lambda r: abs(r * wp - tp_target)):
            tp_f = rsf * wp
            tph_f = tp_f + 2 * hr_f
            vmem_f = (tph_f * (l_pad_f + 2 * hc_f) * 2      # Ā (bf16)
                      + tph_f * max(9 * cr, 128) * es       # q bank
                      + 3 * tph_f * 128 * 4                 # m/l/hist
                      + tp_f * sc2_f * 4                    # f32 acc
                      + 3 * (tp_f + 2 * (hr_f + wp)) * max(cr, 128)
                      * es * 2                              # match wins
                      + 2 * tl_f * max(9 * cr, 128) * es    # k tile
                      + 2 * tl_f * sc2_f * es               # phase tile
                      + tp_f * sc2_f * 4)                   # out block
            if vmem_f < budget:
                return "stencil_fused", rsf, tl_f

    rsel = min(rows, key=lambda r: abs(r * wp - 1024))
    tp = rsel * wp
    wq = wp // s
    l_act = (hp // s) * wq
    tl_eff = min(1024, -(-l_act // 128) * 128)
    l_pad = -(-l_act // tl_eff) * tl_eff
    dv = 9 * s * s * c_eff
    vmem = (tp * dv * 4             # f32 accumulator
            + 2 * tl_eff * dv * es  # value tile (+concat)
            + 3 * (l_pad + 2 * wq) * s * s * c_eff * es
            + 3 * (hp * wp + 2 * wp) * max(cr, 128) * es
            + l_pad * max(9 * cr, 128) * es
            + tp * tl_eff * 4)      # logits tile
    if vmem < budget:
        return "resident", rsel, 1024

    # stencil path: gate on the Ā HBM round-trip footprint + VMEM
    tl_st = min(1024, -(-l_act // 128) * 128)
    l_pad_st = -(-l_act // tl_st) * tl_st
    sc2 = s * s * c_eff
    hr, hc = wp + 8, -(-(wq + 1) // 64) * 64
    if (l_pad_st // tl_st <= 127
            and batch * hp * wp * l_pad_st * es <= 2 * 1024 ** 3):
        for rst in sorted(rows, key=lambda r: abs(r * wp - 1024)):
            tps = rst * wp
            vmem_st = max(
                # kernel A: resident k + q concat + two score tiles
                l_pad_st * max(9 * cr, 128) * es + 2 * tps * 9 * cr * es
                + 2 * tps * tl_st * 4 + 2 * tps * 128 * 4,
                # kernel B: double-buffered Ā window + M + phases + acc
                2 * (tps + 2 * hr) * (tl_st + 2 * hc) * es
                + 2 * tps * tl_st * 4 + 2 * tl_st * sc2 * es
                + 2 * tps * sc2 * 4)
            if vmem_st < budget:
                return "stencil", rst, tl_st
    for tlw in (tl_eff, 512, 256):
        if not 256 <= tlw <= tl_eff:
            continue
        for rw in sorted(rows, key=lambda r: abs(r * wp - 1024)):
            tpw = rw * wp
            vmem_w = (tpw * dv * 4
                      + 2 * tlw * dv * es
                      + 3 * (tlw + 2 * wq) * s * s * c_eff * es * 2
                      + 3 * (tpw + 2 * wp) * max(cr, 128) * es * 2
                      + l_pad * max(9 * cr, 128) * es
                      + 2 * tpw * tlw * 4)
            if vmem_w < budget:
                return "windowed", rw, tlw
    return "streaming", None, 1024


class CrossScaleAttention(nn.Module):
    """Scale-aware non-local attention over s·3×3 ↔ 3×3 patch pairs."""

    channels: int = 64
    reduction: int = 2
    ksize: int = 3
    scales: Sequence[int] = (2,)
    stride: int = 1
    softmax_scale: float = 10.0
    average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, flash: bool = False) -> jnp.ndarray:
        """flash=True fuses correlation→softmax→reconstruction in a Pallas
        online-softmax kernel (ops/pallas/csa_attention.py) — forward-only;
        eval paths opt in, training keeps the differentiable einsum path."""
        b, h, w, c = x.shape
        cr = self.channels // self.reduction

        def basic_block(feats, name):
            # instantiate ONCE: the reference applies the same embed/match
            # convs to every scale's padded input (arch_csnln.py:418-420,
            # 452-453) — per-scale re-creation would both break weight
            # sharing and collide flax submodule names
            conv = nn.Conv(feats, (1, 1), kernel_init=torch_kernel_init,
                           bias_init=torch_bias_init(self.channels),
                           dtype=self.dtype, name=f"{name}_conv")
            prelu = nn.PReLU(negative_slope_init=0.25, name=f"{name}_prelu")
            return lambda inp: prelu(conv(inp))

        conv_match_1 = basic_block(cr, "conv_match_1")
        conv_match_2 = basic_block(cr, "conv_match_2")
        conv_assembly = basic_block(self.channels, "conv_assembly")

        outs = []
        for s in self.scales:
            pad_h = (s - h % s) % s
            pad_w = (s - w % s) % s
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                         mode="reflect") if (pad_h or pad_w) else x
            hp, wp = h + pad_h, w + pad_w

            embed = conv_assembly(xp)                       # (B,Hp,Wp,C)
            match = conv_match_1(xp)                        # (B,Hp,Wp,Cr)
            ref = interpolate_bilinear(xp, hp // s, wp // s)
            refm = conv_match_2(ref)                        # (B,h',w',Cr)

            # reference patch bank (keys) + L2 normalization with 1e-4 floor
            w_pat = extract_patches_same(refm, self.ksize, self.stride)
            norm = jnp.maximum(
                jnp.sqrt(jnp.sum(w_pat * w_pat, axis=-1, keepdims=True)),
                1e-4)
            w_normed = w_pat / norm                          # (B,L,9Cr)

            # correlation neighborhoods / reconstruction bank: only the
            # non-fused paths materialize these (the fused kernel builds
            # both in VMEM); keeping the extractions inside the branches
            # guarantees no dead gather work rides the fused trace
            def x_nb_raw():
                return (extract_patches_same(match, self.ksize, self.stride),
                        extract_patches_same(embed, self.ksize * s,
                                             self.stride * s))

            y = None
            if flash and self.average:
                import jax
                from ciaosr_tpu.ops.pallas.csa_attention import (
                    csa_attention, csa_fused, csa_stencil,
                    csa_stencil_fused)
                interp = jax.default_backend() == "cpu"
                # resident operands inherit the compute dtype — an f32
                # run doubles them and blows the 100 MB scoped VMEM at
                # the 192-tile geometry (measured), so admission uses the
                # real element size
                es = 2 if self.dtype == jnp.bfloat16 else 4
                mode, rsel, tl_sel = fused_admission(
                    hp, wp, s, self.channels, cr, es, batch=b)
                if mode == "stencil_fused":
                    # whole stencil-factored CSA middle in ONE kernel:
                    # Ā resident in VMEM, lazy-max normalization, 3+3
                    # separable stencil (csa_attention.py round-4
                    # continued section)
                    y = csa_stencil_fused(
                        match, w_normed, embed, self.softmax_scale, hp, wp,
                        s, self.channels,
                        out_dtype=self.dtype or jnp.float32,
                        rows=rsel, tl=tl_sel, interpret=interp,
                        a_dtype=self.dtype or jnp.float32)
                elif mode == "stencil":
                    # stencil-factored path: diagonal stencil on Ā + one
                    # (P, L)@(L, s²C) matmul — ~5× fewer FLOPs than the
                    # strip kernels (csa_attention.py round-4 section)
                    y = csa_stencil(
                        match, w_normed, embed, self.softmax_scale, hp, wp,
                        s, self.channels,
                        out_dtype=self.dtype or jnp.float32,
                        rows=rsel, tl=tl_sel, interpret=interp,
                        a_dtype=self.dtype or jnp.float32)
                elif mode != "streaming":
                    # whole CSA middle in one kernel: q/v banks assembled
                    # in VMEM from resident match/phase planes (or
                    # per-instance windows of them), softmax online,
                    # overlap-add in the epilogue — no bank and no
                    # (B, P, (3s)²C) k_maps ever reach HBM
                    y = csa_fused(
                        match, w_normed, embed, self.softmax_scale, hp, wp,
                        s, self.channels,
                        out_dtype=self.dtype or jnp.float32,
                        rows=rsel, interpret=interp,
                        windowed=mode == "windowed", tl=tl_sel)
                else:  # odd geometry: streaming-bank fallback
                    x_nb, raw = x_nb_raw()
                    k_maps = csa_attention(
                        x_nb, w_normed, raw, self.softmax_scale,
                        out_dtype=self.dtype or jnp.float32,
                        interpret=interp)
            else:
                x_nb = extract_patches_same(match, self.ksize, self.stride)
                corr = jnp.einsum("bpk,blk->bpl", x_nb, w_normed,
                                  preferred_element_type=jnp.float32)
                attn = nn.softmax(corr * self.softmax_scale, axis=-1)
                if not self.average:
                    attn = (attn == jnp.max(attn, axis=-1, keepdims=True)
                            ).astype(attn.dtype)
                # keep the (P,L) attention map in compute dtype: mixed-dtype
                # einsum would upcast the bank and double HBM traffic
                if self.dtype is not None:
                    attn = attn.astype(self.dtype)
                if self.average:
                    # round-5: the TRAINING path rides the stencil
                    # factorization too — same algebra as the round-4
                    # kernels (f64-exact, tests/test_csa_stencil.py), in
                    # differentiable XLA: ~5× fewer reconstruction FLOPs
                    # and no (B, P, (3s)²C) k_maps / 9s²C bank
                    # intermediates in fwd OR bwd (round-4 verdict
                    # missing #5: CSA was 16% of the classical step)
                    y = _stencil_reconstruct(attn, embed, hp, wp, s,
                                             self.channels)
                else:
                    # hard-argmax variant keeps the bank route (the
                    # one-hot attn defeats the stencil's FLOP win)
                    raw = extract_patches_same(embed, self.ksize * s,
                                               self.stride * s)
                    k_maps = jnp.einsum("bpl,blk->bpk", attn, raw,
                                        preferred_element_type=jnp.float32)
            if y is None:
                y = _overlap_add(k_maps, hp, wp, s, self.channels)

            # strided conv back to input resolution (arch_csnln.py:423-428)
            name = "down" if s == 2 else f"downx{s}"
            y = nn.Conv(self.channels, (self.ksize, self.ksize),
                        strides=(s, s), padding=((1, 1), (1, 1)),
                        kernel_init=torch_kernel_init, dtype=self.dtype,
                        bias_init=torch_bias_init(y.shape[-1] * self.ksize ** 2),
                        name=name)(y)
            y = y / 6.0
            outs.append(y[:, :h, :w, :])

        return jnp.concatenate(outs, axis=-1)
