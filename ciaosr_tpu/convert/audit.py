"""Strict-mode audit for PyTorch→flax checkpoint conversion.

When real reference checkpoints arrive, conversion is the first wall: a
silently-dropped weight family or a transposed shape produces garbage PSNR
with no error. This module makes conversion *accountable*:

  * every state_dict key read by the converter is tracked;
  * keys that are never read must be explained by a known-ignored rule
    (recomputed buffers, the discarded SwinIR upsampler head the reference
    itself throws away at ciaosr_net.py:460-473, non-generator restorer
    submodules stripped by the ``generator.`` prefix per tools/test.py:115-118);
  * the converted tree can be compared leaf-by-leaf (structure + shapes)
    against the model's own ``jax.eval_shape`` init.

Reference load surface covered: mmcv ``load_checkpoint`` meta dicts,
``revise_keys=(r'^', 'generator.')`` raw-SwinIR rewrite, and the EMA copy
``generator_ema`` saved by RealCiaoSR (real_ciaosr.py:84-91).
"""

from __future__ import annotations

import re

import numpy as np


class ConversionAuditError(RuntimeError):
    """Raised in strict mode when conversion left keys unexplained or the
    converted tree does not match the model's parameter shapes."""


class TrackedStateDict(dict):
    """A state_dict that records which keys the converter actually read.

    Only ``__getitem__`` counts as consumption — ``in`` checks are probes
    (e.g. optional biases) and do not mark a key used.  ``.get`` with a
    default likewise only marks on hit.
    """

    def __init__(self, data):
        super().__init__(data)
        self.consumed: set[str] = set()

    def __getitem__(self, key):
        try:
            v = super().__getitem__(key)
        except KeyError:
            raise KeyError(
                f"checkpoint key not found: {key!r} — the checkpoint does "
                "not match the model config (wrong encoder family, dims, or "
                "a truncated file)") from None
        self.consumed.add(key)
        return v

    def get(self, key, default=None):
        if key in self:
            return self[key]
        return default

    def unconsumed(self):
        return sorted(set(self) - self.consumed)


# Unread keys matching these rules are fine — each rule says why.
_IGNORED_RULES = (
    # SwinIR buffers recomputed at trace time (swinir_weights.py header)
    (re.compile(r"\.relative_position_index$"), "buffer recomputed at trace"),
    (re.compile(r"\.attn_mask$"), "buffer recomputed at trace"),
    # Raw-SwinIR checkpoints carry the upsampler head + normalization
    # buffer that the reference builds then discards when used as a CiaoSR
    # encoder (ciaosr_net.py:460-473; swinir_net.py upsampler families)
    (re.compile(r"^(conv_before_upsample|upsample|conv_last|conv_up1|"
                r"conv_up2|conv_hr|conv_bicubic)\."),
     "SwinIR upsampler head — discarded by the reference too"),
    (re.compile(r"^mean$"), "SwinIR img-norm buffer — encoder-only use"),
    # The reference CSA always builds `down` even when 2 ∉ multi_scale
    # (arch_csnln.py:423); it is untrained/unused in that configuration
    (re.compile(r"^cs_attn\.down(x\d+)?\.(weight|bias)$"),
     "CSA downsample conv for a scale not in multi_scale"),
    # CSA's L2-norm floor is a constant buffer in the reference
    # (arch_csnln.py escape_NaN = 1e-4); we bake the constant in
    (re.compile(r"^cs_attn\.escape_NaN$"), "constant buffer (1e-4 L2 floor)"),
)

# Top-level families legitimately stripped when extracting `generator.`
# from a full restorer checkpoint (RealCiaoSR saves all of these).
_STRIPPED_FAMILIES = re.compile(
    r"^(generator_ema|discriminator|perceptual_loss|step_counter|mean|std)"
    r"([.\b]|$)")


def classify_unconsumed(keys):
    """Split unread keys into (explained {key: reason}, unexplained [keys])."""
    explained, unexplained = {}, []
    for k in keys:
        for rx, why in _IGNORED_RULES:
            if rx.search(k):
                explained[k] = why
                break
        else:
            unexplained.append(k)
    return explained, unexplained


def classify_stripped(all_keys, prefix: str):
    """Split keys NOT under ``prefix`` into (known-other-module, unknown)."""
    other, unknown = [], []
    for k in all_keys:
        if k.startswith(prefix):
            continue
        (other if _STRIPPED_FAMILIES.match(k) else unknown).append(k)
    return other, unknown


def tree_shape_mismatches(converted, expected) -> list[str]:
    """Compare two nested param dicts; returns human-readable mismatch lines
    (missing/extra paths and shape/dtype-incompatible leaves)."""
    lines = []

    def walk(a, b, path):
        a_is_dict, b_is_dict = isinstance(a, dict), isinstance(b, dict)
        if a_is_dict != b_is_dict:
            lines.append(f"{path}: leaf/subtree mismatch")
            return
        if a_is_dict:
            for k in sorted(set(a) | set(b)):
                p = f"{path}/{k}" if path else k
                if k not in a:
                    lines.append(f"{p}: missing from converted params")
                elif k not in b:
                    lines.append(f"{p}: not a model parameter (extra)")
                else:
                    walk(a[k], b[k], p)
            return
        sa = tuple(np.shape(a))
        sb = tuple(getattr(b, "shape", np.shape(b)))
        if sa != sb:
            lines.append(f"{path}: shape {sa} != model {sb}")

    walk(converted, expected, "")
    return lines


def report(tracked: TrackedStateDict, *, original_keys=None,
           prefix: str | None = None, strict: bool = False,
           log=print) -> None:
    """Summarize consumption; in strict mode raise on anything unexplained.

    ``original_keys``/``prefix`` describe the pre-strip checkpoint so
    stripped non-generator families are accounted for too.
    """
    explained, unexplained = classify_unconsumed(tracked.unconsumed())
    other = unknown_stripped = []
    if original_keys is not None and prefix:
        other, unknown_stripped = classify_stripped(original_keys, prefix)

    log(f"[convert] consumed {len(tracked.consumed)}/{len(tracked)} "
        f"generator keys; {len(explained)} ignored by rule"
        + (f"; {len(other)} keys in other modules "
           f"({', '.join(sorted({k.split('.')[0] for k in other}))})"
           if other else ""))
    for k, why in explained.items():
        log(f"[convert]   ignored {k}: {why}")

    problems = []
    if unexplained:
        problems.append("unconsumed generator keys (converter dropped "
                        "weights!): " + ", ".join(unexplained[:20]))
    if unknown_stripped:
        problems.append("unrecognized non-generator keys: "
                        + ", ".join(unknown_stripped[:20]))
    if problems:
        msg = "; ".join(problems)
        if strict:
            raise ConversionAuditError(msg)
        log(f"[convert] WARNING: {msg}")
