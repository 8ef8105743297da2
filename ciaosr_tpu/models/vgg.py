"""VGG19 feature extractor for perceptual loss (flax, NHWC).

Behavioral spec: PerceptualVGG at
/root/reference/mmedited/models/losses/perceptual_loss.py:12-88 — feature
taps after named layers (default relu indices {2,7,16,25,34} of
torchvision vgg19.features), input normalized with ImageNet mean/std.

Pretrained weights cannot be downloaded in this environment; convert a
torchvision vgg19 state_dict file via :func:`convert_vgg19` and pass its
params explicitly (gated at the loss level).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg19.features conv layout: conv indices in the Sequential
_VGG19_CONVS = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_VGG19_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 256,
                   512, 512, 512, 512, 512, 512, 512, 512]
_POOL_AFTER = {3, 8, 17, 26, 35}  # Sequential indices of MaxPool inputs…

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG19Features(nn.Module):
    """Runs vgg19.features up to max(layer_name_list), returning taps.

    layer indices follow torchvision's Sequential numbering, where an index
    k in layer_name_list taps the OUTPUT of Sequential[k] (e.g. '2' = after
    relu1_2, '34' = after relu5_4).
    """

    layer_name_list: Sequence[int] = (2, 7, 16, 25, 34)
    use_input_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[int, jnp.ndarray]:
        if self.use_input_norm:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        taps = {}
        max_idx = max(self.layer_name_list)
        seq_idx = 0
        conv_num = 0
        # rebuild the Sequential: [conv relu]*2 pool [conv relu]*2 pool
        # [conv relu]*4 pool [conv relu]*4 pool [conv relu]*4 pool
        plan = [2, 2, 4, 4, 4]
        for block, n_convs in enumerate(plan):
            for _ in range(n_convs):
                x = nn.Conv(_VGG19_CHANNELS[conv_num], (3, 3),
                            padding=((1, 1), (1, 1)),
                            name=f"conv_{_VGG19_CONVS[conv_num]}")(x)
                conv_num += 1
                if seq_idx in self.layer_name_list:
                    taps[seq_idx] = x
                if seq_idx >= max_idx:
                    return taps
                seq_idx += 1
                x = nn.relu(x)
                if seq_idx in self.layer_name_list:
                    taps[seq_idx] = x
                if seq_idx >= max_idx:
                    return taps
                seq_idx += 1
            # max pool 2x2 stride 2
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if seq_idx in self.layer_name_list:
                taps[seq_idx] = x
            if seq_idx >= max_idx:
                return taps
            seq_idx += 1
        return taps


def convert_vgg19(state_dict: dict) -> dict:
    """torchvision vgg19 (or vgg19.features) state_dict → flax params."""
    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") \
            else np.asarray(t)

    prefix = "features." if any(k.startswith("features.")
                                for k in state_dict) else ""
    params = {}
    for idx in _VGG19_CONVS:
        wk = f"{prefix}{idx}.weight"
        if wk not in state_dict:
            break
        params[f"conv_{idx}"] = {
            "kernel": _np(state_dict[wk]).transpose(2, 3, 1, 0).copy(),
            "bias": _np(state_dict[f"{prefix}{idx}.bias"]).copy(),
        }
    return {"params": params}
