"""Test-only torch SwinIR-trunk oracle with the reference key layout.

Independently written (standard Swin math) for conversion/parity testing;
never imported by the framework.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def win_rev(x, ws, h, w):
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class Attn(nn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.ws, self.heads = ws, heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(ws), torch.arange(ws), indexing="ij")).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask):
        bw, n, c = x.shape
        qkv = self.qkv(x).reshape(bw, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bw // nw, nw, self.heads, n, n) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(bw, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        return self.proj(x)


class Block(nn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio=2.0):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = Attn(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.ModuleDict({
            "fc1": nn.Linear(dim, int(dim * mlp_ratio)),
            "fc2": nn.Linear(int(dim * mlp_ratio), dim)})

    def _mask(self, h, w):
        if self.shift == 0:
            return None
        img = torch.zeros(1, h, w, 1)
        cnt = 0
        for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                   slice(-self.shift, None)):
            for wsl in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                        slice(-self.shift, None)):
                img[:, hs, wsl, :] = cnt
                cnt += 1
        win = win_part(img, self.ws).view(-1, self.ws * self.ws)
        diff = win.unsqueeze(1) - win.unsqueeze(2)
        return diff.masked_fill(diff != 0, -100.0).masked_fill(
            diff == 0, 0.0)

    def forward(self, x, x_size):
        h, w = x_size
        b, n, c = x.shape
        ws = min(self.ws, h, w)
        shift = self.shift if (ws == self.ws and min(h, w) > self.ws) else 0
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
        mask = self._mask(h, w) if shift else None
        x = win_rev(self.attn(win_part(x, ws), mask), ws, h, w)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = shortcut + x.reshape(b, n, c)
        y = self.norm2(x)
        y = self.mlp["fc2"](F.gelu(self.mlp["fc1"](y)))
        return x + y


class RSTBOracle(nn.Module):
    def __init__(self, dim, depth, heads, ws, mlp_ratio=2.0):
        super().__init__()
        blocks = [Block(dim, heads, ws, 0 if i % 2 == 0 else ws // 2,
                        mlp_ratio) for i in range(depth)]
        self.residual_group = nn.ModuleDict(
            {"blocks": nn.ModuleList(blocks)})
        self.conv = nn.Conv2d(dim, dim, 3, padding=1)

    def forward(self, x, x_size):
        h, w = x_size
        res = x
        for blk in self.residual_group["blocks"]:
            x = blk(x, x_size)
        img = x.transpose(1, 2).view(-1, x.shape[-1], h, w)
        img = self.conv(img)
        return img.flatten(2).transpose(1, 2) + res


class OracleSwinIRTrunk(nn.Module):
    """conv_first → LN patch embed → RSTBs → LN → conv_after_body + skip,
    with reflect window padding (gen_feature semantics)."""

    def __init__(self, embed_dim=60, depths=(2, 2), heads=(3, 3), ws=8,
                 mlp_ratio=2.0):
        super().__init__()
        self.ws = ws
        self.conv_first = nn.Conv2d(3, embed_dim, 3, padding=1)
        self.patch_embed = nn.ModuleDict({"norm": nn.LayerNorm(embed_dim)})
        self.layers = nn.ModuleList(
            [RSTBOracle(embed_dim, d, h, ws, mlp_ratio)
             for d, h in zip(depths, heads)])
        self.norm = nn.LayerNorm(embed_dim)
        self.conv_after_body = nn.Conv2d(embed_dim, embed_dim, 3, padding=1)

    def forward(self, img):
        _, _, h0, w0 = img.shape
        ph = (self.ws - h0 % self.ws) % self.ws
        pw = (self.ws - w0 % self.ws) % self.ws
        if ph or pw:
            img = F.pad(img, (0, pw, 0, ph), "reflect")
        x = self.conv_first(img)
        b, c, h, w = x.shape
        skip = x
        feat = x.flatten(2).transpose(1, 2)
        feat = self.patch_embed["norm"](feat)
        for layer in self.layers:
            feat = layer(feat, (h, w))
        feat = self.norm(feat)
        feat = feat.transpose(1, 2).view(b, c, h, w)
        out = self.conv_after_body(feat) + skip
        return out[:, :, :h0, :w0]
