"""Test-only PyTorch oracle of the CiaoSR reference semantics.

Independently written from the behavioral spec in SURVEY.md §2.1/§3.4 (and
reference reading); produces state_dicts with the reference's key names so
the converter under test is the same one that loads real checkpoints.
Torch-CPU only; lives in tests/ and is never imported by the framework.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def oracle_make_coord(shape, flatten=True):
    coords = []
    for n in shape:
        r = 1.0 / n
        coords.append(-1 + r + 2 * r * torch.arange(n, dtype=torch.float32))
    grid = torch.stack(torch.meshgrid(*coords, indexing="ij"), dim=-1)
    return grid.view(-1, grid.shape[-1]) if flatten else grid


class OracleMLP(nn.Module):
    """MLPRefiner twin: Sequential of Linear/ReLU with reference key names."""

    def __init__(self, in_dim, out_dim, hidden):
        super().__init__()
        mods, d = [], in_dim
        for h in hidden:
            mods += [nn.Linear(d, h), nn.ReLU()]
            d = h
        mods.append(nn.Linear(d, out_dim))
        self.layers = nn.Sequential(*mods)

    def forward(self, x):
        shape = x.shape[:-1]
        return self.layers(x.reshape(-1, x.shape[-1])).view(*shape, -1)


class OracleCSA(nn.Module):
    """CrossScaleAttention twin (per-sample conv2d/conv_transpose2d)."""

    def __init__(self, channel=64, reduction=2, scales=(2,),
                 softmax_scale=10.0, average=True):
        super().__init__()
        self.scales = list(scales)
        self.softmax_scale = softmax_scale
        self.average = average
        self.register_buffer("escape_NaN", torch.tensor([1e-4]))

        def block(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 1), nn.PReLU())

        self.conv_match_1 = block(channel, channel // reduction)
        self.conv_match_2 = block(channel, channel // reduction)
        self.conv_assembly = block(channel, channel)
        self.down = nn.Conv2d(channel, channel, 3, 2, 1)
        for s in self.scales:
            if s == 3:
                self.downx3 = nn.Conv2d(channel, channel, 3, 3, 1)
            if s == 4:
                self.downx4 = nn.Conv2d(channel, channel, 3, 4, 1)

    @staticmethod
    def _same_pad(x, k, stride):
        h, w = x.shape[-2:]
        oh, ow = -(-h // stride), -(-w // stride)
        ph = max(0, (oh - 1) * stride + k - h)
        pw = max(0, (ow - 1) * stride + k - w)
        return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))

    def _patches(self, x, k, stride):
        x = self._same_pad(x, k, stride)
        return F.unfold(x, k, stride=stride)  # (B, C*k*k, L)

    def forward(self, x):
        b, c, h, w = x.shape
        outs = []
        for s in self.scales:
            ph, pw = (s - h % s) % s, (s - w % s) % s
            xp = F.pad(x, (0, pw, 0, ph), "reflect") if (ph or pw) else x
            hp, wp = h + ph, w + pw

            embed = self.conv_assembly(xp)
            match = self.conv_match_1(xp)
            ref = self.conv_match_2(
                F.interpolate(xp, scale_factor=1.0 / s, mode="bilinear"))

            k_rec = 3 * s
            raw = self._patches(embed, k_rec, s)        # (B, C*k², L)
            raw = raw.view(b, c, k_rec, k_rec, -1).permute(0, 4, 1, 2, 3)
            keys = self._patches(ref, 3, 1)              # (B, Cr*9, L)
            cr = ref.shape[1]
            keys = keys.view(b, cr, 3, 3, -1).permute(0, 4, 1, 2, 3)

            ys = []
            for i in range(b):
                ki = keys[i]                              # (L, Cr, 3, 3)
                norm = torch.sqrt((ki * ki).sum(dim=(1, 2, 3),
                                                keepdim=True))
                ki = ki / torch.maximum(norm, self.escape_NaN)
                xi = self._same_pad(match[i:i + 1], 3, 1)
                corr = F.conv2d(xi, ki)                   # (1, L, Hp, Wp)
                attn = F.softmax(corr * self.softmax_scale, dim=1)
                if not self.average:
                    attn = (attn == attn.max(dim=1, keepdim=True)[0]).float()
                rec = F.conv_transpose2d(attn, raw[i], stride=s, padding=s)
                if s == 2:
                    rec = self.down(rec)
                elif s == 3:
                    rec = self.downx3(rec)
                elif s == 4:
                    rec = self.downx4(rec)
                ys.append(rec / 6.0)
            y = torch.cat(ys, dim=0)[:, :, :h, :w]
            outs.append(y)
        return torch.cat(outs, dim=1)


class OracleRDN(nn.Module):
    def __init__(self, in_ch=3, mid=64, blocks=16, layers=8, growth=64):
        super().__init__()
        self.sfe1 = nn.Conv2d(in_ch, mid, 3, padding=1)
        self.sfe2 = nn.Conv2d(mid, mid, 3, padding=1)

        class DenseLayer(nn.Module):
            def __init__(self, cin, g):
                super().__init__()
                self.conv = nn.Conv2d(cin, g, 3, padding=1)

            def forward(self, z):
                return torch.cat([z, F.relu(self.conv(z))], dim=1)

        class RDB(nn.Module):
            def __init__(self, mid, g, n):
                super().__init__()
                self.layers = nn.Sequential(
                    *[DenseLayer(mid + i * g, g) for i in range(n)])
                self.lff = nn.Conv2d(mid + n * g, mid, 1)

            def forward(self, z):
                return z + self.lff(self.layers(z))

        self.rdbs = nn.ModuleList(
            [RDB(mid, growth, layers) for _ in range(blocks)])
        self.gff = nn.Sequential(nn.Conv2d(mid * blocks, mid, 1),
                                 nn.Conv2d(mid, mid, 3, padding=1))

    def forward(self, x):
        s1 = self.sfe1(x)
        z = self.sfe2(s1)
        feats = []
        for blk in self.rdbs:
            z = blk(z)
            feats.append(z)
        return self.gff(torch.cat(feats, dim=1)) + s1


class OracleEDSR(nn.Module):
    def __init__(self, in_ch=3, mid=64, blocks=16, res_scale=1.0):
        super().__init__()
        self.conv_first = nn.Conv2d(in_ch, mid, 3, padding=1)

        class ResBlock(nn.Module):
            def __init__(self, mid):
                super().__init__()
                self.conv1 = nn.Conv2d(mid, mid, 3, padding=1)
                self.conv2 = nn.Conv2d(mid, mid, 3, padding=1)
                self.res_scale = res_scale

            def forward(self, z):
                return z + self.conv2(F.relu(self.conv1(z))) * self.res_scale

        # Sequential (not ModuleList): the reference steals ``encoder.body``
        # and calls it as a module (ciaosr_net.py:388-401); keys unchanged.
        self.body = nn.Sequential(*[ResBlock(mid) for _ in range(blocks)])
        self.conv_after_body = nn.Conv2d(mid, mid, 3, padding=1)

    def forward(self, x):
        z = self.conv_first(x)
        return self.conv_after_body(self.body(z)) + z


class OracleCiaoSR(nn.Module):
    """LocalImplicitSRNet twin: encoder → query_rgb with the 4-shift
    sequential loop, exactly the reference dataflow."""

    def __init__(self, encoder, feat_dim=64, hidden=(256,) * 4, out_dim=3,
                 local_size=2, feat_unfold=True, non_local_attn=True,
                 multi_scale=(2,), softmax_scale=1.0):
        super().__init__()
        self.encoder = encoder
        self.local_size = local_size
        self.feat_unfold = feat_unfold
        self.non_local_attn = non_local_attn
        self.softmax_scale = softmax_scale
        c = feat_dim
        base = c * 9 if feat_unfold else c
        nla = c * len(multi_scale) if non_local_attn else 0
        self.imnet_k = OracleMLP(base + 4, base, hidden)
        self.imnet_v = OracleMLP(base + nla + 4, base + nla, hidden)
        self.imnet_q = OracleMLP(base + nla, out_dim, hidden)
        if non_local_attn:
            self.cs_attn = OracleCSA(channel=c, scales=multi_scale)

    def _nsample(self, feat, coord):
        return F.grid_sample(feat, coord.flip(-1).unsqueeze(1),
                             mode="nearest", align_corners=False)[
            :, :, 0, :].permute(0, 2, 1)

    def query_rgb(self, feature, coord, cell):
        b, c, h, w = feature.shape
        q = coord.shape[1]
        if self.feat_unfold:
            unf = F.unfold(feature, 3, padding=1).view(b, c * 9, h, w)
            feat_q = feat_k = unf
            feat_v = torch.cat([unf, self.cs_attn(feature)], dim=1) \
                if self.non_local_attn else unf
        else:
            feat_q = feat_k = feat_v = feature

        query = self._nsample(feat_q, coord)

        feat_coord = oracle_make_coord((h, w), flatten=False).permute(
            2, 0, 1).unsqueeze(0).expand(b, 2, h, w)

        if self.local_size == 1:
            v_lst = [(0, 0)]
        else:
            step = 4 - self.local_size
            v_lst = [(i, j) for i in range(-1, 2, step)
                     for j in range(-1, 2, step)]

        preds_k, preds_v = [], []
        for vx, vy in v_lst:
            tx = (h - 1) / (1 - cell[:, 0, 0])
            ty = (w - 1) / (1 - cell[:, 0, 1])
            cs = coord.clone()
            if vx != 0:
                cs[:, :, 0] += (vx / abs(vx)) * ((2 * abs(vx) - 1) / tx)[
                    :, None] + 1e-6
            if vy != 0:
                cs[:, :, 1] += (vy / abs(vy)) * ((2 * abs(vy) - 1) / ty)[
                    :, None] + 1e-6
            cs.clamp_(-1 + 1e-6, 1 - 1e-6)

            key = self._nsample(feat_k, cs)
            value = self._nsample(feat_v, cs)
            coord_k = self._nsample(feat_coord, cs)

            rel = coord - coord_k
            rel[:, :, 0] *= h
            rel[:, :, 1] *= w
            cell_hw = cell.clone()
            cell_hw[:, :, 0] *= h
            cell_hw[:, :, 1] *= w

            wk = self.imnet_k(torch.cat([key, rel, cell_hw], dim=-1))
            wv = self.imnet_v(torch.cat([value, rel, cell_hw], dim=-1))
            preds_k.append(key * wk)
            preds_v.append(value * wv)

        pk = torch.stack(preds_k, dim=-1)        # (B,Q,D,S)
        pv = torch.stack(preds_v, dim=-2)        # (B,Q,S,D)
        attn = query.unsqueeze(2) @ pk           # (B,Q,1,S)
        out = (F.softmax(attn / self.softmax_scale, dim=-1) @ pv)[:, :, 0, :]
        return self.imnet_q(out)

    def forward(self, x, coord, cell):
        feature = self.encoder(x)
        pred = self.query_rgb(feature, coord, cell)
        res = F.grid_sample(x, coord.flip(-1).unsqueeze(1), mode="bilinear",
                            padding_mode="border", align_corners=False)[
            :, :, 0, :].permute(0, 2, 1)
        return pred + res
