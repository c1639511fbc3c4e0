# -*- coding: utf-8 -*-
"""Full UGAN forward parity vs a torch re-derivation of
`network/ugan.py:22-123`: twin encoders (translation tower sees the tiled
modality one-hot diff as extra channels), a SHARED enc5 bottleneck block,
bilinear+tanh translation decoder, transposed-conv segmentation decoder,
skips consumed in reversed order."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from smsut_tpu.models import UGAN
from tests.test_full_model_parity import TBlock, _conv_w, _convT_w, _load_block, _load_norm

W = 8
N_MODAL = 4


class TUGANEncoder(nn.Module):
    def __init__(self, in_ch, w=W):
        super().__init__()
        self.pre_conv = nn.Conv2d(in_ch, w // 2, 5, padding=2, bias=False)
        self.pre_bn = nn.InstanceNorm2d(w // 2, affine=True)
        self.act = nn.LeakyReLU(0.01)
        self.enc = nn.ModuleList([TBlock(w // 2, w), TBlock(w, 2 * w),
                                  TBlock(2 * w, 4 * w), TBlock(4 * w, 8 * w)])

    def forward(self, x):
        x = self.act(self.pre_bn(self.pre_conv(x)))
        skips = []
        for blk in self.enc:
            x = blk(x)
            skips.append(x)
            x = F.max_pool2d(x, 2)
        skips.reverse()  # [e4, e3, e2, e1] (`ugan.py:54`)
        return x, skips


class TUGANDecoder(nn.Module):
    def __init__(self, out_ch, w=W, transposed=True, use_tanh=False):
        super().__init__()
        self.transposed = transposed
        self.use_tanh = use_tanh
        if transposed:
            self.ups = nn.ModuleList([
                nn.ConvTranspose2d(16 * w, 8 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(8 * w, 4 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(4 * w, 2 * w, 2, 2, bias=False),
                nn.ConvTranspose2d(2 * w, w, 2, 2, bias=False)])
        else:
            self.ups = nn.ModuleList([
                nn.Conv2d(16 * w, 8 * w, 1, bias=False),
                nn.Conv2d(8 * w, 4 * w, 1, bias=False),
                nn.Conv2d(4 * w, 2 * w, 1, bias=False),
                nn.Conv2d(2 * w, w, 1, bias=False)])
        self.dec = nn.ModuleList([TBlock(16 * w, 8 * w), TBlock(8 * w, 4 * w),
                                  TBlock(4 * w, 2 * w), TBlock(2 * w, w)])
        self.fc = nn.Conv2d(w, out_ch, 1, bias=True)

    def forward(self, x, skips):
        for up, blk, sk in zip(self.ups, self.dec, skips):
            if self.transposed:
                x = up(x)
            else:
                x = up(F.interpolate(x, scale_factor=2, mode="bilinear",
                                     align_corners=False))
            x = blk(torch.cat([x, sk], 1))
        x = self.fc(x)
        return torch.tanh(x) if self.use_tanh else x


class TUGAN(nn.Module):
    def __init__(self, w=W, out_ch=5, n_modal=N_MODAL):
        super().__init__()
        self.n_modal = n_modal
        self.tsl_encoder = TUGANEncoder(1 + n_modal, w)
        self.seg_encoder = TUGANEncoder(1, w)
        self.enc5 = TBlock(8 * w, 16 * w)
        self.tsl_decoder = TUGANDecoder(1, w, transposed=False, use_tanh=True)
        self.seg_decoder = TUGANDecoder(out_ch, w, transposed=True)

    def forward(self, x, m):
        mmap = m.view(m.size(0), m.size(1), 1, 1).repeat(1, 1, x.size(2), x.size(3))
        th, ts = self.tsl_encoder(torch.cat([x, mmap], 1))
        tsl = self.tsl_decoder(self.enc5(th), ts)
        sh, ss = self.seg_encoder(x)
        seg = self.seg_decoder(self.enc5(sh), ss)
        return seg, tsl


def _load_encoder(tenc, p):
    tenc.pre_conv.weight.data = _conv_w(p["pre_conv"]["kernel"])
    _load_norm(tenc.pre_bn, p["pre_bn"])
    for i in range(4):
        _load_block(tenc.enc[i], p[f"enc{i + 1}"])


def _load_decoder(tdec, p, transposed):
    for n, i in enumerate((4, 3, 2, 1)):
        up = p[f"up{i}"]
        if transposed:
            tdec.ups[n].weight.data = _convT_w(up["up"]["kernel"])
        else:
            tdec.ups[n].weight.data = _conv_w(up["up_conv"]["kernel"])
        _load_block(tdec.dec[n], p[f"dec{i}"])
    tdec.fc.weight.data = _conv_w(p["fc"]["kernel"])
    tdec.fc.bias.data = torch.tensor(np.asarray(p["fc"]["bias"]))


def test_ugan_forward_matches_torch(rng):
    net = UGAN(out_ch=5, n_modal=N_MODAL, width=W)
    x = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    m = np.eye(N_MODAL, dtype=np.float32)[[1, 3]] - np.eye(N_MODAL, dtype=np.float32)[[0, 2]]
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(m))["params"]
    seg_j, tsl_j = net.apply({"params": params}, jnp.asarray(x), jnp.asarray(m))

    core = params["core"]
    t = TUGAN()
    _load_encoder(t.tsl_encoder, core["tsl_encoder"])
    _load_encoder(t.seg_encoder, core["seg_encoder"])
    _load_block(t.enc5, core["enc5"])
    _load_decoder(t.tsl_decoder, core["tsl_decoder"], transposed=False)
    _load_decoder(t.seg_decoder, core["seg_decoder"], transposed=True)

    with torch.no_grad():
        seg_t, tsl_t = t(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(m))
    np.testing.assert_allclose(np.asarray(seg_j),
                               seg_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tsl_j),
                               tsl_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=5e-4)  # tanh saturation jitter
