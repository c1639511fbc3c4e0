# -*- coding: utf-8 -*-
"""Full-model forward parity: the flax U-Net with weights transplanted into a
torch re-derivation of the reference architecture (`network/blocks.py`,
`network/unet.py`) produces the same logits.  This pins the whole wiring —
stem, residual blocks, shortcut placement, pooling, transposed-conv upsample,
skip concat order, 1x1 head — not just individual layers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from smsut_tpu.config import Config
from smsut_tpu.models import UNet

W = 8  # base width


class TBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = nn.InstanceNorm2d(cout, affine=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.InstanceNorm2d(cout, affine=True)
        self.down = cin != cout
        if self.down:
            self.shortcut1 = nn.Conv2d(cin, cout, 1, bias=False)
            self.shortcut2 = nn.InstanceNorm2d(cout, affine=True)
        self.act = nn.LeakyReLU(0.01)

    def forward(self, x):
        idn = x
        y = self.act(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.down:
            idn = self.shortcut2(self.shortcut1(idn))
        return self.act(y + idn)


class TUNet(nn.Module):
    def __init__(self, w=W, out_ch=5):
        super().__init__()
        self.pre_conv = nn.Conv2d(1, w // 2, 5, padding=2, bias=False)
        self.pre_bn = nn.InstanceNorm2d(w // 2, affine=True)
        self.act = nn.LeakyReLU(0.01)
        self.enc = nn.ModuleList([TBlock(w // 2, w), TBlock(w, 2 * w),
                                  TBlock(2 * w, 4 * w), TBlock(4 * w, 8 * w)])
        self.bott = TBlock(8 * w, 16 * w)
        self.ups = nn.ModuleList([
            nn.ConvTranspose2d(16 * w, 8 * w, 2, 2, bias=False),
            nn.ConvTranspose2d(8 * w, 4 * w, 2, 2, bias=False),
            nn.ConvTranspose2d(4 * w, 2 * w, 2, 2, bias=False),
            nn.ConvTranspose2d(2 * w, w, 2, 2, bias=False)])
        self.dec = nn.ModuleList([TBlock(16 * w, 8 * w), TBlock(8 * w, 4 * w),
                                  TBlock(4 * w, 2 * w), TBlock(2 * w, w)])
        self.fc = nn.Conv2d(w, out_ch, 1, bias=False)

    def forward(self, x):
        x = self.act(self.pre_bn(self.pre_conv(x)))
        skips = []
        for blk in self.enc:
            x = blk(x)
            skips.append(x)
            x = F.max_pool2d(x, 2)
        x = self.bott(x)
        for up, blk, sk in zip(self.ups, self.dec, reversed(skips)):
            x = blk(torch.cat([up(x), sk], 1))
        return self.fc(x)


def _conv_w(k):
    return torch.tensor(np.asarray(k).transpose(3, 2, 0, 1).copy())


def _convT_w(k):
    # flax ConvTranspose kernel [kh,kw,cin,cout] -> torch [cin,cout,kh,kw],
    # spatially flipped (flax applies the unflipped kernel)
    return torch.tensor(np.asarray(k)[::-1, ::-1].transpose(2, 3, 0, 1).copy())


def _load_norm(tmod, p):
    tmod.weight.data = torch.tensor(np.asarray(p["scale"]))
    tmod.bias.data = torch.tensor(np.asarray(p["bias"]))


def _load_block(tblk, p):
    tblk.conv1.weight.data = _conv_w(p["conv1"]["kernel"])
    tblk.conv2.weight.data = _conv_w(p["conv2"]["kernel"])
    _load_norm(tblk.bn1, p["bn1"])
    _load_norm(tblk.bn2, p["bn2"])
    if tblk.down:
        tblk.shortcut1.weight.data = _conv_w(p["shortcut1"]["kernel"])
        _load_norm(tblk.shortcut2, p["shortcut2"])


def test_unet_forward_matches_torch(rng):
    net = UNet(out_ch=5, width=W, norm_type="instance", act_type="lrelu")
    x = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    want = np.asarray(net.apply({"params": params}, jnp.asarray(x)))

    t = TUNet()
    enc = params["encoder"]
    t.pre_conv.weight.data = _conv_w(enc["pre_conv"]["kernel"])
    _load_norm(t.pre_bn, enc["pre_bn"])
    for i in range(4):
        _load_block(t.enc[i], enc[f"layer{i + 1}"])
    _load_block(t.bott, enc["layer5"])
    dec = params["decoder"]
    for n, i in enumerate((4, 3, 2, 1)):
        t.ups[n].weight.data = _convT_w(dec[f"up{i}"]["up"]["kernel"])
        _load_block(t.dec[n], dec[f"layer{i}"])
    t.fc.weight.data = _conv_w(dec["fc"]["kernel"])

    with torch.no_grad():
        got = t(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
