# -*- coding: utf-8 -*-
"""Discriminator forward parity vs a torch re-derivation of
`network/ugan.py:198-229` + `network/blocks.py:83-117` (BottleBlock with
stride-2 avg-pool shortcut), weights transplanted from the flax model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from smsut_tpu.models import Discriminator

SIZE, W = 64, 4  # repeat_num = log2(64)-2 = 4 -> 3 bottle blocks, k=4


class TBottle(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
        self.bn1 = nn.InstanceNorm2d(cout, affine=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.InstanceNorm2d(cout, affine=True)
        self.down = cin != cout
        if self.down:
            self.sconv = nn.Conv2d(cin, cout, 1, bias=False)
            self.snorm = nn.InstanceNorm2d(cout, affine=True)
        self.act = nn.LeakyReLU(0.01)

    def forward(self, x):  # stride-2 variant only (as the D uses)
        y = self.act(self.bn1(self.conv1(x)))
        y = F.avg_pool2d(y, 2)
        y = self.bn2(self.conv2(y))
        idn = F.avg_pool2d(x, 2)
        if self.down:
            idn = self.snorm(self.sconv(idn))
        return self.act(y + idn)


class TDisc(nn.Module):
    def __init__(self, size=SIZE, n_modal=4, w=W, max_w=256):
        super().__init__()
        self.stem = nn.Conv2d(1, w, 4, 2, 1)
        self.act = nn.LeakyReLU(0.01)
        repeat = int(np.log2(size)) - 2
        blocks, cin = [], w
        for _ in range(1, repeat):
            cout = min(cin * 2, max_w)
            blocks.append(TBottle(cin, cout))
            cin = cout
        self.blocks = nn.ModuleList(blocks)
        k = size // 2 ** repeat
        self.conv_src = nn.Conv2d(cin, 1, 3, padding=1, bias=False)
        self.conv_cls = nn.Conv2d(cin, n_modal, k, bias=False)

    def forward(self, x):
        x = self.act(self.stem(x))
        for b in self.blocks:
            x = b(x)
        return self.conv_src(x), self.conv_cls(x).flatten(1)


def _w(k):
    return torch.tensor(np.asarray(k).transpose(3, 2, 0, 1).copy())


def _norm(tmod, p):
    tmod.weight.data = torch.tensor(np.asarray(p["scale"]))
    tmod.bias.data = torch.tensor(np.asarray(p["bias"]))


def test_discriminator_matches_torch(rng):
    d = Discriminator(input_size=SIZE, n_modal=4, width=W, max_width=256)
    x = rng.normal(size=(2, SIZE, SIZE, 1)).astype(np.float32)
    params = d.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    src_j, cls_j = d.apply({"params": params}, jnp.asarray(x))

    t = TDisc()
    t.stem.weight.data = _w(params["stem"]["kernel"])
    t.stem.bias.data = torch.tensor(np.asarray(params["stem"]["bias"]))
    for i, blk in enumerate(t.blocks, start=1):
        p = params[f"block{i}"]
        blk.conv1.weight.data = _w(p["conv1"]["kernel"])
        blk.conv2.weight.data = _w(p["conv2"]["kernel"])
        _norm(blk.bn1, p["bn1"])
        _norm(blk.bn2, p["bn2"])
        if blk.down:
            blk.sconv.weight.data = _w(p["short_conv"]["kernel"])
            _norm(blk.snorm, p["short_norm"])
    t.conv_src.weight.data = _w(params["conv_src"]["kernel"])
    t.conv_cls.weight.data = _w(params["conv_cls"]["kernel"])

    with torch.no_grad():
        src_t, cls_t = t(torch.tensor(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(src_j),
                               src_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cls_j), cls_t.numpy(),
                               rtol=1e-3, atol=1e-4)
