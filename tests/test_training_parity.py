# -*- coding: utf-8 -*-
"""End-to-end training parity: starting from identical weights and data, a
few supervised steps in SMSUT-TPU and in a torch re-derivation of the
reference loop (Dice+CE, SGD momentum 0.9 + coupled wd 1e-3, per-iteration
poly LR with the reference's one-step lag — `trainer/unetTrainer.py:48,82-84`)
produce matching losses and parameters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from smsut_tpu.config import Config
from smsut_tpu.models import UNet
from smsut_tpu.train.state import TrainState, make_sgd
from smsut_tpu.ops.losses import dice_and_ce_loss
from tests.test_full_model_parity import TUNet, W, _conv_w, _convT_w, _load_block, _load_norm


def _torch_dice_ce(logits, labels):
    probs = F.softmax(logits, 1)
    gt = torch.zeros_like(probs).scatter_(1, labels.unsqueeze(1), 1)
    tp = (probs * gt).sum((0, 2, 3))
    fp = (probs * (1 - gt)).sum((0, 2, 3))
    fn = ((1 - probs) * gt).sum((0, 2, 3))
    dc = ((2 * tp + 1e-5) / (2 * tp + fp + fn + 1e-5 + 1e-8))[1:]
    return 0.5 * (1 - dc.mean()) + 0.5 * F.cross_entropy(logits, labels)


def test_sgd_training_steps_match(rng):
    cfg = Config(input_size=64, base_width=W, batch_size=2,
                 compute_dtype="float32", num_iter_per_epoch=10, max_epoch=2)
    net = UNet(out_ch=5, width=W, norm_type="instance", act_type="lrelu")
    x = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)
    y = rng.integers(0, 5, size=(2, 64, 64))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    state = TrainState.create(params, make_sgd(cfg))

    # torch twin with transplanted weights
    t = TUNet(w=W)
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

    opt = torch.optim.SGD(t.parameters(), lr=cfg.lr, momentum=0.9,
                          weight_decay=cfg.weight_decay)
    tx, ty = torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(y)

    @jax.jit
    def step(state):
        def loss_fn(p):
            logits = net.apply({"params": p}, jnp.asarray(x))
            return dice_and_ce_loss(logits, jnp.asarray(y), 0.5, 0.5, True)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    it = 0
    for k in range(4):
        state, jl = step(state)
        opt.zero_grad()
        tl = _torch_dice_ce(t(tx), ty)
        tl.backward()
        opt.step()
        # reference per-iteration poly LR mutation (applied after the step)
        lr_ = cfg.lr * (1.0 - it / cfg.total_iters) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr_
        it += 1
        np.testing.assert_allclose(float(jl), tl.item(), rtol=2e-3,
                                   atol=2e-4, err_msg=f"loss diverged at step {k}")

    # parameters still matching after 4 coupled-wd momentum steps
    got = np.asarray(state.params["decoder"]["fc"]["kernel"]).transpose(3, 2, 0, 1)
    want = t.fc.weight.detach().numpy()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)
    got_pre = np.asarray(state.params["encoder"]["pre_conv"]["kernel"]).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(got_pre, t.pre_conv.weight.detach().numpy(),
                               rtol=5e-3, atol=5e-4)
