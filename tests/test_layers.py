# -*- coding: utf-8 -*-
"""Activation-layer invariants: the lrelu custom vjp under grad-of-grad.

The WGAN-GP critic path (`/root/reference/trainer/uganTrainer.py` gradient
penalty) differentiates the discriminator's input-gradient norm w.r.t. the
parameters — reverse-over-reverse through every D activation.  Since round
5 the D path uses the same `_lrelu_cv` custom-vjp lrelu as the generator
(models/blocks.py BottleBlock); these tests pin that second derivatives
through it are exact vs the plain `jax.nn.leaky_relu` form, so a future
jax version that rejects reverse-over-reverse custom_vjp fails loudly
here rather than deep inside the GAN step.
"""
import numpy as np

import jax
import jax.numpy as jnp

from smsut_tpu.models.layers import _lrelu_cv, get_act


def _plain(x):
    return jax.nn.leaky_relu(x, negative_slope=1e-2)


def test_lrelu_custom_vjp_grad_of_grad(rng):
    """grad-of-grad of a GP-shaped scalar (||d/dx sum f(x)^2||^2 then grad
    w.r.t. a scale parameter) matches the plain lrelu exactly."""
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))

    def gp(w, act):
        def critic(xi):
            return jnp.sum(jnp.square(act(xi * w)))

        g = jax.grad(critic)(x)
        return jnp.sum(jnp.square(g))

    for w0 in (0.7, -1.3):
        got = jax.grad(gp)(jnp.float32(w0), _lrelu_cv)
        want = jax.grad(gp)(jnp.float32(w0), _plain)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)


def test_lrelu_grad_of_grad_through_bottleblock(rng):
    """Full D-path shape: WGAN-GP style penalty through a stride-2
    BottleBlock (conv+norm+lrelu stack), d(penalty)/d(params) identical
    between the custom-vjp lrelu and a plain-act control built by
    temporarily monkeypatching get_act's table."""
    from smsut_tpu.models.blocks import BottleBlock

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    blk = BottleBlock(features=8, norm_type="instance", act_type="lrelu",
                      stride=2)
    params = blk.init(jax.random.PRNGKey(0), x)

    def penalty(p, act_impl):
        import smsut_tpu.models.layers as L

        orig = L._lrelu_cv
        L._lrelu_cv = act_impl            # routes get_act("lrelu")
        try:
            def critic(xi):
                return jnp.mean(blk.apply(p, xi))

            g = jax.grad(critic)(x)
            return jnp.sum(jnp.square(g))
        finally:
            L._lrelu_cv = orig

    got = jax.grad(penalty)(params, _lrelu_cv)
    want = jax.grad(penalty)(params, _plain)
    flat_a = jax.tree_util.tree_leaves(got)
    flat_b = jax.tree_util.tree_leaves(want)
    assert len(flat_a) == len(flat_b) > 0
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
