"""Optimizers.

``torch_amsgrad`` reproduces ``th.optim.Adam(lr, amsgrad=True)`` — the
reference's update rule (flat_amazon.py:89) — *exactly*, update for update.
It exists because ``optax.amsgrad`` implements a different AMSGrad variant:

  * torch keeps the running max over the **uncorrected** second moment
    ``v_t`` and divides by ``sqrt(1 - b2^t)`` fresh every step
    (torch/optim/adam.py::_single_tensor_adam — ``max_exp_avg_sqs`` /
    ``bias_correction2_sqrt``), so its denominator *shrinks* as the
    correction factor decays toward 1;
  * optax maxes the **bias-corrected** ``v_t / (1 - b2^t)``
    (optax scale_by_amsgrad), which freezes the denominator at the
    early-step-inflated value ``max_s v_s / (1 - b2^s)``.

Since ``1/(1 - b2^s)`` is largest for small ``s``, optax's denominator is
always >= torch's, i.e. optax takes systematically *smaller* steps — at
lr=0.05 over 500 epochs this produced the consistent ~1-point
torch-over-JAX accuracy offset in docs/protocol_results.csv (VERDICT r2
Weak #1; bisected in experiments/bisect_offset.py). This transformation is
therefore the Trainer default: parity with the reference's optimizer is the
product.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class TorchAmsgradState(NamedTuple):
    count: chex.Array  # int32 step counter
    mu: optax.Updates  # first moment (uncorrected)
    nu: optax.Updates  # second moment (uncorrected)
    nu_max: optax.Updates  # running max of the UNCORRECTED second moment


def scale_by_torch_amsgrad(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch ``Adam(amsgrad=True)`` numerics as a gradient transformation.

    Per parameter leaf (torch/optim/adam.py, non-capturable branch)::

        m_t   = b1 m_{t-1} + (1-b1) g
        v_t   = b2 v_{t-1} + (1-b2) g^2
        vmax  = max(vmax, v_t)                      # uncorrected!
        denom = sqrt(vmax) / sqrt(1 - b2^t) + eps
        step  = (1 / (1 - b1^t)) * m_t / denom      # scaled by -lr outside
    """

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return TorchAmsgradState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros(), nu_max=zeros()
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, updates
        )
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1**t
        bc2_sqrt = jnp.sqrt(1 - b2**t)
        out = jax.tree.map(
            lambda m, vm: (m / bc1) / (jnp.sqrt(vm) / bc2_sqrt + eps),
            mu,
            nu_max,
        )
        return out, TorchAmsgradState(count=count, mu=mu, nu=nu, nu_max=nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_amsgrad(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """The reference's exact optimizer: ``th.optim.Adam(lr, amsgrad=True)``
    with torch defaults ``betas=(0.9, 0.999), eps=1e-8`` (flat_amazon.py:89).
    """
    return optax.chain(
        scale_by_torch_amsgrad(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )


def resolve_optimizer(optimizer, lr: float) -> optax.GradientTransformation:
    """Resolve the Trainer's ``optimizer`` argument.

    ``None`` -> the flat-protocol parity default ``torch_amsgrad(lr)``
    (flat_amazon.py:89 / flat_dbpedia.py:89 are the only reference drivers
    that pass ``amsgrad=True``); ``"adam"`` -> ``optax.adam(lr)``, which is
    numerically identical to torch's plain ``Adam`` (the reference's
    hierarchy/hyperopt/MLP drivers: perlevel_amazon.py:84,
    perlabel_amazon.py:124, old/h_o_train.py:98, MLP_flat.py:68);
    ``"torch_amsgrad"``/``"amsgrad"`` -> torch_amsgrad; ``"optax_amsgrad"``
    -> the optax variant (kept reachable for the bisection, see
    experiments/bisect_offset.py); any optax transformation -> itself.
    """
    if optimizer is None:
        return torch_amsgrad(lr)
    if isinstance(optimizer, str):
        table = {
            "adam": optax.adam,
            "amsgrad": torch_amsgrad,
            "torch_amsgrad": torch_amsgrad,
            "optax_amsgrad": optax.amsgrad,
        }
        if optimizer not in table:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        return table[optimizer](lr)
    return optimizer
