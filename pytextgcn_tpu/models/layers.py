"""Parameter initializers and small building blocks (pure functions over
param pytrees — no module framework, everything explicit for jit/pjit)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot(key, shape, dtype=jnp.float32):
    """Glorot/Xavier uniform — torch-geometric 1.6.3 GCNConv weight init."""
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init (kaiming_uniform, a=sqrt(5)) —
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for 2D weights."""
    fan_in = shape[0]
    limit = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def linear_init(key, in_dim, out_dim):
    """torch.nn.Linear-style init: kaiming weights + uniform bias."""
    kw, kb = jax.random.split(key)
    limit = 1.0 / math.sqrt(in_dim)
    return {
        "w": kaiming_uniform(kw, (in_dim, out_dim)),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -limit, limit),
    }


def gcnconv_init(key, in_dim, out_dim):
    """GCNConv-style init: glorot weights + zero bias (PyG 1.6.3)."""
    return {"w": glorot(key, (in_dim, out_dim)), "b": jnp.zeros((out_dim,))}


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout matching torch.nn.functional.dropout semantics."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def lstm_init(key, in_dim, hidden):
    """Single LSTM layer parameters (torch LSTM gate layout i,f,g,o)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    limit = 1.0 / math.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -limit, limit)
    return {
        "wi": u(k1, (in_dim, 4 * hidden)),
        "wh": u(k2, (hidden, 4 * hidden)),
        "bi": u(k3, (4 * hidden,)),
        "bh": u(k4, (4 * hidden,)),
    }


def lstm_apply(params, xs):
    """Run an LSTM over axis 1 of ``xs`` [B, T, D] -> outputs [B, T, H]."""
    hidden = params["wh"].shape[0]
    b = xs.shape[0]

    def step(carry, x_t):
        h, c = carry
        gates = x_t @ params["wi"] + h @ params["wh"] + params["bi"] + params["bh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((b, hidden)), jnp.zeros((b, hidden)))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


def bilstm_init(key, in_dim, hidden):
    kf, kb = jax.random.split(key)
    return {"fwd": lstm_init(kf, in_dim, hidden), "bwd": lstm_init(kb, in_dim, hidden)}


def bilstm_apply(params, xs):
    """Bidirectional LSTM over axis 1 -> [B, T, 2H]."""
    fwd = lstm_apply(params["fwd"], xs)
    bwd = lstm_apply(params["bwd"], xs[:, ::-1, :])[:, ::-1, :]
    return jnp.concatenate([fwd, bwd], axis=-1)
