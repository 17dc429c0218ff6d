"""Core functional layers: dense / MLP stacks / batch-norm / dropout.

Params are plain nested-dict pytrees (init fns build them, apply fns consume
them) — no module framework, so shardings can be attached per-leaf and the
whole tree threads through ``jit``/``shard_map`` untouched.

Numerical semantics mirror the reference's hand-rolled layers:
- dense towers: truncated-normal(0.1) weights + constant bias
  (reference model/net/base.py:28-37)
- hand-rolled batch-norm with moving stats (base.py:44-63); moving stats
  live in a separate non-trainable ``state`` tree
- dropout via keep-prob (tf.nn.dropout semantics, base.py:65-66) and via
  rate (tf.layers.dropout semantics used by the bias net,
  mmoe_transformer_unbias.py:274-278)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Params = dict
State = dict


# ---------------------------------------------------------------------------
# Initializers (match TF1 defaults used by the reference)
# ---------------------------------------------------------------------------


def truncated_normal(stddev: float = 0.1):
    def init(rng, shape, dtype=jnp.float32):
        return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)
    return init


def glorot_uniform():
    """tf.contrib.layers.xavier_initializer / tf.layers.dense default."""
    def init(rng, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        limit = jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(rng, shape, dtype, -limit, limit)
    return init


def constant(value: float):
    def init(rng, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init


zeros = constant(0.0)
ones = constant(1.0)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(rng, in_dim: int, out_dim: int, *, w_init=None,
               bias_init: float = 0.0, dtype=jnp.float32) -> Params:
    w_init = w_init or truncated_normal(0.1)
    wk, _ = jax.random.split(rng)
    return {
        "w": w_init(wk, (in_dim, out_dim), dtype),
        "b": jnp.full((out_dim,), bias_init, dtype),
    }


def dense_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout_keep(rng, x: jnp.ndarray, keep_prob: float, deterministic: bool) -> jnp.ndarray:
    """tf.nn.dropout semantics: keep with prob p, scale by 1/p."""
    if deterministic or keep_prob >= 1.0:
        return x
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))


def dropout_rate(rng, x: jnp.ndarray, rate: float, deterministic: bool) -> jnp.ndarray:
    """tf.layers.dropout semantics: drop with prob rate."""
    return dropout_keep(rng, x, 1.0 - rate, deterministic)


# ---------------------------------------------------------------------------
# Batch norm (reference base.py:44-63: hand-rolled, eps=1e-4)
# ---------------------------------------------------------------------------


def batchnorm_init(rng, dim: int, dtype=jnp.float32) -> tuple[Params, State]:
    sk, hk = jax.random.split(rng)
    params = {
        "scale": truncated_normal(0.1)(sk, (dim,), dtype),
        "shift": truncated_normal(0.1)(hk, (dim,), dtype),
    }
    state = {
        "moving_mean": jnp.zeros((dim,), dtype),
        "moving_var": jnp.zeros((dim,), dtype),
    }
    return params, state


def batchnorm_apply(params: Params, state: State, x: jnp.ndarray, *,
                    train: bool, decay: float, eps: float = 1e-4):
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        new_state = {
            "moving_mean": state["moving_mean"] * decay + mean * (1 - decay),
            "moving_var": state["moving_var"] * decay + var * (1 - decay),
        }
    else:
        mean, var = state["moving_mean"], state["moving_var"]
        new_state = state
    inv = jax.lax.rsqrt(var.astype(x.dtype) + eps)
    y = (x - mean.astype(x.dtype)) * inv * params["scale"].astype(x.dtype) \
        + params["shift"].astype(x.dtype)
    return y, new_state


# ---------------------------------------------------------------------------
# The reference's dense_layer: dense -> (bn) -> activation -> (dropout)
# ---------------------------------------------------------------------------


def dense_layer_init(rng, in_dim: int, out_dim: int, *, bias_init: float = 0.1,
                     is_bn: bool = False, w_init=None, dtype=jnp.float32):
    """Init for one reference-style dense layer (base.py:39-68)."""
    dk, bk = jax.random.split(rng)
    params: Params = {"dense": dense_init(dk, in_dim, out_dim,
                                          w_init=w_init, bias_init=bias_init,
                                          dtype=dtype)}
    state: State = {}
    if is_bn:
        params["bn"], state = batchnorm_init(bk, out_dim, dtype)
    return params, state


def dense_layer_apply(params: Params, state: State, x: jnp.ndarray, *,
                      activation: Callable, keep_prob: float = 1.0,
                      train: bool, is_bn: bool, is_dropout: bool,
                      bn_decay: float = 0.999,
                      rng: Optional[jax.Array] = None):
    y = dense_apply(params["dense"], x)
    new_state = state
    if is_bn:
        y, new_state = batchnorm_apply(params["bn"], state, y,
                                       train=train, decay=bn_decay)
    y = activation(y)
    if is_dropout and train and keep_prob < 1.0:
        y = dropout_keep(rng, y, keep_prob, deterministic=False)
    return y, new_state


# ---------------------------------------------------------------------------
# MLP stack (hidden relu layers + optional linear output)
# ---------------------------------------------------------------------------


def mlp_init(rng, in_dim: int, hidden: tuple[int, ...], out_dim: Optional[int],
             *, is_bn: bool = False, out_bias_init: float = 0.0,
             hidden_bias_init: float = 0.1, w_init=None, dtype=jnp.float32):
    params: Params = {}
    state: State = {}
    dim = in_dim
    keys = jax.random.split(rng, len(hidden) + 1)
    for i, size in enumerate(hidden):
        params[f"layer{i}"], st = dense_layer_init(
            keys[i], dim, size, bias_init=hidden_bias_init, is_bn=is_bn,
            w_init=w_init, dtype=dtype)
        if st:
            state[f"layer{i}"] = st
        dim = size
    if out_dim is not None:
        params["out"], st = dense_layer_init(
            keys[-1], dim, out_dim, bias_init=out_bias_init, is_bn=is_bn,
            w_init=w_init, dtype=dtype)
        if st:
            state["out"] = st
    return params, state


def mlp_apply(params: Params, state: State, x: jnp.ndarray, *,
              keep_probs: tuple[float, ...] = (),
              train: bool, is_bn: bool = False, is_dropout: bool = False,
              bn_decay: float = 0.999, rng: Optional[jax.Array] = None,
              out_activation: Callable = lambda y: y):
    new_state: State = {}
    y = x
    n_hidden = sum(1 for k in params if k.startswith("layer"))
    if rng is not None:
        keys = jax.random.split(rng, n_hidden + 1)
    else:
        keys = [None] * (n_hidden + 1)
    for i in range(n_hidden):
        name = f"layer{i}"
        kp = keep_probs[i] if i < len(keep_probs) else 1.0
        y, st = dense_layer_apply(
            params[name], state.get(name, {}), y,
            activation=jax.nn.relu, keep_prob=kp, train=train,
            is_bn=is_bn, is_dropout=is_dropout, bn_decay=bn_decay,
            rng=keys[i])
        if st:
            new_state[name] = st
    if "out" in params:
        y, st = dense_layer_apply(
            params["out"], state.get("out", {}), y,
            activation=out_activation, keep_prob=1.0, train=train,
            is_bn=is_bn, is_dropout=is_dropout, bn_decay=bn_decay,
            rng=keys[-1])
        if st:
            new_state["out"] = st
    return y, new_state


def layer_norm_init(rng, dim: int, dtype=jnp.float32) -> Params:
    return {"gamma": jnp.ones((dim,), dtype), "beta": jnp.zeros((dim,), dtype)}


def layer_norm_apply(params: Params, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Reference ln (TransformerModel_util.py:58-78): eps inside the sqrt.

    Statistics accumulate in float32 regardless of the compute dtype
    (bf16-safe), output keeps the input dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normalized = ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    return params["gamma"].astype(x.dtype) * normalized + params["beta"].astype(x.dtype)
