"""Optimizer factory + piecewise-constant LR schedule.

Reference: optimizer dispatch (inference_mlp.py:264-280, TF1 defaults) and
``tf.train.piecewise_constant`` over absolute global-step boundaries
(run_dnn.py:124-126, dmt.conf:79-81).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..core.config import DMTConfig


def piecewise_constant(boundaries: tuple[int, ...],
                       rates: tuple[float, ...]):
    """lr(step) = rates[i] for step in (boundaries[i-1], boundaries[i]].

    Same semantics as tf.train.piecewise_constant: len(rates) ==
    len(boundaries) + 1; step <= boundaries[0] -> rates[0].
    """
    if len(rates) != len(boundaries) + 1:
        # tolerate a truncated rates list by padding with the last rate,
        # matching how the reference config pairs 2 rates w/ 1 boundary
        rates = tuple(rates) + (rates[-1],) * (len(boundaries) + 1 - len(rates))
    b = jnp.asarray(boundaries, jnp.int32)
    r = jnp.asarray(rates, jnp.float32)

    def schedule(step):
        idx = jnp.sum((jnp.asarray(step) > b).astype(jnp.int32))
        return r[idx]

    return schedule


def ftrl(learning_rate, learning_rate_power: float = -0.5,
         initial_accumulator_value: float = 0.1,
         l1: float = 0.0, l2: float = 0.0) -> optax.GradientTransformation:
    """FTRL-Proximal (tf.train.FtrlOptimizer defaults) — absent from optax,
    implemented from the McMahan et al. 2013 update."""

    def init_fn(params):
        import jax
        return {
            "n": jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params),
            "z": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def update_fn(grads, state, params):
        import jax
        step = state["step"] + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        p = learning_rate_power

        def per_leaf(g, n, z, w):
            n_new = n + g * g
            sigma = (n_new ** -p - n ** -p) / lr
            z_new = z + g - sigma * w
            # closed-form proximal solution
            w_new = jnp.where(
                jnp.abs(z_new) <= l1,
                0.0,
                -(z_new - jnp.sign(z_new) * l1)
                / ((n_new ** -p) / lr + 2 * l2))
            return n_new, z_new, w_new

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_n = treedef.flatten_up_to(state["n"])
        flat_z = treedef.flatten_up_to(state["z"])
        flat_w = treedef.flatten_up_to(params)
        outs = [per_leaf(g, n, z, w)
                for g, n, z, w in zip(flat_g, flat_n, flat_z, flat_w)]
        n_new = treedef.unflatten([o[0] for o in outs])
        z_new = treedef.unflatten([o[1] for o in outs])
        w_new = treedef.unflatten([o[2] for o in outs])
        updates = jax.tree_util.tree_map(lambda wn, w: wn - w, w_new, params)
        return updates, {"n": n_new, "z": z_new, "step": step}

    return optax.GradientTransformation(init_fn, update_fn)


def f32_math(base: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``base`` in float32 for low-precision parameter leaves.

    Moments initialize and accumulate in f32, gradients upcast before
    the update math, and the computed update downcasts to the param
    dtype only at the very end — so bf16-STORED tables pay exactly one
    bf16 rounding per step (at the parameter write), matching the lazy
    path's "bf16 storage, f32 update math" scheme.  Identity for f32
    params (their moments were f32 already), so optimizer state for
    existing f32-only checkpoints is unchanged."""
    import jax

    def up32(t):
        return (t.astype(jnp.float32)
                if hasattr(t, "dtype") and t.dtype in (jnp.bfloat16,
                                                       jnp.float16)
                else t)

    def init_fn(params):
        return base.init(jax.tree_util.tree_map(up32, params))

    def update_fn(grads, state, params=None):
        g32 = jax.tree_util.tree_map(up32, grads)
        updates, state = base.update(g32, state, params)
        updates = jax.tree_util.tree_map(
            lambda u, g: u.astype(g.dtype), updates, grads)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: DMTConfig) -> optax.GradientTransformation:
    schedule = piecewise_constant(cfg.step_boundary, cfg.learning_rate)
    name = cfg.optimizer.lower()
    if name == "sgd":
        return optax.sgd(schedule)
    if name == "adadelta":
        return optax.adadelta(schedule)
    if name == "adagrad":
        # tf.train.AdagradOptimizer default initial accumulator 0.1
        return optax.adagrad(schedule, initial_accumulator_value=0.1)
    if name == "adam":
        # TF1 AdamOptimizer defaults: b1=0.9 b2=0.999 eps=1e-8.
        # f32_math: bf16-stored dense tables (table_bf16_threshold) get
        # f32 moments + f32 update arithmetic with ONE bf16 rounding at
        # the parameter write — the same contract as the lazy-Adam path
        # for big tables, whose quality the r3 ladder validated.  Plain
        # optax.adam would keep bf16 moments and round every
        # intermediate (the dense-path hazard the Trainer used to warn
        # about).  No-op for f32 params.
        return f32_math(optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8))
    if name == "ftrl":
        return ftrl(schedule)
    if name == "rmsprop":
        # tf.train.RMSPropOptimizer defaults: decay=0.9, momentum=0, eps=1e-10
        return optax.rmsprop(schedule, decay=0.9, eps=1e-10)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
