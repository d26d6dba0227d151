"""Mixed-precision helpers: parameter casting + dynamic loss scaling.

TPU-native mixed precision keeps **f32 master parameters and optimizer
state** and runs the model compute in bfloat16 (MXU-native).  bf16 carries
f32's exponent range, so — unlike fp16 on GPUs — gradient underflow is
rare and loss scaling is usually unnecessary; it is provided here both as
a safety rail for deep stacks and because small-magnitude tails do lose
mantissa in bf16 accumulation.  (The reference has no mixed-precision
support at all; this subsystem is new surface, per BASELINE.md's
production-training goal.)

``DynamicLossScale`` follows the standard AMP recipe: multiply the loss by
the current scale, unscale gradients, skip the optimizer step when any
gradient is non-finite and halve the scale, double it again after
``growth_interval`` consecutive finite steps.  All state lives in a small
pytree so the whole policy stays inside one jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of ``tree`` to ``dtype`` (int leaves
    untouched).  Under autodiff the cast transposes to a cast-back, which
    is exactly master-weight mixed precision."""
    def _cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x).astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def all_finite(tree: Any) -> Array:
    """Scalar bool: every element of every leaf is finite."""
    leaves = jax.tree.leaves(tree)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return ok


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LossScaleState:
    scale: Array  # f32 scalar
    good_steps: Array  # int32 scalar


@dataclass(frozen=True)
class DynamicLossScale:
    init_scale: float = 2.0**15
    growth_interval: int = 200
    factor: float = 2.0
    min_scale: float = 1.0
    max_scale: float = 2.0**24

    def init_state(self) -> LossScaleState:
        return LossScaleState(
            scale=jnp.asarray(self.init_scale, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
        )

    def scale(self, loss: Array, state: LossScaleState) -> Array:
        return loss * state.scale.astype(loss.dtype)

    def unscale(self, grads: Any, state: LossScaleState) -> Any:
        inv = (1.0 / state.scale).astype(jnp.float32)
        return jax.tree.map(lambda g: g * inv.astype(g.dtype), grads)

    def update(self, state: LossScaleState, finite: Array) -> LossScaleState:
        grown = state.good_steps + 1 >= self.growth_interval
        new_scale = jnp.where(
            finite,
            jnp.where(
                grown,
                jnp.minimum(state.scale * self.factor, self.max_scale),
                state.scale,
            ),
            jnp.maximum(state.scale / self.factor, self.min_scale),
        )
        new_good = jnp.where(
            jnp.logical_and(finite, jnp.logical_not(grown)),
            state.good_steps + 1,
            jnp.asarray(0, jnp.int32),
        )
        return LossScaleState(scale=new_scale, good_steps=new_good)


class NoOpLossScale:
    """Scale-free stand-in with the same interface (bf16 default)."""

    def init_state(self) -> LossScaleState:
        return LossScaleState(
            scale=jnp.asarray(1.0, jnp.float32),
            good_steps=jnp.asarray(0, jnp.int32),
        )

    def scale(self, loss, state):
        return loss

    def unscale(self, grads, state):
        return grads

    def update(self, state, finite):
        return state


def make_loss_scale(spec) -> Tuple[Any, bool]:
    """(policy, dynamic?) from a config spec: 'none' | 'dynamic' | float."""
    if spec in (None, "none", 0, 0.0):
        return NoOpLossScale(), False
    if spec == "dynamic":
        return DynamicLossScale(), True
    s = float(spec)

    class _Static(NoOpLossScale):
        def init_state(self):
            return LossScaleState(
                scale=jnp.asarray(s, jnp.float32),
                good_steps=jnp.asarray(0, jnp.int32),
            )

        def scale(self, loss, state):
            return loss * state.scale.astype(loss.dtype)

        def unscale(self, grads, state):
            inv = (1.0 / state.scale).astype(jnp.float32)
            return jax.tree.map(lambda g: g * inv.astype(g.dtype), grads)

    return _Static(), False
