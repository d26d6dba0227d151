"""Measurement utilities that survive asynchronous / remote dispatch.

The usual ``block_until_ready`` + wall-clock pattern (and the reference's
CUDA-event pattern, hrt/python/RGNNUtils/RGNNUtils.py:291-345) breaks on
runtimes where dispatch is asynchronous end-to-end and only a host fetch
truly synchronizes (e.g. a remote-tunneled TPU).  Robust recipe:

* build a **chained** computation ``x -> f'(x)`` so successive calls have a
  data dependency (defeats result caching and enqueue pipelining);
* run chains of two different lengths and take the **slope**
  ``(T(n2) - T(n1)) / (n2 - n1)`` so the constant fetch RTT cancels;
* force completion with a tiny host fetch, not ``block_until_ready``;
* median over trials.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def force(x) -> None:
    """Truly synchronize: fetch one scalar of (the first leaf of) ``x``."""
    leaf = jax.tree.leaves(x)[0]
    idx = (0,) * getattr(leaf, "ndim", 0)
    np.asarray(leaf[idx] if getattr(leaf, "ndim", 0) else leaf)


def chain_wrap(op: Callable, x0) -> Callable:
    """Turn ``op`` into a self-chainable ``x -> x'`` with a data dependency
    on ``op(x)``'s result (adds one cheap global reduction)."""

    def step(x):
        out = op(x)
        s = jnp.asarray(0.0, jnp.float32)
        for leaf in jax.tree.leaves(out):
            s = s + jnp.sum(leaf).astype(jnp.float32)
        # 1e-30 scaling keeps the value numerically inert while the data
        # dependency is real (an exact *0 would be algebraically DCE'd)
        eps = s * jnp.asarray(1e-30, jnp.float32)
        return jax.tree.map(lambda a: a + eps.astype(a.dtype), x)

    return step


def op_time_ms(
    op: Callable,
    x0,
    *,
    n1: int = 5,
    n2: int = 45,
    trials: int = 3,
    chained: Optional[Callable] = None,
) -> float:
    """True per-invocation time of ``op(x0)`` in milliseconds.

    ``chained`` overrides the default chain wrapper when ``op`` is already
    ``x -> x``-shaped.
    """
    step = jax.jit(chained if chained is not None else chain_wrap(op, x0))
    x = step(x0)
    force(x)  # compile + settle

    def run(n: int) -> float:
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        force(x)
        return time.perf_counter() - t0

    samples = []
    for _ in range(trials):
        t1 = run(n1)
        t2 = run(n2)
        samples.append((t2 - t1) / (n2 - n1))
    med = float(np.median(samples) * 1e3)
    if med <= 0.0:
        # slope went negative (host-side noise between the two chain
        # lengths — seen under CPU contention): fall back to the long
        # chain's mean, which is an upper bound rather than garbage
        med = float(min(run(n2) / n2 for _ in range(trials)) * 1e3)
    return med


def epoch_time_ms(fn: Callable, *args) -> float:
    """Wall time of one synchronized invocation (includes one fetch RTT —
    fine for epoch-scale measurements)."""
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) * 1e3
