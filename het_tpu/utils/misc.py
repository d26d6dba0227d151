"""Small runtime utilities mirroring reference conveniences.

* :class:`EarlyStopping` — patience-based stopper (reference:
  hrt/python/GAT/GAT_utils.py).
* :func:`build_info` — provenance string (reference ``build_debug_info``
  generated op, hrt/buildutils/genutils/gen_headers.py:17-40).
* :func:`warn_default_arguments` — call-site auditing decorator (reference
  hrt/python/utils_lite/utils.py:11-44): warns when a callsite relies on
  default arguments, to keep sweep configs explicit.
"""

from __future__ import annotations

import functools
import inspect
import subprocess
import warnings
from typing import Optional


class EarlyStopping:
    """Stop when the monitored value fails to improve for ``patience``
    checks; keeps the best value and step."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "min"):
        assert mode in ("min", "max")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.best_step = -1
        self.bad = 0
        self.stopped = False

    def update(self, value: float, step: int = 0) -> bool:
        """Returns True when training should stop."""
        better = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if better:
            self.best = value
            self.best_step = step
            self.bad = 0
        else:
            self.bad += 1
            if self.bad >= self.patience:
                self.stopped = True
        return self.stopped


def build_info() -> str:
    """Git sha + backend/versions provenance string."""
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip()
    except Exception:
        sha = "unknown"
    import jax

    return (
        f"het_tpu @ {sha}; jax {jax.__version__}; "
        f"backend {jax.default_backend()}; devices {len(jax.devices())}"
    )


def warn_default_arguments(fn):
    """Warn once per callsite when ``fn`` is invoked relying on defaults."""
    sig = inspect.signature(fn)
    defaults = {
        k for k, p in sig.parameters.items()
        if p.default is not inspect.Parameter.empty
    }
    warned = set()

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs)
        missing = defaults - set(bound.arguments)
        if missing:
            frame = inspect.stack()[1]
            site = (frame.filename, frame.lineno)
            if site not in warned:
                warned.add(site)
                warnings.warn(
                    f"{fn.__qualname__} called with default(s) "
                    f"{sorted(missing)} at {site[0]}:{site[1]}",
                    stacklevel=2,
                )
        return fn(*args, **kwargs)

    return wrapper


def nll_loss(logits, labels, num_classes: int = None, mask=None):
    """Mean negative log-likelihood computed with a ONE-HOT contraction.

    ``jnp.take_along_axis(logp, labels[:, None], 1)`` lowers to a
    per-element gather that the round-4 device trace measured at 2 GB/s
    (0.55 ms of an 11.75 ms training step at mag scale); the one-hot
    multiply-reduce is a fused elementwise pass.  ``mask`` (optional,
    float) weights rows (minibatch padding)."""
    import jax
    import jax.numpy as jnp

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    C = num_classes or logits.shape[-1]
    oh = jax.nn.one_hot(labels, C, dtype=jnp.float32)
    ll = jnp.sum(logp * oh, axis=-1)
    if mask is not None:
        return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return -jnp.mean(ll)
