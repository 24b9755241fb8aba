"""Adam with per-leaf (and per-iteration) learning rates, for use inside
``lax.scan`` optimizer loops.

Replaces torch.optim.Adam param groups (reference Tracker.py:415,
Mapper.py:590-603): a "group" becomes a pytree leaf whose learning rate is
supplied per step, so the mapper's per-stage LR programming
(Mapper.py:644-666) turns into precomputed LR arrays scanned alongside the
iteration index — no host round-trips.

Matches torch Adam defaults: beta=(0.9, 0.999), eps=1e-8 added after the
sqrt, bias correction, no weight decay.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def init(params):
    # jitted: an eager tree of zeros_like dispatches ~3 ops per leaf through
    # the tunnelled runtime (~4 ms each) — one fused program instead
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params),
            "t": jnp.zeros((), jnp.int32)}


def update(grads, state, params, lr, b1: float = 0.9, b2: float = 0.999,
           eps: float = 1e-8):
    """One Adam step.

    lr: scalar, or a pytree matching ``params``' outer structure (each leaf a
    scalar traced value — e.g. this iteration's LR for that param group).
    """
    t = state["t"] + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf

    new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state["m"], grads)
    new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                         state["v"], grads)

    if isinstance(lr, (float, int)) or hasattr(lr, "dtype"):
        lr_tree = jax.tree.map(lambda _: lr, params)
    else:
        lr_tree = lr

    def step(p, m, v, l):
        mh = m / c1
        vh = v / c2
        return p - l * mh / (jnp.sqrt(vh) + eps)

    new_params = jax.tree.map(step, params, new_m, new_v, lr_tree)
    return new_params, {"m": new_m, "v": new_v, "t": t}
