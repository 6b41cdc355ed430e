"""Optimizers as ops: AdamW and SGD with ggml's exact update rules.

ref: src/ggml-opt.cpp (param block :228-232, beta1h/beta2h bias correction
:788-800) and the device kernels ggml_compute_forward_opt_step_adamw_f32
(src/ggml-cpu/ops.cpp:10302-10368) / opt_step_sgd (:10380-10424). In ggml
the optimizer step is itself graph ops executed by any backend; here the
step is a jit-compiled pure function over the param/grad/momenta pytrees —
same staging, XLA fuses the whole update into one pass over the weights.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AdamWParams:
    """Defaults match ggml_opt_default_optimizer_params (ggml-opt.cpp:228)."""

    alpha: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    wd: float = 0.0


@dataclass(frozen=True)
class SGDParams:
    alpha: float = 1e-3
    wd: float = 0.0


def adamw_init(params):
    zeros = lambda p: jax.tree.map(lambda a: jnp.zeros_like(a), p)
    return {"m": zeros(params), "v": zeros(params), "iter": jnp.ones((), jnp.int32)}


def adamw_step(params, grads, state, hp: AdamWParams = AdamWParams()):
    """One AdamW update. Weight decay decoupled, bias correction via
    beta1h/beta2h exactly as the reference computes them per-iteration."""
    it = state["iter"].astype(jnp.float32)
    beta1h = 1.0 / (1.0 - hp.beta1 ** it)
    beta2h = 1.0 / (1.0 - hp.beta2 ** it)
    keep = 1.0 - hp.alpha * hp.wd

    def upd(w, g, m, v):
        g = g.astype(jnp.float32)
        m = m * hp.beta1 + g * (1.0 - hp.beta1)
        v = v * hp.beta2 + g * g * (1.0 - hp.beta2)
        mh = m * beta1h
        vh = jnp.sqrt(v * beta2h) + hp.eps
        w = w * keep - hp.alpha * mh / vh
        return w, m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    out = [upd(w, g, m, v) for w, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, {"m": new_m, "v": new_v, "iter": state["iter"] + 1}


def sgd_step(params, grads, hp: SGDParams = SGDParams()):
    """w = w*(1 - alpha*wd) - alpha*g (ref opt_step_sgd)."""
    keep = 1.0 - hp.alpha * hp.wd
    return jax.tree.map(lambda w, g: w * keep - hp.alpha * g, params, grads)
