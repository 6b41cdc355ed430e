"""High-level training loops: eval / epoch / fit.

ref: src/ggml-opt.cpp — ggml_opt_eval :781, ggml_opt_epoch :880 (train/val
split, per-batch loss/accuracy accumulation), ggml_opt_fit :998 (epoch
driver with progress output). The graph-with-optimizer-nodes pattern maps to
one jit-compiled train_step (loss+grads+update fused by XLA); gradient
accumulation over opt_period mirrors the reference's accumulate-then-step.
"""
from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .dataset import Dataset
from .opt import AdamWParams, adamw_init, adamw_step


@dataclass
class FitResult:
    train_loss: list = field(default_factory=list)
    val_loss: list = field(default_factory=list)
    val_acc: list = field(default_factory=list)


def make_train_step(loss_fn: Callable, hp: AdamWParams, opt_period: int = 1):
    """loss_fn(params, batch_x, batch_y) → scalar loss.

    Returns jitted step(params, opt_state, grad_acc, ibatch, x, y) implementing
    gradient accumulation over opt_period micro-batches (the reference
    accumulates grads in the graph and steps every opt_period evals,
    src/ggml-opt.cpp:700-780)."""

    @jax.jit
    def step(params, opt_state, grad_acc, ibatch, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        grad_acc = jax.tree.map(lambda a, g: a + g, grad_acc, grads)
        do_step = (ibatch + 1) % opt_period == 0

        def apply(args):
            p, st, acc = args
            mean_g = jax.tree.map(lambda a: a / opt_period, acc)
            new_p, new_st = adamw_step(p, mean_g, st, hp)
            zeros = jax.tree.map(jnp.zeros_like, acc)
            return new_p, new_st, zeros

        params, opt_state, grad_acc = jax.lax.cond(
            do_step, apply, lambda args: args, (params, opt_state, grad_acc))
        return params, opt_state, grad_acc, loss

    return step


def fit(loss_fn: Callable,
        params,
        dataset: Dataset,
        batch_size: int,
        n_epochs: int = 1,
        val_split: float = 0.0,
        hp: AdamWParams = AdamWParams(),
        opt_period: int = 1,
        accuracy_fn: Callable | None = None,
        seed: int = 0,
        verbose: bool = True,
        checkpoint_dir: str | None = None) -> tuple[object, FitResult]:
    """ggml_opt_fit analogue. Returns (trained params, FitResult).

    checkpoint_dir: when set, the full training state (params, optimizer
    moments, grad accumulator, RNG + dataset shuffle state, metrics) is
    checkpointed after every epoch via training/checkpoint.py, and a fresh
    call with the same directory resumes bit-exactly after the last
    completed epoch."""
    rng = np.random.default_rng(seed)
    n = dataset.ndata
    n_train = int(n * (1.0 - val_split)) // batch_size * batch_size
    n_batches = n_train // batch_size
    n_val_batches = (n - n_train) // batch_size

    step = make_train_step(loss_fn, hp, opt_period)
    eval_loss = jax.jit(loss_fn)
    opt_state = adamw_init(params)
    grad_acc = jax.tree.map(jnp.zeros_like, params)
    result = FitResult()
    start_epoch = 0

    if checkpoint_dir is not None:
        from . import checkpoint as ckpt

        saved = ckpt.restore_latest(checkpoint_dir)
        if saved is not None:
            params = jax.tree.map(jnp.asarray, saved["params"])
            opt_state = jax.tree.map(jnp.asarray, saved["opt_state"])
            grad_acc = jax.tree.map(jnp.asarray, saved["grad_acc"])
            rng = ckpt.decode_rng(saved["rng"])
            dataset._perm[:] = saved["dataset_perm"]
            import json

            metrics = json.loads(bytes(
                np.asarray(saved["metrics"], np.uint8)).decode())
            result = FitResult(metrics["train_loss"], metrics["val_loss"],
                               metrics["val_acc"])
            start_epoch = int(saved["epoch"]) + 1
            if verbose and start_epoch < n_epochs:
                print(f"resuming from epoch {start_epoch}", file=sys.stderr)

    if start_epoch == 0:
        dataset.shuffle(rng)  # initial shuffle over everything (incl. val)
    for epoch in range(start_epoch, n_epochs):
        dataset.shuffle(rng, n_train)  # reshuffle only the training split
        t0 = time.time()
        losses = []
        for ib in range(n_batches):
            from ..utils import abort

            abort.check()   # cooperative-cancel poll point per batch
            x, y = dataset.get_batch(ib, batch_size)
            params, opt_state, grad_acc, loss = step(
                params, opt_state, grad_acc, jnp.int32(ib),
                jnp.asarray(x), jnp.asarray(y))
            losses.append(float(loss))
        result.train_loss.append(float(np.mean(losses)))
        vl, va = [], []
        for ib in range(n_batches, n_batches + n_val_batches):
            x, y = dataset.get_batch(ib, batch_size)
            vl.append(float(eval_loss(params, jnp.asarray(x), jnp.asarray(y))))
            if accuracy_fn is not None:
                va.append(float(accuracy_fn(params, jnp.asarray(x), jnp.asarray(y))))
        if vl:
            result.val_loss.append(float(np.mean(vl)))
        if va:
            result.val_acc.append(float(np.mean(va)))
        if verbose:
            msg = (f"epoch {epoch + 1}/{n_epochs}: "
                   f"train_loss={result.train_loss[-1]:.4f}")
            if vl:
                msg += f" val_loss={result.val_loss[-1]:.4f}"
            if va:
                msg += f" val_acc={result.val_acc[-1]:.4f}"
            msg += f" ({time.time() - t0:.1f}s)"
            print(msg, file=sys.stderr)
        if checkpoint_dir is not None:
            import json

            from . import checkpoint as ckpt

            metrics = json.dumps({
                "train_loss": result.train_loss,
                "val_loss": result.val_loss,
                "val_acc": result.val_acc,
            })
            ckpt.save(checkpoint_dir, epoch, {
                "params": params,
                "opt_state": opt_state,
                "grad_acc": grad_acc,
                "rng": ckpt.encode_rng(rng),
                "dataset_perm": np.asarray(dataset._perm),
                "epoch": np.int64(epoch),
                "metrics": np.frombuffer(metrics.encode(),
                                         np.uint8).copy(),
            })
    return params, result
