"""Optax trainer with truncated BPTT.

Rebuild of the reference's training loop (ref: JLM:train/train.py
``run_epoch`` — SURVEY.md §4.8, §5.2): epoch loop over BPTT windows
carrying LSTM state, gradient clipping by global norm, multiplicative lr
decay after a start epoch, per-epoch dev perplexity, checkpoints into a
per-experiment dir.

TPU-first differences from the TF 1.x reference: one jitted
``value_and_grad`` train step (no session), optax optimizer chain with
``inject_hyperparams`` for the decayed lr, and the whole window scanned on
device via :func:`jlm_tpu.models.lstm.forward_hidden`.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jlm_tpu.config import Config
from jlm_tpu.data.reader import bptt_batches
from jlm_tpu.models.heads import full_softmax_loss, sampled_softmax_loss
from jlm_tpu.models.lstm import forward_hidden, initial_state
from jlm_tpu.models.params import init_params
from jlm_tpu.train.checkpoint import append_log, save_checkpoint


def make_optimizer(config: Config) -> optax.GradientTransformation:
    base = optax.adam if config.optimizer == "adam" else optax.sgd
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            base(learning_rate),
        )
    )(learning_rate=config.learning_rate)


def epoch_lr(config: Config, epoch: int) -> float:
    """lr · decay^max(0, epoch − start): the reference's decay schedule."""
    k = max(0, epoch - config.lr_decay_start_epoch)
    return config.learning_rate * (config.lr_decay ** k)


class Trainer:
    def __init__(self, config: Config, params: Optional[Any] = None):
        self.config = config
        self.params = params if params is not None else init_params(config)
        self.params = jax.tree.map(jnp.asarray, self.params)
        self.opt = make_optimizer(config)
        self.opt_state = self.opt.init(self.params)
        self._train_step = jax.jit(self._train_step_fn)
        self._eval_step = jax.jit(self._eval_step_fn)

    # --- jitted bodies -------------------------------------------------
    def _loss(self, params, x, y, state, rng):
        hs, state = forward_hidden(params, self.config, x, state)
        if self.config.sampled_softmax_samples > 0:
            loss = sampled_softmax_loss(params, self.config, hs, y, rng)
        else:
            loss = full_softmax_loss(params, self.config, hs, y)
        return loss, state

    def _train_step_fn(self, params, opt_state, state, x, y, rng, lr):
        (loss, state), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, x, y, state, rng
        )
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, state, loss

    def _eval_step_fn(self, params, state, x, y):
        hs, state = forward_hidden(params, self.config, x, state)
        return full_softmax_loss(params, self.config, hs, y), state

    # --- loops ---------------------------------------------------------
    def run_epoch(self, ids: np.ndarray, epoch: int, rng: jax.Array) -> float:
        cfg = self.config
        state = initial_state(cfg, cfg.batch_size)
        lr = jnp.float32(epoch_lr(cfg, epoch))
        total, n = 0.0, 0
        for x, y in bptt_batches(ids, cfg.batch_size, cfg.num_steps):
            rng, sub = jax.random.split(rng)
            self.params, self.opt_state, state, loss = self._train_step(
                self.params, self.opt_state, state, jnp.asarray(x), jnp.asarray(y),
                sub, lr,
            )
            total += float(loss) * x.size
            n += x.size
        return float(np.exp(total / max(1, n)))

    def evaluate_ppl(self, ids: np.ndarray) -> float:
        """Dev/test perplexity with the full-softmax objective.

        Always full softmax (sampled softmax is a training-only
        approximation), matching the reference's eval pass [SURVEY.md §3.1
        "PPL evaluator"].
        """
        cfg = self.config
        state = initial_state(cfg, cfg.batch_size)
        total, n = 0.0, 0
        for x, y in bptt_batches(ids, cfg.batch_size, cfg.num_steps):
            loss, state = self._eval_step(
                self.params, state, jnp.asarray(x), jnp.asarray(y)
            )
            total += float(loss) * x.size
            n += x.size
        return float(np.exp(total / max(1, n)))


def train_lm(
    config: Config,
    train_ids: np.ndarray,
    dev_ids: np.ndarray,
    exp_dir: Optional[str] = None,
    log: bool = True,
) -> Tuple[Any, List[Dict[str, float]]]:
    """Full training run; returns (params, per-epoch history)."""
    trainer = Trainer(config)
    rng = jax.random.key(config.seed)
    history: List[Dict[str, float]] = []
    for epoch in range(config.epochs):
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        train_ppl = trainer.run_epoch(train_ids, epoch, sub)
        dev_ppl = trainer.evaluate_ppl(dev_ids)
        rec = {
            "epoch": epoch,
            "lr": epoch_lr(config, epoch),
            "train_ppl": train_ppl,
            "dev_ppl": dev_ppl,
            "seconds": time.time() - t0,
        }
        history.append(rec)
        if log:
            print(
                f"epoch {epoch}: train_ppl={train_ppl:.2f} "
                f"dev_ppl={dev_ppl:.2f} lr={rec['lr']:.4g} "
                f"({rec['seconds']:.1f}s)"
            )
        if exp_dir:
            append_log(exp_dir, rec)
            save_checkpoint(exp_dir, jax.tree.map(np.asarray, trainer.params),
                            config, tag="latest")
    return trainer.params, history
