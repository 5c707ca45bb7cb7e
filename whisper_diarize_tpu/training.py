"""Fine-tuning step for Whisper models (teacher-forced cross-entropy).

The reference is inference-only; the TPU framework adds a training path so
checkpoints can be adapted (domain fine-tuning, distillation to turbo-style
decoders). The step is pure JAX: loss over `decoder_forward_nocache` logits,
optax optimizer, and sharding via GSPMD propagation — parameters placed with
`parallel/mesh.py::shard_params` (tensor parallel) and batches with
`data_sharding` (data parallel); XLA inserts the ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from .models import whisper as wm


def loss_fn(
    params: Dict[str, Any],
    cfg: wm.WhisperConfig,
    mel: jnp.ndarray,  # [B, n_mels, 3000]
    tokens: jnp.ndarray,  # [B, S] int32 (full target incl. sot/eot)
    loss_mask: jnp.ndarray,  # [B, S-1] f32 — 1 where the *predicted* token counts
) -> jnp.ndarray:
    xa = wm.encode(params, mel, cfg)
    logits = wm.decoder_forward_nocache(params, cfg, tokens[:, :-1], xa)
    labels = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return (nll * loss_mask).sum() / jnp.maximum(loss_mask.sum(), 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(cfg: wm.WhisperConfig, optimizer):
    """Returns a jittable (params, opt_state, mel, tokens, mask) -> step fn."""

    @jax.jit
    def train_step(params, opt_state, mel, tokens, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, mel, tokens, loss_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
