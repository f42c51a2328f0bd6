"""SSL (SimCLR-style) training.

Rebuild of classifier/utils/train_ssl.py:51-161: two-view batches, NT-Xent,
AdamW + cosine-warmup schedule, grad clipping, best-loss checkpointing and
early stopping. TPU-native differences:

- the train step is one jit program, data-parallel over a ``data`` mesh axis
  via NamedSharding (params replicated, batch sharded) — XLA inserts the
  gradient psum over ICI; no GradScaler (bf16 on TPU needs no loss scaling,
  SURVEY.md §2.9);
- checkpoints are msgpack pytrees (flax.serialization) with the same
  best/periodic/final roles (ssl_best / ssl_epoch{N} / ssl_model_final).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.ssl_model import SSLModel
from ..models.losses import nt_xent_loss
from ..utils.logging import get_file_logger
from .schedule import cosine_warmup_schedule

logger = get_file_logger(__name__, "data/metadata/train.log")


class SSLTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_ssl_train_step(model: SSLModel, tx: optax.GradientTransformation,
                          temperature: float = 0.5) -> Callable:
    """Returns jit-able step(state, x_i, x_j, rng) -> (state, loss)."""

    def loss_fn(params, batch_stats, x_i, x_j, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        z_i, updates = model.apply(
            variables, x_i, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng})
        z_j, updates = model.apply(
            {"params": params, "batch_stats": updates["batch_stats"]},
            x_j, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, 1)})
        loss = nt_xent_loss(z_i, z_j, temperature)
        return loss, updates["batch_stats"]

    def step(state: SSLTrainState, x_i, x_j, rng):
        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x_i, x_j, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return SSLTrainState(new_params, new_bs, new_opt, state.step + 1), loss

    return step


def init_ssl_state(model: SSLModel, rng: jax.Array, input_shape,
                   tx: optax.GradientTransformation) -> SSLTrainState:
    variables = model.init(rng, jnp.zeros((2,) + tuple(input_shape)), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return SSLTrainState(params, batch_stats, tx.init(params), jnp.int32(0))


def save_checkpoint(path: str | Path, state: SSLTrainState):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "step": int(state.step)}
    path.write_bytes(serialization.to_bytes(payload))


def load_checkpoint(path: str | Path, template: dict) -> dict:
    return serialization.from_bytes(template, Path(path).read_bytes())


def train_ssl(model: SSLModel,
              batches: Callable[[], Any],     # yields (x_i, x_j) numpy pairs
              steps_per_epoch: int,
              epochs: int = 3,
              lr: float = 1e-5,
              weight_decay: float = 1e-4,
              grad_clip: float = 1.0,
              warmup_epochs: int = 5,
              temperature: float = 0.5,
              input_shape=(224, 224),
              seed: int = 42,
              save_dir: str | Path = "save_models",
              save_every: int = 30,
              early_stop_patience: int = 15,
              mesh=None) -> tuple[SSLTrainState, list[float]]:
    """Train loop (train_ssl.py:51-161). ``batches()`` returns an iterator
    of (x_i, x_j) two-view numpy batches for one epoch."""
    save_dir = Path(save_dir)
    schedule = cosine_warmup_schedule(lr, warmup_epochs * steps_per_epoch,
                                      epochs * steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )

    rng = jax.random.PRNGKey(seed)
    state = init_ssl_state(model, rng, input_shape, tx)
    step_fn = jax.jit(create_ssl_train_step(model, tx, temperature))

    data_sharding = None
    if mesh is not None:
        data_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        state = jax.device_put(state, replicated)

    history: list[float] = []
    best_loss = float("inf")
    patience = 0
    for epoch in range(epochs):
        t0 = time.time()
        losses = []
        for bi, (x_i, x_j) in enumerate(batches()):
            xi = jnp.asarray(x_i)
            xj = jnp.asarray(x_j)
            if data_sharding is not None:
                xi = jax.device_put(xi, data_sharding)
                xj = jax.device_put(xj, data_sharding)
            rng, sub = jax.random.split(rng)
            state, loss = step_fn(state, xi, xj, sub)
            losses.append(float(loss))
        epoch_loss = float(np.mean(losses)) if losses else float("inf")
        history.append(epoch_loss)
        logger.info("epoch %d: loss=%.4f (%.1fs)", epoch, epoch_loss,
                    time.time() - t0)

        if epoch_loss < best_loss:
            best_loss = epoch_loss
            patience = 0
            save_checkpoint(save_dir / "ssl_best.msgpack", state)
        else:
            patience += 1
            if patience >= early_stop_patience:
                logger.info("early stop at epoch %d", epoch)
                break
        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(save_dir / f"ssl_epoch{epoch + 1}.msgpack", state)

    save_checkpoint(save_dir / "ssl_model_final.msgpack", state)
    return state, history


def train_ssl_device(model: SSLModel,
                     data: np.ndarray,               # (N, H, W) uint8
                     batch_size: int,
                     epochs: int = 30,
                     lr: float = 1e-3,
                     weight_decay: float = 1e-4,
                     grad_clip: float = 1.0,
                     warmup_epochs: int = 2,
                     temperature: float = 0.5,
                     image_size: int = 224,
                     seed: int = 42,
                     save_dir: str | Path = "save_models",
                     save_every: int = 30,
                     early_stop_patience: int = 15,
                     ) -> tuple[SSLTrainState, list[float]]:
    """Device-resident SSL training: the uint8 dataset is shipped to the
    chip ONCE and both contrastive views are rendered inside the jit step
    (classifier.augment_device), so per-epoch host->device traffic drops
    from ~2 * N * image_size^2 * 4 bytes to N_batches permutation indices.
    Same loop semantics as ``train_ssl`` (train_ssl.py:51-161 lineage):
    AdamW + cosine warmup, grad clip, best/periodic/final checkpoints,
    early stopping. Use for datasets that fit in HBM as uint8 (a 16 GB v5e
    chip holds ~190k 320x256 images)."""
    from ..classifier.augment_device import augment_batch

    save_dir = Path(save_dir)
    n = data.shape[0]
    steps_per_epoch = max(1, n // batch_size)
    schedule = cosine_warmup_schedule(lr, warmup_epochs * steps_per_epoch,
                                      epochs * steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )

    rng = jax.random.PRNGKey(seed)
    state = init_ssl_state(model, rng, (image_size, image_size), tx)
    base_step = create_ssl_train_step(model, tx, temperature)

    @jax.jit
    def step(state: SSLTrainState, data_dev, idx, rng):
        x = jnp.take(data_dev, idx, axis=0).astype(jnp.float32) / 255.0
        x_i = augment_batch(x, jax.random.fold_in(rng, 0), image_size)
        x_j = augment_batch(x, jax.random.fold_in(rng, 1), image_size)
        return base_step(state, x_i, x_j, jax.random.fold_in(rng, 2))

    data_dev = jax.device_put(np.asarray(data, dtype=np.uint8))
    perm_rng = np.random.default_rng(seed)

    history: list[float] = []
    best_loss = float("inf")
    patience = 0
    for epoch in range(epochs):
        t0 = time.time()
        order = perm_rng.permutation(n)
        losses = []
        for b in range(steps_per_epoch):
            idx = jnp.asarray(order[b * batch_size:(b + 1) * batch_size])
            rng, sub = jax.random.split(rng)
            state, loss = step(state, data_dev, idx, sub)
            losses.append(loss)
        epoch_loss = float(np.mean([float(l) for l in losses]))
        history.append(epoch_loss)
        logger.info("epoch %d: loss=%.4f (%.1fs)", epoch, epoch_loss,
                    time.time() - t0)

        if epoch_loss < best_loss:
            best_loss = epoch_loss
            patience = 0
            save_checkpoint(save_dir / "ssl_best.msgpack", state)
        else:
            patience += 1
            if patience >= early_stop_patience:
                logger.info("early stop at epoch %d", epoch)
                break
        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(save_dir / f"ssl_epoch{epoch + 1}.msgpack", state)

    save_checkpoint(save_dir / "ssl_model_final.msgpack", state)
    return state, history
