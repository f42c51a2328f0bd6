"""UNet++ segmentation training.

Rebuild of src/preprocessing/segmentation/train.py:51-348: pairs dataset
images with masks self-produced by the classical pipeline (stem matching,
:125-141), seeded split (:188-192), AdamW with plateau LR scaling
(:210-226), loss = bce_weight * BCE + FocalTversky (:269-273), grad clip,
val dice/IoU, best-dice + periodic checkpoints, early stopping, resume.

TPU-native: the train step is one jit program; no AMP GradScaler (bf16 on
TPU needs no loss scaling).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from ..config import load_segmentation_config
from ..models.unetpp import NestedUNet
from ..models.losses import (
    bce_with_logits, focal_tversky_loss, dice_coeff, iou_score,
)
from ..utils.logging import console_step, get_file_logger

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

logger = get_file_logger(__name__, "data/metadata/seg_train.log")


def collect_image_mask_paths(images_dir: str | Path, masks_dir: str | Path
                             ) -> list[tuple[Path, Path]]:
    """Pair images with classical-pipeline masks by stem (train.py:125-141).
    Masks live under <masks_dir>/**/mask/<name>."""
    images_dir, masks_dir = Path(images_dir), Path(masks_dir)
    masks = {}
    for m in masks_dir.rglob("*"):
        if m.is_file() and m.parent.name == "mask":
            masks[m.stem] = m
    pairs = []
    for img in sorted(images_dir.rglob("*")):
        if img.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp"}:
            m = masks.get(img.stem)
            if m is not None:
                pairs.append((img, m))
    return pairs


def _load_pair(img_path: Path, mask_path: Path, size: int
               ) -> tuple[np.ndarray, np.ndarray]:
    img = cv2.imread(str(img_path), cv2.IMREAD_COLOR)  # 3ch (model.py:89-99)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA)
    mask = cv2.imread(str(mask_path), cv2.IMREAD_GRAYSCALE)
    mask = cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)
    return (img.astype(np.float32) / 255.0,
            (mask > 127).astype(np.float32)[..., None])


def _augment(img, mask, rng, acfg):
    if rng.random() < acfg.get("hflip_prob", 0.5):
        img, mask = img[:, ::-1], mask[:, ::-1]
    if rng.random() < acfg.get("vflip_prob", 0.2):
        img, mask = img[::-1], mask[::-1]
    if rng.random() < acfg.get("rotate_prob", 0.5):
        angle = rng.uniform(-acfg.get("rotate_limit", 15),
                            acfg.get("rotate_limit", 15))
        h, w = img.shape[:2]
        m = cv2.getRotationMatrix2D((w // 2, h // 2), angle, 1.0)
        img = cv2.warpAffine(img, m, (w, h), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT_101)
        mask = cv2.warpAffine(mask[..., 0], m, (w, h),
                              flags=cv2.INTER_NEAREST)[..., None]
    if rng.random() < acfg.get("brightness_contrast_prob", 0.3):
        img = np.clip(img * rng.uniform(0.8, 1.2) + rng.uniform(-0.1, 0.1), 0, 1)
    return np.ascontiguousarray(img), np.ascontiguousarray(mask)


class SegTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def _write_curves(path: Path, history: list[dict]) -> None:
    """Training-curve CSV (epoch, loss, val_dice, val_iou) rewritten each
    epoch — the crash-safe equivalent of the reference's TensorBoard scalars
    (train.py:237-243,304-308)."""
    import csv

    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["epoch", "loss", "val_dice",
                                          "val_iou"])
        w.writeheader()
        w.writerows(history)


def train_from_config(config_path: str | None = None,
                      pairs: list | None = None) -> dict:
    """Train UNet++ per the segmentation YAML (train.py:151-348)."""
    cfg = load_segmentation_config(config_path)
    seed = cfg.get("experiment.seed", 42)
    rng = np.random.default_rng(seed)

    size = cfg.get("dataset.image_size", 256)
    batch = cfg.get("dataset.batch_size", 4)
    if pairs is None:
        pairs = collect_image_mask_paths(
            cfg.get("dataset.images_dir", "dataset/DBII"),
            cfg.get("dataset.masks_dir", "dataset/processed/debug"))
    if not pairs:
        raise FileNotFoundError("no image/mask pairs found")
    console_step(f"Segmentation training: {len(pairs)} pairs")

    # seeded split (train.py:188-192)
    order = rng.permutation(len(pairs))
    n_val = max(1, int(len(pairs) * cfg.get("dataset.val_split", 0.2)))
    val_idx, train_idx = order[:n_val], order[n_val:]
    if len(train_idx) == 0:
        train_idx = val_idx

    model = NestedUNet(filters=tuple(cfg.get("model.filters",
                                             [64, 128, 256, 512, 1024])))
    lr = cfg.get("optimizer.lr", 1.5e-4)
    epochs = cfg.get("training.epochs", 10)
    # Scheduler choice (reference train.py:210-226 offered OneCycle or
    # ReduceLROnPlateau; round 1 only had plateau).
    sched_type = str(cfg.get("scheduler.type", "plateau")).lower()
    if sched_type == "onecycle":
        steps_per_epoch = max(1, len(train_idx) // batch)
        pct_start = cfg.get("scheduler.pct_start", 0.3)
        # warmup must span >= 1 step or optax's piecewise interpolation
        # divides by a zero-size interval (NaN lr on tiny runs)
        total_steps = max(epochs * steps_per_epoch,
                          int(np.ceil(1.0 / pct_start)) + 1)
        lr_for_tx = optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=lr,
            pct_start=pct_start,
            div_factor=cfg.get("scheduler.div_factor", 25.0),
            final_div_factor=cfg.get("scheduler.final_div_factor", 1e4))
    else:
        lr_for_tx = lr
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.get("training.grad_clip", 1.0)),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_for_tx,
            weight_decay=cfg.get("optimizer.weight_decay", 5e-4)),
    )
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, size, size, 3)), train=False)
    state = SegTrainState(variables["params"],
                          variables.get("batch_stats", {}),
                          tx.init(variables["params"]))

    ckpt_dir = Path(cfg.get("training.checkpoint_dir",
                            "save_models/segmentation"))
    resume = cfg.get("misc.resume_from_checkpoint")
    start_epoch = 0
    if resume and Path(resume).exists():
        payload = serialization.from_bytes(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "epoch": 0},
            Path(resume).read_bytes())
        state = SegTrainState(payload["params"], payload["batch_stats"],
                              payload["opt_state"])
        start_epoch = int(payload["epoch"]) + 1
        logger.info("resumed from %s at epoch %d", resume, start_epoch)

    bce_w = cfg.get("loss.bce_weight", 0.7)
    ft = cfg.get("loss.focal_tversky", {})
    ft_args = (ft.get("alpha", 0.7), ft.get("beta", 0.3), ft.get("gamma", 0.75))

    def loss_fn(params, batch_stats, x, y, drng):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": drng})
        loss = bce_w * bce_with_logits(out, y) + focal_tversky_loss(out, y, *ft_args)
        return loss, updates["batch_stats"]

    @jax.jit
    def train_step(state: SegTrainState, x, y, drng):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, x, y, drng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return SegTrainState(new_params, new_bs, new_opt), loss

    @jax.jit
    def eval_step(state: SegTrainState, x, y):
        out = model.apply({"params": state.params,
                           "batch_stats": state.batch_stats}, x, train=False)
        return dice_coeff(out, y), iou_score(out, y)

    def batches(idx, train_mode):
        idx = rng.permutation(idx) if train_mode else idx
        for i in range(0, len(idx) - batch + 1, batch):
            xs, ys = [], []
            for k in idx[i:i + batch]:
                img, mask = _load_pair(*pairs[int(k)], size)
                if train_mode:
                    img, mask = _augment(img, mask, rng, cfg.get("augmentation", {}))
                xs.append(img)
                ys.append(mask)
            yield jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys))

    # Training-curve observability (reference train.py:237-243 used
    # TensorBoard): always write a CSV curve artifact; add TensorBoard
    # scalars when the package is importable (gated, not required).
    curves_path = Path(cfg.get("logging.curves_csv",
                               str(ckpt_dir / "training_curve.csv")))
    tb_writer = None
    if cfg.get("logging.tensorboard", False):
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(
                log_dir=cfg.get("logging.tensorboard_dir", "logs/tb_seg"))
        except ImportError:
            logger.warning("tensorboard not installed; CSV curves only")

    jrng = jax.random.PRNGKey(seed)
    best_dice = -1.0
    patience = 0
    plateau = 0
    history = []
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        losses = []
        for x, y in batches(train_idx, True):
            jrng, sub = jax.random.split(jrng)
            state, loss = train_step(state, x, y, sub)
            losses.append(float(loss))
        dices, ious = [], []
        for x, y in batches(val_idx, False):
            d, i = eval_step(state, x, y)
            dices.append(float(d))
            ious.append(float(i))
        val_dice = float(np.mean(dices)) if dices else 0.0
        val_iou = float(np.mean(ious)) if ious else 0.0
        history.append({"epoch": epoch, "loss": float(np.mean(losses) if losses else 0),
                        "val_dice": val_dice, "val_iou": val_iou})
        logger.info("epoch %d: loss=%.4f dice=%.4f iou=%.4f (%.1fs)",
                    epoch, history[-1]["loss"], val_dice, val_iou,
                    time.time() - t0)
        _write_curves(curves_path, history)
        if tb_writer is not None:
            tb_writer.add_scalar("train/loss", history[-1]["loss"], epoch)
            tb_writer.add_scalar("val/dice", val_dice, epoch)
            tb_writer.add_scalar("val/iou", val_iou, epoch)

        def save(name):
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            payload = {"params": state.params, "batch_stats": state.batch_stats,
                       "opt_state": state.opt_state, "epoch": epoch}
            (ckpt_dir / name).write_bytes(serialization.to_bytes(payload))

        if val_dice > best_dice:
            best_dice = val_dice
            patience = 0
            plateau = 0
            save("best.msgpack")
        else:
            patience += 1
            plateau += 1
            # ReduceLROnPlateau (train.py:210-226); OneCycle schedules the
            # per-step lr inside the optimizer, so no mutation there.
            if sched_type != "onecycle" and plateau >= cfg.get(
                    "scheduler.patience", 2):
                plateau = 0
                factor = cfg.get("scheduler.factor", 0.5)
                state.opt_state[1].hyperparams["learning_rate"] = (
                    state.opt_state[1].hyperparams["learning_rate"] * factor)
                logger.info("plateau: lr scaled by %.2f", factor)
            if patience >= cfg.get("training.early_stop_patience", 5):
                logger.info("early stop at epoch %d", epoch)
                break
        save("last.msgpack")

    if tb_writer is not None:
        tb_writer.close()
    return {"best_dice": best_dice, "history": history,
            "checkpoint_dir": str(ckpt_dir),
            "curves_csv": str(curves_path)}


if __name__ == "__main__":
    train_from_config()
