"""LR schedules.

Rebuild of the reference's CosineWarmupScheduler
(classifier/utils/train_ssl.py:33-48): linear warmup then cosine decay,
expressed as an optax schedule.
"""

from __future__ import annotations

import optax


def cosine_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, end_lr_frac: float = 0.0):
    warmup_steps = max(1, warmup_steps)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * end_lr_frac,
    )
