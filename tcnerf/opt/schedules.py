"""Learning-rate schedules (optax) matching the reference's semantics."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_constant_schedule(target_lr: float, warmup_steps: int,
                             scale_down_after: int = 400000):
    """Linear warmup -> constant -> x0.1 after `scale_down_after` steps.

    Reference: WarmupScheduler, src/lib/mvnerf/nerf_utils.py:288-300.
    """
    warmup = max(1.0, float(warmup_steps))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step <= warmup,
            step / warmup * target_lr,
            jnp.where(step <= scale_down_after, target_lr, 0.1 * target_lr),
        )

    return schedule


def exponential_decay(init_lr: float, decay_rate: float, decay_steps: int = 1):
    """Continuous exponential decay: lr = init * rate^(step / decay_steps).

    Reference: tf.keras ExponentialDecay(staircase=False),
    src/utils/optimization.py:49-61.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return init_lr * jnp.power(decay_rate, step / decay_steps)

    return schedule
