"""Diffusion noise schedule + samplers, as pure functions.

Behavioral reference: the diffusers PNDM/DDIM schedulers the reference's
StableDiffusionPipeline uses (modeling_sd.py:94-102): SD-1.5
scaled_linear betas 0.00085→0.012 over 1000 train steps; training noise
injection via `add_noise`; inference denoising loop. Here the loop is a
single `lax.scan` — the whole 50-step denoise compiles into one XLA
program instead of the reference's host-driven python loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiffusionSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    schedule: str = "scaled_linear"

    def alphas_cumprod(self) -> np.ndarray:
        if self.schedule == "scaled_linear":
            betas = np.linspace(self.beta_start ** 0.5,
                                self.beta_end ** 0.5,
                                self.num_train_timesteps,
                                dtype=np.float64) ** 2
        elif self.schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end,
                                self.num_train_timesteps, dtype=np.float64)
        else:
            raise ValueError(self.schedule)
        return np.cumprod(1.0 - betas).astype(np.float32)


def add_noise(sched: DiffusionSchedule, latents: jnp.ndarray,
              noise: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0) sampling (diffusers scheduler.add_noise)."""
    ac = jnp.asarray(sched.alphas_cumprod())[timesteps]
    sqrt_ac = jnp.sqrt(ac)[:, None, None, None].astype(latents.dtype)
    sqrt_1mac = jnp.sqrt(1 - ac)[:, None, None, None].astype(latents.dtype)
    return sqrt_ac * latents + sqrt_1mac * noise


def ddim_sample_loop(
    unet_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    sched: DiffusionSchedule,
    latents: jnp.ndarray,
    num_inference_steps: int = 50,
    eta: float = 0.0,
) -> jnp.ndarray:
    """Deterministic DDIM sampling; `unet_fn(latents, t[B]) -> eps`
    closes over the conditioning (and CFG combination). One lax.scan."""
    T = sched.num_train_timesteps
    step = T // num_inference_steps
    timesteps = np.arange(0, num_inference_steps) * step
    timesteps = np.flip(timesteps).copy()                   # T-ish → 0
    ac = np.concatenate([sched.alphas_cumprod(), [1.0]]).astype(np.float32)
    # final step has prev_t < 0 → must read the appended final-alpha 1.0
    # slot at index T (diffusers' final_alpha_cumprod semantics). A raw
    # negative index would wrap to ac[T-step] ≈ 0.006 and return noise.
    prev_t = np.where(timesteps - step >= 0, timesteps - step, T)

    ts = jnp.asarray(timesteps)
    ac_t = jnp.asarray(ac[timesteps])
    ac_prev = jnp.asarray(ac[prev_t])                       # ac[-1] == 1.0

    B = latents.shape[0]

    def body(lat, inp):
        t, a_t, a_prev = inp
        eps = unet_fn(lat, jnp.full((B,), t, jnp.int32))
        lat32 = lat.astype(jnp.float32)
        eps32 = eps.astype(jnp.float32)
        x0 = (lat32 - jnp.sqrt(1 - a_t) * eps32) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1 - a_prev) * eps32
        new = jnp.sqrt(a_prev) * x0 + dir_xt
        return new.astype(lat.dtype), None

    final, _ = jax.lax.scan(body, latents, (ts, ac_t, ac_prev))
    return final
