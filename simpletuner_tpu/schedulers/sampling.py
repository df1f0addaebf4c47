"""Jit-compiled sampling loops.

The reference samples validation images by calling diffusers pipelines step by
step in Python (helpers/training/validation.py:2872 setup_pipeline → pipeline
__call__).  On TPU a Python loop would re-dispatch every step; instead the whole
denoise loop is one ``lax.fori_loop`` inside a single jitted program, so N-step
sampling costs one compile + one device program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def classifier_free_guidance(cond: jax.Array, uncond: jax.Array, scale: float) -> jax.Array:
    return uncond + scale * (cond - uncond)


def sample_loop(
    scheduler,
    denoise_fn: Callable[[jax.Array, jax.Array], jax.Array],
    noise: jax.Array,
) -> jax.Array:
    """Run the full denoise loop.

    ``denoise_fn(latents, timestep) -> model_pred`` must already close over
    params/conditioning (and CFG if wanted).  Works with any scheduler exposing
    ``timestep(i)`` + ``step(i, latents, pred)``; schedulers with internal state
    (UniPC) expose ``init_state``/``step_with_state`` and are handled too.
    """
    latents0 = scheduler.init_latents(noise)
    stateful = hasattr(scheduler, "step_with_state")

    if stateful:
        def body(i, carry):
            latents, state = carry
            pred = denoise_fn(latents, scheduler.timestep(i))
            return scheduler.step_with_state(i, latents, pred, state)

        latents, _ = jax.lax.fori_loop(
            0, scheduler.num_steps, body, (latents0, scheduler.init_state(noise))
        )
        return latents

    def body(i, latents):
        pred = denoise_fn(latents, scheduler.timestep(i))
        return scheduler.step(i, latents, pred)

    return jax.lax.fori_loop(0, scheduler.num_steps, body, latents0)
