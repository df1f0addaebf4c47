"""simpletuner_tpu — a TPU-native (JAX/XLA/Pallas/pjit) diffusion training framework.

Re-implements the capability surface of bghira/SimpleTuner (reference layout documented
in SURVEY.md) with a TPU-first architecture: one jitted train step sharded over a
``jax.sharding.Mesh`` with ``data`` / ``fsdp`` / ``context`` axes, Pallas kernels for the
attention hot path, host-side data plane with aspect-bucketed static shapes, and
Orbax checkpoints plus safetensors export formats compatible with the reference's
consumers (diffusers / ComfyUI / PEFT).
"""

__version__ = "0.1.0"
