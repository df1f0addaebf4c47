"""Inference-time noise schedulers (JAX, jit-safe).

The reference delegates inference scheduling to diffusers scheduler classes
(FlowMatchEulerDiscreteScheduler for flow families, DDIM/DDPM/EulerDiscrete for
epsilon/v-prediction; selected per model in helpers/training/validation.py:2778
``setup_scheduler``).  Here each scheduler is a small pytree of precomputed
schedule arrays plus a pure ``step`` function, so a whole sampling loop compiles
to one XLA program via ``lax.fori_loop`` (see ``sample_loop``).
"""

from .flow_euler import FlowMatchEulerScheduler
from .ddim import DDIMScheduler
from .edm_euler import EDMEulerScheduler
from .unipc import UniPCScheduler
from .sampling import sample_loop, classifier_free_guidance

__all__ = [
    "FlowMatchEulerScheduler",
    "DDIMScheduler",
    "EDMEulerScheduler",
    "UniPCScheduler",
    "sample_loop",
    "classifier_free_guidance",
]
