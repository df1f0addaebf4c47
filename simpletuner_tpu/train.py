"""Canonical training entry (reference: simpletuner/train.py:42-86 ``_run_training``
+ :207 __main__).  Usage::

    python -m simpletuner_tpu.train --config config/config.json
    python -m simpletuner_tpu.train  # auto-discovers config/config.{json,toml,env}

On multi-host TPU pods, run the same program on every host with
``SIMPLETUNER_MULTIHOST=auto`` (pod runtime auto-detection) or the explicit
``SIMPLETUNER_COORDINATOR_ADDRESS`` / ``SIMPLETUNER_NUM_PROCESSES`` /
``SIMPLETUNER_PROCESS_ID`` triple (the analogue of accelerate's
main_process_ip/port + machine_rank; reference trainer.py:7394-7446) —
see ``parallel/distributed.py``.
"""

from __future__ import annotations

import logging
import sys

from .configuration import TrainingConfig
from .training.trainer import Trainer


def main(argv=None) -> int:
    import os

    # reference env knobs (README: SIMPLETUNER_LOG_LEVEL /
    # SIMPLETUNER_TRAINING_LOOP_LOG_LEVEL for hot-loop stage timestamps)
    level = getattr(logging, os.environ.get("SIMPLETUNER_LOG_LEVEL", "INFO").upper(), logging.INFO)
    logging.basicConfig(
        level=level,
        format="%(asctime)s [%(levelname)s] %(name)s: %(message)s",
        # jax's import-time logging already installed a root handler at
        # WARNING; without force=True this call is a no-op and every trainer
        # INFO line (progress, data-plane metrics) is silently dropped
        force=True,
    )
    loop_level = os.environ.get("SIMPLETUNER_TRAINING_LOOP_LOG_LEVEL")
    if loop_level:
        logging.getLogger("simpletuner_tpu.training.trainer").setLevel(
            getattr(logging, loop_level.upper(), logging.INFO)
        )
    # honor an explicit JAX_PLATFORMS even when a container sitecustomize
    # pre-registered another PJRT plugin and stomped the env-var handling
    # (e.g. forcing a CPU multi-process run on a machine with one TPU chip)
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
        count = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in count and os.environ.get(
            "JAX_NUM_CPU_DEVICES"
        ):
            jax.config.update("jax_num_cpu_devices", int(os.environ["JAX_NUM_CPU_DEVICES"]))

    from .parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    config = TrainingConfig.from_cli(argv)
    trainer = Trainer(config=config, exit_on_error=True)
    trainer.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
