"""Replicate/Cog predictor entrypoint (reference: predict.py + simpletuner/cog.py).

With the ``cog`` library installed this exposes a ``Predictor`` whose
``predict()`` stages a training-data archive, runs a training job, and
returns a tarball of the outputs.  Without it, running this file directly
gives the same flow as a plain CLI:

    python predict.py --config config/config.json --data data.zip
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from simpletuner_tpu.cog import CogRunner

try:  # the cog package only exists inside Replicate images
    from cog import BasePredictor, Input, Path as CogPath  # type: ignore

    HAVE_COG = True
except ImportError:
    HAVE_COG = False


def _load_config(value: str) -> Dict[str, Any]:
    """Inline JSON or a path to a config file."""
    value = value.strip()
    if value.startswith("{"):
        return json.loads(value)
    with open(value) as fh:
        return json.load(fh)


if HAVE_COG:

    class Predictor(BasePredictor):  # pragma: no cover - requires cog runtime
        def setup(self) -> None:
            self.runner = CogRunner()

        def predict(
            self,
            config: str = Input(description="Training config: inline JSON or a path"),
            training_data: CogPath = Input(description="zip/tar of images + captions"),
            max_train_steps: Optional[int] = Input(default=None),
        ) -> CogPath:
            cfg = _load_config(config)
            if max_train_steps is not None:
                cfg["max_train_steps"] = int(max_train_steps)
            output_dir = self.runner.train(cfg, data_archive=str(training_data))
            return CogPath(str(self.runner.package(output_dir)))


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser("simpletuner-tpu cog runner")
    parser.add_argument("--config", required=True, help="config.json path or inline JSON")
    parser.add_argument("--data", default=None, help="zip/tar archive of images + captions")
    parser.add_argument("--package", default=None, help="output tarball path")
    args = parser.parse_args(argv)
    runner = CogRunner()
    output_dir = runner.train(_load_config(args.config), data_archive=args.data)
    archive = runner.package(output_dir, args.package)
    print(f"packaged: {archive}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
