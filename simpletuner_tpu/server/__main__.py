"""``python -m simpletuner_tpu.server`` — training API + WebUI."""

import sys

from .app import main

sys.exit(main())
