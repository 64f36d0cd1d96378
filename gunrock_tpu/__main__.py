"""``python -m gunrock_tpu <primitive> ...`` — see :mod:`gunrock_tpu.cli`."""

import sys

from .cli import main

sys.exit(main())
