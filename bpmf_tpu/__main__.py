"""``python -m bpmf_tpu`` runs the reference-compatible CLI."""

import sys

from bpmf_tpu.cli import main

sys.exit(main())
