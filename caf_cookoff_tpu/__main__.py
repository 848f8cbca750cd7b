"""``python -m caf_cookoff_tpu`` entry point."""

import sys

from caf_cookoff_tpu.cli import main

sys.exit(main())
