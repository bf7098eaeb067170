"""`python -m grail_tpu` runs the CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
