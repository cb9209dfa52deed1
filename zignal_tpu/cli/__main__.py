"""`python -m zignal_tpu.cli` entry (the installed `zignal` script calls
main.main directly)."""

import sys

from .main import main

sys.exit(main())
