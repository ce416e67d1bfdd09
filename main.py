#!/usr/bin/env python
"""`python main.py` — the reference's documented entry point
(/root/reference/README.md:37), configured by config.yaml (README.md:42)."""

import sys

from vitparticlefiltertracker_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
