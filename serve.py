#!/usr/bin/env python
"""Streaming enhancement service (resident model, watches an inbox dir)."""
from zero_tig_tpu.cli.serve import main

if __name__ == "__main__":
    main()
