#!/usr/bin/env python
"""Thin wrapper: reference-compatible CLI entry (python demo.py ...)."""
from zero_tig_tpu.cli.demo import main

if __name__ == "__main__":
    main()
