#!/usr/bin/env python
"""Thin wrapper: reference-compatible CLI entry (python train.py ...)."""
from zero_tig_tpu.cli.train import main

if __name__ == "__main__":
    main()
