#!/usr/bin/env python
"""Thin wrapper: reference-compatible CLI entry (python predict.py ...)."""
from zero_tig_tpu.cli.predict import main

if __name__ == "__main__":
    main()
