#!/usr/bin/env python
"""Thin wrapper: reference-compatible CLI entry (python run_pipeline.py ...)."""
from zero_tig_tpu.cli.run_pipeline import main

if __name__ == "__main__":
    main()
