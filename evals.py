#!/usr/bin/env python
"""Thin wrapper: reference-compatible CLI entry (python evals.py ...)."""
from zero_tig_tpu.cli.evals import main

if __name__ == "__main__":
    main()
