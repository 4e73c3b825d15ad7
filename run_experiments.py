#!/usr/bin/env python
"""Compatibility shim: the reference framework is launched as
``python run_experiments.py <MODEL> <DATAFMT> ...`` from the repo root
(reference: h2gcn/run_experiments.py) — this forwards to the package CLI so
the same command line works here."""

from h2gcn_tpu.run_experiments import main

if __name__ == "__main__":
    main()
