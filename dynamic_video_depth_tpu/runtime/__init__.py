"""Imperative runtime shell: config, logging, checkpointing, visualization.

The functional core (ops/models/train) is pure; everything stateful or
host-side lives here.
"""
