"""Minimal torch_geometric shim (see torch_scatter sibling) — only the
five symbols the reference's ``Models/BuckGNN.py:3-6`` imports, so the
reference model file can execute verbatim inside the parity test."""

from . import nn  # noqa: F401
