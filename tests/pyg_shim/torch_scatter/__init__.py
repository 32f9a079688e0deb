"""Minimal torch_scatter shim — just enough surface for the reference's
``Models/BuckGNN.py`` (imports ``scatter_add``/``scatter_mean``,
/root/reference/Models/BuckGNN.py:4) to execute verbatim in tests.

Clean-room implementation of the documented torch_scatter semantics on
plain torch ops; used only by tests/test_reference_model_parity.py, never
by the framework itself.
"""

import torch


def _dim_size(index, dim_size):
    if dim_size is not None:
        return dim_size
    return int(index.max().item()) + 1 if index.numel() else 0


def scatter_add(src, index, dim=0, out=None, dim_size=None):
    if dim != 0:
        raise NotImplementedError("shim supports dim=0 only")
    n = _dim_size(index, dim_size)
    if out is None:
        out = src.new_zeros((n,) + src.shape[1:])
    out.index_add_(0, index, src)
    return out


def scatter_sum(src, index, dim=0, out=None, dim_size=None):
    return scatter_add(src, index, dim=dim, out=out, dim_size=dim_size)


def scatter_mean(src, index, dim=0, out=None, dim_size=None):
    if dim != 0:
        raise NotImplementedError("shim supports dim=0 only")
    n = _dim_size(index, dim_size)
    summed = scatter_add(src, index, dim_size=n)
    count = src.new_zeros(n)
    count.index_add_(0, index, torch.ones(index.shape[0], dtype=src.dtype,
                                          device=src.device))
    summed = summed / count.clamp_min(1.0).reshape(
        (n,) + (1,) * (src.dim() - 1))
    if out is not None:
        out.copy_(summed)
        return out
    return summed


def scatter_max(src, index, dim=0, out=None, dim_size=None):
    """Returns (values, argmax) like torch_scatter; empty rows are 0."""
    if dim != 0:
        raise NotImplementedError("shim supports dim=0 only")
    n = _dim_size(index, dim_size)
    vals = src.new_full((n,) + src.shape[1:], -torch.inf)
    vals.index_reduce_(0, index, src, "amax", include_self=True)
    vals = torch.where(torch.isinf(vals), torch.zeros_like(vals), vals)
    if out is not None:
        out.copy_(vals)
        vals = out
    return vals, None
