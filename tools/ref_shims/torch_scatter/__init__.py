"""torch_scatter shim over plain torch (role: /root/reference/mp/cell_mp.py:35).

Semantics follow torch-scatter 2.0.5: zeros-initialised output, `add`/
`mean`/`max` reductions, empty segments produce 0.
"""
import torch


def _broadcast(index, src, dim):
    if dim < 0:
        dim = src.dim() + dim
    for _ in range(dim):
        index = index.unsqueeze(0)
    for _ in range(src.dim() - index.dim()):
        index = index.unsqueeze(-1)
    return index.expand_as(src)


def scatter(src, index, dim=-1, out=None, dim_size=None, reduce="sum"):
    if reduce == "add":
        reduce = "sum"
    assert out is None, "out= not supported by the shim"
    if dim < 0:
        dim = src.dim() + dim
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    idx = _broadcast(index, src, dim)
    if reduce in ("sum", "mean"):
        out = torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)
        if reduce == "mean":
            ones = torch.ones_like(src)
            cnt = torch.zeros(shape, dtype=src.dtype).scatter_add_(
                dim, idx, ones)
            out = out / cnt.clamp(min=1)
        return out
    if reduce == "max":
        out = torch.full(shape, float("-inf"), dtype=src.dtype)
        out = out.scatter_reduce_(dim, idx, src, reduce="amax",
                                  include_self=True)
        return torch.where(torch.isinf(out), torch.zeros_like(out), out)
    raise NotImplementedError(reduce)


def segment_csr(src, indptr, reduce="sum"):
    indptr = indptr.reshape(-1)
    n = indptr.numel() - 1
    index = torch.repeat_interleave(
        torch.arange(n), indptr[1:] - indptr[:-1])
    return scatter(src, index, dim=0, dim_size=n, reduce=reduce)


def gather_csr(src, indptr):
    indptr = indptr.reshape(-1)
    counts = indptr[1:] - indptr[:-1]
    index = torch.repeat_interleave(torch.arange(counts.numel()), counts)
    return src.index_select(0, index)
