"""torch_sparse shim: SparseTensor is only used for isinstance checks and
typing in the reference's COO path (/root/reference/mp/cell_mp.py:34)."""


class _Storage:
    def rowptr(self):
        raise NotImplementedError("ref_shims SparseTensor is typing-only")

    row = col = value = rowptr


class SparseTensor:
    storage = _Storage()

    def __init__(self, *a, **k):
        raise NotImplementedError("ref_shims SparseTensor is typing-only")
