from typing import Optional, Tuple, Union

from torch import Tensor
from torch_sparse import SparseTensor

Adj = Union[Tensor, SparseTensor, None]
Size = Optional[Tuple[int, int]]
OptTensor = Optional[Tensor]
