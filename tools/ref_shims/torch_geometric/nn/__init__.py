"""PyG nn shim: pooling + JumpingKnowledge used by the reference models
(/root/reference/mp/models.py, mp/nn.py)."""
import torch

from torch_scatter import scatter


def global_add_pool(x, batch, size=None):
    size = int(batch.max().item()) + 1 if size is None else size
    return scatter(x, batch, dim=0, dim_size=size, reduce="sum")


def global_mean_pool(x, batch, size=None):
    size = int(batch.max().item()) + 1 if size is None else size
    return scatter(x, batch, dim=0, dim_size=size, reduce="mean")


class JumpingKnowledge(torch.nn.Module):
    """'cat' and 'max' modes (reference uses these only)."""

    def __init__(self, mode, channels=None, num_layers=None):
        super().__init__()
        assert mode in ("cat", "max"), f"JK mode {mode} not shimmed"
        self.mode = mode

    def forward(self, xs):
        if self.mode == "cat":
            return torch.cat(xs, dim=-1)
        return torch.stack(xs, dim=-1).max(dim=-1)[0]

    def reset_parameters(self):
        pass


class GINConv(torch.nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("GINConv not shimmed")


GINEConv = GINConv
