"""LR scheduler parity vs torch (the reference's scheduler,
/root/reference/exp/run_exp.py:346-355)."""
import numpy as np
import pytest

from cwn_tpu.train.trainer import ReduceLROnPlateau, StepLR, make_scheduler

torch = pytest.importorskip("torch")


def _torch_lr_trajectory(metrics, mode, factor, patience, lr0):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sch = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode=mode, factor=factor, patience=patience)
    out = []
    for m in metrics:
        sch.step(m)
        out.append(opt.param_groups[0]["lr"])
    return out


@pytest.mark.parametrize("mode", ["min", "max"])
def test_plateau_matches_torch(mode):
    rng = np.random.default_rng(0)
    # A noisy curve with plateaus, micro-improvements (must NOT reset
    # patience under torch's rel threshold), and occasional real jumps.
    base = np.linspace(1.0, 0.2, 120) if mode == "min" \
        else np.linspace(0.2, 1.0, 120)
    metrics = base + rng.normal(0, 0.02, 120)
    metrics[40:80] = metrics[40]           # hard plateau
    metrics[80:90] = metrics[40] * (1 - 1e-6 if mode == "min" else 1 + 1e-6)

    ours = ReduceLROnPlateau(0.001, mode=mode, factor=0.5, patience=5,
                             min_lr=0.0)
    got = []
    for m in metrics:
        ours.step(float(m))
        got.append(ours.lr)
    want = _torch_lr_trajectory([float(m) for m in metrics], mode, 0.5, 5,
                                0.001)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_steplr_decay():
    s = StepLR(0.1, decay_steps=3, decay_rate=0.5)
    lrs = []
    for _ in range(9):
        lrs.append(s.lr)
        s.step()
    assert lrs == [0.1] * 3 + [0.05] * 3 + [0.025] * 3


def test_make_scheduler_dispatch():
    assert isinstance(make_scheduler("StepLR", 0.1), StepLR)
    assert isinstance(make_scheduler("ReduceLROnPlateau", 0.1),
                      ReduceLROnPlateau)
    assert make_scheduler(None, 0.1).lr == 0.1
    with pytest.raises(NotImplementedError):
        make_scheduler("Cosine", 0.1)
