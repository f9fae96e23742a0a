"""LR schedule semantics (torch StepLR / ReduceLROnPlateau parity)."""
import pytest

from liftreg_tpu.train.optim import PlateauLR, StepLR, build_optimizer


def test_steplr_matches_torch_semantics():
    # torch StepLR stepped once/epoch: lr = base * gamma^(epoch//step_size)
    s = StepLR(base_lr=1e-3, step_size=30, gamma=0.8)
    lrs = []
    for epoch in range(91):
        lrs.append(s.lr)
        s.step()
    assert lrs[0] == pytest.approx(1e-3)
    assert lrs[29] == pytest.approx(1e-3)
    assert lrs[30] == pytest.approx(1e-3 * 0.8)
    assert lrs[60] == pytest.approx(1e-3 * 0.8 ** 2)
    assert lrs[90] == pytest.approx(1e-3 * 0.8 ** 3)


def test_steplr_state_roundtrip():
    s = StepLR(1e-3, 10, 0.5)
    for _ in range(25):
        s.step()
    d = s.state_dict()
    s2 = StepLR(1e-3, 10, 0.5)
    s2.load_state_dict(d)
    assert s2.lr == pytest.approx(s.lr)


def test_plateau_reduces_after_patience():
    p = PlateauLR(base_lr=1e-3, patience=2, factor=0.5, threshold=1e-4,
                  cooldown=0)
    p.step(1.0)          # best = 1.0
    for _ in range(2):   # within patience
        p.step(0.9)
    assert p.lr == pytest.approx(1e-3)
    p.step(0.9)          # exceeds patience -> reduce
    assert p.lr == pytest.approx(5e-4)


def test_plateau_improvement_resets():
    p = PlateauLR(base_lr=1e-3, patience=1, factor=0.5, threshold=1e-4)
    p.step(1.0)
    p.step(0.5)
    p.step(1.1)          # improvement resets bad counter
    p.step(0.5)
    assert p.lr == pytest.approx(1e-3)


def test_plateau_min_lr():
    p = PlateauLR(base_lr=1e-3, patience=0, factor=0.1, min_lr=1e-5,
                  cooldown=0)
    p.step(1.0)
    for _ in range(10):
        p.step(0.0)
    assert p.lr >= 1e-5


def test_build_optimizer_warmup():
    cfg = {"optim_type": "adam", "lr": 1e-2, "adam": {"beta": [0.9, 0.999]},
           "lr_scheduler": {"type": "custom",
                            "custom": {"step_size": 5, "gamma": 0.5}}}
    _, lr, sched = build_optimizer(cfg)
    assert lr == pytest.approx(1e-2)
    _, lr_w, _ = build_optimizer(cfg, warming_up=True)
    assert lr_w == pytest.approx(1e-3)
    assert sched.step_size == 5
