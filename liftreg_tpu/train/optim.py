"""Optimizer and learning-rate schedules.

Mirrors ``RegistrationNet._init_optim`` (``RegistrationNet.py:228-279``):
Adam(lr, betas, eps=1e-5) or SGD; StepLR(step_size, gamma) ('custom') or
ReduceLROnPlateau on the validation score ('plateau'). The learning rate is
computed host-side per epoch and injected into the jitted update through
``optax.inject_hyperparams`` — schedule changes never retrace.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import optax


def build_optimizer(opt_setting: dict, warming_up: bool = False):
    """Returns (optax optimizer with injectable lr, base_lr, scheduler).

    ``warming_up`` starts at lr/10 (reference ``_init_optim``,
    ``RegistrationNet.py:272-279``).
    """
    optim_type = opt_setting.get("optim_type", "adam")
    lr = float(opt_setting.get("lr", 1e-3))
    if warming_up:
        lr = lr / 10.0
    if optim_type == "adam":
        adam = opt_setting.get("adam", {})
        beta = adam.get("beta", [0.9, 0.999])
        # the reference schema carries optim.adam.weight_decay but never
        # passes it to torch Adam (dead key); here a non-zero value is
        # honored via adamw (decoupled decay)
        weight_decay = float(adam.get("weight_decay", 0.0))
        if weight_decay > 0.0:
            tx = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr, b1=float(beta[0]), b2=float(beta[1]),
                eps=1e-5, weight_decay=weight_decay)
        else:
            tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr, b1=float(beta[0]), b2=float(beta[1]),
                eps=1e-5)
    else:
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)

    sched_setting = opt_setting.get("lr_scheduler", {})
    sched_type = sched_setting.get("type", "custom")
    if sched_type == "custom":
        custom = sched_setting.get("custom", {})
        scheduler = StepLR(lr, int(custom.get("step_size", 50)),
                           float(custom.get("gamma", 0.5)))
    elif sched_type == "plateau":
        p = sched_setting.get("plateau", {})
        scheduler = PlateauLR(lr, patience=int(p.get("patience", 2)),
                              factor=float(p.get("factor", 0.7)),
                              threshold=float(p.get("threshold", 1e-4)),
                              min_lr=float(p.get("min_lr", 1e-8)),
                              cooldown=int(p.get("cooldown", 2)))
    else:
        scheduler = StepLR(lr, 10 ** 9, 1.0)
    return tx, lr, scheduler


@dataclasses.dataclass
class StepLR:
    """lr = base * gamma^(epoch // step_size) (torch StepLR semantics when
    stepped once per epoch)."""
    base_lr: float
    step_size: int
    gamma: float
    epochs_stepped: int = 0

    def step(self, metric=None):
        self.epochs_stepped += 1

    @property
    def lr(self):
        return self.base_lr * self.gamma ** (self.epochs_stepped // self.step_size)

    def state_dict(self):
        return {"epochs_stepped": self.epochs_stepped,
                "base_lr": self.base_lr}

    def load_state_dict(self, d):
        self.epochs_stepped = int(d.get("epochs_stepped", 0))
        self.base_lr = float(d.get("base_lr", self.base_lr))


@dataclasses.dataclass
class PlateauLR:
    """ReduceLROnPlateau (mode='max') semantics of
    ``RegistrationNet.py:258-270``."""
    base_lr: float
    patience: int = 2
    factor: float = 0.7
    threshold: float = 1e-4
    min_lr: float = 1e-8
    cooldown: int = 2
    current_lr: float = None
    best: float = float("-inf")
    num_bad: int = 0
    cooldown_counter: int = 0

    def __post_init__(self):
        if self.current_lr is None:
            self.current_lr = self.base_lr

    def step(self, metric=None):
        if metric is None:
            return
        if metric > self.best * (1 + self.threshold) if self.best > 0 \
                else metric > self.best + self.threshold:
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.current_lr = max(self.current_lr * self.factor,
                                      self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0

    @property
    def lr(self):
        return self.current_lr

    def state_dict(self):
        return {"current_lr": self.current_lr, "best": self.best,
                "num_bad": self.num_bad,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)
