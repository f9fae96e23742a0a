"""Abstract trainer interface.

Equivalent of ``src/liftreg/networks/NetworkBase.py``: ``run()`` dispatches
``_train_model`` / ``_test_model`` on ``mode``; concrete trainers implement
the three abstract methods (``NetworkBase.py:11-66``). Train/eval "mode
switches" are no-ops here — models are pure functions (no dropout/batchnorm
state in the default configuration), so ``set_train``/``set_val`` only
track the flag for API compatibility.
"""
from __future__ import annotations

from abc import ABC, abstractmethod


class TrainerBase(ABC):
    PHASES = ["train", "val", "debug"]

    mode: str = "train"

    def run(self):
        if self.mode == "train":
            self._train_model()
        elif self.mode == "test":
            self._test_model()

    @abstractmethod
    def _train_model(self):
        ...

    @abstractmethod
    def _test_model(self):
        ...

    def set_train(self):
        self.is_train = True

    def set_val(self):
        self.is_train = False

    set_debug = set_val
    set_test = set_val
