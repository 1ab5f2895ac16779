"""Minimal numpy-backed ``torch`` stand-in implementing EXACTLY the API
surface ``stages/score.T5Scorer`` touches, so the production scorer's
code path executes in this torch-free container (see
tests/test_t5_scorer_real.py).  NOT a general torch substitute — it is
only importable when the test inserts ``tests/fake_hf`` into sys.path.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

qint8 = "qint8"


def _v(x):
    return x.a if isinstance(x, Tensor) else x


class Tensor:
    def __init__(self, a):
        self.a = np.asarray(a)

    @property
    def shape(self):
        return self.a.shape

    def to(self, device):
        return self

    def long(self):
        return Tensor(self.a.astype(np.int64))

    def clone(self):
        return Tensor(self.a.copy())

    def transpose(self, d0, d1):
        return Tensor(np.swapaxes(self.a, d0, d1))

    def cpu(self):
        return self

    def numpy(self):
        return self.a

    def sum(self, dim=None):
        return Tensor(self.a.sum(axis=dim))

    def clamp(self, min=None):
        return Tensor(np.clip(self.a, min, None))

    def __setitem__(self, key, value):
        self.a[_v(key)] = value

    def __eq__(self, other):  # noqa: D105
        return Tensor(self.a == _v(other))

    def __ne__(self, other):
        return Tensor(self.a != _v(other))

    def __truediv__(self, other):
        return Tensor(self.a / _v(other))

    def __neg__(self):
        return Tensor(-self.a)

    __hash__ = None


def exp(t):
    return Tensor(np.exp(_v(t)))


def set_num_threads(n):
    pass


@contextmanager
def no_grad():
    yield


#: path of the most recent ``torch.load`` call, for tests asserting
#: WHICH checkpoint the scorer picked (newest-by-mtime selection)
last_loaded_path = None


def load(path, map_location=None):
    """Checkpoint loads resolve to an empty lightning-style state dict —
    the glob/load_state_dict plumbing is what's under test."""
    global last_loaded_path
    last_loaded_path = path
    return {"state_dict": {}}


class cuda:
    @staticmethod
    def is_available() -> bool:
        return False


class _Functional:
    @staticmethod
    def cross_entropy(logits, target, ignore_index=-100, reduction="none"):
        """(B, V, N) logits vs (B, N) targets -> (B, N) per-token CE with
        ignored positions zeroed (torch semantics for reduction='none')."""
        L = _v(logits).astype(np.float64)
        T = _v(target)
        m = L.max(axis=1, keepdims=True)
        logsumexp = m + np.log(np.exp(L - m).sum(axis=1, keepdims=True))
        log_softmax = L - logsumexp
        V = L.shape[1]
        tt = np.clip(T, 0, V - 1)
        picked = np.take_along_axis(log_softmax, tt[:, None, :], axis=1)[:, 0, :]
        ce = -picked
        ce[T == ignore_index] = 0.0
        return Tensor(ce)


class nn:
    class Linear:
        pass

    functional = _Functional


class quantization:
    @staticmethod
    def quantize_dynamic(model, modules, dtype=None):
        model.quantized_int8 = (dtype == qint8)
        return model
