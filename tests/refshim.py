"""Import the reference implementation (/root/reference, read-only) as a
test oracle, shimming the third-party packages it needs that are absent
in this sandbox (scipy, sklearn, joblib, tqdm).

Nothing from the reference is copied into this repo — parity tests import
it in place and compare numerics.  The shims implement only the tiny API
surface the reference touches:

* ``joblib.Parallel``/``delayed`` — run serially;
* ``tqdm`` — identity;
* ``scipy.sparse.lil_matrix`` — dense ndarray wrapper (``lar/lar.py:39``);
* ``scipy.stats.special_ortho_group`` — Haar SO(n) sampling via QR of a
  Gaussian matrix with sign fix + determinant fix (standard public
  construction; Mezzadri 2007, "How to generate random matrices from the
  classical compact groups");
* ``sklearn`` metrics/feature_selection — raise if actually called
  (preselection paths are not exercised by the oracle tests).
"""
from __future__ import annotations

import sys
import types

import numpy as np


def _mod(name: str) -> types.ModuleType:
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def install_shims() -> None:
    if "joblib" not in sys.modules:
        joblib = _mod("joblib")

        class Parallel:
            def __init__(self, *a, **k):
                pass

            def __call__(self, tasks):
                return [f(*args, **kwargs) for f, args, kwargs in tasks]

        joblib.Parallel = Parallel
        joblib.delayed = lambda f: (lambda *a, **k: (f, a, k))

    if "tqdm" not in sys.modules:
        tqdm = _mod("tqdm")
        tqdm.tqdm = lambda it, *a, **k: it

    if "scipy" not in sys.modules:
        scipy = _mod("scipy")
        sparse = _mod("scipy.sparse")
        stats = _mod("scipy.stats")
        scipy.sparse = sparse
        scipy.stats = stats

        class lil_matrix:
            def __init__(self, shape):
                self._a = np.zeros(shape, dtype=np.float64)

            def __setitem__(self, key, value):
                v = np.asarray(value, dtype=np.float64)
                self._a[key] = v.reshape(self._a[key].shape)

            def __getitem__(self, key):
                out = lil_matrix((0, 0))
                out._a = np.asarray(self._a[key])
                return out

            def toarray(self):
                return self._a.copy()

        sparse.lil_matrix = lil_matrix

        class _SOGroup:
            @staticmethod
            def rvs(dim, size=1, random_state=None):
                rng = np.random.default_rng(random_state)
                out = np.empty((size, dim, dim))
                for i in range(size):
                    z = rng.standard_normal((dim, dim))
                    q, r = np.linalg.qr(z)
                    q = q * np.sign(np.diag(r))[None, :]
                    if np.linalg.det(q) < 0:
                        q[:, 0] = -q[:, 0]
                    out[i] = q
                return out[0] if size == 1 else out

        stats.special_ortho_group = _SOGroup()

    if "sklearn" not in sys.modules:
        sklearn = _mod("sklearn")
        fs = _mod("sklearn.feature_selection")
        metrics = _mod("sklearn.metrics")
        sklearn.feature_selection = fs
        sklearn.metrics = metrics

        def _unavailable(*a, **k):
            raise RuntimeError("sklearn shim: not available in sandbox")

        fs.mutual_info_regression = _unavailable
        fs.mutual_info_classif = _unavailable
        metrics.adjusted_mutual_info_score = _unavailable


def load_reference():
    """Install shims and import the reference ``hisel`` package."""
    install_shims()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import hisel  # noqa: F401
    return hisel
