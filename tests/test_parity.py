"""End-to-end numerical parity: GPR predictions through the TPU solver
must match predictions computed from an independently-built oracle Gram
matrix (dense SciPy CG), fulfilling the BASELINE requirement that model
outputs match the reference within tolerance."""
import numpy as np
import pytest

from graphdot_tpu.kernel import MarginalizedGraphKernel, Normalization
from graphdot_tpu.microkernel import (
    KroneckerDelta, SquareExponential, TensorProduct
)
from graphdot_tpu.model.gaussian_process import GaussianProcessRegressor
from graphdot_tpu.testing import random_molecule_set

from oracle import mlgk


class OracleKernel:
    """Graph kernel evaluated entirely with the dense SciPy oracle —
    the stand-in for the reference implementation."""

    def __init__(self, knode, kedge, q):
        self.knode, self.kedge, self.q = knode, kedge, q

    def _raw(self, X, Y):
        return np.array([
            [mlgk(a, b, self.knode, self.kedge, self.q) for b in Y]
            for a in X
        ])

    def __call__(self, X, Y=None):
        R = self._raw(X, Y if Y is not None else X)
        if Y is None:
            d = np.sqrt(np.diag(R))
            return R / d[:, None] / d[None, :]
        dx = np.sqrt(self._raw(X, X).diagonal())
        dy = np.sqrt(self._raw(Y, Y).diagonal())
        return R / dx[:, None] / dy[None, :]

    def diag(self, X):
        return np.ones(len(X))

    @property
    def theta(self):
        return np.zeros(0)

    @theta.setter
    def theta(self, t):
        pass

    @property
    def bounds(self):
        return np.zeros((0, 2))


@pytest.mark.parametrize('q', [0.05, 0.2])
def test_gpr_predictions_match_oracle(q):
    graphs = random_molecule_set(11, 8, n_atoms_range=(4, 8))
    rng = np.random.default_rng(0)
    y = rng.normal(size=len(graphs))

    knode = TensorProduct(element=KroneckerDelta(0.2))
    kedge = TensorProduct(length=SquareExponential(0.3))

    tpu_kernel = Normalization(
        MarginalizedGraphKernel(knode, kedge, q=q)
    )
    oracle_kernel = OracleKernel(knode, kedge, q)

    train, test = list(range(6)), [6, 7]
    Xtr = [graphs[i] for i in train]
    Xte = [graphs[i] for i in test]

    gpr_tpu = GaussianProcessRegressor(tpu_kernel, alpha=1e-6)
    gpr_tpu.fit(Xtr, y[train])
    m_tpu, s_tpu = gpr_tpu.predict(Xte, return_std=True)

    gpr_ref = GaussianProcessRegressor(oracle_kernel, alpha=1e-6)
    gpr_ref.fit(Xtr, y[train])
    m_ref, s_ref = gpr_ref.predict(Xte, return_std=True)

    assert np.allclose(m_tpu, m_ref, rtol=1e-4, atol=1e-4)
    assert np.allclose(s_tpu, s_ref, rtol=1e-3, atol=1e-4)
