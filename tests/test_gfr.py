"""Gaussian field regressor tests (reference strategy:
``test/model/gaussian_field/test_gfr.py``)."""
import numpy as np
import pytest
from scipy.spatial.distance import cdist

from graphdot_tpu.model.gaussian_field import (
    GaussianFieldRegressor, RBFOverFixedDistance
)

np.random.seed(0)


class OneOverRn:
    """w = 1 / (r + a)^b with log-scale gradients."""

    def __init__(self, a=0.1, b=1):
        self.a = a
        self.b = b

    def __call__(self, X, Y=None, eval_gradient=False):
        d = self.a + (cdist(X, X) if Y is None else cdist(X, Y))
        w = d ** -self.b
        if eval_gradient:
            j1 = -self.b * d ** (-self.b - 1)
            j2 = -d ** (-self.b) * np.log(d)
            return w, np.stack([j1, j2], axis=2) * np.exp(
                self.theta
            )[None, None, :]
        return w

    @property
    def theta(self):
        return np.log([self.a, self.b])

    @theta.setter
    def theta(self, values):
        self.a, self.b = np.exp(values)

    @property
    def bounds(self):
        return np.log([[0.001, 100.0], [0.001, 100.0]])


def test_precomputed_harmonic():
    g = GaussianFieldRegressor(weight='precomputed', smoothing=0)
    W = np.array([
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
    ])
    y = np.array([0.0, np.nan, 1.0])
    z = g.predict(W, y)
    assert z[1] == pytest.approx(0.5)


def test_average_label_entropy_value():
    g = GaussianFieldRegressor(weight='precomputed', smoothing=0)
    e = g.average_label_entropy(
        X=np.array([
            [0.0, 1.0, 0.0],
            [1.0, 0.0, 1.0],
            [0.0, 1.0, 0.0],
        ]),
        y=np.array([0, np.nan, 1])
    )
    assert e == pytest.approx(-np.log(0.5))


def test_loocv_error_values():
    g = GaussianFieldRegressor(weight='precomputed', smoothing=0)
    X = np.array([
        [0.0, 1.0, 1.0],
        [1.0, 0.0, 1.0],
        [1.0, 1.0, 0.0],
    ])
    y = np.array([-1.0, 0.0, 1.0])
    assert g.loocv_error(X, y, p=1) == pytest.approx(1.0)
    assert g.loocv_error(X, y, p=2) == pytest.approx(np.sqrt(1.5))
    assert g.loocv_error(X, np.zeros(3)) == pytest.approx(0)


@pytest.mark.parametrize('smoothing', [0, 0.1])
@pytest.mark.parametrize('n,k,d', [(7, 3, 2), (16, 5, 4)])
def test_average_label_entropy_gradient(n, k, d, smoothing):
    gfr = GaussianFieldRegressor(
        weight=OneOverRn(a=1.5, b=0.7), smoothing=smoothing
    )
    X = np.random.randn(n, d)
    y = np.random.rand(n)
    y[np.random.choice(n, max(1, n // k), replace=False)] = np.nan

    _, dloss = gfr.average_label_entropy(X, y, eval_gradient=True)

    eps = 1e-4
    theta = np.copy(gfr.weight.theta)
    for i in range(len(theta)):
        pos, neg = theta.copy(), theta.copy()
        pos[i] += eps
        neg[i] -= eps
        f_pos = gfr.average_label_entropy(X, y, theta=pos)
        f_neg = gfr.average_label_entropy(X, y, theta=neg)
        gfr.weight.theta = theta
        delta = (f_pos - f_neg) / (2 * eps)
        assert delta == pytest.approx(dloss[i], rel=1e-3, abs=1e-8)


@pytest.mark.parametrize('p', [1, 1.5, 2])
@pytest.mark.parametrize('smoothing', [0, 0.1])
def test_loocv_error_gradient(p, smoothing):
    n, k, d = 12, 4, 3
    gfr = GaussianFieldRegressor(
        weight=OneOverRn(a=1.2, b=0.9), smoothing=smoothing
    )
    X = np.random.randn(n, d)
    y = np.random.rand(n)
    y[np.random.choice(n, n // k, replace=False)] = np.nan

    _, dloss = gfr.loocv_error(X, y, p=p, eval_gradient=True)

    eps = 1e-4
    theta = np.copy(gfr.weight.theta)
    for i in range(len(theta)):
        pos, neg = theta.copy(), theta.copy()
        pos[i] += eps
        neg[i] -= eps
        f_pos = gfr.loocv_error(X, y, p=p, theta=pos)
        f_neg = gfr.loocv_error(X, y, p=p, theta=neg)
        gfr.weight.theta = theta
        delta = (f_pos - f_neg) / (2 * eps)
        assert delta == pytest.approx(dloss[i], rel=1e-3, abs=1e-8)


def test_rbf_over_fixed_distance_gradient():
    n = 8
    D = np.abs(np.random.randn(n, n))
    D = 0.5 * (D + D.T)
    np.fill_diagonal(D, 0)
    w = RBFOverFixedDistance(D, sigma=1.3)
    idx = np.arange(n)
    W, dW = w(idx, eval_gradient=True)
    eps = 1e-5
    t0 = w.theta
    w.theta = t0 + eps
    Wp = w(idx)
    w.theta = t0 - eps
    Wm = w(idx)
    w.theta = t0
    fd = (Wp - Wm) / (2 * eps)
    assert np.allclose(dW[:, :, 0], fd, rtol=1e-4, atol=1e-8)


def test_gfr_with_maximin_weights():
    """Integration: Gaussian field regressor over RBFOverDistance(MaxiMin)
    weights on real graphs — the reference's semi-supervised molecular
    workflow."""
    from graphdot_tpu.metric import MaxiMin
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.model.gaussian_field import (
        GaussianFieldRegressor, RBFOverDistance
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(2, 8, n_atoms_range=(5, 8))
    metric = MaxiMin(
        TensorProduct(element=KroneckerDelta(0.3)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    weight = RBFOverDistance(metric, sigma=0.5)
    gfr = GaussianFieldRegressor(weight, smoothing=1e-3)

    y = np.array([float(len(g.nodes)) for g in graphs])
    y_obs = y.copy()
    y_obs[[2, 5]] = np.nan
    z = gfr.predict(np.asarray(graphs, dtype=object), y_obs)
    assert np.all(np.isfinite(z))
    # harmonic interpolation stays within the labeled range
    assert z[[2, 5]].min() >= y[np.isfinite(y_obs)].min() - 1e-6
    assert z[[2, 5]].max() <= y[np.isfinite(y_obs)].max() + 1e-6
