"""GPR model tests with tiny closed-form kernels (reference strategy:
``test/model/gaussian_process/test_gpr.py``)."""
import numpy as np
import pytest

from graphdot_tpu.model.gaussian_process import (
    GaussianProcessRegressor,
    GPROutlierDetector,
    LowRankApproximateGPR,
)

np.random.seed(0)


class RBFKernel:
    """Closed-form RBF over scalars with analytic log-scale gradient."""

    def __init__(self, s=1.0):
        self.s = s

    def __call__(self, X, Y=None, eval_gradient=False):
        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float) if Y is not None else X
        d2 = (X[:, None] - Y[None, :]) ** 2
        K = np.exp(-0.5 * d2 / self.s ** 2)
        if eval_gradient:
            J = (K * d2 / self.s ** 3)[:, :, None]
            return K, J
        return K

    def diag(self, X, eval_gradient=False):
        if eval_gradient:
            return np.ones(len(X)), np.zeros((len(X), 1))
        return np.ones(len(X))

    @property
    def theta(self):
        return np.log([self.s])

    @theta.setter
    def theta(self, t):
        self.s = np.exp(t[0])

    @property
    def bounds(self):
        return np.log([[1e-2, 10.0]])

    def clone_with_theta(self, theta):
        k = RBFKernel()
        k.theta = theta
        return k


def test_gpr_interpolation():
    X = np.linspace(0, 1, 8)
    y = np.sin(2 * np.pi * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.3), alpha=1e-10)
    gpr.fit(X, y)
    z = gpr.predict(X)
    assert np.allclose(z, y, atol=1e-5)
    zq, std = gpr.predict(np.linspace(0, 1, 20), return_std=True)
    assert np.all(std >= 0)


def test_gpr_masked_targets():
    X = np.linspace(0, 1, 10)
    y = np.sin(2 * np.pi * X)
    y_masked = y.copy().astype(object)
    y_masked[3] = None
    y_masked[7] = np.nan
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.3), alpha=1e-10)
    gpr.fit(X, y_masked)
    z = gpr.predict(X)
    assert np.allclose(z[[3, 7]], y[[3, 7]], atol=1e-2)


def test_gpr_lml_gradient():
    X = np.random.rand(12)
    y = np.sin(4 * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.8), alpha=1e-8)
    gpr.X, gpr.y = X, y
    lml, grad = gpr.log_marginal_likelihood(eval_gradient=True)
    eps = 1e-5
    t0 = gpr.kernel.theta
    lp = gpr.log_marginal_likelihood(t0 + eps)
    lm = gpr.log_marginal_likelihood(t0 - eps)
    fd = (lp - lm) / (2 * eps)
    assert grad[0] == pytest.approx(fd, rel=1e-4, abs=1e-6)


def test_gpr_fit_optimizer():
    X = np.linspace(0, 1, 16)
    y = np.sin(2 * np.pi * X)
    gpr = GaussianProcessRegressor(
        kernel=RBFKernel(0.5), alpha=1e-8, optimizer=True
    )
    gpr.fit(X, y, tol=1e-6)
    assert gpr.squared_loocv_error() < 1e-2


def test_gpr_loocv_consistency():
    X = np.random.rand(10)
    y = np.sin(4 * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.8), alpha=1e-8)
    gpr.fit(X, y)
    zstar, std = gpr.predict_loocv(X, y, return_std=True)
    # brute-force LOOCV
    for i in range(len(X)):
        mask = np.arange(len(X)) != i
        g2 = GaussianProcessRegressor(kernel=RBFKernel(0.8), alpha=1e-8)
        g2.fit(X[mask], y[mask])
        zi = g2.predict(X[[i]])
        assert zi[0] == pytest.approx(zstar[i], rel=1e-4, abs=1e-6)


def test_gpr_loocv_error_gradient():
    X = np.random.rand(10)
    y = np.sin(4 * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.7), alpha=1e-8)
    gpr.X, gpr.y = X, y
    e, de = gpr.squared_loocv_error(eval_gradient=True)
    eps = 1e-5
    t0 = gpr.kernel.theta
    fd = (
        gpr.squared_loocv_error(t0 + eps)
        - gpr.squared_loocv_error(t0 - eps)
    ) / (2 * eps)
    assert de[0] == pytest.approx(fd, rel=1e-3, abs=1e-8)


def test_gpr_save_load(tmp_path):
    X = np.linspace(0, 1, 8)
    y = np.sin(2 * np.pi * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.3), alpha=1e-10)
    gpr.fit(X, y)
    z0 = gpr.predict(X)
    gpr.save(tmp_path, 'model.pkl')
    gpr2 = GaussianProcessRegressor(kernel=RBFKernel(1.0), alpha=1e-10)
    gpr2.load(tmp_path, 'model.pkl')
    assert np.allclose(gpr2.predict(X), z0)


def test_nystrom_full_rank_matches_gpr():
    X = np.linspace(0, 1, 12)
    y = np.sin(2 * np.pi * X)
    gpr = GaussianProcessRegressor(kernel=RBFKernel(0.4), alpha=1e-8)
    gpr.fit(X, y)
    nys = LowRankApproximateGPR(kernel=RBFKernel(0.4), alpha=1e-8)
    nys.fit(X, X, y)  # core = full set
    Z = np.linspace(0.05, 0.95, 7)
    assert np.allclose(gpr.predict(Z), nys.predict(Z), atol=1e-3)


def test_nystrom_lml_gradient():
    # well-conditioned core so that the FD reference itself is reliable
    X = np.linspace(0, 1, 14)
    C = X[::3]
    y = np.sin(4 * X)
    nys = LowRankApproximateGPR(kernel=RBFKernel(0.25), alpha=1e-6)
    nys.C, nys.X, nys.y = C, X, y
    lml, grad = nys.log_marginal_likelihood(eval_gradient=True)
    eps = 1e-6
    t0 = nys.kernel.theta
    fd = (
        nys.log_marginal_likelihood(t0 + eps)
        - nys.log_marginal_likelihood(t0 - eps)
    ) / (2 * eps)
    assert grad[0] == pytest.approx(fd, rel=1e-2)


def test_outlier_detector():
    np.random.seed(7)
    X = np.linspace(0, 1, 24)
    y = np.sin(2 * np.pi * X)
    y[5] += 2.5  # outlier
    od = GPROutlierDetector(kernel=RBFKernel(0.3), beta=1e-8)
    od.fit(X, y, w=0.5, repeat=1, tol=1e-4)
    u = od.y_uncertainty
    assert np.argmax(u) == 5


def test_gpr_on_graphs_end_to_end():
    """GPR with the real marginalized graph kernel (normalized), matching
    the reference's molecular workflow."""
    from graphdot_tpu.kernel import MarginalizedGraphKernel, Normalization
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(3, 12, n_atoms_range=(5, 10))
    y = np.array([float(len(g.nodes)) for g in graphs])

    kernel = Normalization(MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    ))
    gpr = GaussianProcessRegressor(kernel, alpha=1e-6, normalize_y=True)
    gpr.fit(graphs, y)
    z = gpr.predict(graphs)
    assert np.allclose(z, y, atol=1e-2)

    zq, std = gpr.predict(graphs[:3], return_std=True)
    assert np.all(std >= 0)

    # LML and gradient are finite and FD-consistent
    lml, grad = gpr.log_marginal_likelihood(eval_gradient=True)
    assert np.isfinite(lml) and np.all(np.isfinite(grad))
    eps = 1e-4
    t0 = kernel.theta
    for i in range(len(t0)):
        tp = t0.copy(); tp[i] += eps
        tm = t0.copy(); tm[i] -= eps
        fd = (
            gpr.log_marginal_likelihood(tp)
            - gpr.log_marginal_likelihood(tm)
        ) / (2 * eps)
        assert grad[i] == pytest.approx(fd, rel=0.05, abs=0.5), i


def test_mcts_graph_transformer_seek():
    """MCTSGraphTransformer.seek on a toy integer 'graph' space with an
    exact surrogate: rewriting increments/decrements the value, the
    surrogate predicts it directly, and the search must discover states
    at (or near) the target and rank them first by likelihood
    (reference semantics: tree_search/graph_transformer.py seek)."""
    import numpy as np
    from graphdot_tpu.model.tree_search import MCTSGraphTransformer

    class ExactSurrogate:
        def predict(self, X, return_cov=False):
            mean = np.asarray([float(g) for g in X])
            cov = np.eye(len(mean)) * 0.25
            return (mean, cov) if return_cov else mean

    def rewriter(node, rng):
        g = int(node.g)
        return [g - 1, g + 1, g + rng.integers(-2, 3)]

    mcts = MCTSGraphTransformer(
        rewriter=rewriter, surrogate=ExactSurrogate(),
        exploration_bias=1.0, precision=0.1,
    )
    df = mcts.seek(g0=0, target=3.0, maxiter=120, random_state=42)

    # the best-ranked discovered states sit at/near the target
    best = df.g.iloc[0]
    assert abs(best - 3.0) <= 1.0
    assert df.likelihood.iloc[0] >= df.likelihood.iloc[-1]
    assert (df.likelihood.values[:-1] >= df.likelihood.values[1:]).all()

    # return_tree=True exposes the raw search tree
    tree = mcts.seek(g0=0, target=3.0, maxiter=10, return_tree=True,
                     random_state=0)
    assert tree.children[0] is not None
    flat = tree.flat
    assert 'level' in flat.columns and len(flat) > 10
