"""GPR with per-sample noise learning for outlier detection (fills the
role of the reference's
``graphdot/model/gaussian_process/outlier_detector.py:11``).

The hyperparameter vector is extended with one log-noise term per training
sample; an L1 penalty drives most noises to the floor so that genuinely
inconsistent samples stand out with large learned sigma_i.
"""
import time

import numpy as np
from scipy.optimize import minimize

from ...util.iterable import fold_like
from ...util.printer import markdown as mprint
from .base import GaussianProcessRegressorBase


class GPROutlierDetector(GaussianProcessRegressorBase):
    """Maximum-likelihood GPR with per-sample noise (outlier scores).

    Parameters
    ----------
    kernel: kernel instance
    sigma_bounds: (float, float)
        Allowed range of each per-sample noise magnitude.
    beta: float > 0
        Singular-value cutoff of the pseudoinverse.
    optimizer: str, True, None, or callable
    normalize_y: bool
    kernel_options: dict
    """

    def __init__(self, kernel, sigma_bounds=(1e-4, np.inf), beta=1e-8,
                 optimizer=True, normalize_y=False, kernel_options={}):
        super().__init__(
            kernel, normalize_y=normalize_y,
            kernel_options=kernel_options, regularization='+'
        )
        self.sigma_bounds = sigma_bounds
        self.beta = beta
        self.optimizer = 'L-BFGS-B' if optimizer is True else optimizer

    @property
    def y_uncertainty(self):
        """Learned per-sample uncertainty magnitudes (original y units)."""
        try:
            return self._sigma * self._ystd
        except AttributeError:
            raise AttributeError('Uncertainty must be learned via fit().')

    def _split_ext(self, theta_ext, y):
        """Split the extended vector into kernel theta and log sigmas."""
        return fold_like(theta_ext, (self.kernel.theta, y))

    def fit(self, X, y, w, udist=None, tol=1e-4, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Fit with L1-penalized per-sample noise.

        Parameters
        ----------
        w: float
            L1 penalty strength on the noise magnitudes.
        udist: callable(n) -> ndarray or None
            Sampler of initial noise guesses (lognormal by default).

        Returns self.
        """
        self.X = X
        self.y = y

        if self.optimizer:
            def restarts(n):
                x0 = self.kernel.theta.copy()
                yield x0
                for _ in range(n - 1):
                    yield x0 + theta_jitter * np.random.randn(len(x0))

            opt = self._hyper_opt_l1reg(
                fun=lambda theta_ext: self.log_marginal_likelihood(
                    theta_ext, eval_gradient=True, clone_kernel=False,
                    verbose=verbose
                ),
                xgen=restarts(repeat),
                udist=udist, w=w, tol=tol, verbose=verbose
            )
            if verbose:
                print(f'Optimization result:\n{opt}')
            if not opt.success:
                raise RuntimeError(f'Training did not converge, got:\n{opt}')
            theta, log_sigma = self._split_ext(opt.x, self._y)
            self.kernel.theta = theta
            self._sigma = np.exp(log_sigma)

        self.K = K = self._gramian(self._sigma ** 2, self._X)
        self.Kinv, _ = self._invert_pseudoinverse(K, rcond=self.beta)
        self.Ky = self.Kinv @ self._y
        return self

    def predict(self, Z, return_std=False, return_cov=False):
        """Posterior prediction with the learned noise model."""
        if not hasattr(self, 'Kinv'):
            raise RuntimeError('Model not trained.')
        Ks = self._gramian(None, Z, self._X)
        mean = (Ks @ self.Ky) * self._ystd + self._ymean
        if return_std:
            Kss = self._gramian(0, Z, diag=True)
            residual = Kss - (Ks @ (self.Kinv @ Ks.T)).diagonal()
            return mean, np.sqrt(np.maximum(0, residual)) * self._ystd
        if return_cov:
            Kss = self._gramian(0, Z)
            cov = np.maximum(0, Kss - Ks @ (self.Kinv @ Ks.T))
            return mean, cov * self._ystd ** 2
        return mean

    def log_marginal_likelihood(self, theta_ext, X=None, y=None,
                                eval_gradient=False, clone_kernel=True,
                                verbose=False):
        """Negative LML over the extended vector [theta..., log sigma...];
        noise gradients are d = (diag K⁻¹ - (K⁻¹y)²) · 2 sigma."""
        X = self._X if X is None else X
        y = self._y if y is None else y
        theta, log_sigma = self._split_ext(theta_ext, y)
        sigma = np.exp(log_sigma)

        if clone_kernel:
            kernel = self.kernel.clone_with_theta(theta)
        else:
            kernel = self.kernel
            kernel.theta = theta

        t0 = time.perf_counter()
        if eval_gradient:
            K, dK = self._gramian(sigma ** 2, X, kernel=kernel, jac=True)
        else:
            K = self._gramian(sigma ** 2, X, kernel=kernel)
        t_kernel = time.perf_counter() - t0

        t0 = time.perf_counter()
        Kinv, logdet = self._invert_pseudoinverse(K, rcond=self.beta)
        Ky = Kinv @ y
        yKy = y @ Ky
        nlml = yKy + logdet

        if eval_gradient:
            d_theta = (
                np.einsum('ij,ijk->k', Kinv, dK)
                - np.einsum('i,ijk,j->k', Ky, dK, Ky)
            )
            d_sigma = (Kinv.diagonal() - Ky ** 2) * 2 * sigma
            grad = np.concatenate((d_theta, d_sigma)) * np.exp(theta_ext)
        t_linalg = time.perf_counter() - t0

        if verbose and eval_gradient:
            mprint.table(
                ('logP', '%12.5g', nlml),
                ('dlogP', '%12.5g', np.linalg.norm(grad)),
                ('y^T.K.y', '%12.5g', yKy),
                ('log|K| ', '%12.5g', logdet),
                ('Cond(K)', '%12.5g', np.linalg.cond(K)),
                ('t_kernel', '%10.2g', t_kernel),
                ('t_linalg', '%10.2g', t_linalg),
            )

        return (nlml, grad) if eval_gradient else nlml

    def _hyper_opt_l1reg(self, fun, xgen, udist, w, tol, verbose):
        """Multi-restart L-BFGS over [theta, log sigma] with an L1
        penalty on the sigmas."""
        n = len(self._y)
        if udist is None:
            def udist(k):
                return self._ystd * np.random.lognormal(-1.0, 1.0, k)
        assert callable(udist)

        penalty = np.concatenate((
            np.zeros_like(self.kernel.theta), np.full(n, float(w))
        ))
        bounds = np.vstack((
            self.kernel.bounds,
            np.tile(np.log(self.sigma_bounds), (n, 1)),
        ))

        def penalized(x):
            value, grad = fun(x)
            lasso = penalty * np.exp(x)
            return value + lasso.sum(), grad + lasso

        best = None
        for x0 in xgen:
            if verbose:
                mprint.table_start()
            res = minimize(
                fun=penalized,
                method=self.optimizer,
                x0=np.concatenate((x0, np.log(udist(n)))),
                bounds=bounds,
                jac=True,
                tol=tol,
            )
            if best is None or (res.success and res.fun < best.fun):
                best = res
        return best
