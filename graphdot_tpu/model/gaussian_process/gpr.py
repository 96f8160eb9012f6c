"""Gaussian process regression (fills the role of the reference's
``graphdot/model/gaussian_process/gpr.py:9``)."""
import time

import numpy as np

from ...util.printer import markdown as mprint
from .base import GaussianProcessRegressorBase


class GaussianProcessRegressor(GaussianProcessRegressorBase):
    """GPR over arbitrary objects through a kernel.

    Parameters
    ----------
    kernel: kernel instance
        The covariance function of the GP.
    alpha: float > 0
        Diagonal regularization of the kernel matrix during fitting
        (observation noise / numerical jitter).
    beta: float > 0
        Singular-value cutoff of the pseudoinverse fallback.
    optimizer: str, True, None, or callable
        A scipy.optimize.minimize method name; True means L-BFGS-B; None
        disables hyperparameter optimization.
    normalize_y: bool
        Standardize targets during fitting (undone at prediction).
    regularization: '+'/'additive' or '*'/'multiplicative'
    kernel_options: dict
        Extra keyword arguments for every kernel invocation.
    """

    def __init__(self, kernel, alpha=1e-8, beta=1e-8, optimizer=None,
                 normalize_y=False, regularization='+', kernel_options={}):
        super().__init__(
            kernel, normalize_y=normalize_y, regularization=regularization,
            kernel_options=kernel_options
        )
        self.alpha = alpha
        self.beta = beta
        self.optimizer = 'L-BFGS-B' if optimizer is True else optimizer

    # -- training ---------------------------------------------------------

    def fit(self, X, y, loss='likelihood', tol=1e-5, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Fit the model; when an optimizer is configured, first minimize
        the chosen loss ('likelihood' or 'loocv') over log-theta with
        multi-restart L-BFGS. Returns self."""
        self.X = X
        self.y = y

        if self.optimizer:
            objective = {
                'likelihood': self.log_marginal_likelihood,
                'loocv': self.squared_loocv_error,
            }.get(loss)
            if objective is None:
                raise RuntimeError(f'Unknown loss function: {loss}.')

            opt = self._hyper_opt(
                method=self.optimizer,
                fun=lambda theta: objective(
                    theta, eval_gradient=True, clone_kernel=False,
                    verbose=verbose
                ),
                xgen=self._theta_restarts(repeat, theta_jitter),
                tol=tol, verbose=verbose
            )
            if verbose:
                print(f'Optimization result:\n{opt}')
            if not opt.success:
                raise RuntimeError(
                    f'Training using the {loss} loss did not converge, '
                    f'got:\n{opt}'
                )
            self.kernel.theta = opt.x

        K = self._gramian(self.alpha, self._X)
        self.K = K = K[self._y_mask, :][:, self._y_mask]
        self.Kinv, _ = self._invert(K, rcond=self.beta)
        self.Ky = self.Kinv @ self._y
        return self

    def fit_loocv(self, X, y, **options):
        """Fit with the LOOCV loss."""
        return self.fit(X, y, loss='loocv', **options)

    def _theta_restarts(self, repeat, jitter):
        x0 = self.kernel.theta.copy()
        yield x0
        for _ in range(repeat - 1):
            yield x0 + jitter * np.random.randn(len(x0))

    # -- prediction -------------------------------------------------------

    def predict(self, Z, return_std=False, return_cov=False):
        """Posterior mean at Z, optionally with std or covariance."""
        if not hasattr(self, 'Kinv'):
            raise RuntimeError('Model not trained.')
        Ks = self._gramian(None, Z, self._X)[:, self._y_mask]
        mean = (Ks @ self.Ky) * self._ystd + self._ymean
        if return_std:
            Kss = self._gramian(self.alpha, Z, diag=True)
            residual = Kss - (Ks @ (self.Kinv @ Ks.T)).diagonal()
            return mean, np.sqrt(np.maximum(0, residual)) * self._ystd
        if return_cov:
            Kss = self._gramian(self.alpha, Z)
            cov = np.maximum(0, Kss - Ks @ (self.Kinv @ Ks.T))
            return mean, cov * self._ystd ** 2
        return mean

    def predict_loocv(self, Z, z, return_std=False):
        """Leave-one-out predictions via the closed form
        z* = z - K⁻¹z / diag(K⁻¹) (no refitting)."""
        z_mask, z = self.mask(z)
        if self.normalize_y is True:
            z_mean, z_std = np.mean(z), np.std(z)
            z = (z - z_mean) / z_std
        else:
            z_mean, z_std = 0, 1

        K = self._gramian(self.alpha, Z)[z_mask, :][:, z_mask]
        Kinv, _ = self._invert(K, rcond=self.beta)
        if not isinstance(Kinv, np.ndarray):
            Kinv = Kinv.todense()
        prec = Kinv.diagonal()
        mean = (z - Kinv @ z / prec) * z_std + z_mean
        if return_std:
            std = np.sqrt(1 / np.maximum(prec, 1e-14))
            return mean, std * z_std
        return mean

    # -- objectives -------------------------------------------------------

    def _masked_gramian(self, theta, X, y, eval_gradient, clone_kernel):
        """Kernel matrix (and jacobian) at theta, restricted to rows with
        valid targets."""
        if clone_kernel:
            kernel = self.kernel.clone_with_theta(theta)
        else:
            kernel = self.kernel
            kernel.theta = theta
        t0 = time.perf_counter()
        if eval_gradient:
            K, dK = self._gramian(self.alpha, X, kernel=kernel, jac=True)
        else:
            K = self._gramian(self.alpha, X, kernel=kernel)
            dK = None
        elapsed = time.perf_counter() - t0
        return K, dK, elapsed

    def log_marginal_likelihood(self, theta=None, X=None, y=None,
                                eval_gradient=False, clone_kernel=True,
                                verbose=False):
        """Negative log-marginal likelihood yᵀK⁻¹y + log|K| at log-scale
        theta (gradient w.r.t. theta when requested)."""
        theta = self.kernel.theta if theta is None else theta
        X = self._X if X is None else X
        if y is None:
            y, y_mask = self._y, self._y_mask
        else:
            y_mask, y = self.mask(y)

        K, dK, t_kernel = self._masked_gramian(
            theta, X, y, eval_gradient, clone_kernel
        )
        K = K[y_mask, :][:, y_mask]
        if dK is not None:
            dK = dK[y_mask, :, :][:, y_mask, :]

        t0 = time.perf_counter()
        Kinv, logdet = self._invert(K, rcond=self.beta)
        Ky = Kinv @ y
        yKy = y @ Ky
        nlml = yKy + logdet

        if eval_gradient:
            Kinv_dense = (
                Kinv if isinstance(Kinv, np.ndarray) else Kinv.todense()
            )
            # d(nlml)/dt = tr(K⁻¹ dK) - (K⁻¹y)ᵀ dK (K⁻¹y), in log scale
            trace_term = np.einsum('ij,ijk->k', Kinv_dense, dK)
            quad_term = np.einsum('i,ijk,j->k', Ky, dK, Ky)
            grad = (trace_term - quad_term) * np.exp(theta)
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

    def squared_loocv_error(self, theta=None, X=None, y=None,
                            eval_gradient=False, clone_kernel=True,
                            verbose=False):
        """Half the squared LOOCV residual norm at log-scale theta, with
        its analytic gradient when requested."""
        theta = self.kernel.theta if theta is None else theta
        X = self._X if X is None else X
        if y is None:
            y, y_mask = self._y, self._y_mask
        else:
            y_mask, y = self.mask(y)

        K, dK, t_kernel = self._masked_gramian(
            theta, X, y, eval_gradient, clone_kernel
        )
        K = K[y_mask, :][:, y_mask]
        if dK is not None:
            dK = dK[y_mask, :, :][:, y_mask, :]

        t0 = time.perf_counter()
        Kinv, logdet = self._invert(K, rcond=self.beta)
        if not isinstance(Kinv, np.ndarray):
            Kinv = Kinv.todense()
        prec = Kinv.diagonal()
        Ky = Kinv @ y
        e = Ky / prec
        loss = 0.5 * np.sum(e ** 2)

        if eval_gradient:
            # d(e_i) through K⁻¹ dK K⁻¹ terms, vectorized over theta
            KdK = np.einsum('ia,abk->ibk', Kinv, dK)
            term1 = np.einsum('i,ijk,j->k', e / prec, KdK, Ky)
            term2 = np.einsum(
                'i,ijk,ji->k', e ** 2 / prec, KdK, Kinv
            )
            grad = (term2 - term1) * np.exp(theta)
        t_linalg = time.perf_counter() - t0

        if verbose and eval_gradient:
            mprint.table(
                ('Sq.Err.', '%12.5g', loss),
                ('log|K| ', '%12.5g', logdet),
                ('Cond(K)', '%12.5g', np.linalg.cond(K)),
                ('t_kernel', '%10.2g', t_kernel),
                ('t_linalg', '%10.2g', t_linalg),
            )

        return (loss, grad) if eval_gradient else loss
