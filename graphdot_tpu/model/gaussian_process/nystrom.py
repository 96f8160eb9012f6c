"""Nystrom low-rank approximate GPR.

Fills the role of the reference's
``graphdot/model/gaussian_process/nystrom.py:12``. The low-rank LML here
is one jitted JAX function of (Kxc, Kcc) — eigh-whiten the core, SVD the
whitened cross factor, read the pseudo-determinant off the spectrum —
and its hyperparameter gradient is automatic differentiation contracted
against the kernel jacobians, replacing the reference's per-theta lazy
low-rank assembly (``nystrom.py:301-412``). Factored algebra for
prediction comes from :mod:`graphdot_tpu.linalg.low_rank`.
"""
import warnings

import numpy as np

from ...linalg import low_rank as lr
from ...linalg.spectral import powerh
from ...util.printer import markdown as mprint
from . import _objectives as obj
from .base import GaussianProcessRegressorBase


class LowRankApproximateGPR(GaussianProcessRegressorBase):
    r"""GPR accelerated by the Nystrom approximation
    :math:`K \approx K_{xc} K_{cc}^{-1} K_{cx}` over a core set C; no
    N-by-N matrix is ever materialized.

    Parameters
    ----------
    kernel: kernel instance
    alpha: float > 0
        Diagonal regularization of the core matrix.
    beta: float > 0
        Eigenvalue/singular-value cutoff of the low-rank pseudoinverse.
    optimizer, normalize_y, regularization, kernel_options: see
        :class:`GaussianProcessRegressor`.
    """

    def __init__(self, kernel, alpha=1e-7, beta=1e-7, optimizer=None,
                 normalize_y=False, regularization='+', kernel_options={}):
        super().__init__(
            kernel, normalize_y=normalize_y, regularization=regularization,
            kernel_options=kernel_options)
        self.alpha = alpha
        self.beta = beta
        self.optimizer = 'L-BFGS-B' if optimizer is True else optimizer

    @property
    def C(self):
        """The core samples spanning the low-rank subspace."""
        if not hasattr(self, '_C'):
            raise AttributeError(
                'Core samples do not exist. Please provide using fit().')
        return self._C

    @C.setter
    def C(self, samples):
        self._C = samples

    def _whitener(self, Kcc):
        """The half transform ``Kcc^-1/2`` (columns only), strict first,
        then clamped at ``beta`` with a warning."""
        try:
            return powerh(Kcc, -0.5, return_symmetric=False)
        except np.linalg.LinAlgError:
            warnings.warn(
                'Core matrix singular; consider increasing alpha. '
                'Falling back to a clamped pseudoinverse.')
            return powerh(Kcc, -0.5, rcond=self.beta, mode='clamp',
                          return_symmetric=False)

    # -- training ---------------------------------------------------------

    def fit(self, C, X, y, loss='likelihood', tol=1e-5, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Train on core set C and data (X, y). Returns self."""
        self.C = C
        self.X = X
        self.y = y

        if self.optimizer:
            if loss != 'likelihood':
                raise RuntimeError(
                    f"Loss '{loss}' is not available for the low-rank "
                    'model (use likelihood).')
            best = self._hyper_opt(
                method=self.optimizer,
                fun=lambda t: self.log_marginal_likelihood(
                    t, eval_gradient=True, clone_kernel=False,
                    verbose=verbose),
                xgen=self._theta_restarts(repeat, theta_jitter),
                tol=tol, verbose=verbose)
            if verbose:
                print(f'Optimization result:\n{best}')
            if not best.success:
                raise RuntimeError(
                    f'Training using the {loss} loss did not converge, '
                    f'got:\n{best}')
            self.kernel.theta = best.x

        self._whiten_half = self._whitener(self._gramian(self.alpha, self._C))
        Kxc = self._gramian(None, self._X, self._C)[self._y_mask]
        self._F_train = Kxc @ self._whiten_half
        self._K_pinv = lr.dot(self._F_train, rcond=self.beta, mode='clamp').pinv()
        self._weights = self._K_pinv @ self._y
        return self

    # -- prediction -------------------------------------------------------

    def predict(self, Z, return_std=False, return_cov=False):
        """Posterior mean (and std/cov) through the factored kernel."""
        if not hasattr(self, '_K_pinv'):
            raise RuntimeError('Model not trained.')
        Fzc = self._gramian(None, Z, self._C) @ self._whiten_half
        Kzx = lr.dot(Fzc, self._F_train.T)

        mean = Kzx @ self._weights * self._ystd + self._ymean
        if return_std:
            prior = self._gramian(self.alpha, Z, diag=True)
            explained = (Kzx @ self._K_pinv @ Kzx.T).diagonal()
            std = np.sqrt(np.maximum(prior - explained, 0.0))
            return mean, std * self._ystd
        if return_cov:
            prior = self._gramian(self.alpha, Z)
            cov = np.maximum(
                prior - (Kzx @ self._K_pinv @ Kzx.T).todense(), 0.0)
            return mean, cov * self._ystd ** 2
        return mean

    def predict_loocv(self, Z, z, return_std=False, method='auto'):
        """Leave-one-out predictions on set Z; 'ridge-like' is stabler
        for small full-rank cores, 'gpr-like' for larger ones."""
        assert len(Z) == len(z)
        z = np.asarray(z, dtype=float)
        if self.normalize_y:
            z_mean, z_std = z.mean(), z.std()
            z = (z - z_mean) / z_std
        else:
            z_mean, z_std = 0.0, 1.0

        if not hasattr(self, '_whiten_half'):
            raise RuntimeError('Model not trained.')
        Kzc = self._gramian(None, Z, self._C)

        if method == 'auto':
            # an eigenvalue of Kzc^T Kzc below alpha signals rank
            # deficiency, for which the gpr-like form is the safe choice
            smallest = np.linalg.eigvalsh(Kzc.T @ Kzc)[0] + self.alpha
            method = 'ridge-like' if smallest > self.alpha else 'gpr-like'

        if method == 'ridge-like':
            if return_std:
                raise NotImplementedError(
                    'LOOCV std is unavailable with the ridge-like method.')
            G = Kzc.T @ Kzc + self.alpha * np.eye(len(self._C))
            P = Kzc @ powerh(G, -0.5, return_symmetric=False)
            hat = lr.dot(P)
            loo = z - (z - hat @ z) / (1.0 - hat.diagonal())
        elif method == 'gpr-like':
            F = Kzc @ self._whiten_half
            K_inv = lr.dot(F, rcond=self.beta, mode='clamp').pinv()
            precision = K_inv.diagonal()
            loo = z - (K_inv @ z) / precision
            if return_std:
                std = np.sqrt(1.0 / np.maximum(precision, 1e-14))
                return loo * z_std + z_mean, std * z_std
        else:
            raise RuntimeError(f'Unknown method {method} for '
                               'predict_loocv.')
        return loo * z_std + z_mean

    # -- objective ----------------------------------------------------------

    def log_marginal_likelihood(self, theta=None, C=None, X=None, y=None,
                                eval_gradient=False, clone_kernel=True,
                                verbose=False):
        """Low-rank negative LML; gradients are autodiff w.r.t.
        (Kxc, Kcc) folded through the kernel jacobians."""
        theta = self.kernel.theta if theta is None else theta
        C = self._C if C is None else C
        X = self._X if X is None else X
        if y is None:
            y, y_mask = self._y, self._y_mask
        else:
            y_mask, y = self.mask(y)

        if clone_kernel:
            kernel = self.kernel.clone_with_theta(theta)
        else:
            kernel = self.kernel
            kernel.theta = theta

        if eval_gradient:
            Kxc, dKxc = self._gramian(None, X, C, kernel=kernel, jac=True)
            Kcc, dKcc = self._gramian(self.alpha, C, kernel=kernel,
                                      jac=True)
            Kxc, dKxc = Kxc[y_mask], dKxc[y_mask]
            value, (gXC, gCC) = obj.nystrom_negative_log_marginal(
                Kxc, Kcc, y, self.beta, with_grad=True)
            grad = (obj.chain_to_theta(gXC, dKxc, theta)
                    + obj.chain_to_theta(gCC, dKcc, theta))
            if verbose:
                mprint.table(
                    ('logP', '%12.5g', value),
                    ('dlogP', '%12.5g', np.linalg.norm(grad)),
                )
            return float(value), grad

        Kxc = self._gramian(None, X, C, kernel=kernel)[y_mask]
        Kcc = self._gramian(self.alpha, C, kernel=kernel)
        return float(obj.nystrom_negative_log_marginal(
            Kxc, Kcc, y, self.beta))
