"""Nystrom low-rank approximate GPR (reference:
``graphdot/model/gaussian_process/nystrom.py:12``)."""
import time
import warnings

import numpy as np

from ...linalg import low_rank as lr
from ...linalg.spectral import powerh
from ...util.printer import markdown as mprint
from .base import GaussianProcessRegressorBase


class LowRankApproximateGPR(GaussianProcessRegressorBase):
    r"""Accelerated GPR using the Nystrom low-rank approximation: the full
    kernel is approximated as :math:`K \approx K_{xc} K_{cc}^{-1} K_{cx}`
    over a core sample set C, stored lazily as ``LLT`` factors so that no
    N-by-N matrix is ever materialized.

    Parameters
    ----------
    kernel: kernel instance
    alpha: float > 0
        Diagonal regularization of the core matrix.
    beta: float > 0
        Singular-value cutoff in the low-rank pseudoinverse.
    optimizer: str, True, None, or callable
    normalize_y, regularization, kernel_options: see
        GaussianProcessRegressor.
    """

    def __init__(self, kernel, alpha=1e-7, beta=1e-7, optimizer=None,
                 normalize_y=False, regularization='+', kernel_options={}):
        super().__init__(
            kernel, normalize_y=normalize_y, regularization=regularization,
            kernel_options=kernel_options
        )
        self.alpha = alpha
        self.beta = beta
        self.optimizer = optimizer
        if optimizer is True:
            self.optimizer = 'L-BFGS-B'

    @property
    def C(self):
        """The core sample set defining the low-rank subspace."""
        try:
            return self._C
        except AttributeError:
            raise AttributeError(
                'Core samples do not exist. Please provide using fit().'
            )

    @C.setter
    def C(self, C):
        self._C = C

    def _corespace(self, C=None, Kcc=None):
        """Kcc^-1/2 via Hermitian fractional power, with clamped
        pseudoinverse fallback."""
        assert C is None or Kcc is None
        if Kcc is None:
            Kcc = self._gramian(self.alpha, C)
        try:
            return powerh(Kcc, -0.5, return_symmetric=False)
        except np.linalg.LinAlgError:
            warnings.warn(
                'Core matrix singular, try to increase `alpha`.\n'
                'Now falling back to use a pseudoinverse.'
            )
            try:
                return powerh(Kcc, -0.5, rcond=self.beta, mode='clamp',
                              return_symmetric=False)
            except np.linalg.LinAlgError:
                raise np.linalg.LinAlgError(
                    'The core matrix is likely corrupted with NaNs and '
                    'Infs because a pseudoinverse could not be computed.'
                )

    def fit(self, C, X, y, loss='likelihood', tol=1e-5, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Train the low-rank GPR model on core set C and data (X, y).

        Returns self.
        """
        self.C = C
        self.X = X
        self.y = y

        if self.optimizer:
            if loss == 'likelihood':
                objective = self.log_marginal_likelihood
            elif loss == 'loocv':
                raise NotImplementedError(
                    'LOOCV training is not available for the low-rank '
                    'model.'
                )
            else:
                raise RuntimeError(f'Unknown loss function: {loss}.')

            def xgen(n):
                x0 = self.kernel.theta.copy()
                yield x0
                yield from x0 + theta_jitter * np.random.randn(
                    n - 1, len(x0)
                )

            opt = self._hyper_opt(
                method=self.optimizer,
                fun=lambda theta, objective=objective: objective(
                    theta, eval_gradient=True, clone_kernel=False,
                    verbose=verbose
                ),
                xgen=xgen(repeat), tol=tol, verbose=verbose
            )
            if verbose:
                print(f'Optimization result:\n{opt}')
            if opt.success:
                self.kernel.theta = opt.x
            else:
                raise RuntimeError(
                    f'Training using the {loss} loss did not converge, '
                    f'got:\n{opt}'
                )

        self.Kcc_rsqrt = self._corespace(C=self._C)
        self.Kxc = self._gramian(None, self._X, self._C)[self._y_mask, :]
        self.Fxc = self.Kxc @ self.Kcc_rsqrt
        self.Kinv = lr.dot(self.Fxc, rcond=self.beta, mode='clamp').pinv()
        self.Ky = self.Kinv @ self._y
        return self

    def predict(self, Z, return_std=False, return_cov=False):
        """Predict mean (and optionally std/cov) with lazy low-rank cross
        kernels."""
        if not hasattr(self, 'Kinv'):
            raise RuntimeError('Model not trained.')
        Kzc = self._gramian(None, Z, self._C)
        Fzc = Kzc @ self.Kcc_rsqrt
        Kzx = lr.dot(Fzc, self.Fxc.T)

        ymean = Kzx @ self.Ky * self._ystd + self._ymean
        if return_std is True:
            Kzz = self._gramian(self.alpha, Z, diag=True)
            std = np.sqrt(
                np.maximum(Kzz - (Kzx @ self.Kinv @ Kzx.T).diagonal(), 0)
            )
            return (ymean, std * self._ystd)
        elif return_cov is True:
            Kzz = self._gramian(self.alpha, Z)
            cov = np.maximum(Kzz - (Kzx @ self.Kinv @ Kzx.T).todense(), 0)
            return (ymean, cov * self._ystd ** 2)
        else:
            return ymean

    def predict_loocv(self, Z, z, return_std=False, method='auto'):
        """Leave-one-out cross-validation prediction; 'ridge-like' is more
        stable for small full-rank cores, 'gpr-like' for larger cores."""
        assert len(Z) == len(z)
        z = np.asarray(z)
        if self.normalize_y is True:
            z_mean, z_std = np.mean(z), np.std(z)
            z = (z - z_mean) / z_std
        else:
            z_mean, z_std = 0, 1

        if not hasattr(self, 'Kcc_rsqrt'):
            raise RuntimeError('Model not trained.')
        Kzc = self._gramian(None, Z, self._C)

        Cov = Kzc.T @ Kzc
        Cov.flat[::len(self._C) + 1] += self.alpha
        Cov_rsqrt, eigvals = powerh(
            Cov, -0.5, return_symmetric=False, return_eigvals=True
        )

        # an eigenvalue below alpha would have been negative before the
        # regularization, indicating rank deficiency
        if method == 'auto':
            method = 'ridge-like' if eigvals.min() > self.alpha \
                else 'gpr-like'

        if method == 'ridge-like':
            P = Kzc @ Cov_rsqrt
            L = lr.dot(P, P.T)
            zstar = z - (z - L @ z) / (1 - L.diagonal())
            if return_std is True:
                raise NotImplementedError(
                    'LOOCV std using the ridge-like method is not '
                    'available.'
                )
        elif method == 'gpr-like':
            F = Kzc @ self.Kcc_rsqrt
            Kinv = lr.dot(F, rcond=self.beta, mode='clamp').pinv()
            zstar = z - (Kinv @ z) / Kinv.diagonal()
            if return_std is True:
                std = np.sqrt(1 / np.maximum(Kinv.diagonal(), 1e-14))
        else:
            raise RuntimeError(
                f'Unknown method {method} for predict_loocv.'
            )

        if return_std is True:
            return (zstar * z_std + z_mean, std * z_std)
        else:
            return zstar * z_std + z_mean

    def log_marginal_likelihood(self, theta=None, C=None, X=None, y=None,
                                eval_gradient=False, clone_kernel=True,
                                verbose=False):
        """Low-rank log-marginal likelihood with per-theta lazy low-rank
        d_K assembly (reference ``nystrom.py:301-412``)."""
        theta = theta if theta is not None else self.kernel.theta
        C = C if C is not None else self._C
        X = X if X is not None else self._X
        if y is not None:
            y_mask, y = self.mask(y)
        else:
            y = self._y
            y_mask = self._y_mask

        if clone_kernel is True:
            kernel = self.kernel.clone_with_theta(theta)
        else:
            kernel = self.kernel
            kernel.theta = theta

        t_kernel = time.perf_counter()
        if eval_gradient is True:
            Kxc, d_Kxc = self._gramian(None, X, C, kernel=kernel, jac=True)
            Kcc, d_Kcc = self._gramian(
                self.alpha, C, kernel=kernel, jac=True
            )
            Kxc, d_Kxc = Kxc[y_mask, :], d_Kxc[y_mask, :, :]
        else:
            Kxc = self._gramian(None, X, C, kernel=kernel)[y_mask, :]
            Kcc = self._gramian(self.alpha, C, kernel=kernel)
        t_kernel = time.perf_counter() - t_kernel

        t_linalg = time.perf_counter()
        Kcc_rsqrt = self._corespace(Kcc=Kcc)
        F = Kxc @ Kcc_rsqrt
        K = lr.dot(F, rcond=self.beta, mode='clamp')
        K_inv = K.pinv()

        logdet = K.logdet()
        Ky = K_inv @ y
        yKy = y @ Ky
        logP = yKy + logdet

        if eval_gradient is True:
            D_theta = np.zeros_like(theta)
            K_inv2 = K_inv ** 2
            for i, t in enumerate(theta):
                d_F = d_Kxc[:, :, i] @ Kcc_rsqrt
                d_K = lr.dot(F, d_F.T) + lr.dot(d_F, F.T) - lr.dot(
                    F @ Kcc_rsqrt.T @ d_Kcc[:, :, i],
                    Kcc_rsqrt @ F.T
                )
                d_logdet = (K_inv @ d_K).trace()
                d_Kinv_part = K_inv2 @ d_K - K_inv2 @ d_K @ (K @ K_inv)
                d_Kinv = d_Kinv_part + d_Kinv_part.T \
                    - K_inv @ d_K @ K_inv
                d_yKy = d_Kinv.quadratic(y, y)
                D_theta[i] = (d_logdet + d_yKy) * np.exp(t)
            retval = (logP, D_theta)
        else:
            retval = logP
        t_linalg = time.perf_counter() - t_linalg

        if verbose and eval_gradient is True:
            mprint.table(
                ('logP', '%12.5g', logP),
                ('dlogP', '%12.5g', np.linalg.norm(D_theta)),
                ('y^T.K.y', '%12.5g', yKy),
                ('log|K| ', '%12.5g', logdet),
                ('Cond(K)', '%12.5g', K.cond()),
                ('t_kernel', '%10.2g', t_kernel),
                ('t_linalg', '%10.2g', t_linalg),
            )

        return retval
