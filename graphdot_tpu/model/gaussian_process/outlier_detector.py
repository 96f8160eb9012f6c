"""GPR with per-sample noise learning for outlier detection (reference:
``graphdot/model/gaussian_process/outlier_detector.py:11``)."""
import time

import numpy as np
from scipy.optimize import minimize

from ...util.iterable import fold_like
from ...util.printer import markdown as mprint
from .base import GaussianProcessRegressorBase


class GPROutlierDetector(GaussianProcessRegressorBase):
    """GPR with noise/outlier detection via maximum likelihood: each
    training sample gets its own noise magnitude sigma_i, appended to the
    hyperparameter vector and L1-penalized during optimization.

    Parameters
    ----------
    kernel: kernel instance
    sigma_bounds: (float, float)
        Per-sample bounds of the diagonal noise terms.
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
        self.optimizer = optimizer
        if self.optimizer is True:
            self.optimizer = 'L-BFGS-B'

    @property
    def y_uncertainty(self):
        """The learned uncertainty magnitude of each training sample."""
        try:
            return self._sigma * self._ystd
        except AttributeError:
            raise AttributeError('Uncertainty must be learned via fit().')

    def fit(self, X, y, w, udist=None, tol=1e-4, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Train with L1-penalized per-sample noise.

        Parameters
        ----------
        w: float
            Strength of the L1 penalty on the noise terms.
        udist: callable or None
            Initial-guess distribution of the uncertainties (lognormal by
            default).

        Returns self.
        """
        self.X = X
        self.y = y

        if self.optimizer:
            def xgen(n):
                x0 = self.kernel.theta.copy()
                yield x0
                yield from x0 + theta_jitter * np.random.randn(
                    n - 1, len(x0)
                )

            opt = self._hyper_opt_l1reg(
                method=self.optimizer,
                fun=lambda theta_ext: self.log_marginal_likelihood(
                    theta_ext, eval_gradient=True, clone_kernel=False,
                    verbose=verbose
                ),
                xgen=xgen(repeat),
                udist=udist, w=w, tol=tol, verbose=verbose
            )
            if verbose:
                print(f'Optimization result:\n{opt}')
            if opt.success:
                self.kernel.theta, log_sigma = fold_like(
                    opt.x, (self.kernel.theta, self._y)
                )
                self._sigma = np.exp(log_sigma)
            else:
                raise RuntimeError(
                    f'Training did not converge, got:\n{opt}'
                )

        self.K = K = self._gramian(self._sigma ** 2, self._X)
        self.Kinv, _ = self._invert_pseudoinverse(K, rcond=self.beta)
        self.Ky = self.Kinv @ self._y
        return self

    def predict(self, Z, return_std=False, return_cov=False):
        """Predict using the trained model."""
        if not hasattr(self, 'Kinv'):
            raise RuntimeError('Model not trained.')
        Ks = self._gramian(None, Z, self._X)
        ymean = (Ks @ self.Ky) * self._ystd + self._ymean
        if return_std is True:
            Kss = self._gramian(0, Z, diag=True)
            std = np.sqrt(
                np.maximum(0, Kss - (Ks @ (self.Kinv @ Ks.T)).diagonal())
            )
            return (ymean, std * self._ystd)
        elif return_cov is True:
            Kss = self._gramian(0, Z)
            cov = np.maximum(0, Kss - Ks @ (self.Kinv @ Ks.T))
            return (ymean, cov * self._ystd ** 2)
        else:
            return ymean

    def log_marginal_likelihood(self, theta_ext, X=None, y=None,
                                eval_gradient=False, clone_kernel=True,
                                verbose=False):
        """LML over the extended hyperparameter vector
        [kernel theta..., log per-sample sigmas...]; the noise gradient is
        d_sigma = (diag K^-1 - (K^-1 y)^2) * 2 sigma."""
        X = X if X is not None else self._X
        y = y if y is not None else self._y
        theta, log_sigma = fold_like(theta_ext, (self.kernel.theta, y))
        sigma = np.exp(log_sigma)

        if clone_kernel is True:
            kernel = self.kernel.clone_with_theta(theta)
        else:
            kernel = self.kernel
            kernel.theta = theta

        t_kernel = time.perf_counter()
        if eval_gradient is True:
            K, dK = self._gramian(sigma ** 2, X, kernel=kernel, jac=True)
        else:
            K = self._gramian(sigma ** 2, X, kernel=kernel)
        t_kernel = time.perf_counter() - t_kernel

        t_linalg = time.perf_counter()
        Kinv, logdet = self._invert_pseudoinverse(K, rcond=self.beta)
        Kinv_diag = Kinv.diagonal()
        Ky = Kinv @ y
        yKy = y @ Ky

        if eval_gradient is True:
            d_theta = (
                np.einsum('ij,ijk->k', Kinv, dK)
                - np.einsum('i,ijk,j', Ky, dK, Ky)
            )
            d_alpha = (Kinv_diag - Ky ** 2) * 2 * sigma
            retval = (
                yKy + logdet,
                np.concatenate((d_theta, d_alpha)) * np.exp(theta_ext)
            )
        else:
            retval = yKy + logdet
        t_linalg = time.perf_counter() - t_linalg

        if verbose and eval_gradient is True:
            mprint.table(
                ('logP', '%12.5g', yKy + logdet),
                ('dlogP', '%12.5g', np.linalg.norm(d_theta)),
                ('y^T.K.y', '%12.5g', yKy),
                ('log|K| ', '%12.5g', logdet),
                ('Cond(K)', '%12.5g', np.linalg.cond(K)),
                ('t_kernel', '%10.2g', t_kernel),
                ('t_linalg', '%10.2g', t_linalg),
            )

        return retval

    def _hyper_opt_l1reg(self, method, fun, xgen, udist, w, tol, verbose):
        """Multi-restart L-BFGS over [theta, log sigma] with an L1 penalty
        on sigma."""
        if udist is None:
            def udist(n):
                return self._ystd * np.random.lognormal(-1.0, 1.0, n)
        assert callable(udist)

        penalty = np.concatenate((
            np.zeros_like(self.kernel.theta),
            np.ones_like(self._y) * w
        ))

        def ext_fun(x):
            exp_x = np.exp(x)
            val, jac = fun(x)
            return (
                val + np.linalg.norm(penalty * exp_x, ord=1),
                jac + penalty * exp_x
            )

        opt = None
        for x in xgen:
            if verbose:
                mprint.table_start()
            opt_local = minimize(
                fun=ext_fun,
                method=self.optimizer,
                x0=np.concatenate((x, np.log(udist(len(self._y))))),
                bounds=np.vstack((
                    self.kernel.bounds,
                    np.tile(np.log(self.sigma_bounds), (len(self._y), 1)),
                )),
                jac=True,
                tol=tol,
            )
            if not opt or (opt_local.success and opt_local.fun < opt.fun):
                opt = opt_local
        return opt
