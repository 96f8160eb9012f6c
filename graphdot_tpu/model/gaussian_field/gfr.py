"""Gaussian field regressor for semi-supervised label propagation
(reference: ``graphdot/model/gaussian_field/gfr.py:11``; Zhu, Ghahramani &
Lafferty, ICML 2003)."""
import time
import warnings

import numpy as np
from scipy.optimize import minimize

from ...linalg.cholesky import CholSolver
from ...util.printer import markdown as mprint


class GaussianFieldRegressor:
    """Semi-supervised prediction of missing continuous node labels via
    harmonic interpolation ``f_u = (D - W_uu)^-1 W_ul f_l``.

    Parameters
    ----------
    weight: callable or 'precomputed'
        Converts data (or distance matrices) to edge weights; if
        'precomputed', X itself is treated as the weight matrix.
    optimizer: str, True, None, or callable
        scipy.optimize.minimize method; True selects L-BFGS-B.
    smoothing: float in [0, 1)
        Regularization via smoothing of the transition matrix.
    """

    def __init__(self, weight, optimizer=None, smoothing=1e-3):
        assert smoothing >= 0, 'Smoothing must be no less than 0.'
        self.weight = weight
        self.optimizer = optimizer
        if optimizer is True:
            self.optimizer = 'L-BFGS-B'
        self.smoothing = smoothing

    def fit(self, X, y, loss='loocv2', tol=1e-5, repeat=1,
            theta_jitter=1.0, verbose=False):
        """Train the Gaussian field model by optimizing the weight
        hyperparameters under the given loss ('ale'/'average-label-entropy',
        'loocv1', or 'loocv2'). Returns self."""
        assert len(X) == len(y)
        X = np.asarray(X)
        y = np.asarray(y, dtype=float)

        trainable = hasattr(self.weight, 'theta') and self.optimizer
        if not trainable:
            return self

        losses = {
            'ale': self.average_label_entropy,
            'average-label-entropy': self.average_label_entropy,
            'loocv1': self.loocv_error_1,
            'loocv2': self.loocv_error_2,
        }
        if loss not in losses:
            raise RuntimeError(f"Unknown loss function '{loss}'")
        objective = losses[loss]

        def restarts():
            x0 = self.weight.theta.copy()
            yield x0
            for _ in range(repeat - 1):
                yield x0 + theta_jitter * np.random.randn(len(x0))

        opt = self._hyper_opt(
            method=self.optimizer,
            fun=lambda theta: objective(
                X, y, theta=theta, eval_gradient=True, verbose=verbose
            ),
            xgen=restarts(), tol=tol, verbose=verbose
        )
        if verbose:
            print(f'Optimization result:\n{opt}')
        if not opt.success:
            raise RuntimeError(f'Optimizer did not converge, got:\n{opt}')
        self.weight.theta = opt.x
        return self

    def predict(self, X, y, return_influence=False):
        """Fill in the unlabeled (None/NaN) entries of y; optionally return
        the influence matrix of labeled onto unlabeled samples."""
        assert len(X) == len(y)
        X = np.asarray(X)
        y = np.asarray(y, dtype=float)

        z = y.copy()
        if return_influence is True:
            z[~np.isfinite(y)], influence = self._predict(
                X, y, return_influence=True
            )
            return z, influence
        else:
            z[~np.isfinite(y)] = self._predict(X, y, return_influence=False)
            return z

    def fit_predict(self, X, y, loss='average-label-entropy', tol=1e-5,
                    repeat=1, theta_jitter=1.0, return_influence=False,
                    verbose=False):
        """Train, then predict the unlabeled nodes."""
        self.fit(
            X, y, loss=loss, tol=tol, repeat=repeat,
            theta_jitter=theta_jitter, verbose=verbose
        )
        return self.predict(X, y, return_influence=return_influence)

    def _hyper_opt(self, method, fun, xgen, tol, verbose):
        opt = None
        for x in xgen:
            if verbose:
                mprint.table_start()
            opt_local = minimize(
                fun=fun, method=method, x0=x, bounds=self.weight.bounds,
                jac=True, tol=tol
            )
            if not opt or (opt_local.success and opt_local.fun < opt.fun):
                opt = opt_local
        return opt

    def _build_field(self, X, y):
        labeled = np.isfinite(y)
        f_l = y[labeled]
        if len(f_l) == len(y):
            raise RuntimeError(
                'All samples are labeled, no predictions will be made.'
            )
        if isinstance(self.weight, str) and self.weight == 'precomputed':
            W_uu = X[~labeled, :][:, ~labeled] + self.smoothing
            W_ul = X[~labeled, :][:, labeled] + self.smoothing
        else:
            W_uu = self.weight(X[~labeled]) + self.smoothing
            W_ul = self.weight(X[~labeled], X[labeled]) + self.smoothing
        return labeled, f_l, W_uu, W_ul

    def _predict(self, X, y, return_influence=False):
        labeled, f_l, W_uu, W_ul = self._build_field(X, y)
        D = W_uu.sum(axis=1) + W_ul.sum(axis=1)

        try:
            L_inv = CholSolver(np.diag(D) - W_uu)
        except np.linalg.LinAlgError:
            L_inv = np.linalg.pinv(np.diag(D) - W_uu)
            warnings.warn(
                'The Graph Laplacian is not positive definite. Some '
                'weights on edges may be invalid.'
            )

        if return_influence is True:
            influence = L_inv @ W_ul
            f_u = influence @ f_l
            return f_u, influence
        else:
            f_u = L_inv @ (W_ul @ f_l)
            return f_u

    def _predict_gradient(self, X, y):
        """Harmonic prediction f_u plus its jacobian w.r.t. the weight
        hyperparameters (linear scale), via the analytic chain rule:

        df_u = L^-1 [dW_uu f_u + dW_ul f_l
                     - (rowsum(dW_uu) + rowsum(dW_ul)) * f_u]
        """
        t_metric = time.perf_counter()
        labeled = np.isfinite(y)
        f_l = y[labeled]
        if len(f_l) == len(y):
            raise RuntimeError(
                'All samples are labeled, no predictions will be made.'
            )
        W_uu, dW_uu = self.weight(X[~labeled], eval_gradient=True)
        W_ul, dW_ul = self.weight(
            X[~labeled], X[labeled], eval_gradient=True
        )
        W_uu = W_uu + self.smoothing
        W_ul = W_ul + self.smoothing
        D = W_uu.sum(axis=1) + W_ul.sum(axis=1)
        t_metric = time.perf_counter() - t_metric

        t_solve = time.perf_counter()
        try:
            L_inv = CholSolver(np.diag(D) - W_uu).todense()
        except np.linalg.LinAlgError:
            L_inv = np.linalg.pinv(np.diag(D) - W_uu)
            warnings.warn(
                'The Graph Laplacian is not positive definite. Some '
                'weights on edges may be invalid.'
            )
        t_solve = time.perf_counter() - t_solve

        t_chain = time.perf_counter()
        f_u = L_inv @ (W_ul @ f_l)
        # rhs[m, j] of the tangent system for each hyperparameter j
        rhs = (
            np.einsum('mnj,n->mj', dW_uu, f_u)
            + np.einsum('mnj,n->mj', dW_ul, f_l)
            - (dW_uu.sum(axis=1) + dW_ul.sum(axis=1)) * f_u[:, None]
        )
        df_u = L_inv @ rhs
        t_chain = time.perf_counter() - t_chain

        return f_u, df_u, t_metric, t_solve, t_chain

    def average_label_entropy(self, X, y, theta=None, eval_gradient=False,
                              verbose=False):
        """Average label entropy of the predictions on unlabeled nodes
        (labels must be 0/1); optionally with its gradient w.r.t. the
        log-scale weight hyperparameters."""
        if theta is not None:
            self.weight.theta = theta

        if eval_gradient is True:
            z, dz, t_metric, t_solve, t_chain = self._predict_gradient(X, y)
        else:
            z = self._predict(X, y)
        z = np.clip(z, 1e-7, 1 - 1e-7)
        entropy = -(z * np.log(z) + (1 - z) * np.log1p(-z))
        loss = entropy.mean()
        if eval_gradient is True:
            # dW from the weight is already log-scale, so no extra chain;
            # d(-entropy)/dz = log(z) - log(1-z) = logit(z)
            logit = np.log(z) - np.log1p(-z)
            grad = -np.mean(logit[:, None] * dz, axis=0)
            retval = (loss, grad)
        else:
            retval = loss

        if verbose and eval_gradient is True:
            mprint.table(
                ('Avg.Entropy', '%12.5g', loss),
                ('Gradient', '%12.5g', np.linalg.norm(grad)),
                ('Metric time', '%12.2g', t_metric),
                ('Solver time', '%12.2g', t_solve),
                ('BackProp time', '%14.2g', t_chain),
            )

        return retval

    def loocv_error(self, X, y, p=2, theta=None, eval_gradient=False,
                    verbose=False):
        """Leave-one-out cross-validation error of the labeled samples in
        p-norm, using the one-step transition matrix P = D^-1 W; optionally
        with the analytic gradient w.r.t. log-scale hyperparameters."""
        if theta is not None:
            self.weight.theta = theta

        labeled = np.isfinite(y)
        y = y[labeled]
        n = len(y)
        t_metric = time.perf_counter()
        dW = None
        if eval_gradient is True:
            W, dW = self.weight(X[labeled], eval_gradient=True)
        elif isinstance(self.weight, str) and \
                self.weight == 'precomputed':
            W = X[labeled, :][:, labeled]
        else:
            W = self.weight(X[labeled])
        t_metric = time.perf_counter() - t_metric

        t_chain = time.perf_counter()
        W = W + self.smoothing
        D = W.sum(axis=1)
        e = y - (W @ y) / D
        mean_p = np.mean(np.abs(e) ** p)
        loocv_error = mean_p ** (1 / p)
        retval = loocv_error
        if eval_gradient is True:
            # chain: d|e|_p/de_m, then
            # de_m/dW_ab = delta_ma (Wy)_a/D_a^2 - delta_ma y_b/D_a
            de = (
                mean_p ** (1 / p - 1)
                * np.abs(e) ** (p - 1) * np.sign(e) / n
            )
            row_coef = de * (W @ y) / D ** 2
            col_coef = de / D
            grad = (
                np.einsum('m,mnj->j', row_coef, dW)
                - np.einsum('m,n,mnj->j', col_coef, y, dW)
            )
            retval = (loocv_error, grad)
        t_chain = time.perf_counter() - t_chain

        if verbose and eval_gradient is True:
            mprint.table(
                ('LOOCV Err.', '%12.5g', loocv_error),
                ('Gradient', '%12.5g', np.linalg.norm(grad)),
                ('Metric time', '%12.2g', t_metric),
                ('BackProp time', '%14.2g', t_chain),
            )

        return retval

    def loocv_error_1(self, X, y, **kwargs):
        """LOOCV error in L1 norm."""
        return self.loocv_error(X, y, p=1, **kwargs)

    def loocv_error_2(self, X, y, **kwargs):
        """LOOCV error in L2 norm."""
        return self.loocv_error(X, y, p=2, **kwargs)
