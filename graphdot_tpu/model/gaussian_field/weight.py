"""Weight functions for Gaussian field models (reference:
``graphdot/model/gaussian_field/weight.py:8,57,128``)."""
from abc import ABC, abstractmethod
import copy

import numpy as np


class Weight(ABC):

    @abstractmethod
    def __call__(self, X, Y=None, eval_gradient=False):
        """Computes the weight matrix between datasets X and Y (or X with
        itself when Y is None), optionally with gradients w.r.t. the
        **log-scale** hyperparameters stacked along the last axis.

        Note: the reference implementation mixes linear- and log-scale
        gradients between ``RBFOverDistance`` and the GFR losses (masked in
        its tests by theta == log 1 == 0); here the contract is uniformly
        log-scale."""

    @property
    @abstractmethod
    def theta(self):
        """Log-scale hyperparameters as an ndarray."""

    @theta.setter
    @abstractmethod
    def theta(self, values):
        pass

    @property
    @abstractmethod
    def bounds(self):
        """Log-scale hyperparameter bounds as a 2D array."""

    def clone_with_theta(self, theta):
        clone = copy.deepcopy(self)
        clone.theta = theta
        return clone


class RBFOverDistance(Weight):
    """Weights from an RBF applied to a distance matrix.

    Parameters
    ----------
    metric: callable
        Distance metric object (e.g. MaxiMin).
    sigma: float
        RBF length scale.
    sigma_bounds: tuple
        Optimization bounds of sigma.
    mopts: dict
        Extra options for metric invocations.
    """

    def __init__(self, metric, sigma, sigma_bounds=(1e-3, 1e3), mopts={}):
        self.sigma = sigma
        self.sigma_bounds = sigma_bounds
        self.metric = metric
        self.mopts = mopts

    def __call__(self, X, Y=None, eval_gradient=False):
        """If eval_gradient, the returned gradient is w.r.t. the
        **log-scale** hyperparameters."""
        Z = (X,) if Y is None else (X, Y)

        if eval_gradient is True:
            D, dD = self.metric(*Z, eval_gradient=True, **self.mopts)
        else:
            D = self.metric(*Z, **self.mopts)

        W = np.exp(-0.5 * D ** 2 * self.sigma ** -2)
        if Y is None:
            W[np.diag_indices_from(W)] = 0
        if eval_gradient:
            # log-scale: d W / d log(sigma) = sigma * d W / d sigma
            dsigma = D ** 2 * W * self.sigma ** -2
            # metric gradients dD are linear-scale; chain to log scale
            dtheta = (-D * W * self.sigma ** -2)[:, :, None] * dD \
                * np.exp(self.metric.theta)[None, None, :]
            dW = np.concatenate(
                [dsigma[:, :, None], dtheta], axis=2
            )
            return W, dW
        else:
            return W

    @property
    def theta(self):
        return np.concatenate((np.log([self.sigma]), self.metric.theta))

    @theta.setter
    def theta(self, values):
        self.sigma = np.exp(values[0])
        self.metric.theta = values[1:]

    @property
    def bounds(self):
        return np.vstack((
            np.log([self.sigma_bounds]),
            self.metric.bounds
        ))


class RBFOverFixedDistance(Weight):
    """Weights from an optimizable RBF over a fixed, precomputed distance
    matrix indexed by sample indices."""

    def __init__(self, D, sigma, sigma_bounds=(1e-3, 1e3),
                 sticky_cache=False):
        self.sigma = sigma
        self.sigma_bounds = sigma_bounds
        self.D = D

    def __call__(self, X, Y=None, eval_gradient=False):
        d = self.D[X, :][:, X if Y is None else Y]
        w = np.exp(-0.5 * d ** 2 * self.sigma ** -2)
        if Y is None:
            w[np.diag_indices_from(w)] = 0
        if eval_gradient:
            # log-scale gradient w.r.t. log(sigma)
            j = d ** 2 * w * self.sigma ** -2
            return w, np.stack([j], axis=2)
        else:
            return w

    @property
    def theta(self):
        return np.log([self.sigma])

    @theta.setter
    def theta(self, values):
        self.sigma = np.exp(values)[0]

    @property
    def bounds(self):
        return np.log([self.sigma_bounds])
