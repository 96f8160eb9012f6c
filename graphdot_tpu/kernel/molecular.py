"""Preset molecular kernel (reference: ``graphdot/kernel/molecular.py:12``)."""
import copy

from .marginalized import MarginalizedGraphKernel
from ..microkernel import KroneckerDelta, SquareExponential, TensorProduct


class Tang2019MolecularKernel:
    """A marginalized graph kernel for 3D molecular structures as in:
    Tang, Y. H., & de Jong, W. A. (2019). Prediction of atomization energy
    using graph kernel and active learning. J. Chem. Phys. 150(4), 044107.
    Use together with ``Graph.from_ase()``.

    Parameters
    ----------
    stopping_probability: float in (0, 1)
        Random-walk stopping probability per step.
    starting_probability: float
        Random-walk starting probability on any node.
    element_prior: float in (0, 1)
        Baseline similarity between distinct elements.
    edge_length_scale: float in (0, inf)
        Length scale of the Gaussian kernel on edge length.
    """

    def __init__(self, stopping_probability=0.01, starting_probability=1.0,
                 element_prior=0.2, edge_length_scale=0.05, **kwargs):
        self.stopping_probability = stopping_probability
        self.starting_probability = starting_probability
        self.element_prior = element_prior
        self.edge_length_scale = edge_length_scale
        self._makekernel(**kwargs)

    def _makekernel(self, **kwargs):
        self.kernel = MarginalizedGraphKernel(
            TensorProduct(element=KroneckerDelta(self.element_prior)),
            TensorProduct(
                length=SquareExponential(self.edge_length_scale)
            ),
            q=self.stopping_probability,
            p=self.starting_probability,
            **kwargs
        )

    def __call__(self, X, Y=None, **kwargs):
        return self.kernel(X, Y, **kwargs)

    def diag(self, X, **kwargs):
        return self.kernel.diag(X, **kwargs)

    @property
    def hyperparameters(self):
        return self.kernel.hyperparameters

    @property
    def theta(self):
        return self.kernel.theta

    @theta.setter
    def theta(self, value):
        self.kernel.theta = value

    @property
    def hyperparameter_bounds(self):
        return self.kernel.hyperparameter_bounds

    @property
    def bounds(self):
        return self.kernel.bounds

    def clone_with_theta(self, theta):
        clone = copy.deepcopy(self)
        clone.theta = theta
        return clone
