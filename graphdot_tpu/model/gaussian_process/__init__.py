"""Gaussian process regression models over graph kernels.

Three variants cover the reference model family: exact GPR
(:class:`GaussianProcessRegressor`), the Nystrom low-rank approximation
for large datasets (:class:`LowRankApproximateGPR`), and maximum-
likelihood per-sample noise estimation for outlier detection
(:class:`GPROutlierDetector`). All of them accept any kernel following
the sklearn-style graph-kernel protocol, most notably
``Normalization(MarginalizedGraphKernel(...))``.

For full Bayesian posteriors over the kernel hyperparameters (instead of
the point estimates fitted here), see :mod:`graphdot_tpu.inference`.
"""
from .gpr import GaussianProcessRegressor
from .nystrom import LowRankApproximateGPR
from .outlier_detector import GPROutlierDetector

__all__ = [
    'GaussianProcessRegressor',
    'LowRankApproximateGPR',
    'GPROutlierDetector',
]
