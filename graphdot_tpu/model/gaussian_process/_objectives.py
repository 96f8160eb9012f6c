"""Jitted GP training objectives: pure functions of the Gram matrix.

The reference derives LML / LOOCV hyperparameter gradients with
hand-written einsum chains (``graphdot/model/gaussian_process/gpr.py:
222-415``, ``nystrom.py:301-412``). Here every objective is a scalar JAX
function of the Gram matrix (or, for Nystrom, of the cross/core
matrices); its matrix gradient comes from one ``jax.value_and_grad``
call, and the hyperparameter gradient is a single on-device contraction
of that matrix gradient with the kernel jacobian ``dK``. Indefinite Gram
matrices fall back from Cholesky to a positive-clamped
eigendecomposition, mirroring the reference's CholSolver -> pinvh
ladder.
"""
import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ...linalg._exec import run


# ---------------------------------------------------------------------
# inverses
# ---------------------------------------------------------------------

def _by_cholesky(K, rcond):
    del rcond
    L = jnp.linalg.cholesky(K)
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    K_inv = jax.scipy.linalg.cho_solve((L, True), eye)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return K_inv, logdet


def _by_clamped_eigh(K, rcond):
    w, Q = jnp.linalg.eigh(K)
    floor = w[-1] * rcond
    w = jnp.where(w > floor, w, floor)
    K_inv = (Q / w) @ Q.T
    return K_inv, jnp.sum(jnp.log(w))


_INVERSES = {'cholesky': _by_cholesky, 'eigh': _by_clamped_eigh}


# ---------------------------------------------------------------------
# scalar objectives
# ---------------------------------------------------------------------

def _nll(K, y, rcond, *, method):
    """y^T K^-1 y + log|K| (negative log marginal likelihood, up to a
    constant)."""
    K_inv, logdet = _INVERSES[method](K, rcond)
    return y @ (K_inv @ y) + logdet


def _loocv(K, y, rcond, *, method):
    """Half squared norm of the leave-one-out residuals
    e_i = (K^-1 y)_i / (K^-1)_ii."""
    K_inv, _ = _INVERSES[method](K, rcond)
    e = (K_inv @ y) / jnp.diagonal(K_inv)
    return 0.5 * jnp.sum(e ** 2)


def _nystrom_nll(Kxc, Kcc, y, rcond, *, method):
    """Low-rank LML: K ~= F F^T with F = Kxc Kcc^-1/2; the log-det and
    inverse act on the retained spectrum (the pseudo-determinant)."""
    del method
    w, Q = jnp.linalg.eigh(Kcc)
    w = jnp.maximum(w, w[-1] * rcond)
    F = Kxc @ (Q * jax.lax.rsqrt(w))
    U, s, _ = jnp.linalg.svd(F, full_matrices=False)
    s = jnp.maximum(s, s[0] * rcond)
    z = (U.T @ y) / s
    return jnp.dot(z, z) + 2.0 * jnp.sum(jnp.log(s))


_JITTED = {}


def _prepared(fn, method, with_grad):
    """Jitted (value, grads) or value-only form of an objective."""
    key = (fn.__name__, method, with_grad)
    if key not in _JITTED:
        bound = functools.partial(fn, method=method)
        if with_grad:
            n_mats = 2 if fn is _nystrom_nll else 1
            bound = jax.value_and_grad(bound, argnums=tuple(range(n_mats)))
        _JITTED[key] = jax.jit(bound)
    return _JITTED[key]


def _evaluate(fn, mats, y, rcond, with_grad):
    """Run an objective with Cholesky -> clamped-eigh fallback."""
    y = np.asarray(y, dtype=float)
    rcond = np.asarray(rcond, dtype=float)
    for method in ('cholesky', 'eigh'):
        out = run(_prepared(fn, method, with_grad), *mats, y, rcond)
        value = out[0] if with_grad else out
        if np.isfinite(value):
            if method == 'eigh':
                warnings.warn(
                    'Gram matrix not positive definite; continuing with '
                    'a positive-clamped pseudoinverse.')
            return out
        if fn is _nystrom_nll:
            break  # already eigh-based; nothing to fall back to
    raise np.linalg.LinAlgError(
        'The Gram matrix could not be inverted — it is likely corrupted '
        'by NaNs or Infs.')


def negative_log_marginal(K, y, rcond, with_grad=False):
    """NLL (and its gradient w.r.t. K) with PD fallback."""
    return _evaluate(_nll, (K,), y, rcond, with_grad)


def loocv_error(K, y, rcond, with_grad=False):
    """Half squared LOOCV residual norm (and its K-gradient)."""
    return _evaluate(_loocv, (K,), y, rcond, with_grad)


def nystrom_negative_log_marginal(Kxc, Kcc, y, rcond, with_grad=False):
    """Low-rank NLL and, when requested, gradients w.r.t. (Kxc, Kcc)."""
    return _evaluate(_nystrom_nll, (Kxc, Kcc), y, rcond, with_grad)


# ---------------------------------------------------------------------
# host-facing helpers
# ---------------------------------------------------------------------

@jax.jit
def _contract(gK, dK, scale):
    return jnp.einsum('ij,ijk->k', gK, dK) * scale


def chain_to_theta(gK, dK, theta_log):
    """Fold a Gram-matrix gradient through the kernel jacobian onto the
    log-scale hyperparameters: one device einsum."""
    return run(_contract, gK, dK, np.exp(theta_log))


def inverse(K, rcond):
    """(K^-1, log|K|) with Cholesky -> clamped-eigh fallback, plus the
    method that succeeded."""
    for method in ('cholesky', 'eigh'):
        K_inv, logdet = run(
            functools.partial(_inverse_jit, method=method),
            K, np.asarray(rcond, dtype=float))
        if np.isfinite(logdet) and np.isfinite(K_inv).all():
            return K_inv, float(logdet), method
    raise np.linalg.LinAlgError(
        'The Gram matrix could not be inverted — it is likely corrupted '
        'by NaNs or Infs.')


@functools.partial(jax.jit, static_argnames='method')
def _inverse_jit(K, rcond, method):
    return _INVERSES[method](K, rcond)
