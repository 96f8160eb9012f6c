"""Step-size and mass-matrix adaptation for HMC/NUTS.

Nesterov dual averaging (Hoffman & Gelman 2014, Sec 3.2) plus Welford
streaming estimation of a diagonal mass matrix. Pure-jnp state records so
that adaptation runs inside jitted warmup loops and can be sharded across
chains.
"""
from typing import NamedTuple

import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray
    log_step_avg: jnp.ndarray
    grad_avg: jnp.ndarray
    t: jnp.ndarray
    mu: jnp.ndarray


def da_init(step_size):
    log_step = jnp.log(step_size)
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=jnp.zeros_like(log_step),
        grad_avg=jnp.zeros_like(log_step),
        t=jnp.zeros_like(log_step),
        mu=jnp.log(10.0) + log_step,
    )


def da_update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0,
              kappa=0.75):
    t = state.t + 1.0
    g = target - accept_prob
    grad_avg = (1.0 - 1.0 / (t + t0)) * state.grad_avg + g / (t + t0)
    log_step = state.mu - grad_avg * jnp.sqrt(t) / gamma
    eta = t ** -kappa
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step_avg,
        grad_avg=grad_avg,
        t=t,
        mu=state.mu,
    )


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(n_dims, dtype=jnp.float32):
    return WelfordState(
        mean=jnp.zeros(n_dims, dtype),
        m2=jnp.zeros(n_dims, dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(state, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean=mean, m2=m2, count=count)


def welford_variance(state, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan-style shrinkage toward unit scale
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var
