"""Hamiltonian Monte Carlo transition kernel (pure jnp, vmappable over
chains). Part of the Bayesian inference layer that replaces the reference's
L-BFGS point estimation with full posteriors over kernel hyperparameters.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp


class HMCState(NamedTuple):
    q: jnp.ndarray         # position
    logp: jnp.ndarray      # log density at q
    grad: jnp.ndarray      # gradient at q


def hmc_init(logp_fn, q0):
    logp, grad = jax.value_and_grad(logp_fn)(q0)
    return HMCState(q=q0, logp=logp, grad=grad)


def leapfrog(logp_and_grad, q, p, grad, step_size, inv_mass, n_steps):
    """Standard velocity-Verlet integrator; returns final (q, p, logp,
    grad)."""

    def body(_, carry):
        q, p, logp, grad = carry
        p = p + 0.5 * step_size * grad
        q = q + step_size * inv_mass * p
        logp, grad = logp_and_grad(q)
        p = p + 0.5 * step_size * grad
        return (q, p, logp, grad)

    logp0, _ = logp_and_grad(q)
    return jax.lax.fori_loop(
        0, n_steps, body, (q, p, logp0, grad)
    )


def hmc_step(rng, state, logp_fn, step_size, inv_mass, n_steps):
    """One HMC transition with Metropolis correction.

    Returns (new_state, info dict with accept_prob / divergent).
    """
    logp_and_grad = jax.value_and_grad(logp_fn)
    k_mom, k_acc = jax.random.split(rng)
    p0 = jax.random.normal(k_mom, state.q.shape) / jnp.sqrt(inv_mass)

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p)

    h0 = -state.logp + kinetic(p0)
    q, p, logp, grad = leapfrog(
        logp_and_grad, state.q, p0, state.grad, step_size, inv_mass,
        n_steps
    )
    h1 = -logp + kinetic(p)
    delta = h0 - h1
    delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    divergent = (h1 - h0) > 1000.0

    accept = jax.random.uniform(k_acc) < accept_prob
    new_state = HMCState(
        q=jnp.where(accept, q, state.q),
        logp=jnp.where(accept, logp, state.logp),
        grad=jnp.where(accept, grad, state.grad),
    )
    info = {
        'accept_prob': accept_prob,
        'divergent': divergent,
        'energy': h1,
    }
    return new_state, info
