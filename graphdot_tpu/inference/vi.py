"""Automatic-differentiation variational inference (mean-field Gaussian).

Fits q(t) = N(mu, diag(exp(log_sigma)^2)) to a log density by maximizing
the reparameterized ELBO with Adam (optax).
"""
import jax
import jax.numpy as jnp
import optax


def advi(logp_fn, rng, init, n_steps=1000, n_mc=8, learning_rate=1e-2):
    """Mean-field ADVI.

    Parameters
    ----------
    logp_fn: callable [D] -> scalar log density.
    init: [D] initial mean.

    Returns
    -------
    dict with 'mu', 'sigma', 'elbo_history', and a 'sample' callable.
    """
    init = jnp.asarray(init, dtype=jnp.float32)
    D = init.shape[0]
    params = {
        'mu': init,
        'log_sigma': jnp.full((D,), -2.0),
    }

    def elbo(params, key):
        eps = jax.random.normal(key, (n_mc, D))
        sigma = jnp.exp(params['log_sigma'])
        ts = params['mu'][None, :] + eps * sigma[None, :]
        logps = jax.vmap(logp_fn)(ts)
        entropy = jnp.sum(params['log_sigma']) + 0.5 * D * (
            1.0 + jnp.log(2.0 * jnp.pi)
        )
        return jnp.mean(logps) + entropy

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: -elbo(p, key)
        )(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, -loss

    history = []
    for i in range(n_steps):
        params, opt_state, e = step(
            params, opt_state, jax.random.fold_in(rng, i)
        )
        history.append(float(e))

    sigma = jnp.exp(params['log_sigma'])

    def sample(key, n):
        eps = jax.random.normal(key, (n, D))
        return params['mu'][None, :] + eps * sigma[None, :]

    return {
        'mu': params['mu'],
        'sigma': sigma,
        'elbo_history': jnp.asarray(history),
        'sample': sample,
    }
