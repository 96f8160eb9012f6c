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

    opt = optax.chain(
        optax.clip_by_global_norm(100.0),
        optax.adam(learning_rate),
    )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: -elbo(p, key)
        )(params)
        # reject non-finite steps: an MC draw landing in a region where
        # the log density (or its gradient) overflows must not poison
        # the variational parameters — keep the previous state and move
        # on to the next minibatch of draws
        ok = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves(grads):
            ok = ok & jnp.all(jnp.isfinite(leaf))
        new_updates, new_opt_state = opt.update(grads, opt_state)
        new_params = optax.apply_updates(params, new_updates)
        keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a, b: jnp.where(ok, a, b), new, old)
        return (keep(new_params, params),
                keep(new_opt_state, opt_state), -loss)

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
