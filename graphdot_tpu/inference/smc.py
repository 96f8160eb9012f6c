"""Sequential Monte Carlo sampler over tempered posteriors.

Particles are a leading vmap axis (shardable across a mesh; the resampling
all-gather of weights is the collective call site, SURVEY.md §2.9.3).
Adaptive tempering chooses each temperature increment so the effective
sample size stays at a target fraction, with systematic resampling and
random-walk/HMC mutation moves.
"""

import jax
import jax.numpy as jnp

from .hmc import hmc_init, hmc_step
from .nuts import nuts_step


def _systematic_resample(rng, log_w, n):
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(rng) + jnp.arange(n)) / n
    return jnp.searchsorted(cum, u, side='right').clip(0, n - 1)


def _ess(log_w):
    w = jax.nn.softmax(log_w)
    return 1.0 / jnp.sum(w * w)


def _next_beta(log_like, beta, target_frac, n):
    """Find the largest beta' in (beta, 1] whose incremental weights keep
    ESS >= target_frac * n, by bisection."""

    def ess_at(b):
        lw = (b - beta) * log_like
        lw = lw - jnp.max(lw)
        return _ess(lw)

    target = target_frac * n

    def cond(c):
        lo, hi, it = c
        return (it < 50) & (hi - lo > 1e-6)

    def body(c):
        lo, hi, it = c
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target
        return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid), it + 1)

    full = ess_at(1.0) >= target
    lo, hi, _ = jax.lax.while_loop(
        cond, body, (jnp.float32(beta), jnp.float32(1.0), 0))
    return jnp.where(full, 1.0, lo)


# beta/target_frac/n are traced arguments, so every tempering stage
# shares one compiled bisection program
_next_beta = jax.jit(_next_beta)


def smc_sample(log_prior, log_like, rng, n_particles=256, init=None,
               n_moves=3, step_size=0.2, target_frac=0.5,
               max_stages=50, moves='rw', use_hmc=False, n_leapfrog=8,
               max_depth=6, mesh=None, particle_axis='chains'):
    """SMC sampling of p(t) ∝ exp(log_prior(t) + log_like(t)).

    Parameters
    ----------
    log_prior, log_like: callables [D] -> scalar.
    init: [n_particles, D] initial draws from the prior.
    moves: 'rw' | 'hmc' | 'nuts' — the mutation kernel at each
        tempering stage. Random-walk MH is cheapest per move; gradient
        moves ('hmc', and especially the self-tuning 'nuts') mix far
        better for high-dimensional hyperparameter posteriors.
    use_hmc: deprecated alias for ``moves='hmc'``.
    max_depth: NUTS tree-depth bound for ``moves='nuts'``.
    mesh: optional jax.sharding.Mesh — particles are sharded along
        ``particle_axis``; the resampling weight softmax/cumsum is the
        all-gather collective call site (SURVEY.md §2.9.3).

    Returns
    -------
    dict with 'samples' [n_particles, D], 'log_evidence', 'n_stages',
    'beta_history' (padded with 1.0).
    """
    if use_hmc:
        moves = 'hmc'
    if moves not in ('rw', 'hmc', 'nuts'):
        raise ValueError(f"unknown mutation kernel {moves!r}")
    init = jnp.asarray(init, dtype=jnp.float32)
    n, D = init.shape
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        init = jax.device_put(
            init, NamedSharding(mesh, PartitionSpec(particle_axis, None))
        )

    v_log_like = jax.jit(jax.vmap(log_like))
    v_log_prior = jax.vmap(log_prior)

    # ``beta`` and ``eps`` are traced arguments (NOT closed-over Python
    # floats) and the whole mutation sweep is one jitted program: every
    # tempering stage reuses a single compile instead of re-dispatching
    # an eager vmap per stage — the dominant cost of an SMC run on
    # expensive log-likes (e.g. GPR posteriors) before round 5
    @jax.jit
    def mutate(rng, particles, beta, eps):
        """A few MCMC moves targeting prior * like^beta."""

        def logp(t):
            return log_prior(t) + beta * log_like(t)

        if moves in ('hmc', 'nuts'):
            states = jax.vmap(lambda q: hmc_init(logp, q))(particles)
            if moves == 'hmc':
                def kern(k, s):
                    return hmc_step(k, s, logp, eps, jnp.ones(D),
                                    n_leapfrog)
            else:
                def kern(k, s):
                    return nuts_step(k, s, logp, eps, jnp.ones(D),
                                     max_depth=max_depth)

            def one(states, key):
                keys = jax.random.split(key, n)
                states, infos = jax.vmap(kern)(keys, states)
                return states, jnp.mean(infos['accept_prob'])

            states, acc = jax.lax.scan(
                one, states, jax.random.split(rng, n_moves)
            )
            return states.q, jnp.mean(acc)
        else:
            lp = jax.vmap(logp)(particles)

            def one(carry, key):
                particles, lp = carry
                k1, k2 = jax.random.split(key)
                prop = particles + eps * jax.random.normal(
                    k1, particles.shape
                )
                lp_prop = jax.vmap(logp)(prop)
                accept = jnp.log(
                    jax.random.uniform(k2, (n,))
                ) < lp_prop - lp
                particles = jnp.where(accept[:, None], prop, particles)
                lp = jnp.where(accept, lp_prop, lp)
                return (particles, lp), jnp.mean(accept)

            (particles, _), acc = jax.lax.scan(
                one, (particles, lp), jax.random.split(rng, n_moves)
            )
            return particles, jnp.mean(acc)

    particles = init
    beta = 0.0
    log_evidence = 0.0
    betas = []
    stage = 0
    eps = step_size
    while beta < 1.0 and stage < max_stages:
        ll = v_log_like(particles)
        new_beta = float(_next_beta(ll, beta, target_frac, n))
        lw = (new_beta - beta) * ll
        log_evidence += float(
            jax.scipy.special.logsumexp(lw) - jnp.log(n)
        )
        k_res, k_mut, rng = jax.random.split(
            jax.random.fold_in(rng, stage), 3
        )
        idx = _systematic_resample(k_res, lw, n)
        particles = particles[idx]
        particles, acc = mutate(k_mut, particles, new_beta, eps)
        # crude step-size control: toward ~30% acceptance for RW,
        # toward the ~80% canonical target for gradient moves
        acc = float(acc)
        if moves == 'rw':
            eps = eps * (1.3 if acc > 0.4 else (0.7 if acc < 0.2 else 1.0))
        else:
            eps = eps * (1.2 if acc > 0.9 else (0.7 if acc < 0.6 else 1.0))
        betas.append(new_beta)
        beta = new_beta
        stage += 1

    return {
        'samples': particles,
        'log_evidence': log_evidence,
        'n_stages': stage,
        'beta_history': betas,
    }
