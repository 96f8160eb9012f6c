"""Inference-layer tests: NUTS/HMC/SMC/VI correctness on analytic targets
and the GP log-posterior over graphs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from graphdot_tpu.inference import (
    GPRLogProb, advi, ess, sample, smc_sample, split_rhat
)


def _gauss_target(D=3, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(D, D)) * 0.5
    cov = A @ A.T + np.eye(D)
    prec = jnp.asarray(np.linalg.inv(cov), dtype=jnp.float32)
    mu = jnp.asarray(rng.normal(size=D), dtype=jnp.float32)

    def logp(t):
        d = t - mu
        return -0.5 * d @ prec @ d

    return logp, np.asarray(mu), cov


def test_nuts_gaussian_moments():
    D = 3
    logp, mu, cov = _gauss_target(D)
    out = sample(
        logp, jax.random.PRNGKey(0), n_chains=4, n_warmup=300,
        n_samples=400, init=jnp.zeros(D)
    )
    s = np.asarray(out['samples']).reshape(-1, D)
    assert np.abs(s.mean(0) - mu).max() < 0.1
    assert np.abs(np.cov(s.T) - cov).max() / np.abs(cov).max() < 0.15
    assert np.all(split_rhat(out['samples']) < 1.05)
    assert np.all(ess(out['samples']) > 100)
    assert np.asarray(out['divergent']).mean() < 0.01


def test_hmc_gaussian_moments():
    D = 3
    logp, mu, cov = _gauss_target(D, seed=1)
    out = sample(
        logp, jax.random.PRNGKey(1), n_chains=4, n_warmup=300,
        n_samples=400, init=jnp.zeros(D), algorithm='hmc', n_leapfrog=16
    )
    s = np.asarray(out['samples']).reshape(-1, D)
    assert np.abs(s.mean(0) - mu).max() < 0.15
    assert np.all(split_rhat(out['samples']) < 1.1)


def test_smc_gaussian():
    D = 2
    logp, mu, cov = _gauss_target(D, seed=2)

    def log_prior(t):
        return -0.5 * jnp.sum((t / 5.0) ** 2)

    def log_like(t):
        return logp(t) - log_prior(t)

    init = 5.0 * jax.random.normal(jax.random.PRNGKey(3), (1024, D))
    out = smc_sample(
        log_prior, log_like, jax.random.PRNGKey(4), init=init,
        n_moves=10, step_size=0.5
    )
    s = np.asarray(out['samples'])
    assert np.abs(s.mean(0) - mu).max() < 0.3
    assert out['beta_history'][-1] == 1.0


@pytest.mark.parametrize('moves', ['hmc', 'nuts'])
def test_smc_gradient_moves(moves):
    """Gradient-based SMC mutation kernels recover the target moments
    with far fewer particles/moves than random walk."""
    D = 4
    logp, mu, cov = _gauss_target(D, seed=7)

    def log_prior(t):
        return -0.5 * jnp.sum((t / 5.0) ** 2)

    def log_like(t):
        return logp(t) - log_prior(t)

    init = 5.0 * jax.random.normal(jax.random.PRNGKey(8), (256, D))
    out = smc_sample(
        log_prior, log_like, jax.random.PRNGKey(9), init=init,
        n_moves=3, step_size=0.3, moves=moves
    )
    s = np.asarray(out['samples'])
    assert np.abs(s.mean(0) - mu).max() < 0.35
    assert out['beta_history'][-1] == 1.0


def test_advi_gaussian():
    D = 3
    logp, mu, cov = _gauss_target(D, seed=3)
    out = advi(logp, jax.random.PRNGKey(5), init=jnp.zeros(D),
               n_steps=1500, learning_rate=2e-2)
    assert np.abs(np.asarray(out['mu']) - mu).max() < 0.15
    # marginal stds bounded by true stds for mean-field
    assert np.all(np.asarray(out['sigma']) <= np.sqrt(np.diag(cov)) + 0.1)


@pytest.fixture(scope='module')
def gp_problem():
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_molecule_set

    graphs = random_molecule_set(0, 8, n_atoms_range=(5, 9))
    rng = np.random.default_rng(1)
    y = rng.normal(size=len(graphs))
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(0.3)),
        q=0.05,
    )
    return kernel, graphs, y


def test_gp_logprob_grad_matches_fd(gp_problem):
    kernel, graphs, y = gp_problem
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-3)
    t0 = jnp.asarray(lp.theta0, dtype=jnp.float32)
    val, grad = jax.value_and_grad(lp)(t0)
    assert np.isfinite(float(val))
    eps = 1e-3
    for i in range(len(t0)):
        tp = t0.at[i].add(eps)
        tm = t0.at[i].add(-eps)
        fd = (float(lp(tp)) - float(lp(tm))) / (2 * eps)
        assert float(grad[i]) == pytest.approx(fd, rel=0.05, abs=0.02), i


def test_gp_logprob_gram_matches_kernel(gp_problem):
    kernel, graphs, y = gp_problem
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-3)
    K = np.asarray(lp.factory.gram(jnp.asarray(lp.theta0)))
    from graphdot_tpu.kernel.fix import Normalization
    K_ref = Normalization(kernel)(graphs)
    assert np.allclose(K, K_ref, rtol=1e-4, atol=1e-5)


def test_gp_nuts_short_chain(gp_problem):
    kernel, graphs, y = gp_problem
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-2)
    out = sample(
        lp, jax.random.PRNGKey(0), n_chains=2, n_warmup=40,
        n_samples=30, init=jnp.asarray(lp.theta0, dtype=jnp.float32),
        max_depth=5, init_jitter=0.1
    )
    s = np.asarray(out['samples'])
    assert np.all(np.isfinite(s))
    assert np.asarray(out['divergent']).mean() < 0.5


@pytest.mark.parametrize('buckets', [False, 'auto'])
def test_sharded_gram_matches(gp_problem, buckets):
    kernel, graphs, y = gp_problem
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.parallel import make_mesh, sharded_gram_fn
    factory = GramFactory(kernel, graphs, buckets=buckets)
    mesh = make_mesh({'pairs': -1})
    t0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    K1 = np.asarray(factory.gram(t0))
    with mesh:
        K2 = np.asarray(sharded_gram_fn(factory, mesh)(t0))
    assert np.allclose(K1, K2, rtol=1e-5, atol=1e-6)


def test_checkpoint_resume(tmp_path):
    from graphdot_tpu.inference import (
        load_chains, resume_state, save_chains
    )
    logp, mu, cov = _gauss_target(2, seed=9)
    out = sample(
        logp, jax.random.PRNGKey(9), n_chains=2, n_warmup=100,
        n_samples=50, init=jnp.zeros(2)
    )
    path = str(tmp_path / 'chains.npz')
    save_chains(path, out, extra={'round': 1})
    loaded = load_chains(path)
    assert np.allclose(loaded['samples'], np.asarray(out['samples']))
    assert loaded['extra']['round'] == 1

    init, step_size, inv_mass = resume_state(loaded)
    out2 = sample(
        logp, jax.random.PRNGKey(10), n_chains=2, n_samples=50,
        init=jnp.asarray(init), step_size=step_size, inv_mass=inv_mass
    )
    s = np.asarray(out2['samples'])
    assert np.all(np.isfinite(s))
    # resumed chains continue sampling the same target
    assert np.abs(s.reshape(-1, 2).mean(0) - mu).max() < 0.5
