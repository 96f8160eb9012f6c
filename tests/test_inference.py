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


def test_gp_logprob_convergence_diagnostics(gp_problem):
    """The bounded-effort CG cap must be observable: with generous
    maxiter the relative residual sits at the f32 convergence floor,
    while a starved 1-iteration budget reports a far larger value."""
    kernel, graphs, y = gp_problem
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-3, maxiter=256)
    ratio = lp.convergence_diagnostics(lp.theta0)
    assert ratio.shape == (1,) and ratio[0] < 1e-4
    starved = GPRLogProb(kernel, graphs, y, alpha=1e-3, maxiter=1)
    assert starved.convergence_diagnostics(lp.theta0)[0] > 100 * ratio[0]


def test_gram_factory_maxiter_validation(gp_problem):
    from graphdot_tpu.inference.gram import GramFactory
    kernel, graphs, _ = gp_problem
    with pytest.raises(ValueError):
        GramFactory(kernel, graphs, maxiter=0)


def test_gp_nuts_short_chain(gp_problem):
    kernel, graphs, y = gp_problem
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-2)
    out = sample(
        lp, jax.random.PRNGKey(0), n_chains=2, n_warmup=40,
        n_samples=16, init=jnp.asarray(lp.theta0, dtype=jnp.float32),
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


def test_nuts_flat_matches_nested():
    """The flat single-loop NUTS (production) and the nested-loop
    reference use the same RNG fold scheme and tree rules, so given the
    same key they must produce the same transition."""
    from graphdot_tpu.inference.nuts import (
        nuts_step, _nuts_step_nested
    )
    from graphdot_tpu.inference.hmc import hmc_init

    logp, mu, cov = _gauss_target(3, seed=4)
    state = hmc_init(logp, jnp.asarray(mu) + 0.5)
    inv_mass = jnp.asarray([1.0, 0.5, 2.0], dtype=jnp.float32)

    flat = jax.jit(lambda k, s: nuts_step(
        k, s, logp, 0.4, inv_mass, max_depth=6))
    nested = jax.jit(lambda k, s: _nuts_step_nested(
        k, s, logp, 0.4, inv_mass, max_depth=6))

    s_f, s_n = state, state
    for i in range(25):
        key = jax.random.PRNGKey(100 + i)
        s_f, info_f = flat(key, s_f)
        s_n, info_n = nested(key, s_n)
        assert np.allclose(s_f.q, s_n.q, rtol=1e-5, atol=1e-6), i
        assert int(info_f['n_leapfrog']) == int(info_n['n_leapfrog']), i
        assert int(info_f['depth']) == int(info_n['depth']), i
        assert bool(info_f['divergent']) == bool(info_n['divergent'])
        assert np.allclose(info_f['accept_prob'], info_n['accept_prob'],
                           rtol=1e-4, atol=1e-6), i


def test_sharded_cg_solve_matches_cholesky():
    """Row-sharded distributed CG (psum dots + per-iteration all-gather)
    agrees with a replicated Cholesky solve of (K + alpha I) x = y."""
    from graphdot_tpu.parallel import make_mesh, sharded_gp_solve

    rng = np.random.default_rng(0)
    n = 64
    A = rng.normal(size=(n, n)).astype(np.float32) * 0.1
    K = A @ A.T + np.eye(n, dtype=np.float32)
    y = rng.normal(size=n).astype(np.float32)
    alpha = 0.01

    mesh = make_mesh({'pairs': 8})
    x = np.asarray(sharded_gp_solve(mesh, jnp.asarray(K),
                                    jnp.asarray(y), alpha, tol=1e-7))
    x_ref = np.linalg.solve(K + alpha * np.eye(n), y)
    assert np.allclose(x, x_ref, rtol=1e-4, atol=1e-5)


def test_sharded_gram_full_mesh(gp_problem):
    """A standalone sharded Gram build on a 2-axis mesh shards jobs over
    the PRODUCT of the axes (no duplicated work along 'chains') and
    matches the unsharded result; precomputed one-hots ride along as
    sharded operands."""
    from graphdot_tpu.inference import GramFactory
    from graphdot_tpu.parallel import make_mesh, sharded_gram_fn

    kernel, graphs, y = gp_problem
    factory = GramFactory(kernel, graphs, normalize=True)
    mesh = make_mesh({'pairs': 4, 'chains': 2})
    gram = sharded_gram_fn(factory, mesh)           # axis=None: all axes
    t0 = jnp.asarray(factory.theta0, dtype=jnp.float32)
    K_sharded = np.asarray(gram(t0))
    K_ref = np.asarray(jax.jit(factory.gram)(t0))
    assert np.allclose(K_sharded, K_ref, rtol=1e-5, atol=1e-6)


def test_gp_nuts_protein_scale_smoke():
    """The north-star combination end-to-end: NUTS over a GPR posterior
    whose Gram build runs on protein-scale contact-map graphs (product
    spaces >> molecule scale). A short chain only — this guards the
    trace/gradient path, not mixing."""
    from graphdot_tpu.kernel import MarginalizedGraphKernel
    from graphdot_tpu.microkernel import (
        KroneckerDelta, SquareExponential, TensorProduct
    )
    from graphdot_tpu.testing import random_protein_set

    graphs = random_protein_set(2, 3, (24, 34))
    rng = np.random.default_rng(0)
    y = np.array([0.1 * len(g.nodes) + rng.normal() for g in graphs])
    kernel = MarginalizedGraphKernel(
        TensorProduct(element=KroneckerDelta(0.2)),
        TensorProduct(length=SquareExponential(3.0)), q=0.05)
    lp = GPRLogProb(kernel, graphs, y, alpha=1e-2, normalize_y=True)
    out = sample(lp, jax.random.PRNGKey(0), n_chains=2, n_warmup=3,
                 n_samples=2, init=jnp.asarray(lp.theta0, jnp.float32),
                 max_depth=2, init_jitter=0.02)
    s = np.asarray(out['samples'])
    assert s.shape == (2, 2, lp.n_dims)
    assert np.all(np.isfinite(s))
    assert np.all(np.isfinite(np.asarray(out['logp'])))
