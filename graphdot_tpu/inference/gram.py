"""Differentiable Gram-matrix construction for Bayesian inference.

Builds a pure JAX function ``theta_log_active -> K`` over a fixed set of
graphs, so that GP log-probabilities (and hence NUTS/HMC/SMC/VI over kernel
hyperparameters) can be traced, jitted, sharded, and differentiated
end-to-end. This is the inference-facing counterpart of
``MarginalizedGraphKernel.__call__`` (which returns numpy and targets the
sklearn-style API).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..graph.batch import batch_graphs
from ..kernel.marginalized._solver import mlgk_solve, weight_by_p
from ..kernel.marginalized.starting_probability import Adhoc
from ..util.iterable import flatten


class GramFactory:
    """Produces traced Gram-matrix functions for a MarginalizedGraphKernel
    over a fixed graph set.

    Parameters
    ----------
    kernel: MarginalizedGraphKernel (or Normalization-wrapped)
    graphs: list of Graph
    normalize: bool
        If True, returns the cosine-normalized Gram matrix
        K_ij / sqrt(K_ii K_jj) (the standard choice for GPR on MLGK).
    """

    def __init__(self, kernel, graphs, normalize=True):
        # unwrap a Normalization fix if present
        if hasattr(kernel, 'kernel') and not hasattr(kernel, 'node_kernel'):
            kernel = kernel.kernel
            normalize = True
        self.kernel = kernel
        self.graphs = list(graphs)
        self.normalize = normalize

        batch = batch_graphs(self.graphs)
        mode = kernel.backend.mode
        bd = {
            'node_mask': jnp.asarray(batch.node_mask),
            'degree': jnp.asarray(batch.degree),
            'node_feats': jax.tree_util.tree_map(
                jnp.asarray, batch.node_feats
            ),
        }
        if mode == 'dense':
            bd['adj'] = jnp.asarray(batch.adj)
            bd['edge_feats'] = jax.tree_util.tree_map(
                jnp.asarray, batch.edge_feats
            )
        else:
            for f in ('esrc', 'edst', 'ew'):
                bd[f] = jnp.asarray(getattr(batch, f))
            bd['edge_elist_feats'] = jax.tree_util.tree_map(
                jnp.asarray, batch.edge_elist_feats
            )
        self._batch = bd
        self._mode = mode
        self._n_pad = batch.node_mask.shape[1]

        n = len(self.graphs)
        iu, ju = np.triu_indices(n)
        self._iu = jnp.asarray(iu.astype(np.int32))
        self._ju = jnp.asarray(ju.astype(np.int32))
        self._n = n

        self._onehots = {}
        n_pairs = len(iu)
        m_pad_ = batch.esrc.shape[1]
        onehot_bytes = 4 * n_pairs * m_pad_ * batch.node_mask.shape[1]
        if mode != 'dense' and onehot_bytes < (1 << 29):
            n_pad = batch.node_mask.shape[1]
            oh_src = jax.nn.one_hot(
                jnp.asarray(batch.esrc), n_pad, dtype=jnp.float32
            )
            oh_dst = jax.nn.one_hot(
                jnp.asarray(batch.edst), n_pad, dtype=jnp.float32
            )
            self._onehots = {
                'oh_src_1': oh_src[self._iu],
                'oh_dst_1': oh_dst[self._iu],
                'oh_src_2': oh_src[self._ju],
                'oh_dst_2': oh_dst[self._ju],
            }

        self._p_fixed = None
        if isinstance(kernel.p, Adhoc):
            pf = np.zeros((n, self._n_pad), dtype=np.float32)
            for b, g in enumerate(self.graphs):
                p_values, _ = kernel.p(g.nodes)
                p_values = np.asarray(p_values, dtype=np.float32)
                order = np.argsort(np.asarray(g.nodes['!i']))
                pf[b, :len(g.nodes)] = p_values[order]
            self._p_fixed = jnp.asarray(pf)

        self._n_p = len(list(flatten(kernel.p.theta)))
        self._active = np.asarray(kernel.active_theta_mask)
        self._full0 = np.asarray(kernel.flat_hyperparameters, dtype=float)

    @property
    def n_active(self):
        return int(self._active.sum())

    @property
    def theta0(self):
        """Current log-scale active hyperparameters of the kernel."""
        return np.log(self._full0[self._active])

    def full_theta(self, theta_log_active):
        """Embed the log-scale active theta into the full linear-scale
        hyperparameter vector (fixed entries keep their values)."""
        full = jnp.asarray(self._full0, dtype=jnp.float32)
        return full.at[np.where(self._active)[0]].set(
            jnp.exp(theta_log_active).astype(jnp.float32)
        )

    def gram(self, theta_log_active, lmin=0):
        """The (optionally normalized) Gram matrix as a traced function of
        the log-scale active hyperparameters."""
        theta = self.full_theta(theta_log_active)
        kernel = self.kernel
        batch = self._batch
        idx1, idx2 = self._iu, self._ju

        def g(tree, idx):
            return jax.tree_util.tree_map(lambda a: a[idx], tree)

        ops = {
            'node_feats_1': g(batch['node_feats'], idx1),
            'node_feats_2': g(batch['node_feats'], idx2),
            'node_mask_1': batch['node_mask'][idx1],
            'node_mask_2': batch['node_mask'][idx2],
            'degree_1': batch['degree'][idx1],
            'degree_2': batch['degree'][idx2],
            'ftol': jnp.float32(kernel.ftol),
        }
        if self._mode == 'dense':
            ops['adj_1'] = batch['adj'][idx1]
            ops['adj_2'] = batch['adj'][idx2]
            ops['edge_feats_1'] = g(batch['edge_feats'], idx1)
            ops['edge_feats_2'] = g(batch['edge_feats'], idx2)
        else:
            for f in ('esrc', 'edst', 'ew'):
                ops[f + '_1'] = batch[f][idx1]
                ops[f + '_2'] = batch[f][idx2]
            ops['edge_elist_feats_1'] = g(
                batch['edge_elist_feats'], idx1
            )
            ops['edge_elist_feats_2'] = g(
                batch['edge_elist_feats'], idx2
            )
            # theta-independent incidence one-hots, built once per
            # factory (saves ~1/3 of the per-call setup cost)
            for key, arr in self._onehots.items():
                ops[key] = arr

        maxiter = min(self._n_pad * self._n_pad, 10000)
        x, Vx, valid = mlgk_solve(
            theta, ops, knode=kernel.node_kernel,
            kedge=kernel.edge_kernel, n_p_theta=self._n_p, lmin=lmin,
            mode=self._mode, maxiter=maxiter
        )
        pf1 = self._p_fixed[idx1] if self._p_fixed is not None else None
        pf2 = self._p_fixed[idx2] if self._p_fixed is not None else None
        p1 = kernel.p.apply(theta[:self._n_p], ops['node_mask_1'], pf1)
        p2 = kernel.p.apply(theta[:self._n_p], ops['node_mask_2'], pf2)
        r = jnp.sum(weight_by_p(x, p1, p2), axis=(1, 2))

        K = jnp.zeros((self._n, self._n), dtype=r.dtype)
        K = K.at[idx1, idx2].set(r)
        K = K.at[idx2, idx1].set(r)
        if self.normalize:
            d = jnp.sqrt(jnp.diagonal(K))
            K = K / d[:, None] / d[None, :]
        return K
