"""Differentiable Gram-matrix construction for Bayesian inference.

Builds a pure JAX function ``theta_log_active -> K`` over a fixed set of
graphs, so that GP log-probabilities (and hence NUTS/HMC/SMC/VI over kernel
hyperparameters) can be traced, jitted, sharded, and differentiated
end-to-end. This is the inference-facing counterpart of
``MarginalizedGraphKernel.__call__`` (which returns numpy and targets the
sklearn-style API).

Size bucketing (``buckets='auto'``, the default): graphs are partitioned
into padded-size classes and each class-pair group is solved at its own
static shapes inside the same traced function, so small graph pairs are
not padded to the global maximum — the static analogue of the reference's
per-pair dynamic CUDA blocks (``graphdot/kernel/marginalized/template.cu``
job loop). Each group gets its own convergence loop, so quickly-converging
small pairs stop iterating early instead of riding along with the largest
pair in the batch.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..graph.batch import batch_graphs, _round_up
from ..kernel.marginalized._solver import mlgk_solve, weight_by_p
from ..kernel.marginalized.starting_probability import Adhoc
from ..util.iterable import flatten

# total device bytes allowed for precomputed incidence one-hots
_ONEHOT_BUDGET = 1 << 29


def _np_one_hot(indices, depth):
    """Host-side one-hot (f32). The incidence one-hots are static data;
    see the note at their use sites."""
    idx = np.asarray(indices)
    return (idx[..., None] == np.arange(depth)).astype(np.float32)


def _as_jnp_tree(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


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
    buckets: 'auto' | bool
        Solve size-bucketed pair groups at their own padded shapes.
        'auto' enables bucketing whenever the graph set spans more than
        one padded-size class.
    node_align: int
        Padded node counts are rounded up to multiples of this.
    maxiter: int or None
        Cap on CG iterations per solve. The default (None) bounds each
        solve by its product-space dimension, like the reference solver.
        Inference loops (NUTS/HMC leapfrogs) should set a finite cap:
        within the posterior's typical set Jacobi-PCG converges in ~7-16
        iterations, while extreme-tail hyperparameters (q -> 0, kernel
        -> 1) make the system so ill-conditioned that CG burns the full
        n1*n2 iterations computing a log-density that is astronomically
        low anyway — a capped solve is 5-10x cheaper there and the
        sampler rejects/diverges on such points regardless.
    """

    def __init__(self, kernel, graphs, normalize=True, buckets='auto',
                 node_align=8, maxiter=None):
        if maxiter is None:
            self._maxiter_cap = 10000
        elif int(maxiter) >= 1:
            self._maxiter_cap = int(maxiter)
        else:
            raise ValueError(f'maxiter must be >= 1, got {maxiter!r}.')
        # unwrap a Normalization fix if present
        if hasattr(kernel, 'kernel') and not hasattr(kernel, 'node_kernel'):
            kernel = kernel.kernel
            normalize = True
        self.kernel = kernel
        self.graphs = list(graphs)
        self.normalize = normalize

        mode = kernel.backend.mode
        self._mode = mode
        n = len(self.graphs)
        self._n = n
        iu, ju = np.triu_indices(n)
        self._iu = jnp.asarray(iu.astype(np.int32))
        self._ju = jnp.asarray(ju.astype(np.int32))

        self._n_p = len(list(flatten(kernel.p.theta)))
        self._active = np.asarray(kernel.active_theta_mask)
        self._full0 = np.asarray(kernel.flat_hyperparameters, dtype=float)

        # ---- global batch (used by the sharded path and as the
        # single-group fallback) ----
        batch = batch_graphs(self.graphs, node_align=node_align)
        self._n_pad = batch.node_mask.shape[1]
        self._batch = self._batch_dict(batch)

        self._p_fixed = None
        if isinstance(kernel.p, Adhoc):
            self._p_fixed = jnp.asarray(
                self._adhoc_p_rows(range(n), self._n_pad))

        # ---- size classes ----
        sizes = [len(g.nodes) for g in self.graphs]
        classes = {}
        for gi, s in enumerate(sizes):
            classes.setdefault(_round_up(s, node_align), []).append(gi)
        if buckets == 'auto':
            buckets = len(classes) > 1
        self._bucketed = bool(buckets) and len(classes) > 1

        if self._bucketed:
            self._build_groups(classes, node_align, iu, ju)
        else:
            self._groups = None
            self._onehots = {}
            n_pairs = len(iu)
            if mode != 'dense':
                m_pad = batch.esrc.shape[1]
                if 4 * 4 * n_pairs * m_pad * self._n_pad < _ONEHOT_BUDGET:
                    # numpy, not eager jnp: the one-hots are static, and
                    # building them op-by-op through a remote-device
                    # tunnel costs ~0.4 s per dispatched op
                    oh_src = _np_one_hot(batch.esrc, self._n_pad)
                    oh_dst = _np_one_hot(batch.edst, self._n_pad)
                    iu_h = np.asarray(self._iu)
                    ju_h = np.asarray(self._ju)
                    self._onehots = {
                        'oh_src_1': jnp.asarray(oh_src[iu_h]),
                        'oh_dst_1': jnp.asarray(oh_dst[iu_h]),
                        'oh_src_2': jnp.asarray(oh_src[ju_h]),
                        'oh_dst_2': jnp.asarray(oh_dst[ju_h]),
                    }

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    def _batch_dict(self, batch):
        bd = {
            'node_mask': jnp.asarray(batch.node_mask),
            'degree': jnp.asarray(batch.degree),
            'node_feats': _as_jnp_tree(batch.node_feats),
        }
        if self._mode == 'dense':
            bd['adj'] = jnp.asarray(batch.adj)
            bd['edge_feats'] = _as_jnp_tree(batch.edge_feats)
        else:
            for f in ('esrc', 'edst', 'ew'):
                bd[f] = jnp.asarray(getattr(batch, f))
            bd['edge_elist_feats'] = _as_jnp_tree(batch.edge_elist_feats)
        return bd

    def _adhoc_p_rows(self, indices, n_pad):
        """Evaluate an Adhoc starting probability on the given graphs,
        in node order, padded to ``n_pad``."""
        pf = np.zeros((len(list(indices)), n_pad), dtype=np.float32)
        for r, gi in enumerate(indices):
            g = self.graphs[gi]
            p_values, _ = self.kernel.p(g.nodes)
            p_values = np.asarray(p_values, dtype=np.float32)
            order = np.argsort(np.asarray(g.nodes['!i']))
            pf[r, :len(g.nodes)] = p_values[order]
        return pf

    def _build_groups(self, classes, node_align, iu, ju):
        """Per-size-class batches plus class-pair job groups."""
        n = self._n
        class_of = np.empty(n, dtype=np.int64)
        local_of = np.empty(n, dtype=np.int64)
        cbatches = {}
        cpfix = {}
        for ck, members in classes.items():
            for li, gi in enumerate(members):
                class_of[gi] = ck
                local_of[gi] = li
            cbatches[ck] = self._batch_dict(batch_graphs(
                [self.graphs[gi] for gi in members],
                n_pad=ck, node_align=node_align))
            if isinstance(self.kernel.p, Adhoc):
                cpfix[ck] = jnp.asarray(self._adhoc_p_rows(members, ck))
            else:
                cpfix[ck] = None

        jobs = {}
        for p, (gi, gj) in enumerate(zip(iu, ju)):
            ca, cb = class_of[gi], class_of[gj]
            a, b = (gj, gi) if ca > cb else (gi, gj)
            key = (min(ca, cb), max(ca, cb))
            jobs.setdefault(key, []).append(
                (gi, gj, local_of[a], local_of[b]))

        # one-hot byte budget is split pro-rata by group demand
        demands = {}
        if self._mode != 'dense':
            for (ca, cb), entries in jobs.items():
                ma = cbatches[ca]['esrc'].shape[1]
                mb = cbatches[cb]['esrc'].shape[1]
                demands[(ca, cb)] = \
                    4 * 2 * len(entries) * (ma * ca + mb * cb)
        within_budget = sum(demands.values()) < _ONEHOT_BUDGET

        self._groups = []
        for key in sorted(jobs):
            ca, cb = key
            gi, gj, la, lb = map(
                np.asarray, zip(*jobs[key]))
            grp = {
                'ca': ca, 'cb': cb,
                'batch1': cbatches[ca], 'batch2': cbatches[cb],
                'pfix1': cpfix[ca], 'pfix2': cpfix[cb],
                'gi': jnp.asarray(gi.astype(np.int32)),
                'gj': jnp.asarray(gj.astype(np.int32)),
                'idx1': jnp.asarray(la.astype(np.int32)),
                'idx2': jnp.asarray(lb.astype(np.int32)),
                'onehots': {},
            }
            if self._mode != 'dense' and within_budget:
                for side, (bd, ck, loc) in enumerate(
                        [(cbatches[ca], ca, la), (cbatches[cb], cb, lb)]):
                    for nm in ('src', 'dst'):
                        # numpy: static data, and eager jnp ops cost
                        # ~0.4 s each through a remote-device tunnel
                        oh = _np_one_hot(
                            np.asarray(bd['e' + nm])[loc], ck)
                        grp['onehots'][f'oh_{nm}_{side + 1}'] = \
                            jnp.asarray(oh)
            self._groups.append(grp)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

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

    def _group_ops(self, batch1, batch2, idx1, idx2, onehots):
        """Assemble the solver operand dict for one job group, gathering
        per-side features from (possibly distinct) class batches."""
        def g(tree, idx):
            return jax.tree_util.tree_map(lambda a: a[idx], tree)

        ops = {
            'node_feats_1': g(batch1['node_feats'], idx1),
            'node_feats_2': g(batch2['node_feats'], idx2),
            'node_mask_1': batch1['node_mask'][idx1],
            'node_mask_2': batch2['node_mask'][idx2],
            'degree_1': batch1['degree'][idx1],
            'degree_2': batch2['degree'][idx2],
            'ftol': jnp.float32(self.kernel.ftol),
        }
        if self._mode == 'dense':
            ops['adj_1'] = batch1['adj'][idx1]
            ops['adj_2'] = batch2['adj'][idx2]
            ops['edge_feats_1'] = g(batch1['edge_feats'], idx1)
            ops['edge_feats_2'] = g(batch2['edge_feats'], idx2)
        else:
            for f in ('esrc', 'edst', 'ew'):
                ops[f + '_1'] = batch1[f][idx1]
                ops[f + '_2'] = batch2[f][idx2]
            ops['edge_elist_feats_1'] = g(
                batch1['edge_elist_feats'], idx1)
            ops['edge_elist_feats_2'] = g(
                batch2['edge_elist_feats'], idx2)
            # theta-independent incidence one-hots, built once per
            # factory (saves ~1/3 of the per-call setup cost)
            ops.update(onehots)
        return ops

    def _group_r(self, theta, ops, pfix1, pfix2, idx1, idx2, lmin,
                 maxiter, with_residual=False):
        """Solve one job group and reduce to per-pair kernel values."""
        kernel = self.kernel
        out = mlgk_solve(
            theta, ops, knode=kernel.node_kernel,
            kedge=kernel.edge_kernel, n_p_theta=self._n_p, lmin=lmin,
            mode=self._mode, maxiter=maxiter,
            return_resnorm=with_residual
        )
        x, Vx, valid = out[:3]
        pf1 = pfix1[idx1] if pfix1 is not None else None
        pf2 = pfix2[idx2] if pfix2 is not None else None
        p1 = kernel.p.apply(theta[:self._n_p], ops['node_mask_1'], pf1)
        p2 = kernel.p.apply(theta[:self._n_p], ops['node_mask_2'], pf2)
        r = jnp.sum(weight_by_p(x, p1, p2), axis=(1, 2))
        return (r, jnp.max(out[3])) if with_residual else r

    def _group_ops_solve(self, batch1, batch2, pfix1, pfix2, lmin,
                         maxiter, theta, idx1, idx2, *onehots):
        """Solve one job group given raw local index arrays. Used by the
        sharded path (``parallel.gram.sharded_gram_fn``), where ``idx1``/
        ``idx2`` are the local shard of the job list. When the factory
        precomputed per-job incidence one-hots, their local shards are
        passed positionally (src1, dst1, src2, dst2); otherwise they are
        rebuilt in-trace from the index shard."""
        oh = {}
        if onehots:
            oh = dict(zip(
                ('oh_src_1', 'oh_dst_1', 'oh_src_2', 'oh_dst_2'),
                onehots
            ))
        ops = self._group_ops(batch1, batch2, idx1, idx2, oh)
        return self._group_r(
            theta, ops, pfix1, pfix2, idx1, idx2, lmin, maxiter)

    def gram(self, theta_log_active, lmin=0, with_residual=False):
        """The (optionally normalized) Gram matrix as a traced function
        of the log-scale active hyperparameters. With ``with_residual``,
        also returns the worst final-residual / tolerance ratio across
        all pair solves (> 1 signals that the ``maxiter`` cap preempted
        CG convergence at this theta)."""
        theta = self.full_theta(theta_log_active)
        K = jnp.zeros((self._n, self._n), dtype=jnp.float32)
        worst = jnp.float32(0.0)

        if self._groups is None:
            ops = self._group_ops(
                self._batch, self._batch, self._iu, self._ju,
                self._onehots)
            maxiter = min(self._n_pad * self._n_pad, self._maxiter_cap)
            r = self._group_r(
                theta, ops, self._p_fixed, self._p_fixed,
                self._iu, self._ju, lmin, maxiter,
                with_residual=with_residual)
            if with_residual:
                r, worst = r
            K = K.at[self._iu, self._ju].set(r)
            K = K.at[self._ju, self._iu].set(r)
        else:
            for grp in self._groups:
                ops = self._group_ops(
                    grp['batch1'], grp['batch2'],
                    grp['idx1'], grp['idx2'], grp['onehots'])
                maxiter = min(grp['ca'] * grp['cb'], self._maxiter_cap)
                r = self._group_r(
                    theta, ops, grp['pfix1'], grp['pfix2'],
                    grp['idx1'], grp['idx2'], lmin, maxiter,
                    with_residual=with_residual)
                if with_residual:
                    r, ratio = r
                    worst = jnp.maximum(worst, ratio)
                K = K.at[grp['gi'], grp['gj']].set(r)
                K = K.at[grp['gj'], grp['gi']].set(r)

        if self.normalize:
            d = jnp.sqrt(jnp.diagonal(K))
            K = K / d[:, None] / d[None, :]
        return (K, worst) if with_residual else K
