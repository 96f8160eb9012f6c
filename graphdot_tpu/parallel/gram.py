"""Sharded Gram-matrix construction over a device mesh.

The reference schedules independent graph-pair jobs across thread blocks
with a global atomic counter (``template.cu:57-63``); on TPU the job list
becomes a static partition of the upper-triangular pair index set over the
'pairs' mesh axis, solved locally by the batched CG and reassembled with an
all-gather (implicit in the shard_map output spec).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..kernel.marginalized._solver import mlgk_solve, weight_by_p


def sharded_gram_fn(factory, mesh, axis='pairs', lmin=0):
    """Build a jitted ``theta_log_active -> K`` over the mesh, with pair
    jobs sharded along ``axis``.

    Parameters
    ----------
    factory: :class:`graphdot_tpu.inference.gram.GramFactory`
    mesh: jax.sharding.Mesh with the given axis.
    """
    kernel = factory.kernel
    n = factory._n
    n_dev = mesh.shape[axis]

    iu, ju = np.triu_indices(n)
    n_jobs = len(iu)
    pad = (-n_jobs) % n_dev
    iu = np.concatenate([iu, np.zeros(pad, dtype=iu.dtype)])
    ju = np.concatenate([ju, np.zeros(pad, dtype=ju.dtype)])
    iu_j = jnp.asarray(iu.astype(np.int32))
    ju_j = jnp.asarray(ju.astype(np.int32))

    batch = factory._batch
    mode = factory._mode
    n_pad = factory._n_pad
    n_p = factory._n_p
    p_fixed = factory._p_fixed
    maxiter = min(n_pad * n_pad, 10000)

    def solve_local(theta, idx1, idx2):
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
        if mode == 'dense':
            ops['adj_1'] = batch['adj'][idx1]
            ops['adj_2'] = batch['adj'][idx2]
            ops['edge_feats_1'] = g(batch['edge_feats'], idx1)
            ops['edge_feats_2'] = g(batch['edge_feats'], idx2)
        else:
            for f in ('esrc', 'edst', 'ew'):
                ops[f + '_1'] = batch[f][idx1]
                ops[f + '_2'] = batch[f][idx2]
            ops['edge_elist_feats_1'] = g(batch['edge_elist_feats'], idx1)
            ops['edge_elist_feats_2'] = g(batch['edge_elist_feats'], idx2)

        x, Vx, valid = mlgk_solve(
            theta, ops, knode=kernel.node_kernel,
            kedge=kernel.edge_kernel, n_p_theta=n_p, lmin=lmin,
            mode=mode, maxiter=maxiter
        )
        pf1 = p_fixed[idx1] if p_fixed is not None else None
        pf2 = p_fixed[idx2] if p_fixed is not None else None
        p1 = kernel.p.apply(theta[:n_p], ops['node_mask_1'], pf1)
        p2 = kernel.p.apply(theta[:n_p], ops['node_mask_2'], pf2)
        return jnp.sum(weight_by_p(x, p1, p2), axis=(1, 2))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve_sharded(theta, idx1, idx2):
        return solve_local(theta, idx1, idx2)

    @jax.jit
    def gram(theta_log_active):
        theta = factory.full_theta(theta_log_active)
        r = solve_sharded(theta, iu_j, ju_j)
        r = r[:n_jobs]
        K = jnp.zeros((n, n), dtype=r.dtype)
        K = K.at[iu_j[:n_jobs], ju_j[:n_jobs]].set(r)
        K = K.at[ju_j[:n_jobs], iu_j[:n_jobs]].set(r)
        if factory.normalize:
            d = jnp.sqrt(jnp.diagonal(K))
            K = K / d[:, None] / d[None, :]
        return K

    return gram
