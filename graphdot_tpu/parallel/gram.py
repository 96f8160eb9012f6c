"""Sharded Gram-matrix construction over a device mesh.

The reference schedules independent graph-pair jobs across thread blocks
with a global atomic counter (``template.cu:57-63``); on TPU the job list
becomes a static partition of the upper-triangular pair index set over the
'pairs' mesh axis, solved locally by the batched CG and reassembled with an
all-gather (implicit in the shard_map output spec).

Size-bucketed factories (``GramFactory(buckets='auto')``, the default for
heterogeneous graph sets) are supported directly: each size-class pair
group keeps its own padded shapes and its job list is sharded over the
mesh axis independently, so every device works on every size class — the
static-partition analogue of the reference's dynamic load balancing.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def sharded_gram_fn(factory, mesh, axis='pairs', lmin=0):
    """Build a jitted ``theta_log_active -> K`` over the mesh, with pair
    jobs sharded along ``axis``.

    Parameters
    ----------
    factory: :class:`graphdot_tpu.inference.gram.GramFactory`
    mesh: jax.sharding.Mesh with the given axis.
    """
    n = factory._n
    n_dev = mesh.shape[axis]

    if factory._groups is not None:
        raw_groups = [
            dict(
                batch1=grp['batch1'], batch2=grp['batch2'],
                pfix1=grp['pfix1'], pfix2=grp['pfix2'],
                gi=np.asarray(grp['gi']), gj=np.asarray(grp['gj']),
                idx1=np.asarray(grp['idx1']),
                idx2=np.asarray(grp['idx2']),
                maxiter=min(grp['ca'] * grp['cb'], 10000),
            )
            for grp in factory._groups
        ]
    else:
        iu, ju = np.triu_indices(n)
        raw_groups = [dict(
            batch1=factory._batch, batch2=factory._batch,
            pfix1=factory._p_fixed, pfix2=factory._p_fixed,
            gi=iu, gj=ju, idx1=iu, idx2=ju,
            maxiter=min(factory._n_pad * factory._n_pad, 10000),
        )]

    groups = []
    for grp in raw_groups:
        n_jobs = len(grp['idx1'])
        pad = (-n_jobs) % n_dev

        def _pad(a):
            return jnp.asarray(
                np.concatenate([a, np.zeros(pad, dtype=a.dtype)])
                .astype(np.int32)
            )

        solver = shard_map(
            partial(
                factory._group_ops_solve, grp['batch1'], grp['batch2'],
                grp['pfix1'], grp['pfix2'], lmin, grp['maxiter']
            ),
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        groups.append(dict(
            solver=solver, n_jobs=n_jobs,
            idx1=_pad(grp['idx1']), idx2=_pad(grp['idx2']),
            gi=jnp.asarray(grp['gi'].astype(np.int32)),
            gj=jnp.asarray(grp['gj'].astype(np.int32)),
        ))

    @jax.jit
    def gram(theta_log_active):
        theta = factory.full_theta(theta_log_active)
        K = jnp.zeros((n, n), dtype=jnp.float32)
        for grp in groups:
            r = grp['solver'](theta, grp['idx1'], grp['idx2'])
            r = r[:grp['n_jobs']]
            K = K.at[grp['gi'], grp['gj']].set(r)
            K = K.at[grp['gj'], grp['gi']].set(r)
        if factory.normalize:
            d = jnp.sqrt(jnp.diagonal(K))
            K = K / d[:, None] / d[None, :]
        return K

    return gram
