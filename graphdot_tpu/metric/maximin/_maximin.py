"""MaxiMin (Hausdorff-like) graph distance (reference:
``graphdot/metric/maximin/_maximin.py:11`` + ``_backend.cu:40-408``).

The reference needs a dedicated 408-line CUDA kernel because its solver
only materializes what each thread block computes; here the TPU solver
already returns full nodal similarity matrices per pair, so the maximin
reduction (kernel-induced distance -> row/col min -> max) and the
hotspot-restricted gradient become a few lines of numpy post-processing.
"""
import numpy as np

from ...graph import Graph
from ...kernel.marginalized import MarginalizedGraphKernel
from ...util import Timer


class MaxiMin(MarginalizedGraphKernel):
    """The maximin graph distance: the greatest of all kernel-induced
    distances from a node in one graph to the closest node in the other
    graph, using the marginalized graph kernel as the nodal similarity.

    Accepts the same arguments as MarginalizedGraphKernel.
    """

    #: nudge applied to 1/d in gradient computations for stability near 0
    #: (the reference's ``num_hacks``, ``_backend.cu:29-36``)
    _grad_eps = 1e-4

    def __init__(self, *args, **kwargs):
        kwargs['dtype'] = np.float32
        super().__init__(*args, **kwargs)

    @staticmethod
    def _induced_distance(k12, k1, k2):
        """d = sqrt(max(0, 1 - k12 / sqrt(k1 k2)))."""
        return np.sqrt(
            np.maximum(0.0, 1.0 - k12 / np.sqrt(k1 * k2))
        )

    def __call__(self, X, Y=None, eval_gradient=False, lmin=0,
                 return_hotspot=False, timing=False):
        """Computes the distance matrix, optionally the hotspot node-pair
        indices and the gradient w.r.t. hyperparameters.

        Returns
        -------
        distance: [len(X), len(Y or X)] matrix
        hotspot: (i1, i2) pair of index matrices (if return_hotspot)
        gradient: [.., .., n_active] tensor (if eval_gradient)
        """
        timer = Timer()
        all_graphs = list(X) + (list(Y) if Y is not None else [])
        pred_or_tuple = Graph.has_unified_types(all_graphs)
        if pred_or_tuple is not True:
            group, first, second = pred_or_tuple
            raise TypeError(
                f'The two graphs have mismatching {group} attributes or '
                'attribute types. Try `Graph.unify_datatype`.\n'
                f'First graph: {first}\nSecond graph: {second}\n'
            )

        symmetric = Y is None
        nX = len(X)
        nY = len(Y) if Y is not None else nX
        sizes = np.array([len(g.nodes) for g in all_graphs])

        timer.tic('nodal self similarities')
        diag = self.diag(
            all_graphs, eval_gradient, nodal=True, lmin=lmin,
            active_theta_only=False
        )
        if eval_gradient:
            diag, ddiag = diag
        starts = np.concatenate([[0], np.cumsum(sizes)])
        timer.toc('nodal self similarities')

        timer.tic('nodal cross similarities')
        if symmetric:
            i_jobs, j_jobs = np.triu_indices(nX)
        else:
            i_jobs, j_jobs = np.indices((nX, nY))
            j_jobs = j_jobs + nX
        i_jobs, j_jobs = i_jobs.ravel(), j_jobs.ravel()
        raw = self._solve_jobs(
            all_graphs, i_jobs, j_jobs, nodal=True, lmin=lmin,
            eval_gradient=eval_gradient
        )
        if eval_gradient:
            raw, raw_grad = raw
        timer.toc('nodal cross similarities')

        timer.tic('maximin reduction')
        distance = np.zeros((nX, nY), dtype=np.float64)
        hotspot = np.full((nX, nY), -1, dtype=np.int64)
        n_dims = self.n_dims
        gradient = (
            np.zeros((nX, nY, n_dims)) if eval_gradient else None
        )

        for p, (gi, gj) in enumerate(zip(i_jobs, j_jobs)):
            ni, nj = sizes[gi], sizes[gj]
            k12 = raw[p][:ni, :nj]
            k1 = diag[starts[gi]:starts[gi] + ni]
            k2 = diag[starts[gj]:starts[gj] + nj]
            D = self._induced_distance(k12, k1[:, None], k2[None, :])
            d12 = D.min(axis=1)
            d21 = D.min(axis=0)
            dh = max(d12.max(), d21.max())
            # largest flat index attaining the maximin distance (mirrors
            # the reference's atomicMax tie-breaking)
            cand = np.argwhere(D == dh)
            if len(cand):
                i1, i2 = cand[np.argmax(cand[:, 0] * nj + cand[:, 1])]
            else:
                i1 = i2 = 0

            col = gj - nX if not symmetric else gj
            distance[gi, col] = dh
            hotspot[gi, col] = i1 * nj + i2
            if symmetric and gi != gj:
                distance[gj, gi] = dh
                hotspot[gj, gi] = i2 * ni + i1

            if eval_gradient:
                dk12 = raw_grad[p][i1, i2, :]
                dk1 = ddiag[starts[gi] + i1]
                dk2 = ddiag[starts[gj] + i2]
                k12h = k12[i1, i2]
                k1h, k2h = k1[i1], k2[i2]
                du = (
                    dk12 / np.sqrt(k1h * k2h)
                    - 0.5 * k12h * (k1h * k2h) ** -1.5
                    * (dk1 * k2h + k1h * dk2)
                )
                grad = -du * (0.5 / (dh + self._grad_eps))
                gradient[gi, col] = grad
                if symmetric and gi != gj:
                    gradient[gj, gi] = grad
        timer.toc('maximin reduction')

        if timing:
            timer.report(unit='ms')
        timer.reset()

        retval = [distance.astype(self.element_dtype)]
        if return_hotspot is True:
            n = np.array(
                [len(g.nodes) for g in (Y if Y is not None else X)]
            )
            retval.append((hotspot // n, hotspot % n))
        if eval_gradient is True:
            retval.append(
                gradient[:, :, self.active_theta_mask].astype(
                    self.element_dtype
                )
            )
        if len(retval) == 1:
            return retval[0]
        return tuple(retval)
