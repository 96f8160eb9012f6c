"""Analytic FLOP model and MFU accounting for the MLGK solver benches.

The reference's IPDPS'20 artifact is a throughput paper; its CUDA kernel
(``graphdot/cpp/marginalized_kernel.h:61-490``) was evaluated in
FLOP-accounted terms. This module provides the TPU analogue: an analytic
cost model of the edge-factored PCG matvec, combined with measured
per-pair CG iteration counts (``GramFactory.iteration_stats``) to report

- ``useful``  — algorithmic FLOPs at the true (unpadded, unpacked) graph
  dimensions, one MXU pass per contraction: the work a perfect machine
  would do.
- ``executed`` — FLOPs the fused Pallas kernel actually pushes through
  the MXU: padded class dims, block-diagonal pair packing, the 2-pass
  split-operand precision scheme, convergence-unroll rounding, and
  whole-block iteration (every pair in a Pallas program's block of
  ``block_pairs`` super-pairs rides until the slowest one converges).

``useful / dt / peak`` is the MFU figure; ``executed / dt / peak`` bounds
how much of the gap is padding/packing overhead vs non-MXU time (loop
control, VPU elementwise, DMA).
"""
import numpy as np

# Dense bf16 MXU peak per chip (FLOP/s). Every contraction pass in the
# solver is a bf16 MXU pass (the split-operand scheme issues 2 of them
# per f32-accurate contraction), so the bf16 peak is the right roofline.
PEAK_FLOPS = {
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,     # v5e
    'TPU v5': 459e12,          # v5p
    'TPU v5p': 459e12,
    'TPU v6 lite': 918e12,     # v6e / Trillium
}


def device_peak_flops(device=None):
    """bf16 MXU peak of ``device`` (default: jax.devices()[0]), or None
    if the device kind is not in the table."""
    if device is None:
        import jax
        device = jax.devices()[0]
    return PEAK_FLOPS.get(getattr(device, 'device_kind', None))


def matvec_flops(m1, m2, n1, n2):
    """FLOPs of one edge-factored product-graph matvec at the given
    dims: the four contractions G = D1 Y, H = G D2^T, U = S1^T (T o H),
    out = U S2 (2 FLOPs per MAC)."""
    return 2 * (m1 * n1 * n2 + m1 * m2 * n2 + n1 * m1 * m2
                + n1 * m2 * n2)


def graph_dims(graph):
    """(n_nodes, n_directed_edges) of a Graph — the true dims of its
    side of a pair solve."""
    n = len(graph.nodes)
    i = np.asarray(graph.edges['!i'])
    j = np.asarray(graph.edges['!j'])
    m = int(2 * np.sum(i != j) + np.sum(i == j))
    return n, int(m)


def save_iteration_stats(path, stats):
    """Persist ``GramFactory.iteration_stats`` output to an .npz cache
    (committed fixture: iteration counts are deterministic for a fixed
    workload/theta/ftol, and recomputing them costs several fresh XLA
    compiles that benchmark runs should not pay)."""
    payload = {'n_groups': np.int64(len(stats))}
    for i, grp in enumerate(stats):
        for key in ('iters', 'gi', 'gj'):
            payload[f'g{i}_{key}'] = np.asarray(grp[key])
        payload[f'g{i}_dims'] = np.asarray(
            [grp['ca'], grp['cb'], grp['m1'], grp['m2'],
             grp['n_jobs'], grp.get('k1', 1), grp.get('k2', 1)])
    np.savez_compressed(path, **payload)


def load_iteration_stats(path):
    blob = np.load(path)
    stats = []
    for i in range(int(blob['n_groups'])):
        d = blob[f'g{i}_dims']
        ca, cb, m1, m2, n_jobs = d[:5]
        k1, k2 = (d[5], d[6]) if len(d) > 5 else (1, 1)
        stats.append({
            'ca': int(ca), 'cb': int(cb), 'm1': int(m1),
            'm2': int(m2), 'n_jobs': int(n_jobs),
            'k1': int(k1), 'k2': int(k2),
            'iters': blob[f'g{i}_iters'],
            'gi': blob[f'g{i}_gi'], 'gj': blob[f'g{i}_gj'],
        })
    return stats


def gram_flop_report(factory, theta, include_executed=True,
                     stats=None):
    """FLOP totals for one Gram build of ``factory`` at ``theta``.

    Returns a dict with ``useful_flops``, ``executed_flops`` (None when
    the executed model does not apply, e.g. dense mode), and the
    iteration stats used. Pass precomputed ``stats`` (e.g. from
    :func:`load_iteration_stats`) to skip the instrumented solves.
    """
    if stats is None:
        stats = factory.iteration_stats(theta)
    if getattr(factory, '_two', False):
        raise NotImplementedError(
            'gram_flop_report supports symmetric factories only')
    dims = [graph_dims(g) for g in factory.graphs]

    def _2d(a):
        a = np.asarray(a)
        return a[:, None] if a.ndim == 1 else a

    # per-member-pair iteration counts ((i, j) keyed, both orders).
    # When ``stats`` came from a union-packed factory, every member
    # pair of a super-pair is charged the (shared) super-pair count —
    # a slight useful-FLOP overcount; record the cache with a
    # union=False factory for exact per-pair counts.
    pair_iters = {}
    useful = 0.0
    for grp in stats:
        gi2, gj2 = _2d(grp['gi']), _2d(grp['gj'])
        for s, it in enumerate(np.asarray(grp['iters'])):
            for a in gi2[s]:
                if a < 0:
                    continue
                for b in gj2[s]:
                    if b < 0:
                        continue
                    n1, m1 = dims[a]
                    n2, m2 = dims[b]
                    useful += float(it) * matvec_flops(m1, m2, n1, n2)
                    pair_iters[(int(a), int(b))] = int(it)
                    pair_iters[(int(b), int(a))] = int(it)

    executed = None
    if include_executed and factory._mode == 'pallas' \
            and factory._groups is not None:
        from ..ops import pallas_pcg as PP
        executed = 0.0
        for grp in factory._groups:
            # operand dims as the pallas solver sees them (union dims
            # for k > 1 groups)
            M1 = grp['batch1']['esrc'].shape[1]
            M2 = grp['batch2']['esrc'].shape[1]
            k1, k2 = grp.get('k1', 1), grp.get('k2', 1)
            N1, N2 = k1 * grp['ca'], k2 * grp['cb']
            gi2, gj2 = _2d(grp['gi']), _2d(grp['gj'])
            S = gi2.shape[0]
            # per-(super-)job iterations: slowest member pair
            job_iters = np.zeros(S, dtype=np.int64)
            for s in range(S):
                worst = 1
                for a in gi2[s]:
                    if a < 0:
                        continue
                    for b in gj2[s]:
                        if b < 0:
                            continue
                        worst = max(worst,
                                    pair_iters.get((int(a), int(b)), 1))
                job_iters[s] = worst
            # shared resolution incl. env overrides, so the model
            # matches what the solver actually ran (ADVICE r4)
            k, B, unroll = PP.resolve_pack_params(S, M1, M2, N1, N2)
            per_iter = matvec_flops(k * M1, k * M2, k * N1, k * N2) \
                * B * 2                       # 2-pass split-operand
            # jobs -> packed blocks of k -> programs of B; the whole
            # block iterates until its slowest member converges,
            # rounded up to the convergence-check unroll.
            S_pad = -(-S // (k * B)) * (k * B)
            iters = np.pad(job_iters, (0, S_pad - S))
            per_prog = iters.reshape(-1, k * B).max(axis=1)
            per_prog = -(-per_prog // unroll) * unroll
            executed += float(per_prog.sum()) * per_iter

    return {
        'useful_flops': useful,
        'executed_flops': executed,
        'stats': stats,
    }
