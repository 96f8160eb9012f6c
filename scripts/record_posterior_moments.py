#!/usr/bin/env python
"""Record the NUTS posterior moments of the QM7 north-star tests into
``tests/fixtures/posterior_moments.json`` (VERDICT r3 #7: committed
posterior moments give later rounds a cross-round regression target,
and — when run with a real ``qm7.mat`` in the working directory — pin
the real-data posterior, not just the surrogate's).

Run from the repo root:  python scripts/record_posterior_moments.py
Add ``--slow`` to also record the full-length (slow-tier) variant.
"""
import argparse
import json
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))

FIXTURE = os.path.join(ROOT, 'tests', 'fixtures',
                       'posterior_moments.json')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--slow', action='store_true')
    ap.add_argument('--witness-only', action='store_true',
                    help='record only the fast-tier witness moments')
    args = ap.parse_args()

    # mirror tests/conftest.py exactly: NUTS trajectories are
    # chaotically sensitive, so the recording environment must compile
    # the same programs as the test run
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 8)

    from graphdot_tpu import Graph
    from graphdot_tpu.dataset.qm7_fixture import load_qm7
    import test_qm7_parity as T

    molecules, energies, source = load_qm7(n=32)
    graphs = Graph.unify_datatype([
        Graph.from_ase(m, use_pbc=False) for m in molecules
    ])
    qm7 = (graphs, energies, source)

    # keep these in lockstep with the fast/slow test calls in
    # tests/test_qm7_parity.py — the recorded key encodes only
    # (source, n_mol, warmup, samples), so mismatched priors/moves
    # would regression-check against a different distribution
    variants = [] if args.witness_only else [
        dict(n_mol=5, n_warmup=40, n_samples=40,
             n_particles=48, advi_steps=150, max_depth=4,
             prior_scale=1.0, smc_moves='hmc')]
    if args.slow:
        variants.append(dict(n_mol=8, n_warmup=80, n_samples=80,
                             n_particles=96, advi_steps=300,
                             max_depth=5))

    recorded = {}
    if os.path.exists(FIXTURE):
        with open(FIXTURE) as f:
            recorded = json.load(f)

    # fast-tier witness moments (VERDICT r4 #3): short seeded NUTS +
    # SMC runs; keep kwargs in lockstep with
    # test_qm7_posterior_moments_witness
    import time
    t0 = time.perf_counter()
    wit = T._posterior_witness(qm7)
    print(f'witness run took {time.perf_counter() - t0:.1f} s')
    recorded[wit['key']] = {
        'mean_nuts': wit['mean_nuts'],
        'sd_nuts': wit['sd_nuts'],
        'mean_smc': wit['mean_smc'],
        'source': source,
    }
    print(f'recorded {wit["key"]}: nuts={wit["mean_nuts"]} '
          f'smc={wit["mean_smc"]}')

    for kw in variants:
        out = T._posterior_agreement(qm7, **kw)
        recorded[out['key']] = {
            'mean_nuts': out['mean_nuts'],
            'se': out['se'],
            'source': source,
        }
        print(f'recorded {out["key"]}: mean={out["mean_nuts"]}')

    with open(FIXTURE, 'w') as f:
        json.dump(recorded, f, indent=2)
    print(f'wrote {FIXTURE}')


if __name__ == '__main__':
    main()
