"""Checkpoint/resume for long-running MCMC (aux subsystem; the reference
only pickles trained GPR models, ``gaussian_process/base.py:150-189`` —
nothing exists there for long-running jobs, SURVEY.md §5)."""
import os

import numpy as np


def save_chains(path, out, extra=None):
    """Persist a sampler result dict (as returned by
    :func:`graphdot_tpu.inference.sample`) plus optional metadata."""
    payload = {
        'samples': np.asarray(out['samples']),
        'logp': np.asarray(out['logp']),
        'accept_prob': np.asarray(out['accept_prob']),
        'divergent': np.asarray(out['divergent']),
        'step_size': np.asarray(out['step_size']),
        'inv_mass': np.asarray(out['inv_mass']),
    }
    if extra:
        for k, v in extra.items():
            payload['extra_' + k] = np.asarray(v)
    tmp = path + '.tmp'
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + '.npz' if os.path.exists(tmp + '.npz') else tmp,
               path)


def load_chains(path):
    """Load a checkpoint written by :func:`save_chains`; returns the
    result dict (and metadata under 'extra')."""
    data = np.load(path, allow_pickle=False)
    out = {k: data[k] for k in
           ('samples', 'logp', 'accept_prob', 'divergent',
            'step_size', 'inv_mass') if k in data}
    out['extra'] = {
        k[len('extra_'):]: data[k] for k in data.files
        if k.startswith('extra_')
    }
    return out


def resume_state(out):
    """The continuation inputs for :func:`sample` from a previous result:
    (init positions [n_chains, D], step_size, inv_mass)."""
    samples = np.asarray(out['samples'])
    return (
        samples[:, -1, :],
        float(np.asarray(out['step_size'])),
        np.asarray(out['inv_mass']),
    )
