"""Driver contract: entry() must jit-compile single-chip and
dryrun_multichip must execute a full sharded training step on the mesh."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    desc, emb = jax.jit(fn)(*args)
    assert desc.shape == (8, 800) and emb.shape == (8, 800)
    import numpy as np
    assert np.isfinite(np.asarray(emb)).all()
    # descriptors are normalized histograms
    np.testing.assert_allclose(np.asarray(desc).sum(axis=1), 1.0, atol=1e-4)


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
