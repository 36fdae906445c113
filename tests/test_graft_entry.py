"""Driver entry points: single-chip jittability + multichip dryrun."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    sig, counts = out
    assert np.asarray(sig).shape == (256, 250)
    assert np.asarray(counts).shape == (256,)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    # conftest already provides 8 virtual CPU devices
    g.dryrun_multichip(8)
