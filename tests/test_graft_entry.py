"""The driver's integration points must always work: entry() compiles
single-device; dryrun_multichip runs DP+TP on the virtual mesh."""
import sys

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally (DP + TP legs)


@pytest.mark.slow
def test_entry_compiles_cpu():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(out, np.float32)).all()
