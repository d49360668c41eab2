"""The driver contract (__graft_entry__.py) must always be runnable: entry()
compiles and runs the flagship probe; dryrun_multichip runs the production
encoder over the 8-device virtual mesh. Round 2 shipped with this file
broken — this test makes that impossible to repeat silently."""
import numpy as np


def test_entry_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    mis, pos = (np.asarray(o) for o in out)
    assert mis.shape == pos.shape == (1024,)
    assert (mis != 255).mean() > 0.9  # example data is pg-derived: must match


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
