"""Regression guard for the driver entry points (__graft_entry__)."""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out_np = np.asarray(out)
    assert out_np.shape[1] == 12
    assert np.isfinite(out_np).all()
    assert ((out_np >= 0) & (out_np <= 1)).all()  # sigmoid output


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on any failure
