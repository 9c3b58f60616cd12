"""Driver-interface tests: entry() compiles single-device and
dryrun_multichip runs a full DP train step on the 8-device virtual mesh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402

pytestmark = pytest.mark.heavy  # compile-heavy integration tier



def test_entry_forward():
    fn, (params, batch) = graft.entry()
    out = jax.jit(fn)(params, batch)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)