"""Driver entry points must always work: entry() compiles single-chip and
dryrun_multichip runs the full sharded step on the virtual mesh."""

import importlib.util
import os

import jax
import numpy as np


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.asarray(out[0]).shape == (8,)


def test_dryrun_multichip():
    g = _load()
    g.dryrun_multichip(len(jax.devices()))
    g.dryrun_multichip(2)
