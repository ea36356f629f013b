"""Driver entry points stay runnable: single-chip step + multi-chip dryrun
on the virtual CPU mesh."""

import importlib.util
import os

import jax
import numpy as np


def _load():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, rgb = out
    assert rgb.shape == (128, 256, 3)
    assert np.isfinite(np.asarray(rgb)).all()


def test_dryrun_multichip_8():
    m = _load()
    m.dryrun_multichip(8)
