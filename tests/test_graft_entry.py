"""Driver entry points compile and run on the virtual device mesh."""

import importlib.util
import os

import jax
import numpy as np
import pytest


def _load():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__graft_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_single_chip():
    ge = _load()
    fn, args = ge.entry()
    vals, idxs = jax.jit(fn)(*args)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    # flagship serving shapes: 256 queries, top-10 (see __graft_entry__)
    assert vals.shape == idxs.shape == (256, 10)
    assert np.isfinite(vals).all()
    assert (idxs >= 0).all() and (idxs < args[1].shape[0]).all()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_dryrun_multichip_all_devices():
    ge = _load()
    ge.dryrun_multichip(len(jax.devices()))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_dryrun_multichip_subset():
    ge = _load()
    ge.dryrun_multichip(4)
    ge.dryrun_multichip(2)
