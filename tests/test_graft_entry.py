"""Driver-contract tests: entry() must be jittable single-device and
dryrun_multichip must compile+execute the full sharded training step."""

import importlib.util
import os

import jax
import pytest


def _load():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_steps():
    mod = _load()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert int(out["t"]) == 1


def test_dryrun_multichip_8():
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mod = _load()
    mod.dryrun_multichip(8)
