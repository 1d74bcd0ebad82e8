"""The driver-facing entry points must stay green: single-chip compile
check + the multi-chip dry run (training step, sharded extraction, sharded
ranking on an 8-device mesh)."""

import importlib.util
import os

import jax
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(_ROOT, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load_entry_module()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 2048)
    norm = float(jax.numpy.linalg.norm(out[0]))
    assert norm == pytest.approx(1.0, abs=1e-2)  # bf16 L2-normalized


def test_dryrun_multichip_8():
    # conftest already provisioned 8 virtual CPU devices; the entry's own
    # provisioning must be a no-op there and the full dry run must pass
    mod = _load_entry_module()
    mod.dryrun_multichip(8)
