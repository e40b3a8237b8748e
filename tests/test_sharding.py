"""Multi-device sharding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmap_tpu.parallel.sharding import make_mesh, place_bank
from vmap_tpu.core.bank import init_bank


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_2d():
    mesh = make_mesh(8)
    assert mesh.shape == {"obj": 4, "data": 2}


def test_make_mesh_small():
    mesh = make_mesh(2)
    assert mesh.shape["obj"] == 2 and mesh.shape["data"] == 1


def test_place_bank_shards_leading_axis():
    mesh = make_mesh(8)
    bank = init_bank(jax.random.PRNGKey(0), 8, hidden=8)
    sharded = place_bank(mesh, bank, "obj")
    s = sharded.flat.sharding
    assert s.spec[0] == "obj"
    # each device holds 2 of 8 slots of the packed parameter buffer
    shard_shapes = {tuple(sh.data.shape) for sh in sharded.flat.addressable_shards}
    assert shard_shapes == {(2, bank.spec.n_params)}


def test_dryrun_multichip_entrypoint():
    """The driver's multichip validation must run end to end on 8 CPU
    devices."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_forward_compiles():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    alpha, color = jax.jit(fn)(*args)
    assert alpha.shape == (100, 120, 10, 1)
    assert color.shape == (100, 120, 10, 3)
    assert np.isfinite(np.asarray(alpha)).all()
