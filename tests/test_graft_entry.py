"""The driver contract: entry() compiles and runs single-device;
dryrun_multichip exercises all four sharding axes on the 8-device mesh."""

import sys

import jax
import numpy as np


def _load_graft():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    return __graft_entry__


def test_entry_compiles_and_runs():
    graft = _load_graft()
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    obs, dstate, svstate, mstate = out
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(svstate.theta)).all()
    assert np.isfinite(np.asarray(mstate.x)).all()


def test_dryrun_multichip_eight_devices():
    graft = _load_graft()
    assert len(jax.devices()) == 8
    graft.dryrun_multichip(8)  # asserts internally



def test_subset_mesh_paths():
    """Non-full meshes (n_devices < available) keep working: the
    make_mesh device slicing and a sharded phi on 4 of 8 devices."""
    import jax.numpy as jnp

    from dust_tpu.parallel import make_mesh
    from dust_tpu.parallel.stein import make_sharded_svgd_phi

    mesh = make_mesh(n_devices=4, axis_names=("particle",))
    assert mesh.devices.size == 4
    phi = make_sharded_svgd_phi(mesh, "particle")
    x = jax.random.normal(jax.random.key(0), (16, 2))
    s = jax.random.normal(jax.random.key(1), (16, 2))
    out = jax.jit(phi)(x, s, jnp.float32(0.8))
    assert np.isfinite(np.asarray(out)).all()
