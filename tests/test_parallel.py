import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpslam_tpu.parallel.mesh import make_mesh
from hpslam_tpu.parallel.knn_tp import make_tp_knn
from hpslam_tpu.ops import knn as K


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_knn_matches_single_chip(rng):
    mesh = make_mesh(8, tp=8, dp=1)
    tp_knn = make_tp_knn(mesh, k=8)
    N_cap, count, Q = 1024, 900, 100
    pts = rng.uniform(-2, 2, (N_cap, 3)).astype(np.float32)
    q = rng.uniform(-2, 2, (Q, 3)).astype(np.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P
    pts_sh = jax.device_put(jnp.asarray(pts), NamedSharding(mesh, P("tp")))
    D_tp, I_tp = tp_knn(jnp.asarray(q), pts_sh, jnp.int32(count))
    D_ref, I_ref = K.knn(jnp.asarray(q), jnp.asarray(pts), jnp.int32(count))
    np.testing.assert_allclose(np.asarray(D_tp), np.asarray(D_ref), atol=1e-5)
    same = np.asarray(I_tp) == np.asarray(I_ref)
    ties = np.isclose(np.asarray(D_tp), np.asarray(D_ref), atol=1e-6)
    assert np.all(same | ties)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry2",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out[0])).all()
