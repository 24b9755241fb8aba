"""TPU compile smoke + timing for nicer_fused_trackloss at ScanNet dims."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from hpslam_tpu.ops import fused_mlp as FM
from hpslam_tpu.models import decoder as Dec

S, K, C = 5, 8, 32
n = 5000
rng = np.random.default_rng(0)
mcfg = Dec.ModelConfig(c_dim=C, encode_exposure=True)
params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)
gd, cd = params["geo_fine"], params["col_fine"]
gflat = tuple(FM.flatten_core(gd["core"]))
cflat = tuple(FM.flatten_core(cd["core"]))
Bs = (gd["B"], cd["B"])

Dr = 2 * S + 6 + 3 * S * K
rowc = jnp.asarray(rng.normal(size=(n, Dr)).astype(np.float32))
# make z / r2 / has / nz sane
rowc = rowc.at[:, :S].set(jnp.abs(rowc[:, :S]) + 0.5)          # z
rowc = rowc.at[:, S].set(1.5)                                   # d_gt
cfeat = jnp.asarray(rng.normal(
    size=(n, S * K * 2 * C)).astype(np.float32))
rays = jnp.asarray(np.concatenate([
    np.zeros((n, 3)), rng.normal(size=(n, 3))], 1).astype(np.float32))
aff = jnp.asarray(np.tile(np.concatenate(
    [np.eye(3).reshape(9), np.zeros(3)]).astype(np.float32), (n, 1)))

o_z, o_dgt, o_cgt, o_r2, o_has, o_cp = FM._trackrow_offsets(S, K)
rowc = rowc.at[:, o_r2].set(0.25)
rowc = rowc.at[:, o_has:o_has + S].set(1.0)
rowc = rowc.at[:, o_has + S].set(1.0)   # nz


def loss(rays, aff):
    d, v, c = FM.nicer_fused_trackloss(
        rays, aff, rowc, cfeat, gflat, cflat, Bs,
        mcfg.n_blocks, mcfg.skip, S, K, C, 10.0, 0, True, False)
    return jnp.sum(jnp.abs(1.5 - d)) + 0.5 * jnp.sum(jnp.abs(c - 0.5))


t0 = time.time()
v = jax.jit(loss)(rays, aff)
v.block_until_ready()
print("fwd value:", float(v), "compile+run %.1fs" % (time.time() - t0))

t0 = time.time()
g = jax.jit(jax.grad(loss, argnums=(0, 1)))(rays, aff)
jax.block_until_ready(g)
print("bwd ok %.1fs" % (time.time() - t0),
      "drays norm:", float(jnp.linalg.norm(g[0])),
      "daff norm:", float(jnp.linalg.norm(g[1])))

f = jax.jit(loss)
gf = jax.jit(jax.grad(loss, argnums=(0, 1)))
for fn, nm in ((f, "fwd"), (gf, "fwd+bwd")):
    ts = []
    for _ in range(20):
        t0 = time.time(); jax.block_until_ready(fn(rays, aff))
        ts.append(time.time() - t0)
    print(nm, "median ms:", 1000 * sorted(ts)[len(ts) // 2])
