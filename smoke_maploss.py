"""TPU compile smoke for nicer_fused_maploss at ScanNet dims."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from hpslam_tpu.ops import fused_mlp as FM
from hpslam_tpu.models import decoder as Dec

S, u, C = 5, 8, 32
n = 10000
n_blocks, skip = 5, 2
hidden = 128

rng = np.random.default_rng(0)
D = 5 * S + 7 + S * u + u
row = jnp.asarray(rng.normal(size=(n, D)).astype(np.float32))
uf = jnp.asarray(rng.normal(size=(n, u * 2 * C)).astype(np.float32))
okf = jnp.ones((n, 1), jnp.float32)
aff = jnp.asarray(rng.normal(size=(n, 12)).astype(np.float32))

mcfg = Dec.ModelConfig(c_dim=C)
key = jax.random.PRNGKey(0)
params = Dec.init_nicer(key, mcfg)
# pick real geo/col decoders
names = list(params.keys())
print("param names:", names)
gname = [k for k in names if k.startswith("geo")][0]
cname = [k for k in names if k.startswith("col")][0]
gd, cd = params[gname], params[cname]
gflat = tuple(FM.flatten_core(gd["core"]))
cflat = tuple(FM.flatten_core(cd["core"]))
Bs = (gd["B"], cd["B"])

def loss(uf, aff, cflat):
    gl, cl = FM.nicer_fused_maploss(
        uf, aff, cflat, row, okf, gflat, Bs,
        mcfg.n_blocks, mcfg.skip, True, S, u, C, 10.0,
        True, True, 0.1, need_wgrads=True)
    return gl + 0.1 * cl

t0 = time.time()
v = jax.jit(loss)(uf, aff, cflat)
v.block_until_ready()
print("fwd value:", float(v), "compile+run %.1fs" % (time.time() - t0))

t0 = time.time()
g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(uf, aff, cflat)
jax.block_until_ready(g)
print("bwd ok, compile+run %.1fs" % (time.time() - t0))
print("duf norm:", float(jnp.linalg.norm(g[0])),
      "daff norm:", float(jnp.linalg.norm(g[1])))

# timing
f = jax.jit(loss)
gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
for fn, nm in ((f, "fwd"), (gf, "fwd+bwd")):
    ts = []
    for _ in range(20):
        t0 = time.time(); jax.block_until_ready(fn(uf, aff, cflat))
        ts.append(time.time() - t0)
    print(nm, "median ms:", 1000 * sorted(ts)[len(ts) // 2])
