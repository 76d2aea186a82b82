"""Primitive costs with honest readback timing, fresh inputs per call."""
import time
import jax, jax.numpy as jnp, numpy as np
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.bitpack_tree import tree_pack

B, N = 16, 65536
M = (9 * N + N // 4 + 8192) // 32
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)

def run(name, jfn, fresh, reps=5):
    args = fresh()
    out = jfn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])  # drain
    ts = []
    for _ in range(reps):
        args = fresh()
        t0 = time.time()
        out = jfn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[-1].reshape(-1)[:4])
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts)//2]
    print(f"{name:36s} {med*1e3:9.2f} ms   ({B*N/med/1e6:7.1f} M/s)", flush=True)

u32 = lambda: jnp.asarray(rng.integers(0, 1 << 31, (B, N)), dtype=jnp.uint32)

# elementwise chain x8
run("elemwise x8", jax.jit(lambda x: ((((((((x*7)^(x>>3))*9)^(x>>5))*11)^(x>>7))*13)^(x>>9)).sum(1)), lambda: (u32(),))
# sort 1 key
run("sort key", jax.jit(lambda x: jnp.sort(x, axis=1)[:, -1]), lambda: (u32(),))
# sort key + 4 payloads
def sort5(k, a, b, c, d):
    out = jax.vmap(lambda *o: jax.lax.sort(o, num_keys=1))(k, a, b, c, d)
    return out[0][:, -1] + out[4][:, -1]
run("sort key+4 payloads", jax.jit(sort5), lambda: (u32(), u32(), u32(), u32(), u32()))
# gather from 64K table per block
def gat(x, t):
    return jax.vmap(lambda xi, ti: ti[(xi & 0xFFFF).astype(jnp.int32)])(x, t).sum(1)
run("gather [B,N] from 64K", jax.jit(gat), lambda: (u32(), u32()))
# scatter-max to N
def scat(x, v):
    idx = (x & 0xFFFF).astype(jnp.int32)
    return jax.vmap(lambda i, vi: jnp.zeros(N, jnp.uint32).at[i].max(vi))(idx, v).sum(1)
run("scatter-max [B,N]->[B,N]", jax.jit(scat), lambda: (u32(), u32()))
# scatter pack vs tree pack
def mkpack():
    nbits = rng.integers(0, 16, (B, N)).astype(np.int32)
    lo = (rng.integers(0, 1 << 31, (B, N)).astype(np.uint32) & ((1 << np.minimum(nbits, 31)) - 1).astype(np.uint32))
    hi = np.zeros((B, N), np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(nbits)
run("scatter pack_fields", jax.jit(lambda lo, hi, nb: jax.vmap(lambda v, n: pack_fields(v, n, M))(lo, nb)[1]), mkpack)
run("tree pack", jax.jit(lambda lo, hi, nb: jax.vmap(tree_pack)(lo, hi, nb)[1]), mkpack)
# cumsum
run("cumsum", jax.jit(lambda x: jnp.cumsum(x, axis=1)[:, -1]), lambda: (u32(),))
# fori loop of 17 gathers f[f]
def ptr(x):
    f = (x & 0xFFFF).astype(jnp.int32)
    def body(_, f):
        return jax.vmap(lambda fi: fi[fi])(f)
    return jax.lax.fori_loop(0, 17, body, f).sum(1)
run("17x f[f] pointer chase", jax.jit(ptr), lambda: (u32(),))
