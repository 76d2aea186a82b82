"""Marginal per-op cost: K-chained inside one jit, readback, (K9-K1)/8."""
import time
import jax, jax.numpy as jnp, numpy as np
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.bitpack_tree import tree_pack

B, N = 16, 65536
M = (9 * N + N // 4 + 8192) // 32
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)

def mk_u32(i):
    return jnp.asarray(np.random.default_rng(i).integers(0, 1 << 31, (B, N)), dtype=jnp.uint32)

def run(name, op, reps=3):
    # op: x(uint32[B,N]) -> uint32[B,N] (same shape so it chains)
    res = {}
    for k in (1, 9):
        f = jax.jit(lambda x, k=k: _chain(op, x, k))
        np.asarray(f(mk_u32(99)).reshape(-1)[:4])
        ts = []
        for r in range(reps):
            x = mk_u32(r)
            t0 = time.time()
            np.asarray(f(x).reshape(-1)[:4])
            ts.append(time.time() - t0)
        res[k] = sorted(ts)[len(ts)//2]
    per = (res[9] - res[1]) / 8
    print(f"{name:36s} {per*1e3:9.2f} ms/op  ({B*N/max(per,1e-9)/1e6:7.0f} M/s)", flush=True)

def _chain(op, x, k):
    for i in range(k):
        x = op(x) ^ jnp.uint32(i)   # cheap dependency barrier
    return x

run("elemwise x1 (mul/xor/shift)", lambda x: x * jnp.uint32(2654435761) ^ (x >> 15))
run("sort key", lambda x: jnp.sort(x, axis=1))
def sort5(x):
    o = jax.vmap(lambda a: jax.lax.sort((a, a ^ 1, a ^ 2, a ^ 3, a ^ 5), num_keys=1))(x)
    return o[0] ^ o[1] ^ o[2] ^ o[3] ^ o[4]
run("sort key+4 payloads", sort5)
run("gather 64K table", lambda x: jax.vmap(lambda xi: xi[(xi & 0xFFFF).astype(jnp.int32)])(x))
run("scatter-max", lambda x: jax.vmap(lambda xi: jnp.zeros(N, jnp.uint32).at[(xi & 0xFFFF).astype(jnp.int32)].max(xi))(x))
def sp(x):
    nb = (x & 15).astype(jnp.int32)
    lo = x & ((jnp.uint32(1) << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    w, t = jax.vmap(lambda v, n: pack_fields(v, n, M))(lo, nb)
    return x ^ t[:, None].astype(jnp.uint32)
run("scatter pack_fields", sp)
def tp(x):
    nb = (x & 15).astype(jnp.int32)
    lo = x & ((jnp.uint32(1) << jnp.clip(nb, 0, 31).astype(jnp.uint32)) - 1)
    w, t = jax.vmap(tree_pack)(lo, jnp.zeros_like(lo), nb)
    return x ^ t[:, None].astype(jnp.uint32)
run("tree pack", tp)
run("cumsum", lambda x: jnp.cumsum(x, axis=1))
run("f[f] gather once", lambda x: jax.vmap(lambda xi: xi[(xi & 0xFFFF).astype(jnp.int32)] )(x))
