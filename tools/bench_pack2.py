import time
import jax
import jax.numpy as jnp
import numpy as np
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.bitpack_tree import tree_pack

B, F = 16, 65536
M = (9 * F + F // 4 + 8192) // 32
rng = np.random.default_rng(0)

def fresh():
    nbits = rng.integers(0, 16, (B, F)).astype(np.int32)
    lo = (rng.integers(0, 1 << 31, (B, F)).astype(np.uint32)
          & ((1 << np.minimum(nbits, 31)) - 1).astype(np.uint32))
    hi = np.zeros((B, F), np.uint32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(nbits)

scatter = jax.jit(lambda lo, nb: jax.vmap(lambda v, n: pack_fields(v, n, M))(lo, nb))
tree = jax.jit(lambda lo, hi, nb: jax.vmap(tree_pack)(lo, hi, nb))

print("device:", jax.devices()[0], flush=True)
for name, call in (("scatter", lambda a: scatter(a[0], a[2])),
                   ("tree", lambda a: tree(*a))):
    args = fresh()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), call(args))  # compile
    ts = []
    for _ in range(5):
        args = fresh()
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), args)
        t0 = time.time()
        out = call(args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        ts.append(time.time() - t0)
    print(f"{name:10s} min {min(ts)*1e3:7.2f} ms  median {sorted(ts)[2]*1e3:7.2f} ms", flush=True)
