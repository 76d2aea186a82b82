"""Compare scatter packer vs merge-tree packer on device, memoization-proof."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.bitpack_tree import tree_pack

B, F = 16, 65536
M = (9 * F + F // 4 + 8192) // 32

rng = np.random.default_rng(0)
nbits = rng.integers(0, 16, (B, F)).astype(np.int32)
lo = (rng.integers(0, 1 << 31, (B, F)).astype(np.uint32)
      & ((1 << np.minimum(nbits, 31)) - 1).astype(np.uint32))
hi = np.zeros((B, F), np.uint32)

def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    for k in (1, 5):
        f = jax.jit(lambda *a, k=k: _chain(fn, k, *a))
        o = f(*args); jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
        t0 = time.time()
        for _ in range(reps):
            o = f(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), o)
        dt = (time.time() - t0) / reps
        if k == 1: t1 = dt
    per = (dt - t1) / 4
    print(f"{name:28s} {per*1e3:8.2f} ms/op  ({B*F/per/1e6:.0f} Mfields/s)", flush=True)

def _chain(fn, k, lo, hi, nb):
    acc = jnp.uint32(0)
    out = None
    for i in range(k):
        out = fn(lo ^ acc[None, None], hi, nb)
        acc = out[0].reshape(-1)[0] if isinstance(out, tuple) else out.reshape(-1)[0]
    return out

def scatter_pack(lo, hi, nb):
    w, t = jax.vmap(lambda v, n: pack_fields(v, n, M))(lo, nb)
    return w, t

def tpack(lo, hi, nb):
    return jax.vmap(tree_pack)(lo, hi, nb)

print("device:", jax.devices()[0], flush=True)
timeit("scatter pack_fields", scatter_pack, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(nbits))
timeit("merge-tree pack", tpack, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(nbits))
