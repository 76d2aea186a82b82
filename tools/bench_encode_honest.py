"""Honest steady-state timing: every call's output is read back to host."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), '.jax_cache'))

import time
import jax, jax.numpy as jnp, numpy as np
from qatzip_tpu.ops import deflate_encode as de

B, N = 16, 65536
M = de.words_bound(N)
raw = open("/usr/bin/g++-12", "rb").read()
rng = np.random.default_rng(0)

def fresh(i):
    data = np.zeros((B, N + 8), np.uint8)
    off = (i * B * N) % max(1, len(raw) - B * N)
    for b in range(B):
        data[b, :N] = np.frombuffer(raw[off + b*N : off + (b+1)*N], np.uint8)
    return jnp.asarray(data), jnp.asarray(np.full((B,), N, np.int32))

fn = lambda d, l: de.encode_blocks(d, l, 1, 16, True, M)  # has host Huffman stage; not jittable as one unit
d, l = fresh(0)
w, bits, mode = fn(d, l)
_ = np.asarray(bits)  # drain compile+first exec
ts = []
for i in range(6):
    d, l = fresh(i + 1)
    t0 = time.time()
    w, bits, mode = fn(d, l)
    s = np.asarray(bits)          # forces completion (tiny readback)
    ts.append(time.time() - t0)
ts = sorted(ts)
per = ts[len(ts)//2]
print(f"encode_blocks v1: median {per*1e3:.1f} ms for {B*N>>20} MB -> {B*N/per/1e6:.1f} MB/s", flush=True)
# full output readback cost (what production pays)
t0 = time.time(); wd = np.asarray(w); t1 = time.time()-t0
print(f"words D2H {wd.nbytes>>20} MB in {t1*1e3:.0f} ms ({wd.nbytes/t1/1e6:.0f} MB/s)")
