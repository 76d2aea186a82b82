"""Capture an XLA op-level trace of the full encoder and print top ops."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), '.jax_cache'))

import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops import deflate_encode as de

B, N = 16, 65536
M = de.words_bound(N)


def main():
    print("device:", jax.devices()[0], flush=True)
    raw = open("/usr/bin/g++", "rb").read()[: B * N]
    data = np.zeros((B, N + 8), np.uint8)
    for i in range(B):
        data[i, :N] = np.frombuffer(raw[i * N:(i + 1) * N], np.uint8)
    dj = jnp.asarray(data)
    lj = jnp.asarray(np.full((B,), N, np.int32))

    # warm up / compile
    out = de.encode_blocks(dj, lj, 1, 16, True, M)
    out[0].block_until_ready()
    print("compiled", flush=True)

    trace_dir = "/tmp/qzt_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = de.encode_blocks(dj, lj, 1, 16, True, M)
        out[0].block_until_ready()

    # parse the trace: sum durations per op name on the device track
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", paths, flush=True)
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            doc = json.load(f)
        events.extend(doc.get("traceEvents", []))
    durs = {}
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            pid = ev.get("pid", 0)
            durs.setdefault(name, [0, 0])
            durs[name][0] += ev["dur"]
            durs[name][1] += 1
    top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:40]
    for name, (d, c) in top:
        print(f"{d/1000:10.2f} ms  x{c:4d}  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
