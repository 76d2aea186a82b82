"""Stage-level TPU profiling of the deflate encode pipeline.

Times each pipeline stage in isolation on the current JAX default device to
locate the hotspots (sort / match / greedy / huffman / pack).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops import deflate_encode as de
from qatzip_tpu.ops import lz77
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.huffman import assign_code_lengths, canonical_codes_reversed

B, N = 16, 65536


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    dt = (time.time() - t0) / reps
    mbps = B * N / dt / 1e6
    print(f"{name:24s} {dt*1e3:9.2f} ms  {mbps:10.1f} MB/s", flush=True)
    return out


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    raw = open("/usr/bin/g++", "rb").read()[: B * N]
    data = np.zeros((B, N + 8), np.uint8)
    for i in range(B):
        data[i, :N] = np.frombuffer(raw[i * N:(i + 1) * N], np.uint8)
    lens = np.full((B,), N, np.int32)
    dj = jnp.asarray(data)
    lj = jnp.asarray(lens)

    # stage 1: hash + keys + sort
    @jax.jit
    def stage_sort(d, l):
        def one(dd, ll):
            d32 = dd.astype(jnp.uint32)
            b4 = lz77._pack_b4(d32, N)
            h = lz77._hash(b4)
            pos = jnp.arange(N, dtype=jnp.uint32)
            valid = pos + 3 < ll.astype(jnp.uint32)
            keys = jnp.where(valid, (h << lz77.POS_BITS) | pos,
                             jnp.uint32(0xFFFFFFFF))
            return jnp.sort(keys)
        return jax.vmap(one)(d, l)

    skeys = timeit("hash+sort", stage_sort, dj, lj)

    # stage 2: match length (depth 1)
    @jax.jit
    def stage_match(d, l):
        def one(dd, ll):
            return lz77.find_matches(dd, ll, depth=1, max_match_words=16)
        return jax.vmap(one)(d, l)

    mlen, mdist = timeit("find_matches(all)", stage_match, dj, lj)

    # stage 3: greedy select
    @jax.jit
    def stage_greedy(a, b, l):
        return jax.vmap(lz77.greedy_select)(a, b, l)

    sel, take = timeit("greedy_select", stage_greedy, mlen, mdist, lj)

    # stage 4: histogram + huffman build
    @jax.jit
    def stage_huff(m, dist, s, t, d):
        def one(mlen1, mdist1, sel1, take1, dd):
            lit = dd[:N].astype(jnp.int32)
            len_code = de._LENGTH_CODE[mlen1]
            d_code = de._DIST_CODE[mdist1]
            sym = jnp.where(take1, len_code, lit)
            seli = sel1.astype(jnp.int32)
            takei = (sel1 & take1).astype(jnp.int32)
            freq_ll = jnp.zeros(286, jnp.int32).at[jnp.clip(sym, 0, 285)].add(seli)
            freq_ll = freq_ll.at[256].add(1)
            freq_d = jnp.zeros(30, jnp.int32).at[jnp.clip(d_code, 0, 29)].add(takei)
            ll_len = assign_code_lengths(freq_ll, 15)
            d_len = assign_code_lengths(freq_d, 15)
            ll_code = canonical_codes_reversed(ll_len, 15)
            d_code_t = canonical_codes_reversed(d_len, 15)
            return ll_len, d_len, ll_code, d_code_t
        return jax.vmap(one)(m, dist, s, t, d)

    timeit("histogram+huffman", stage_huff, mlen, mdist, sel, take, dj)

    # stage 5: full pack via full encoder minus earlier stages -> measure whole
    m_words = de.words_bound(N)
    f = functools.partial(de.encode_blocks, depth=1, kwords=16,
                          allow_dynamic=True, m_words=m_words)
    timeit("FULL encode_blocks", f, dj, lj)

    # stage 6: isolated scatter-add pack of 4N fields
    F = 4 * N + 340
    vals = jnp.asarray(rng.integers(0, 127, (B, F)), dtype=jnp.int32)
    nbits = jnp.asarray(rng.integers(0, 8, (B, F)), dtype=jnp.int32)

    @jax.jit
    def stage_pack(v, nb):
        return jax.vmap(lambda a, b: pack_fields(a, b, m_words))(v, nb)

    timeit("pack_fields(scatter)", stage_pack, vals, nbits)


if __name__ == "__main__":
    main()
