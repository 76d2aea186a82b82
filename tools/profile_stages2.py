"""Variant isolation: find the residual hotspot in the fused encoder.

Runs encode variants with stages knocked out to attribute the FULL-pipeline
time on TPU.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from qatzip_tpu.ops import deflate_encode as de
from qatzip_tpu.ops import deflate_tables as T
from qatzip_tpu.ops import lz77
from qatzip_tpu.ops.bitpack import pack_fields
from qatzip_tpu.ops.huffman import assign_code_lengths, canonical_codes_reversed

B, N = 16, 65536
M = de.words_bound(N)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps
    print(f"{name:32s} {dt*1e3:9.2f} ms  {B*N/dt/1e6:10.1f} MB/s", flush=True)


def build_inputs():
    raw = open("/usr/bin/g++", "rb").read()[: B * N]
    data = np.zeros((B, N + 8), np.uint8)
    for i in range(B):
        data[i, :N] = np.frombuffer(raw[i * N:(i + 1) * N], np.uint8)
    return jnp.asarray(data), jnp.asarray(np.full((B,), N, np.int32))


def variant(data_pad, length, *, do_pack, do_huff, do_interleave):
    n = N
    lit = data_pad[:n].astype(jnp.int32)
    mlen, mdist = lz77.find_matches(data_pad, length, depth=1,
                                    max_match_words=16)
    sel, take = lz77.greedy_select(mlen, mdist, length)
    len_code = de._LENGTH_CODE[mlen]
    len_eb = de._LENGTH_EB[mlen]
    len_ev = de._LENGTH_EV[mlen]
    d_code = de._DIST_CODE[mdist]
    d_eb = de._DIST_EB[mdist]
    d_ev = de._DIST_EV[mdist]
    sym = jnp.where(take, len_code, lit)
    seli = sel.astype(jnp.int32)
    takei = (sel & take).astype(jnp.int32)

    if do_huff:
        freq_ll = jnp.zeros(286, jnp.int32).at[jnp.clip(sym, 0, 285)].add(seli)
        freq_ll = freq_ll.at[256].add(1)
        freq_d = jnp.zeros(30, jnp.int32).at[jnp.clip(d_code, 0, 29)].add(takei)
        ll_len = assign_code_lengths(freq_ll, 15)
        d_len = assign_code_lengths(freq_d, 15)
        emit_ll_len = ll_len
        emit_ll_code = canonical_codes_reversed(ll_len, 15)
        emit_d_len = d_len
        emit_d_code = canonical_codes_reversed(d_len, 15)
    else:
        emit_ll_len = de._STATIC_LL_LEN[:286]
        emit_ll_code = de._STATIC_LL_CODE[:286]
        emit_d_len = de._STATIC_D_LEN
        emit_d_code = de._STATIC_D_CODE

    c0v = jnp.where(sel, emit_ll_code[jnp.clip(sym, 0, 285)], 0)
    c0n = jnp.where(sel, emit_ll_len[jnp.clip(sym, 0, 285)], 0)
    c1v = jnp.where(sel & take, len_ev, 0)
    c1n = jnp.where(sel & take, len_eb, 0)
    c2v = jnp.where(sel & take, emit_d_code[jnp.clip(d_code, 0, 29)], 0)
    c2n = jnp.where(sel & take, emit_d_len[jnp.clip(d_code, 0, 29)], 0)
    c3v = jnp.where(sel & take, d_ev, 0)
    c3n = jnp.where(sel & take, d_eb, 0)

    if do_interleave:
        sym_v = jnp.stack([c0v, c1v, c2v, c3v], axis=1).reshape(-1)
        sym_n = jnp.stack([c0n, c1n, c2n, c3n], axis=1).reshape(-1)
    else:
        sym_v = jnp.concatenate([c0v, c1v, c2v, c3v])
        sym_n = jnp.concatenate([c0n, c1n, c2n, c3n])

    if do_pack:
        words, bits = pack_fields(sym_v, sym_n, M)
        return words, bits
    return jnp.sum(sym_v * sym_n), jnp.sum(sym_n)


def main():
    print("device:", jax.devices()[0], flush=True)
    dj, lj = build_inputs()
    for name, kw in [
        ("lz77+tables only", dict(do_pack=False, do_huff=False,
                                  do_interleave=False)),
        ("+interleave", dict(do_pack=False, do_huff=False, do_interleave=True)),
        ("+huffman", dict(do_pack=False, do_huff=True, do_interleave=False)),
        ("+pack (no huff/interleave)", dict(do_pack=True, do_huff=False,
                                            do_interleave=False)),
        ("+pack+interleave", dict(do_pack=True, do_huff=False,
                                  do_interleave=True)),
        ("everything", dict(do_pack=True, do_huff=True, do_interleave=True)),
    ]:
        fn = jax.jit(jax.vmap(
            lambda d, l, kw=kw: variant(d, l, **kw)))
        timeit(name, fn, dj, lj)


if __name__ == "__main__":
    main()
