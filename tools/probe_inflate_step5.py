"""Probe v5: lane-major lockstep-decode layout (round-5 experiment).

Round 4's kernel keeps per-block state in [128,128] column-constant i32
vectors (blocks along sublanes) because the only proven gather form is
jnp.take_along_axis over [128,128] with a full-width index.  That makes
every elementwise op cost 16 VPU cycles; the full decode step measured
2374 ns (PERF.md).  This probe measures the primitives a lane-major
layout (blocks along LANES, state [1,128]) would need.

Timing is SLOPE-BASED: each construct is compiled at two inner-loop trip
counts and the cost is (t_hi - t_lo) / (K_hi - K_lo), cancelling the
~2-3 ms fixed dispatch overhead of this tunnel-attached host that
swamped the absolute numbers.

Findings (first run): take_along_axis axis=0 lowers ONLY for [8,128]
operands with an [8,128] index (the in-vreg sublane shuffle); any taller
operand fails to lower.  So lane-major table fetches must be one-hot
row reductions or row-group select chains + the 8-row sublane shuffle.

Run on the real chip:  python tools/probe_inflate_step5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        print(f"OK   {name}: {fn()}", flush=True)
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)


def timeit(f, *args, n=10):
    r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:8]
    return (time.perf_counter() - t0) / n


def slope(make, args, k_lo, k_hi, n=10):
    """Marginal cost per unit: (t(k_hi)-t(k_lo))/(k_hi-k_lo)."""
    f_lo, f_hi = make(k_lo), make(k_hi)
    t_lo = timeit(f_lo, *args, n=n)
    t_hi = timeit(f_hi, *args, n=n)
    return (t_hi - t_lo) / (k_hi - k_lo)


def pallas1(kern, out_shape, nin):
    def call(*args):
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nin,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    return jax.jit(call)


# --- A: elementwise chain ---------------------------------------------------
def mk_ew(shape):
    def make(K):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            c1 = jnp.uint32(2654435761)
            for _ in range(K):
                x = (x * c1) ^ (x >> jnp.uint32(7))
            o_ref[:] = x
        return pallas1(kern, jax.ShapeDtypeStruct(shape, jnp.uint32), 1)
    return make


# --- B: in-vreg sublane shuffle [8,128] ------------------------------------
def mk_subshuf(K_outer):
    def make(K):
        def kern(t_ref, i_ref, o_ref):
            t = t_ref[:]
            idx = i_ref[:]
            for _ in range(K):
                g = jnp.take_along_axis(t, idx & 7, axis=0)
                idx = idx + g.astype(jnp.int32)
            o_ref[:] = idx
        return pallas1(kern, jax.ShapeDtypeStruct((8, 128), jnp.int32), 2)
    return make


# --- C: one-hot row gather over [N,128] ------------------------------------
def mk_onehot(N):
    def make(K):
        def kern(t_ref, i_ref, o_ref):
            t = t_ref[:].astype(jnp.int32)
            idx = i_ref[:]          # [1,128]
            rowi = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 0)
            for _ in range(K):
                m = rowi == idx     # broadcast [1,128] -> [N,128]
                g = jnp.sum(jnp.where(m, t, 0), axis=0, keepdims=True)
                idx = (idx + g) & (N - 1)
            o_ref[:] = idx
        return pallas1(kern, jax.ShapeDtypeStruct((1, 128), jnp.int32), 2)
    return make


# --- C2: row-group select chain + sublane shuffle ---------------------------
def mk_groupsel(N):
    NG = N // 8

    def make(K):
        def kern(t_ref, i_ref, o_ref):
            groups = [t_ref[g * 8:(g + 1) * 8, :] for g in range(NG)]
            idx = i_ref[:]          # [8,128] (same value all sublanes)
            for _ in range(K):
                hi = idx >> 3
                acc = groups[0]
                for g in range(1, NG):
                    acc = jnp.where(hi == g, groups[g], acc)
                g8 = jnp.take_along_axis(acc, idx & 7, axis=0)
                idx = (idx + g8) & (N - 1)
            o_ref[:] = idx
        return pallas1(kern, jax.ShapeDtypeStruct((8, 128), jnp.int32), 2)
    return make


# --- D: transpose chain -----------------------------------------------------
def mk_transpose():
    def make(K):
        def kern(x_ref, o_ref):
            x = x_ref[:]
            for _ in range(K):
                x = x.T + 1
            o_ref[:] = x
        return pallas1(kern, jax.ShapeDtypeStruct((128, 128), jnp.int32), 1)
    return make


# --- E: lane-major decode-step skeleton ------------------------------------
# Same gather/dependency structure as pallas_inflate.decode_step:
#   peek: 3 window-word fetches (win [W,128], per-lane row wi)
#   ll resolve: root cell + sub cell fetch from tll [RC+SC,128]
#   d  resolve: root + sub from td
#   ~70 elementwise ops on [1,128] / [8,128]
def mk_lane_major_step(W, root_cells, sub_cells, mode):
    """mode: 'onehot' | 'groupsel'."""
    def fetch(t, idx, N):
        if mode == "groupsel":
            NG = N // 8
            hi = idx >> 3
            acc = t[0:8, :]
            for g in range(1, NG):
                acc = jnp.where(hi == g, t[g * 8:(g + 1) * 8, :], acc)
            return jnp.take_along_axis(
                acc, idx & 7, axis=0).astype(jnp.uint32)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 0)
        return jnp.sum(jnp.where(rowi == (idx & (N - 1)),
                                 t.astype(jnp.int32), 0),
                       axis=0, keepdims=True).astype(jnp.uint32)

    R0 = 8 if mode == "groupsel" else 1

    def make(K):
        def kern(win_ref, tll_ref, td_ref, bp_ref, o_ref):
            _u = jnp.uint32
            win = win_ref[:]
            bitpos = bp_ref[:]      # [R0,128]

            def mask(nb):
                return (_u(1) << nb.astype(_u)) - _u(1)

            for _ in range(K):
                # peek2: three window words at wi, wi+1, wi+2
                wi = (bitpos >> 5) % (W - 2)
                sh = (bitpos & 31).astype(_u)
                w0 = fetch(win_ref[:], wi, W)
                w1 = fetch(win_ref[:], wi + 1, W)
                w2 = fetch(win_ref[:], wi + 2, W)
                b0 = (w0 >> sh) | ((w1 << (_u(31) - sh)) << _u(1))
                b1 = (w1 >> sh) | ((w2 << (_u(31) - sh)) << _u(1))
                # ll resolve: root + sub
                rbits = 1
                while (1 << rbits) < root_cells * 2:
                    rbits += 1
                idxr = (b0 & _u((1 << rbits) - 1)).astype(jnp.int32)
                cell = fetch(tll_ref[0:root_cells, :], idxr >> 1, root_cells)
                e = (cell >> ((idxr.astype(_u) & _u(1)) << _u(4))) & _u(0xFFFF)
                subbits = e & _u(15)
                sidx = (((e >> _u(6)) & _u(0xFF)) << _u(1)).astype(jnp.int32) \
                    + ((b0 >> _u(rbits)) & mask(subbits)).astype(jnp.int32)
                cell2 = fetch(tll_ref[root_cells:root_cells + sub_cells, :],
                              sidx >> 1, sub_cells)
                e2 = (cell2 >> ((sidx.astype(_u) & _u(1)) << _u(4))) \
                    & _u(0xFFFF)
                is_sub = ((e >> _u(4)) & _u(3)) == _u(3)
                e = jnp.where(is_sub, e2, e)
                clen = (e & _u(15)).astype(jnp.int32)
                kind = ((e >> _u(4)) & _u(3)).astype(jnp.int32)
                sym = ((e >> _u(6)) & _u(0xFF)).astype(jnp.int32)
                e_len = jnp.minimum(jnp.maximum(sym - 4, 0) >> 2, 5)
                lbase = jnp.where(sym < 4, sym + 3,
                                  ((4 + (sym & 3)) << e_len) + 3)
                e_len = jnp.where(sym >= 28, 0, e_len)
                lbase = jnp.where(sym >= 28, 258, lbase)
                eb = jnp.where(kind == 1, e_len, 0)
                lex = ((b0 >> clen.astype(_u)) & mask(eb)).astype(jnp.int32)
                mlen = lbase + lex
                used1 = clen + eb
                u1 = used1.astype(_u)
                bits2 = (b0 >> u1) | ((b1 << (_u(31) - u1)) << _u(1))
                # d resolve
                didx = (bits2 & _u((1 << rbits) - 1)).astype(jnp.int32)
                dcell = fetch(td_ref[0:root_cells, :], didx >> 1, root_cells)
                ed = (dcell >> ((didx.astype(_u) & _u(1)) << _u(4))) \
                    & _u(0xFFFF)
                dsb = ed & _u(15)
                dsidx = (((ed >> _u(6)) & _u(0xFF)) << _u(1)) \
                    .astype(jnp.int32) \
                    + ((bits2 >> _u(rbits)) & mask(dsb)).astype(jnp.int32)
                dcell2 = fetch(td_ref[root_cells:root_cells + sub_cells, :],
                               dsidx >> 1, sub_cells)
                ed2 = (dcell2 >> ((dsidx.astype(_u) & _u(1)) << _u(4))) \
                    & _u(0xFFFF)
                ed = jnp.where(((ed >> _u(4)) & _u(3)) == _u(3), ed2, ed)
                dclen = (ed & _u(15)).astype(jnp.int32)
                ds = ((ed >> _u(6)) & _u(31)).astype(jnp.int32)
                e_d = jnp.maximum(ds - 2, 0) >> 1
                dbase1 = jnp.where(ds < 4, ds, (2 + (ds & 1)) << e_d)
                deb = jnp.where(ds < 4, 0, e_d)
                dex = ((bits2 >> dclen.astype(_u)) & mask(deb)) \
                    .astype(jnp.int32)
                dist1 = dbase1 + dex
                adv = used1 + jnp.where(kind == 1, dclen + deb, 0)
                tok = _u(2) | (mlen.astype(_u) << _u(2)) | \
                    (dist1.astype(_u) << _u(11))
                bitpos = bitpos + (adv & 15) + \
                    (tok.astype(jnp.int32) & 1)
            o_ref[:] = bitpos

        def call(win, tll, td, bp):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((R0, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(win, tll, td, bp)
        return jax.jit(call)
    return make, R0


def main():
    print("dev:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # A
    for shape in ((1, 128), (8, 128), (128, 128)):
        args = (jnp.asarray(rng.integers(0, 1 << 31, shape, dtype=np.int64)
                            .astype(np.uint32)),)
        report(f"A ew [{shape[0]},128]",
               lambda s=shape, a=args:
               f"{slope(mk_ew(s), a, 512, 4096, n=20)/2*1e9:.2f} ns/op")

    # B: in-vreg sublane shuffle
    t8 = jnp.asarray(rng.integers(0, 8, (8, 128), dtype=np.int32))
    i8 = jnp.asarray(rng.integers(0, 8, (8, 128), dtype=np.int32))
    report("B sublane shuffle [8,128]",
           lambda: f"{slope(mk_subshuf(0), (t8, i8), 256, 2048)*1e9:.1f}"
                   " ns/gather")

    # C / C2
    for N in (64, 128, 256, 512):
        t = jnp.asarray(rng.integers(0, N, (N, 128), dtype=np.int32))
        i1 = jnp.asarray(rng.integers(0, N, (1, 128), dtype=np.int32))
        report(f"C onehot [{N},128]",
               lambda N=N, t=t, i1=i1:
               f"{slope(mk_onehot(N), (t, i1), 128, 1024)*1e9:.1f} ns/gather")
        ig = jnp.asarray(np.repeat(np.asarray(i1), 8, axis=0))
        report(f"C2 groupsel [{N},128]",
               lambda N=N, t=t, ig=ig:
               f"{slope(mk_groupsel(N), (t, ig), 128, 1024)*1e9:.1f}"
               " ns/gather")

    # D
    x = jnp.asarray(rng.integers(0, 1 << 30, (128, 128), dtype=np.int32))
    report("D transpose [128,128]",
           lambda: f"{slope(mk_transpose(), (x,), 64, 512)*1e9:.1f}"
                   " ns/transpose")

    # E: full step skeletons
    W = 128
    win = jnp.asarray(rng.integers(0, 1 << 31, (W, 128), dtype=np.int64)
                      .astype(np.uint32))
    for mode, rc, sc in (("onehot", 256, 256), ("onehot", 128, 256),
                         ("groupsel", 256, 256), ("groupsel", 128, 256)):
        tll = jnp.asarray(rng.integers(0, 1 << 31, (rc + sc, 128),
                                       dtype=np.int64).astype(np.uint32))
        td = jnp.asarray(rng.integers(0, 1 << 31, (rc + sc, 128),
                                      dtype=np.int64).astype(np.uint32))
        make, R0 = mk_lane_major_step(W, rc, sc, mode)
        bp = jnp.asarray(rng.integers(0, 1000, (R0, 128), dtype=np.int32))
        report(f"E step {mode} root={rc}c sub={sc}c",
               lambda mk=make, a=(win, tll, td, bp):
               f"{slope(mk, a, 64, 512)*1e9:.0f} ns/step")


if __name__ == "__main__":
    main()
