"""Pallas TPU driver for the lockstep DEFLATE entropy decoder.

Construct discipline (every dynamic-addressing form crashes Mosaic on this
target — tools/probe_inflate_step*.py):
  * gathers: ONLY jnp.take_along_axis over [128, 128] with a full-width
    index (563 ns measured for a full 8-gather decode step);
  * refills: one-hot masked ACCUMULATION over statically-unrolled rows
    (pure elementwise; no dynamic slices, no per-lane DMA), predicated
    with pl.when.  Two levels — a 1152-word superwindow rebuilt rarely
    from the stream array, and the 128-word gather window rebuilt from
    the superwindow — so stream VMEM traffic is ~20x lower than a
    single-level refill (v1 read the whole 8.5MB stream per refill);
  * token output: select-accumulate into a register tile, flushed by DMA
    to the HBM output at a major-axis offset (proven in probe v4);
  * state: [128, 128] column-constant i32 vectors (blocks along sublanes;
    i1 loop carries trip a Mosaic layout ICE).

Layouts:
  stream3 u32[128, NB2, 128]   — per-block stream words, 128-word rows
  superwindow u32[128, 18*64]  — words [64*16Q, 64*(16Q+18)) per block
  window  u32[128, 128]        — words [64q, 64q+128) per block
  tll/td  u32[128, 512]        — packed table regions (4 slabs each)
  tokens  u32[NT, 128, 128]    — token(step s, block b) = [s//128, b, s%128]
"""
from __future__ import annotations

import functools

import numpy as np

from qatzip_tpu.ops import pallas_inflate as PI

LANES = PI.LANES
TILE = 128            # steps per token tile (one DMA per tile)
CHUNK = 32            # steps per refill-check (32*49 bits < 2048 budget)
REFILL_THRESH = 2048  # refill when any lane's window-relative bits exceed
SWROWS = 18           # superwindow rows of 64 words


def _mk_kernel(NB2: int, NT: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _u = jnp.uint32
    R = LANES

    def kernel(stream_ref, bit0_ref, nbits_ref, tll_ref, td_ref,
               active_ref,
               tok_ref, err_ref, cnt_ref, end_ref, ns_ref,
               tile_scratch, win_ref, sw_ref, qv_ref, Qv_ref, sem):

        def super_refill(bitpos):
            """Rebuild the superwindow at 1024-word-aligned base; one pass
            over the stream rows, 18 destination-row selects each."""
            Q2 = (bitpos >> 11) >> 4
            base = Q2 << 4  # in 64-word rows
            acc = [jnp.zeros((R, 64), jnp.int32) for _ in range(SWROWS)]
            for b in range(NB2):
                row = stream_ref[:, b, :].astype(jnp.int32)
                lo, hi = row[:, :64], row[:, 64:]
                # destination row j holds 64-word row base+j; stream row b
                # supplies 64-word rows 2b (lo) and 2b+1 (hi)
                for j in range(SWROWS):
                    acc[j] = jnp.where((base + j == 2 * b)[:, :64], lo,
                                       jnp.where((base + j == 2 * b + 1)
                                                 [:, :64], hi, acc[j]))
            sw_ref[:] = jnp.concatenate(acc, axis=1).astype(_u)
            Qv_ref[:] = Q2

        def win_refill(bitpos):
            q2 = bitpos >> 11
            r = q2 - (Qv_ref[:] << 4)     # 64-word row within superwindow
            first = jnp.zeros((R, 64), _u)
            second = jnp.zeros((R, 64), _u)
            for j in range(SWROWS):
                swrow = sw_ref[:, j * 64:(j + 1) * 64]
                first = jnp.where((r == j)[:, :64], swrow, first)
                second = jnp.where((r == j - 1)[:, :64], swrow, second)
            win_ref[:] = jnp.concatenate([first, second], axis=1)
            qv_ref[:] = q2

        def mk_peek(win, qv):
            def peek2(bitpos):
                rel = bitpos - (qv << 11)
                wi = jnp.clip(rel >> 5, 0, 125)
                sh = (rel & 31).astype(_u)
                w0 = jnp.take_along_axis(win, wi, axis=1)
                w1 = jnp.take_along_axis(win, wi + 1, axis=1)
                w2 = jnp.take_along_axis(win, wi + 2, axis=1)
                b0 = (w0 >> sh) | ((w1 << (_u(31) - sh)) << _u(1))
                b1 = (w1 >> sh) | ((w2 << (_u(31) - sh)) << _u(1))
                return b0, b1
            return peek2

        # hoist table slabs as values (one load each)
        ll_s = [tll_ref[:, k * 128:(k + 1) * 128] for k in range(4)]
        d_s = [td_ref[:, k * 128:(k + 1) * 128] for k in range(4)]

        def mk_cell(slabs):
            def fetch(idx):
                w = idx & 127
                g0 = jnp.take_along_axis(slabs[0], w, axis=1)
                g1 = jnp.take_along_axis(slabs[1], w, axis=1)
                g2 = jnp.take_along_axis(slabs[2], w, axis=1)
                g3 = jnp.take_along_axis(slabs[3], w, axis=1)
                hi = idx >> 7
                return jnp.where(hi == 0, g0,
                                 jnp.where(hi == 1, g1,
                                           jnp.where(hi == 2, g2, g3)))
            return fetch

        ll_cell = mk_cell(ll_s)
        d_cell = mk_cell(d_s)
        lanecol = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        def step_i32(peek2, st_i):
            bitpos, done_i, err_i, outcnt, end_bit = st_i
            tok, st2 = PI.decode_step(
                peek2, ll_cell, d_cell,
                (bitpos, done_i != 0, err_i != 0, outcnt, end_bit))
            return tok, (st2[0], st2[1].astype(jnp.int32),
                         st2[2].astype(jnp.int32), st2[3], st2[4])

        bit0 = bit0_ref[:]
        active = active_ref[:] != 0
        super_refill(bit0)
        win_refill(bit0)
        st0 = (bit0, (~active).astype(jnp.int32),
               jnp.zeros((R, 128), jnp.int32),
               jnp.zeros((R, 128), jnp.int32),
               jnp.full((R, 128), -1, jnp.int32))

        def tile_body(carry):
            t, st, _alldone = carry
            tile = jnp.zeros((R, TILE), _u)

            def chunk_body(c, inner):
                st, tile = inner
                bitpos = st[0]
                sup_gap = jnp.max((bitpos >> 11) - (Qv_ref[:] << 4))

                @pl.when(sup_gap >= SWROWS - 2)
                def _():
                    super_refill(bitpos)
                    win_refill(bitpos)

                @pl.when(jnp.max(bitpos - (qv_ref[:] << 11))
                         > REFILL_THRESH)
                def _():
                    win_refill(bitpos)

                peek = mk_peek(win_ref[:], qv_ref[:])

                def step_body(k, inner2):
                    st, tile = inner2
                    tok, st = step_i32(peek, st)
                    tile = jnp.where(lanecol == c * CHUNK + k, tok, tile)
                    return st, tile
                st, tile = jax.lax.fori_loop(0, CHUNK, step_body, (st, tile))
                return st, tile

            st, tile = jax.lax.fori_loop(
                0, TILE // CHUNK, chunk_body, (st, tile))

            # flush the tile to HBM
            tile_scratch[:] = tile
            cp = pltpu.make_async_copy(tile_scratch, tok_ref.at[t], sem)
            cp.start()
            cp.wait()

            _, done_i, err_i, _, _ = st
            alldone = jnp.min(done_i | err_i)  # scalar i32: 1 iff all done
            return t + 1, st, alldone

        def tile_cond(carry):
            t, _st, alldone = carry
            return (t < NT) & (alldone == 0)

        t_fin, st, _ad = jax.lax.while_loop(
            tile_cond, tile_body, (0, st0, 0))

        bitpos, done_i, err_i, outcnt, end_bit = st
        err = (err_i != 0) | (active & (done_i == 0)) \
            | (active & (bitpos > nbits_ref[:]))
        err_ref[:] = err.astype(jnp.int32)
        cnt_ref[:] = outcnt
        end_ref[:] = end_bit
        ns_ref[0, 0] = t_fin * TILE

    return kernel


@functools.lru_cache(maxsize=16)
def _compiled(NB2: int, NT: int, interpret: bool = False):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    kernel = _mk_kernel(NB2, NT)
    R = LANES

    def call(stream3, bit0, nbits, tll, td, active):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((NT, R, TILE), jnp.uint32),  # tokens
                jax.ShapeDtypeStruct((R, 128), jnp.int32),        # err
                jax.ShapeDtypeStruct((R, 128), jnp.int32),        # outcnt
                jax.ShapeDtypeStruct((R, 128), jnp.int32),        # end_bit
                jax.ShapeDtypeStruct((1, 1), jnp.int32),          # nsteps
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.VMEM((R, TILE), jnp.uint32),   # tile
                            pltpu.VMEM((R, 128), jnp.uint32),    # window
                            pltpu.VMEM((R, SWROWS * 64), jnp.uint32),
                            pltpu.VMEM((R, 128), jnp.int32),     # qv
                            pltpu.VMEM((R, 128), jnp.int32),     # Qv
                            pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(stream3, bit0, nbits, tll, td, active)

    return jax.jit(call)


def _bcast_col(v: np.ndarray, dtype) -> np.ndarray:
    return np.repeat(v.astype(dtype)[:, None], 128, axis=1)


# -- compute-timing hooks (devcal / tools): capture each round's compiled
# call + args so the entropy-stage kernel can be re-timed with only the
# tiny nsteps readback (tokens stay on device; D2H is environmental) -----
_capture: list | None = None


def timed_replay(calls, reps: int = 3) -> float:
    """Re-run captured (fn, args) rounds; returns mean seconds per full
    pass over all rounds, true-sync via the scalar nsteps output."""
    import time

    if not calls:
        return 0.0
    for fn, args in calls:  # warm
        r = fn(*args)
    np.asarray(r[4])
    t0 = time.perf_counter()
    for _ in range(reps):
        for fn, args in calls:
            r = fn(*args)
        np.asarray(r[4])
    return (time.perf_counter() - t0) / reps


def decode_pallas(stream_words: np.ndarray, bit0: np.ndarray,
                  nbits: np.ndarray, tll: np.ndarray, td: np.ndarray,
                  active: np.ndarray, max_steps: int,
                  interpret: bool = False):
    """Pallas driver entry.  Host numpy in / host numpy out, matching
    pallas_inflate.decode_blocks."""
    import jax.numpy as jnp

    B, NW = stream_words.shape
    assert B == LANES and NW % 128 == 0
    NB2 = NW // 128 + 1
    NT = -(-max_steps // TILE)

    stream3 = np.zeros((B, NB2, 128), np.uint32)
    stream3[:, :NW // 128, :] = stream_words.reshape(B, NW // 128, 128)

    fn = _compiled(NB2, NT, interpret)
    args = (jnp.asarray(stream3), jnp.asarray(_bcast_col(bit0, np.int32)),
            jnp.asarray(_bcast_col(nbits, np.int32)), jnp.asarray(tll),
            jnp.asarray(td),
            jnp.asarray(_bcast_col(active.astype(np.int32), np.int32)))
    if _capture is not None:
        _capture.append((fn, args))
    tokens3, err, outcnt, end_bit, ns = fn(*args)

    ns_i = int(np.asarray(ns)[0, 0])
    nt_used = max(1, -(-ns_i // TILE)) if ns_i else 0
    tokens3_np = np.asarray(tokens3[:nt_used]) if nt_used else \
        np.zeros((0, B, TILE), np.uint32)
    err_np = np.asarray(err)[:, 0] != 0
    outcnt_np = np.asarray(outcnt)[:, 0]
    end_np = np.asarray(end_bit)[:, 0]
    return ("tiled", tokens3_np), err_np, outcnt_np, end_np, ns_i
