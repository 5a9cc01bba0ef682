"""Microbench of nqueens Pallas kernel variants on the chip.

The LS isolation bench (bench/ls_isolation.py) shows the [A, n] score block
at ~2.4 ms/lockstep-iteration (P=256, n=1000, A=50) — half the whole LS body.
This script times kernel variants to find where that goes:

  base     — two f32 dynamic rolls per row (the shipped kernel's shape,
             without the phase-2 min outputs)
  noroll   — rolls replaced by static slices (WRONG results; times the
             everything-but-rolls share).  Measured: rolls = 1.72 of the
             2.88 ms/iter kernel
  packed   — dc + reversed-ac in one i32 roll (ISO_PACKED=1): exact in
             interpret mode, FAILS to lower on current Mosaic (lax.rev)
  i16*     — int16-table variants (ISO_I16=1): FAIL to lower ("Rotate
             with non-32-bit data")

Each timed as vmap over P lanes, K iterations per dispatch via fori_loop,
forced host transfer as the only trustworthy sync (docs/DESIGN.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ISO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("ISO_N", 1000))
P = int(os.environ.get("ISO_P", 256))
K = int(os.environ.get("ISO_K", 50))
A = max(1, N // 20)
INTERP = bool(os.environ.get("ISO_CPU"))


def _force(x):
    return jax.tree.map(np.asarray, x)


def timeit(fn, *args):
    out = _force(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = _force(fn(*args))
        best = min(best, time.time() - t0)
    return best, out


# --- variant kernels ------------------------------------------------------

def _kern_base(n, c_ref, r_ref, rem_ref, cur_ref, rc_ref, dc_ref, ac_ref, out_ref):
    n_pad = rc_ref.shape[1]
    a = out_ref.shape[0]
    cur = cur_ref[0]
    rp = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    rc = rc_ref[0, :].reshape(1, n_pad)
    dc_full = dc_ref[0, :].reshape(1, 2 * n_pad)
    ac_full = ac_ref[0, :].reshape(1, 2 * n_pad)

    def body(j, _):
        c_j, r_j, rem_j = c_ref[j], r_ref[j], rem_ref[j]
        dc_sl = pltpu.roll(dc_full, c_j - (n - 1), axis=1)[:, :n_pad]
        ac_sl = pltpu.roll(ac_full, -c_j, axis=1)[:, :n_pad]
        same = (rp == r_j).astype(jnp.float32)
        added = (rc - same) + (dc_sl - same) + (ac_sl - same)
        out_ref[pl.ds(j, 1), :] = cur + 2.0 * (added - rem_j)
        return 0

    jax.lax.fori_loop(0, a, body, 0)


def _kern_noroll(n, c_ref, r_ref, rem_ref, cur_ref, rc_ref, dc_ref, ac_ref, out_ref):
    n_pad = rc_ref.shape[1]
    a = out_ref.shape[0]
    cur = cur_ref[0]
    rp = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    rc = rc_ref[0, :].reshape(1, n_pad)
    dc_full = dc_ref[0, :].reshape(1, 2 * n_pad)
    ac_full = ac_ref[0, :].reshape(1, 2 * n_pad)

    def body(j, _):
        c_j, r_j, rem_j = c_ref[j], r_ref[j], rem_ref[j]
        dc_sl = dc_full[:, :n_pad]  # WRONG on purpose: no dynamic roll
        ac_sl = ac_full[:, n_pad:]
        same = (rp == r_j).astype(jnp.float32)
        added = (rc - same) + (dc_sl - same) + (ac_sl - same)
        out_ref[pl.ds(j, 1), :] = cur + 2.0 * (added - rem_j) + c_j * 0.0
        return 0

    jax.lax.fori_loop(0, a, body, 0)


def _kern_i16(n, c_ref, r_ref, rem_ref, cur_ref, rc_ref, dc_ref, ac_ref, out_ref):
    n_pad = rc_ref.shape[1]
    a = out_ref.shape[0]
    cur = cur_ref[0]
    rp = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    rc = rc_ref[0, :].reshape(1, n_pad)
    dc_full = dc_ref[0, :].reshape(1, 2 * n_pad)
    ac_full = ac_ref[0, :].reshape(1, 2 * n_pad)

    def body(j, _):
        c_j, r_j, rem_j = c_ref[j], r_ref[j], rem_ref[j]
        dc_sl = pltpu.roll(dc_full, c_j - (n - 1), axis=1)[:, :n_pad]
        ac_sl = pltpu.roll(ac_full, -c_j, axis=1)[:, :n_pad]
        same = (rp == r_j).astype(jnp.int16)
        added = (rc - same) + (dc_sl - same) + (ac_sl - same)
        out_ref[pl.ds(j, 1), :] = cur + 2.0 * (
            added.astype(jnp.float32) - rem_j
        )
        return 0

    jax.lax.fori_loop(0, a, body, 0)


def _kern_i16min(
    n, c_ref, r_ref, rem_ref, cur_ref, rc_ref, dc_ref, ac_ref,
    out_ref, min_ref, arg_ref,
):
    n_pad = rc_ref.shape[1]
    a = out_ref.shape[0]
    cur = cur_ref[0]
    rp = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    in_range = rp < n
    rc = rc_ref[0, :].reshape(1, n_pad)
    dc_full = dc_ref[0, :].reshape(1, 2 * n_pad)
    ac_full = ac_ref[0, :].reshape(1, 2 * n_pad)

    def body(j, _):
        c_j, r_j, rem_j = c_ref[j], r_ref[j], rem_ref[j]
        dc_sl = pltpu.roll(dc_full, c_j - (n - 1), axis=1)[:, :n_pad]
        ac_sl = pltpu.roll(ac_full, -c_j, axis=1)[:, :n_pad]
        same = (rp == r_j).astype(jnp.int16)
        added = (rc - same) + (dc_sl - same) + (ac_sl - same)
        row = cur + 2.0 * (added.astype(jnp.float32) - rem_j)
        out_ref[pl.ds(j, 1), :] = row
        row_m = jnp.where(in_range, row, jnp.inf)
        m = jnp.min(row_m)
        idx = jnp.argmax((row_m == m).astype(jnp.int32))
        min_ref[j] = m
        arg_ref[j] = idx.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, a, body, 0)


def _kern_packed(
    n, c_ref, r_ref, rem_ref, cur_ref, rc_ref, dac_ref, unused_ref,
    out_ref, min_ref, arg_ref,
):
    """One i32 roll per row instead of two f32 rolls: dac packs dc in the
    low 16 bits and ac REVERSED (ac[n + n_pad - 2 - t]) in the high 16 bits.
    After rolling by the dc window start o = n-1-c_j, the low half IS the dc
    window and the high half, read back-to-front (a static full-lane flip),
    IS the ac window: hi(dac[o + n_pad-1-rp]) = ac[c_j + rp].  Counts are
    < 32768 so i16 halves are exact and the packed i32 stays non-negative.
    """
    n_pad = rc_ref.shape[1]
    a = out_ref.shape[0]
    cur = cur_ref[0]
    rp = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    in_range = rp < n
    rc = rc_ref[0, :].reshape(1, n_pad)
    dac = dac_ref[0, :].reshape(1, 2 * n_pad)

    def body(j, _):
        c_j, r_j, rem_j = c_ref[j], r_ref[j], rem_ref[j]
        w = pltpu.roll(dac, c_j - (n - 1), axis=1)[:, :n_pad]
        dc_sl = (w & 0xFFFF).astype(jnp.float32)
        ac_sl = jnp.flip(w >> 16, axis=1).astype(jnp.float32)
        same = (rp == r_j).astype(jnp.float32)
        added = (rc - same) + (dc_sl - same) + (ac_sl - same)
        row = cur + 2.0 * (added - rem_j)
        out_ref[pl.ds(j, 1), :] = row
        row_m = jnp.where(in_range, row, jnp.inf)
        m = jnp.min(row_m)
        min_ref[j] = m
        arg_ref[j] = jnp.argmax((row_m == m).astype(jnp.float32)).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, a, body, 0)


def build_packed():
    n = N
    n_pad = ((n + 127) // 128) * 128

    @jax.jit
    def run(rc, dc, ac, c, r, rem, cur):
        rc_p = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(rc)
        t = jnp.arange(2 * n_pad)
        dc_i = jnp.zeros((2 * n_pad,), jnp.int32).at[: 2 * n - 1].set(
            dc.astype(jnp.int32)
        )
        # high half: ac[n + n_pad - 2 - t] where valid, else 0
        src = n + n_pad - 2 - t
        ok = (src >= 0) & (src <= 2 * n - 2)
        ac_rev = jnp.where(
            ok, ac.astype(jnp.int32)[jnp.clip(src, 0, 2 * n - 2)], 0
        )
        dac = (dc_i | (ac_rev << 16)).reshape(1, 2 * n_pad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(
                pl.BlockSpec((A, n_pad), lambda *_: (0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
        )
        return pl.pallas_call(
            functools.partial(_kern_packed, n),
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((A, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((A,), jnp.float32),
                jax.ShapeDtypeStruct((A,), jnp.int32),
            ),
            interpret=INTERP,
        )(c, r, rem, cur.reshape(1), rc_p, dac, dac)

    def loop(rc, dc, ac, c, r, rem, cur, key):
        def body(i, acc):
            cc = (c + i) % n
            outs = run(rc, dc, ac, cc, r, rem, cur)
            return acc + jnp.min(outs[0][:, :n])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    return jax.jit(jax.vmap(loop))


def build(kern, i16=False, with_min=False):
    n = N
    n_pad = ((n + 127) // 128) * 128
    dt = jnp.int16 if i16 else jnp.float32

    @jax.jit
    def run(rc, dc, ac, c, r, rem, cur):
        rc_p = jnp.zeros((1, n_pad), dt).at[0, :n].set(rc.astype(dt))
        dc_p = jnp.zeros((1, 2 * n_pad), dt).at[0, : 2 * n - 1].set(dc.astype(dt))
        ac_p = jnp.zeros((1, 2 * n_pad), dt).at[0, : 2 * n - 1].set(ac.astype(dt))
        block_spec = pl.BlockSpec((A, n_pad), lambda *_: (0, 0))
        if with_min:
            out_shape = (
                jax.ShapeDtypeStruct((A, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((A,), jnp.float32),
                jax.ShapeDtypeStruct((A,), jnp.int32),
            )
            out_specs = (
                block_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            )
        else:
            out_shape = jax.ShapeDtypeStruct((A, n_pad), jnp.float32)
            out_specs = block_spec
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            functools.partial(kern, n),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=INTERP,
        )(c, r, rem, cur.reshape(1), rc_p, dc_p, ac_p)
        return out if with_min else (out,)

    def loop(rc, dc, ac, c, r, rem, cur, key):
        def body(i, acc):
            cc = (c + i) % n
            outs = run(rc, dc, ac, cc, r, rem, cur)
            return acc + jnp.min(outs[0][:, :n])

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    return jax.jit(jax.vmap(loop))


def build_xla(block_impl):
    """XLA-level block variants (no Pallas): the delta block's shifted table
    reads computed by contiguous dynamic slices ("slice"), an impulse-kernel
    cross-correlation on the MXU ("conv"), or a Toeplitz matmul on the MXU
    ("toeplitz") — the VERDICT-r3 directive-8 A/B.  Same loop/timing shape
    as the kernel variants: accumulate the block min over K iterations."""
    n = N

    def one(rc, dc, ac, cc, r, rem, cur):
        iota_f = jnp.arange(n)
        rp = iota_f[None, :]
        f32 = jnp.float32
        if block_impl == "slice":
            dc_at = jax.vmap(
                lambda s: jax.lax.dynamic_slice(dc, (s,), (n,))
            )((n - 1) - cc)
            ac_at = jax.vmap(lambda s: jax.lax.dynamic_slice(ac, (s,), (n,)))(cc)
        elif block_impl == "conv":
            imp_d = (iota_f[None, :] == (n - 1 - cc)[:, None]).astype(f32)
            imp_a = (iota_f[None, :] == cc[:, None]).astype(f32)
            conv = lambda tbl, imp: jax.lax.conv_general_dilated(
                tbl[None, None, :], imp[:, None, :], (1,), "VALID"
            )[0]
            dc_at = conv(dc, imp_d)
            ac_at = conv(ac, imp_a)
        else:  # toeplitz
            T_d = jax.vmap(
                lambda s: jax.lax.dynamic_slice(dc, (s,), (n,))
            )((n - 1) - iota_f)
            T_a = jax.vmap(lambda s: jax.lax.dynamic_slice(ac, (s,), (n,)))(iota_f)
            onehot_c = (cc[:, None] == iota_f[None, :]).astype(f32)
            dc_at = onehot_c @ T_d
            ac_at = onehot_c @ T_a
        d = r - cc + (n - 1)
        a = r + cc
        dp = rp - cc[:, None] + (n - 1)
        ap = rp + cc[:, None]
        added = (
            (rc[None, :] - (rp == r[:, None]))
            + (dc_at - (dp == d[:, None]))
            + (ac_at - (ap == a[:, None]))
        )
        row = cur + 2.0 * (added - rem[:, None])
        return jnp.min(row)

    def loop(rc, dc, ac, c, r, rem, cur, key):
        def body(i, acc):
            cc = (c + i) % n
            return acc + one(rc, dc, ac, cc, r, rem, cur)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    return jax.jit(jax.vmap(loop))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.key(0)
    ks = jax.random.split(key, P)
    from constraint_solver_tpu.models.nqueens import build_state

    states = jax.vmap(
        lambda k: build_state(jax.random.permutation(k, jnp.arange(N, dtype=jnp.int32)))
    )(ks)
    c = jax.vmap(lambda k: jax.random.randint(k, (A,), 0, N, jnp.int32))(ks)
    r = jax.vmap(lambda rows, cc: rows[cc])(states.rows, c)
    rem = jnp.zeros((P, A), jnp.float32)
    cur = jnp.zeros((P,), jnp.float32)

    variants = [
        ("base f32", build(_kern_base)),
        ("noroll (timing only)", build(_kern_noroll)),
    ]
    if os.environ.get("ISO_PACKED"):
        # Packed dc+reversed-ac single roll: EXACT in interpret mode, but
        # fails to lower on the current Mosaic (lax.rev has no TPU rule).
        variants += [("packed 1-roll + min", build_packed())]
    if os.environ.get("ISO_I16"):
        # i16 rolls are NOT supported by Mosaic ("Rotate with non-32-bit
        # data"); kept behind a flag for re-testing on newer toolchains.
        variants += [
            ("i16 tables", build(_kern_i16, i16=True)),
            ("i16 + row min/argmin", build(_kern_i16min, i16=True, with_min=True)),
        ]
    if os.environ.get("ISO_MXU"):
        # MXU A/B (VERDICT r3 directive 8): same block via XLA slices vs
        # impulse-conv vs Toeplitz-matmul contractions.
        variants += [
            ("xla slice block", build_xla("slice")),
            ("xla mxu-conv block", build_xla("conv")),
            ("xla mxu-toeplitz block", build_xla("toeplitz")),
        ]
    print(f"n={N} P={P} A={A} K={K}", flush=True)
    for name, fn in variants:
        wall, _ = timeit(fn, states.rc, states.dc, states.ac, c, r, rem, cur, ks)
        print(
            f"{name:24s} {wall * 1000:8.1f} ms / {K} iters = "
            f"{1000 * wall / K:6.2f} ms/iter",
            flush=True,
        )

    if os.environ.get("ISO_PACKED"):
        # correctness spot-check of the packed variant vs base (single lane);
        # the loop's accumulated min is a cheap full-block equality probe.
        f_base = build(_kern_base)
        f_packed = build_packed()
        one = lambda x: x[:1]
        args = (one(states.rc), one(states.dc), one(states.ac), one(c), one(r),
                one(rem), one(cur), one(ks))
        a0, a1 = _force(f_base(*args)), _force(f_packed(*args))
        print(
            "packed-vs-f32 accumulated-min delta: "
            f"{abs(float(a0[0]) - float(a1[0]))}", flush=True,
        )


if __name__ == "__main__":
    main()
