"""Pallas record assembly for the binner (transpose + re-anchor fusion).

The binner's post-sort stage must turn the gathered per-pair template rows
(pair-major, one 64-wide row gather — the fast gather shape on TPU) into
field-major record streams (records on lanes) re-anchored at each pair's
tile origin.  Done in XLA this costs a full-footprint (P, 64) -> (64, P)
transpose plus ~30 column extractions (measured together ~34 ms of a ~45 ms
binner at 1.5M pairs on v5e) because XLA materializes the relayout and the
assembly arithmetic as separate HBM passes.

This kernel fuses the whole thing into one streaming pass: each grid step
loads a (128, 64) block of gathered rows, transposes it once in VMEM
(a native Mosaic 2D transpose), runs the re-anchoring arithmetic on
(1, 128) field rows — exactly the integer/i64/f32 expressions of
binning.bin_triangles' XLA assembly, so records are bit-identical — and
writes the (RW, 128) / (FW, 128) record blocks straight to their final
field-major layout.  Traffic: one read of the gathered block + one write
of the records, ~2 ms at HBM bandwidth for 1.5M pairs.

Template column layout (must match binning._triangle_templates):
  int  0..2  A0..A2        3..5  B0..B2
       6..11 exact origin edge values as (hi, lo) i64 pairs
       12,13 dzdx_q, dzdy_q   14 zshift   15 tri_id
       16 zq0   17 x0f   18 y0f
  float (bitcast at column N_TI+j):
       0 gx   1 gy   2.. plane triples (p00, pdx, pdy) for b0, b1, invw,
       then each varying channel.

Capability parity: the reference's GPU performs this setup in fixed-function
hardware between vertex fetch and rasterization (configured at
/root/reference/src/main.cpp:1742-1789); on TPU it is an explicit kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import fixedpoint as fp
from .setup import depth_tile_anchor

N_TI = 19  # int template width (see binning._triangle_templates)


def _transpose_kernel(fusedT_ref, out_ref, *, w8: int, out_width: int, chunk: int):
    rows = []
    for j in range(chunk // 128):
        t = fusedT_ref[:, j * 128 : (j + 1) * 128].T  # (128, w8) Mosaic 2D transpose
        if out_width > w8:
            t = jnp.concatenate(
                [t, jnp.zeros((128, out_width - w8), jnp.int32)], axis=1
            )
        rows.append(t)
    out_ref[:] = jnp.concatenate(rows, axis=0)


def transpose_templates(fusedT, out_width: int, interpret: bool = False):
    """Field-major templates (W8, T) -> row-major gather layout (T_pad, out_width).

    The binner's row-major template matrix is built today by a
    jnp.stack(axis=-1) whose per-column lane-interleave costs a
    near-footprint HBM pass PER column (~12.7 ms at 1M tris x ~40 cols on
    v5e, tools/probe_binner3.py tmpl_cur).  Building field-major instead
    (stack(axis=0): each field is ONE contiguous row write) and doing the
    relayout as a tiled Pallas transpose turns ~40 passes into two
    (read + write at HBM bandwidth).  Pure data movement — the gathered
    rows are bit-identical to the stacked layout by construction.

    W8 (sublanes) must be a multiple of 8 and <= out_width (lanes are
    zero-padded up to out_width, mirroring the XLA path's jnp.pad to the
    gather-friendly width).  T is padded up to the chunk size; pad rows
    are zeros and are never gathered (t_slot < num_tris).
    """
    w8, t = fusedT.shape
    assert w8 % 8 == 0 and w8 <= out_width, (w8, out_width)
    chunk = 1024
    t_pad = -(-t // chunk) * chunk
    if t_pad != t:
        fusedT = jnp.pad(fusedT, ((0, 0), (0, t_pad - t)))
    kernel = functools.partial(
        _transpose_kernel, w8=w8, out_width=out_width, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid=(t_pad // chunk,),
        in_specs=[pl.BlockSpec((w8, chunk), lambda i: (0, i))],
        out_specs=pl.BlockSpec((chunk, out_width), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((t_pad, out_width), jnp.int32),
        interpret=interpret,
    )(fusedT)


def _assemble_kernel(
    scal_ref,  # (1,) int32: [total]
    fused_ref,  # (128, GW) int32 block of gathered template rows
    aux_ref,  # (2, 128) int32: per-pair tile-origin pixel (ox, oy)
    rec_ref,  # (RW, 128) int32 out
    frec_ref,  # (FW, 128) float32 out
    *,
    nch: int,
    msaa4: bool,
    rw: int,
    fw: int,
):
    total = scal_ref[0]
    blk = fused_ref[:]  # (128, GW)
    blkT = blk.T  # (GW, 128): field rows over this block's 128 pairs

    def ti_col(j):
        return blkT[j : j + 1, :]

    def tf_col(j):
        return jax.lax.bitcast_convert_type(blkT[N_TI + j : N_TI + j + 1, :], jnp.float32)

    i = pl.program_id(0)
    pair_idx = i * 128 + jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    invalid = pair_idx >= total

    ox = aux_ref[0:1, :]
    oy = aux_ref[1:2, :]
    scale = jnp.int32(fp.SUBPIXEL_SCALE)
    ox16 = ox * scale
    oy16 = oy * scale

    a_s = [ti_col(i_) for i_ in range(3)]
    b_s = [ti_col(3 + i_) for i_ in range(3)]
    eb = []
    for e_i in range(3):
        e64 = (ti_col(6 + 2 * e_i), ti_col(7 + 2 * e_i))
        stepped = fp.i64_add(
            fp.i64_add(e64, fp.i64_mul_i32(a_s[e_i], ox16)),
            fp.i64_mul_i32(b_s[e_i], oy16),
        )
        eb.append(fp.i64_clamp_to_i32(stepped, -fp.ANCHOR_CLAMP, fp.ANCHOR_CLAMP))

    dzx = ti_col(12)
    dzy = ti_col(13)
    zshift = ti_col(14)
    tid = ti_col(15)
    zq0 = ti_col(16)
    x0f = ti_col(17)
    y0f = ti_col(18)
    gx = tf_col(0)
    gy = tf_col(1)
    can_x = (ox // fp.DEPTH_TILE) * fp.DEPTH_TILE
    can_y = (oy // fp.DEPTH_TILE) * fp.DEPTH_TILE
    z_can = depth_tile_anchor(zq0, x0f, y0f, gx, gy, zshift, can_x, can_y)
    zo = z_can + dzx * (ox - can_x) + dzy * (oy - can_y)

    neg = jnp.int32(-(1 << 30))
    zero = jnp.zeros_like(tid)
    rec_rows = [jnp.where(invalid, neg, eb[e_i]) for e_i in range(3)]
    rec_rows += [jnp.where(invalid, 0, a_s[e_i] * scale) for e_i in range(3)]
    rec_rows += [jnp.where(invalid, 0, b_s[e_i] * scale) for e_i in range(3)]
    rec_rows += [zo, dzx, dzy, zshift, tid, zero, zero]
    if msaa4:
        rec_rows += [jnp.where(invalid, 0, a_s[e_i]) for e_i in range(3)]
        rec_rows += [jnp.where(invalid, 0, b_s[e_i]) for e_i in range(3)]
        rec_rows += [zero, zero]
    while len(rec_rows) < rw:
        rec_rows.append(zero)
    rec_ref[:] = jnp.concatenate(rec_rows, axis=0)

    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    frec_rows = []
    for p in range(3 + nch):
        p00 = tf_col(2 + 3 * p)
        pdx = tf_col(3 + 3 * p)
        pdy = tf_col(4 + 3 * p)
        frec_rows += [p00 + pdx * oxf + pdy * oyf, pdx, pdy]
    frec_rows.append(tid.astype(jnp.float32))  # ftid_col(nch)
    fzero = jnp.zeros_like(oxf)
    while len(frec_rows) < fw:
        frec_rows.append(fzero)
    frec_ref[:] = jnp.concatenate(frec_rows, axis=0)


def assemble_records(
    fused_sorted,  # (P, GW) int32: gathered template rows, pair-major
    ox,  # (P,) int32 per-pair tile-origin pixel x (global coords)
    oy,  # (P,) int32
    total,  # () int32 live-pair count
    *,
    nch: int,
    msaa4: bool,
    rw: int,
    fw: int,
    interpret: bool = False,
):
    """Field-major (records, frecords) from gathered template rows.

    P must be a multiple of 128 and already include the SEGMENT_ALIGN tail
    pad (tail slots get the impossible-edge invalid treatment, strictly
    safer than the zero pad of the XLA assembly).  Bit-identical to the
    XLA assembly in binning.bin_triangles: every expression is mirrored
    (the i64 edge stepping and depth anchoring are exact integer math; the
    plane re-anchor is the same single-rounding f32 expression).
    """
    P, GW = fused_sorted.shape
    assert P % 128 == 0
    aux = jnp.stack([ox, oy]).reshape(2, P)
    kernel = functools.partial(
        _assemble_kernel, nch=nch, msaa4=msaa4, rw=rw, fw=fw
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // 128,),
        in_specs=[
            pl.BlockSpec((128, GW), lambda i, s: (i, 0)),
            pl.BlockSpec((2, 128), lambda i, s: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((rw, 128), lambda i, s: (0, i)),
            pl.BlockSpec((fw, 128), lambda i, s: (0, i)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rw, P), jnp.int32),
            jax.ShapeDtypeStruct((fw, P), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.reshape(total, (1,)).astype(jnp.int32), fused_sorted, aux)
