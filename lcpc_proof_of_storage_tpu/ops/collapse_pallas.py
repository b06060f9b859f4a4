"""One-pass Pallas TPU kernel for the prover's collapse (v = t^T . M).

The collapse (lcpc-2d/src/lib.rs:1126-1154 collapse_columns) is the
dominant prove() cost once column opening is a fused gather: the XLA
limb dot (fields/limb.py LimbField.dot) materializes the exact 2L-limb
product for EVERY (row, col) pair — a (T, n_rows, n_per_row, 2L+1)
uint32 transient (4.4 GB at 2^25 ft255) built with L sequential
scatter-adds, i.e. ~16 HBM passes over a multi-GB array.  Measured on
hardware (scripts/r4_campaign.py proto_profile25_bd): 2.9 s of a 4.4 s
Brakedown 2^25 prove; 87 ms of a 189 ms Ligero 2^20 prove.

This kernel is the same shape as the Brakedown expander's one-pass
matvec (ops/expander_pallas.py): stream the coefficient matrix through
VMEM once, convolve each row's packed limb pairs against the tensor
scalar's limbs into a VMEM-resident raw-digit accumulator, and
carry-normalize + Barrett-reduce IN the kernel.  No HBM transient at
all: traffic = coeffs once (+ the packed relayout) and the (T,
n_per_row, L) output.

Digit bound: every accumulator digit receives < 2L terms < 2^16 per row,
so up to 2048 rows accumulate exactly in uint32 (matching the expander
kernel's K <= 2048 bound); larger matrices split into <= 2048-row chunks
whose canonical partials are added modularly at the XLA level.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import FieldSpec
from ..fields.limb import limb_field
from .expander_pallas import _barrett_rows

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

#: lane-tile width over the n_per_row axis
_TM = int(os.environ.get("LCPC_COLLAPSE_TM", "512"))
#: max rows accumulated raw in uint32 (see digit bound above)
_MAX_ROWS = 2048


def use_collapse_kernel(spec: FieldSpec) -> bool:
    """TPU backend + even L (packed pairs) + not opted out.  The 'mxu'
    mode is plain XLA (dot_general) and engages on ANY backend."""
    if os.environ.get("LCPC_COLLAPSE_KERNEL", "1") == "0":
        return False
    if spec.num_limbs16 % 2 != 0:
        return False
    if collapse_kernel_mode() == "mxu":
        return True
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend not in ("cpu",)


def use_natural_kernel() -> bool:
    """Natural-layout collapse kernel (round 5, default): reads the
    commitment's (rows, npr, L) coefficient matrix AS STORED — the
    (rows, Lp, npr) minor-axis relayout the packed kernel needs cost
    ~0.8 s on the FIRST proof of a Brakedown 2^25 commitment (r4
    VERDICT #1a); the in-kernel batched (8, TM, L) -> (8, L, TM)
    transpose replaces it at VMEM speed."""
    return os.environ.get("LCPC_COLLAPSE_NATURAL", "1") != "0"


def collapse_kernel_mode() -> str:
    """Prove-side collapse implementation: 'natural' (default, VPU Pallas
    kernel on the stored layout), 'packed' (VPU kernel + per-commitment
    relayout cache), or 'mxu' (int8 MXU matmul, ops/collapse_mxu.py).
    LCPC_COLLAPSE_KERNEL overrides; LCPC_COLLAPSE_NATURAL=0 is the legacy
    packed switch."""
    m = os.environ.get("LCPC_COLLAPSE_KERNEL", "").strip().lower()
    if m in ("natural", "packed", "mxu"):
        return m
    return "natural" if use_natural_kernel() else "packed"


def _collapse_kernel(spec: FieldSpec, Rg: int, rg: int):
    """Grid cell: one (TM-lane) tile of n_per_row for one tensor t.

    tv_ref: (1, Rg, rg*L) SMEM — tensor limbs as scalars (row-padded).
    xg_ref: (Rg, rg*Lp, TM) VMEM — packed coefficient rows for this tile.
    out_ref: (1, L, TM) — canonical limbs of sum_i t[i]*C[i, tile].
    """
    L = spec.num_limbs16
    Lp = L // 2
    A = 2 * L + 2

    def kernel(tv_ref, xg_ref, out_ref):
        TM = xg_ref.shape[-1]

        def body(g, acc):
            ap = xg_ref[g]                       # (rg*Lp, TM) packed pairs
            for q in range(rg):
                v_rows = []
                for j in range(Lp):
                    r = q * Lp + j
                    v_rows.append(ap[r : r + 1] & MASK16)
                    v_rows.append(ap[r : r + 1] >> 16)
                v = jnp.concatenate(v_rows, axis=0)          # (L, TM) limbs
                for i in range(L):
                    ti = tv_ref[0, g, q * L + i]             # scalar < 2^16
                    prod = ti * v                            # (L, TM) exact
                    lo = prod & MASK16
                    hi = prod >> 16
                    parts = []
                    if i:
                        parts.append(jnp.zeros((i, TM), U32))
                    parts.append(lo)
                    if A - i - L:
                        parts.append(jnp.zeros((A - i - L, TM), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
                    parts = [jnp.zeros((i + 1, TM), U32), hi]
                    if A - i - 1 - L:
                        parts.append(jnp.zeros((A - i - 1 - L, TM), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
            return acc

        acc = jax.lax.fori_loop(0, Rg, body, jnp.zeros((A, TM), U32))
        out_ref[0] = _barrett_rows(acc, spec)

    return kernel


@functools.lru_cache(maxsize=None)
def _collapse_call(spec: FieldSpec, Rg: int, rg: int, T: int, npr_pad: int,
                   TM: int):
    L = spec.num_limbs16
    Lp = L // 2
    kernel = _collapse_kernel(spec, Rg, rg)
    # grid (tile, t): t innermost so the coeff block (a function of the
    # tile index only) is revisited, not refetched, across the T tensors
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, L, npr_pad), jnp.uint32),
        grid=(npr_pad // TM, T),
        in_specs=[
            pl.BlockSpec((1, Rg, rg * L), lambda j, t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Rg, rg * Lp, TM), lambda j, t: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, TM), lambda j, t: (t, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )


def _collapse_chunk(coeffs: jnp.ndarray, t_limbs: jnp.ndarray,
                    spec: FieldSpec, packed=None) -> jnp.ndarray:
    """(rows, npr, L) x (T, rows, L) -> (T, npr, L), rows <= _MAX_ROWS."""
    L = spec.num_limbs16
    Lp = L // 2
    rows, npr, _ = coeffs.shape
    T = t_limbs.shape[0]
    rg = max(1, 8 // Lp)                 # rows per block group (8 sublanes)
    Rg = -(-rows // rg)
    TM = min(_TM, 1 << max(7, (npr - 1).bit_length()))
    npr_pad = -(-npr // TM) * TM

    if packed is None:
        packed = pack_coeffs_chunk(coeffs, spec)
    cpk = packed

    tv = jnp.pad(t_limbs.astype(U32), ((0, 0), (0, Rg * rg - rows), (0, 0)))
    tv = tv.reshape(T, Rg, rg * L)

    out = _collapse_call(spec, Rg, rg, T, npr_pad, TM)(tv, cpk)
    return jnp.transpose(out, (0, 2, 1))[:, :npr, :]     # (T, npr, L)


def pack_coeffs_chunk(coeffs: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Kernel operand layout for one <=_MAX_ROWS chunk: packed limb pairs,
    npr-minor ((Rg, rg*Lp, npr_pad)).  The (rows, npr, Lp) -> (rows, Lp,
    npr) minor-axis transpose is the dominant cost of a one-shot collapse
    (~0.8 s of the measured 0.84 s at Brakedown 2^25) — prove() caches
    this result on the commitment so repeated proofs skip it."""
    L = spec.num_limbs16
    Lp = L // 2
    rows, npr, _ = coeffs.shape
    rg = max(1, 8 // Lp)
    Rg = -(-rows // rg)
    TM = min(_TM, 1 << max(7, (npr - 1).bit_length()))
    npr_pad = -(-npr // TM) * TM
    c = coeffs.astype(U32)
    cpk = c[..., 0::2] | (c[..., 1::2] << 16)            # (rows, npr, Lp)
    cpk = jnp.transpose(cpk, (0, 2, 1))                  # (rows, Lp, npr)
    cpk = jnp.pad(cpk, ((0, Rg * rg - rows), (0, 0), (0, npr_pad - npr)))
    return cpk.reshape(Rg, rg * Lp, npr_pad)


def pack_coeffs(coeffs: jnp.ndarray, spec: FieldSpec) -> list:
    """Per-chunk kernel operands for the whole matrix (cacheable)."""
    return [pack_coeffs_chunk(coeffs[r0 : r0 + _MAX_ROWS], spec)
            for r0 in range(0, coeffs.shape[0], _MAX_ROWS)]


def _natural_kernel(spec: FieldSpec, in_dtype):
    """Grid cell: one npr lane tile for one (chunk, tensor) pair, reading
    the NATURAL (rows, npr, L) coefficient layout.

    ng_ref: (1, C) SMEM, whole array in one block (Mosaic only accepts
    SMEM blocks whose trailing dims are tile-multiples or span the whole
    array) — per-chunk live 8-row group counts, indexed by the chunk
    grid coordinate in-kernel.
    tv_ref: (T, C, CB8*L) SMEM, whole array in one block, indexed by the
    (chunk, tensor) grid coordinates in-kernel.  FLAT trailing scalar
    vector: a trailing (CB8, L) block gets lane-padded 16->128 words by
    the SMEM allocator, which blows the 1 MB SMEM budget at CB8 = 2048
    with double buffering (found by the r5 hardware validation); and a
    per-(t, c) sub-block trips the rank-2 tile-divisibility rule, so the
    whole array rides in one un-double-buffered block (caller guards the
    total size).
    tv_ref: (1, 1, CB8, L) SMEM — tensor limbs as scalars (zero-padded).
    xg_ref: (CB8, TM, L) VMEM — coefficient rows for this tile, as stored.
    out_ref: (1, 1, L, TM) — canonical limbs of sum_i t[i]*C[i, tile].

    Rows past the live count are never read (ng bound) or multiply a zero
    tensor scalar; npr lanes past the true width accumulate garbage that
    the caller slices off.  Accumulator bound: <= 2048 rows per chunk
    (same K*2L*2^16 < 2^32 digit bound as the packed kernel)."""
    L = spec.num_limbs16
    A = 2 * L + 2

    def kernel(ng_ref, tv_ref, xg_ref, out_ref):
        TM = xg_ref.shape[1]

        def body(g, acc):
            x8 = xg_ref[pl.ds(g * 8, 8)]             # (8, TM, L) as stored
            if x8.dtype != jnp.uint32:
                x8 = x8.astype(jnp.uint32)
            xt = jnp.transpose(x8, (0, 2, 1))        # (8, L, TM) in VMEM
            for r in range(8):
                v = xt[r]                            # (L, TM) limb rows
                for i in range(L):
                    ti = tv_ref[pl.program_id(2), pl.program_id(0),
                                (g * 8 + r) * L + i]        # scalar < 2^16
                    prod = ti * v                    # (L, TM) exact
                    lo = prod & MASK16
                    hi = prod >> 16
                    parts = []
                    if i:
                        parts.append(jnp.zeros((i, TM), U32))
                    parts.append(lo)
                    if A - i - L:
                        parts.append(jnp.zeros((A - i - L, TM), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
                    parts = [jnp.zeros((i + 1, TM), U32), hi]
                    if A - i - 1 - L:
                        parts.append(jnp.zeros((A - i - 1 - L, TM), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
            return acc

        acc = jax.lax.fori_loop(0, ng_ref[0, pl.program_id(0)], body,
                                jnp.zeros((A, TM), U32))
        out_ref[0, 0] = _barrett_rows(acc, spec)

    return kernel


@functools.lru_cache(maxsize=None)
def _natural_call(spec: FieldSpec, C: int, CB8: int, T: int, npr_pad: int,
                  TM: int, in_dtype):
    L = spec.num_limbs16
    kernel = _natural_kernel(spec, in_dtype)
    # grid (chunk, tile, t): t innermost so the coeff block (a function of
    # (c, j) only) is revisited, not refetched, across the T tensors
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, T, L, npr_pad), jnp.uint32),
        grid=(C, npr_pad // TM, T),
        in_specs=[
            pl.BlockSpec((1, C), lambda c, j, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, C, CB8 * L), lambda c, j, t: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB8, TM, L), lambda c, j, t: (c, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, L, TM), lambda c, j, t: (c, t, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )


#: lane-tile width for the natural-layout kernel (unpacked operand is 2x
#: the packed bytes, so half the packed kernel's _TM keeps VMEM equal)
_TM_NAT = int(os.environ.get("LCPC_COLLAPSE_TM_NAT", "256"))


def collapse_tensors_natural(coeffs: jnp.ndarray, t_limbs: jnp.ndarray,
                             spec: FieldSpec) -> jnp.ndarray:
    """collapse_tensors reading the natural (rows, npr, L) layout — no
    packed relayout, no operand cache, uint16 matrices stay uint16 on the
    wire into VMEM.  Jittable; >2048-row matrices become chunk partials
    summed mod p at the XLA level."""
    lf = limb_field(spec)
    L = spec.num_limbs16
    rows, npr, _ = coeffs.shape
    T = t_limbs.shape[0]
    CB8 = -(-min(rows, _MAX_ROWS) // 8) * 8
    C = -(-rows // CB8)
    if T * C * CB8 * L * 4 > (768 << 10):
        # whole t-vector rides in SMEM (one un-buffered block): past
        # ~768 KB fall back to the packed kernel, which tiles its
        # t-operand through VMEM instead
        return collapse_tensors(coeffs, t_limbs, spec)
    TM = min(_TM_NAT, 1 << max(7, (npr - 1).bit_length()))
    npr_pad = -(-npr // TM) * TM

    # per-chunk live 8-row group counts + zero-padded tensor scalars
    ng_list = [max(0, -(-(min(rows - c * CB8, CB8)) // 8)) for c in range(C)]
    ng = jnp.asarray(ng_list, jnp.int32).reshape(1, C)
    tv = jnp.pad(t_limbs.astype(U32), ((0, 0), (0, C * CB8 - rows), (0, 0)))
    tv = tv.reshape(T, C, CB8 * L)

    out = _natural_call(spec, C, CB8, T, npr_pad, TM,
                        jnp.dtype(coeffs.dtype).name)(ng, tv, coeffs)
    # chunk partials sum mod p on the trailing-limb layout
    acc = jnp.transpose(out[0], (0, 2, 1))[:, :npr, :]   # (T, npr, L)
    for c in range(1, C):
        acc = lf.add(acc, jnp.transpose(out[c], (0, 2, 1))[:, :npr, :])
    return acc


def collapse_tensors(coeffs: jnp.ndarray, t_limbs: jnp.ndarray,
                     spec: FieldSpec, packed: list | None = None) -> jnp.ndarray:
    """v_t = sum_i t_limbs[t, i] * coeffs[i] mod p for each tensor t.

    coeffs: (n_rows, n_per_row, L) uint16/uint32 canonical limbs (device).
    t_limbs: (T, n_rows, L) uint32 canonical limbs.
    packed: optional pack_coeffs(coeffs) result (skips the relayout).
    Returns (T, n_per_row, L) canonical uint32 limbs.  Jittable; rows
    beyond _MAX_ROWS split into chunks whose partials are added mod p.
    """
    lf = limb_field(spec)
    rows = coeffs.shape[0]
    if rows <= _MAX_ROWS:
        return _collapse_chunk(coeffs, t_limbs, spec,
                               packed[0] if packed else None)
    acc = None
    for i, r0 in enumerate(range(0, rows, _MAX_ROWS)):
        r1 = min(r0 + _MAX_ROWS, rows)
        part = _collapse_chunk(coeffs[r0:r1], t_limbs[:, r0:r1], spec,
                               packed[i] if packed else None)
        acc = part if acc is None else lf.add(acc, part)
    return acc
