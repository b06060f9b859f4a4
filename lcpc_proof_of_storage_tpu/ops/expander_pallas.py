"""Pallas TPU kernel for the Brakedown expander mat-vec.

The XLA gather_matvec (ops/expander.py) re-reads/writes the wide
accumulator and ~10 intermediate arrays per gather slot — memory-bound.
This kernel processes G gather slots per VMEM pass: the gathered operands
(prepared by one XLA gather per group, limb-major) are convolved against
the per-slot value limbs entirely in VMEM, accumulating RAW convolution
digits (bounded: K slots * 2L terms * 2^16 < 2^28 << 2^32), with the single
Barrett reduction done once at the end.

acc layout: (b, 2L+2, m) limb-major; kernel accumulates in place via
input/output aliasing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import FieldSpec
from ..fields.limb import limb_field

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

_GROUP = 8          # gather slots fused per kernel pass
_TILE = 2048        # output-row lanes per kernel instance


def _group_kernel(spec: FieldSpec, G: int):
    L = spec.num_limbs16
    A = 2 * L + 2

    def kernel(xg_ref, vg_ref, acc_ref, out_ref):
        xg = xg_ref[0]                   # (G*L, T)
        vg = vg_ref[:]                   # (G*L, T)
        acc = acc_ref[0]                 # (A, T)
        T = xg.shape[1]
        for g in range(G):
            a = xg[g * L : (g + 1) * L]
            v = vg[g * L : (g + 1) * L]
            for i in range(L):
                prod = a[i : i + 1] * v              # (L, T) exact
                lo = prod & MASK16
                hi = prod >> 16
                pre = i
                post = A - i - L
                parts = []
                if pre:
                    parts.append(jnp.zeros((pre, T), U32))
                parts.append(lo)
                if post:
                    parts.append(jnp.zeros((post, T), U32))
                acc = acc + jnp.concatenate(parts, axis=0)
                parts = [jnp.zeros((pre + 1, T), U32), hi]
                if post - 1:
                    parts.append(jnp.zeros((post - 1, T), U32))
                acc = acc + jnp.concatenate(parts, axis=0)
        out_ref[0] = acc

    return kernel


def _group_kernel_packed(spec: FieldSpec, G: int):
    """Packed-operand variant: xg/vg arrive with limb PAIRS packed into one
    uint32 (lo | hi<<16) — half the gather traffic and half the VMEM input
    bytes per tile (the matvec is gather/bandwidth-bound).  Unpacking is two
    VPU ops per limb row.  Bit-identical accumulation to _group_kernel."""
    L = spec.num_limbs16
    Lp = L // 2
    A = 2 * L + 2

    def kernel(xg_ref, vg_ref, acc_ref, out_ref):
        xg = xg_ref[0]                   # (G*Lp, T) packed
        vg = vg_ref[:]                   # (G*Lp, T) packed
        acc = acc_ref[0]                 # (A, T)
        T = xg.shape[1]
        for g in range(G):
            ap = xg[g * Lp : (g + 1) * Lp]
            vp = vg[g * Lp : (g + 1) * Lp]
            a_rows = []
            v_rows = []
            for j in range(Lp):
                a_rows.append(ap[j : j + 1] & MASK16)
                a_rows.append(ap[j : j + 1] >> 16)
                v_rows.append(vp[j : j + 1] & MASK16)
                v_rows.append(vp[j : j + 1] >> 16)
            v = jnp.concatenate(v_rows, axis=0)          # (L, T)
            for i in range(L):
                prod = a_rows[i] * v                     # (L, T) exact
                lo = prod & MASK16
                hi = prod >> 16
                pre = i
                post = A - i - L
                parts = []
                if pre:
                    parts.append(jnp.zeros((pre, T), U32))
                parts.append(lo)
                if post:
                    parts.append(jnp.zeros((post, T), U32))
                acc = acc + jnp.concatenate(parts, axis=0)
                parts = [jnp.zeros((pre + 1, T), U32), hi]
                if post - 1:
                    parts.append(jnp.zeros((post - 1, T), U32))
                acc = acc + jnp.concatenate(parts, axis=0)
        out_ref[0] = acc

    return kernel


@functools.lru_cache(maxsize=None)
def _group_call_packed(spec: FieldSpec, G: int, b: int, m: int):
    L = spec.num_limbs16
    Lp = L // 2
    A = 2 * L + 2
    T = min(_TILE, m)
    assert m % T == 0
    return pl.pallas_call(
        _group_kernel_packed(spec, G),
        out_shape=jax.ShapeDtypeStruct((b, A, m), jnp.uint32),
        grid=(b, m // T),
        in_specs=[
            pl.BlockSpec((1, G * Lp, T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * Lp, T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
    )


@functools.lru_cache(maxsize=None)
def _group_call(spec: FieldSpec, G: int, b: int, m: int):
    L = spec.num_limbs16
    A = 2 * L + 2
    T = min(_TILE, m)
    assert m % T == 0
    return pl.pallas_call(
        _group_kernel(spec, G),
        out_shape=jax.ShapeDtypeStruct((b, A, m), jnp.uint32),
        grid=(b, m // T),
        in_specs=[
            pl.BlockSpec((1, G * L, T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G * L, T), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, T), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        input_output_aliases={2: 0},
    )


def _use_packed(spec: FieldSpec) -> bool:
    import os
    return (spec.num_limbs16 % 2 == 0
            and os.environ.get("LCPC_EXPANDER_PACKED", "1") != "0")


def gather_matvec_fused(gm, x: jnp.ndarray, spec: FieldSpec,
                        tables=None) -> jnp.ndarray:
    """y = A x for batched x (b, cols, L) -> (b, rows, L), fused path.

    gm: ops.expander.GatherMat (uses its padded-to-tile variants built by
    _fused_tables).  `tables` = (idx_g, vals_g) device arrays threaded as
    jit arguments (packed layout when _use_packed — build them with
    fused_device_tables); None embeds the numpy tables as constants.

    Packed mode (default, even-L fields): limb pairs of both the gathered
    operand and the value tables ride as one uint32 (lo | hi<<16) — the
    matvec is gather/bandwidth-bound, so halving the bytes per row is the
    dominant lever.  Unpack is 2 VPU ops per limb row inside the kernel."""
    lf = limb_field(spec)
    b = x.shape[0]
    L = lf.L
    A = 2 * L + 2
    packed = _use_packed(spec)
    if packed:
        idx_np, vals_np, m_pad, Kg, G = _fused_tables_packed(gm, spec)
    else:
        idx_np, vals_np, m_pad, Kg, G = _fused_tables(gm, spec)
    if tables is not None:
        idx_g, vals_g = tables
        assert vals_g.shape[1] == G * (L // 2 if packed else L), \
            "tables layout does not match LCPC_EXPANDER_PACKED mode"
    else:
        idx_g = jnp.asarray(idx_np)
        vals_g = jnp.asarray(vals_np)

    # gather along the LEADING axis so every index pulls one contiguous
    # (b*L)-word row — lane-strided gathers run ~3x slower on TPU (measured
    # 224ms vs 77ms on the 2^21 ft255 postcode-0 matvec)
    if packed:
        Lp = L // 2
        x3 = jnp.transpose(x, (1, 0, 2)).reshape(gm.cols, b, Lp, 2)
        x2 = (x3[..., 0] | (x3[..., 1] << 16)).reshape(gm.cols, b * Lp)
        call = _group_call_packed(spec, G, b, m_pad)
        Lrow = Lp
    else:
        x2 = jnp.transpose(x, (1, 0, 2)).reshape(gm.cols, b * L)
        call = _group_call(spec, G, b, m_pad)
        Lrow = L
    acc = jnp.zeros((b, A, m_pad), U32)

    def body(g, acc):
        idx = jax.lax.dynamic_index_in_dim(idx_g, g, 0, keepdims=False)
        vg = jax.lax.dynamic_index_in_dim(vals_g, g, 0, keepdims=False)
        gathered = jnp.take(x2, idx.reshape(-1), axis=0)   # (G*m, b*Lrow)
        gathered = gathered.reshape(G, m_pad, b, Lrow)
        gathered = jnp.transpose(gathered, (2, 0, 3, 1)).reshape(
            b, G * Lrow, m_pad)
        return call(gathered, vg, acc)

    acc = jax.lax.fori_loop(0, Kg, body, acc)
    # single Barrett reduction of the raw digit sums
    accT = jnp.transpose(acc, (0, 2, 1))                   # (b, m, A)
    y = lf.barrett_reduce(lf._carry_norm(accT, A))
    return y[:, : gm.rows, :]


def _fused_tables_packed(gm, spec: FieldSpec):
    """_fused_tables with the value limb pairs packed (lo | hi<<16):
    (Kg, G*L/2, m_pad).  Cached separately on the GatherMat."""
    cached = getattr(gm, "_fused_tables_packed", None)
    if cached is not None:
        return cached
    idx_g, vals_g, m_pad, Kg, G = _fused_tables(gm, spec)
    L = spec.num_limbs16
    Lp = L // 2
    v = vals_g.reshape(Kg, G, L, m_pad)
    vp = (v[:, :, 0::2, :] | (v[:, :, 1::2, :] << 16))       # (Kg, G, Lp, m)
    vals_p = np.ascontiguousarray(vp.reshape(Kg, G * Lp, m_pad))
    gm._fused_tables_packed = (idx_g, vals_p, m_pad, Kg, G)
    return gm._fused_tables_packed


def fused_device_tables(gm, spec: FieldSpec):
    """(idx, vals) numpy tables in the layout gather_matvec_fused expects
    for the current packing mode — use for device_operands()."""
    if _use_packed(spec):
        idx_g, vals_p, _, _, _ = _fused_tables_packed(gm, spec)
        return idx_g, vals_p
    idx_g, vals_g, _, _, _ = _fused_tables(gm, spec)
    return idx_g, vals_g


def _fused_tables(gm, spec: FieldSpec):
    """Group/pad the GatherMat for the fused kernel (cached on the object)."""
    cached = getattr(gm, "_fused_tables", None)
    if cached is not None:
        return cached
    L = spec.num_limbs16
    K, m = gm.idx.shape
    G = _GROUP
    T = min(_TILE, 1 << max(8, (m - 1).bit_length()))
    m_pad = -(-m // T) * T
    Kg = -(-K // G)
    idx = np.zeros((Kg * G, m_pad), np.int32)
    vals = np.zeros((Kg * G, m_pad, L), np.uint32)
    idx[:K, :m] = np.asarray(gm.idx)
    vals[:K, :m] = np.asarray(gm.vals)
    idx_g = idx.reshape(Kg, G, m_pad)
    # (Kg, G*L, m_pad) limb-major value blocks; cached as NUMPY so a first
    # call inside a jit trace can't leak tracers
    vals_g = np.ascontiguousarray(
        vals.reshape(Kg, G, m_pad, L).transpose(0, 1, 3, 2)
            .reshape(Kg, G * L, m_pad))
    gm._fused_tables = (idx_g, vals_g, m_pad, Kg, G)
    return gm._fused_tables
