"""Pallas TPU kernels for the Brakedown expander mat-vec.

The XLA gather_matvec (ops/expander.py) re-reads/writes the wide
accumulator and ~10 intermediate arrays per gather slot — memory-bound.
Two generations of fused kernels fix that:

* **Group kernel** (round 2): G gather slots per VMEM pass; the (b, 2L+2, m)
  raw-digit accumulator rides HBM between the ceil(K/G) passes via
  input/output aliasing, and the final carry+Barrett runs as XLA ops.
* **One-pass kernel** (round 4, default): ALL K slots in a single pallas
  call — an in-kernel fori_loop convolves each slot's packed operands into
  a VMEM-resident accumulator (digit bound: K slots * 2L terms * 2^16
  < 2^32 for K <= 2048), then carry-normalizes and Barrett-reduces IN the
  kernel, writing canonical (L, T) limbs.  This removes the Kg aliased
  accumulator round-trips AND the XLA carry/Barrett passes over the
  (b, m, 2L+2) array — the two largest HBM consumers after the gather
  itself.  Large levels chunk the gather over the output-row axis so the
  (b, K, Lp, m) gathered transient stays under ~LCPC_EXPANDER_CHUNK_BYTES.

Replaces sprs CSC mat-vec (lcpc-brakedown-pc/src/encode.rs:46-90).
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

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

_GROUP = 8          # (group kernel) gather slots fused per kernel pass
_TILE = 2048        # (group kernel) output-row lanes per kernel instance


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
    return (spec.num_limbs16 % 2 == 0
            and os.environ.get("LCPC_EXPANDER_PACKED", "1") != "0")


def _onepass_max_slots(spec: FieldSpec) -> int:
    """Raw-digit uint32 accumulator bound: K * 2L * 2^16 < 2^32."""
    return (1 << 15) // spec.num_limbs16


def _use_onepass(spec: FieldSpec, n_slots: int | None = None) -> bool:
    """One-pass kernel (default): packed operands required (even L), and
    the slot count must respect the uint32 accumulator bound — beyond it
    the group kernel (which carries per group-pass) is used instead."""
    if n_slots is not None:
        kg = max(1, 16 // spec.num_limbs16)     # slot-group padding
        if -(-n_slots // kg) * kg > _onepass_max_slots(spec):
            return False
    return (_use_packed(spec)
            and os.environ.get("LCPC_EXPANDER_ONEPASS", "1") != "0")


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
    if _use_onepass(spec, gm.idx.shape[0]):
        return gather_matvec_onepass(gm, x, spec, tables=tables)
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
    for the current packing/one-pass mode — use for device_operands()."""
    if _use_onepass(spec, gm.idx.shape[0]):
        idx_o, vals_o, _, _, _ = _onepass_tables(gm, spec)
        return idx_o, vals_o
    if _use_packed(spec):
        idx_g, vals_p, _, _, _ = _fused_tables_packed(gm, spec)
        return idx_g, vals_p
    idx_g, vals_g, _, _, _ = _fused_tables(gm, spec)
    return idx_g, vals_g


# ---------------------------------------------------------------------------
# one-pass kernel (round 4)
# ---------------------------------------------------------------------------

#: lane-tile width over the output-row axis (one-pass kernel)
_TM_OP = int(os.environ.get("LCPC_EXPANDER_TM", "512"))


@functools.lru_cache(maxsize=None)
def _barrett_consts_np(spec: FieldSpec):
    """(mu, p) 16-bit limb constants for reducing A = 2L+2 limb values."""
    L = spec.num_limbs16
    A = 2 * L + 2
    p = spec.modulus
    mu = (1 << (16 * A)) // p
    mu_len = max(1, (mu.bit_length() + 15) // 16)
    mu_np = np.array([(mu >> (16 * i)) & 0xFFFF for i in range(mu_len)],
                     np.uint32)
    p_np = np.array([(p >> (16 * i)) & 0xFFFF for i in range(L)], np.uint32)
    return mu_np, p_np, mu_len


def _barrett_rows(digits: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """(2L+2, T) raw base-2^16 digits (each < 2^32) -> (L, T) canonical
    limbs.  Same truncated-Barrett math as fields/limb.py barrett_reduce
    at width m = 2L+2 (q1 = z[L-1:], r < 4p, three conditional subtracts),
    expressed on leading-limb-axis blocks via the ntt_pallas3 primitives."""
    from .ntt_pallas3 import _ca, _const3, _cp, _csp, _sb
    L = spec.num_limbs16
    A = 2 * L + 2
    tail = digits.shape[1:]
    mu_np, p_np, mu_len = _barrett_consts_np(spec)
    z = _cp(digits, A)
    q1 = z[L - 1 :]                                   # (L+3, T)
    q_wide = _cp(_ca(q1, _const3(mu_np, tail), L + 3 + mu_len + 1),
                 L + 3 + mu_len)
    q = q_wide[A - L + 1 :]                           # floor(q1*mu/b^(L+3))
    qp = _cp(_ca(q, _const3(p_np, tail), L + 2), L + 1)
    r, _ = _sb(z[: L + 1], qp)
    p_pad = _const3(p_np, tail, rows=L + 1)
    r = _csp(r, p_pad)
    r = _csp(r, p_pad)
    r = _csp(r, p_pad)
    return r[:L]


def _onepass_kernel(spec: FieldSpec, Kg2: int, kg: int):
    """All K slots in one VMEM pass: fori_loop over Kg2 slot groups (kg
    slots each, packed pairs), raw-digit accumulate (bound: K * 2L * 2^16
    < 2^32 for K <= 2048), then in-kernel carry + Barrett."""
    L = spec.num_limbs16
    Lp = L // 2
    A = 2 * L + 2

    def kernel(xg_ref, vg_ref, out_ref):
        T = xg_ref.shape[3]

        def body(g, acc):
            ap = xg_ref[0, g]                  # (kg*Lp, T) packed operands
            vp = vg_ref[g]                     # (kg*Lp, T) packed values
            for q in range(kg):
                a_rows, v_rows = [], []
                for j in range(Lp):
                    r = q * Lp + j
                    a_rows.append(ap[r : r + 1] & MASK16)
                    a_rows.append(ap[r : r + 1] >> 16)
                    v_rows.append(vp[r : r + 1] & MASK16)
                    v_rows.append(vp[r : r + 1] >> 16)
                v = jnp.concatenate(v_rows, axis=0)          # (L, T)
                for i in range(L):
                    prod = a_rows[i] * v                     # (L, T) exact
                    lo = prod & MASK16
                    hi = prod >> 16
                    parts = []
                    if i:
                        parts.append(jnp.zeros((i, T), U32))
                    parts.append(lo)
                    if A - i - L:
                        parts.append(jnp.zeros((A - i - L, T), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
                    parts = [jnp.zeros((i + 1, T), U32), hi]
                    if A - i - 1 - L:
                        parts.append(jnp.zeros((A - i - 1 - L, T), U32))
                    acc = acc + jnp.concatenate(parts, axis=0)
            return acc

        acc = jax.lax.fori_loop(0, Kg2, body, jnp.zeros((A, T), U32))
        out_ref[0] = _barrett_rows(acc, spec)

    return kernel


@functools.lru_cache(maxsize=None)
def _onepass_call(spec: FieldSpec, Kg2: int, kg: int, b: int, mc: int,
                  TM: int):
    L = spec.num_limbs16
    Lp = L // 2
    kernel = _onepass_kernel(spec, Kg2, kg)
    # grid (tile, b): b innermost so the vals block (a function of the tile
    # index only) is revisited, not refetched, across the batch
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, L, mc), jnp.uint32),
        grid=(mc // TM, b),
        in_specs=[
            pl.BlockSpec((1, Kg2, kg * Lp, TM), lambda j, i: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kg2, kg * Lp, TM), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, TM), lambda j, i: (i, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )


def _onepass_tables(gm, spec: FieldSpec):
    """Slot-group/pad the GatherMat for the one-pass kernel (cached):
    idx (K_pad, m_pad) int32; vals (Kg2, kg*Lp, m_pad) packed pairs.
    kg groups ceil(8/Lp) slots so every group block fills an 8-sublane
    uint32 tile even for small-L fields (ft63: Lp=2, kg=4)."""
    cached = getattr(gm, "_onepass_tables_c", None)
    if cached is not None:
        return cached
    L = spec.num_limbs16
    Lp = L // 2
    kg = max(1, 8 // Lp)
    K, m = gm.idx.shape
    Kg2 = -(-K // kg)
    K_pad = Kg2 * kg
    TM = min(_TM_OP, 1 << max(7, (m - 1).bit_length()))
    m_pad = -(-m // TM) * TM
    idx = np.zeros((K_pad, m_pad), np.int32)
    vals = np.zeros((K_pad, m_pad, L), np.uint32)
    idx[:K, :m] = np.asarray(gm.idx)
    vals[:K, :m] = np.asarray(gm.vals)
    vp = vals.reshape(K_pad, m_pad, Lp, 2)
    packed = vp[..., 0] | (vp[..., 1] << 16)              # (K_pad, m_pad, Lp)
    vals_o = np.ascontiguousarray(
        packed.transpose(0, 2, 1).reshape(Kg2, kg * Lp, m_pad))
    gm._onepass_tables_c = (idx, vals_o, m_pad, Kg2, kg)
    return gm._onepass_tables_c


def gather_matvec_onepass(gm, x: jnp.ndarray, spec: FieldSpec,
                          tables=None) -> jnp.ndarray:
    """y = A x for batched x (b, cols, L) -> (b, rows, L), one-pass path.

    One XLA gather + ONE pallas call per output-row chunk; the accumulator
    never touches HBM and the reduction happens in-kernel.  Large levels
    chunk the output rows so the gathered (b, K, Lp, mc) transient stays
    under LCPC_EXPANDER_CHUNK_BYTES (default 1.5e9); the tail chunk relies
    on lax.dynamic_slice/_update_slice start clamping, which recomputes an
    overlapping window with identical values."""
    lf = limb_field(spec)
    b = x.shape[0]
    L = lf.L
    Lp = L // 2
    idx_np, vals_np, m_pad, Kg2, kg = _onepass_tables(gm, spec)
    K_pad = Kg2 * kg
    assert K_pad <= _onepass_max_slots(spec), (
        f"one-pass expander kernel: {K_pad} slots overflows the uint32 "
        f"raw-digit accumulator (max {_onepass_max_slots(spec)}); "
        f"gather_matvec_fused routes such matrices to the group kernel")
    if tables is not None:
        idx_t, vals_t = tables
        assert vals_t.shape[0] == Kg2 and vals_t.shape[1] == kg * Lp, \
            "tables layout does not match the one-pass kernel mode"
    else:
        idx_t = jnp.asarray(idx_np)
        vals_t = jnp.asarray(vals_np)

    x3 = jnp.transpose(x, (1, 0, 2)).reshape(gm.cols, b, Lp, 2)
    x2 = (x3[..., 0] | (x3[..., 1] << 16)).reshape(gm.cols, b * Lp)
    TM = min(_TM_OP, m_pad)
    budget = float(os.environ.get("LCPC_EXPANDER_CHUNK_BYTES", "1.5e9"))
    per_tile = K_pad * b * Lp * 4 * TM
    mc = min(m_pad, max(TM, int(budget // per_tile) * TM))
    call = _onepass_call(spec, Kg2, kg, b, mc, TM)

    def compute(idx_c, vals_c):
        g = jnp.take(x2, idx_c.reshape(-1), axis=0)       # (K_pad*mc, b*Lp)
        g = g.reshape(K_pad, mc, b, Lp)
        g = jnp.transpose(g, (2, 0, 3, 1)).reshape(b, Kg2, kg * Lp, mc)
        return call(g, vals_c)                            # (b, L, mc)

    if mc == m_pad:
        y = compute(idx_t, vals_t)
    else:
        n_chunks = -(-m_pad // mc)
        out0 = jnp.zeros((b, L, m_pad), U32)

        def body(c, out):
            s = c * mc
            idx_c = jax.lax.dynamic_slice(idx_t, (0, s), (K_pad, mc))
            vals_c = jax.lax.dynamic_slice(
                vals_t, (0, 0, s), (Kg2, kg * Lp, mc))
            yc = compute(idx_c, vals_c)
            return jax.lax.dynamic_update_slice(out, yc, (0, 0, s))

        y = jax.lax.fori_loop(0, n_chunks, body, out0)
    y = jnp.transpose(y, (0, 2, 1))                       # (b, m_pad, L)
    return y[:, : gm.rows, :]


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
