"""Second-generation Pallas NTT kernels: constant-multiply tables +
pair-grouped butterflies.

Two structural wins over ops/ntt_pallas.py (v1):

1. **Table multiply instead of Montgomery.**  Every NTT multiply is by a
   twiddle constant c known when the stage tables are built, so the kernel
   receives, for each position, the L limb-rows of (c * 2^(16*i) mod p) for
   every operand-limb index i.  The product is then

       a * c mod p  ==  (sum_i a_i * C_i) mod p,   C_i = c * 2^(16 i) mod p

   -- one bank of L scalar-row x limb-block multiplies accumulated in
   lo/hi splits, one carry normalization, and a short Barrett tail (the
   value is < 2^20 * p, so the quotient estimate has 2 limbs instead of
   L+1).  v1's Montgomery REDC needs three full LxL limb convolutions and
   six carry chains per multiply; the table multiply needs one convolution
   and ~2.5x fewer vector ops.

2. **Pair-grouped butterflies.**  A DIT butterfly needs ONE twiddle product
   per (lo, hi) pair: y = w * x_hi, outputs x_lo + y and x_lo - y.  v1
   computed w*x at full width (the product at lo positions is discarded --
   half the multiplies wasted; the streamed large stages recomputed the
   product on both sides of the pair).  Here every stage with half >= 128
   lanes packs the hi positions into a half-width block (static lane
   slicing at >=128-lane granularity), multiplies once, and writes both
   outputs.  Stages with half < 128 (sub-lane-tile distances) stay at full
   width with roll-based exchange, but still use the cheap table multiply.

Same contract and bit-identical results as ops/ntt.py (canonical residues
at every butterfly; oracle: tests/test_ntt_pallas2.py).  Both directions:
the inverse runs the inverse twiddle tables + a final n^-1 scaling.  The
inverse call sites (decode, _auto_ntt) run eagerly with inline tables —
jitting a large-n (>= 2^18) inverse without threading v2_device_tables
would bake the tables into the HLO (the compile-payload pathology the
forward path's device_operands() exists to avoid).

Reference parity note: this replaces fffft's per-row recursive NTT
(lcpc-ligero-pc/src/lib.rs:162-164) for the commit encode hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import FieldSpec
from .ntt import _bit_reverse_perm
from .ntt_pallas import (
    MASK16,
    U32,
    _carry_prop,
    _cond_sub_p,
    _const_block,
    _conv_acc,
    _field_consts_np,
    _limbs_const,
    _mod_add,
    _mod_sub,
    _pad_rows,
    _shift_down,
    _sub_block,
)

import os

#: lane-tile width for v2 (tables are L x L limb-rows per lane, so VMEM
#: budget prefers a narrower tile than v1's 2048)
_TILE2 = int(os.environ.get("LCPC_PALLAS2_TILE", "1024"))
#: minimum pair distance for packed (half-width-multiply) stages
_PACK = 128


def _vmem_params():
    """Raise the Mosaic scoped-VMEM cap (default 16 MB; v5e has 128 MB
    physical VMEM).  Shared with ops/ntt_pallas3.py."""
    mb = int(os.environ.get("LCPC_VMEM_LIMIT_MB", "100"))
    return pltpu.CompilerParams(vmem_limit_bytes=mb << 20)


# ---------------------------------------------------------------------------
# table multiply
# ---------------------------------------------------------------------------

def _cmul_block(a: jnp.ndarray, w: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """a (L, T) canonical x table w ((L+?)*L rows, T) -> a*c mod p (L, T).

    w rows [i*L, (i+1)*L) hold the L limbs of (c * 2^(16 i) mod p) for the
    lane's twiddle c.  All products are scalar-row x block; lo/hi splits
    accumulate separately (16 terms of 16 bits each: max 2^20 < 2^32)."""
    L = spec.num_limbs16
    T = a.shape[1]
    mu_np, p_np, mu_len = _field_consts_np(spec)
    mu = _const_block(mu_np, T)
    p_pad = _const_block(p_np, T, rows=L + 1)

    acc_lo = jnp.zeros((L + 1, T), U32)
    acc_hi = jnp.zeros((L + 1, T), U32)
    for i in range(L):
        prod = a[i : i + 1] * w[i * L : (i + 1) * L]        # (L, T) exact
        acc_lo = acc_lo + _pad_rows(prod & MASK16, 0, L + 1)
        acc_hi = acc_hi + _pad_rows(prod >> 16, 0, L + 1)
    digits = acc_lo + _shift_down(acc_hi, 1)
    z = _carry_prop(digits, L + 2)                          # exact < 2^20 p

    # short Barrett: z >> 16(L-1) has 3 limbs; q = (q1*mu) >> 16(L+1) has 2
    q1 = z[L - 1 :]                                         # (3, T)
    q_wide = _carry_prop(_conv_acc(q1, mu, 3 + mu_len + 1), 3 + mu_len)
    q = q_wide[L + 1 : L + 3]                               # (2, T)
    qp = _carry_prop(_conv_acc(q, _const_block(p_np, T), L + 2), L + 1)
    r, _ = _sub_block(z[: L + 1], qp)                       # r < 3p exact
    r = _cond_sub_p(r, p_pad)
    r = _cond_sub_p(r, p_pad)
    return r[:L]


# ---------------------------------------------------------------------------
# stage kernels
# ---------------------------------------------------------------------------

def _lane_slices(x: jnp.ndarray, group: int, part: int, half: int) -> jnp.ndarray:
    """Concat x[:, g*group+part*half : +half] over all pair groups g."""
    T = x.shape[1]
    parts = [x[:, g * group + part * half : g * group + part * half + half]
             for g in range(T // group)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _interleave(lo: jnp.ndarray, hi: jnp.ndarray, half: int) -> jnp.ndarray:
    """Inverse of _lane_slices: rebuild [lo_0, hi_0, lo_1, hi_1, ...]."""
    Th = lo.shape[1]
    parts = []
    for g in range(Th // half):
        parts.append(lo[:, g * half : (g + 1) * half])
        parts.append(hi[:, g * half : (g + 1) * half])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def _stage_body(x: jnp.ndarray, w_ref, lo_ref, spec: FieldSpec,
                halves: tuple) -> jnp.ndarray:
    """DIT butterfly stages on one (L, T) lane tile (plain array in/out —
    shared by the in-tile kernel and its fused-multiply variant).

    half < _PACK: full-width table mul, roll-based partner exchange
    (w table covers every lane; the product at lo lanes equals the lo
    partner's product, so rolls provide y_partner).
    half >= _PACK: hi lanes packed to half width via static lane slices,
    ONE multiply per pair, interleaved write-back.
    w_ref rows: concatenated per-stage tables (full: L*L rows at T lanes;
    packed: L*L rows at T/2 lanes zero-padded to T).  lo_ref: (n_full, T)
    lo masks for the full-width stages only."""
    L = spec.num_limbs16
    T = x.shape[1]
    _, p_np, _ = _field_consts_np(spec)
    p_pad = _const_block(p_np, T, rows=L + 1)
    p = p_pad[:L]
    p_pad_h = _const_block(p_np, T // 2, rows=L + 1)
    p_h = p_pad_h[:L]
    row = 0
    nf = 0
    for half in halves:
        w = w_ref[row : row + L * L]
        row += L * L
        if half < _PACK:
            lo = lo_ref[nf : nf + 1]
            nf += 1
            y = _cmul_block(x, w, spec)
            xp = jnp.where(lo > 0, pltpu.roll(x, T - half, 1),
                           pltpu.roll(x, half, 1))
            yp = jnp.where(lo > 0, pltpu.roll(y, T - half, 1),
                           pltpu.roll(y, half, 1))
            lo_val = _mod_add(x, yp, p_pad, L)
            hi_val = _mod_sub(xp, y, p, L)
            x = jnp.where(lo > 0, lo_val, hi_val)
        else:
            group = 2 * half
            xl = _lane_slices(x, group, 0, half)        # (L, T/2)
            xh = _lane_slices(x, group, 1, half)
            y = _cmul_block(xh, w[:, : T // 2], spec)
            lo_val = _mod_add(xl, y, p_pad_h, L)
            hi_val = _mod_sub(xl, y, p_h, L)
            x = _interleave(lo_val, hi_val, half)
    return x


def _stages_kernel_in_tile(spec: FieldSpec, halves: tuple):
    """All stages with half < T in one VMEM-resident kernel (see
    _stage_body for the per-stage structure and table layout)."""

    def kernel(x_ref, w_ref, lo_ref, out_ref):
        out_ref[0] = _stage_body(x_ref[0], w_ref, lo_ref, spec, halves)

    return kernel


def _stage_kernel_large_pair(spec: FieldSpec):
    """Stage with half >= T: x viewed (batch, L, G, 2, half); one block
    carries the lo AND hi tiles of a pair (the pair axis must stay whole:
    Mosaic requires the last two block dims equal the array dims or its
    tiling), so each instance does ONE multiply per pair and writes both
    outputs (v1 recomputed the product on each side)."""
    L = spec.num_limbs16

    def kernel(x_ref, w_ref, out_ref):
        xl = x_ref[0, :, 0, 0]
        xh = x_ref[0, :, 0, 1]
        T = xl.shape[1]
        _, p_np, _ = _field_consts_np(spec)
        p_pad = _const_block(p_np, T, rows=L + 1)
        y = _cmul_block(xh, w_ref[:], spec)
        out_ref[0, :, 0, 0] = _mod_add(xl, y, p_pad, L)
        out_ref[0, :, 0, 1] = _mod_sub(xl, y, p_pad[:L], L)

    return kernel


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

def _cmul_rows_np(vals, spec: FieldSpec) -> np.ndarray:
    """(m,) python-int twiddles -> (L*L, m) uint32 table: rows [i*L,(i+1)*L)
    are the limbs of (val * 2^(16 i) mod p)."""
    L = spec.num_limbs16
    p = spec.modulus
    m = len(vals)
    out = np.empty((L * L, m), np.uint32)
    cur = [int(v) for v in vals]
    wbytes = 2 * L
    for i in range(L):
        buf = b"".join(c.to_bytes(wbytes, "little") for c in cur)
        limbs = np.frombuffer(buf, "<u2").reshape(m, L).T    # (L, m)
        out[i * L : (i + 1) * L] = limbs
        if i + 1 < L:
            cur = [(c << 16) % p for c in cur]
    return out


@functools.lru_cache(maxsize=None)
def _twiddle_ints(spec: FieldSpec, n: int, inverse: bool) -> tuple:
    """Per-stage twiddles as python ints: stage s has period half=2^s with
    W_s[t] = w_m^t (ops/ntt.py table semantics)."""
    w = spec.nth_root_of_unity(n)
    if inverse:
        w = spec.inv(w)
    log_n = n.bit_length() - 1
    stages = []
    for s in range(log_n):
        half = 1 << s
        wm = pow(w, n // (2 * half), spec.modulus)
        vals = [1] * half
        for k in range(1, half):
            vals[k] = (vals[k - 1] * wm) % spec.modulus
        stages.append(tuple(vals))
    return tuple(stages)


@functools.lru_cache(maxsize=None)
def _v2_tables(spec: FieldSpec, n: int, skip: int, inverse: bool):
    """numpy tables for every stage >= skip.

    In-tile stages (half < T): one stacked (rows, T) array (full-width
    stages tiled to T lanes; packed stages at T/2 lanes zero-padded to T)
    plus the full-stage lo-mask block.
    Large stages (half >= T): per-stage compact (L*L, half) arrays (the
    kernel's index map picks T-lane tiles; identical for every pair group
    and batch row, so the block is fetched only when the t-tile changes)."""
    L = spec.num_limbs16
    T = min(_TILE2, n)
    log_n = n.bit_length() - 1
    stages = _twiddle_ints(spec, n, inverse)

    in_tile_rows = []
    lo_rows = []
    halves = []
    for s in range(skip, log_n):
        half = 1 << s
        if half >= T:
            break
        halves.append(half)
        vals = stages[s]
        if half < _PACK:
            reps = np.array([vals[t % half] for t in range(T)], object)
            in_tile_rows.append(_cmul_rows_np(reps, spec))
            # lo lanes of stage s: bit s of the lane index clear (the v1
            # oracle's lo_mask, ops/ntt.py:73, computed directly — the full
            # v1 twiddle tables are hundreds of MB at commit-scale n)
            lo_rows.append(
                (((np.arange(T) >> s) & 1) == 0).astype(np.uint32))
        else:
            reps = np.array([vals[t % half] for t in range(T // 2)], object)
            tab = np.zeros((L * L, T), np.uint32)
            tab[:, : T // 2] = _cmul_rows_np(reps, spec)
            in_tile_rows.append(tab)
    w_in_tile = (np.concatenate(in_tile_rows, axis=0)
                 if in_tile_rows else np.zeros((0, T), np.uint32))
    lo_in_tile = (np.stack(lo_rows) if lo_rows
                  else np.zeros((0, T), np.uint32))

    large = {}
    for s in range(max(skip, T.bit_length() - 1), log_n):
        half = 1 << s
        large[s] = _cmul_rows_np(np.array(stages[s], object), spec)
    return tuple(halves), w_in_tile, lo_in_tile, large


# ---------------------------------------------------------------------------
# pallas_call builders
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _in_tile_call(spec: FieldSpec, n: int, batch: int, halves: tuple,
                  w_rows: int, n_full: int):
    L = spec.num_limbs16
    T = min(_TILE2, n)
    nt = n // T
    kernel = _stages_kernel_in_tile(spec, halves)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n), jnp.uint32),
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, T), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_full, 1), T), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(),
    )


@functools.lru_cache(maxsize=None)
def _large_pair_call(spec: FieldSpec, n: int, half: int, batch: int):
    L = spec.num_limbs16
    T = min(_TILE2, n)
    G = n // (2 * half)
    tt = half // T
    kernel = _stage_kernel_large_pair(spec)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, G, 2, half), jnp.uint32),
        grid=(tt, batch, G),
        in_specs=[
            pl.BlockSpec((1, L, 1, 2, T), lambda t, b, g: (b, 0, g, 0, t),
                         memory_space=pltpu.VMEM),
            # twiddles depend only on t (position within half): constant
            # across the two faster grid axes, so refetched tt times total
            pl.BlockSpec((L * L, T), lambda t, b, g: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, 1, 2, T), lambda t, b, g: (b, 0, g, 0, t),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(),
    )

    def wrapped(x, w):
        batch_, L_, n_ = x.shape
        x5 = x.reshape(batch_, L_, G, 2, half)
        out = call(x5, w)
        return out.reshape(batch_, L_, n_)

    return wrapped


# ---------------------------------------------------------------------------
# four-step (single chip): n = n1*n2, two VMEM-resident sub-NTT passes
# ---------------------------------------------------------------------------
#
# The large-stage path above pays one full HBM round trip PER STAGE with
# half >= T (8 passes at n = 2^18).  The four-step factorization
# (j = j1 + n1*j2, k = k2 + n2*k1; same math as parallel/cross_chip_ntt.py:9)
#     X[k2 + n2*k1] = NTT_n1^{j1->k1}( w_n^{j1*k2} * NTT_n2^{j2->k2}(x) )
# runs as: one lane permutation (grouping + per-group bit-reverse), one
# in-tile pass of packed n2-point sub-NTTs, a second permutation, one
# in-tile pass of n1-point sub-NTTs with the diagonal twiddle w_n^{j1*k2}
# fused as a generic limb-multiply prologue, and a final natural-order
# permutation — ~5 HBM round trips total.  Packed sub-NTTs fall out of the
# existing kernel for free: on bit-reversed input, stages 0..log2(m)-1 of a
# length-T NTT ARE independent m-point NTTs on aligned lane groups, and the
# stage-s twiddle w_{2^(s+1)}^(t mod 2^s) is independent of the transform
# length (nth_root_of_unity is 2-adically consistent: w_m == w_n^(n/m)).
#
# Forward only (the decode path keeps the stage pipeline); applies for
# _TILE2 < n <= _TILE2^2; enable with LCPC_NTT_FOURSTEP=1.


def _gmul_block(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Generic a*b mod p for (L, T) canonical limb blocks: full convolution
    + the m=2L truncated Barrett (fields/limb.py:152-168 semantics)."""
    L = spec.num_limbs16
    T = a.shape[1]
    mu_np, p_np, mu_len = _field_consts_np(spec)
    z = _carry_prop(_conv_acc(a, b, 2 * L + 1), 2 * L)
    q1 = z[L - 1 :]                                          # (L+1, T)
    q_wide = _carry_prop(_conv_acc(q1, _const_block(mu_np, T),
                                   L + 1 + mu_len + 1), L + 1 + mu_len)
    q = q_wide[L + 1 :]
    qp = _carry_prop(_conv_acc(q, _const_block(p_np, T), L + 2), L + 1)
    r, _ = _sub_block(z[: L + 1], qp)                        # r < 4p exact
    p_pad = _const_block(p_np, T, rows=L + 1)
    r = _cond_sub_p(r, p_pad)
    r = _cond_sub_p(r, p_pad)
    r = _cond_sub_p(r, p_pad)
    return r[:L]


def _stages_kernel_in_tile_mul(spec: FieldSpec, halves: tuple):
    """_stages_kernel_in_tile with a generic-multiply prologue: x *= tw
    (per-lane twiddle VALUES, (L, T) tile) before the butterfly stages —
    fuses the four-step's diagonal twiddle into the second sub-NTT pass."""

    def kernel(x_ref, tw_ref, w_ref, lo_ref, out_ref):
        x = _gmul_block(x_ref[0], tw_ref[:], spec)
        out_ref[0] = _stage_body(x, w_ref, lo_ref, spec, halves)

    return kernel


@functools.lru_cache(maxsize=None)
def _in_tile_call_mul(spec: FieldSpec, n: int, batch: int, halves: tuple,
                      w_rows: int, n_full: int):
    L = spec.num_limbs16
    T = min(_TILE2, n)
    nt = n // T
    kernel = _stages_kernel_in_tile_mul(spec, halves)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n), jnp.uint32),
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, T), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n_full, 1), T), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(),
    )


def _stage_tables_width(spec: FieldSpec, sub_n: int, T: int, skip: int):
    """In-tile stage tables for packed sub_n-point sub-NTTs at tile width T
    (same construction as _v2_tables' in-tile part; twiddle at lane t of
    stage s is W_s[t mod 2^s], period 2^s | sub_n | T)."""
    L = spec.num_limbs16
    stages = _twiddle_ints(spec, sub_n, False)
    rows, los, halves = [], [], []
    for s in range(skip, sub_n.bit_length() - 1):
        half = 1 << s
        halves.append(half)
        vals = stages[s]
        if half < _PACK:
            reps = np.array([vals[t % half] for t in range(T)], object)
            rows.append(_cmul_rows_np(reps, spec))
            los.append((((np.arange(T) >> s) & 1) == 0).astype(np.uint32))
        else:
            reps = np.array([vals[t % half] for t in range(T // 2)], object)
            tab = np.zeros((L * L, T), np.uint32)
            tab[:, : T // 2] = _cmul_rows_np(reps, spec)
            rows.append(tab)
    w = (np.concatenate(rows, axis=0) if rows
         else np.zeros((0, T), np.uint32))
    lo = np.stack(los) if los else np.zeros((1, T), np.uint32)
    return tuple(halves), w, lo, len(los)


def _fs_split(n: int) -> tuple | None:
    """(n1, n2) with n1*n2 = n, both <= _TILE2, or None (fall back)."""
    if n <= _TILE2 or n > _TILE2 * _TILE2:
        return None
    l1 = (n.bit_length() - 1) // 2
    n1 = 1 << l1
    n2 = n // n1
    if n2 > _TILE2:
        n1, n2 = n2, n1
    if n1 > _TILE2 or n2 > _TILE2:
        return None
    return n1, n2


@functools.lru_cache(maxsize=None)
def _fs_tables_np(spec: FieldSpec, n: int, n_nonzero: int | None):
    """numpy bundle: permutations p0/p1/p2, fused twiddle values (L, n),
    and the two in-tile stage-table stacks."""
    n1, n2 = _fs_split(n)
    L = spec.num_limbs16
    T = min(_TILE2, n)
    p_int = spec.modulus

    # NTT_A pruning: x[j]=0 for j >= nnz and j = j1 + n1*j2 => per-group
    # rows j2 >= ceil(nnz/n1) are zero
    nnz2 = None
    if n_nonzero is not None and 0 < n_nonzero < n:
        nnz2 = min(n2, (n_nonzero + n1 - 1) // n1)
    skip = _skip_for(n2, nnz2)

    rev2 = _bit_reverse_perm(n2)
    rev1 = _bit_reverse_perm(n1)
    lanes = np.arange(n, dtype=np.int64)
    # P0: dest lane g*n2 + t  <-  x[j1=g + n1 * rev2[t & ~mask]]
    g, t = lanes // n2, lanes % n2
    t_m = t & ~((1 << skip) - 1) if skip else t
    p0 = g + n1 * rev2[t_m]
    # P1: dest lane h*n1 + u  <-  A[j1=rev1[u], k2=h]  (A at lane j1*n2+k2)
    h, u = lanes // n1, lanes % n1
    p1 = rev1[u] * n2 + h
    # fused diagonal twiddle at dest lane: w_n^(j1*k2), j1=rev1[u], k2=h
    w = spec.nth_root_of_unity(n)
    w_pows_j1 = [1] * n1
    for j1 in range(1, n1):
        w_pows_j1[j1] = (w_pows_j1[j1 - 1] * w) % p_int
    wj = [w_pows_j1[rev1[uu]] for uu in range(n1)]   # per-dest-lane base
    tw_vals = [0] * n
    row = [1] * n1                                   # (w^j1)^h, h ascending
    for hh in range(n2):
        if hh:
            row = [(r * wv) % p_int for r, wv in zip(row, wj)]
        tw_vals[hh * n1 : (hh + 1) * n1] = row
    from ..fields.field import ints_to_limbs
    tw = np.ascontiguousarray(ints_to_limbs(tw_vals, spec).T)    # (L, n)
    # P2: out[k] <- B[k2=k%n2, k1=k//n2] at lane (k%n2)*n1 + (k//n2)
    p2 = (lanes % n2) * n1 + (lanes // n2)

    halves_a, w_a, lo_a, nf_a = _stage_tables_width(spec, n2, T, skip)
    halves_b, w_b, lo_b, nf_b = _stage_tables_width(spec, n1, T, 0)

    # major-axis factorization of the same permutations (the transpose
    # path): P0 = take(rev2m over the j2 axis) + swap(n2,n1);
    # P1 = take(rev1 over the j1 axis) + swap; P2 = swap only.
    # rev2m[t] = rev2[t & ~mask] < n2 (row duplication realizes the
    # zero-pad pruning); both takes run over axis -2 (contiguous minor
    # rows), never over the lane axis.
    t2 = np.arange(n2)
    t2_m = t2 & ~((1 << skip) - 1) if skip else t2
    rev2m = rev2[t2_m].astype(np.int32)
    return dict(n1=n1, n2=n2, skip=skip,
                p0=p0.astype(np.int32), p1=p1.astype(np.int32),
                p2=p2.astype(np.int32), tw=tw,
                rev2m=rev2m, rev1=rev1.astype(np.int32),
                halves_a=halves_a, w_a=w_a, lo_a=lo_a, nf_a=nf_a,
                halves_b=halves_b, w_b=w_b, lo_b=lo_b, nf_b=nf_b)


def _fs_perm_mode() -> str:
    """'xpose' (default): permutations as major-axis takes + minor
    transposes (TPU-friendly copies); 'take': round-3 full-lane gathers
    (kept for A/B measurement — measured slower on hardware)."""
    return os.environ.get("LCPC_FS_PERM", "xpose")


def fs_device_tables(spec: FieldSpec, n: int,
                     n_nonzero: int | None = None) -> tuple:
    """Four-step operand bundle as a device pytree (arrays only — rides
    through jit as arguments like v2_device_tables)."""
    t = _fs_tables_np(spec, n, n_nonzero)
    if _fs_perm_mode() == "take":
        perms = (jax.device_put(t["p0"]), jax.device_put(t["p1"]),
                 jax.device_put(t["p2"]))
    else:
        perms = (jax.device_put(t["rev2m"]), jax.device_put(t["rev1"]))
    return (jax.device_put(t["w_a"]), jax.device_put(t["lo_a"]),
            jax.device_put(t["w_b"]), jax.device_put(t["lo_b"]),
            jax.device_put(t["tw"])) + perms


def _use_fourstep(n: int, inverse: bool) -> bool:
    if inverse or _fs_split(n) is None:
        return False
    return os.environ.get("LCPC_NTT_FOURSTEP", "0") == "1"


def ntt_four_step(x: jnp.ndarray, spec: FieldSpec,
                  n_nonzero: int | None = None,
                  tables: tuple | None = None) -> jnp.ndarray:
    """Four-step NTT along axis -2 of (batch, n, L); bit-identical to
    ops.ntt.ntt (oracle: tests/test_ntt_fourstep.py).

    Permutation implementation per _fs_perm_mode(): the default 'xpose'
    realizes P0/P1/P2 as (bit-reverse take over the MAJOR row axis of the
    (n2, n1) lane view) + (minor-axis transpose) — XLA lowers both to
    bandwidth-bound tiled copies, where the round-3 full-lane jnp.take
    gathers were the measured loss (BENCH_SUMMARY r3 'Negative results')."""
    batch, n, L = x.shape
    t = _fs_tables_np(spec, n, n_nonzero)
    take_mode = _fs_perm_mode() == "take"
    if tables is not None:
        if len(tables) == 8:
            w_a, lo_a, w_b, lo_b, tw, p0, p1, p2 = tables
            take_mode = True
        else:
            w_a, lo_a, w_b, lo_b, tw, rev2m, rev1 = tables
            take_mode = False
        assert w_a.shape == t["w_a"].shape, "fs tables mismatch (n/skip)"
    elif take_mode:
        w_a, lo_a = jnp.asarray(t["w_a"]), jnp.asarray(t["lo_a"])
        w_b, lo_b = jnp.asarray(t["w_b"]), jnp.asarray(t["lo_b"])
        tw = jnp.asarray(t["tw"])
        p0, p1, p2 = (jnp.asarray(t["p0"]), jnp.asarray(t["p1"]),
                      jnp.asarray(t["p2"]))
    else:
        w_a, lo_a = jnp.asarray(t["w_a"]), jnp.asarray(t["lo_a"])
        w_b, lo_b = jnp.asarray(t["w_b"]), jnp.asarray(t["lo_b"])
        tw = jnp.asarray(t["tw"])
        rev2m, rev1 = jnp.asarray(t["rev2m"]), jnp.asarray(t["rev1"])

    n1, n2 = t["n1"], t["n2"]
    xm = jnp.transpose(x, (0, 2, 1))                      # (b, L, n)
    if take_mode:
        xm = jnp.take(xm, p0, axis=2)
    else:
        x4 = xm.reshape(batch, L, n2, n1)                 # rows = j2
        x4 = jnp.take(x4, rev2m, axis=2)                  # bitrev + dup rows
        xm = jnp.swapaxes(x4, 2, 3).reshape(batch, L, n)  # rows = j1
    if t["halves_a"]:
        # skip == log2(n2) (n_nonzero <= n1) leaves pass A with no stages:
        # the duplicated-input groups are already the pass-A output
        xm = _in_tile_call(spec, n, batch, t["halves_a"], t["w_a"].shape[0],
                           t["nf_a"])(xm, w_a, lo_a)
    if take_mode:
        xm = jnp.take(xm, p1, axis=2)
    else:
        a4 = xm.reshape(batch, L, n1, n2)                 # rows = j1
        a4 = jnp.take(a4, rev1, axis=2)                   # bitrev rows
        xm = jnp.swapaxes(a4, 2, 3).reshape(batch, L, n)  # rows = k2
    xm = _in_tile_call_mul(spec, n, batch, t["halves_b"], t["w_b"].shape[0],
                           t["nf_b"])(xm, tw, w_b, lo_b)
    if take_mode:
        xm = jnp.take(xm, p2, axis=2)
    else:
        b4 = xm.reshape(batch, L, n2, n1)                 # rows = k2
        xm = jnp.swapaxes(b4, 2, 3).reshape(batch, L, n)  # rows = k1
    return jnp.transpose(xm, (0, 2, 1))


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def _skip_for(n: int, n_nonzero: int | None) -> int:
    if n_nonzero is not None and 0 < n_nonzero < n:
        np2 = 1 if n_nonzero <= 1 else 1 << (n_nonzero - 1).bit_length()
        return (n // np2).bit_length() - 1
    return 0


def v2_device_tables(spec: FieldSpec, n: int,
                     n_nonzero: int | None = None,
                     inverse: bool = False) -> tuple:
    """Twiddle tables for ntt_pallas2 as a device pytree: (w_in_tile,
    lo_in_tile, (large_s, ...)).  Call OUTSIDE any trace and thread through
    jit as arguments — at n >= 2^18 the large-stage tables run to hundreds
    of MB and would otherwise be baked into the HLO as literals (the
    compile-payload pathology core/commit.py:217-219 documents)."""
    import jax
    if _use_fourstep(n, inverse):
        return fs_device_tables(spec, n, n_nonzero)
    T = min(_TILE2, n)
    skip = _skip_for(n, n_nonzero)
    halves, w_in_tile, lo_in_tile, large = _v2_tables(spec, n, skip, inverse)
    n_full = sum(1 for h in halves if h < _PACK)
    lo_np = lo_in_tile if n_full else np.zeros((1, T), np.uint32)
    larges = tuple(jax.device_put(large[s])
                   for s in sorted(large))
    return (jax.device_put(w_in_tile), jax.device_put(lo_np), larges)


def ntt_pallas2(x: jnp.ndarray, spec: FieldSpec,
                n_nonzero: int | None = None,
                tables: tuple | None = None,
                inverse: bool = False) -> jnp.ndarray:
    """NTT along axis -2; bit-identical to ops.ntt.ntt / ops.ntt.intt.

    x: (batch, n, L).  n_nonzero: zero-padding promise (stage pruning, same
    semantics as ops/ntt_pallas.py; forward only).  tables: optional pytree
    from v2_device_tables (same spec/n/n_nonzero/inverse) so the twiddles
    ride as jit arguments; None builds them inline (fine eagerly or for
    small n).  inverse runs the inverse twiddles + final n^-1 scaling."""
    batch, n, L = x.shape
    assert n & (n - 1) == 0 and n >= 256, "pallas path needs pow2 n >= 256"
    # four-step dispatch: a 7/8-tuple operand bundle (fs_device_tables;
    # 7 = xpose permutations, 8 = legacy take permutations) or the env
    # opt-in routes large-n forward transforms through the two-pass
    # factorization instead of the per-stage pipeline
    if tables is not None and len(tables) in (7, 8):
        assert not inverse
        return ntt_four_step(x, spec, n_nonzero=n_nonzero, tables=tables)
    if tables is None and _use_fourstep(n, inverse):
        return ntt_four_step(x, spec, n_nonzero=n_nonzero)
    log_n = n.bit_length() - 1
    T = min(_TILE2, n)

    skip = 0 if inverse else _skip_for(n, n_nonzero)
    rev = _bit_reverse_perm(n)
    if skip:
        idx = rev[np.arange(n) & ~((1 << skip) - 1)]
    else:
        idx = rev
    x = jnp.take(x, jnp.asarray(idx), axis=-2)
    xm = jnp.transpose(x, (0, 2, 1))                       # (batch, L, n)

    halves, w_in_tile, lo_in_tile, large = _v2_tables(spec, n, skip, inverse)
    n_full = sum(1 for h in halves if h < _PACK)
    if tables is not None:
        w_arg, lo_arg, larges = tables
        assert w_arg.shape == w_in_tile.shape, "tables mismatch (n/skip)"
    else:
        w_arg = jnp.asarray(w_in_tile)
        lo_arg = (jnp.asarray(lo_in_tile) if n_full
                  else jnp.zeros((1, T), jnp.uint32))
        larges = tuple(jnp.asarray(large[s]) for s in sorted(large))
    if halves:
        xm = _in_tile_call(spec, n, batch, halves, w_in_tile.shape[0],
                           n_full)(xm, w_arg, lo_arg)

    for i, s in enumerate(range(max(skip, T.bit_length() - 1), log_n)):
        xm = _large_pair_call(spec, n, 1 << s, batch)(xm, larges[i])

    out = jnp.transpose(xm, (0, 2, 1))
    if inverse:
        from ..fields.field import ints_to_limbs
        from ..fields.limb import limb_field
        lf = limb_field(spec)
        n_inv = ints_to_limbs([spec.inv(n % spec.modulus)], spec)[0]
        out = lf.mul(out, jnp.asarray(n_inv))
    return out
