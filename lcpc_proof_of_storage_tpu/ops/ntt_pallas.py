"""Pallas TPU kernels for the NTT hot path.

The XLA limb pipeline (ops/ntt.py + fields/limb.py) materializes ~100
HBM-sized intermediates per modular multiply, making the NTT memory-bound
(~1.7 s for the 2^20 ft255 commit NTT).  These kernels fuse an entire
butterfly stage — limb-convolution multiply, carry normalization, truncated
Barrett reduction, partner exchange and add/sub — into one VMEM-resident
pass per stage.

Vectorization: all limb values live as (rows, T) blocks with limbs on
sublanes and T transform lanes, and every operation is full-block wide:

  * the schoolbook convolution accumulates (L, T)-wide partial products
    with sublane-shifted adds;
  * carry/borrow propagation avoids sequential per-limb chains entirely —
    two local split-shift-add passes bring digits to <= 2^16, then a
    Kogge-Stone carry-lookahead (log2 rounds of generate/propagate) resolves
    the ripple; subtraction reuses the same machinery via complement-add
    with an explicit top carry row.

Partner exchange j <-> j^half: lane rolls inside a tile for half < T;
for half >= T the partner tile is streamed as a second input block
(BlockSpec index j ^ (half/T)), where the lo/hi mask is constant per tile
and W_s[j] = w_m^(j mod half) is identical for both partners.

Bit-exact with ops/ntt.py (oracles: tests/test_ntt_pallas.py + TPU runs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.field import FieldSpec, ints_to_limbs
from .ntt import _bit_reverse_perm, _ntt_tables

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)

# lane-tile width: bounds scoped VMEM (whole-row kernels OOM at n=2^15, L=16)
import os
_TILE = int(os.environ.get("LCPC_PALLAS_TILE", "2048"))


def _limbs_const(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


# ---------------------------------------------------------------------------
# full-block limb primitives (all ops (rows, T)-wide)
# ---------------------------------------------------------------------------

def _shift_down(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[i] = x[i-d] (zeros shifted in at the bottom rows)."""
    if d == 0:
        return x
    rows = x.shape[0]
    if d >= rows:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [jnp.zeros((d, x.shape[1]), U32), x[: rows - d]], axis=0)


def _carry_prop(digits: jnp.ndarray, out_len: int, want_carry: bool = False):
    """Normalize base-2^16 digits (each < 2^32) to out_len 16-bit limbs.

    Two split-shift-add passes + Kogge-Stone lookahead; O(log rows) wide ops
    instead of O(rows) sequential narrow ops.  With want_carry, an extra top
    row captures the carry out of digit out_len-1 (in {0,1})."""
    m2 = out_len + (1 if want_carry else 0)
    rows = digits.shape[0]
    if rows < m2:
        digits = jnp.concatenate(
            [digits, jnp.zeros((m2 - rows, digits.shape[1]), U32)], axis=0)
    else:
        digits = digits[:m2]
    # pass 1: digits < 2^32 -> < 2^17
    d1 = (digits & MASK16) + _shift_down(digits >> 16, 1)
    # pass 2: -> <= 2^16
    d2 = (d1 & MASK16) + _shift_down(d1 >> 16, 1)
    # Kogge-Stone on single-bit carries
    g = d2 >> 16                                  # generate (0/1)
    p = jnp.where((d2 & MASK16) == MASK16, jnp.uint32(1), jnp.uint32(0))
    d = 1
    while d < m2:
        g = g | (p & _shift_down(g, d))
        p = p & _shift_down(p, d)
        d *= 2
    carry_in = _shift_down(g, 1)
    out = (d2 + carry_in) & MASK16
    if want_carry:
        return out[:out_len], out[out_len : out_len + 1]
    return out[:out_len]


def _pad_rows(x: jnp.ndarray, offset: int, total: int) -> jnp.ndarray:
    """Place x's rows at [offset, offset+rows) inside a (total, T) zero block
    (concat-based: Mosaic has no scatter; all indices static)."""
    rows, T = x.shape
    keep = min(rows, total - offset)
    if keep <= 0:
        return jnp.zeros((total, T), U32)
    parts = []
    if offset > 0:
        parts.append(jnp.zeros((offset, T), U32))
    parts.append(x[:keep])
    tail = total - offset - keep
    if tail > 0:
        parts.append(jnp.zeros((tail, T), U32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _conv_acc(a: jnp.ndarray, b: jnp.ndarray, out_rows: int) -> jnp.ndarray:
    """Unnormalized product digits of limb blocks a (La, T) x b (Lb, T).

    acc[k] = sum_{i+j=k} lo(a_i b_j) + sum_{i+j=k-1} hi(a_i b_j); partial
    products are combined with a balanced tree of shifted adds (row traffic
    O(L log L) instead of the O(L^2) of accumulating into a full-width
    block).  Digits < (La+Lb) * 2^16 < 2^23."""
    La, T = a.shape
    Lb = b.shape[0]
    acc = jnp.zeros((out_rows, T), U32)
    for i in range(La):
        prod = a[i : i + 1] * b                    # (Lb, T), exact uint32
        acc = acc + _pad_rows(prod & MASK16, i, out_rows)
        acc = acc + _pad_rows(prod >> 16, i + 1, out_rows)
    return acc


def _sub_block(x: jnp.ndarray, y: jnp.ndarray):
    """(x - y) mod 2^(16 rows), plus borrow flag (1, T) in {0,1}.

    Complement-add: x + (0xffff - y) + 1; the top carry is 1 iff x >= y."""
    rows = x.shape[0]
    comp = MASK16 - y
    s = x + comp
    one = jnp.concatenate(
        [jnp.full((1, x.shape[1]), 1, U32),
         jnp.zeros((rows - 1, x.shape[1]), U32)], axis=0)
    s = s + one
    out, carry = _carry_prop(s, rows, want_carry=True)
    borrow = jnp.uint32(1) - carry
    return out, borrow


def _cond_sub_p(r: jnp.ndarray, p_block: jnp.ndarray) -> jnp.ndarray:
    """r - p if r >= p else r; r (rows, T), p_block zero-padded to rows."""
    d, borrow = _sub_block(r, p_block)
    return jnp.where(borrow > 0, r, d)


def _mod_add(a: jnp.ndarray, b: jnp.ndarray, p_pad: jnp.ndarray, L: int):
    s = _carry_prop(a + b, L + 1)
    return _cond_sub_p(s, p_pad)[:L]


def _mod_sub(a: jnp.ndarray, b: jnp.ndarray, p_block: jnp.ndarray, L: int):
    d, borrow = _sub_block(a, b)
    dp = _carry_prop(d + p_block, L)
    return jnp.where(borrow > 0, dp, d)


def _const_block(limbs: np.ndarray, T: int, rows: int | None = None) -> jnp.ndarray:
    """Materialize a broadcast limb-constant block inside a kernel trace
    (pallas kernels may not capture array constants)."""
    rows = rows if rows is not None else len(limbs)
    parts = [jnp.full((1, T), np.uint32(limbs[i]) if i < len(limbs) else
                      np.uint32(0), U32) for i in range(rows)]
    return jnp.concatenate(parts, axis=0)


@functools.lru_cache(maxsize=None)
def _field_consts_np(spec: FieldSpec):
    L = spec.num_limbs16
    mu_int = (1 << (16 * 2 * L)) // spec.modulus
    mu_len = max(1, (mu_int.bit_length() + 15) // 16)
    return (_limbs_const(mu_int, mu_len), _limbs_const(spec.modulus, L), mu_len)


@functools.lru_cache(maxsize=None)
def _mont_consts_np(spec: FieldSpec):
    """p and p' = -p^-1 mod 2^(16L) for Montgomery REDC."""
    L = spec.num_limbs16
    R = 1 << (16 * L)
    p_prime = (-pow(spec.modulus, -1, R)) % R
    return (_limbs_const(spec.modulus, L), _limbs_const(p_prime, L))


def _mont_mul_block(a: jnp.ndarray, b_mont: jnp.ndarray,
                    spec: FieldSpec) -> jnp.ndarray:
    """Montgomery product: a (plain) x b_mont (= b*R mod p) -> a*b (plain).

    REDC: z = a*b_mont; m = z*p' mod R; t = (z + m*p)/R < 2p; one
    conditional subtraction.  R = 2^(16L).  Cheaper than Barrett (one
    truncated conv instead of the mu conv, 1 cond-sub instead of 3 + final
    subtract) — usable whenever one operand can be pre-scaled by R
    (the NTT twiddles)."""
    L = spec.num_limbs16
    T = a.shape[1]
    p_np, pp_np = _mont_consts_np(spec)
    p = _const_block(p_np, T)
    p_prime = _const_block(pp_np, T)
    p_pad = _const_block(p_np, T, rows=L + 1)

    z = _carry_prop(_conv_acc(a, b_mont, 2 * L + 1), 2 * L)        # exact
    m = _carry_prop(_conv_acc(z[:L], p_prime, L), L)               # mod R
    mp = _carry_prop(_conv_acc(m, p, 2 * L + 1), 2 * L)            # exact (<R^2)
    t_full = _carry_prop(z + mp, 2 * L + 1)                        # low L limbs 0
    t = t_full[L:]                                                  # (L+1, T)
    return _cond_sub_p(t, p_pad)[:L]


def _mul_mod_block(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Modular product of limb-major blocks: (L, T) x (L, T) -> (L, T).

    Mirrors LimbField.mul bit-for-bit: schoolbook conv, carry normalize,
    truncated Barrett (q1 = z >> 16(L-1); q = q1*mu >> 16(L+1)), r = z - q*p
    mod 2^16(L+1), three conditional subtractions."""
    L = spec.num_limbs16
    T = a.shape[1]
    mu_np, p_np, mu_len = _field_consts_np(spec)
    mu = _const_block(mu_np, T)
    p = _const_block(p_np, T)
    p_pad = _const_block(p_np, T, rows=L + 1)

    z = _carry_prop(_conv_acc(a, b, 2 * L + 1), 2 * L)
    q1 = z[L - 1 :]                                     # (L+1, T)
    q_wide = _carry_prop(_conv_acc(q1, mu, L + 1 + mu_len + 1), L + 1 + mu_len)
    q = q_wide[L + 1 :]                                 # (mu_len, T)
    qp = _carry_prop(_conv_acc(q, p, L + 2), L + 1)
    r, _ = _sub_block(z[: L + 1], qp)                   # r < 4p exact
    r = _cond_sub_p(r, p_pad)
    r = _cond_sub_p(r, p_pad)
    r = _cond_sub_p(r, p_pad)
    return r[:L]


# ---------------------------------------------------------------------------
# butterfly stage kernels
# ---------------------------------------------------------------------------

def _stage_kernel_small(spec: FieldSpec, halves: tuple):
    """One kernel running ALL stages with half < tile back to back in VMEM
    (partner exchanges are in-tile lane rolls, so no HBM round trips between
    stages).  w_ref: (S, L, T) per-stage twiddles; lo_ref: (S, T) masks."""
    L = spec.num_limbs16

    def kernel(x_ref, w_ref, lo_ref, out_ref):
        x = x_ref[0]                     # (L, T)
        T = x.shape[1]
        _, p_np, _ = _field_consts_np(spec)
        p_pad = _const_block(p_np, T, rows=L + 1)
        p = p_pad[:L]
        for s, half in enumerate(halves):
            w = w_ref[s]                 # (L, T)
            lo = lo_ref[s : s + 1]       # (1, T)
            y = _mont_mul_block(x, w, spec)
            # roll: out[j] = in[(j - shift) mod T]; lo needs x[j+half]
            xp = jnp.where(lo > 0, pltpu.roll(x, T - half, 1),
                           pltpu.roll(x, half, 1))
            yp = jnp.where(lo > 0, pltpu.roll(y, T - half, 1),
                           pltpu.roll(y, half, 1))
            lo_val = _mod_add(x, yp, p_pad, L)
            hi_val = _mod_sub(xp, y, p, L)
            x = jnp.where(lo > 0, lo_val, hi_val)
        out_ref[0] = x

    return kernel


def _stage_kernel_large(spec: FieldSpec, tile_bit: int):
    """Stage with half >= tile: partner tile streamed as a second input;
    lo/hi constant per tile; twiddles identical for partners."""
    L = spec.num_limbs16

    def kernel(x_ref, xp_ref, w_ref, out_ref):
        x = x_ref[0]
        xp = xp_ref[0]
        w = w_ref[:]
        T = x.shape[1]
        _, p_np, _ = _field_consts_np(spec)
        p_pad = _const_block(p_np, T, rows=L + 1)
        p = p_pad[:L]
        j = pl.program_id(1)
        is_lo = (j & tile_bit) == 0
        sel = jnp.where(is_lo, xp, x)
        m = _mont_mul_block(sel, w, spec)
        lo_val = _mod_add(x, m, p_pad, L)          # x + w*xp
        hi_val = _mod_sub(xp, m, p, L)             # xp - w*x
        out_ref[0] = jnp.where(is_lo, lo_val, hi_val)

    return kernel


@functools.lru_cache(maxsize=None)
def _fused_small_call(spec: FieldSpec, n: int, batch: int, halves: tuple):
    """All small-half stages in one pallas_call."""
    L = spec.num_limbs16
    T = min(_TILE, n)
    nt = n // T
    S = len(halves)
    kernel = _stage_kernel_small(spec, halves)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n), jnp.uint32),
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L, T), lambda b, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, T), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
    )


@functools.lru_cache(maxsize=None)
def _stage_call(spec: FieldSpec, n: int, half: int, batch: int):
    L = spec.num_limbs16
    T = min(_TILE, n)
    nt = n // T
    assert half >= T, "small stages go through _fused_small_call"
    tile_bit = half // T
    kernel = _stage_kernel_large(spec, tile_bit)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n), jnp.uint32),
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T),
                         lambda b, j, tb=tile_bit: (b, 0, j ^ tb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda b, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
    )

    def wrapped(x, w, lo_unused):
        return call(x, x, w)

    return wrapped


@functools.lru_cache(maxsize=None)
def _scale_call(spec: FieldSpec, n: int, batch: int):
    """Elementwise modular multiply by a constant (the iNTT 1/n scale)."""
    L = spec.num_limbs16
    T = min(_TILE, n)
    nt = n // T

    def kernel(x_ref, c_ref, out_ref):
        out_ref[0] = _mont_mul_block(x_ref[0], c_ref[:], spec)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n), jnp.uint32),
        grid=(batch, nt),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T), lambda b, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
    )


@functools.lru_cache(maxsize=None)
def _mont_ntt_tables(spec: FieldSpec, n: int, inverse: bool):
    """Per-stage twiddles pre-scaled by R = 2^(16L) (Montgomery form):
    mont_mul(x, w*R) = x*w, so values stay in plain form throughout."""
    from ..fields.field import ints_to_limbs as _itl
    L = spec.num_limbs16
    R = (1 << (16 * L)) % spec.modulus
    w = spec.nth_root_of_unity(n)
    if inverse:
        w = spec.inv(w)
    log_n = n.bit_length() - 1
    tws = np.empty((log_n, n, L), np.uint32)
    j = np.arange(n)
    for s in range(log_n):
        half = 1 << s
        m = half * 2
        wm = pow(w, n // m, spec.modulus)
        tw_vals = [R % spec.modulus] * half
        for k in range(1, half):
            tw_vals[k] = (tw_vals[k - 1] * wm) % spec.modulus
        tw_limbs = np.asarray(_itl(tw_vals, spec))
        tws[s] = tw_limbs[j % half]
    return tws


def ntt_pallas(x: jnp.ndarray, spec: FieldSpec, inverse: bool = False,
               n_nonzero: int | None = None) -> jnp.ndarray:
    """Forward/inverse NTT along axis -2 via fused Pallas stages.

    x: (batch, n, L) — same contract and bit-identical results as
    ops.ntt.ntt/intt (oracle: tests/test_ntt_pallas.py).

    n_nonzero (forward only): promise that positions >= n_nonzero are zero
    (Ligero's zero-padded coefficient rows).  The first
    k = log2(n/np2(n_nonzero)) butterfly stages then only duplicate values
    (the hi operand of every butterfly is zero), so they are replaced by a
    modified initial gather idx[j] = rev(j & ~(2^k - 1)) — exact, not an
    approximation."""
    batch, n, L = x.shape
    assert n & (n - 1) == 0 and n >= 256, "pallas path needs pow2 n >= 256"
    log_n = n.bit_length() - 1
    _, partners, lo_mask = _ntt_tables(spec, n, inverse)
    tws = _mont_ntt_tables(spec, n, inverse)

    skip = 0
    if n_nonzero is not None and not inverse and 0 < n_nonzero < n:
        np2 = 1 if n_nonzero <= 1 else 1 << (n_nonzero - 1).bit_length()
        skip = (n // np2).bit_length() - 1
    rev = _bit_reverse_perm(n)
    if skip:
        idx = rev[np.arange(n) & ~((1 << skip) - 1)]
    else:
        idx = rev
    x = jnp.take(x, jnp.asarray(idx), axis=-2)
    xm = jnp.transpose(x, (0, 2, 1))                 # (batch, L, n)

    T = min(_TILE, n)
    n_small = min(log_n, T.bit_length() - 1)         # stages with half < T
    if skip < n_small:
        halves = tuple(1 << s for s in range(skip, n_small))
        w_all = jnp.asarray(np.ascontiguousarray(
            np.stack([tws[s].T for s in range(skip, n_small)])))   # (S, L, n)
        lo_all = jnp.asarray(
            lo_mask[skip:n_small].astype(np.uint32))               # (S, n)
        xm = _fused_small_call(spec, n, batch, halves)(xm, w_all, lo_all)

    for s in range(max(n_small, skip), log_n):
        w = jnp.asarray(np.ascontiguousarray(tws[s].T))      # (L, n)
        lo = jnp.asarray(lo_mask[s][None, :].astype(np.uint32))
        xm = _stage_call(spec, n, 1 << s, batch)(xm, w, lo)

    if inverse:
        R = (1 << (16 * L)) % spec.modulus
        n_inv_mont = (spec.inv(n % spec.modulus) * R) % spec.modulus
        n_inv = ints_to_limbs([n_inv_mont], spec)[0]
        c = jnp.asarray(np.broadcast_to(n_inv[:, None], (L, n)).copy())
        xm = _scale_call(spec, n, batch)(xm, c)

    return jnp.transpose(xm, (0, 2, 1))


def mul_mod_pallas(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Fused elementwise modular multiply: (N, L) x (N, L) -> (N, L).

    N must be a multiple of 512; the standalone fused-modmul kernel used by
    throughput-critical elementwise paths and microbenchmarks."""
    N, L = a.shape
    T = 512
    assert N % T == 0
    am = a.reshape(N // T, T, L).transpose(0, 2, 1)
    bm = b.reshape(N // T, T, L).transpose(0, 2, 1)

    def kernel(a_ref, b_ref, out_ref):
        out_ref[0] = _mul_mod_block(a_ref[0], b_ref[0], spec)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N // T, L, T), jnp.uint32),
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((1, L, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, T), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(am, bm)
    return out.transpose(0, 2, 1).reshape(N, L)
