"""Collapse (v_t = t^T C mod p) as int8 MXU matmuls.

The VPU collapse kernels (ops/collapse_pallas.py) measured ~5% of the
compute speed-of-light at the Brakedown 2^25 prove shape (r5 roofline) —
the per-(row, limb) scalar-broadcast accumulation is VPU-op bound.  This
path reformulates the whole collapse as ONE dense integer matmul on the
MXU (the "MXU limb matmul" idea from the r4 backlog):

  * field elements split into base-256 digits: (rows, npr, L) uint16 limbs
    -> (rows, npr*2L) bytes (byte b of limb i sits at position 2i+b, so
    byte significance is positional);
  * the t-tensor rows likewise -> (T*2L, rows) bytes;
  * one int8 x int8 -> int32 dot_general computes every byte-pair product
    sum over rows.  int8 is signed, so bytes ride as (x - 128) with the
    exact rank-1 correction  P_u8 = P_i8 + 128*(rowsum_A + colsum_B)
    - 128^2 * rows  applied after the matmul;
  * byte-pair sums fold into base-256 digit sums G[e] = sum_{u+v=e} P[u,v]
    (polynomial-multiply structure, 2L shifted adds);
  * one byte-carry round + 16-bit-limb recombine + Barrett gives canonical
    limbs.

Digit-sum bound: G[e] <= 2L * rows * 255^2 must stay < 2^31 (int32 dot
accumulator headroom) -> rows <= _MXU_MAX_ROWS per chunk; larger matrices
are chunked and partials added mod p, exactly like the VPU kernels'
_MAX_ROWS chunking.

Everything is plain XLA (dot_general + elementwise): the MXU does the
heavy lifting, no Pallas needed.  Bit-identity against the XLA limb-dot
oracle: tests/test_collapse_mxu.py; hardware validation + timing:
scripts/r5_campaign.py collapse_mxu.

Reference op: collapse_columns / verifier collapses,
lcpc-2d/src/lib.rs:1126-1154.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.field import FieldSpec
from ..fields.limb import limb_field

#: G[e] <= 2L*rows*255^2 < 2^31  ->  rows <= 2^31 / (2L * 255^2); for
#: L=16 that is 1032 — chunk at 1024 (power of two, same partial-sum
#: mod-p combine as the VPU kernels)
_MXU_MAX_ROWS = 1024


def _bytes_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """(..., L) uint32 16-bit limbs -> (..., 2L) base-256 digits."""
    lo = x & 0xFF
    hi = (x >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1],
                                                2 * x.shape[-1])


def _collapse_chunk_mxu(coeffs: jnp.ndarray, t_limbs: jnp.ndarray,
                        spec: FieldSpec) -> jnp.ndarray:
    lf = limb_field(spec)
    L = spec.num_limbs16
    rows, npr, _ = coeffs.shape
    T = t_limbs.shape[0]
    assert rows <= _MXU_MAX_ROWS

    B_u8 = _bytes_lastdim(coeffs.astype(jnp.uint32)).astype(jnp.int32)
    B_u8 = B_u8.reshape(rows, npr * 2 * L)
    A_u8 = _bytes_lastdim(t_limbs.astype(jnp.uint32)).astype(jnp.int32)
    A_u8 = jnp.transpose(A_u8, (0, 2, 1)).reshape(T * 2 * L, rows)

    Ai = (A_u8 - 128).astype(jnp.int8)
    Bi = (B_u8 - 128).astype(jnp.int8)
    P = jax.lax.dot_general(Ai, Bi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    # exact unsigned semantics: AB = (a+128)(b+128) summed over rows
    SA = jnp.sum(A_u8, axis=1, dtype=jnp.int32)          # (T*2L,)
    SB = jnp.sum(B_u8, axis=0, dtype=jnp.int32)          # (npr*2L,)
    # Sa_i8 = SA - 128*rows (same for B), so the constant term flips sign:
    # P_u8 = P_i8 + 128*(SA + SB) - 128^2 * rows
    P = P + 128 * (SA[:, None] + SB[None, :]) - (128 * 128 * rows)

    # byte-pair sums -> base-256 digit sums G[e] = sum_{u+v=e} P[u, v]
    P = P.reshape(T, 2 * L, npr, 2 * L)
    G = jnp.zeros((T, npr, 4 * L + 2), jnp.int32)
    for u in range(2 * L):
        G = G.at[:, :, u : u + 2 * L].add(P[:, u])
    # one byte-carry round: digit max 2L*rows*255^2 (~2^30.5) -> ~2^22,
    # so the 16-bit recombine below stays within uint32
    lo = G & 0xFF
    G = lo.at[:, :, 1:].add(G[:, :, :-1] >> 8)
    H = (G[:, :, 0::2] + (G[:, :, 1::2] << 8)).astype(jnp.uint32)
    # (T, npr, 2L+1) uint32 digits < 2^32; normalize + Barrett
    H16 = lf._carry_norm(H, 2 * L + 2)
    return lf.barrett_reduce(H16)


def collapse_tensors_mxu(coeffs: jnp.ndarray, t_limbs: jnp.ndarray,
                         spec: FieldSpec) -> jnp.ndarray:
    """(rows, npr, L) x (T, rows, L) -> (T, npr, L) canonical limbs.

    Same contract as ops.collapse_pallas.collapse_tensors; jittable."""
    lf = limb_field(spec)
    rows = coeffs.shape[0]
    if rows <= _MXU_MAX_ROWS:
        return _collapse_chunk_mxu(coeffs, t_limbs, spec)
    acc = None
    for r0 in range(0, rows, _MXU_MAX_ROWS):
        r1 = min(r0 + _MXU_MAX_ROWS, rows)
        part = _collapse_chunk_mxu(coeffs[r0:r1], t_limbs[:, r0:r1], spec)
        acc = part if acc is None else lf.add(acc, part)
    return acc
