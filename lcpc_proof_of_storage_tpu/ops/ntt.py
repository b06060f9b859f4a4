"""Batched radix-2 number-theoretic transform over limb-decomposed fields.

TPU-native replacement for the reference's fffft crate (the Ligero row
encoder; lcpc-ligero-pc/src/lib.rs:162-164 calls fft_io_pc per row).
Design differences from the Rust NTT (deliberate, documented):

  * The whole row batch is transformed at once: the reference's per-row
    rayon encode loop (lcpc-2d/src/lib.rs:677-682) becomes one XLA program.
  * All log2(n) butterfly stages are expressed in a uniform XOR-partner
    form and driven by a single lax.fori_loop over precomputed per-stage
    twiddle/partner/mask tables — the limb-arithmetic body is traced and
    compiled exactly once per transform, and maps to gathers + one batched
    modmul per stage on device.
  * Output is in natural evaluation order w^0..w^(n-1) (input is
    bit-reversed first).  fffft's io/oi orderings are an internal
    convention of the Rust stack; prover and verifier both use this module,
    so all protocol invariants (and iNTT∘NTT = id, lcpc_online.rs:568-574)
    hold.

Stage s (0-based, half = 2^s, m = 2*half) updates position j with partner
p = j XOR half and twiddle W_s[j] = w_m^(j mod half):
    y   = x * W_s            (batched modmul)
    x'j = x_j + y_p          if bit s of j is 0     (lo)
    x'j = x_p - y_j          otherwise              (hi)
which is exactly the classic DIT butterfly pair (a + w b, a - w b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import FieldSpec, ints_to_limbs
from ..fields.limb import LimbField, limb_field


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _ntt_tables(spec: FieldSpec, n: int, inverse: bool):
    """Per-stage tables: twiddles (logn, n, L), partners (logn, n),
    lo-masks (logn, n)."""
    w = spec.nth_root_of_unity(n)
    if inverse:
        w = spec.inv(w)
    log_n = n.bit_length() - 1
    L = spec.num_limbs16
    tws = np.empty((log_n, n, L), np.uint32)
    partners = np.empty((log_n, n), np.int32)
    lo_mask = np.empty((log_n, n), np.uint32)
    j = np.arange(n)
    for s in range(log_n):
        half = 1 << s
        m = half * 2
        wm = pow(w, n // m, spec.modulus)
        # twiddle per block-local index k (k < half)
        tw_vals = [1] * half
        for k in range(1, half):
            tw_vals[k] = (tw_vals[k - 1] * wm) % spec.modulus
        tw_limbs = np.asarray(ints_to_limbs(tw_vals, spec))     # (half, L)
        tws[s] = tw_limbs[j % half]
        partners[s] = j ^ half
        lo_mask[s] = ((j >> s) & 1) == 0
    # cached as numpy: converting to device arrays here would leak tracers
    # when first called inside a jit trace
    return tws, partners, lo_mask


def _ntt_core(x: jnp.ndarray, lf: LimbField, tables, rev: np.ndarray) -> jnp.ndarray:
    n = x.shape[-2]
    log_n = n.bit_length() - 1
    tws, partners, lo_mask = (jnp.asarray(t) for t in tables)
    x = jnp.take(x, jnp.asarray(rev), axis=-2)

    def stage(s, x):
        W = jax.lax.dynamic_index_in_dim(tws, s, 0, keepdims=False)
        perm = jax.lax.dynamic_index_in_dim(partners, s, 0, keepdims=False)
        lo = jax.lax.dynamic_index_in_dim(lo_mask, s, 0, keepdims=False)
        y = lf.mul(x, W)
        xp = jnp.take(x, perm, axis=-2)
        yp = jnp.take(y, perm, axis=-2)
        lo_val = lf.add(x, yp)
        hi_val = lf.sub(xp, y)
        return jnp.where((lo > 0)[..., None], lo_val, hi_val)

    return jax.lax.fori_loop(0, log_n, stage, x)


def ntt(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Forward NTT along axis -2: coefficients -> evaluations at w^0..w^(n-1)."""
    n = x.shape[-2]
    assert n & (n - 1) == 0 and n > 1
    lf = limb_field(spec)
    return _ntt_core(x, lf, _ntt_tables(spec, n, False), _bit_reverse_perm(n))


def intt(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Inverse NTT along axis -2: evaluations -> coefficients."""
    n = x.shape[-2]
    assert n & (n - 1) == 0 and n > 1
    lf = limb_field(spec)
    y = _ntt_core(x, lf, _ntt_tables(spec, n, True), _bit_reverse_perm(n))
    n_inv = ints_to_limbs([spec.inv(n % spec.modulus)], spec)[0]
    return lf.mul(y, jnp.asarray(n_inv))


def _auto_ntt(x: jnp.ndarray, spec: FieldSpec, inverse: bool,
              n_nonzero: int | None = None) -> jnp.ndarray:
    """Route through the fused Pallas path when available (TPU, n >= 256).

    Both directions default to the v2 kernels (constant-multiply tables
    + pair-grouped butterflies, ops/ntt_pallas2.py); LCPC_NTT_KERNEL=v1
    falls back to the Montgomery stage kernels."""
    import os
    from ..codes.ligero import _use_pallas
    if _use_pallas(x.shape[-2]):
        if os.environ.get("LCPC_NTT_KERNEL", "v2") != "v1":
            from .ntt_pallas2 import ntt_pallas2
            return ntt_pallas2(x, spec, n_nonzero=None if inverse else n_nonzero,
                               inverse=inverse)
        from .ntt_pallas import ntt_pallas
        return ntt_pallas(x, spec, inverse=inverse, n_nonzero=n_nonzero)
    return intt(x, spec) if inverse else ntt(x, spec)


def encode_rows(coeff_rows: jnp.ndarray, spec: FieldSpec, n_cols: int) -> jnp.ndarray:
    """Ligero row encode: zero-pad rows (batch, n_per_row, L) to n_cols, NTT.

    Matches the reference semantics of copying the coefficient row into the
    front of an n_cols buffer and transforming in place
    (lcpc-2d/src/lib.rs:677-682 + lcpc-ligero-pc encode).
    """
    b, npr, L = coeff_rows.shape
    assert npr <= n_cols
    padded = jnp.zeros((b, n_cols, L), dtype=coeff_rows.dtype)
    padded = padded.at[:, :npr, :].set(coeff_rows)
    return _auto_ntt(padded, spec, inverse=False, n_nonzero=npr)


def decode_rows(enc_rows: jnp.ndarray, spec: FieldSpec, n_per_row: int) -> jnp.ndarray:
    """Inverse of encode_rows (lcpc_online.rs:568-574 decode_row)."""
    return _auto_ntt(enc_rows, spec, inverse=True)[:, :n_per_row, :]
