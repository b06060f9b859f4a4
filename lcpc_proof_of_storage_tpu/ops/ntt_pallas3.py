"""Third-generation Pallas NTT: two-kernel four-step with in-kernel
transposes (round-4 large-n rescue).

Why v2 loses at large n: every butterfly stage with half >= tile pays a
full HBM round trip ((log2 n - 10) passes at n >= 2^18), plus the initial
full-lane bit-reverse gather.  The round-3 four-step removed the large
stages but its three lane-axis jnp.take permutations cost more than the
stages they replaced (BENCH_SUMMARY r3 "Negative results").

v3 keeps the four-step factorization n = n2 * n1 (j = j1 + n1*j2,
k = k2 + n2*k1) but moves the expensive reorderings where the hardware
likes them:

  * **Kernel A** (per n1-lane tile): transposes its (L, n2, TL) block to
    (L, TL, n2) IN VMEM (Mosaic 32-bit transpose, negligible next to the
    limb convolutions), runs the n2-point DIT stages over the now-lane-major
    j2 axis with dense (rows, n2) twiddle tables, applies the four-step
    diagonal twiddle w_n^{j1*k2} as a fused generic multiply, and
    transposes back.  One HBM round trip for ALL "strided" stages.
  * **Kernel B** (per n2-row batch): n1-point DIF (Gentleman-Sande) stages
    over the lane axis — DIF takes NATURAL-order input, so no input
    bit-reverse is needed; output lands bit-reversed (k1 = rev1(r1)).
  * The remaining permutations are a bit-reverse+duplicate take over the
    j2 ROW axis (contiguous n1-lane rows, bandwidth-bound — realizes the
    zero-pad pruning for free) and a final minor-axis transpose + rev1 row
    take.  No lane-axis gathers anywhere.

Zero-pad pruning: with n_nonzero = npr, rows j2 >= ceil(npr/n1) are zero,
so pass A skips its first `skip` stages and the input take duplicates the
np2(ceil(npr/n1)) nonzero rows (same semantics as ops/ntt_pallas.py:426).

Bit-identical to ops.ntt.ntt (oracle: tests/test_ntt_pallas3.py).  Forward
only (the decode path keeps the v2 stage pipeline).  Replaces fffft's
recursive NTT for the commit encode hot path
(lcpc-ligero-pc/src/lib.rs:162-164) at n in [2^15, 2^20] (the extended
n > 2^18 window uses n1 = 2048).  Measured on TPU v5e (campaign r4):
1.21x over v2 at n = 2^15/2^16, 1.63x at 2^17, 1.73x at 2^18.
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
from .ntt import _bit_reverse_perm
from .ntt_pallas import MASK16, U32, _field_consts_np
from .ntt_pallas2 import _PACK, _cmul_rows_np, _skip_for, _twiddle_ints

#: kernel A lane-tile width over the j1 axis (128 = one vreg of lanes)
_TL_A = int(os.environ.get("LCPC_PALLAS3_TLA", "128"))
#: kernel B sublane batch (k2 rows per block)
_S2_B = int(os.environ.get("LCPC_PALLAS3_S2B", "8"))
#: factor bounds: n1 <= _N1MAX (kernel B tables), n2 <= _N2MAX (kernel A VMEM)
_N1MAX = int(os.environ.get("LCPC_PALLAS3_N1MAX", "1024"))
_N2MAX = int(os.environ.get("LCPC_PALLAS3_N2MAX", "256"))
#: extended window for n in (2^18, 2^20]: bigger kernel-B stage tables
#: (n1=2048) and a taller kernel-A block (n2 up to 512, ~60 MB scoped VMEM)
_N1MAX_XL = int(os.environ.get("LCPC_PALLAS3_N1MAX_XL", "2048"))
_N2MAX_XL = int(os.environ.get("LCPC_PALLAS3_N2MAX_XL", "512"))
#: smallest n the v3 factorization pays off for (v2 wins below)
_NMIN = 1 << 15


def _vmem_params():
    """Raise the Mosaic scoped-VMEM cap: the default 16 MB limit is far
    below v5e's 128 MB physical VMEM, and the unrolled limb-stage bodies
    hold ~15 block-sized temps live (measured 29.6 MB at n2=256)."""
    mb = int(os.environ.get("LCPC_VMEM_LIMIT_MB", "100"))
    return pltpu.CompilerParams(vmem_limit_bytes=mb << 20)


def _split3(n: int) -> tuple | None:
    """(n1, n2) with n1*n2 = n, n1 the lane-axis (pass B) factor."""
    if n & (n - 1) or n < _NMIN:
        return None
    if n > _N1MAX * _N2MAX:
        # extended window (2^27-2^29 commit column counts): n1 = 2048
        n1 = _N1MAX_XL
        n2 = n // n1
        if n2 > _N2MAX_XL:
            return None
        return n1, n2
    if n >= _N1MAX * 128:
        n1 = _N1MAX
    else:
        n1 = n // 128
    n2 = n // n1
    if n1 < 128 or n2 < 2 or n1 > _N1MAX or n2 > _N2MAX:
        return None
    return n1, n2


def v3_applicable(n: int) -> bool:
    return _split3(n) is not None


# ---------------------------------------------------------------------------
# shape-generic limb primitives (axis 0 = limb rows, any trailing dims)
# ---------------------------------------------------------------------------
# Same arithmetic as ops/ntt_pallas.py's (rows, T) blocks, generalized to
# (rows, *S) so kernels can work on (L, S2, T) 3D blocks.

def _sd(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[i] = x[i-d] (zeros shifted in at the bottom rows)."""
    if d == 0:
        return x
    rows = x.shape[0]
    if d >= rows:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [jnp.zeros((d,) + x.shape[1:], U32), x[: rows - d]], axis=0)


def _cp(digits: jnp.ndarray, out_len: int, want_carry: bool = False):
    """Normalize base-2^16 digits (< 2^32) to out_len 16-bit limbs
    (two split-shift-add passes + Kogge-Stone lookahead)."""
    m2 = out_len + (1 if want_carry else 0)
    rows = digits.shape[0]
    if rows < m2:
        digits = jnp.concatenate(
            [digits, jnp.zeros((m2 - rows,) + digits.shape[1:], U32)], axis=0)
    else:
        digits = digits[:m2]
    d1 = (digits & MASK16) + _sd(digits >> 16, 1)
    d2 = (d1 & MASK16) + _sd(d1 >> 16, 1)
    g = d2 >> 16
    p = jnp.where((d2 & MASK16) == MASK16, jnp.uint32(1), jnp.uint32(0))
    d = 1
    while d < m2:
        g = g | (p & _sd(g, d))
        p = p & _sd(p, d)
        d *= 2
    carry_in = _sd(g, 1)
    out = (d2 + carry_in) & MASK16
    if want_carry:
        return out[:out_len], out[out_len : out_len + 1]
    return out[:out_len]


def _pr(x: jnp.ndarray, offset: int, total: int) -> jnp.ndarray:
    """Place x's rows at [offset, offset+rows) in a (total, *S) zero block."""
    rows = x.shape[0]
    keep = min(rows, total - offset)
    if keep <= 0:
        return jnp.zeros((total,) + x.shape[1:], U32)
    parts = []
    if offset > 0:
        parts.append(jnp.zeros((offset,) + x.shape[1:], U32))
    parts.append(x[:keep])
    tail = total - offset - keep
    if tail > 0:
        parts.append(jnp.zeros((tail,) + x.shape[1:], U32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _ca(a: jnp.ndarray, b: jnp.ndarray, out_rows: int) -> jnp.ndarray:
    """Unnormalized product digits of limb blocks a (La, *S) x b (Lb, *Sb)
    with broadcastable trailing dims."""
    La = a.shape[0]
    tail = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((out_rows,) + tail, U32)
    for i in range(La):
        prod = a[i : i + 1] * b
        acc = acc + _pr(prod & MASK16, i, out_rows)
        acc = acc + _pr(prod >> 16, i + 1, out_rows)
    return acc


def _sb(x: jnp.ndarray, y: jnp.ndarray):
    """(x - y) mod 2^(16 rows) + borrow flag (complement-add)."""
    rows = x.shape[0]
    comp = MASK16 - y
    s = x + comp
    one = jnp.concatenate(
        [jnp.full((1,) + x.shape[1:], 1, U32),
         jnp.zeros((rows - 1,) + x.shape[1:], U32)], axis=0)
    s = s + one
    out, carry = _cp(s, rows, want_carry=True)
    borrow = jnp.uint32(1) - carry
    return out, borrow


def _csp(r: jnp.ndarray, p_pad: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sb(r, p_pad)
    return jnp.where(borrow > 0, r, d)


def _madd(a, b, p_pad, L):
    s = _cp(a + b, L + 1)
    return _csp(s, p_pad)[:L]


def _msub(a, b, p, L):
    d, borrow = _sb(a, b)
    dp = _cp(d + p, L)
    return jnp.where(borrow > 0, dp, d)


def _const3(limbs: np.ndarray, tail: tuple, rows: int | None = None):
    rows = rows if rows is not None else len(limbs)
    parts = [jnp.full((1,) + tail, np.uint32(limbs[i]) if i < len(limbs)
                      else np.uint32(0), U32) for i in range(rows)]
    return jnp.concatenate(parts, axis=0)


def _cmul(a: jnp.ndarray, w: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Constant-table multiply: a (L, *S) x w (L*L, *Sw) -> a*c mod p.
    Same math as ntt_pallas2._cmul_block (short Barrett tail)."""
    L = spec.num_limbs16
    tail = jnp.broadcast_shapes(a.shape[1:], w.shape[1:])
    mu_np, p_np, mu_len = _field_consts_np(spec)
    mu = _const3(mu_np, tail)
    p_pad = _const3(p_np, tail, rows=L + 1)

    acc_lo = jnp.zeros((L + 1,) + tail, U32)
    acc_hi = jnp.zeros((L + 1,) + tail, U32)
    for i in range(L):
        prod = a[i : i + 1] * w[i * L : (i + 1) * L]
        acc_lo = acc_lo + _pr(prod & MASK16, 0, L + 1)
        acc_hi = acc_hi + _pr(prod >> 16, 0, L + 1)
    digits = acc_lo + _sd(acc_hi, 1)
    z = _cp(digits, L + 2)
    q1 = z[L - 1 :]
    q_wide = _cp(_ca(q1, mu, 3 + mu_len + 1), 3 + mu_len)
    q = q_wide[L + 1 : L + 3]
    qp = _cp(_ca(q, _const3(p_np, tail), L + 2), L + 1)
    r, _ = _sb(z[: L + 1], qp)
    r = _csp(r, p_pad)
    r = _csp(r, p_pad)
    return r[:L]


def _gmul(a: jnp.ndarray, b: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    """Generic a*b mod p for (L, *S) canonical blocks (full convolution +
    m=2L truncated Barrett; ntt_pallas2._gmul_block semantics)."""
    L = spec.num_limbs16
    tail = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    mu_np, p_np, mu_len = _field_consts_np(spec)
    z = _cp(_ca(a, b, 2 * L + 1), 2 * L)
    q1 = z[L - 1 :]
    q_wide = _cp(_ca(q1, _const3(mu_np, tail), L + 1 + mu_len + 1),
                 L + 1 + mu_len)
    q = q_wide[L + 1 :]
    qp = _cp(_ca(q, _const3(p_np, tail), L + 2), L + 1)
    r, _ = _sb(z[: L + 1], qp)
    p_pad = _const3(p_np, tail, rows=L + 1)
    r = _csp(r, p_pad)
    r = _csp(r, p_pad)
    r = _csp(r, p_pad)
    return r[:L]


# ---------------------------------------------------------------------------
# lane-axis stage bodies on (L, S, T) blocks
# ---------------------------------------------------------------------------

def _lane_slices3(x, group, part, half):
    T = x.shape[2]
    parts = [x[:, :, g * group + part * half : g * group + part * half + half]
             for g in range(T // group)]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


def _interleave3(lo, hi, half):
    Th = lo.shape[2]
    parts = []
    for g in range(Th // half):
        parts.append(lo[:, :, g * half : (g + 1) * half])
        parts.append(hi[:, :, g * half : (g + 1) * half])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)


def _dit_stages3(x, w_ref, lo_ref, spec: FieldSpec, halves: tuple):
    """Ascending DIT butterflies over the lane axis of (L, S, T).
    Tables: w_ref (R, T) stacked per stage (packed stages at T/2, padded);
    lo_ref (nf, T) masks for the roll (half < _PACK) stages."""
    L = spec.num_limbs16
    T = x.shape[2]
    _, p_np, _ = _field_consts_np(spec)
    p_pad = _const3(p_np, (1, T), rows=L + 1)
    p = p_pad[:L]
    p_pad_h = _const3(p_np, (1, T // 2), rows=L + 1)
    p_h = p_pad_h[:L]
    row = nf = 0
    for half in halves:
        w = w_ref[row : row + L * L][:, None, :]          # (L*L, 1, T)
        row += L * L
        if half < _PACK:
            lo = lo_ref[nf : nf + 1][:, None, :]          # (1, 1, T)
            nf += 1
            y = _cmul(x, w, spec)
            xp = jnp.where(lo > 0, pltpu.roll(x, T - half, 2),
                           pltpu.roll(x, half, 2))
            yp = jnp.where(lo > 0, pltpu.roll(y, T - half, 2),
                           pltpu.roll(y, half, 2))
            lo_val = _madd(x, yp, p_pad, L)
            hi_val = _msub(xp, y, p, L)
            x = jnp.where(lo > 0, lo_val, hi_val)
        else:
            group = 2 * half
            xl = _lane_slices3(x, group, 0, half)
            xh = _lane_slices3(x, group, 1, half)
            y = _cmul(xh, w[:, :, : T // 2], spec)
            lo_val = _madd(xl, y, p_pad_h, L)
            hi_val = _msub(xl, y, p_h, L)
            x = _interleave3(lo_val, hi_val, half)
    return x


def _dif_stages3(x, w_ref, lo_ref, spec: FieldSpec, halves_desc: tuple):
    """Descending DIF (Gentleman-Sande) butterflies over the lane axis:
    out_lo = a + b; out_hi = W * (a - b).  Natural-order input, output at
    position r holds X[rev(r)].  Stage tables are the SAME values as the
    DIT tables (W_s[t mod half]), applied in descending-half order."""
    L = spec.num_limbs16
    T = x.shape[2]
    _, p_np, _ = _field_consts_np(spec)
    p_pad = _const3(p_np, (1, T), rows=L + 1)
    p = p_pad[:L]
    p_pad_h = _const3(p_np, (1, T // 2), rows=L + 1)
    p_h = p_pad_h[:L]
    row = nf = 0
    for half in halves_desc:
        w = w_ref[row : row + L * L][:, None, :]
        row += L * L
        if half < _PACK:
            lo = lo_ref[nf : nf + 1][:, None, :]
            nf += 1
            # partner fetch like the DIT roll case: xp = x[j+half] at lo
            # lanes, x[j-half] at hi lanes
            xp = jnp.where(lo > 0, pltpu.roll(x, T - half, 2),
                           pltpu.roll(x, half, 2))
            s = _madd(x, xp, p_pad, L)                    # a + b   (lo)
            d = _msub(xp, x, p, L)                        # a - b   (hi)
            y = _cmul(d, w, spec)
            x = jnp.where(lo > 0, s, y)
        else:
            group = 2 * half
            xl = _lane_slices3(x, group, 0, half)
            xh = _lane_slices3(x, group, 1, half)
            s = _madd(xl, xh, p_pad_h, L)
            d = _msub(xl, xh, p_h, L)
            y = _cmul(d, w[:, :, : T // 2], spec)
            x = _interleave3(s, y, half)
    return x


# ---------------------------------------------------------------------------
# host-side tables
# ---------------------------------------------------------------------------

def _stage_tables(spec: FieldSpec, sub_n: int, skip: int, desc: bool):
    """Stacked (R, sub_n) stage tables + lo masks for a sub_n-point
    transform occupying the full lane tile (one group).  Values are the
    standard W_s[t mod 2^s]; `desc` only changes the stacking order."""
    L = spec.num_limbs16
    stages = _twiddle_ints(spec, sub_n, False)
    order = range(skip, sub_n.bit_length() - 1)
    if desc:
        order = reversed(list(order))
    rows, los, halves = [], [], []
    for s in order:
        half = 1 << s
        halves.append(half)
        vals = stages[s]
        if half < _PACK:
            reps = np.array([vals[t % half] for t in range(sub_n)], object)
            rows.append(_cmul_rows_np(reps, spec))
            los.append((((np.arange(sub_n) >> s) & 1) == 0).astype(np.uint32))
        else:
            reps = np.array([vals[t % half] for t in range(sub_n // 2)],
                            object)
            tab = np.zeros((L * L, sub_n), np.uint32)
            tab[:, : sub_n // 2] = _cmul_rows_np(reps, spec)
            rows.append(tab)
    w = (np.concatenate(rows, axis=0) if rows
         else np.zeros((0, sub_n), np.uint32))
    lo = np.stack(los) if los else np.zeros((1, sub_n), np.uint32)
    return tuple(halves), w, lo, len(los)


@functools.lru_cache(maxsize=None)
def _v3_tables_np(spec: FieldSpec, n: int, n_nonzero: int | None):
    """numpy bundle: input row take, pass-A/B stage tables, diagonal
    twiddle (j1-major layout for kernel A's transposed view), rev1."""
    n1, n2 = _split3(n)
    L = spec.num_limbs16
    p_int = spec.modulus

    nnz2 = None
    if n_nonzero is not None and 0 < n_nonzero < n:
        nnz2 = min(n2, (n_nonzero + n1 - 1) // n1)
    skip = _skip_for(n2, nnz2)

    # input row take over the j2 axis: bit-reverse + 2^skip duplication
    log_m = n2.bit_length() - 1 - skip
    rev_m = _bit_reverse_perm(1 << log_m) if log_m > 0 else np.zeros(1, np.int32)
    t2 = np.arange(n2)
    rev_in = rev_m[t2 >> skip].astype(np.int32)

    halves_a, w_a, lo_a, nf_a = _stage_tables(spec, n2, skip, desc=False)
    halves_b, w_b, lo_b, nf_b = _stage_tables(spec, n1, 0, desc=True)

    # diagonal twiddle w_n^{j1*k2}, laid out (L, n1, n2) — j1-major to match
    # kernel A's in-kernel-transposed (L, TL, n2) blocks
    w = spec.nth_root_of_unity(n)
    tw_vals = np.empty((n1, n2), object)
    row = [1] * n2
    wk = [1] * n2                       # w^{j1} powers per k2: w^{k2} table
    base = 1
    for k2 in range(n2):
        wk[k2] = base
        base = (base * w) % p_int
    for j1 in range(n1):
        if j1:
            row = [(r * v) % p_int for r, v in zip(row, wk)]
        tw_vals[j1] = row
    from ..fields.field import ints_to_limbs
    flat = ints_to_limbs([int(v) for v in tw_vals.reshape(-1)], spec)
    tw = np.ascontiguousarray(
        np.asarray(flat, np.uint32).reshape(n1, n2, L).transpose(2, 0, 1))

    rev1 = _bit_reverse_perm(n1).astype(np.int32)
    return dict(n1=n1, n2=n2, skip=skip, rev_in=rev_in, rev1=rev1, tw=tw,
                halves_a=halves_a, w_a=w_a, lo_a=lo_a, nf_a=nf_a,
                halves_b=halves_b, w_b=w_b, lo_b=lo_b, nf_b=nf_b)


def v3_device_tables(spec: FieldSpec, n: int,
                     n_nonzero: int | None = None) -> tuple:
    """v3 operand bundle as a device pytree (thread through jit as args —
    the diagonal table is ~16 MB at n=2^18 and must not become an HLO
    literal).  Length-6 tuple distinguishes it from v2 (3) and the
    four-step bundles (7/8)."""
    t = _v3_tables_np(spec, n, n_nonzero)
    return (jax.device_put(t["w_a"]), jax.device_put(t["lo_a"]),
            jax.device_put(t["tw"]), jax.device_put(t["w_b"]),
            jax.device_put(t["lo_b"]), jax.device_put(t["rev_in"]))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

#: largest nz whose in-kernel bitrev unrolls as ONE static shuffle
#: (concatenate of nz row slices — measured fastest at small nz).  Beyond
#: it the shuffle uses the two-factor form (kernel_split): rev_k factors
#: into two O(sqrt(nz)) shuffles + a rank-4 transpose, keeping the MLIR
#: payload ~constant (the single unrolled shuffle tripped the axon
#: remote-compile HTTP 413 at nz = 64, and a fori_loop + dynamic_slice
#: form does not lower in Mosaic TC kernels — r4 VERDICT #2)
_NZ_UNROLL = int(os.environ.get("LCPC_PALLAS3_NZ_UNROLL", "32"))


def _kernel_a(spec: FieldSpec, halves: tuple, nz: int = 0, skip: int = 0):
    """nz > 0: the block carries only the nz nonzero j2 rows; the bitrev
    permutation + 2^skip duplication (the former jnp.take HBM pass) runs
    IN VMEM — the kernel reads 1/2^skip of the data the full block would."""
    split_rev = nz > _NZ_UNROLL
    if nz and not split_rev:
        rev_m = tuple(int(v) for v in _bit_reverse_perm(nz))
    elif nz:
        # two-factor bitrev: rev_k(b*A + a) = revA[a]*B + revB[b], so the
        # full-row shuffle becomes two O(sqrt(nz)) static shuffles + one
        # rank-4 transpose — constant-size MLIR (the single unrolled
        # shuffle tripped the axon remote-compile 413 at nz=64, and the
        # fori_loop+dynamic_slice form does not lower in Mosaic TC kernels)
        ka = (nz.bit_length() - 1) // 2
        A_f = 1 << ka
        B_f = nz // A_f
        rev_af = tuple(int(v) for v in _bit_reverse_perm(A_f))
        rev_bf = tuple(int(v) for v in _bit_reverse_perm(B_f))

    def body(x, w_ref, lo_ref, tw_ref, out_ref):
        x = jnp.transpose(x, (0, 2, 1))               # (L, TL, n2)
        if halves:
            x = _dit_stages3(x, w_ref, lo_ref, spec, halves)
        x = _gmul(x, tw_ref[:], spec)                 # diag w_n^{j1*k2}
        out_ref[0] = jnp.transpose(x, (0, 2, 1))

    def _dup(x):
        if skip:
            # out[t2] = perm[t2 >> skip]: consecutive duplication
            L_, _, TL_ = x.shape
            x = jnp.broadcast_to(x[:, :, None, :],
                                 (L_, nz, 1 << skip, TL_)).reshape(
                                     L_, nz << skip, TL_)
        return x

    def kernel(x_ref, w_ref, lo_ref, tw_ref, out_ref):
        x = x_ref[0]                                  # (L, n2|nz, TL)
        if nz:
            if nz > 1:
                x = jnp.concatenate([x[:, r : r + 1, :] for r in rev_m],
                                    axis=1)           # static bitrev rows
            x = _dup(x)
        body(x, w_ref, lo_ref, tw_ref, out_ref)

    def kernel_split(x_ref, w_ref, lo_ref, tw_ref, out_ref):
        x0 = x_ref[0]
        L_, _, TL_ = x0.shape
        x = x0.reshape(L_, A_f, B_f, TL_)             # row i = a*B + b
        x = jnp.concatenate([x[:, a : a + 1] for a in rev_af], axis=1)
        x = jnp.concatenate([x[:, :, b : b + 1] for b in rev_bf], axis=2)
        # out[b*A + a] = in[revA[a]*B + revB[b]] = in[rev_k(b*A + a)]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(L_, nz, TL_)
        body(_dup(x), w_ref, lo_ref, tw_ref, out_ref)

    return kernel_split if split_rev else kernel


def _kernel_b(spec: FieldSpec, halves_desc: tuple):
    def kernel(x_ref, w_ref, lo_ref, out_ref):
        out_ref[0] = _dif_stages3(x_ref[0], w_ref, lo_ref, spec, halves_desc)

    return kernel


@functools.lru_cache(maxsize=None)
def _call_a(spec: FieldSpec, n1: int, n2: int, batch: int, halves: tuple,
            w_rows: int, nf: int, nz: int = 0, skip: int = 0):
    L = spec.num_limbs16
    TL = min(_TL_A, n1)
    nt = n1 // TL
    kernel = _kernel_a(spec, halves, nz, skip)
    in_rows = nz if nz else n2
    # grid (j, b): b innermost so the per-tile diag/table blocks are fetched
    # once per j, not once per (j, b)
    in_specs = [
        pl.BlockSpec((1, L, in_rows, TL), lambda j, b: (b, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((w_rows, n2), lambda j, b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(nf, 1), n2), lambda j, b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, TL, n2), lambda j, b: (0, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n2, n1), jnp.uint32),
        grid=(nt, batch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, n2, TL), lambda j, b: (b, 0, 0, j),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(),
    )


@functools.lru_cache(maxsize=None)
def _call_b(spec: FieldSpec, n1: int, n2: int, batch: int,
            halves_desc: tuple, w_rows: int, nf: int):
    L = spec.num_limbs16
    S2 = min(_S2_B, n2)
    nt = n2 // S2
    kernel = _kernel_b(spec, halves_desc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, L, n2, n1), jnp.uint32),
        grid=(nt, batch),
        in_specs=[
            pl.BlockSpec((1, L, S2, n1), lambda k, b: (b, 0, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, n1), lambda k, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(nf, 1), n1), lambda k, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, S2, n1), lambda k, b: (b, 0, k, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(),
    )


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def ntt_pallas3(x: jnp.ndarray, spec: FieldSpec,
                n_nonzero: int | None = None,
                tables: tuple | None = None) -> jnp.ndarray:
    """Forward NTT along axis -2 of (batch, n, L); bit-identical to
    ops.ntt.ntt.  tables: optional pytree from v3_device_tables (same
    spec/n/n_nonzero)."""
    batch, n, L = x.shape
    t = _v3_tables_np(spec, n, n_nonzero)
    n1, n2 = t["n1"], t["n2"]
    if tables is not None:
        w_a, lo_a, tw, w_b, lo_b, rev_in = tables
        assert w_a.shape == t["w_a"].shape, "v3 tables mismatch (n/skip)"
    else:
        w_a, lo_a = jnp.asarray(t["w_a"]), jnp.asarray(t["lo_a"])
        tw = jnp.asarray(t["tw"])
        w_b, lo_b = jnp.asarray(t["w_b"]), jnp.asarray(t["lo_b"])
        rev_in = jnp.asarray(t["rev_in"])

    # only the first nz_rows = n2 >> skip j2-rows carry data (rev_in never
    # indexes past them): slice BEFORE the limb transpose so the pass
    # processes 1/2^skip of the matrix (rho=1/4 encode: 4x less traffic)
    nz_rows = n2 >> t["skip"]
    xs = x[:, : nz_rows * n1, :]
    xm = jnp.transpose(xs, (0, 2, 1)).reshape(batch, L, nz_rows, n1)
    # in-kernel take gate: nz <= _NZ_UNROLL emits the bitrev row shuffle as
    # one static concatenate (measured fastest); larger nz uses the
    # two-factor split shuffle whose MLIR size is ~constant (the unrolled
    # form tripped the axon remote-compile HTTP 413 at nz = 64 — r4
    # VERDICT #2, now unlocked for the 2^27+ n_cols >= 2^18 shapes)
    if (nz_rows <= int(os.environ.get("LCPC_PALLAS3_INKERNEL_NZMAX", "256"))
            and os.environ.get("LCPC_PALLAS3_INKERNEL_TAKE", "1") != "0"):
        # bitrev + duplication runs inside kernel A (VMEM row shuffle) —
        # removes the take's HBM round trip and shrinks A's read
        call = _call_a(spec, n1, n2, batch, t["halves_a"], t["w_a"].shape[0],
                       t["nf_a"], nz_rows, t["skip"])
        xm = call(xm, w_a, lo_a, tw)
    else:
        xm = jnp.take(xm, rev_in, axis=2)        # bitrev + dup j2 rows
        xm = _call_a(spec, n1, n2, batch, t["halves_a"], t["w_a"].shape[0],
                     t["nf_a"])(xm, w_a, lo_a, tw)  # rows k2, lanes j1
    xm = _call_b(spec, n1, n2, batch, t["halves_b"], t["w_b"].shape[0],
                 t["nf_b"])(xm, w_b, lo_b)       # lanes r1 (k1=rev1(r1))
    xm = jnp.swapaxes(xm, 2, 3)                  # (b, L, n1[r1], n2[k2])
    xm = jnp.take(xm, jnp.asarray(t["rev1"]), axis=2)   # rows k1
    return jnp.transpose(xm.reshape(batch, L, n), (0, 2, 1))
