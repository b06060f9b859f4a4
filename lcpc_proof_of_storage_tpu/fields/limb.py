"""Device-side prime-field arithmetic: 16-bit limb vectors in uint32.

This is the TPU-native replacement for the reference's ff/ff_derive
Montgomery arithmetic (SURVEY.md §2.6).  A field element is a vector of
``L = num_limbs16`` 16-bit limbs stored in a trailing axis of a uint32
array, little-endian limb order.  All ops are shape-polymorphic over leading
batch axes and compile to pure VPU integer ops under jit.

Key algorithm choices (vs a literal port of the Rust Montgomery code):
  * 16x16->32 limb products are exact in uint32 ((2^16-1)^2 < 2^32); the
    schoolbook convolution runs one vectorized multiply per left-operand
    limb, accumulating lo/hi 16-bit halves separately so partial sums stay
    far below 2^32 (trace size O(L), not O(L^2)).
  * Reduction is truncated Barrett with precomputed mu = floor(2^(16m)/p)
    per wide width m: q = (floor(z/b^(L-1)) * mu) >> 16(m-L+1), r = z - q*p
    computed mod b^(L+1); r < 4p so three conditional subtractions finish.
  * Dot products / tensor collapses accumulate lazily (unreduced 32-bit limb
    sums) and reduce once per output element, chunked so sums stay < 2^32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .field import FieldSpec, ints_to_limbs

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def _int_to_limbs_np(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(n)], dtype=np.uint32)


class LimbField:
    """Per-field device context: constants + jittable limb ops."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.num_limbs16
        self.p_int = spec.modulus
        self.p = _int_to_limbs_np(spec.modulus, self.L)
        self._mu: dict[int, np.ndarray] = {}

    # -- constants ----------------------------------------------------------
    def mu(self, m: int) -> np.ndarray:
        """floor(2^(16m) / p) as limbs (for reducing m-limb wide values)."""
        if m not in self._mu:
            mu_int = (1 << (16 * m)) // self.p_int
            n_limbs = max(1, (mu_int.bit_length() + 15) // 16)
            self._mu[m] = _int_to_limbs_np(mu_int, n_limbs)
        return self._mu[m]

    def zeros(self, shape=()) -> jnp.ndarray:
        return jnp.zeros((*shape, self.L), dtype=U32)

    def ones(self, shape=()) -> jnp.ndarray:
        one = np.zeros((self.L,), np.uint32)
        one[0] = 1
        return jnp.broadcast_to(jnp.asarray(one), (*shape, self.L))

    def const(self, value: int, shape=()) -> jnp.ndarray:
        v = jnp.asarray(_int_to_limbs_np(value % self.p_int, self.L))
        return jnp.broadcast_to(v, (*shape, self.L))

    def array(self, values) -> jnp.ndarray:
        """list of python ints -> (n, L) device array."""
        return jnp.asarray(ints_to_limbs(values, self.spec))

    # -- carry plumbing ------------------------------------------------------
    @staticmethod
    def _carry_norm(digits: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """Normalize base-2^16 digits (each < 2^32) to out_len 16-bit limbs.

        Sequential carry chain over the limb axis (static unrolled, 2 ops
        per limb).  Overflow beyond out_len limbs is dropped (callers
        guarantee fit or explicitly want mod 2^(16*out_len)).
        """
        n = digits.shape[-1]
        outs = []
        carry = jnp.zeros(digits.shape[:-1], dtype=U32)
        for i in range(out_len):
            t = carry + (digits[..., i] if i < n else 0)
            outs.append(t & MASK16)
            carry = t >> 16
        return jnp.stack(outs, axis=-1)

    @staticmethod
    def _add_raw(a: jnp.ndarray, b: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """a + b as out_len 16-bit limbs (no modular reduction)."""
        n = max(a.shape[-1], b.shape[-1])
        pad_a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])])
        pad_b = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(0, n - b.shape[-1])])
        return LimbField._carry_norm(pad_a + pad_b, out_len)

    @staticmethod
    def _sub_raw(a: jnp.ndarray, b: jnp.ndarray):
        """(a - b) mod 2^(16*len(a)), plus final borrow flag (1 if a < b)."""
        La = a.shape[-1]
        outs = []
        borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), dtype=U32)
        for i in range(La):
            y = (b[..., i] if i < b.shape[-1] else 0) + borrow
            t = a[..., i] + np.uint32(1 << 16) - y
            outs.append(t & MASK16)
            borrow = jnp.asarray(1, U32) - (t >> 16)
        return jnp.stack(outs, axis=-1), borrow

    @staticmethod
    def _mul_raw(a: jnp.ndarray, b: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
        """Product of limb vectors: (..., m) x (..., n) -> (..., out_len).

        Exact when out_len >= m + n (the default); with smaller out_len the
        result is the product mod 2^(16*out_len) (used for truncated
        Barrett).  One vectorized multiply per left limb; partial sums of
        min(m, n) products' halves stay < 2^31.
        """
        m, n = a.shape[-1], b.shape[-1]
        full = m + n
        if out_len is None:
            out_len = full
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        acc = jnp.zeros((*shape, full + 1), dtype=U32)
        for i in range(min(m, out_len)):
            prod = a[..., i : i + 1] * b          # (..., n), exact uint32
            acc = acc.at[..., i : i + n].add(prod & MASK16)
            acc = acc.at[..., i + 1 : i + n + 1].add(prod >> 16)
        return LimbField._carry_norm(acc, out_len)

    # -- modular ops ---------------------------------------------------------
    def _cond_sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        """a - p if a >= p else a; a may have >= L limbs (value < 2^(16*len))."""
        d, borrow = self._sub_raw(a, jnp.asarray(self.p))
        return jnp.where((borrow == 0)[..., None], d, a)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = self._add_raw(a, b, self.L + 1)
        return self._cond_sub_p(s)[..., : self.L]

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        d, borrow = self._sub_raw(a, b)
        dp = self._add_raw(d, jnp.asarray(self.p), self.L)
        return jnp.where((borrow > 0)[..., None], dp, d)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(a.shape[:-1]), a)

    def barrett_reduce(self, z: jnp.ndarray) -> jnp.ndarray:
        """Reduce z (m limbs, z < 2^(16m)) mod p -> L limbs."""
        m = z.shape[-1]
        L = self.L
        if m <= L:
            z = jnp.pad(z, [(0, 0)] * (z.ndim - 1) + [(0, L - m)])
            return self._cond_sub_p(z)
        mu = jnp.asarray(self.mu(m))
        q1 = z[..., L - 1 :]                      # floor(z / b^(L-1))
        q_wide = self._mul_raw(q1, mu)            # (m-L+1) + len(mu) limbs
        q = q_wide[..., m - L + 1 :]              # floor(q1*mu / b^(m-L+1))
        qp = self._mul_raw(q, jnp.asarray(self.p), out_len=L + 1)
        r, _ = self._sub_raw(z[..., : L + 1], qp)  # mod b^(L+1); r < 4p exact
        r = self._cond_sub_p(r)
        r = self._cond_sub_p(r)
        r = self._cond_sub_p(r)
        return r[..., :L]

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self.barrett_reduce(self._mul_raw(a, b))

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def pow_scalar(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a static small exponent.  NOTE: O(log e) sequential muls
        in the graph — use host arithmetic for large exponents (e.g. inv)."""
        result = self.ones(a.shape[:-1])
        base = a
        while e > 0:
            if e & 1:
                result = self.mul(result, base)
            base = self.mul(base, base)
            e >>= 1
        return result

    # -- lazy dot products ---------------------------------------------------
    def dot(self, a: jnp.ndarray, b: jnp.ndarray, axis: int = -2,
            chunk: int = 4096) -> jnp.ndarray:
        """Modular dot product: sum over `axis` of a*b (limb axis last).

        Products are carried to exact 2L-limb form, summed unreduced in
        chunks bounded so limb sums stay < 2^32, then Barrett-reduced.
        This is the kernel under collapse_columns (v = r^T M) and the
        verifier's column dot products (lcpc-2d/src/lib.rs:1126-1154,
        1009-1030).
        """
        prod = self._mul_raw(a, b)            # (..., 2L) exact, broadcasted
        n = prod.shape[axis]
        chunk = min(chunk, 1 << 15)
        if n <= chunk:
            s = jnp.sum(prod, axis=axis, dtype=U32)
            return self.barrett_reduce(self._carry_norm(s, 2 * self.L + 2))
        pad = (-n) % chunk
        if pad:
            pad_width = [(0, 0)] * prod.ndim
            pad_width[axis] = (0, pad)
            prod = jnp.pad(prod, pad_width)
        prod = jnp.moveaxis(prod, axis if axis >= 0 else prod.ndim + axis, 0)
        prod = prod.reshape((-1, chunk) + prod.shape[1:])
        s = jnp.sum(prod, axis=1, dtype=U32)           # (nchunks, ..., 2L)
        red = self.barrett_reduce(self._carry_norm(s, 2 * self.L + 2))
        s2 = jnp.sum(red, axis=0, dtype=U32)
        return self.barrett_reduce(self._carry_norm(s2, self.L + 2))

    def sum(self, a: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
        """Modular sum along an axis (not the limb axis)."""
        n = a.shape[axis]
        assert n <= (1 << 16)
        s = jnp.sum(a, axis=axis, dtype=U32)
        return self.barrett_reduce(self._carry_norm(s, self.L + 2))


@functools.lru_cache(maxsize=None)
def limb_field(spec: FieldSpec) -> LimbField:
    return LimbField(spec)
