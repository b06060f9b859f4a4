"""Cross-chip NTT: transform rows whose length exceeds one chip's budget.

The reference caps a row's NTT length at what fits one host's RAM
(limitations.md:8-10 — "could work around by doing the FFT in parts"); the
TPU-native answer (BASELINE north star / SURVEY §5 long-context analogue) is
the distributed four-step NTT with the transform axis sharded over the mesh
and the matrix transposes exchanged all-to-all over ICI.

Decomposition (n = n1*n2, j = j1 + n1*j2, k = k2 + n2*k1):
    X[k2 + n2*k1] = NTT_n1^{j1->k1}( w_n^{j1*k2} * NTT_n2^{j2->k2}(x) )
so a size-n transform becomes: local size-n2 batch NTTs, a twiddle
multiply, local size-n1 batch NTTs, with all-to-all transposes moving the
sharded axis between steps (3 all-to-alls to also return the result in
natural order, contiguously sharded).

Runs under shard_map; the local NTTs use the single-chip kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.field import FieldSpec, ints_to_limbs
from ..fields.limb import limb_field
from ..ops.ntt import intt, ntt


@functools.lru_cache(maxsize=None)
def _cross_twiddles(spec: FieldSpec, n1: int, n2: int,
                    inverse: bool = False) -> np.ndarray:
    """(n1, n2, L): w_n^(j1*k2) (w^-1 powers for the inverse transform)."""
    n = n1 * n2
    w = spec.nth_root_of_unity(n)
    if inverse:
        w = spec.inv(w)
    p = spec.modulus
    rows = []
    for j1 in range(n1):
        base = pow(w, j1, p)
        vals = [1] * n2
        for k2 in range(1, n2):
            vals[k2] = (vals[k2 - 1] * base) % p
        rows.append(ints_to_limbs(vals, spec))
    return np.stack(rows)


def cross_chip_ntt(x: jnp.ndarray, spec: FieldSpec, mesh: Mesh,
                   axis: str = "d", n1: int | None = None,
                   inverse: bool = False) -> jnp.ndarray:
    """NTT along axis -2 of x (batch, n, L), n sharded over `mesh`.

    Returns the natural-order transform, contiguously sharded on the same
    axis.  Bit-identical to the single-chip ntt (oracle:
    tests/test_cross_chip_ntt.py).  With inverse=True this is the four-step
    factorization of the inverse transform: local iNTTs carry the 1/n2 and
    1/n1 scalings (product 1/n) and the middle twiddles use w^-1."""
    batch, n, L = x.shape
    D = mesh.devices.size
    if n1 is None:
        n1 = 1 << ((n.bit_length() - 1) // 2)
        while n1 % D:
            n1 *= 2
    n2 = n // n1
    assert n1 * n2 == n and n1 % D == 0 and n2 % D == 0, (n1, n2, D)
    lf = limb_field(spec)
    local_ntt = intt if inverse else ntt
    tw = jnp.asarray(_cross_twiddles(spec, n1, n2, inverse))

    def local_fn(xl, twl):
        # xl: (batch, n/D, L) = j2-local-range x all j1; twl: (n1/D, n2, L)
        xm = xl.reshape(batch, n2 // D, n1, L)          # [j2_loc, j1]
        # a2a 1: split j1, concat j2 -> (batch, n2, n1/D, L)
        xm = jax.lax.all_to_all(xm, axis, split_axis=2, concat_axis=1,
                                tiled=True)
        # inner NTT over j2 (size n2)
        xm = jnp.transpose(xm, (0, 2, 1, 3))            # (b, n1/D, n2, L)
        xm = local_ntt(xm.reshape(-1, n2, L), spec).reshape(batch, n1 // D, n2, L)
        # twiddle w^(j1*k2) (j1 local chunk)
        xm = lf.mul(xm, twl[None])
        # a2a 2: split k2, concat j1 -> (batch, n1, n2/D, L)
        xm = jnp.transpose(xm, (0, 2, 1, 3))            # (b, n2, n1/D, L)
        xm = jax.lax.all_to_all(xm, axis, split_axis=1, concat_axis=2,
                                tiled=True)             # (b, n2/D, n1, L)
        # outer NTT over j1 (size n1) -> R[k1, k2_loc]
        xm = local_ntt(xm.reshape(-1, n1, L), spec).reshape(batch, n2 // D, n1, L)
        # a2a 3: split k1, concat k2 -> k1 sharded, k2 local
        xm = jnp.transpose(xm, (0, 2, 1, 3))            # (b, n1, n2/D, L)
        xm = jax.lax.all_to_all(xm, axis, split_axis=1, concat_axis=2,
                                tiled=True)             # (b, n1/D, n2, L)
        # natural order: k = k1*n2 + k2 -> row-major flatten
        return xm.reshape(batch, n // D, L)

    fn = jax.shard_map(local_fn, mesh=mesh,
                   in_specs=(P(None, axis, None), P(axis, None, None)),
                   out_specs=P(None, axis, None))
    return fn(x, tw)


def wide_encode_rows(coeff_rows: jnp.ndarray, spec: FieldSpec, n_cols: int,
                     mesh: Mesh, axis: str = "d") -> jnp.ndarray:
    """Ligero row encode for rows wider than one chip's budget: zero-pad to
    n_cols (sharded) and run the cross-chip NTT.  Output codewords are
    contiguously sharded on the column axis — exactly the layout the
    column-hashing stage wants (each chip hashes its column block locally).

    Bit-identical to ops.ntt.encode_rows (oracle: tests/test_cross_chip_ntt
    ::test_wide_encode_rows)."""
    b, npr, L = coeff_rows.shape
    assert npr <= n_cols
    padded = jnp.zeros((b, n_cols, L), dtype=coeff_rows.dtype)
    padded = padded.at[:, :npr, :].set(coeff_rows)
    return cross_chip_ntt(padded, spec, mesh, axis=axis)
