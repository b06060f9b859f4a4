"""Multi-chip sharded commitment pipeline.

The TPU-native distribution design (SURVEY.md §2.7 / BASELINE north star):

  * The coefficient matrix is **row-sharded** across the device mesh
    ("batch NTT"): each chip encodes its rows locally — the reference's
    rayon row-parallel encode (lcpc-2d/src/lib.rs:677-682) becomes data
    parallelism over chips with zero communication.
  * The encoded matrix is then resharded to **column-sharded** via one
    all-to-all (inserted by GSPMD from the sharding constraints): column
    hashing is sequential down a column, so each chip hashes a contiguous
    block of whole columns locally.
  * Merkle: leaf digests stay column-sharded; the tree is a log-depth
    reduction, computed from gathered leaves (tiny: 32 bytes/column).
  * The prover's tensor collapses (v = r^T M) reduce over the row axis:
    under row sharding GSPMD turns the lazy limb dot into a local partial
    sum + psum over the mesh.

Everything is driven by sharding constraints under jit, so the same code
runs single-chip (mesh of 1) or on a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.commit import LcCommit, _coeffs_to_matrix, _encode_matrix, \
    merkle_hashes_from_leaves
from ..core.encoding import LcEncoding
from ..fields.limb import limb_field
from ..ops.blake3_pallas import hash_columns_auto as hash_columns


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _sharded_pipeline(enc: LcEncoding, mesh: Mesh, n_cols: int, axis: str = "d"):
    row_sharding = NamedSharding(mesh, P(axis, None, None))
    col_sharding = NamedSharding(mesh, P(None, axis, None))
    leaf_sharding = NamedSharding(mesh, P(axis, None))

    def f(coeff_mat):
        cm = jax.lax.with_sharding_constraint(coeff_mat, row_sharding)
        comm = _encode_matrix(cm, enc, n_cols)          # local batch NTT
        comm = jax.lax.with_sharding_constraint(comm, col_sharding)  # all-to-all
        leaves = hash_columns(comm, enc.spec)           # local column hashing
        leaves = jax.lax.with_sharding_constraint(leaves, leaf_sharding)
        return comm, leaves

    return jax.jit(f)


def sharded_commit(coeffs, enc: LcEncoding, mesh: Mesh, axis: str = "d") -> LcCommit:
    """Drop-in commit() that runs the heavy pipeline sharded over `mesh`.

    Produces a bit-identical commitment to the single-chip path (oracle:
    tests/test_sharded.py root equality).
    """
    coeff_mat, (n_rows, n_per_row, n_cols) = _coeffs_to_matrix(coeffs, enc)
    assert n_rows % mesh.devices.size == 0 or n_rows >= mesh.devices.size, (
        "row count should not be smaller than the mesh")
    pipeline = _enc_mesh_jit(enc, mesh, n_cols, axis)
    comm, leaves = pipeline(coeff_mat)
    hashes = merkle_hashes_from_leaves(leaves, n_cols)
    return LcCommit(coeffs=coeff_mat, comm=comm, n_rows=n_rows,
                    n_cols=n_cols, n_per_row=n_per_row, hashes=hashes)


def _enc_mesh_jit(enc, mesh, n_cols, axis):
    cache = getattr(enc, "_mesh_jit_cache", None)
    if cache is None:
        cache = {}
        enc._mesh_jit_cache = cache
    key = (id(mesh), n_cols, axis)
    if key not in cache:
        cache[key] = _sharded_pipeline(enc, mesh, n_cols, axis)
    return cache[key]


def sharded_collapse(coeff_mat: jnp.ndarray, tensor_limbs: jnp.ndarray,
                     spec, mesh: Mesh, axis: str = "d") -> jnp.ndarray:
    """v = tensor^T . coeffs with the row axis sharded (psum via GSPMD)."""
    lf = limb_field(spec)
    row_sharding = NamedSharding(mesh, P(axis, None, None))
    t_sharding = NamedSharding(mesh, P(axis, None, None))

    @jax.jit
    def f(cm, t):
        cm = jax.lax.with_sharding_constraint(cm, row_sharding)
        t = jax.lax.with_sharding_constraint(t, t_sharding)
        return lf.dot(cm, t, axis=0)

    return f(coeff_mat, tensor_limbs)


def training_step(enc: LcEncoding, mesh: Mesh, axis: str = "d"):
    """One full sharded 'step': encode + hash + Merkle leaves + two tensor
    collapses (degree test + eval rows) — the complete device-side work of
    commit+prove.  Returns a jitted fn(coeff_mat, rand_tensor, outer_tensor).
    """
    lf = limb_field(enc.spec)
    row_sharding = NamedSharding(mesh, P(axis, None, None))
    col_sharding = NamedSharding(mesh, P(None, axis, None))

    def f(coeff_mat, rand_tensor, outer_tensor):
        cm = jax.lax.with_sharding_constraint(coeff_mat, row_sharding)
        comm = _encode_matrix(cm, enc, enc.n_cols)
        comm = jax.lax.with_sharding_constraint(comm, col_sharding)
        leaves = hash_columns(comm, enc.spec)
        p_random = lf.dot(cm, rand_tensor[:, None, :], axis=0)
        p_eval = lf.dot(cm, outer_tensor[:, None, :], axis=0)
        return comm, leaves, p_random, p_eval

    return jax.jit(f)
