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


def _sharded_pipeline(enc: LcEncoding, mesh: Mesh, n_rows: int, n_cols: int,
                      axis: str = "d"):
    """Build the jitted sharded encode+hash pipeline.

    shard_map (not bare GSPMD constraints) so every chip runs the *local*
    kernels on local shapes — that is what lets the fused Pallas NTT/hash
    kernels (which don't auto-partition) run per-shard, and it makes the
    one all-to-all reshard (row-sharded -> column-sharded) explicit.

    Row/column counts need not divide the mesh: rows are zero-padded before
    encoding (extra zero rows are sliced off again before hashing, so
    column digests are untouched) and columns are zero-padded after
    encoding (the padded columns' digests are sliced off before the Merkle
    build, which re-pads with zero digests exactly like the single-chip
    path, lcpc-2d/src/lib.rs:685-694).
    """
    D = mesh.devices.size
    rows_pad = (-n_rows) % D
    cols_pad = (-n_cols) % D
    ops_example = enc.device_operands()

    def local(cm, ops):
        # cm: (rows_p/D, n_per_row, L) local rows
        comm = _encode_matrix(cm, enc, n_cols, ops)     # local batch encode
        if cols_pad:
            comm = jnp.pad(comm, ((0, 0), (0, cols_pad), (0, 0)))
        # one a2a: row-sharded -> column-sharded (all rows, a column block)
        comm = jax.lax.all_to_all(comm, axis, split_axis=1, concat_axis=0,
                                  tiled=True)           # (rows_p, cols_p/D, L)
        if rows_pad:
            comm = comm[:n_rows]                        # padding must not hash
        leaves = hash_columns(comm, enc.spec)           # local column hashing
        return comm, leaves

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), jax.tree.map(lambda _: P(), ops_example)),
        out_specs=(P(None, axis, None), P(axis, None)))

    def f(coeff_mat, ops):
        if rows_pad:
            coeff_mat = jnp.pad(coeff_mat, ((0, rows_pad), (0, 0), (0, 0)))
        comm, leaves = fn(coeff_mat, ops)
        if cols_pad:
            comm = comm[:, :n_cols]
            leaves = leaves[:n_cols]
        return comm, leaves

    return jax.jit(f)


def sharded_commit(coeffs, enc: LcEncoding, mesh: Mesh, axis: str = "d") -> LcCommit:
    """Drop-in commit() that runs the heavy pipeline sharded over `mesh`.

    Produces a bit-identical commitment to the single-chip path (oracle:
    tests/test_sharded.py root equality) for Ligero AND Brakedown — the
    encode tables (Brakedown gather matrices) ride as replicated jit
    arguments, never as HLO literals.
    """
    coeff_mat, (n_rows, n_per_row, n_cols) = _coeffs_to_matrix(coeffs, enc)
    from .wide import wide_chip_col_budget, wide_commit
    if enc.mesh is not None or n_cols > wide_chip_col_budget():
        # rows wider than one chip: column-sharded wide pipeline instead of
        # row sharding (the reference's admitted limitation, limitations.md)
        return wide_commit(coeffs, enc, mesh, axis)
    pipeline = _enc_mesh_jit(enc, mesh, n_rows, n_cols, axis)
    comm, leaves = pipeline(coeff_mat, enc.device_operands())
    hashes = merkle_hashes_from_leaves(leaves, n_cols)
    return LcCommit(coeffs=coeff_mat, comm=comm, n_rows=n_rows,
                    n_cols=n_cols, n_per_row=n_per_row, hashes=hashes)


def _enc_mesh_jit(enc, mesh, n_rows, n_cols, axis):
    cache = getattr(enc, "_mesh_jit_cache", None)
    if cache is None:
        cache = {}
        enc._mesh_jit_cache = cache
    key = (id(mesh), n_rows, n_cols, axis)
    if key not in cache:
        cache[key] = _sharded_pipeline(enc, mesh, n_rows, n_cols, axis)
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
    commit+prove.  Returns a jitted fn(coeff_mat, rand_tensor, outer_tensor)
    (row counts must divide the mesh; the commit path pads, this one is the
    dryrun/bench entry and keeps shapes exact).

    shard_map-local kernels + explicit collectives: the encode/hash run on
    local shards; the collapses psum canonical per-shard partials over the
    mesh (modular addition of D canonical values: limbwise uint32 sums stay
    < 2^32 for any real mesh, one Barrett finishes).
    """
    lf = limb_field(enc.spec)
    n_cols = enc.n_cols
    D = mesh.devices.size
    cols_pad = (-n_cols) % D
    ops_example = enc.device_operands()

    def psum_dot(cm, t):
        part = lf.dot(cm, t[:, None, :], axis=0)        # local partial, canonical
        s = jax.lax.psum(part, axis)                    # limbwise sums < D*2^16
        return lf.barrett_reduce(lf._carry_norm(s, lf.L + 2))

    def local(cm, rand_t, outer_t, ops):
        comm = _encode_matrix(cm, enc, n_cols, ops)
        if cols_pad:
            comm = jnp.pad(comm, ((0, 0), (0, cols_pad), (0, 0)))
        comm = jax.lax.all_to_all(comm, axis, split_axis=1, concat_axis=0,
                                  tiled=True)
        leaves = hash_columns(comm, enc.spec)
        p_random = psum_dot(cm, rand_t)
        p_eval = psum_dot(cm, outer_t)
        return comm, leaves, p_random, p_eval

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis, None),
                  jax.tree.map(lambda _: P(), ops_example)),
        out_specs=(P(None, axis, None), P(axis, None),
                   P(None, None), P(None, None)))

    @jax.jit
    def f(coeff_mat, rand_tensor, outer_tensor, ops):
        comm, leaves, p_random, p_eval = fn(coeff_mat, rand_tensor,
                                            outer_tensor, ops)
        if cols_pad:
            comm = comm[:, :n_cols]
            leaves = leaves[:n_cols]
        return comm, leaves, p_random, p_eval

    # ops stay a call-time argument (never HLO literals); bind them here so
    # callers keep the fn(coeff_mat, rand, outer) signature
    return lambda cm, r, o: f(cm, r, o, enc.device_operands())
