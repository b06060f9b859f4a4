"""End-to-end wide-row (cross-chip) commitments.

The reference cannot commit a matrix whose rows exceed one host's RAM
("when the number of columns gets too big the server cannot keep an entire
row in memory... could work around by doing the FFT in parts",
proof-of-storage/limitations.md:8-10).  This module is the TPU answer: the
COLUMN axis of the encoded matrix is sharded across the mesh, rows are
encoded with the four-step cross-chip NTT (all-to-alls over ICI,
cross_chip_ntt.py), column hashing runs shard-local, the Merkle reduce and
the prover/verifier tensor collapses ride GSPMD.

Everything downstream (prove / verify / open_column / serde) is the stock
core engine: a wide LcCommit is bit-identical to the single-chip one
(oracle: tests/test_wide.py), only its device arrays are sharded.

Usage:
    enc = LigeroEncoding.new_from_dims(npr, n_cols, spec).with_mesh(mesh)
    comm = commit(coeffs, enc)          # dispatches to the wide pipeline
    proof = prove(comm, outer, enc, tr) # unchanged
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.encoding import LcEncoding
from ..fields.field import FieldSpec
from ..ops.blake3_pallas import hash_columns_auto as hash_columns
from .cross_chip_ntt import cross_chip_ntt


def wide_chip_col_budget() -> int:
    """Columns one chip is allowed to hold before sharded_commit switches to
    the wide pipeline (env LCPC_CHIP_COL_BUDGET)."""
    import os
    return int(os.environ.get("LCPC_CHIP_COL_BUDGET", 1 << 21))


def wide_hash_columns(comm: jnp.ndarray, spec: FieldSpec, mesh: Mesh,
                      axis: str = "d") -> jnp.ndarray:
    """Column digests of a column-sharded encoded matrix, computed
    shard-locally (no cross-chip traffic; the Pallas hash kernel sees local
    shapes)."""
    fn = jax.shard_map(lambda c: hash_columns(c, spec), mesh=mesh,
                       in_specs=P(None, axis, None), out_specs=P(axis, None))
    return fn(comm)


def wide_commit(coeffs, enc: LcEncoding, mesh: Mesh, axis: str = "d"):
    """Commit with the encoded-column axis sharded over `mesh`."""
    from ..core.commit import commit
    return commit(coeffs, enc.with_mesh(mesh, axis))


def wide_commit_from_matrix(coeff_mat: jnp.ndarray, dims, enc: LcEncoding):
    """The wide device pipeline given a prepared coefficient matrix.

    Called from core.commit() when enc.mesh is set.  Runs eagerly (each
    shard_map compiles its own program) so the cross-chip twiddle tables are
    device arguments, never HLO literals.
    """
    from ..core.commit import LcCommit, merkle_hashes_from_leaves
    n_rows, n_per_row, n_cols = dims
    mesh, axis = enc.mesh, enc.mesh_axis
    # keep the (huge) coefficient matrix column-sharded too: the prove-time
    # collapses are then local dots with the output sharded on n_per_row
    if n_per_row % mesh.devices.size == 0:
        coeff_mat = jax.device_put(
            coeff_mat, NamedSharding(mesh, P(None, axis, None)))
    padded = jnp.zeros((n_rows, n_cols, coeff_mat.shape[-1]),
                       coeff_mat.dtype).at[:, :n_per_row, :].set(coeff_mat)
    comm = enc.encode_wide(padded)                  # (n_rows, >=n_cols, L) sharded
    # Brakedown's ragged codeword length is padded up to a mesh multiple
    # (zero columns at the end); hash shard-locally on the padded width and
    # slice the pad digests off before the Merkle build.
    leaves = wide_hash_columns(comm, enc.spec, mesh, axis)[:n_cols]
    hashes = merkle_hashes_from_leaves(leaves, n_cols)
    return LcCommit(coeffs=coeff_mat, comm=comm, n_rows=n_rows,
                    n_cols=n_cols, n_per_row=n_per_row, hashes=hashes)
