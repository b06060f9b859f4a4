"""Linear-code encoding interface (reference: LcEncoding trait,
lcpc-2d/src/lib.rs:75-105).

Encodings operate on whole batches of rows at once (the TPU-native version
of the reference's per-row rayon encode loop).

Domain-separation labels: the reference's def_labels! macro has a literal
bug (lcpc-2d/src/macros.rs:29-36) — the identifier is never interpolated,
so every encoding shares the byte labels b"$l//DT" etc.  We reproduce that
exactly, since transcript bit-compatibility depends on it.
"""

from __future__ import annotations

import abc

import jax.numpy as jnp

from ..fields.field import FieldSpec

LABEL_DT = b"$l//DT"
LABEL_PR = b"$l//PR"
LABEL_PE = b"$l//PE"
LABEL_CO = b"$l//CO"


def ceil_log2(v: int) -> int:
    """Reference log2 (lcpc-2d/src/lib.rs:857): log2 of next power of two."""
    if v <= 1:
        return 0
    return (v - 1).bit_length()


def n_degree_tests(lam: int, length: int, flog2: int) -> int:
    """lcpc-2d/src/lib.rs:642-645."""
    den = flog2 - ceil_log2(length)
    return (lam + den - 1) // den


def next_power_of_two(v: int) -> int:
    return 1 if v <= 1 else 1 << (v - 1).bit_length()


class LcEncoding(abc.ABC):
    """A linear code usable by the 2d polynomial commitment engine."""

    spec: FieldSpec

    # wide-row (cross-chip) mode: when set, commit/verify route encodes
    # through the mesh-sharded pipeline (parallel/wide.py)
    mesh = None
    mesh_axis: str = "d"

    def with_mesh(self, mesh, axis: str = "d"):
        """Enable the wide pipeline: the encoded-column axis is sharded over
        `mesh` and rows are encoded with the cross-chip NTT.

        Returns a COPY — the receiver is untouched, so routing one commit
        through the wide path cannot silently flip every later use of the
        same encoding into mesh mode.  Per-encoding caches (jit programs,
        device tables) are not shared: they key on mode-dependent encode
        behavior."""
        import copy
        new = copy.copy(self)
        new.mesh = mesh
        new.mesh_axis = axis
        for attr in ("_jit_cache", "_v2_dev_tables", "_device_operands"):
            if hasattr(new, attr):
                try:
                    delattr(new, attr)
                except AttributeError:
                    pass
        return new

    def encode_wide(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Mesh-sharded encode of (batch, n_cols, L) padded buffers.  Only
        codes with a cross-chip formulation implement this."""
        raise NotImplementedError(f"{type(self).__name__} has no wide encode")

    @abc.abstractmethod
    def encode(self, rows: jnp.ndarray, operands=None) -> jnp.ndarray:
        """Encode rows: (batch, n_cols, L) with coefficients in the first
        n_per_row positions and zeros after -> (batch, n_cols, L) codewords.
        (In-place buffer semantics of the reference's encode.)

        `operands` is the pytree from device_operands(), threaded through
        jit as runtime arguments; None falls back to closure-captured
        tables (embedded in the compiled program as literals — fine for
        small tables, fatal for Brakedown's multi-MB gather tables)."""

    def device_operands(self):
        """Large device-resident tables the encode needs, as a pytree to be
        passed through jit as arguments (not baked into the HLO).  Must be
        called OUTSIDE any trace.  Default: none."""
        return ()

    @abc.abstractmethod
    def get_dims(self, length: int) -> tuple[int, int, int]:
        """(n_rows, n_per_row, n_cols) for a coefficient vector length."""

    @abc.abstractmethod
    def dims_ok(self, n_per_row: int, n_cols: int) -> bool: ...

    @abc.abstractmethod
    def get_n_col_opens(self) -> int: ...

    @abc.abstractmethod
    def get_n_degree_tests(self) -> int: ...
