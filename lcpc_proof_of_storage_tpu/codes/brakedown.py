"""Brakedown (SDIG expander) encoding for the 2d polynomial commitment.

Re-creation of lcpc-brakedown-pc/src/lib.rs on top of ops/expander.py.
Soundness/dims formulas follow the reference exactly:

  * n_col_opens = ceil(-lambda / log2(1 - dist/3))          (lib.rs:57-61)
  * n_degree_tests via lcpc-2d                              (lib.rs:64-66)
  * np1-vs-np1/2 proof-size optimization in _new_from_np1   (lib.rs:69-99)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.encoding import LcEncoding, n_degree_tests, next_power_of_two
from ..fields.field import FieldSpec
from ..ops.expander import ExpanderEncoder, SDIG_CODE_3, SdigSpec

LAMBDA = 128


class BrakedownEncoding(LcEncoding):
    def __init__(self, encoder: ExpanderEncoder):
        self._enc = encoder
        self.spec = encoder.field
        self.code_spec = encoder.spec
        self.n_per_row = encoder.n_per_row
        self.n_cols = encoder.codeword_len

    # -- constructors --------------------------------------------------------
    @classmethod
    def new(cls, length: int, seed: int, field: FieldSpec,
            code: SdigSpec = SDIG_CODE_3):
        lncf = float(cls._n_col_opens(code) * length)
        ndt = float(cls._n_degree_tests_for(
            math.ceil(math.sqrt(lncf)) * 2, field))
        np1 = math.ceil(math.sqrt(lncf / ndt))
        return cls._new_from_np1(length, np1, seed, field, code)

    @classmethod
    def new_ml(cls, n_vars: int, seed: int, field: FieldSpec,
               code: SdigSpec = SDIG_CODE_3):
        n_monomials = 1 << n_vars
        lncf = float(cls._n_col_opens(code) * n_monomials)
        ndt = float(cls._n_degree_tests_for(
            math.ceil(math.sqrt(lncf)) * 2, field))
        np1 = next_power_of_two(math.ceil(math.sqrt(lncf / ndt)))
        return cls._new_from_np1(n_monomials, np1, seed, field, code)

    @classmethod
    def new_from_dims(cls, n_per_row: int, n_cols: int, seed: int,
                      field: FieldSpec, code: SdigSpec = SDIG_CODE_3):
        enc = ExpanderEncoder(n_per_row, seed, field, code)
        assert enc.n_per_row == n_per_row
        assert enc.codeword_len == n_cols, (enc.codeword_len, n_cols)
        return cls(enc)

    @classmethod
    def _new_from_np1(cls, length: int, np1: int, seed: int,
                      field: FieldSpec, code: SdigSpec):
        """lib.rs:69-99."""
        np1 = min(np1, length)
        n_col_opens = cls._n_col_opens(code)
        nr1 = (length + np1 - 1) // np1
        nd1 = cls._n_degree_tests_for(np1 * 2, field)
        np2 = np1 // 2
        nr2 = (length + np2 - 1) // np2
        nd2 = cls._n_degree_tests_for(np2 * 2, field)
        sz1 = n_col_opens * nr1 + (1 + nd1) * np1
        sz2 = n_col_opens * nr2 + (1 + nd2) * np2
        n_per_row = np1 if sz1 < sz2 else np2
        return cls(ExpanderEncoder(n_per_row, seed, field, code))

    # -- soundness -----------------------------------------------------------
    @staticmethod
    def _n_col_opens(code: SdigSpec) -> int:
        den = math.log2(1.0 - code.dist() / 3.0)
        return math.ceil(-LAMBDA / den)

    @staticmethod
    def _n_degree_tests_for(n_cols: int, field: FieldSpec) -> int:
        return n_degree_tests(LAMBDA, n_cols, field.num_bits - 1)

    # -- LcEncoding ----------------------------------------------------------
    def encode(self, rows: jnp.ndarray, operands=None) -> jnp.ndarray:
        """rows: (batch, n_cols, L) buffer with the n_per_row coefficients in
        front (reference in-place semantics); output overwrites the buffer."""
        assert rows.shape[-2] == self.n_cols
        if self.mesh is not None:
            return self.encode_wide(rows)
        return self._enc.encode(rows[:, : self.n_per_row, :], operands)

    def encode_wide(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Mesh-sharded expander encode (round 5): every level's gather is
        output-sharded over the mesh with all_gather'ed level inputs —
        see ops/expander.py ExpanderEncoder.encode_wide for the sharding
        argument.  Output width is n_cols rounded up to a mesh multiple;
        parallel/wide.py slices the padding off before the Merkle build.
        Reference graph encode: lcpc-brakedown-pc/src/encode.rs:36-110
        (single-host rayon; no multi-node analogue exists there)."""
        return self._enc.encode_wide(rows, self.mesh, self.mesh_axis)

    def device_operands(self):
        return self._enc.device_operands()

    def get_dims(self, length: int) -> tuple[int, int, int]:
        n_rows = (length + self.n_per_row - 1) // self.n_per_row
        return (n_rows, self.n_per_row, self.n_cols)

    def dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        return (n_per_row < n_cols
                and n_per_row == self.n_per_row
                and n_cols == self.n_cols)

    def get_n_col_opens(self) -> int:
        return self._n_col_opens(self.code_spec)

    def get_n_degree_tests(self) -> int:
        return self._n_degree_tests_for(self.n_cols, self.spec)

    def __repr__(self):
        return (f"BrakedownEncoding({self.spec.name}, n_per_row={self.n_per_row}, "
                f"n_cols={self.n_cols})")
