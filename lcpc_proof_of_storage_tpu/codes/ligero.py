"""Ligero (Reed-Solomon) encoding for the 2d polynomial commitment.

Re-creation of lcpc-ligero-pc/src/lib.rs with the NTT running as a batched
TPU kernel (ops/ntt.py) instead of the fffft crate.  All dimension and
soundness formulas follow the reference exactly:

  * n_col_opens = ceil(-lambda / log2((1+rho)/2))          (lib.rs:61-64)
  * n_degree_tests via lcpc-2d's formula                    (lib.rs:66-68)
  * _get_dims proof-size-optimizing solver                  (lib.rs:70-112)
  * dims_ok: n_per_row < n_cols and n_cols a power of two   (lib.rs:114-118)
"""

from __future__ import annotations

import math
from fractions import Fraction

import jax.numpy as jnp

from ..core.encoding import LcEncoding, ceil_log2, n_degree_tests, next_power_of_two
from ..fields.field import FieldSpec
from ..ops.ntt import ntt

LAMBDA = 128


def _use_pallas(n_cols: int) -> bool:
    """Fused Pallas butterfly kernels: TPU backend and big-enough rows.

    Multi-device pipelines must route encode/hash through shard_map
    (parallel/sharded.py) so the Pallas kernels see per-shard local shapes;
    bare GSPMD jit cannot partition a Pallas call."""
    import os
    if os.environ.get("LCPC_NO_PALLAS"):
        return False
    import jax
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend not in ("cpu",) and n_cols >= 256


class LigeroEncoding(LcEncoding):
    """Reed-Solomon row code at rate rho = rho_num/rho_den (default 1/2,
    matching the reference's ``LigeroEncoding`` alias, lib.rs:188-190)."""

    def __init__(self, spec: FieldSpec, n_per_row: int, n_cols: int,
                 rho: tuple[int, int] = (1, 2)):
        self.spec = spec
        self.rho_num, self.rho_den = rho
        assert self._dims_ok(n_per_row, n_cols), (n_per_row, n_cols)
        assert n_cols <= (1 << spec.two_adicity), "no NTT subgroup of this size"
        self.n_per_row = n_per_row
        self.n_cols = n_cols

    # -- constructors --------------------------------------------------------
    @classmethod
    def new(cls, length: int, spec: FieldSpec, rho: tuple[int, int] = (1, 2)):
        dims = cls._get_dims(length, spec, rho)
        assert dims is not None, "no valid dims"
        _, n_per_row, n_cols = dims
        return cls(spec, n_per_row, n_cols, rho)

    @classmethod
    def new_ml(cls, n_vars: int, spec: FieldSpec, rho: tuple[int, int] = (1, 2)):
        n_monomials = 1 << n_vars
        dims = cls._get_dims(n_monomials, spec, rho)
        assert dims is not None
        n_rows, n_per_row, n_cols = dims
        assert n_rows & (n_rows - 1) == 0
        assert n_per_row & (n_per_row - 1) == 0
        assert n_rows * n_per_row == n_monomials
        return cls(spec, n_per_row, n_cols, rho)

    @classmethod
    def new_from_dims(cls, n_per_row: int, n_cols: int, spec: FieldSpec,
                      rho: tuple[int, int] = (1, 2)):
        return cls(spec, n_per_row, n_cols, rho)

    # -- soundness math ------------------------------------------------------
    @classmethod
    def _n_col_opens(cls, rho: tuple[int, int]) -> int:
        r = rho[0] / rho[1]
        den = math.log2((1.0 + r) / 2.0)
        return math.ceil(-LAMBDA / den)

    @classmethod
    def _n_degree_tests(cls, n_cols: int, spec: FieldSpec) -> int:
        return n_degree_tests(LAMBDA, n_cols, spec.num_bits - 1)

    @classmethod
    def _get_dims(cls, length: int, spec: FieldSpec,
                  rho: tuple[int, int]) -> tuple[int, int, int] | None:
        """Proof-size-optimizing dims solver (lcpc-ligero-pc lib.rs:70-112)."""
        n_col_opens = cls._n_col_opens(rho)
        r = rho[0] / rho[1]
        lncf = float(n_col_opens * length)
        ndt = float(cls._n_degree_tests(math.ceil(math.sqrt(lncf) / r), spec))
        nc1 = next_power_of_two(math.ceil(math.sqrt(lncf / ndt) / r))
        if nc1 > (1 << spec.two_adicity):
            return None

        np1 = nc1 * rho[0] // rho[1]
        nr1 = (length + np1 - 1) // np1
        nd1 = cls._n_degree_tests(nc1, spec)
        assert np1 * nr1 >= length
        assert np1 * (nr1 - 1) < length

        nc2 = nc1 // 2
        np2 = np1 // 2
        if np2 == 0:
            return (nr1, np1, nc1)
        nr2 = (length + np2 - 1) // np2
        nd2 = cls._n_degree_tests(nc2, spec)
        assert np2 * nr2 >= length
        assert np2 * (nr2 - 1) < length

        sz1 = n_col_opens * nr1 + (1 + nd1) * np1
        sz2 = n_col_opens * nr2 + (1 + nd2) * np2
        return (nr1, np1, nc1) if sz1 < sz2 else (nr2, np2, nc2)

    def _dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        return n_per_row < n_cols and n_cols & (n_cols - 1) == 0 and n_cols > 0

    # -- LcEncoding ----------------------------------------------------------
    def encode(self, rows: jnp.ndarray, operands=None) -> jnp.ndarray:
        assert rows.shape[-2] == self.n_cols
        if self.mesh is not None:
            return self.encode_wide(rows)
        if _use_pallas(self.n_cols):
            import os
            kern = os.environ.get("LCPC_NTT_KERNEL", "v3")
            # rows carry coefficients only in the first n_per_row slots
            if kern == "v3":
                from ..ops.ntt_pallas3 import ntt_pallas3, v3_applicable
                if v3_applicable(self.n_cols):
                    return ntt_pallas3(rows, self.spec,
                                       n_nonzero=self.n_per_row,
                                       tables=operands or None)
                kern = "v2"  # fall through outside the v3 size window
            if kern != "v1":
                from ..ops.ntt_pallas2 import ntt_pallas2
                return ntt_pallas2(rows, self.spec, n_nonzero=self.n_per_row,
                                   tables=operands or None)
            from ..ops.ntt_pallas import ntt_pallas
            return ntt_pallas(rows, self.spec, n_nonzero=self.n_per_row)
        return ntt(rows, self.spec)

    def device_operands(self):
        """v2 NTT twiddle tables as jit arguments (hundreds of MB of large-
        stage constants at n_cols >= 2^18 otherwise ride in the HLO and
        overflow compile payloads).  Cached per encoding."""
        import os
        if (self.mesh is not None or not _use_pallas(self.n_cols)
                or os.environ.get("LCPC_NTT_KERNEL", "v3") == "v1"):
            return ()
        tabs = getattr(self, "_v2_dev_tables", None)
        if tabs is None:
            if os.environ.get("LCPC_NTT_KERNEL", "v3") == "v3":
                from ..ops.ntt_pallas3 import v3_applicable, v3_device_tables
                if v3_applicable(self.n_cols):
                    tabs = v3_device_tables(self.spec, self.n_cols,
                                            n_nonzero=self.n_per_row)
            if tabs is None:
                from ..ops.ntt_pallas2 import v2_device_tables
                tabs = v2_device_tables(self.spec, self.n_cols,
                                        n_nonzero=self.n_per_row)
            self._v2_dev_tables = tabs
        return tabs

    def encode_wide(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Cross-chip four-step NTT over the mesh (column axis sharded) —
        rows wider than one chip's budget.  Call eagerly: the cross-chip
        twiddles must ride as shard_map arguments, not outer-jit literals."""
        from ..parallel.cross_chip_ntt import cross_chip_ntt
        return cross_chip_ntt(rows, self.spec, self.mesh, axis=self.mesh_axis)

    def decode(self, rows: jnp.ndarray) -> jnp.ndarray:
        """Inverse (ifft_oi analogue, used by the PoS read path)."""
        if self.mesh is not None:
            from ..parallel.cross_chip_ntt import cross_chip_ntt
            return cross_chip_ntt(rows, self.spec, self.mesh,
                                  axis=self.mesh_axis, inverse=True)
        if _use_pallas(self.n_cols):
            import os
            if os.environ.get("LCPC_NTT_KERNEL", "v2") != "v1":
                from ..ops.ntt_pallas2 import ntt_pallas2
                return ntt_pallas2(rows, self.spec, inverse=True)
            from ..ops.ntt_pallas import ntt_pallas
            return ntt_pallas(rows, self.spec, inverse=True)
        from ..ops.ntt import intt
        return intt(rows, self.spec)

    def get_dims(self, length: int) -> tuple[int, int, int]:
        n_rows = (length + self.n_per_row - 1) // self.n_per_row
        return (n_rows, self.n_per_row, self.n_cols)

    def dims_ok(self, n_per_row: int, n_cols: int) -> bool:
        return (self._dims_ok(n_per_row, n_cols)
                and n_per_row == self.n_per_row and n_cols == self.n_cols)

    def get_n_col_opens(self) -> int:
        return self._n_col_opens((self.rho_num, self.rho_den))

    def get_n_degree_tests(self) -> int:
        return self._n_degree_tests(self.n_cols, self.spec)

    @property
    def rho(self) -> Fraction:
        return Fraction(self.rho_num, self.rho_den)

    def __repr__(self):
        return (f"LigeroEncoding({self.spec.name}, n_per_row={self.n_per_row}, "
                f"n_cols={self.n_cols}, rho={self.rho_num}/{self.rho_den})")
