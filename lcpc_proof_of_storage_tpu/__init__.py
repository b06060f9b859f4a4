"""TPU-native linear-code polynomial commitment + proof-of-storage framework.

See README.md for the architecture and PARITY.md for the reference
component map.  Typical entry points:

    from lcpc_proof_of_storage_tpu import (
        LigeroEncoding, BrakedownEncoding, commit, prove, verify, Transcript,
        FT63, FT255,
    )
"""

__version__ = "0.1.0"

from .utils.hostmem import tune_allocator as _tune_allocator

_tune_allocator()  # one-time page-fault cost on microVM hosts (see hostmem.py)

from .fields.field import (FIELDS, FT63, FT127, FT191, FT253_192, FT255,
                           WRITEABLE_FT63, FieldSpec)


def __getattr__(name):
    # lazy imports: keep `import lcpc_proof_of_storage_tpu` light (no jax)
    if name in ("LigeroEncoding",):
        from .codes.ligero import LigeroEncoding
        return LigeroEncoding
    if name in ("BrakedownEncoding",):
        from .codes.brakedown import BrakedownEncoding
        return BrakedownEncoding
    if name in ("commit", "prove", "verify", "open_column", "LcCommit",
                "LcEvalProof", "LcColumn", "LcRoot", "VerifierError",
                "ProverError"):
        from .core import commit as _c
        return getattr(_c, name)
    if name == "commit_streamed":
        from .core.streamed import commit_streamed
        return commit_streamed
    if name == "Transcript":
        from .crypto.transcript import Transcript
        return Transcript
    if name == "FileHandler":
        from .pos.file_handler import FileHandler
        return FileHandler
    raise AttributeError(name)


POS_FIELD_NAME = "writeable_ft63"
