"""Phase breakdown of prove() and verify() on the real TPU.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/profile_protocol.py [log2n]
Instruments the host/device phases by monkey-timing the internal helpers,
to see what the ~31 ms/dispatch axon tunnel floor and host transcript work
contribute (VERDICT round-1 weak #2: prove 0.33 s / verify 0.42 s at 2^20
vs reference 64c 0.140/0.075 at 2^25 — 20210807_64c_255bit_ligero_dfl_pvs.txt).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core import commit as C
    from lcpc_proof_of_storage_tpu.crypto.transcript import Transcript
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS

    spec = FIELDS["ft255"]
    n = 1 << log2n
    enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    rnd = np.random.default_rng(0)
    coeffs_limbs = rnd.integers(0, 1 << 16, size=(n, spec.num_limbs16),
                                dtype=np.uint32)
    coeffs_limbs[:, -1] = 0
    _ = int(jnp.arange(4).sum())
    comm = C.commit(jnp.asarray(coeffs_limbs), enc)
    root = comm.get_root().root
    x = 0x1234567
    inner = [pow(x, i, spec.modulus) for i in range(comm.n_per_row)]
    xr = pow(x, comm.n_per_row, spec.modulus)
    outer = [pow(xr, i, spec.modulus) for i in range(comm.n_rows)]

    def fresh_tr():
        tr = Transcript(b"profile")
        tr.append_message(b"polycommit", root)
        tr.append_message(b"ncols", enc.get_n_col_opens().to_bytes(8, "little"))
        return tr

    spans = {}

    def wrap(mod, name):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            spans[name] = spans.get(name, 0.0) + time.time() - t0
            return out
        setattr(mod, name, timed)
        return orig

    # warm the jits
    pf = C.prove(comm, outer, enc, fresh_tr())
    C.verify(root, outer, inner, pf, enc, fresh_tr())

    for phase, fn in (("prove", lambda: C.prove(comm, outer, enc, fresh_tr())),
                      ("verify", None)):
        spans.clear()
        origs = [
            (C, "_challenge_tensor", wrap(C, "_challenge_tensor")),
            (C, "_collapse2", wrap(C, "_collapse2")),
            (C, "_append_coeffs", wrap(C, "_append_coeffs")),
            (C, "_columns_to_open", wrap(C, "_columns_to_open")),
            (C, "merkle_path", wrap(C, "merkle_path")),
            (C, "_fold_path", wrap(C, "_fold_path")),
        ]
        t0 = time.time()
        if phase == "prove":
            pf = C.prove(comm, outer, enc, fresh_tr())
        else:
            C.verify(root, outer, inner, pf, enc, fresh_tr())
        total = time.time() - t0
        for mod, name, orig in origs:
            setattr(mod, name, orig)
        accounted = sum(spans.values())
        print(f"{phase} total {total*1e3:.0f} ms; "
              + "; ".join(f"{k} {v*1e3:.0f}" for k, v in
                          sorted(spans.items(), key=lambda kv: -kv[1]))
              + f"; other {1e3*(total-accounted):.0f} ms")


if __name__ == "__main__":
    main()
