"""Phase breakdown of the Ligero commit on the real TPU: NTT alone, hash
alone, full pipeline, and the large-stage/small-stage NTT split.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/phase_breakdown.py [log2n ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")


def bench(fn, *args, iters=3):
    # axon: async dispatch; force with scalar readback
    import jax.numpy as jnp
    out = fn(*args)
    _ = int(jnp.asarray(out).ravel()[0])
    times = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = int(jnp.asarray(out).ravel()[0])
        times.append(time.time() - t0)
    return min(times)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [20, 22, 24]
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core.commit import _encode_matrix, _enc_jit
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.ops.blake3_pallas import hash_columns_auto
    from lcpc_proof_of_storage_tpu.ops.ntt_pallas import ntt_pallas

    spec = FIELDS[os.environ.get("LCPC_BENCH_FIELD", "ft255")]
    L = spec.num_limbs16
    rng = np.random.default_rng(0)

    t0 = time.time()
    _ = int(jnp.arange(4).sum())
    print(f"# warmup {time.time()-t0:.1f}s on {jax.devices()[0]}", file=sys.stderr)

    for log2n in sizes:
        n = 1 << log2n
        enc = LigeroEncoding.new(n, spec, rho=(1, 4))
        n_rows, n_per_row, n_cols = enc.get_dims(n)
        coeff = rng.integers(0, 1 << 16, size=(n_rows, n_per_row, L),
                             dtype=np.uint32)
        coeff[..., L - 1] &= max((spec.modulus >> (16 * (L - 1))) - 1, 1)
        cm = jnp.asarray(coeff)

        pad_fn = jax.jit(lambda c: jnp.zeros((n_rows, n_cols, L), jnp.uint32)
                         .at[:, :n_per_row, :].set(c))
        padded = pad_fn(cm)
        padded.block_until_ready()

        ntt_fn = jax.jit(lambda x: ntt_pallas(x, spec, n_nonzero=n_per_row))
        encoded = ntt_fn(padded)
        t_ntt = bench(ntt_fn, padded)

        hash_fn = jax.jit(lambda x: hash_columns_auto(x, spec))
        t_hash = bench(hash_fn, encoded)

        full = _enc_jit(enc, "bd_pipeline", lambda: (
            lambda c, ops: hash_columns_auto(
                _encode_matrix(c, enc, n_cols, ops), enc.spec)))
        t_full = bench(full, cm, enc.device_operands())

        print(json.dumps({
            "log2n": log2n, "dims": [n_rows, n_per_row, n_cols],
            "ntt_s": round(t_ntt, 4), "hash_s": round(t_hash, 4),
            "full_s": round(t_full, 4),
            "elems_per_s": round(n / t_full, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
