"""Phase breakdown of the Ligero commit pipeline on the real TPU.

Times (steady-state, forced completion via scalar readback):
  - NTT encode alone
  - Blake3 column hash alone
  - Merkle layers alone
  - full fused commit pipeline
Run: python scripts/profile_commit.py [log2n] [field]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lcpc_tpu_xla_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def bench(fn, *args, reps=3):
    """Steady-state seconds for fn(*args) with forced completion."""
    g = jax.jit(lambda *a: fn(*a).sum(dtype=jnp.uint32))
    t = time.time()
    _ = int(g(*args))
    compile_s = time.time() - t
    best = 1e9
    for _ in range(reps):
        t = time.time()
        _ = int(g(*args))
        best = min(best, time.time() - t)
    return best, compile_s


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    fname = sys.argv[2] if len(sys.argv) > 2 else "ft255"

    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.core.commit import (_encode_matrix,
                                                       merkle_tree_device)
    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.ops.blake3_pallas import \
        hash_columns_auto as hash_columns

    spec = FIELDS[fname]
    N = 1 << log2n
    enc = LigeroEncoding.new(N, spec, rho=(1, 4))
    n_rows, n_per_row, n_cols = enc.get_dims(N)
    print(f"# dims: {n_rows} x {n_per_row} -> {n_cols}  L={spec.num_limbs16}",
          flush=True)

    t = time.time()
    _ = int(jnp.arange(4).sum())
    print(f"# warmup {time.time()-t:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    cm = jnp.asarray(rng.integers(0, 1 << 16,
                                  (n_rows, n_per_row, spec.num_limbs16),
                                  dtype=np.uint32))

    ntt_s, c1 = bench(lambda x: _encode_matrix(x, enc, n_cols), cm)
    print(f"ntt_encode: {ntt_s*1e3:.0f} ms (compile {c1:.0f}s)", flush=True)

    comm = jax.jit(lambda x: _encode_matrix(x, enc, n_cols))(cm)
    comm = jax.block_until_ready(comm)

    hash_s, c2 = bench(lambda c: hash_columns(c, spec), comm)
    print(f"hash_columns(dispatch): {hash_s*1e3:.0f} ms (compile {c2:.0f}s)",
          flush=True)

    leaves = jax.jit(lambda c: hash_columns(c, spec))(comm)
    merk_s, c3 = bench(lambda lv: merkle_tree_device(lv, n_cols), leaves)
    print(f"merkle: {merk_s*1e3:.0f} ms (compile {c3:.0f}s)", flush=True)

    def full(x):
        c = _encode_matrix(x, enc, n_cols)
        return merkle_tree_device(hash_columns(c, spec), n_cols)

    full_s, c4 = bench(full, cm)
    total = N
    print(f"full_pipeline: {full_s*1e3:.0f} ms (compile {c4:.0f}s)  "
          f"=> {total/full_s/1e6:.2f} M elems/s", flush=True)


if __name__ == "__main__":
    main()
