"""Per-kernel microbenchmarks with speed-of-light reporting.

TPU equivalent of the reference's scripts/microbench.sh + criterion benches:
measures each hot kernel (NTT, modmul, column hash, expander matvec) and
reports measured time vs the analytic roofline (utils/profiling.py).

Usage: python scripts/microbench.py [--field ft255] [--out results.json]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", default="ft255")
    ap.add_argument("--log2n", type=int, default=18)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.fields.field import FIELDS
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.ops.blake3_jax import hash_columns
    from lcpc_proof_of_storage_tpu.ops.ntt import ntt
    from lcpc_proof_of_storage_tpu.utils import profiling as prof

    spec = FIELDS[args.field]
    lf = limb_field(spec)
    L = spec.num_limbs16
    on_tpu = jax.default_backend() not in ("cpu",)

    print("# warming up device...", file=sys.stderr)
    _ = int(jnp.arange(4).sum())

    results = []
    rng = np.random.default_rng(0)

    def rand_limbs(shape):
        arr = rng.integers(0, 1 << 16, size=(*shape, L), dtype=np.uint32)
        arr[..., L - 1] &= max((spec.modulus >> (16 * (L - 1))) - 1, 1)
        return jnp.asarray(arr)

    # modmul (XLA and pallas variants)
    N = 1 << args.log2n
    a, b = rand_limbs((N,)), rand_limbs((N,))
    t = prof.bench_kernel(lambda x, y: lf.mul(x, y), a, b)
    results.append(prof.modmul_cost(N, L, fused=False).report(t)
                   | {"kernel": f"modmul_xla_{N}_L{L}"})
    if on_tpu:
        from lcpc_proof_of_storage_tpu.ops.ntt_pallas import mul_mod_pallas
        t = prof.bench_kernel(lambda x, y: mul_mod_pallas(x, y, spec), a, b)
        results.append(prof.modmul_cost(N, L, fused=True).report(t)
                       | {"kernel": f"modmul_pallas_{N}_L{L}"})

    # batch NTT
    n_cols = 1 << max(8, args.log2n - 6)
    batch = N // n_cols
    x = rand_limbs((batch, n_cols))
    t = prof.bench_kernel(lambda v: ntt(v, spec), x)
    results.append(prof.ntt_cost(batch, n_cols, L, fused=False).report(t)
                   | {"kernel": f"ntt_xla_b{batch}_n{n_cols}"})
    if on_tpu:
        from lcpc_proof_of_storage_tpu.ops.ntt_pallas import ntt_pallas
        t = prof.bench_kernel(lambda v: ntt_pallas(v, spec), x)
        results.append(prof.ntt_cost(batch, n_cols, L, fused=True).report(t)
                       | {"kernel": f"ntt_pallas_b{batch}_n{n_cols}"})

    # column hashing
    t = prof.bench_kernel(lambda v: hash_columns(v, spec), x)
    results.append(prof.hash_columns_cost(batch, n_cols, spec.repr_bytes)
                   .report(t) | {"kernel": f"hash_b{batch}_n{n_cols}"})

    for r in results:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
