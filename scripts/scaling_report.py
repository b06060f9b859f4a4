"""Encoding-throughput scaling report across mesh sizes.

BASELINE config 5's workflow: run the sharded commit pipeline at mesh sizes
1/2/4/.../N and report throughput + scaling efficiency.  On this container
only virtual CPU devices are available (the real chip is single); on a real
v5p slice the same script reports ICI scaling.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_report.py [log2n]
"""

import json
import sys
import time


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcpc_proof_of_storage_tpu.codes.ligero import LigeroEncoding
    from lcpc_proof_of_storage_tpu.fields.field import FT63
    from lcpc_proof_of_storage_tpu.fields.limb import limb_field
    from lcpc_proof_of_storage_tpu.parallel.sharded import make_mesh, training_step

    spec = FT63
    lf = limb_field(spec)
    n = 1 << log2n
    enc = LigeroEncoding.new(n, spec, rho=(1, 4))
    n_rows, n_per_row, n_cols = enc.get_dims(n)
    print(f"# dims ({n_rows},{n_per_row},{n_cols}) on "
          f"{len(jax.devices())} x {jax.devices()[0].platform}", file=sys.stderr)

    rng = np.random.default_rng(0)
    coeff = rng.integers(0, 1 << 16, (n_rows, n_per_row, lf.L), dtype=np.uint32)
    coeff[..., lf.L - 1] &= 0x1FFF
    cm = jnp.asarray(coeff)
    rand = jnp.asarray(lf.ones((n_rows,)))
    outer = jnp.asarray(lf.ones((n_rows,)))

    results = []
    base = None
    d = 1
    while d <= len(jax.devices()):
        if n_rows % d:
            d *= 2
            continue
        mesh = make_mesh(d)
        step = training_step(enc, mesh)
        out = step(cm, rand, outer)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t = time.time()
            jax.block_until_ready(step(cm, rand, outer))
            best = min(best, time.time() - t)
        tput = n / best
        if base is None:
            base = tput
        results.append({"devices": d, "seconds": round(best, 4),
                        "elems_per_s": round(tput, 1),
                        "scaling_efficiency": round(tput / (base * d), 3)})
        print(json.dumps(results[-1]))
        d *= 2


if __name__ == "__main__":
    main()
