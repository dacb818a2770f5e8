"""Benchmark: sliding-window BA iterations/s on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: realtime-window bundle-adjustment iterations per second on
a representative VIO window (8 frames / 512 landmarks / 4096 stereo
observations, Cauchy-robust, Schur landmark elimination — the shape the
reference solves with Ceres DENSE_SCHUR under its 35 ms budget).

Baseline: the reference realtime budget allows max 10 iterations in 0.035 s
on 3 CPU threads (config/euroc/okvis2.yaml:91-99) => 285.7 iterations/s.
vs_baseline > 1 means faster than the reference budget.
"""

import json
import time

import jax
import jax.numpy as jnp


BASELINE_ITERS_PER_S = 10 / 0.035  # reference realtime budget


def main():
    from okvis2x_tpu.solver import gauss_newton as gn
    from okvis2x_tpu.testing import synthetic_window_problem
    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()

    iters = 10
    p, cams = synthetic_window_problem(K=8, L=512, N=4096, dtype=jnp.float32)
    # unroll: dynamic loop steps cost ~0.6 ms of sequencer sync each on this
    # runtime; straight-line code pays only the kernels
    cfg = gn.SolverConfig(max_iterations=iters, unroll=True)

    run = jax.jit(lambda prob: gn.optimize(prob, cams, cfg))
    # warmup/compile
    out, cost = run(p)
    jax.block_until_ready(cost)

    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out, cost = run(p)
    jax.block_until_ready(cost)
    dt = (time.perf_counter() - t0) / n_rep

    iters_per_s = iters / dt
    print(
        json.dumps(
            {
                "metric": "ba_iterations_per_s",
                "value": round(iters_per_s, 2),
                "unit": "LM iterations/s (8 frames, 512 lms, 4096 obs, f32)",
                "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
