"""Scaling-efficiency harness: examples/s at increasing mesh sizes.

BASELINE.json asks for examples/s at 1 chip / 1 host / N hosts and >=85%
multi-host scaling efficiency.  This harness measures the flagship train
step over (data x model) meshes of growing device counts on whatever
devices are available:

    python scripts/scaling_bench.py                  # real chips
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --functional  # fake-device check

Prints one JSON line per mesh size with examples/s and efficiency vs the
1-device run (weak scaling: global batch grows with the mesh).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--functional", action="store_true",
                        help="fake-device run: correctness only, efficiency "
                             "numbers are not meaningful")
    parser.add_argument("--batch_per_device", type=int, default=2048)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import __graft_entry__ as g
    from cikm2020_dmt_tpu.core.mesh import build_mesh
    from cikm2020_dmt_tpu.metrics.streaming import task_metrics_init
    from cikm2020_dmt_tpu.train.loop import Trainer

    n_dev = jax.device_count()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    base_eps = None
    for n in sizes:
        model_axis = 2 if (n % 2 == 0 and not args.functional) else \
            (2 if n % 2 == 0 else 1)
        cfg = g._demo_config(
            sku_rows=65536 if args.functional else 5_000_000,
            batch_size=args.batch_per_device * n,
            mesh_model=model_axis if n > 1 else 1,
            mesh_data=n // (model_axis if n > 1 else 1),
            shard_rows_threshold=1024 if args.functional else 100_000,
            validate_step=10**9,
            compute_dtype="bfloat16" if not args.functional else "float32",
            **({"hidden_units_bottom": (64, 32), "hidden_units_task": (16,)}
               if args.functional else {}))
        mesh = build_mesh(cfg, jax.devices()[:n])
        trainer = Trainer(cfg, mesh=mesh)
        tstate = trainer.shard_state(trainer.init_state())
        step_fn = trainer._train_step()
        batch = trainer.device_batch(
            g._as_batch(g.synthetic_batch(cfg, cfg.batch_size)))
        metrics = task_metrics_init()
        rng = jax.random.PRNGKey(0)
        for i in range(2):
            tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                            jax.random.fold_in(rng, i))
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(args.iters):
            tstate, metrics, loss = step_fn(tstate, metrics, batch,
                                            jax.random.fold_in(rng, 10 + i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        eps = cfg.batch_size / dt
        if base_eps is None:
            base_eps = eps
        print(json.dumps({
            "devices": n,
            "mesh": {"data": cfg.mesh_data or n, "model": cfg.mesh_model},
            "examples_per_sec": round(eps, 1),
            "scaling_efficiency": round(eps / (base_eps * n), 3),
        }))
        del tstate, batch


if __name__ == "__main__":
    main()
