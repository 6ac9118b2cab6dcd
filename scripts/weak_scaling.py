"""Weak-scaling harness for the data-parallel training step.

    python scripts/weak_scaling.py [--sizes 1,2,4,8] [--per-device-batch 8]
                                   [--steps 20] [--flagship]

Runs the SAME sharded train step (ark_tpu/parallel) over meshes of
increasing size with a FIXED per-device batch (weak scaling: perfect
scaling = flat step time, throughput linear in devices) and prints a table.

On this environment the harness runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), which measures the
partitioner/collective OVERHEAD SHAPE only — CPU "devices" share one core,
so step time growing ~linearly with mesh size is expected and the
interesting signal is the per-step overhead delta vs mesh=1, not absolute
throughput. On a real TPU pod slice the same script (run without the
virtual-device env, sizes up to the slice's chip count) measures true weak
scaling over ICI: gradients psum via GSPMD from the sharding annotations
(parallel/mesh.py; SURVEY §2 P-1/P-2).

Writes one row per mesh size; see docs/BENCH_NOTES.md "Round 3: weak
scaling" for recorded results.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def _measure(n_devices: int, per_device_batch: int, steps: int,
             flagship: bool, shard_vocab: bool = False) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from ark_tpu.parallel import make_mesh, make_parallel_train_step
    from ark_tpu.models import build_model
    from ark_tpu.train.state import create_train_state

    if flagship:
        config, layout = ge._flagship_config(
            batch_size=per_device_batch * n_devices)
    else:
        config, layout = ge._flagship_config(
            n_entities=2048, n_relations=4, max_edges=8, d_model=128,
            n_layers=2, batch_size=per_device_batch * n_devices)
    if shard_vocab and n_devices % 2 == 0 and n_devices > 1:
        # 2-way vocab sharding x DP over the rest: the wd-articles layout
        # (embedding/head over 'model'; round-4 mesh-complete kernels)
        mesh = make_mesh({"data": n_devices // 2, "model": 2})
    else:
        shard_vocab = False
        mesh = make_mesh({"data": n_devices})
    model = build_model(config, mesh=mesh)
    state = create_train_state(model, jax.random.key(0))
    step, place_state, place_batch = make_parallel_train_step(
        model, layout, config, mesh, shard_vocab=shard_vocab)
    triples_np, seq_np = ge._make_real_batch(layout, config["batch_size"])
    state = place_state(state)
    triples, seq = place_batch(triples_np), place_batch(seq_np)

    t0 = time.time()
    state, metrics = step(state, triples, seq, jax.random.key(1),
                          jnp.float32(1e-3), jnp.float32(1.0))
    loss = float(metrics["loss"])  # host fetch = sync
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, triples, seq, jax.random.key(2 + i),
                              jnp.float32(1e-3), jnp.float32(1.0))
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / steps
    assert np.isfinite(loss) and loss > 0.0
    return {"n": n_devices, "batch": config["batch_size"],
            "step_ms": dt * 1000.0, "graphs_per_s": config["batch_size"] / dt,
            "compile_s": compile_s, "loss": loss}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--flagship", action="store_true",
                    help="full wd-articles geometry (slow on CPU)")
    ap.add_argument("--shard-vocab", action="store_true",
                    help="2-way vocab-sharded head x DP over the rest "
                         "(even mesh sizes > 1; odd/1 fall back to pure DP)")
    ap.add_argument("--one-size", type=int, default=0,
                    help="(internal) measure a single mesh size in-process")
    args = ap.parse_args(argv)
    # one TPU job at a time when run on real hardware (no-op on the
    # virtual-CPU-mesh path, where the children pin JAX_PLATFORMS=cpu)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="weak_scaling")

    if args.one_size:
        import jax
        r = _measure(args.one_size, args.per_device_batch, args.steps,
                     args.flagship, args.shard_vocab)
        print("RESULT", r)
        return

    sizes = [int(s) for s in args.sizes.split(",")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = []
    for n in sizes:
        # each size needs its own device count -> fresh interpreter with a
        # virtual CPU mesh (the conftest recipe: env alone is too late here,
        # the child also forces the cpu platform before first backend use)
        env = dict(os.environ)
        # drop any pre-existing device-count flag (a stale value would give
        # every child the same mesh size), then set this size's
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={n}").strip()
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "import runpy, sys\n"
            f"sys.argv = ['weak_scaling', '--one-size', '{n}', "
            f"'--per-device-batch', '{args.per_device_batch}', "
            f"'--steps', '{args.steps}'"
            + (", '--flagship'" if args.flagship else "")
            + (", '--shard-vocab'" if args.shard_vocab else "") + "]\n"
            f"runpy.run_path({os.path.join(repo, 'scripts', 'weak_scaling.py')!r}, "
            "run_name='__main__')\n"
        )
        out = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                             capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT ")][-1]
        rows.append(eval(line[len("RESULT "):]))  # noqa: S307 (own output)
        print(f"mesh={n}: {rows[-1]}", flush=True)

    base = rows[0]
    print("\n| devices | global batch | step ms | graphs/s | overhead vs "
          "1-dev step | loss |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        ovh = r["step_ms"] - base["step_ms"] * (r["n"] if os.environ.get(
            "WEAK_SCALING_CPU_SHARED_CORE", "1") == "1" else 1)
        print(f"| {r['n']} | {r['batch']} | {r['step_ms']:.1f} | "
              f"{r['graphs_per_s']:.0f} | {ovh:+.1f} ms | {r['loss']:.4f} |")


if __name__ == "__main__":
    main()
