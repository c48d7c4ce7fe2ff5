"""Subprocess worker for the multi-host integration test.

Trains N steps of the tiny s2t model over all global devices; with
--num-processes > 1 it joins a gloo-collective CPU cluster and feeds only
its process-local row slice of each (deterministic) global batch — the
TPU-pod multi-host code path, exercised with two local processes
(SURVEY.md §4: "multi-node without a real cluster").
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--port", default="0")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--fsdp", action="store_true")
    ap.add_argument("--n-model", type=int, default=1,
                    help="tensor-parallel mesh width (spans processes when "
                         "> local device count)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speecht5_tpu.parallel import distributed as D

    if args.num_processes > 1:
        D.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
            platform="cpu",
        )

    import numpy as np

    from speecht5_tpu.config import speecht5_tiny
    from speecht5_tpu.models.speecht5 import init_model
    from speecht5_tpu.parallel.sharding import make_mesh
    from speecht5_tpu.train.trainer import Trainer, TrainConfig

    n_dev = len(jax.devices())
    assert n_dev == args.local_devices * args.num_processes, (
        f"{n_dev} global devices, expected "
        f"{args.local_devices * args.num_processes}"
    )
    mesh = make_mesh(n_data=n_dev // args.n_model, n_model=args.n_model)
    cfg = speecht5_tiny()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(
        model, variables, "s2t",
        # short warmup + real lr so the fixed batch overfits measurably
        # within --steps updates
        TrainConfig(ctc_weight=0.3, lr=1e-3, warmup_steps=1),
        mesh=mesh, fsdp=args.fsdp,
    )

    B, T, L = 8, 3200, 6
    losses = []
    # ONE fixed global batch (pure function of the seed): every process
    # derives it identically and slices its own rows; repeated steps on it
    # must drive the loss down
    rng_np = np.random.default_rng(100)
    wav = rng_np.standard_normal((B, T)).astype(np.float32) * 0.1
    tgt = rng_np.integers(5, cfg.vocab_size, (B, L)).astype(np.int32)
    for step in range(args.steps):
        rows = D.process_rows(B) if args.num_processes > 1 else slice(0, B)
        batch = {
            "wav": wav[rows],
            "wav_lengths": np.full((rows.stop - rows.start,), T, np.int32),
            "prev_tokens": np.full(
                (rows.stop - rows.start, L), cfg.eos_id, np.int32),
            "targets": tgt[rows],
        }
        metrics = trainer.train_step(batch, jax.random.PRNGKey(1000 + step))
        losses.append(round(float(jax.device_get(metrics["loss"])), 6))

    print("RESULT " + json.dumps(
        {"process": D.process_index(), "n_devices": n_dev,
         "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
