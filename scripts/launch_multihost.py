#!/usr/bin/env python
"""Multi-host SPMD launcher (BASELINE config 5; SURVEY.md §3.3).

One process per host, identical invocation everywhere (the MPI-equivalent
bootstrap the reference lacks):

  # on every host i of N:
  python scripts/launch_multihost.py --coordinator host0:8476 \
      --num-processes N --process-id i \
      --data data/ --exp experiments/h512-2l-100k --mesh-data 2 --mesh-vocab 4

After ``jax.distributed.initialize`` the global device set is visible on
every process; the (data, vocab) mesh spans hosts, the training step is
the same SPMD program as single-host, and XLA routes the vocab-axis
collectives over ICI and the data axis over DCN.  Fails fast if the mesh
does not match the global device count (SURVEY.md §7 failure-detection
minimum).
"""

import argparse

import jax
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True, help="host:port of process 0")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--exp", required=True)
    ap.add_argument("--mesh-data", type=int, default=2)
    ap.add_argument("--mesh-vocab", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args(argv)

    from jlm_tpu.parallel.mesh import multihost_init

    multihost_init(args.coordinator, args.num_processes, args.process_id)
    n_global = len(jax.devices())
    need = args.mesh_data * args.mesh_vocab
    assert n_global >= need, (
        f"mesh {args.mesh_data}x{args.mesh_vocab} needs {need} devices, "
        f"global set has {n_global} — aborting on all hosts"
    )

    import optax

    from jlm_tpu.config import Config, default_dsoftmax_blocks
    from jlm_tpu.data.io import load_dataset
    from jlm_tpu.data.reader import bptt_batches
    from jlm_tpu.models.lstm import initial_state
    from jlm_tpu.models.params import init_params
    from jlm_tpu.parallel.mesh import make_mesh
    from jlm_tpu.parallel.train_step import (
        init_sharded_training,
        make_sharded_train_step,
    )
    from jlm_tpu.train.checkpoint import append_log, save_checkpoint
    from jlm_tpu.train.trainer import epoch_lr

    vocab, train, dev, _ = load_dataset(args.data)
    config = Config(
        vocab_size=len(vocab),
        num_layers=2,
        hidden_size=512,
        mesh_data=args.mesh_data,
        mesh_vocab=args.mesh_vocab,
        epochs=args.epochs,
    )
    mesh = make_mesh(config)
    optimizer = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate),
    )
    params, opt_state = init_sharded_training(
        init_params(config), config, mesh, optimizer
    )
    step = make_sharded_train_step(mesh, config, optimizer)

    import jax.numpy as jnp

    for epoch in range(config.epochs):
        state = initial_state(config, config.batch_size)
        losses = []
        for x, y in bptt_batches(train, config.batch_size, config.num_steps):
            params, opt_state, state, loss = step(
                params, opt_state, state, jnp.asarray(x), jnp.asarray(y)
            )
            losses.append(float(loss))
        ppl = float(np.exp(np.mean(losses)))
        if jax.process_index() == 0:
            print(f"epoch {epoch}: train_ppl={ppl:.2f}")
            append_log(args.exp, {"epoch": epoch, "train_ppl": ppl})
            save_checkpoint(
                args.exp, jax.tree.map(np.asarray, params), config
            )


if __name__ == "__main__":
    main()
