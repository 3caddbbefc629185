"""Worker for the 2-process x 4-virtual-CPU-device distributed test.

Run as: python tests/mp_worker.py <coordinator> <num_procs> <proc_id>
(env must set JAX_PLATFORM_NAME=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=4 BEFORE jax imports).

Covers for real (reference: slowfast/utils/multiprocessing.py:46-61):
- init_distributed (coordinator rendezvous from the --init_method form)
- per-host data sharding assembled into global arrays
- one jitted sharded train step (gradient all-reduce across processes)
- ragged host-side process_allgather
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    from aicity_action_tpu.config import get_cfg
    from aicity_action_tpu.parallel import mesh as pmesh

    cfg = get_cfg()
    cfg.NUM_SHARDS = num_procs
    cfg.SHARD_ID = proc_id
    cfg.INIT_METHOD = f"tcp://{coordinator}"
    pmesh.init_distributed(cfg)

    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 4 * num_procs, jax.device_count()

    import __graft_entry__ as g
    from aicity_action_tpu.data.mixup import build_mixup_from_cfg
    from aicity_action_tpu.engine.steps import TrainState, make_train_step
    from aicity_action_tpu.models.build import build_model
    from aicity_action_tpu.solver.optimizer import construct_optimizer

    # create the gloo host-collective context FIRST, while both processes
    # are still in lockstep — creating it after minutes of (load-skewed)
    # model compilation can blow gloo's 30 s rendezvous under CI load
    ragged = np.full((proc_id + 1, 3), proc_id, np.float32)
    parts = pmesh.process_allgather(ragged)
    total = np.concatenate(parts)
    assert total.shape == (sum(range(1, num_procs + 1)), 3), total.shape
    for p in range(num_procs):
        assert (parts[p] == p).all()

    tcfg = g._flagship_cfg(tiny=True)
    # shrink further: compile time is the flakiness budget on a 1-core host
    tcfg.DATA.TRAIN_CROP_SIZE = 16
    tcfg.DATA.TEST_CROP_SIZE = 16
    tcfg.DATA.NUM_FRAMES = 2
    tcfg.MVIT.DEPTH = 2
    tcfg.MVIT.DIM_MUL = [[1, 2.0]]
    tcfg.MVIT.HEAD_MUL = [[1, 2.0]]
    tcfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    mesh = pmesh.make_mesh(tcfg)
    module, params = build_model(tcfg)
    tx, _ = construct_optimizer(tcfg, params, steps_per_epoch=10)
    state = TrainState.create(params, tx)
    step = make_train_step(module, tx, tcfg.MODEL.LOSS_FUNC,
                           num_classes=tcfg.MODEL.NUM_CLASSES)

    b_sh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    state = jax.device_put(state, repl)
    rng = jax.device_put(jax.random.PRNGKey(0), repl)

    # per-host batch: each process contributes its own 8 rows of the
    # 16-row global batch (the loader's per-host index sharding)
    B_local = 8
    rs = np.random.RandomState(proc_id)
    local = {
        "inputs": [rs.randn(B_local, tcfg.DATA.NUM_FRAMES,
                            tcfg.DATA.TRAIN_CROP_SIZE,
                            tcfg.DATA.TRAIN_CROP_SIZE, 3
                            ).astype(np.float32)],
        "labels": np.arange(B_local) % tcfg.MODEL.NUM_CLASSES,
    }
    batch = {
        "inputs": [pmesh.put_local_shard(local["inputs"][0], b_sh)],
        "labels": pmesh.put_local_shard(local["labels"], b_sh),
    }
    assert batch["inputs"][0].shape[0] == B_local * num_procs

    jitted = jax.jit(step, donate_argnums=0)
    with mesh:
        state, metrics, _ = jitted(state, batch, rng)
        loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss), loss

    print(json.dumps({"proc": proc_id, "loss": loss,
                      "devices": jax.device_count()}))


if __name__ == "__main__":
    main()
