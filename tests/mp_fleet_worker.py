"""Worker process for the multi-process fleet test
(tests/test_multiprocess.py). Each of 2 processes owns 2 of the 4 virtual
CPU devices (XLA_FLAGS set by the parent); together they form one 4-video
mesh and run one lockstep fleet step through the SAME code path a real
multi-host TPU pod would take (parallel/mesh.py::initialize_distributed ->
shard_map fleet).

Usage: mp_fleet_worker.py <process_id> <coordinator_port> <out.npz>
"""

import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

REPO = __file__.rsplit("/tests/", 1)[0]
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def small_cfg():
    from dynamic_video_depth_tpu.train import LossConfig, TrainStepConfig

    return TrainStepConfig(
        lr=1e-4, scene_lr_mul=10.0, depth_net="tiny",
        net_width=16, n_layers=1, n_freq_xyz=2, n_freq_t=1,
        loss=LossConfig(flow_mul=1.0, disp_mul=1.0, acc_mul=1.0,
                        use_disp=True, midas=False),
        compute_dtype="float32",
    )


def fleet_losses(n_videos=4):
    """Shared by the worker and the single-process oracle: build the
    4-video fleet from fixed seeds and run one lockstep step."""
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from dynamic_video_depth_tpu.parallel import MultiVideoOptimizer, make_mesh
    from dynamic_video_depth_tpu.parallel.multi_video import tree_stack
    from dynamic_video_depth_tpu.train.step import SceneFlowMotionFieldStep

    step = SceneFlowMotionFieldStep(small_cfg())
    batches = [_synthetic_batch(1, 16, 24, np.random.RandomState(100 + i))
               for i in range(n_videos)]
    mesh = make_mesh([("video", n_videos)])
    mv = MultiVideoOptimizer(step, mesh)

    states = tree_stack([
        step.init_state(jax.random.PRNGKey(100 + i),
                        jnp.asarray(batches[i]["img_1"]))
        for i in range(n_videos)
    ])
    # host roundtrip first: in multi-process SPMD every process holds the
    # same full value and device_put shards only its addressable slices
    states = jax.device_put(jax.device_get(states), mv.state_sharding())
    stacked = tree_stack([{k: jnp.asarray(v) for k, v in b.items()}
                          for b in batches])
    stacked = jax.device_put(jax.device_get(stacked), mv.state_sharding())

    new_states, logs = mv.train_step(states, stacked, steps=1, warm=False)

    out = {}
    for s in logs["loss"].addressable_shards:
        out[int(s.index[0].start)] = float(np.asarray(s.data)[0])
    for s in logs["flow_loss_1_2"].addressable_shards:
        out[1000 + int(s.index[0].start)] = float(np.asarray(s.data)[0])
    return out


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    from dynamic_video_depth_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert len(jax.devices()) == 4, jax.devices()
    assert jax.local_device_count() == 2
    out = fleet_losses()
    np.savez(out_path, keys=np.asarray(sorted(out)),
             vals=np.asarray([out[k] for k in sorted(out)]))
    print(f"proc {pid}: wrote {sorted(out)}", flush=True)


if __name__ == "__main__":
    main()
