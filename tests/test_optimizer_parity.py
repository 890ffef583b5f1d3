"""Optimizer parity: our optax configurations must match torch.optim
semantics step-for-step (the reference's trajectories depend on Adam's
bias correction and eps placement)."""

import numpy as np
import jax.numpy as jnp
import optax
import torch


def run_optax(tx, param, grads):
    p = jnp.asarray(param)
    state = tx.init(p)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, upd)
    return np.asarray(p)


def run_torch(opt_cls, param, grads, **kw):
    p = torch.nn.Parameter(torch.from_numpy(param.copy()))
    opt = opt_cls([p], **kw)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    return p.detach().numpy()


def test_adam_matches_torch(rng):
    param = rng.randn(5, 3).astype(np.float32)
    grads = [rng.randn(5, 3).astype(np.float32) * 0.1 for _ in range(7)]
    # reference betas (options/options_train.py:86-89)
    ours = run_optax(optax.adam(1e-3, b1=0.5, b2=0.9), param, grads)
    theirs = run_torch(torch.optim.Adam, param, grads, lr=1e-3,
                       betas=(0.5, 0.9))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_sgd_momentum_matches_torch(rng):
    from dynamic_video_depth_tpu.train.step import (
        SceneFlowMotionFieldStep,
        TrainStepConfig,
    )

    step = SceneFlowMotionFieldStep(
        TrainStepConfig(optim="sgd", lr=1e-2, sgd_momentum=0.9,
                        depth_net="tiny")
    )
    param = rng.randn(4, 2).astype(np.float32)
    grads = [rng.randn(4, 2).astype(np.float32) * 0.1 for _ in range(5)]
    ours = run_optax(step.tx_depth, param, grads)
    theirs = run_torch(torch.optim.SGD, param, grads, lr=1e-2, momentum=0.9)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_sgd_dampening_and_wdecay_match_torch(rng):
    """--sgd_dampening / --wdecay reach torch.optim.SGD in the reference
    (models/netinterface.py:128-135); the dampened momentum buffer must
    match step-for-step, including the undampened first step."""
    from dynamic_video_depth_tpu.train.step import (
        SceneFlowMotionFieldStep,
        TrainStepConfig,
    )

    for damp, wd in [(0.3, 0.0), (0.5, 0.01), (0.9, 0.1)]:
        step = SceneFlowMotionFieldStep(
            TrainStepConfig(optim="sgd", lr=1e-2, sgd_momentum=0.9,
                            sgd_dampening=damp, wdecay=wd, depth_net="tiny")
        )
        param = rng.randn(4, 2).astype(np.float32)
        grads = [rng.randn(4, 2).astype(np.float32) * 0.1 for _ in range(6)]
        ours = run_optax(step.tx_depth, param, grads)
        theirs = run_torch(torch.optim.SGD, param, grads, lr=1e-2,
                           momentum=0.9, dampening=damp, weight_decay=wd)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7,
                                   err_msg=f"dampening={damp} wdecay={wd}")
