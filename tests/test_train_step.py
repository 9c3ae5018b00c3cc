"""Training-step tests: single-device convergence smoke + 8-virtual-device
data-parallel sharding (the standard JAX fake-backend multi-chip check)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models import YOLOV5
from vision_kit_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from vision_kit_tpu.train.losses import YoloLoss
from vision_kit_tpu.train.optim import make_optimizer
from vision_kit_tpu.train.step import create_train_state, make_train_step

HYP = {
    "lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
    "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0,
}


def _setup(batch, img=64, nc=7):
    model = YOLOV5(variant="n", num_classes=nc)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), training=False
    )
    tx = make_optimizer(variables["params"], HYP, max_epochs=10,
                        steps_per_epoch=50)
    loss = YoloLoss(nc, model.grid_anchors, HYP)
    state = create_train_state(variables, tx)
    rng = np.random.default_rng(0)
    targets = np.full((batch, 8, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    targets[:, 1] = [3, 0.2, 0.25, 0.15, 0.2]
    batch_data = {
        "image": rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32),
        "targets": targets,
    }
    return model, loss, tx, state, batch_data


def test_train_step_runs_and_descends():
    model, loss, tx, state, batch = _setup(batch=2)
    step = make_train_step(model, loss, tx, donate=False)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert int(state.ema.updates) == 8


def test_train_step_multichip_dp():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=8, n_model=1)
    model, loss, tx, state, batch = _setup(batch=8)
    step = make_train_step(model, loss, tx, mesh=mesh, donate=False)
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(mesh, batch)
    state2, metrics = step(state, sharded)
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device():
    """The data-parallel step over 8 shards must produce (numerically) the
    same update as the same batch on one device."""
    mesh = make_mesh(n_data=8, n_model=1)
    model, loss, tx, state, batch = _setup(batch=8)

    step_single = make_train_step(model, loss, tx, donate=False)
    s1, m1 = step_single(state, batch)

    step_dp = make_train_step(model, loss, tx, mesh=mesh, donate=False)
    s2, m2 = step_dp(
        jax.device_put(state, replicated_sharding(mesh)),
        shard_batch(mesh, batch),
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    l1 = jax.tree_util.tree_leaves(s1.params)[3]
    l2 = jax.tree_util.tree_leaves(s2.params)[3]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4,
                               atol=1e-6)


def test_grad_accumulation_matches_single_step():
    """accum_steps=2 over two IDENTICAL microbatches must produce the same
    parameter update as one step on a single microbatch: the accumulated
    gradient is the MEAN over micros, and the mean of equal grads is exact
    in floating point. (BN running stats legitimately differ — they update
    once per microbatch.)"""
    model, loss, tx, state, batch = _setup(batch=2)
    dup = {
        "image": np.concatenate([batch["image"], batch["image"]]),
        "targets": np.concatenate([batch["targets"], batch["targets"]]),
    }
    step1 = make_train_step(model, loss, tx, donate=False)
    step2 = make_train_step(model, loss, tx, donate=False, accum_steps=2)
    s1, m1 = step1(state, batch)
    s2, m2 = step2(state, dup)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_grad_accumulation_remat_compose():
    """accum + remat must run and descend."""
    model, loss, tx, state, batch = _setup(batch=4)
    step = make_train_step(model, loss, tx, donate=False, accum_steps=2,
                           remat=True)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_graft_entry_dryrun():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_spatial_partition_matches_single_device():
    """dp x sp: (4 data, 2 model) mesh with image height sharded over the
    model axis must reproduce the single-device update (XLA SPMD inserts the
    conv halo exchanges)."""
    from vision_kit_tpu.parallel.mesh import spatial_sharding

    mesh = make_mesh(n_data=4, n_model=2)
    # img=128: keeps >= 2 rows per model shard on the stride-32 map (the
    # documented spatial-partitioning constraint, see make_train_step)
    model, loss, tx, state, batch = _setup(batch=4, img=128)

    step_single = make_train_step(model, loss, tx, donate=False)
    s1, m1 = step_single(state, batch)

    step_sp = make_train_step(
        model, loss, tx, mesh=mesh, donate=False, spatial=True
    )
    sharded = {
        "image": jax.device_put(batch["image"], spatial_sharding(mesh)),
        "targets": jax.device_put(
            batch["targets"], jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))
        ),
    }
    s2, m2 = step_sp(jax.device_put(state, replicated_sharding(mesh)), sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)[3]
    l2 = jax.tree_util.tree_leaves(s2.params)[3]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4,
                               atol=1e-6)


def test_spatial_eval_step():
    from vision_kit_tpu.parallel.mesh import spatial_sharding
    from vision_kit_tpu.train.step import make_eval_step

    mesh = make_mesh(n_data=4, n_model=2)
    model, loss, tx, state, batch = _setup(batch=4)
    ev_sp = make_eval_step(model, mesh=mesh, spatial=True,
                           postprocess_kwargs=dict(max_cand=256))
    ev_1 = make_eval_step(model, postprocess_kwargs=dict(max_cand=256))
    imgs = jnp.asarray(batch["image"])
    d1, v1 = ev_1(state, imgs)
    d2, v2 = ev_sp(
        jax.device_put(state, replicated_sharding(mesh)),
        jax.device_put(imgs, spatial_sharding(mesh)),
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-4,
                               atol=1e-4)


def test_train_step_bf16_descends():
    """bf16-compute model (fp32 params) must train: the AMP counterpart."""
    import jax.numpy as jnp

    model = YOLOV5(variant="n", num_classes=7, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False
    )
    # params stay fp32 regardless of compute dtype
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree_util.tree_leaves(variables["params"])
    )
    tx = make_optimizer(variables["params"], HYP, 10, 50)
    loss = YoloLoss(7, model.grid_anchors, HYP)
    state = create_train_state(variables, tx)
    rng = np.random.default_rng(0)
    targets = np.full((2, 8, 5), -1, np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    batch = {
        "image": rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32),
        "targets": targets,
    }
    step = make_train_step(model, loss, tx, donate=False)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_remat_matches_plain():
    """remat=True recomputes activations in the backward; the update must be
    numerically identical to the plain step."""
    model, loss, tx, state, batch = _setup(batch=2)
    s1, m1 = make_train_step(model, loss, tx, donate=False)(state, batch)
    s2, m2 = make_train_step(model, loss, tx, donate=False, remat=True)(
        state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)[3]
    l2 = jax.tree_util.tree_leaves(s2.params)[3]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-7)


def test_spatial_partition_ota_matches_single_device():
    """dp x sp composed with the SimOTA loss: the step re-gathers the head
    maps to batch-only sharding before the loss (make_train_step), so OTA's
    gather/argmin assignment must see whole maps and reproduce the
    single-device update under height sharding — the v7-family large-image
    scaling configuration (round 5; the dense-loss twin is
    test_spatial_partition_matches_single_device)."""
    from vision_kit_tpu.parallel.mesh import spatial_sharding
    from vision_kit_tpu.train.ota import YoloLossOTA

    mesh = make_mesh(n_data=4, n_model=2)
    model, _, tx, state, batch = _setup(batch=4, img=128)
    loss = YoloLossOTA(7, model.grid_anchors, HYP, layout="native")

    step_single = make_train_step(model, loss, tx, donate=False)
    s1, m1 = step_single(state, batch)

    step_sp = make_train_step(
        model, loss, tx, mesh=mesh, donate=False, spatial=True
    )
    sharded = {
        "image": jax.device_put(batch["image"], spatial_sharding(mesh)),
        "targets": jax.device_put(
            batch["targets"], jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))
        ),
    }
    s2, m2 = step_sp(jax.device_put(state, replicated_sharding(mesh)),
                     sharded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(s1.params)[3]
    l2 = jax.tree_util.tree_leaves(s2.params)[3]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4,
                               atol=1e-6)
