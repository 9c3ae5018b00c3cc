"""Microbenchmark: candidate-gather backward — scatter-add vs one-hot
matmul vs sorted-segment formulations (VERDICT r3 #3b, the one untried
lever in DESIGN.md "Utilization").

The train-step's top op is the backward of the assigner's candidate gather
`psub = pred_flat[lin]` — a (C, no) scatter-add into (n_cells, no) — which
runs on the TPU's scatter path, not the MXU. Candidates C = B*M*na*5 with
M=160 (loader MAX_LABELS) = 2400/img; level-0 cells = 19200/img (v5@640).

Alternatives measured on the real chip, per level-0 shapes at batch 64:
  scatter   : grad via the native .at[].add backward (current code)
  onehot    : custom backward — per-image one-hot^T (cells, C) @ grad(C, no)
              under lax.map (bounds the 46M-element one-hot transient to
              one image at a time)
  sort      : sort candidates by cell id, segment-sum, then scatter unique
              — still a scatter but with sorted/unique hints

  python tools/archive/bench_assigner_scatter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

B = 64
M = 160          # loader MAX_LABELS
NA, NOFF = 3, 5
NY = NX = 80     # level-0 grid of v5@640
NO = 85
CHUNK, ITERS = 8, 4

C_IMG = M * NA * NOFF              # candidates per image
CELLS_IMG = NY * NX * NA           # cells per image


def make_inputs(dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pred = jnp.asarray(
        rng.standard_normal((B, CELLS_IMG, NO)) * 0.1, dtype)
    lin = jnp.asarray(
        rng.integers(0, CELLS_IMG, (B, C_IMG)), jnp.int32)
    valid = jnp.asarray(rng.random((B, C_IMG)) < 0.04)  # ~4% real matches
    tgt = jnp.asarray(rng.standard_normal((B, C_IMG, NO)) * 0.1, dtype)
    return pred, lin, valid, tgt


def loss_from_psub(psub, valid, tgt):
    import jax.numpy as jnp

    d = (psub - tgt) ** 2
    return jnp.where(valid[..., None], d, 0.0).sum() / (
        jnp.maximum(valid.sum(), 1).astype(psub.dtype) * NO)


def gather_scatter(pred, lin):
    """Current formulation: vmapped row gather, native scatter backward."""
    import jax
    import jax.numpy as jnp

    return jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(pred, lin)


def gather_onehot_bwd(pred, lin):
    """Same forward gather; backward = per-image one-hot matmul on the MXU
    via lax.map (one (CELLS, C) bf16 one-hot transient at a time)."""
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def g(pred, lin):
        return jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(pred, lin)

    def fwd(pred, lin):
        return g(pred, lin), lin

    def bwd(lin, ct):
        dtype = ct.dtype

        def one_image(args):
            idx, ctg = args                       # (C,), (C, NO)
            oh = (idx[None, :] == jnp.arange(
                CELLS_IMG, dtype=jnp.int32)[:, None]).astype(dtype)
            return oh @ ctg                       # (CELLS, NO) on the MXU

        grad = jax.lax.map(one_image, (lin, ct))
        return grad, None

    g.defvjp(fwd, bwd)
    return g(pred, lin)


def gather_sorted_bwd(pred, lin):
    """Backward: sort candidate grads by cell id, segment-sum runs of equal
    ids (associative scan), scatter only the run heads with unique+sorted
    hints."""
    import jax
    import jax.numpy as jnp

    @jax.custom_vjp
    def g(pred, lin):
        return jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(pred, lin)

    def fwd(pred, lin):
        return g(pred, lin), lin

    def bwd(lin, ct):
        dtype = ct.dtype

        def one_image(args):
            idx, ctg = args
            order = jnp.argsort(idx)
            si = idx[order]
            sg = jnp.take(ctg, order, axis=0)
            seg = jax.ops.segment_sum(
                sg, si, num_segments=CELLS_IMG,
                indices_are_sorted=True)
            return seg.astype(dtype)

        grad = jax.lax.map(one_image, (lin, ct))
        return grad, None

    g.defvjp(fwd, bwd)
    return g(pred, lin)


def run(name, gather_fn, dtype_name="bf16"):
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    pred, lin, valid, tgt = make_inputs(dtype)

    def loss(pred):
        psub = gather_fn(pred, lin)
        return loss_from_psub(psub, valid, tgt).astype(jnp.float32)

    grad = jax.grad(loss)

    @jax.jit
    def stream(pred, acc0):
        def body(carry, k):
            g = grad(pred + k.astype(dtype) * 1e-6)
            return carry + g[0, 0, 0].astype(jnp.float32), ()

        acc, _ = jax.lax.scan(body, acc0,
                              jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    acc = stream(pred, jnp.zeros((), jnp.float32))
    _ = float(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        acc = stream(pred, acc)
    _ = float(acc)
    dt = time.perf_counter() - t0
    ms = dt / (CHUNK * ITERS) * 1000
    print(f"{name:10s} {dtype_name}: {ms:8.3f} ms/step "
          f"(B={B}, C/img={C_IMG}, cells/img={CELLS_IMG})")
    return ms


def main():
    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0].platform)

    # numeric gate first: all three backwards must agree (fp32, one batch)
    pred, lin, valid, tgt = make_inputs(jnp.float32)

    def gfor(fn):
        return jax.jit(jax.grad(
            lambda p: loss_from_psub(fn(p, lin), valid, tgt)
        ))(pred)

    g0 = np.asarray(gfor(gather_scatter))
    for name, fn in (("onehot", gather_onehot_bwd),
                     ("sorted", gather_sorted_bwd)):
        gi = np.asarray(gfor(fn))
        err = np.abs(gi - g0).max()
        assert err < 1e-5, (name, err)
    print("backward parity ok (fp32 max |delta| < 1e-5)")

    run("scatter", gather_scatter)
    run("onehot", gather_onehot_bwd)
    run("sorted", gather_sorted_bwd)


if __name__ == "__main__":
    main()
