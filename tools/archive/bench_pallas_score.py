"""Microbench: serving candidate scores straight from the conv's native
(B, ny, nx, 255) head map via a Pallas kernel vs the current XLA path
(reshape to (B, ny, nx, na, no) — a full-map lane relayout — then
streaming reductions, ops/nms.py postprocess_raw stage 1).

The relayout is the single biggest non-conv cost of the serving step
(~5.2 ms/b128 across levels, tools/profile_infer.py). The Pallas kernel
reads each (rows, 255) block once in VMEM and emits score/class/obj
without any repacking — layout option (d) after the three XLA layouts
measured in DESIGN.md.

    python tools/archive/bench_pallas_score.py [batch]

Compares outputs for parity, then times both with the scan protocol.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

NA, NC = 3, 80
NO = 5 + NC


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ny = nx = 80  # P3, the dominant level
    rng = np.random.default_rng(0)
    conv_map = jnp.asarray(
        rng.normal(0, 2, (batch, ny, nx, NA * NO)).astype(np.float32),
        jnp.bfloat16,
    )
    n = ny * nx * NA

    # ---- reference: the current postprocess_raw stage-1 math ------------
    def ref_scores(m):
        raw = m.reshape(batch, ny, nx, NA, NO)  # the relayout copy
        cls_logits = raw[..., 5:]
        best_cls = jnp.argmax(cls_logits, axis=-1).reshape(batch, n)
        best_logit = jnp.max(cls_logits, axis=-1).reshape(batch, n)
        obj_logit = raw[..., 4].reshape(batch, n)
        score = jax.nn.sigmoid(obj_logit.astype(jnp.float32)) * \
            jax.nn.sigmoid(best_logit.astype(jnp.float32))
        return score, best_cls.astype(jnp.int32)

    # ---- pallas: direct on (rows, 255) ----------------------------------
    ROWS = 1024

    def kernel(x_ref, score_ref, cls_ref):
        x = x_ref[:].astype(jnp.float32)  # (ROWS, 255)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        for a in range(NA):
            lo = a * NO + 5
            m = (lane >= lo) & (lane < lo + NC)
            xm = jnp.where(m, x, -jnp.inf)
            bl = jnp.max(xm, axis=1, keepdims=True)          # (ROWS, 1)
            # argmax-first semantics: min lane index attaining the max
            bc = jnp.min(
                jnp.where(xm == bl, lane - lo, NC + 1), axis=1,
                keepdims=True,
            )
            obj = x[:, a * NO + 4][:, None]
            sc = jax.nn.sigmoid(obj) * jax.nn.sigmoid(bl)
            score_ref[:, a:a + 1] = sc
            cls_ref[:, a:a + 1] = bc.astype(jnp.int32)

    def pallas_scores(m):
        rows = batch * ny * nx
        flat = m.reshape(rows, NA * NO)  # major-dim merge: no relayout
        grid = rows // ROWS
        score, cls = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((ROWS, NA * NO), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((ROWS, NA), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, NA), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((rows, NA), jnp.float32),
                jax.ShapeDtypeStruct((rows, NA), jnp.int32),
            ],
        )(flat)
        return score.reshape(batch, n), cls.reshape(batch, n)

    # ---- parity ---------------------------------------------------------
    s_ref, c_ref = jax.jit(ref_scores)(conv_map)
    s_pl, c_pl = jax.jit(pallas_scores)(conv_map)
    s_ref, c_ref, s_pl, c_pl = map(np.asarray, (s_ref, c_ref, s_pl, c_pl))
    np.testing.assert_allclose(s_pl, s_ref, rtol=1e-5, atol=1e-6)
    ties = (c_pl != c_ref).mean()
    print(f"parity ok (score exact, cls mismatch {ties:.2e} — ties only)")

    # ---- timing (scan protocol, CLAUDE.md) ------------------------------
    def bench(fn, name):
        @jax.jit
        def stream(m, acc0):
            def body(carry, k):
                s, c = fn(m + k.astype(jnp.bfloat16))
                return carry + jnp.sum(s) + jnp.sum(c).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(
                body, acc0, jnp.arange(8, dtype=jnp.int32))
            return acc

        _ = float(stream(conv_map, jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(3):
            acc = stream(conv_map, acc)
        _ = float(acc)
        dt = (time.perf_counter() - t0) / (3 * 8)
        print(f"{name}: {dt * 1e3:.2f} ms/map (b{batch} P3)")
        return dt

    t_ref = bench(ref_scores, "xla relayout+reduce")
    t_pl = bench(pallas_scores, "pallas direct      ")
    print(f"speedup: {t_ref / t_pl:.2f}x")


if __name__ == "__main__":
    main()
