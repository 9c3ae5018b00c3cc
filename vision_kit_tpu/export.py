"""Deployment export with numeric verification on every artifact.

Counterpart of the reference's export task (scripts/main.py:74-98 — ONNX
opset 13 + TorchScript) and base_trainer.py:49-124 (TorchScript traces).
TPU-native artifacts come first (msgpack weights — round-trip-checked — a
StableHLO text dump, and a RUNNABLE jax.export serialized program: weights
embedded, cpu+tpu platforms, reloadable with jax.export.deserialize — the
TorchScript-trace counterpart), then the interchange artifacts: a TF
SavedModel (via jax2tf native serialization), a one-command ONNX file, and
the reference's own traced-TorchScript module — the latter two driven
through the structural weight converter and the original torch package
(vision_kit_tpu/interop.py), sharing one converted model and one forward
gate.

Every artifact that can execute here is *numerically compared against the
jit forward* on a fixed probe input before the export is declared good —
an export that silently diverges from the trained model is worse than a
failed one.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from vision_kit_tpu.utils.logging_utils import logger

#: |decoded_artifact - decoded_jit| tolerance per artifact kind. SavedModel
#: replays the SAME StableHLO through TF's runtime (near-bit-exact); the
#: torch/ONNX leg recomputes the graph in another framework (same bound as
#: the model-parity suite, tests/test_model_parity.py).
SAVEDMODEL_ATOL = 1e-4
TORCH_ATOL = 5e-3


class ExportCheckError(AssertionError):
    """An exported artifact disagreed with the jit forward."""


@dataclass
class ExportResult:
    artifacts: dict = field(default_factory=dict)  # kind -> path
    checks: dict = field(default_factory=dict)     # kind -> max |delta|
    skipped: dict = field(default_factory=dict)    # kind -> reason


def _remove_artifact(path: str) -> None:
    """Delete a file-or-directory artifact whose numeric check never ran."""
    import shutil

    try:
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
    except OSError as e:
        logger.warning("could not remove unchecked artifact %s: %s", path, e)


def _quarantine_artifact(path: str) -> None:
    """Rename an artifact that FAILED its numeric check to `<path>.failed`
    so deploy scripts globbing save_dir can't pick it up, while keeping the
    bytes around for diagnosis."""
    try:
        if os.path.exists(path):
            failed = path + ".failed"
            _remove_artifact(failed)
            os.replace(path, failed)
            logger.warning("artifact failed its check; quarantined as %s",
                           failed)
    except OSError as e:
        logger.warning("could not quarantine failed artifact %s: %s", path, e)


def _probe_input(size) -> np.ndarray:
    """Deterministic non-degenerate probe image batch (values in [0, 1))."""
    h, w = size
    rng = np.random.default_rng(1234)
    return rng.random((1, h, w, 3), np.float32)


def run_export(cfg, variables, save_dir: str, onnx: str | bool = "auto",
               torchscript: str | bool = "auto",
               check: bool = True) -> ExportResult:
    """Write all export artifacts for `cfg`/`variables` into `save_dir`.

    onnx / torchscript: True (required — raise if the torch package is
    missing), False (skip), or "auto" (export when torch + the original
    Vision-Kit package are available). The two legs share one converted
    torch model and one forward gate. `check=True` raises ExportCheckError
    on any numeric disagreement; the max deltas are always logged and
    returned.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vision_kit_tpu.models import build_model

    res = ExportResult()
    os.makedirs(save_dir, exist_ok=True)
    stem = f"{cfg.model.name.lower()}_{cfg.model.version}"
    size = tuple(cfg.model.input_size)

    # --- TPU-native artifacts -------------------------------------------
    msgpack_path = os.path.join(save_dir, stem + ".msgpack")
    with open(msgpack_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    # round-trip check: reload the bytes FROM DISK and compare every leaf
    # exactly (serialization is lossless; any delta means disk corruption)
    with open(msgpack_path, "rb") as f:
        reloaded_vars = serialization.from_bytes(variables, f.read())
    leaf_deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(
            np.asarray(a).astype(np.float64)
            - np.asarray(b).astype(np.float64)).max())
        if np.asarray(a).size else 0.0,
        variables, reloaded_vars,
    )
    msgpack_delta = max(jax.tree_util.tree_leaves(leaf_deltas), default=0.0)
    res.checks["msgpack"] = msgpack_delta
    if check and msgpack_delta > 0.0:
        _quarantine_artifact(msgpack_path)
        raise ExportCheckError(
            f"msgpack weights round-trip is not lossless: max |delta| = "
            f"{msgpack_delta:.3e}"
        )
    res.artifacts["msgpack"] = msgpack_path

    model = build_model(cfg, export=True)

    def forward(images):
        (decoded,) = model.apply(variables, images, training=False)
        return decoded

    lowered = jax.jit(forward).lower(
        jax.ShapeDtypeStruct((1, *size, 3), jnp.float32)
    )
    hlo_path = os.path.join(save_dir, stem + ".stablehlo.mlir")
    with open(hlo_path, "w") as f:
        f.write(lowered.as_text())
    res.artifacts["stablehlo"] = hlo_path

    probe = _probe_input(size)
    ref_out = np.asarray(jax.jit(forward)(jnp.asarray(probe)))

    # --- jax.export serialized program -----------------------------------
    # The RUNNABLE native artifact (counterpart of the reference's
    # TorchScript trace, base_trainer.py:49-79): weights embedded as
    # constants, multi-platform (cpu+tpu) StableHLO, reloadable with
    # jax.export.deserialize + .call() — no model code or retrace needed.
    # Same no-unchecked-artifact invariant as the legs below: the bytes are
    # DESERIALIZED FROM DISK and replayed on the probe before the artifact
    # is declared good.
    jexp_path = os.path.join(save_dir, stem + ".jaxexport")
    try:
        from jax import export as jax_export

        exported = jax_export.export(
            jax.jit(forward), platforms=("cpu", "tpu")
        )(jax.ShapeDtypeStruct((1, *size, 3), jnp.float32))
        with open(jexp_path, "wb") as f:
            f.write(exported.serialize())
        with open(jexp_path, "rb") as f:
            replay = jax_export.deserialize(f.read())
        jx_out = np.asarray(replay.call(jnp.asarray(probe)))
    except Exception as e:  # lowering/platform skew — not a numeric failure
        _remove_artifact(jexp_path)
        res.skipped["jaxexport"] = f"jax.export leg failed: {e}"
        logger.warning("jax.export artifact skipped: %s", e)
    else:
        delta = float(np.abs(jx_out - ref_out).max())
        res.checks["jaxexport"] = delta
        logger.info("jax.export check: max |delta| = %.3e", delta)
        if check and delta > SAVEDMODEL_ATOL:
            _quarantine_artifact(jexp_path)
            raise ExportCheckError(
                f"deserialized jax.export program deviates from jit: "
                f"{delta:.3e} > {SAVEDMODEL_ATOL}"
            )
        res.artifacts["jaxexport"] = jexp_path

    # --- TF SavedModel (jax2tf native serialization) --------------------
    # the whole leg degrades gracefully: a missing OR version-skewed
    # tensorflow must not abort the export (the ONNX leg below is
    # independent). A failed numeric CHECK, however, is a real error.
    # Invariant either way: no UNCHECKED artifact survives on disk — an
    # artifact whose replay could not run is removed, one whose replay
    # disagreed is quarantine-renamed `.failed` (a deploy script globbing
    # save_dir must never pick up something the check didn't pass).
    sm_dir = os.path.join(save_dir, stem + "_savedmodel")
    try:
        import tensorflow as _tf
        from jax.experimental import jax2tf

        tf_fn = jax2tf.convert(
            forward, with_gradient=False,
            native_serialization_platforms=("cpu", "tpu"),
        )
        module = _tf.Module()
        module.f = _tf.function(
            tf_fn, autograph=False,
            input_signature=[_tf.TensorSpec((1, *size, 3), _tf.float32)],
        )
        _tf.saved_model.save(module, sm_dir)
        # numeric check: reload from disk and replay the probe
        reloaded = _tf.saved_model.load(sm_dir)
        sm_out = reloaded.f(_tf.constant(probe)).numpy()
    except Exception as e:  # tensorflow unavailable or jax2tf/TF skew
        _remove_artifact(sm_dir)
        res.skipped["savedmodel"] = f"tensorflow/jax2tf leg failed: {e}"
        logger.warning("TF SavedModel export skipped: %s", e)
    else:
        delta = float(np.abs(sm_out - ref_out).max())
        res.checks["savedmodel"] = delta
        logger.info("SavedModel check: max |delta| = %.3e", delta)
        if check and delta > SAVEDMODEL_ATOL:
            _quarantine_artifact(sm_dir)
            raise ExportCheckError(
                f"SavedModel forward deviates from jit: {delta:.3e} > "
                f"{SAVEDMODEL_ATOL}"
            )
        res.artifacts["savedmodel"] = sm_dir

    # --- torch interchange legs (ONNX + TorchScript) --------------------
    # same contract as the TF leg: in "auto" mode ANY failure of the
    # machinery (converter strict-load, torch.onnx/torch.jit version skew,
    # proto validation, a broken local checkout) skips the leg with a
    # warning — the TPU-native artifacts above were already written and
    # checked. Only a failed numeric CHECK (ExportCheckError) aborts;
    # onnx=True / torchscript=True turn machinery failures back into hard
    # errors. Both legs share ONE converted torch model and ONE forward
    # gate (the strict-load + parity check is the expensive part).
    onnx_path = os.path.join(save_dir, stem + ".onnx")
    ts_path = os.path.join(save_dir, stem + ".torchscript.pt")
    if onnx is False:
        res.skipped["onnx"] = "disabled"
    if torchscript is False:
        res.skipped["torchscript"] = "disabled"
    if onnx is False and torchscript is False:
        return res

    gate = None
    try:
        gate = _torch_forward_gate(cfg, variables, probe, check, res,
                                   build_model)
    except ExportCheckError:
        # the gate failed BEFORE either exporter wrote anything — stale
        # artifacts from a previous export into the same save_dir would
        # survive unchecked. Quarantine them.
        _quarantine_artifact(onnx_path)
        _quarantine_artifact(ts_path)
        res.artifacts.pop("onnx", None)
        res.artifacts.pop("torchscript", None)
        raise
    except Exception as e:
        # no-unchecked-artifact invariant: a STALE artifact from a previous
        # export into the same save_dir would otherwise outlive this run
        # unchecked next to the fresh msgpack (a deploy glob would ship a
        # model diverging from the trained weights)
        if onnx is not False:
            _remove_artifact(onnx_path)
        if torchscript is not False:
            _remove_artifact(ts_path)
        if onnx is True or torchscript is True:
            raise
        for kind in ("onnx", "torchscript"):
            if kind not in res.skipped:
                res.skipped[kind] = f"torch interop unavailable: {e}"
        logger.warning("torch interchange legs skipped: %s", e)
        return res
    torch_model, fwd_ref_order, jax_decoded = gate

    if onnx is not False:
        try:
            _onnx_leg(torch_model, fwd_ref_order, jax_decoded, probe,
                      onnx_path, size, check, res)
        except ExportCheckError:
            _quarantine_artifact(onnx_path)
            res.artifacts.pop("onnx", None)
            # aborting BEFORE the TorchScript leg runs: a stale trace from
            # a previous export would otherwise survive unchecked
            if torchscript is not False:
                _quarantine_artifact(ts_path)
                res.artifacts.pop("torchscript", None)
            raise
        except Exception as e:
            _remove_artifact(onnx_path)
            if onnx is True:
                if torchscript is not False:
                    _remove_artifact(ts_path)
                raise
            res.skipped["onnx"] = f"onnx leg failed: {e}"
            logger.warning("ONNX export skipped: %s", e)

    if torchscript is not False:
        try:
            _torchscript_leg(torch_model, jax_decoded, fwd_ref_order, probe,
                             ts_path, size, check, res)
        except ExportCheckError:
            _quarantine_artifact(ts_path)
            res.artifacts.pop("torchscript", None)
            raise
        except Exception as e:
            _remove_artifact(ts_path)
            if torchscript is True:
                raise
            res.skipped["torchscript"] = f"torchscript leg failed: {e}"
            logger.warning("TorchScript export skipped: %s", e)
    return res


def _torch_forward_gate(cfg, variables, probe, check, res, build_model):
    """Build the converted torch model and gate its forward against the jit
    forward (anchor-major decode — the deployed native layout is a pure
    permutation of it, models/heads.py decode_order). Shared by the ONNX
    and TorchScript legs: the graph both serialize is this model's."""
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.interop import build_torch_model

    torch_model = build_torch_model(cfg, variables)
    if torch_model is None:
        raise RuntimeError(
            "torch / original Vision-Kit package unavailable "
            "(set $VISION_KIT_TORCH_ROOT or pip install the torch package)"
        )

    import torch

    ref_order = build_model(cfg, export=True, decode_order="reference")

    def fwd_ref_order(images):
        (decoded,) = ref_order.apply(variables, images, training=False)
        return decoded

    jax_decoded = np.asarray(jax.jit(fwd_ref_order)(jnp.asarray(probe)))
    with torch.no_grad():
        t_out = torch_model(torch.from_numpy(probe.transpose(0, 3, 1, 2)))
    t_decoded = (t_out[0] if isinstance(t_out, (tuple, list)) else t_out)
    t_decoded = t_decoded.numpy()
    delta = float(np.abs(t_decoded - jax_decoded).max())
    res.checks["onnx_torch_forward"] = delta
    logger.info("torch forward gate: max |delta| = %.3e", delta)
    if check and delta > TORCH_ATOL:
        raise ExportCheckError(
            f"converted torch forward deviates from jit: {delta:.3e} > "
            f"{TORCH_ATOL}"
        )
    return torch_model, fwd_ref_order, jax_decoded


def _torchscript_leg(torch_model, jax_decoded, fwd_ref_order, probe, ts_path,
                     size, check, res) -> None:
    """The reference's traced-TorchScript artifact
    (/root/reference/vision_kit/core/train/base_trainer.py:49-79, emitted at
    scripts/main.py:98), with this package's replay contract: the saved
    ScriptModule is LOADED FROM DISK and replayed at batch 1 and batch 2
    against the jit forward before the artifact is declared good."""
    import jax
    import jax.numpy as jnp
    import torch

    from vision_kit_tpu.interop import export_torchscript

    export_torchscript(torch_model, size, ts_path)
    replay = torch.jit.load(ts_path)
    replay.eval()
    with torch.no_grad():
        ts_out = replay(torch.from_numpy(probe.transpose(0, 3, 1, 2)))
    delta = float(np.abs(ts_out.numpy() - jax_decoded).max())
    res.checks["torchscript"] = delta
    logger.info("TorchScript replay check: max |delta| = %.3e", delta)
    if check and delta > TORCH_ATOL:
        raise ExportCheckError(
            f"TorchScript replay deviates from jit: {delta:.3e} > "
            f"{TORCH_ATOL}"
        )

    # batch-2 replay: the trace's only safe dynamic axis — prove the tracer
    # didn't bake batch-1 shapes (grids/H/W stay export-size by design)
    probe2 = np.concatenate([probe, probe[:, :, ::-1, :]], axis=0)
    jax2 = np.asarray(jax.jit(fwd_ref_order)(jnp.asarray(probe2)))
    with torch.no_grad():
        ts2 = replay(torch.from_numpy(probe2.transpose(0, 3, 1, 2)))
    delta2 = float(np.abs(ts2.numpy() - jax2).max())
    res.checks["torchscript_batch2"] = delta2
    logger.info("TorchScript batch-2 check: max |delta| = %.3e", delta2)
    if check and delta2 > TORCH_ATOL:
        raise ExportCheckError(
            f"TorchScript batch-2 replay deviates from jit: {delta2:.3e} > "
            f"{TORCH_ATOL}"
        )
    res.artifacts["torchscript"] = ts_path


def _onnx_leg(torch_model, fwd_ref_order, jax_decoded, probe, onnx_path,
              size, check, res) -> None:
    """ONNX export of the (already forward-gated) converted torch model."""
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.interop import export_onnx, verify_onnx_file

    export_onnx(torch_model, size, onnx_path)
    verify_onnx_file(onnx_path)

    # onnxsim pass (reference base_trainer.py:110-118) — graceful when the
    # package is absent; a FAILED simplify keeps the original (already
    # validated) proto and records the skip. simplify_onnx swaps the file
    # atomically only after re-validating, so the artifact on disk is
    # well-formed either way; the runtime replay below then checks whatever
    # proto (simplified or not) actually ships.
    from vision_kit_tpu.interop import simplify_onnx

    try:
        if simplify_onnx(onnx_path):
            logger.info("ONNX simplified in place (onnxsim)")
        else:
            res.skipped["onnx_simplify"] = "onnxsim unavailable"
    except Exception as e:
        res.skipped["onnx_simplify"] = f"onnxsim failed: {e}"
        logger.warning("ONNX simplify skipped: %s", e)
    res.artifacts["onnx"] = onnx_path

    # onnxruntime replay when available (absent in this image)
    try:
        import onnxruntime as ort
    except ImportError:
        res.skipped["onnx_runtime_check"] = "onnxruntime unavailable"
        return
    sess = ort.InferenceSession(onnx_path)
    ort_out = sess.run(["output"],
                       {"images": probe.transpose(0, 3, 1, 2)})[0]
    delta = float(np.abs(ort_out - jax_decoded).max())
    res.checks["onnx_runtime"] = delta
    logger.info("ONNX (onnxruntime) check: max |delta| = %.3e", delta)
    if check and delta > TORCH_ATOL:
        _quarantine_artifact(onnx_path)
        res.artifacts.pop("onnx", None)
        raise ExportCheckError(
            f"onnxruntime output deviates from jit: {delta:.3e} > {TORCH_ATOL}"
        )

    # dynamic-batch check: the proto declares batch dynamic — prove it by
    # replaying a batch-2 input (probe + its horizontal flip) against the
    # jit forward at batch 2. Catches a simplifier or exporter that baked
    # the batch dim (the H/W axes stay export-size; see export_onnx caveat).
    probe2 = np.concatenate([probe, probe[:, :, ::-1, :]], axis=0)
    jax2 = np.asarray(jax.jit(fwd_ref_order)(jnp.asarray(probe2)))
    ort2 = sess.run(["output"],
                    {"images": probe2.transpose(0, 3, 1, 2)})[0]
    delta2 = float(np.abs(ort2 - jax2).max())
    res.checks["onnx_runtime_batch2"] = delta2
    logger.info("ONNX (onnxruntime, batch 2) check: max |delta| = %.3e",
                delta2)
    if check and delta2 > TORCH_ATOL:
        _quarantine_artifact(onnx_path)
        res.artifacts.pop("onnx", None)
        raise ExportCheckError(
            f"onnxruntime batch-2 output deviates from jit: {delta2:.3e} > "
            f"{TORCH_ATOL}"
        )
