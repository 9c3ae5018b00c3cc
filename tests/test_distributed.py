"""parallel/distributed.py coverage (VERDICT r2 weak #4).

Two layers:
  * unit tests of `init_distributed` gating — env parsing, explicit args,
    pod autodetection, and the pod-looking-but-unreachable fallback — with
    a monkeypatched `jax.distributed.initialize` (nothing here opens
    sockets);
  * a REAL 2-process `jax.distributed` smoke: two subprocesses, localhost
    coordinator, 4 virtual CPU devices each (gloo collectives), one
    jit-compiled cross-process all-reduce, and per-host `_IndexStream`
    shard disjointness — the loader-sharding contract the trainer wires
    (shard=jax.process_index(), num_shards=jax.process_count(); reference
    analog: torch.distributed rank split, data/sampling.py:61-71).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

import jax

from vision_kit_tpu.parallel.distributed import init_distributed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DIST_ENV = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
             "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
             "MEGASCALE_COORDINATOR_ADDRESS")


@pytest.fixture()
def clean_env(monkeypatch):
    for k in _DIST_ENV:
        monkeypatch.delenv(k, raising=False)
    return monkeypatch


class _Recorder:
    def __init__(self, fail=None):
        self.calls = []
        self.fail = fail

    def __call__(self, *a, **kw):
        self.calls.append((a, kw))
        if self.fail is not None:
            raise self.fail


def _patch_initialized(monkeypatch, rec):
    monkeypatch.setattr(jax.distributed, "initialize", rec)
    # the success-path log queries these; give it a 2x4 world
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    monkeypatch.setattr(jax, "device_count", lambda: 8)


def test_single_host_is_noop(clean_env):
    rec = _Recorder()
    clean_env.setattr(jax.distributed, "initialize", rec)
    assert init_distributed() is False
    assert rec.calls == []


def test_explicit_args_forwarded(clean_env):
    rec = _Recorder()
    _patch_initialized(clean_env, rec)
    assert init_distributed("10.0.0.1:1234", num_processes=2,
                            process_id=0) is True
    assert rec.calls == [((), dict(coordinator_address="10.0.0.1:1234",
                                   num_processes=2, process_id=0))]


def test_env_vars_parsed(clean_env):
    rec = _Recorder()
    _patch_initialized(clean_env, rec)
    clean_env.setenv("JAX_COORDINATOR_ADDRESS", "host-0:7777")
    clean_env.setenv("JAX_NUM_PROCESSES", "4")
    clean_env.setenv("JAX_PROCESS_ID", "3")
    assert init_distributed() is True
    assert rec.calls == [((), dict(coordinator_address="host-0:7777",
                                   num_processes=4, process_id=3))]


def test_explicit_args_beat_env(clean_env):
    rec = _Recorder()
    _patch_initialized(clean_env, rec)
    clean_env.setenv("JAX_COORDINATOR_ADDRESS", "env-host:1")
    clean_env.setenv("JAX_NUM_PROCESSES", "16")
    assert init_distributed("arg-host:2", num_processes=2,
                            process_id=1) is True
    (_, kw), = rec.calls
    assert kw["coordinator_address"] == "arg-host:2"
    assert kw["num_processes"] == 2


def test_pod_autodetect_calls_bare_initialize(clean_env):
    rec = _Recorder()
    _patch_initialized(clean_env, rec)
    clean_env.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    assert init_distributed() is True
    assert rec.calls == [((), {})]  # pod path: runtime autodetects


def test_pod_looking_but_unreachable_falls_back(clean_env):
    """A tunneled single chip can carry pod-ish env vars; a failed
    initialize must degrade to single-host, not kill the run."""
    rec = _Recorder(fail=RuntimeError("coordinator unreachable"))
    clean_env.setattr(jax.distributed, "initialize", rec)
    clean_env.setenv("MEGASCALE_COORDINATOR_ADDRESS", "unreachable:1")
    assert init_distributed() is False
    assert len(rec.calls) == 1


_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); coord = sys.argv[2]; out = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    try:
        from jax._src import xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

    from vision_kit_tpu.parallel.distributed import init_distributed
    ok = init_distributed(coord, num_processes=2, process_id=pid)
    assert ok, "init_distributed returned False on explicit args"
    assert jax.process_count() == 2
    assert jax.local_device_count() == 4
    assert jax.device_count() == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    # per-process local shard: process p owns values p*4 .. p*4+3
    local = np.arange(4, dtype=np.float32) + 4 * pid
    garr = jax.make_array_from_process_local_data(sharding, local, (8,))
    total = float(jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr))

    # loader sharding contract: the trainer passes
    # shard=jax.process_index(), num_shards=jax.process_count()
    from vision_kit_tpu.data.loader import _IndexStream
    stream = _IndexStream(13, seed=5, shard=jax.process_index(),
                          num_shards=jax.process_count())
    epoch0 = [stream.at(p) for p in range(stream.shard_len)]

    with open(out, "w") as f:
        json.dump({{"pid": pid, "total": total, "epoch0": epoch0}}, f)
""")


@pytest.mark.slow
def test_two_process_cpu_distributed_smoke(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items() if k not in _DIST_ENV}
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"out{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        ))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        results.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in results:
        assert rc == 0, stderr[-3000:]

    dumps = [json.load(open(o)) for o in outs]
    # cross-process all-reduce saw every shard: sum(0..7) on both hosts
    assert dumps[0]["total"] == dumps[1]["total"] == 28.0
    # per-host epoch-0 index shards: disjoint, and together exactly the
    # 13-element permutation (no sample dropped or duplicated)
    a, b = set(dumps[0]["epoch0"]), set(dumps[1]["epoch0"])
    assert a.isdisjoint(b)
    assert a | b == set(range(13))
    assert len(dumps[0]["epoch0"]) + len(dumps[1]["epoch0"]) == 13
