"""Serving-daemon benchmark: steady-state throughput + request latency of
vision_kit_tpu/serve.py's batching engine.

Two modes:
  --engine (default)  bypass HTTP: feed pre-decoded requests straight into
                      the dispatcher queue. Measures the batching + async
                      dispatch/completion pipeline + device program — the
                      serving engine's ceiling (the dispatch/readback
                      overlap is what hides the ~20 ms tunnel RTT).
  --http              full localhost stack (decode + HTTP + engine). On
                      this 1-core host the JPEG decode dominates; the
                      number characterizes the host, not the TPU.

Run alone (never concurrently with another TPU bench — CLAUDE.md).

NOTE: over the tunneled test-harness TPU the engine number is host->device
BANDWIDTH-bound (~30-46 MB/s measured; 78.6 MB per v5s@640 batch-64 ->
~41 img/s), because serving ships fresh request bytes every dispatch —
unlike bench.py, which keeps the batch device-resident by design. On
co-located hardware (PCIe/DMA) the engine ceiling is the program's ~4000
img/s. See DESIGN.md "Measurement discipline".

  python tools/bench_serve.py --batch 64 --requests 1920
  python tools/bench_serve.py --batch 64 --requests 6400 --synthetic-ingest 4
  JAX_PLATFORMS=cpu python tools/bench_serve.py --variant n --img 64 ...

--synthetic-ingest K (engine mode) pre-stages K device-resident batches and
rotates through them instead of shipping request pixels, so the pipelined
dispatch/readback engine is measured rather than the tunnel's H2D bandwidth
(VERDICT r3 #6: the engine ceiling was extrapolated, never observed).
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_server(variant: str, img: int, batch: int, max_wait_ms: float,
                 synthetic_ingest: int = 0):
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models.architectures import YOLOV5
    from vision_kit_tpu.predictor import Predictor
    from vision_kit_tpu.serve import InferenceServer

    model = YOLOV5(variant=variant, num_classes=80)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), training=False
    )
    predictor = Predictor(model, variables, img_size=(img, img))
    return InferenceServer(
        predictor, batch_size=batch, max_wait_ms=max_wait_ms, port=0,
        queue_size=4096, synthetic_ingest=synthetic_ingest,
    )


class _TimedEvent(threading.Event):
    """Event that timestamps set() — per-request completion time is
    captured where it happens (the completion thread), not where the
    bench's sequential waiter observes it."""

    t_set = 0.0

    def set(self):
        self.t_set = time.perf_counter()
        super().set()


def _request_factory(server):
    """Timed-_Request factory for the engine-mode benches (shared by the
    saturating feed and the load curve so the request/warmup contract
    lives in one place)."""
    from vision_kit_tpu.serve import _Request

    h, w = server.img_size
    img = np.random.default_rng(0).integers(0, 256, (h, w, 3), np.uint8)

    def make(n):
        out = []
        for _ in range(n):
            r = _Request(img, 1.0, (0.0, 0.0), (h, w), None)
            r.event = _TimedEvent()
            out.append(r)
        return out

    return make


def _warmup(server, make, warmup_batches: int):
    """Compile + fill the dispatch/readback pipeline before measuring."""
    reqs = make(warmup_batches * server.batch_size)
    for r in reqs:
        server._queue.put(r)
    for r in reqs:
        assert r.event.wait(600), "warmup timed out"
        assert r.error is None, r.error


def bench_engine(server, n_requests: int, warmup_batches: int = 4):
    """Feed _Requests directly; measure submit->completion throughput and
    per-request queue latency (submit -> completion event)."""
    make = _request_factory(server)
    _warmup(server, make, warmup_batches)

    reqs = make(n_requests)
    t_submit = {}
    lat0 = time.perf_counter()

    def feed():
        for r in reqs:
            t_submit[id(r)] = time.perf_counter()
            server._queue.put(r)

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    for r in reqs:
        assert r.event.wait(600), "request timed out"
        assert r.error is None, r.error
    wall = time.perf_counter() - lat0
    feeder.join()
    lat = sorted((r.event.t_set - t_submit[id(r)]) * 1000 for r in reqs)
    n = len(lat)
    return n_requests / wall, lat[n // 2], lat[int(0.99 * n)]


def bench_load_curve(server, capacity_ips: float, fracs, n_requests: int,
                     warmup_batches: int = 4):
    """Latency vs offered load BELOW saturation (VERDICT r4 #5).

    The saturating open-loop feed measures queueing delay, not service
    time; a deployment operates below capacity, where the dynamic batcher
    trades batch fill against `max_wait_ms`. For each fraction of the
    measured capacity, submissions are paced at that offered rate (10 ms
    submission ticks — fine vs the ~100 ms batch-fill time at these rates)
    and every request's submit -> completion latency is recorded where the
    completion thread sets the event.

    Returns [(frac, offered_ips, achieved_ips, p50_ms, p99_ms), ...].
    """
    make = _request_factory(server)
    _warmup(server, make, warmup_batches)

    rows = []
    for frac in fracs:
        rate = capacity_ips * frac
        reqs = make(n_requests)
        t_submit = {}

        def feed():
            t0 = time.perf_counter()
            i = 0
            while i < len(reqs):
                due = int((time.perf_counter() - t0) * rate) + 1
                while i < min(due, len(reqs)):
                    t_submit[id(reqs[i])] = time.perf_counter()
                    server._queue.put(reqs[i])
                    i += 1
                time.sleep(0.01)

        t0 = time.perf_counter()
        feeder = threading.Thread(target=feed, daemon=True)
        feeder.start()
        for r in reqs:
            assert r.event.wait(600), f"request timed out at frac={frac}"
            assert r.error is None, r.error
        wall = time.perf_counter() - t0
        feeder.join()
        lat = sorted((r.event.t_set - t_submit[id(r)]) * 1000 for r in reqs)
        n = len(lat)
        rows.append((frac, rate, n / wall, lat[n // 2], lat[int(0.99 * n)]))
        print(f"  load {frac:.0%}: offered {rate:.1f} img/s, achieved "
              f"{n / wall:.1f} img/s, p50 {lat[n // 2]:.1f} ms, "
              f"p99 {lat[int(0.99 * n)]:.1f} ms", flush=True)
    return rows


def bench_http(server, n_requests: int, concurrency: int = 32):
    import json
    import urllib.request

    import cv2

    frame = np.random.default_rng(0).integers(0, 256, (720, 1280, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    data = enc.tobytes()
    url = f"http://127.0.0.1:{server.port}/predict"

    def post():
        req = urllib.request.Request(url, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=600) as resp:
            json.loads(resp.read())

    post()  # warmup
    lat: list[float] = []
    mu = threading.Lock()
    # ceil so no requests are silently dropped; actual count is len(lat)
    per_thread = max(1, -(-n_requests // concurrency))

    def worker():
        for _ in range(per_thread):
            t0 = time.perf_counter()
            post()
            with mu:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    n = len(lat)
    return n / wall, lat[n // 2] * 1000, lat[int(0.99 * n)] * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="s")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--requests", type=int, default=1920)
    ap.add_argument("--http", action="store_true")
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--synthetic-ingest", type=int, default=0, metavar="K",
                    help="engine mode only: pre-stage K device-resident "
                    "batches and rotate through them, removing the "
                    "per-batch H2D transfer — measures the engine itself "
                    "rather than the tunnel bandwidth (VERDICT r3 #6)")
    ap.add_argument("--load-curve", default=None, metavar="CAPACITY_IPS",
                    type=float,
                    help="closed-loop latency-vs-offered-load mode: pace "
                    "submissions at --load-fracs fractions of this "
                    "measured capacity (the saturation number, e.g. "
                    "861.7) and report submit->completion p50/p99 per "
                    "point (VERDICT r4 #5)")
    ap.add_argument("--load-fracs", default="0.25,0.5,0.75",
                    help="comma fractions of capacity for --load-curve")
    args = ap.parse_args()
    if args.http and args.synthetic_ingest:
        ap.error("--synthetic-ingest is an --engine-mode knob")
    if args.load_curve and args.http:
        ap.error("--load-curve is an --engine-mode knob")

    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()

    server = build_server(args.variant, args.img, args.batch,
                          args.max_wait_ms, args.synthetic_ingest)
    print(f"compiling serving program (v5{args.variant}@{args.img} "
          f"batch={args.batch}) ...", flush=True)
    t0 = time.perf_counter()
    server.start()
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    try:
        if args.http:
            ips, p50, p99 = bench_http(server, args.requests,
                                       args.concurrency)
            print(f"http: {ips:.1f} img/s  p50 {p50:.1f} ms  "
                  f"p99 {p99:.1f} ms  (decode+HTTP+engine, "
                  f"concurrency={args.concurrency})")
        elif args.load_curve:
            fracs = [float(x) for x in args.load_fracs.split(",")]
            rows = bench_load_curve(server, args.load_curve, fracs,
                                    args.requests)
            import json as _json

            print(_json.dumps({
                "mode": "load_curve", "batch": args.batch,
                "max_wait_ms": args.max_wait_ms,
                "capacity_ips": args.load_curve,
                "synthetic_ingest": args.synthetic_ingest,
                "points": [
                    {"frac": f, "offered_ips": round(o, 1),
                     "achieved_ips": round(a, 1), "p50_ms": round(p50, 1),
                     "p99_ms": round(p99, 1)}
                    for f, o, a, p50, p99 in rows
                ],
            }))
        else:
            ips, p50, p99 = bench_engine(server, args.requests)
            mode = (f"synthetic device ingest K={args.synthetic_ingest}"
                    if args.synthetic_ingest else "host ingest (H2D/batch)")
            print(f"engine: {ips:.1f} img/s  req p50 {p50:.1f} ms  "
                  f"p99 {p99:.1f} ms  (batch={args.batch}, {mode})")
        import jax

        print(f"device: {jax.devices()[0].platform}")
    finally:
        server.stop()


if __name__ == "__main__":
    main()
