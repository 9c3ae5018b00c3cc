"""Batched HTTP inference server — the production serving surface.

The reference has no serving daemon (its closest surface is the demo loop,
reference scripts/demo.py:58-80, one frame at a time); this module turns the
fused Predictor program into a multi-client service the TPU-native way:

- Requests are coalesced by a dispatcher into fixed-shape batches (pad to
  `batch_size`, one compiled XLA program for the whole service lifetime) —
  dynamic batching amortizes the per-dispatch tunnel/PCIe RTT exactly like
  the bench's lax.scan does, without recompiles.
- Image bytes decode + letterbox on the host (native vkio memory decode
  when built — request bytes never touch the filesystem — cv2 fallback
  bit-identical), so the device program sees one static (B, S, S, 3) uint8
  shape regardless of client image sizes.
- Detections rescale to each client's original frame via the same
  `scale_coords` math as eval (ops/letterbox.py).

HTTP API (stdlib http.server, threaded; no extra dependencies):
  POST /predict            body = encoded image (JPEG/PNG/...)
                           optional ?conf= post-filter (>= server conf)
                           -> {"detections": [{"box", "score", "class",
                               "label"}], "width", "height", "batched"}
  GET  /healthz            -> {"ok": true, "platform": "...", "model": ...}
  GET  /stats              -> request/batch counters + latency percentiles
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from vision_kit_tpu.ops.letterbox import letterbox_np, scale_coords


def decode_request_bytes(data: bytes, dst_hw: tuple[int, int]):
    """Encoded image bytes -> (letterboxed (H, W, 3) uint8 RGB,
    (ratio, (dw, dh)), (h0, w0)) or None. Native vkio memory decode when
    available, cv2 fallback (bit-identical letterbox geometry)."""
    import os

    from vision_kit_tpu.data import native

    if not os.environ.get("VK_NO_NATIVE") and native.available():
        return native.decode_letterbox_bytes(data, dst_hw)
    import cv2

    arr = np.frombuffer(data, np.uint8)
    bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if bgr is None:
        return None
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    img, (ratio, pad) = letterbox_np(rgb, dst_hw)
    return img, (ratio, pad), rgb.shape[:2]


class _Request:
    __slots__ = ("img", "ratio", "pad", "hw0", "conf", "event", "dets",
                 "batched", "error", "deadline")

    def __init__(self, img, ratio, pad, hw0, conf, deadline=None):
        self.img = img
        self.ratio = ratio
        self.pad = pad
        self.hw0 = hw0
        self.conf = conf
        self.event = threading.Event()
        self.dets = None
        self.batched = 0
        self.error = None
        # monotonic time after which the waiter has already 504'd; the
        # dispatcher drops expired requests instead of spending batch
        # slots on results nobody reads (overload must drain, not amplify)
        self.deadline = deadline


_STOP = object()


class InferenceServer:
    """Dynamic-batching HTTP server over a Predictor.

    One fixed (batch_size, S, S, 3) program serves every request: the
    dispatcher drains the queue up to `batch_size` items (waiting at most
    `max_wait_ms` after the first), zero-pads the remainder, and runs the
    batch as a single device dispatch. Padded slots are discarded.
    """

    def __init__(
        self,
        predictor,
        class_labels=None,
        batch_size: int = 8,
        max_wait_ms: float = 5.0,
        host: str = "127.0.0.1",
        port: int = 8000,
        queue_size: int = 256,
        request_timeout_s: float = 60.0,
        synthetic_ingest: int = 0,
    ):
        self.predictor = predictor
        self.labels = list(class_labels) if class_labels else None
        # BENCHMARK-ONLY ingest mode: with synthetic_ingest=K > 0, start()
        # pre-stages K random uint8 batches ON DEVICE and _submit_batch
        # rotates through them instead of assembling+shipping request
        # pixels. This measures the engine itself (queueing, batching,
        # dispatch/readback overlap, completion) with the per-batch H2D
        # transfer removed — over the tunneled test TPU that transfer is
        # the ~40 MB/s bottleneck that hides the engine ceiling
        # (tools/bench_serve.py --synthetic-ingest; VERDICT r3 #6).
        # Request results then correspond to the synthetic pixels, so this
        # must never be enabled on a production server.
        self.synthetic_ingest = int(synthetic_ingest)
        self._synth_batches = None
        self._synth_i = 0
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.request_timeout_s = float(request_timeout_s)
        self.img_size = predictor.img_size
        self._queue: queue.Queue = queue.Queue(maxsize=queue_size)
        # dispatch/completion pipeline: the dispatcher submits batches to
        # the device (async under jax) and hands the in-flight device
        # arrays to a completion thread that pays the device->host
        # readback; the next batch dispatches while the previous one's
        # results are still in flight (hides the per-dispatch RTT —
        # the dominant serving cost over a tunneled/PCIe link). maxsize
        # bounds the device queue depth.
        self._inflight: queue.Queue = queue.Queue(maxsize=2)
        self._fn = None  # compiled (batch, S, S, 3) program, set in start()
        self._stats_mu = threading.Lock()
        self._n_requests = 0
        self._n_errors = 0
        self._n_batches = 0
        self._n_batched_imgs = 0
        self._lat_ms: list[float] = []  # rolling window
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._completer = threading.Thread(target=self._completion_loop,
                                           daemon=True)
        self._httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self._httpd.daemon_threads = True
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._started = False

    # -- lifecycle ---------------------------------------------------------

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self):
        """Compile the serving program (one compile, reused forever) and
        accept connections."""
        self._fn = self.predictor.warmup(self.img_size, self.batch_size)
        if self.synthetic_ingest > 0:
            import jax

            h, w = self.img_size
            rng = np.random.default_rng(0)
            self._synth_batches = [
                jax.device_put(rng.integers(
                    0, 256, (self.batch_size, h, w, 3), np.uint8))
                for _ in range(self.synthetic_ingest)
            ]
            for b in self._synth_batches:
                b.block_until_ready()
        self._dispatcher.start()
        self._completer.start()
        self._serve_thread.start()
        self._started = True
        return self

    def stop(self):
        if self._started:
            self._queue.put(_STOP)
            self._httpd.shutdown()
            self._dispatcher.join(timeout=10)
            self._completer.join(timeout=10)
        self._httpd.server_close()
        self._started = False

    def wait(self):
        """Block until KeyboardInterrupt, then shut down."""
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    def serve_forever(self):
        """Blocking variant for the CLI."""
        self.start()
        self.wait()

    # -- batching core -----------------------------------------------------

    EXPIRED = "expired before dispatch"

    def _expired(self, req: _Request) -> bool:
        if req.deadline is not None and time.monotonic() >= req.deadline:
            req.error = self.EXPIRED
            req.event.set()  # waiter already timed out; unblock bookkeeping
            with self._stats_mu:
                self._n_errors += 1
            return True
        return False

    def _dispatch_loop(self):
        while True:
            first = self._queue.get()
            if first is _STOP:
                self._inflight.put(_STOP)
                return
            if self._expired(first):
                continue
            reqs = [first]
            deadline = time.monotonic() + self.max_wait_s
            stop = False
            while len(reqs) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is _STOP:
                    stop = True
                    break
                if not self._expired(item):
                    reqs.append(item)
            self._submit_batch(reqs)
            if stop:
                self._inflight.put(_STOP)
                return

    def _submit_batch(self, reqs: list[_Request]):
        """Async-dispatch one padded batch; readback happens in the
        completion thread so the next batch can dispatch immediately."""
        import jax.numpy as jnp

        t0 = time.perf_counter()
        try:
            if self._synth_batches is not None:  # bench-only device ingest
                batch = self._synth_batches[
                    self._synth_i % len(self._synth_batches)]
                self._synth_i += 1
                dev = self._fn(batch)
            else:
                h, w = self.img_size
                imgs = np.zeros((self.batch_size, h, w, 3), np.uint8)
                for i, r in enumerate(reqs):
                    imgs[i] = r.img
                dev = self._fn(jnp.asarray(imgs))  # returns before completion
        except Exception as e:  # trace/shape errors surface immediately
            for r in reqs:
                r.error = f"inference failed: {e}"
                r.event.set()
            with self._stats_mu:
                self._n_errors += len(reqs)
            return
        # blocks when 2 batches are already in flight (bounds device queue)
        self._inflight.put((reqs, dev, t0))

    def _completion_loop(self):
        while True:
            item = self._inflight.get()
            if item is _STOP:
                return
            reqs, (dets_dev, valid_dev), t0 = item
            try:
                dets = np.asarray(dets_dev)  # pays the device->host wait
                valid = np.asarray(valid_dev)
            except Exception as e:  # async device failure lands here
                for r in reqs:
                    r.error = f"inference failed: {e}"
                    r.event.set()
                with self._stats_mu:
                    self._n_errors += len(reqs)
                continue
            ms = (time.perf_counter() - t0) * 1000
            for i, r in enumerate(reqs):
                # per-request firewall: one bad rescale/filter must fail
                # that request, not kill this thread (a dead completer
                # wedges the bounded pipeline and 504s everything after)
                try:
                    boxes = scale_coords(
                        self.img_size, dets[i][valid[i]], r.hw0,
                        ratio_pad=(r.ratio, r.pad),
                    )
                    if r.conf is not None:
                        boxes = boxes[boxes[:, 4] >= r.conf]
                    r.dets = boxes
                    r.batched = len(reqs)
                except Exception as e:
                    r.error = f"postprocess failed: {e}"
                    with self._stats_mu:
                        self._n_errors += 1
                r.event.set()
            with self._stats_mu:
                self._n_batches += 1
                self._n_batched_imgs += len(reqs)
                self._lat_ms.append(ms)
                if len(self._lat_ms) > 512:
                    self._lat_ms = self._lat_ms[-512:]

    # -- request handling --------------------------------------------------

    def _predict(self, body: bytes, conf: float | None):
        decoded = decode_request_bytes(body, self.img_size)
        if decoded is None:
            raise ValueError("could not decode image bytes")
        img, (ratio, pad), hw0 = decoded
        req = _Request(img, ratio, pad, hw0, conf,
                       deadline=time.monotonic() + self.request_timeout_s)
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            raise OverflowError("server overloaded (queue full)")
        if not req.event.wait(self.request_timeout_s):
            raise TimeoutError("inference timed out")
        if req.error == self.EXPIRED:
            # the dispatcher's clock crossed the deadline marginally before
            # this waiter's own wait() would have — same outcome, same code
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        with self._stats_mu:
            self._n_requests += 1
        dets = req.dets
        out = []
        for row in dets:
            cls = int(row[5])
            out.append({
                "box": [round(float(v), 2) for v in row[:4]],
                "score": round(float(row[4]), 5),
                "class": cls,
                "label": (self.labels[cls]
                          if self.labels and 0 <= cls < len(self.labels)
                          else str(cls)),
            })
        return {
            "detections": out,
            "width": int(req.hw0[1]),
            "height": int(req.hw0[0]),
            "batched": req.batched,
        }

    def _stats(self):
        with self._stats_mu:
            lat = sorted(self._lat_ms)
            n = len(lat)
            pct = (lambda q: round(lat[min(n - 1, int(q * n))], 2)) if n else (
                lambda q: None)
            return {
                "requests": self._n_requests,
                "errors": self._n_errors,
                "batches": self._n_batches,
                "avg_batch": (round(self._n_batched_imgs / self._n_batches, 2)
                              if self._n_batches else 0.0),
                "batch_size": self.batch_size,
                "p50_batch_ms": pct(0.50),
                "p99_batch_ms": pct(0.99),
            }

    def _healthz(self):
        import jax

        return {
            "ok": True,
            "platform": jax.devices()[0].platform,
            "img_size": list(self.img_size),
            "batch_size": self.batch_size,
        }

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # silence per-request spam
                pass

            def _json(self, code: int, payload: dict):
                try:
                    body = json.dumps(payload).encode()
                    self.send_response(code)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    if self.close_connection:
                        # tell keep-alive clients the stream ends here
                        # (set on paths that left the request body unread)
                        self.send_header("Connection", "close")
                    self.end_headers()
                    self.wfile.write(body)
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client went away; nothing to tell it

            def do_GET(self):
                path = self.path.split("?", 1)[0]
                if path == "/healthz":
                    self._json(200, server._healthz())
                elif path == "/stats":
                    self._json(200, server._stats())
                else:
                    self._json(404, {"error": f"unknown path {path}"})

            MAX_BODY = 32 * 1024 * 1024  # one encoded image; 413 beyond

            def do_POST(self):
                path, _, query = self.path.partition("?")
                if path != "/predict":
                    # body not consumed: the keep-alive stream is no longer
                    # framed correctly, so close after responding
                    self.close_connection = True
                    self._json(404, {"error": f"unknown path {path}"})
                    return
                length = int(self.headers.get("Content-Length") or 0)
                if length <= 0:
                    # absent Content-Length (e.g. a chunked body): frames
                    # are left unread on the stream — close it
                    self.close_connection = True
                    self._json(400, {"error": "empty body (a body requires "
                                     "Content-Length; chunked unsupported)"})
                    return
                if length > self.MAX_BODY:
                    self.close_connection = True  # refuse to buffer/drain it
                    self._json(413, {"error": f"body over {self.MAX_BODY} B"})
                    return
                body = self.rfile.read(length)
                if len(body) != length:
                    # truncated upload; stream is desynced, close it
                    self.close_connection = True
                    self._json(400, {"error": "truncated body"})
                    return
                conf = None
                for kv in query.split("&"):
                    if kv.startswith("conf="):
                        try:
                            conf = float(kv[5:])
                        except ValueError:
                            self._json(400, {"error": "bad conf value"})
                            return
                try:
                    self._json(200, server._predict(body, conf))
                except ValueError as e:
                    self._json(400, {"error": str(e)})
                except OverflowError as e:
                    self._json(503, {"error": str(e)})
                except TimeoutError as e:
                    self._json(504, {"error": str(e)})
                except Exception as e:
                    self._json(500, {"error": str(e)})

        return Handler
