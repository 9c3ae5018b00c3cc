"""Serving daemon tests: HTTP surface, dynamic batching, decode parity.

Drives vision_kit_tpu/serve.py end-to-end over localhost with a tiny v5n
model on CPU (the reference has no serving surface to diff against; the
correctness gate is exact agreement with the same computation done
directly through the Predictor)."""

import json
import threading
import urllib.error
import urllib.request

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models.architectures import YOLOV5
from vision_kit_tpu.predictor import Predictor
from vision_kit_tpu.serve import InferenceServer, decode_request_bytes

IMG_SIZE = (64, 64)


def _test_image(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 60, np.uint8)
    x, y = int(rng.integers(0, w - 40)), int(rng.integers(0, h - 40))
    img[y : y + 32, x : x + 40] = (220, 40, 40)
    return img


def _jpeg_bytes(img_rgb):
    ok, enc = cv2.imencode(
        ".jpg", cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR),
        [cv2.IMWRITE_JPEG_QUALITY, 95],
    )
    assert ok
    return enc.tobytes()


def _post(url, data, timeout=120):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture(scope="module")
def server():
    model = YOLOV5(variant="n", num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, *IMG_SIZE, 3)), training=False
    )
    predictor = Predictor(
        model, variables, img_size=IMG_SIZE, conf_thres=0.01, iou_thres=0.45
    )
    srv = InferenceServer(
        predictor, class_labels=["red", "green"], batch_size=4,
        max_wait_ms=300.0, port=0,
    )
    srv.start()
    yield srv
    srv.stop()


def test_healthz(server):
    status, payload = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200
    assert payload["ok"] is True
    assert payload["img_size"] == list(IMG_SIZE)
    assert payload["batch_size"] == 4


def test_predict_single(server):
    img = _test_image(seed=1)
    status, payload = _post(
        f"http://127.0.0.1:{server.port}/predict", _jpeg_bytes(img)
    )
    assert status == 200
    assert payload["width"] == 128 and payload["height"] == 96
    assert payload["batched"] >= 1
    for det in payload["detections"]:
        x1, y1, x2, y2 = det["box"]
        assert 0 <= x1 <= x2 <= 128 and 0 <= y1 <= y2 <= 96
        assert 0.0 <= det["score"] <= 1.0
        assert det["label"] in ("red", "green")


def test_predict_matches_direct_predictor(server):
    """The HTTP path must be exactly the documented computation: bytes ->
    host letterbox -> padded fixed-batch program -> scale_coords."""
    img = _test_image(seed=2)
    data = _jpeg_bytes(img)
    status, payload = _post(
        f"http://127.0.0.1:{server.port}/predict", data
    )
    assert status == 200

    from vision_kit_tpu.ops.letterbox import scale_coords

    lb, (ratio, pad), hw0 = decode_request_bytes(data, IMG_SIZE)
    imgs = np.zeros((4, *IMG_SIZE, 3), np.uint8)
    imgs[0] = lb
    dets_list, _ = server.predictor.predict_batch(imgs)
    want = scale_coords(IMG_SIZE, dets_list[0], hw0, ratio_pad=(ratio, pad))

    got = np.array(
        [d["box"] + [d["score"], d["class"]] for d in payload["detections"]],
        np.float32,
    ).reshape(-1, 6)
    assert len(got) == len(want)
    if len(want):
        # response rounds boxes to 2 decimals and scores to 5
        np.testing.assert_allclose(got[:, :4], want[:, :4], atol=0.51)
        np.testing.assert_allclose(got[:, 4], want[:, 4], atol=1e-4)
        np.testing.assert_array_equal(got[:, 5], want[:, 5])


def test_conf_post_filter(server):
    img = _test_image(seed=3)
    data = _jpeg_bytes(img)
    url = f"http://127.0.0.1:{server.port}/predict"
    _, base = _post(url, data)
    _, strict = _post(url + "?conf=0.99", data)
    base_scores = {d["score"] for d in base["detections"]}
    for d in strict["detections"]:
        assert d["score"] >= 0.99
        assert d["score"] in base_scores
    assert len(strict["detections"]) <= len(base["detections"])


def test_dynamic_batching_coalesces(server):
    """Concurrent clients ride one device dispatch (padded fixed batch)."""
    url = f"http://127.0.0.1:{server.port}/predict"
    n = 4
    barrier = threading.Barrier(n)
    results = [None] * n

    def worker(i):
        data = _jpeg_bytes(_test_image(seed=10 + i))
        barrier.wait()
        results[i] = _post(url, data)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # with a 300 ms coalescing window and simultaneous posts, at least one
    # batch must have carried >1 request
    assert max(r[1]["batched"] for r in results) >= 2

    status, stats = _get(f"http://127.0.0.1:{server.port}/stats")
    assert status == 200
    assert stats["requests"] >= n
    assert stats["batches"] >= 1
    assert stats["p50_batch_ms"] is not None


def test_bad_body_is_400(server):
    url = f"http://127.0.0.1:{server.port}/predict"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, b"this is not an image")
    assert ei.value.code == 400


def test_unknown_path_is_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"http://127.0.0.1:{server.port}/nope")
    assert ei.value.code == 404


def test_truncated_body_is_400_and_server_survives(server):
    """A client that advertises Content-Length but disconnects early must
    get a 400 — and must NOT kill the process (a cv::Exception escaping
    the native decode used to SIGABRT the daemon)."""
    import socket

    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    s.sendall(
        b"POST /predict HTTP/1.1\r\nHost: x\r\nContent-Length: 1000\r\n"
        b"\r\nonly-a-few-bytes"
    )
    s.shutdown(socket.SHUT_WR)
    resp = s.recv(65536).decode(errors="replace")
    s.close()
    assert " 400 " in resp.splitlines()[0]
    # server must still be alive and serving
    status, payload = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200 and payload["ok"] is True


def test_oversized_body_is_413(server):
    import socket

    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    s.sendall(
        b"POST /predict HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 9999999999\r\n\r\n"
    )
    resp = s.recv(65536).decode(errors="replace")
    s.close()
    assert " 413 " in resp.splitlines()[0]


def test_post_unknown_path_does_not_corrupt_keepalive(server):
    """404'd POST bodies are unframed leftovers on a keep-alive stream;
    the server must close the connection rather than parse the body as
    the next request."""
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
    conn.request("POST", "/nope", body=b"\x08garbage-image-bytes" * 100)
    resp = conn.getresponse()
    assert resp.status == 404
    resp.read()
    assert resp.getheader("Connection") == "close" or resp.isclosed()
    conn.close()
    status, _ = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200


def test_completion_firewall_survives_bad_request_object(server):
    """Engine-level contract (tools/bench_serve.py feeds _Requests
    directly): a malformed request must error itself, not kill the
    completion thread and wedge the pipeline."""
    from vision_kit_tpu.serve import _Request

    h, w = server.img_size
    img = np.zeros((h, w, 3), np.uint8)
    bad = _Request(img, 1.0, (0.0, 0.0), (h, w), conf="not-a-float")
    server._queue.put(bad)
    assert bad.event.wait(120)
    assert bad.error is not None and "postprocess" in bad.error
    # pipeline still serves HTTP afterwards
    status, payload = _post(
        f"http://127.0.0.1:{server.port}/predict",
        _jpeg_bytes(_test_image(seed=9)),
    )
    assert status == 200 and "detections" in payload


def test_post_without_content_length_is_400_and_closes(server):
    """A body the server can't frame (chunked / no Content-Length) gets a
    400 that also ends the keep-alive stream."""
    import socket

    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    s.sendall(
        b"POST /predict HTTP/1.1\r\nHost: x\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n0\r\n\r\n"
    )
    resp = s.recv(65536).decode(errors="replace")
    s.close()
    assert " 400 " in resp.splitlines()[0]
    assert "connection: close" in resp.lower()
    status, _ = _get(f"http://127.0.0.1:{server.port}/healthz")
    assert status == 200


def test_native_empty_bytes_decode_returns_none():
    from vision_kit_tpu.data import native

    if not native.available():
        pytest.skip("native vkio not built")
    assert native.decode_letterbox_bytes(b"", (64, 64)) is None


def test_decode_request_bytes_native_python_identical(monkeypatch):
    """Native memory decode and the cv2 fallback must agree bit-for-bit
    (same contract as the file-path decode, tests/test_native.py)."""
    from vision_kit_tpu.data import native

    if not native.available():
        pytest.skip("native vkio not built")
    data = _jpeg_bytes(_test_image(h=200, w=300, seed=4))
    got = decode_request_bytes(data, (64, 64))
    monkeypatch.setenv("VK_NO_NATIVE", "1")
    want = decode_request_bytes(data, (64, 64))
    assert got is not None and want is not None
    np.testing.assert_array_equal(got[0], want[0])
    assert got[1][1] == want[1][1]  # pad
    assert abs(got[1][0] - want[1][0]) < 1e-6  # ratio (f32 vs f64)
    assert tuple(got[2]) == tuple(want[2])  # (h0, w0)


def test_server_over_multichip_predictor():
    """docs/DEPLOY.md claim: InferenceServer composes with a mesh-sharded
    Predictor — the serving batch shards over the data axis (virtual
    8-device mesh, conftest)."""
    from vision_kit_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1)
    model = YOLOV5(variant="n", num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *IMG_SIZE, 3)), training=False
    )
    pred = Predictor(model, variables, img_size=IMG_SIZE, conf_thres=0.01,
                     mesh=mesh)
    srv = InferenceServer(pred, batch_size=4, max_wait_ms=100.0, port=0)
    srv.start()
    try:
        url = f"http://127.0.0.1:{srv.port}/predict"
        results = [None, None]

        def worker(i):
            results[i] = _post(url, _jpeg_bytes(_test_image(seed=20 + i)))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r[0] == 200 for r in results)
        for _, payload in results:
            for det in payload["detections"]:
                x1, y1, x2, y2 = det["box"]
                assert 0 <= x1 <= x2 <= 128 and 0 <= y1 <= y2 <= 96
    finally:
        srv.stop()


def test_decode_request_bytes_png():
    """Non-JPEG formats decode through the same entry point."""
    img = _test_image(h=80, w=100, seed=5)
    ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    out = decode_request_bytes(enc.tobytes(), (64, 64))
    assert out is not None
    assert out[2] == (80, 100)


def test_bench_load_curve_paces_and_measures(server):
    """tools/bench_serve.bench_load_curve (the VERDICT r4 #5 instrument):
    paced submission at a fraction of a given capacity completes every
    request, reports achieved throughput near the offered rate, and
    produces ordered p50 <= p99 latencies. Pins the pacing/measurement
    machinery on CPU so the published load-curve numbers can't bitrot."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from bench_serve import bench_load_curve

    rows = bench_load_curve(server, capacity_ips=40.0, fracs=[0.5],
                            n_requests=24, warmup_batches=1)
    (frac, offered, achieved, p50, p99), = rows
    assert frac == 0.5 and offered == 20.0
    # every request completed; the paced feed can't exceed the offered
    # rate by more than the final-batch flush
    assert 0 < achieved < offered * 2
    assert 0 < p50 <= p99
