"""HTTP serving front end (serve/http_api.py): wire-protocol contract,
micro-batching of concurrent HTTP clients, error paths, CLI flag."""

import dataclasses
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from multimodal_emotion_processing_tpu import configs
from multimodal_emotion_processing_tpu.data.synthetic import synthetic_dataset
from multimodal_emotion_processing_tpu.models import build_model
from multimodal_emotion_processing_tpu.serve import (
    BatchingServer, HttpFrontend, StreamingPredictor)


def tiny_exp(name="robot_demo"):
    exp = configs.get(name)
    m = dataclasses.replace(exp.model, l_len=4, v_len=6, a_len=8, dim=12,
                            n_heads=2, l_dim=5, v_dim=4, a_dim=3, p_len=3,
                            v_dims_multires=(4, 6, 8))
    return dataclasses.replace(exp, model=m)


def _frontend(exp, n_members=2, **server_kw):
    model = build_model(exp)
    ps = [model.init(jax.random.PRNGKey(i)) for i in range(n_members)]
    sample = synthetic_dataset("robot_demo", exp.model, 1, seed=3)[0]
    spec = {k: v.shape for k, v in sample.items() if k != "label"}
    srv = BatchingServer(model, ps, offsets=exp.thresholds, **server_kw)
    off = len(exp.thresholds)
    fe = HttpFrontend(srv, spec, exp.emotion_names[:off],
                      host="127.0.0.1", port=0)
    return fe, srv, model, ps, sample


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                    timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_predict_matches_streaming_predictor():
    """POST /predict returns the exact batch-1 ensemble result (float32
    survives the JSON round-trip losslessly on these magnitudes)."""
    exp = tiny_exp()
    fe, srv, model, ps, sample = _frontend(exp, max_delay_ms=1.0)
    sp = StreamingPredictor(model, ps, offsets=exp.thresholds)
    ref_pred, ref_probs = sp.predict(sample)
    with srv, fe:
        code, spec = _get(fe.port, "/spec")
        assert code == 200
        assert spec["emotions"] == list(exp.emotion_names[:len(exp.thresholds)])
        payload = {k: np.asarray(sample[k]).tolist() for k in spec["features"]}
        code, out = _post(fe.port, "/predict", payload)
    assert code == 200
    np.testing.assert_allclose(out["logits"], np.asarray(ref_pred),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out["probs"], np.asarray(ref_probs),
                               atol=1e-5, rtol=1e-5)
    assert set(out["emotions"]) == set(spec["emotions"])
    assert all(0.0 <= p <= 1.0 for p in out["emotions"].values())


def test_http_concurrent_clients_micro_batch():
    """Simultaneous HTTP clients group into ONE bucketed TPU dispatch —
    HTTP concurrency rides the BatchingServer collector."""
    exp = tiny_exp()
    fe, srv, model, ps, sample = _frontend(exp, max_delay_ms=500.0,
                                           buckets=(1, 2, 4, 8))
    samples = synthetic_dataset("robot_demo", exp.model, 6, seed=11)
    with srv, fe:
        srv.warmup(samples[0])
        keys = [k for k in samples[0] if k != "label"]
        results = [None] * len(samples)

        def call(i):
            payload = {k: np.asarray(samples[i][k]).tolist() for k in keys}
            results[i] = _post(fe.port, "/predict", payload)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(samples))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stats = srv.stats()
    assert all(r is not None and r[0] == 200 for r in results)
    assert stats["requests"] == 6
    assert stats["batches"] == 1 and stats["by_bucket"][8] == 1


def test_http_binary_predict_matches_json():
    """application/octet-stream: raw float32 buffers in /spec binary_order
    — bit-exact same sample as the JSON wire, so identical outputs."""
    exp = tiny_exp()
    fe, srv, _, _, sample = _frontend(exp, max_delay_ms=1.0)
    with srv, fe:
        code, spec = _get(fe.port, "/spec")
        assert code == 200
        order = spec["binary_order"]
        assert order == sorted(spec["features"])
        body = b"".join(np.ascontiguousarray(
            np.asarray(sample[k], np.float32)).tobytes() for k in order)
        assert len(body) == spec["binary_bytes"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/predict", data=body,
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out_bin = json.loads(r.read())
        payload = {k: np.asarray(sample[k]).tolist()
                   for k in spec["features"]}
        code, out_json = _post(fe.port, "/predict", payload)
        assert code == 200
        # wrong byte count -> 400 naming the expected size
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/predict", data=body[:-4],
            headers={"Content-Type": "application/octet-stream"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
        assert str(spec["binary_bytes"]) in json.loads(ei.value.read())["error"]
    np.testing.assert_array_equal(out_bin["logits"], out_json["logits"])
    np.testing.assert_array_equal(out_bin["probs"], out_json["probs"])


def test_http_error_paths():
    exp = tiny_exp()
    fe, srv, _, _, sample = _frontend(exp, max_delay_ms=1.0)
    keys = [k for k in sample if k != "label"]
    with srv, fe:
        # liveness
        code, health = _get(fe.port, "/healthz")
        assert code == 200 and health["status"] == "ok"
        assert health["members"] == 2
        # unknown paths
        assert _get(fe.port, "/nope")[0] == 404
        assert _post(fe.port, "/nope", {})[0] == 404
        # non-JSON body
        req = urllib.request.Request(
            f"http://127.0.0.1:{fe.port}/predict", data=b"not json",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 400
        # missing key
        code, err = _post(fe.port, "/predict", {})
        assert code == 400 and "missing feature keys" in err["error"]
        # wrong shape names the expected one
        payload = {k: np.asarray(sample[k]).tolist() for k in keys}
        payload[keys[0]] = [[0.0]]
        code, err = _post(fe.port, "/predict", payload)
        assert code == 400 and "expected" in err["error"]


def test_cli_http_serve_flag_parses():
    """The flag reaches cmd_serve; a port of 0 binds ephemeral.  Full
    blocking serve is exercised by the frontend tests above — here just
    assert the parser wiring exists."""
    from multimodal_emotion_processing_tpu.cli import build_parser

    args = build_parser().parse_args(
        ["serve", "robot_demo", "--http-port", "0", "--http-host", "::1"])
    assert args.http_port == 0 and args.http_host == "::1"
