"""Serving endpoint tests: drive the real HTTP surface."""

import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.serving import DescriptorService, serve


@pytest.fixture(scope="module")
def server_url():
    import cv2  # noqa: F401  (decode path requires cv2)

    cfg = ModelConfig(vlad_cores=4, reduction="none", image_height=32,
                      image_width=32, compute_dtype="float32", use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    # tiny retrieval index: descriptors of 6 random images
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    imgs = (rng.random((6, 32, 32, 3)) * 255).astype(np.float32)
    index, _ = model.apply({"params": params}, imgs)
    service = DescriptorService(cfg, params, batch_size=4,
                                index=np.asarray(index))
    server = serve(service, port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", imgs, np.asarray(index)
    server.shutdown()


def _png(img: np.ndarray) -> bytes:
    import cv2

    ok, buf = cv2.imencode(".png", cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR))
    return buf.tobytes()


def _post(url: str, data: bytes, content_type="application/json"):
    req = urllib.request.Request(url, data=data, headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_url):
    url, _, _ = server_url
    with urllib.request.urlopen(url + "/healthz") as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["dim"] == 4 * 512


def test_embed_single(server_url):
    url, imgs, index = server_url
    status, payload = _post(url + "/embed", _png(imgs[0]), "image/png")
    assert status == 200
    desc = np.asarray(payload["descriptor"])
    assert desc.shape == (4 * 512,)
    np.testing.assert_allclose(np.linalg.norm(desc), 1.0, rtol=1e-4)
    # matches the index entry for the same image (uint8 roundtrip tolerance)
    cos = float(desc @ index[0])
    assert cos > 0.999


def test_embed_batch_and_search(server_url):
    url, imgs, index = server_url
    body = json.dumps(
        {"images_b64": [base64.b64encode(_png(im)).decode() for im in imgs[:3]],
         "k": 2}
    ).encode()
    status, payload = _post(url + "/embed_batch", body)
    assert status == 200
    assert np.asarray(payload["descriptors"]).shape == (3, 4 * 512)

    status, payload = _post(url + "/search", body)
    assert status == 200
    idx = np.asarray(payload["indices"])
    assert idx.shape == (3, 2)
    # each query's nearest index entry is itself
    np.testing.assert_array_equal(idx[:, 0], [0, 1, 2])


def test_bad_payload(server_url):
    url, _, _ = server_url
    status, payload = _post(url + "/embed", b"not an image", "image/png")
    assert status == 400
    assert "error" in payload
    status, payload = _post(url + "/nope", b"{}")
    assert status == 404
