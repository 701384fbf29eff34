"""Batch descriptor-serving endpoint.

New capability (the reference is research-only): a minimal HTTP service that
embeds images with a trained model — the deployment surface for the
visual-localization retrieval stack. Stdlib http.server keeps the framework
dependency-free; the compute path is the same jitted embed step as training
(train/step.py::build_embed_step via DescriptorExtractor), so serving
descriptors are bit-identical to offline dumps.

Protocol (JSON unless noted):
  GET  /healthz            -> {"status": "ok", "backend": ..., "dim": D}
  POST /embed              -> body: PNG/JPEG bytes (Content-Type image/*)
                              resp: {"descriptor": [...]}
  POST /embed_batch        -> body: {"images_b64": ["...", ...]}
                              resp: {"descriptors": [[...], ...]}
  POST /search             -> body: {"images_b64": [...], "k": 5}
                              resp: {"indices": [[...]], "distances": [[...]]}
                              (requires an index loaded at startup)

Requests are micro-batched per call; the extractor pads to its batch size so
any request count compiles against one program shape.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.evaluation.inference import DescriptorExtractor


def _decode_image(data: bytes) -> np.ndarray:
    import cv2

    img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("undecodable image payload")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class DescriptorService:
    """Model + optional retrieval index behind a lock (jit calls are
    thread-safe, but we serialize to keep device memory bounded)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        batch_size: int = 16,
        index: Optional[np.ndarray] = None,  # (R, D) descriptor index
        mesh=None,
        quant_scales=None,  # int8 PTQ activation scales (models/quant.py)
    ):
        self.cfg = cfg
        self.extractor = DescriptorExtractor(
            cfg, params, batch_size=batch_size, mesh=mesh,
            raw_descriptor=cfg.reduction in ("none", "pca"),
            quant_scales=quant_scales,
        )
        if index is None:
            self.index = None
        else:
            import jax.numpy as jnp

            # device-resident once; re-uploading per /search would ship the
            # whole index host->device on every request
            self.index = jnp.asarray(np.asarray(index, np.float32))
        self.mesh = mesh
        # the dimensionality /embed actually returns (raw descriptor for
        # none/pca reductions, reduced otherwise)
        self.embed_dim = (
            cfg.descriptor_dim if self.extractor.raw else cfg.output_dim
        )
        self._lock = threading.Lock()

    def embed(self, images) -> np.ndarray:
        with self._lock:
            return self.extractor.extract_images(images)

    def search(self, images, k: int = 5):
        if self.index is None:
            raise ValueError("no retrieval index loaded")
        import jax.numpy as jnp

        from soft_contrastive_learning_tpu.ops.topk import topk_l2, topk_l2_streamed

        q = self.embed(images)
        k_eff = min(k, len(self.index))
        if len(self.index) > 65536 and k_eff <= 128:
            # large index: stream tiles (Pallas on TPU) instead of
            # materializing the (Q, R) distance matrix
            d, i = topk_l2_streamed(jnp.asarray(q), self.index, k_eff)
        else:
            d, i = topk_l2(jnp.asarray(q), self.index, k_eff)
        return np.asarray(d), np.asarray(i)


def make_handler(service: DescriptorService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "dim": service.embed_dim,
                })
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                if self.path == "/embed":
                    img = _decode_image(raw)
                    desc = service.embed([img])[0]
                    self._send(200, {"descriptor": desc.tolist()})
                elif self.path == "/embed_batch":
                    req = json.loads(raw)
                    imgs = [
                        _decode_image(base64.b64decode(s))
                        for s in req["images_b64"]
                    ]
                    descs = service.embed(imgs)
                    self._send(200, {"descriptors": descs.tolist()})
                elif self.path == "/search":
                    req = json.loads(raw)
                    imgs = [
                        _decode_image(base64.b64decode(s))
                        for s in req["images_b64"]
                    ]
                    d, i = service.search(imgs, int(req.get("k", 5)))
                    self._send(200, {
                        "indices": i.tolist(), "distances": d.tolist(),
                    })
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:
                self._send(400, {"error": str(e)})

    return Handler


def serve(service: DescriptorService, host: str = "127.0.0.1", port: int = 8377):
    """Construct (but do not start) the HTTP server; callers run
    ``server.serve_forever()`` themselves — on the main thread (blocking, as
    the CLI does) or a background thread (as the tests do)."""
    server = ThreadingHTTPServer((host, port), make_handler(service))
    return server
