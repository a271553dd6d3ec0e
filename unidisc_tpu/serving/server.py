"""OpenAI-compatible HTTP server over the inference engine.

Redesign of the reference FastAPI demo server
(reference: demo/server.py:117-219 — POST /v1/chat/completions, per-GPU
worker processes with queues, response cache by request hash). TPU-native
simplifications: one process per host (the jitted sampler already saturates
the chip; SPMD handles multi-chip), stdlib ThreadingHTTPServer (fastapi is
not a hard dependency), same response-cache-by-hash behavior.

Run: python -m unidisc_tpu.serving.server --port 8000 [--ckpt DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from unidisc_tpu.serving.batcher import RequestBatcher
from unidisc_tpu.serving.engine import InferenceEngine, decode_image_b64


def parse_messages(messages: list) -> dict:
    """OpenAI chat messages -> engine kwargs (reference:
    demo/inference.py:125-160 messages_to_batch)."""
    text_parts = []
    image = None
    mask = None
    for msg in messages:
        if msg.get("role") not in ("user", "system"):
            continue
        content = msg.get("content", "")
        if isinstance(content, str):
            text_parts.append(content)
        else:
            for item in content:
                if item.get("type") == "text":
                    text_parts.append(item["text"])
                elif item.get("type") == "image_url":
                    url = item["image_url"]["url"]
                    if url.startswith("data:"):
                        decoded = decode_image_b64(url.split(",", 1)[1])
                        # an image item flagged is_mask is a spatial edit
                        # mask over the previous image (reference:
                        # demo/scoring/call_model.py:85-92)
                        if item.get("is_mask"):
                            mask = decoded
                        else:
                            image = decoded
    text = "\n".join(p for p in text_parts if p) or None
    return {"text": text, "image": image, "mask": mask}


class ServerMetrics:
    """Process-wide serving metrics, rendered in the Prometheus text
    exposition format at GET /metrics (stdlib-only — no client library).
    Counters are cumulative; latency percentiles are over a sliding
    window of the last 512 requests per route; live gauges (queue depth,
    active slots) are read from the engine at scrape time."""

    WINDOW = 512

    def __init__(self):
        import collections
        self._lock = threading.Lock()
        self._counts = collections.Counter()
        self._lat = collections.defaultdict(
            lambda: collections.deque(maxlen=self.WINDOW))

    def count(self, name: str, n: int = 1):
        with self._lock:
            self._counts[name] += n

    def observe(self, route: str, seconds: float):
        with self._lock:
            self._counts['requests_total{route="%s"}' % route] += 1
            self._lat[route].append(seconds)

    @staticmethod
    def _pct(xs, q):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    def render(self, engine) -> str:
        # group each metric family under ONE HELP/TYPE header — the
        # text exposition format forbids interleaving families
        lines = []
        with self._lock:
            fams = {}
            for name, v in sorted(self._counts.items()):
                base, _, label = name.partition("{")
                lab = "{" + label if label else ""
                fams.setdefault(base, []).append(
                    f"unidisc_{base}{lab} {v}")
            for base, samples in sorted(fams.items()):
                lines.append(f"# TYPE unidisc_{base} counter")
                lines.extend(samples)
            for route, xs in sorted(self._lat.items()):
                if not xs:
                    continue
                for q, tag in ((0.5, "0.5"), (0.95, "0.95"),
                               (0.99, "0.99")):
                    lines.append(
                        'unidisc_request_seconds{route="%s",quantile='
                        '"%s"} %.4f' % (route, tag, self._pct(xs, q)))
        # live gauges (best-effort — batchers are built lazily)
        cont = getattr(engine, "_continuous", None)
        if cont is not None:
            try:
                lines.append("unidisc_queue_depth %d"
                             % cont._queue.qsize())
                lines.append("unidisc_active_slots %d" % sum(
                    r is not None for r in cont._slot_req))
                lines.append("unidisc_slots %d" % cont.slots)
            except Exception:  # noqa: BLE001
                pass
        return "\n".join(lines) + "\n"


METRICS = ServerMetrics()


class Handler(BaseHTTPRequestHandler):
    engine: InferenceEngine = None
    batcher: RequestBatcher = None
    cache: dict = {}
    lock = threading.Lock()

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/health":
            self._json(200, {"status": "ok"})
        elif self.path == "/metrics":
            body = METRICS.render(self.engine).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path in ("/", "/index.html"):
            # browser chat/editing UI (reference: demo/client.py fasthtml
            # app; here a dependency-free static page)
            import os
            page = os.path.join(os.path.dirname(__file__), "webui.html")
            with open(page, "rb") as f:
                body = f.read()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        # _route starts at "other" (404s, parse failures); the handler
        # reassigns it when a real route is reached, and cache replays
        # record as "cached" so their ~0ms latencies never skew the
        # sampler routes' quantiles
        t0 = time.perf_counter()
        self._route = "other"
        try:
            self._post_inner()
        finally:
            METRICS.observe(self._route, time.perf_counter() - t0)

    def _post_inner(self):
        if self.path != "/v1/chat/completions":
            self._json(404, {"error": "not found"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            key = hashlib.sha256(
                json.dumps(req, sort_keys=True).encode()).hexdigest()
            if key in self.cache:
                self._route = "cached"
                METRICS.count("cache_hits_total")
                # replay in the format the client asked for — a cached
                # stream:true request must still come back as SSE
                if req.get("stream"):
                    self._stream(self.cache[key])
                else:
                    self._json(200, self.cache[key])
                return

            if "segments" in req:
                self._route = "interleaved"
                # interleaved multimodal document request (multi-image,
                # generate-slots, spatial masks) — engine.run_interleaved
                if self.engine.codec is None and any(
                        "image_b64" in s for s in req["segments"]):
                    # token-level interleaved requests work codec-free;
                    # pixel payloads need one
                    self._json(400, {"error": "image_b64 segments need a "
                                     "codec (--codec) for pixel I/O"})
                    return
                segs = []
                for s in req["segments"]:
                    s = dict(s)
                    if s.get("kind") == "image" and "image_b64" in s:
                        img = decode_image_b64(s.pop("image_b64"))
                        codec = self.engine.codec
                        import jax.numpy as jnp
                        import numpy as np
                        s["ids"] = np.asarray(codec.encode(
                            codec.params, jnp.asarray(img[None])))[0]
                    if s.get("pixel_mask") is not None:
                        import numpy as np
                        s["pixel_mask"] = np.asarray(s["pixel_mask"], bool)
                    segs.append(s)
                # interleaved requests bypass the batcher (ragged layouts
                # don't coalesce); the engine's device lock serializes them
                # against the batcher worker and each other
                result = self.engine.run_interleaved(
                    segs, steps=req.get("steps"),
                    seed=req.get("seed", int(time.time()) % 2 ** 31))
                out_segs = []
                for s in result["segments"]:
                    if s["kind"] == "text":
                        out_segs.append({"kind": "text", "text": s["text"]})
                    else:
                        o = {"kind": "image", "grid": s["grid"],
                             "ids": [int(i) for i in s["ids"]]}
                        if "image_b64" in s:
                            o["image_b64"] = s["image_b64"]
                        out_segs.append(o)
                self._json(200, {"id": f"unidisc-{key[:12]}",
                                 "object": "interleaved.completion",
                                 "segments": out_segs,
                                 "usage": {"nfe": result["nfe"]}})
                return

            parsed = parse_messages(req.get("messages", []))

            if (self.engine.config.trainer.parameterization == "ar"
                    and parsed["image"] is None):
                # AR text completion: continuous batching — the request
                # joins the persistent device batch immediately instead of
                # waiting for a full diffusion batch slot, and stream:true
                # sends tokens AS THEY DECODE (serving/continuous.py)
                self._route = "ar"
                self._ar_completion(req, parsed, key)
                return

            self._route = "diffusion"
            image_ids = None
            image_mask = None
            if parsed["image"] is not None and self.engine.codec is not None:
                import jax.numpy as jnp
                import numpy as np
                codec = self.engine.codec
                img = parsed["image"]
                side = self.engine.m.img_length ** 0.5
                size = int(side) * codec.downsample
                from PIL import Image
                pil = Image.fromarray(
                    ((img + 1) * 127.5).clip(0, 255).astype("uint8"))
                pil = pil.resize((size, size))
                img = np.asarray(pil, np.float32) / 127.5 - 1
                image_ids = np.asarray(codec.encode(
                    codec.params, jnp.asarray(img[None])))[0]
                if parsed["mask"] is not None:
                    from unidisc_tpu.serving.engine import \
                        downscale_bool_mask
                    m = parsed["mask"]
                    pil_m = Image.fromarray(
                        ((m + 1) * 127.5).clip(0, 255).astype("uint8"))
                    m = np.asarray(pil_m.resize((size, size))).mean(-1) > 127
                    image_mask = downscale_bool_mask(
                        m, codec.downsample).reshape(-1)

            kwargs = dict(
                text=parsed["text"], image_ids=image_ids,
                image_mask=image_mask,
                steps=req.get("steps"),
                seed=req.get("seed", int(time.time()) % 2 ** 31),
                task=req.get("task", "auto"),
                no_batch=bool(req.get("no_batch", False)))
            # concurrent requests coalesce into one device batch
            result = self.batcher.run(**kwargs) if self.batcher is not None \
                else self.engine.run(**{k: v for k, v in kwargs.items()
                                        if k != "no_batch"})

            content = [{"type": "text", "text": result["text"]}]
            for b64 in result.get("images_b64", []):
                content.append({"type": "image_url", "image_url": {
                    "url": f"data:image/png;base64,{b64}"}})
            payload = {
                "id": f"unidisc-{key[:12]}",
                "object": "chat.completion",
                "model": "unidisc-tpu",
                "choices": [{"index": 0, "finish_reason": "stop",
                             "message": {"role": "assistant",
                                         "content": content}}],
                "usage": {"nfe": result["nfe"]},
            }
            self.cache[key] = payload
            if req.get("stream"):
                self._stream(payload)
            else:
                self._json(200, payload)
        except Exception as e:  # noqa: BLE001
            METRICS.count("errors_total")
            self._json(500, {"error": f"{type(e).__name__}: {e}"})

    def _ar_completion(self, req: dict, parsed: dict, key: str):
        """Continuous-batched AR text completion, optionally streaming
        token deltas as they decode (true incremental SSE, unlike the
        diffusion paths which stream a finished payload)."""
        max_new = int(req.get("max_tokens", 64))
        temperature = float(req.get("temperature", 0.0))
        seed = req.get("seed")
        tok = self.engine.tokenizer

        if not req.get("stream"):
            fut = self.engine.complete_text(
                parsed["text"] or "", max_new_tokens=max_new,
                temperature=temperature, seed=seed)
            res = fut.result(timeout=600)
            payload = {
                "id": f"unidisc-{key[:12]}",
                "object": "chat.completion",
                "model": "unidisc-tpu",
                "choices": [{"index": 0, "finish_reason": "stop",
                             "message": {"role": "assistant",
                                         "content": res["text"]}}],
                "usage": {"completion_tokens": len(res["tokens"])},
            }
            self.cache[key] = payload
            self._json(200, payload)
            return

        import queue as _queue
        deltas: "_queue.Queue" = _queue.Queue()
        acc: list = []

        def on_tokens(ids):
            acc.extend(ids)
            deltas.put(tok.decode(acc))  # cumulative decode; diff below

        fut = self.engine.complete_text(
            parsed["text"] or "", max_new_tokens=max_new,
            temperature=temperature, seed=seed, stream_cb=on_tokens)

        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()

        def chunk(delta, finish=None):
            body = {"id": f"unidisc-{key[:12]}",
                    "object": "chat.completion.chunk",
                    "model": "unidisc-tpu",
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}]}
            self.wfile.write(f"data: {json.dumps(body)}\n\n".encode())
            self.wfile.flush()

        chunk({"role": "assistant"})

        def stable(text):
            # a multi-byte char whose bytes are split across drains
            # decodes to trailing U+FFFD until the rest arrives — hold
            # those back so every emitted delta is a true prefix of the
            # final text (genuinely invalid bytes stop being *trailing*
            # once later chars land, and flush then)
            while text and text[-1] == "�":
                text = text[:-1]
            return text

        sent = ""
        while True:
            try:
                text = stable(deltas.get(timeout=0.1))
            except _queue.Empty:
                if fut.done():
                    break
                continue
            if text.startswith(sent) and len(text) > len(sent):
                chunk({"content": text[len(sent):]})
                sent = text
        res = fut.result(timeout=600)
        if res["text"] != sent:
            if res["text"].startswith(sent):
                chunk({"content": res["text"][len(sent):]})
            else:
                # the tokenizer rewrote earlier text (non-prefix-stable
                # detokenization): the client's transcript has diverged
                # and deltas can't fix it — send a full replacement so
                # it always converges to the final text (ADVICE r2)
                chunk({"content": res["text"], "replace": True})
        chunk({}, finish="stop")
        self.wfile.write(b"data: [DONE]\n\n")

    def _stream(self, payload: dict):
        """OpenAI-style SSE chunks (role, then content items, then DONE)."""
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.end_headers()

        def chunk(delta, finish=None):
            body = {"id": payload["id"], "object": "chat.completion.chunk",
                    "model": payload["model"],
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}]}
            self.wfile.write(f"data: {json.dumps(body)}\n\n".encode())

        chunk({"role": "assistant"})
        for item in payload["choices"][0]["message"]["content"]:
            chunk({"content": [item]})
        chunk({}, finish="stop")
        self.wfile.write(b"data: [DONE]\n\n")


def make_server(engine: InferenceEngine, port: int = 8000,
                host: str = "127.0.0.1", *,
                batcher: Optional[RequestBatcher] = None,
                max_batch: int = 16,
                max_wait_ms: float = 25.0) -> ThreadingHTTPServer:
    if batcher is None:
        batcher = RequestBatcher(engine, max_batch=max_batch,
                                 max_wait_ms=max_wait_ms)
    handler = type("BoundHandler", (Handler,),
                   {"engine": engine, "batcher": batcher, "cache": {},
                    "lock": threading.Lock()})
    srv = ThreadingHTTPServer((host, port), handler)
    srv.batcher = batcher
    return srv


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--ckpt", default=None,
                        help="run dir with checkpoints/ (EMA params used)")
    parser.add_argument("--reference-ckpt", default=None,
                        help="published reference checkpoint file "
                        "(aswerdlow/unidisc_* model.safetensors or a "
                        "torch .pt) — architecture is inferred from the "
                        "weights, --model supplies only the sequence "
                        "layout / sampling defaults")
    parser.add_argument("--model", default="small")
    parser.add_argument("--steps", type=int, default=32)
    parser.add_argument("--codec", default=None,
                        help="image codec for pixel I/O (e.g. llamagen-vq16)")
    parser.add_argument("--quantize", default=None, choices=[None, "int8"],
                        help="serve with int8 W8A8 matmuls (~1.4x on v5e)")
    parser.add_argument("--lora", default=None,
                        help="path to a LoRA adapter .npz saved by "
                        "training/lora.save_lora — merged into the base "
                        "weights at startup (before --quantize)")
    parser.add_argument("--kv-cache", default=None, choices=[None, "int8"],
                        help="AR decode KV cache dtype (int8 halves the "
                        "cache reads that bound large-batch decode)")
    parser.add_argument("--experiments", default=None,
                        help="comma-separated experiment overlays (e.g. "
                        "fast_nfe: 8-step dilated sampling at matched "
                        "quality, 3.3x throughput)")
    parser.add_argument("--mesh", default=None,
                        help="SPMD serving mesh spec, e.g. 'fsdp=2,pp=2' "
                        "— shards weights and pipelines the trunk across "
                        "chips (parallel/sample.py)")
    parser.add_argument("--rolling", type=int, default=0,
                        help="serve diffusion requests through the "
                        "rolling continuous batcher with N slots "
                        "(per-row denoise steps, mid-flight admission; "
                        "serving/rolling.py)")
    parser.add_argument("--scaffold", default=None,
                        help="scaffold decoding: 'preset[=ckpt_dir]' of "
                        "a SMALLER trunk that runs the late denoise "
                        "steps (97%% of big-only accuracy at 26%% "
                        "compute measured at split 8/32 — "
                        "sampling/scaffold.py)")
    parser.add_argument("--scaffold-split", type=int, default=8,
                        help="denoise steps run on the MAIN model "
                        "before handing off to the scaffold trunk")
    parser.add_argument("--speculative", default=None,
                        help="AR models only: draft preset for "
                        "speculative decoding — the draft proposes "
                        "--gamma tokens per target forward; greedy "
                        "output is lossless (serving/speculative.py). "
                        "'lookup[:N]' = draft-FREE prompt-lookup "
                        "speculation (proposals from each row's own "
                        "N-gram history; no second model)")
    parser.add_argument("--gamma", type=int, default=4,
                        help="speculative draft length per round")
    args = parser.parse_args(argv)

    from unidisc_tpu.serving.engine import build_engine

    engine = build_engine(preset=args.model, checkpoint=args.ckpt,
                          reference_ckpt=args.reference_ckpt,
                          codec_name=args.codec, steps=args.steps,
                          quantize=args.quantize, lora=args.lora,
                          kv_cache=args.kv_cache,
                          mesh=args.mesh, rolling=args.rolling,
                          scaffold=args.scaffold,
                          scaffold_split=args.scaffold_split,
                          speculative=args.speculative,
                          spec_gamma=args.gamma,
                          experiments=(args.experiments.split(",")
                                       if args.experiments else None))
    server = make_server(engine, args.port, args.host)
    print(f"[serve] listening on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
