"""Persistent generation server: load once, generate many.

The reference is a one-shot CLI (mlx_video/generate.py main()); on TPU the
dominant per-run cost is compilation (denoise scan + chunked decoder —
minutes cold, PERF.md), which a resident process pays once per shape and
then never again: within one process a repeat 512^2x33 decode costs 0.31 s
and a denoise step its roofline time. This server is the deployment shape
that exploits that: models load once, stay on device (optionally
mesh-sharded), and every request reuses the compiled programs.

HTTP (stdlib only):
  GET  /healthz            -> {"status": "ok", ...}
  POST /generate {json}    -> {"path", "wall_seconds", "phases", ...}
  POST /generate {"stream": true, ...} -> NDJSON event stream: one line per
       denoise_step / phase / preview (base64 JPEG of the latest decoded
       frame) event, then a final {"kind": "result", ...} line (requires
       --max-batch 1).
  POST /enhance {prompt, mode?, max_tokens?, temperature?} -> {enhanced}
       Gemma prompt enhancement (needs a loaded text encoder); /generate
       also takes enhance_prompt/enhance_max_tokens/enhance_temperature.

Request fields (all optional except prompt unless --embeddings is given):
  prompt, negative_prompt, height, width, num_frames, fps, seed, pipeline
  (must match the server's --pipeline; requests for the other schedule are
  rejected with 400), stage1_steps, stage2_steps, num_inference_steps,
  cfg_scale, cfg_cache_interval, attn_broadcast_interval,
  teacache_threshold, cfg_sequential (sequential cond/uncond CFG forwards
  instead of the batched 2B pass — halves denoise activation memory),
  audio, audio_mode, tiling, lora (adapter file name(s)
  under --lora-dir), lora_strength (scalar or per-adapter list).

Generation is serialized with a lock (one device); requests queue.
`low_memory` is rejected: it frees the transformer after each run, which
defeats a resident server — shard over a mesh instead.

    python -m mlx_video_tpu.cli.serve --model-repo /path/to/snapshot \
        --embeddings emb.safetensors --port 8787 --warmup 512x512x33
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional


_PIPELINES = ("distilled", "dev")


class RequestError(ValueError):
    """Client-side request problem -> HTTP 400 (server faults stay 500)."""


class GenerationService:
    """Owns the resident models and serializes generation requests."""

    def __init__(
        self,
        models,
        text_encoder=None,
        default_text=None,
        output_dir: Path = Path("/tmp/mlx_video_tpu_serve"),
        mesh=None,
        sequence_parallel: bool = False,
        pipeline_parallel: int = 0,
        pipeline_tensor: int = 1,
        dtype=None,
        loaded_pipeline: str = "distilled",
        max_batch: int = 1,
        batch_window: float = 0.05,
        lora_dir: Optional[Path] = None,
        lora_cache: int = 4,
        aux_park: bool = False,
        lora_slot_rank: int = 0,
    ) -> None:
        import jax.numpy as jnp

        # Single-chip resident serving at 19B needs the aux-park memory
        # plan: full bf16 DiT-quantized + decoder + upsampler resident
        # OOMs a 16 GB chip (measured, PERF.md r5). With aux_park the aux
        # trees live between requests as per-group int8 IN HBM (~2x
        # smaller) and each request unparks/reparks them around its decode
        # phase while the transformer stays resident
        # (generate_video(low_memory=True, keep_transformer=True,
        # aux_int8_staging=True, aux_park_device=True)).
        if aux_park and mesh is not None:
            raise ValueError("aux_park is the single-chip memory plan; with a mesh "
                             "the aux stages are replicated instead")
        self.aux_park = bool(aux_park)
        self.models = models
        # Per-request LoRA hot-swap: adapters under --lora-dir attach as
        # runtime leaves over the SHARED base weights (lora.py
        # attach_runtime_lora keeps base leaves by reference, so each cached
        # adapted view costs only the adapter factors in HBM). Keyed LRU.
        self.lora_dir = Path(lora_dir).resolve() if lora_dir else None
        self.lora_cache_size = max(1, int(lora_cache))
        self._lora_cache: "dict" = {}  # key -> transformer params (LRU by insertion)
        # LoRA hot-swap WITHOUT recompile: zero-effect adapter slots of a
        # fixed rank on the base, so base and adapted requests share one
        # compiled denoise program (a second 19B scan program beside the
        # resident one was measured OOMing a 16 GB chip). B=0 makes the
        # base output bit-identical to the unslotted model.
        self.lora_slot_rank = int(lora_slot_rank)
        if self.lora_slot_rank and self.lora_dir and models is not None:
            import jax as _jax

            from mlx_video_tpu.lora import LoRAConfig, inject_lora

            models.transformer_params = inject_lora(
                models.transformer_params, models.transformer_config,
                LoRAConfig(rank=self.lora_slot_rank), _jax.random.key(0),
                # slots in the serving dtype: fp32 slots cost ~0.9 GB at
                # rank 16/19B — half of one chip's remaining headroom
                dtype=dtype if dtype is not None else jnp.bfloat16,
            )
        self.text_encoder = text_encoder
        self.default_text = default_text
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh
        self.sequence_parallel = sequence_parallel
        self.pipeline_parallel = pipeline_parallel
        self.pipeline_tensor = pipeline_tensor
        self.dtype = dtype if dtype is not None else jnp.bfloat16
        self.loaded_pipeline = loaded_pipeline
        self.lock = threading.Lock()
        self.requests_served = 0
        self.batches_run = 0
        self.started = time.time()
        # Dynamic request batching: queued compatible requests coalesce into
        # one batched denoise (generate_video num_videos/seeds) — the
        # transformer scan dominates cost and batch amortizes it.
        self.max_batch = max(1, int(max_batch))
        self.batch_window = float(batch_window)
        self._pending: list = []
        self._cv = threading.Condition()
        if self.max_batch > 1:
            worker = threading.Thread(target=self._batch_worker, daemon=True)
            worker.start()

    def _text_for(self, req: dict):
        from mlx_video_tpu.pipelines.generate import TextConditioning

        prompt = req.get("prompt", "")
        if self.text_encoder is not None:
            if req.get("enhance_prompt"):
                prompt = self.text_encoder.enhance_t2v(
                    prompt,
                    max_new_tokens=int(req.get("enhance_max_tokens", 512)),
                    temperature=float(req.get("enhance_temperature", 0.7)),
                )
                req["_enhanced_prompt"] = prompt
            video, audio = self.text_encoder.encode(prompt)
            neg = req.get("negative_prompt")
            video_neg = audio_neg = None
            if neg:
                video_neg, audio_neg = self.text_encoder.encode(neg)
            return TextConditioning(
                video_embeddings=video,
                video_neg_embeddings=video_neg,
                audio_embeddings=audio,
                audio_neg_embeddings=audio_neg,
            )
        if self.default_text is None:
            raise RequestError(
                "This server has no text encoder loaded; it can only serve "
                "requests against its --embeddings default (start the server "
                "with --embeddings or a text-encoder snapshot)."
            )
        return self.default_text

    def _validate(self, req: dict) -> None:
        pipeline = str(req.get("pipeline", self.loaded_pipeline)).lower()
        if pipeline not in _PIPELINES:
            raise RequestError(f"pipeline must be one of {_PIPELINES}")
        if pipeline != self.loaded_pipeline:
            # Running the dev CFG schedule over distilled weights (or vice
            # versa) would 200 with silently-degraded video plus a surprise
            # cold compile of the wrong scan shape.
            raise RequestError(
                f"this server loaded {self.loaded_pipeline!r} weights; "
                f"start a server with --pipeline {pipeline} for that schedule"
            )
        if req.get("low_memory"):
            raise RequestError(
                "low_memory is not served: it frees the transformer after "
                "each run, defeating a resident server — shard with --mesh "
                "instead"
            )
        if req.get("enhance_prompt") and self.text_encoder is None:
            raise RequestError(
                "enhance_prompt needs a text encoder; this server runs on "
                "precomputed --embeddings"
            )
        # Coerce every numeric field now so a malformed-but-plausible body
        # ("0.8" for a float, a dict for an int) is a 400, not a 500 raised
        # deep inside generation.
        try:
            kw = self._kwargs_for(req)
        except (TypeError, ValueError) as e:
            raise RequestError(f"bad request field: {e}")
        # Dial-compatibility rules that denoise() enforces with ValueError —
        # pre-check them here so client mistakes are 400s and (in batch
        # mode) never burn a batch slot.
        tc = kw["teacache_threshold"] > 0.0
        pab = kw["attn_broadcast_interval"] > 1
        cc = kw["cfg_cache_interval"] > 1
        if tc and (pab or cc):
            raise RequestError(
                "teacache_threshold cannot be combined with "
                "cfg_cache_interval or attn_broadcast_interval "
                "(one caching dial at a time)"
            )
        if pab and cc:
            raise RequestError(
                "attn_broadcast_interval and cfg_cache_interval cannot be combined"
            )
        if kw["cfg_sequential"] and (tc or pab or cc):
            raise RequestError(
                "cfg_sequential cannot be combined with cfg_cache_interval, "
                "attn_broadcast_interval, or teacache_threshold (the caching "
                "dials assume the batched-CFG forward shape)"
            )
        audio_mode = kw["audio_mode"]
        if audio_mode == "auto":  # generate_video's resolution rule
            audio_mode = "separate" if self.loaded_pipeline == "distilled" else "joint"
        if kw["audio"] and audio_mode == "joint" and (tc or pab or cc):
            raise RequestError(
                "the caching dials (teacache_threshold, cfg_cache_interval, "
                "attn_broadcast_interval) support the video-only denoise; "
                "use audio_mode=separate to combine them with audio"
            )
        if (tc or pab) and (self.sequence_parallel or self.pipeline_parallel):
            raise RequestError(
                "teacache_threshold/attn_broadcast_interval do not compose "
                "with this server's sequence/pipeline parallelism"
            )
        self._lora_key(req)  # validates names/paths; raises RequestError

    def _lora_key(self, req: dict):
        """Resolve the request's LoRA selection to a hashable cache key
        ((name, strength), ...); () means the plain base.

        The key is computed once per request and stashed on the req dict —
        _validate, _batch_key and _models_for all need it, and recomputing
        would re-stat the adapter files (a TOCTOU window where a later call
        could fail after the response already started)."""
        if "_lora_key" in req:
            return req["_lora_key"]
        sel = req.get("lora")
        if not sel:
            req["_lora_key"] = ()
            return ()
        if self.lora_dir is None:
            raise RequestError(
                "this server has no adapter directory; start it with "
                "--lora-dir to serve per-request LoRA"
            )
        if isinstance(sel, str):
            names = [sel]
        elif isinstance(sel, list) and all(isinstance(n, str) for n in sel):
            names = list(sel)
        else:
            raise RequestError("lora must be a file name or a list of file names")
        strength = req.get("lora_strength", 1.0)
        if isinstance(strength, bool) or not isinstance(strength, (int, float, list)):
            raise RequestError("lora_strength must be a number or a list of numbers")
        if isinstance(strength, list):
            if not all(isinstance(s, (int, float)) and not isinstance(s, bool) for s in strength):
                raise RequestError("lora_strength must be a number or a list of numbers")
            strengths = [float(s) for s in strength]
        else:
            strengths = [float(strength)] * len(names)
        if len(strengths) != len(names):
            raise RequestError("lora_strength list must match lora list length")
        key = []
        for name, s in zip(names, strengths):
            p = (self.lora_dir / str(name)).resolve()
            if self.lora_dir not in p.parents and p != self.lora_dir:
                raise RequestError(f"lora {name!r} escapes the adapter directory")
            if not p.is_file():
                raise RequestError(f"lora {name!r} not found under the adapter directory")
            key.append((str(p.relative_to(self.lora_dir)), s))
        req["_lora_key"] = tuple(key)
        return req["_lora_key"]

    def _transformer_params_for(self, key):
        """Base params for (), else the LRU-cached runtime-attached view."""
        if not key:
            return self.models.transformer_params
        if key in self._lora_cache:
            self._lora_cache[key] = self._lora_cache.pop(key)  # refresh LRU
            return self._lora_cache[key]
        from mlx_video_tpu.lora import LoraSpec, attach_runtime_lora

        specs = [LoraSpec(self.lora_dir / name, s) for name, s in key]
        if self.lora_slot_rank:
            try:
                attached = attach_runtime_lora(
                    self.models.transformer_params, specs,
                    self.models.transformer_config,
                    slot_rank=self.lora_slot_rank,
                )
            except ValueError as e:
                # rank too high / module without a slot: the recompile path
                # still works, it just costs a second compiled scan
                print(f"[serve] LoRA slots unusable for {key}: {e}; "
                      "falling back to the recompile attach", flush=True)
                attached = attach_runtime_lora(
                    self.models.transformer_params, specs,
                    self.models.transformer_config,
                )
        else:
            attached = attach_runtime_lora(
                self.models.transformer_params, specs, self.models.transformer_config
            )
        while len(self._lora_cache) >= self.lora_cache_size:
            self._lora_cache.pop(next(iter(self._lora_cache)))
        self._lora_cache[key] = attached
        return attached

    def _models_for(self, req: dict):
        import dataclasses

        key = self._lora_key(req)
        if not key:
            return self.models
        return dataclasses.replace(
            self.models, transformer_params=self._transformer_params_for(key)
        )

    def _fence_between_requests(self) -> None:
        """aux_park boundary fence: a request's tail enqueues multi-GB frees
        (decode arena, unparked aux) that only retire as the device queue
        drains, while the NEXT request's allocations happen at enqueue — the
        race whose RESOURCE_EXHAUSTED is sticky on this backend
        (utils/device.py; measured killing the serve_load LoRA phase, r5)."""
        if self.aux_park:
            from mlx_video_tpu.utils.device import drain_device_queue

            drain_device_queue()

    def _sync_aux_back(self, bundle) -> None:
        """Propagate aux-tree mutations back to the canonical bundle.

        With aux_park, generate_video re-parks the aux trees on the BUNDLE
        object it was given; LoRA requests run on a dataclasses.replace
        copy, so without this the canonical bundle would keep the old
        unparked bf16 trees alive — both forms resident, defeating the
        park."""
        if not self.aux_park or bundle is self.models:
            return
        for attr in (
            "vae_decoder_params", "upsampler_params", "vae_encoder_params",
            "audio_decoder_params", "vocoder_params",
        ):
            setattr(self.models, attr, getattr(bundle, attr))

    def _batch_key(self, req: dict):
        """Everything that affects compiled shapes / schedules; requests
        sharing this key can share one batched denoise (prompt/seed stay
        per-request). Built from the COERCED kwargs — raw JSON reprs would
        split identical requests on int-vs-float or omitted-vs-default."""
        kw = self._kwargs_for(req)
        kw.pop("seed", None)
        return (
            tuple(sorted((k, repr(v)) for k, v in kw.items())),
            str(req.get("negative_prompt")),
            self._lora_key(req),
        )

    def enhance(self, req: dict) -> dict:
        """Standalone prompt enhancement (the cli/enhance.py surface over
        HTTP): Gemma chat generation with the bundled system prompts."""
        if self.text_encoder is None:
            raise RequestError(
                "this server has no text encoder loaded; /enhance needs one"
            )
        prompt = str(req.get("prompt", ""))
        if not prompt:
            raise RequestError("prompt is required")
        mode = str(req.get("mode", "t2v")).lower()
        if mode not in ("t2v", "i2v", "negative"):
            raise RequestError("mode must be one of t2v, i2v, negative")
        kw = dict(
            max_new_tokens=int(req.get("max_tokens", 512)),
            temperature=float(req.get("temperature", 0.7)),
        )
        with self.lock:  # a 12B LM forward: serialize with generation
            t0 = time.time()
            if mode == "t2v":
                enhanced = self.text_encoder.enhance_t2v(prompt, **kw)
            elif mode == "i2v":
                enhanced = self.text_encoder.enhance_i2v(prompt, **kw)
            else:
                enhanced = self.text_encoder.enhance_negative(
                    prompt, str(req.get("negative_prompt", "")), **kw
                )
        return {
            "prompt": prompt, "enhanced": enhanced, "mode": mode,
            "wall_seconds": round(time.time() - t0, 3),
        }

    def validate_streaming(self, req: dict) -> None:
        """Everything that should 400 BEFORE a streamed 200 header goes out."""
        self._validate(req)
        if self.max_batch > 1:
            raise RequestError(
                "streaming requires --max-batch 1: events cannot be "
                "attributed to one request inside a coalesced batch"
            )

    def generate_streamed(self, req: dict, sink) -> dict:
        """Generate with ``sink`` subscribed to the in-process ui_event
        stream (denoise_step / phase payloads) for the duration of THIS
        request's generation — the lock serializes requests, so the sink
        only sees its own events.

        The caller must have run :meth:`validate_streaming` BEFORE sending
        the 200 header (the HTTP handler does); it is not repeated here —
        a second pass could fail mid-stream after success was signalled."""
        return self._generate_one(req, sink=sink)

    def generate(self, req: dict) -> dict:
        self._validate(req)
        if self.max_batch <= 1:
            return self._generate_one(req)
        item = {"req": req, "done": threading.Event(), "result": None, "error": None}
        with self._cv:
            self._pending.append(item)
            self._cv.notify_all()
        # Generous bound (cold compiles run minutes, not hours): if the
        # worker thread ever died, surface a server fault instead of
        # wedging every handler thread forever behind a healthy /healthz.
        if not item["done"].wait(timeout=3600):
            raise RuntimeError("generation batch worker unresponsive")
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def _batch_worker(self) -> None:
        while True:
            try:
                self._batch_worker_once()
            except Exception as e:  # noqa: BLE001 — the worker must survive
                print(f"[serve] batch worker error: {type(e).__name__}: {e}")

    def _batch_worker_once(self) -> None:
        with self._cv:
            while not self._pending:
                self._cv.wait()
            head = self._pending.pop(0)
            hkey = self._batch_key(head["req"])
            group = [head]
            deadline = time.time() + self.batch_window
            while len(group) < self.max_batch:
                for it in list(self._pending):
                    if self._batch_key(it["req"]) == hkey:
                        self._pending.remove(it)
                        group.append(it)
                        if len(group) >= self.max_batch:
                            break
                if len(group) >= self.max_batch:
                    break
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
        try:
            solo = (
                len(group) == 1
                or bool(group[0]["req"].get("audio", False))
                or int(group[0]["req"].get("num_videos", 1)) != 1
            )
            if solo:
                for it in group:
                    try:
                        it["result"] = self._generate_one(it["req"])
                    except Exception as e:  # noqa: BLE001
                        it["error"] = e
            else:
                self._generate_group(group)
        except Exception as e:  # noqa: BLE001
            for it in group:
                if it["error"] is None and it["result"] is None:
                    it["error"] = e
        for it in group:
            it["done"].set()

    def _generate_group(self, group: list) -> None:
        """One batched generate_video for N coalesced requests: per-request
        prompts encode (serialized) and stack; per-request seeds pass via
        ``seeds``; result paths map back one per request."""
        import jax.numpy as jnp

        from mlx_video_tpu.pipelines.generate import TextConditioning, generate_video

        req0 = group[0]["req"]
        kwargs = self._kwargs_for(req0)
        kwargs["num_videos"] = len(group)
        kwargs.pop("seed", None)
        with self.lock:
            t0 = time.time()
            texts = [self._text_for(it["req"]) for it in group]
            if all(t is texts[0] for t in texts):
                text = texts[0]  # shared --embeddings default: broadcast
            else:
                def cat(field):
                    vals = [getattr(t, field) for t in texts]
                    if any(v is None for v in vals):
                        return None
                    return jnp.concatenate([jnp.asarray(v) for v in vals], axis=0)

                text = TextConditioning(
                    video_embeddings=cat("video_embeddings"),
                    video_neg_embeddings=cat("video_neg_embeddings"),
                )
            out = self.output_dir / (
                f"gen_{int(time.time() * 1000)}_{self.requests_served}_batch.mp4"
            )
            bundle = self._models_for(req0)
            result = generate_video(
                bundle, text, prompt=req0.get("prompt", ""),
                output_path=out,
                seeds=[int(it["req"].get("seed", 0)) for it in group],
                **kwargs,
            )
            self._sync_aux_back(bundle)
            self._fence_between_requests()
            wall = time.time() - t0
            self.requests_served += len(group)
            self.batches_run += 1
        for i, it in enumerate(group):
            it["result"] = self._response(
                result.video_paths[i], result, wall, batched=len(group)
            )
            if "_enhanced_prompt" in it["req"]:
                # parity with the unbatched path: the client must see the
                # prompt that actually conditioned its video
                it["result"]["enhanced_prompt"] = it["req"]["_enhanced_prompt"]

    def _kwargs_for(self, req: dict) -> dict:
        from mlx_video_tpu.pipelines.generate import PipelineType

        pipeline = str(req.get("pipeline", self.loaded_pipeline)).lower()
        seed = int(req.get("seed", 0))
        return dict(
            height=int(req.get("height", 512)),
            width=int(req.get("width", 512)),
            num_frames=int(req.get("num_frames", 33)),
            fps=float(req.get("fps", 24.0)),
            seed=seed,
            num_videos=max(1, min(int(req.get("num_videos", 1)), 8)),
            pipeline=PipelineType.DEV if pipeline == "dev" else PipelineType.DISTILLED,
            stage1_steps=int(req.get("stage1_steps", 8)),
            stage2_steps=int(req.get("stage2_steps", 3)),
            num_inference_steps=int(req.get("num_inference_steps", 40)),
            cfg_cache_interval=int(req.get("cfg_cache_interval", 1)),
            attn_broadcast_interval=int(req.get("attn_broadcast_interval", 1)),
            teacache_threshold=float(req.get("teacache_threshold", 0.0)),
            cfg_sequential=bool(req.get("cfg_sequential", False)),
            cfg_scale=float(req.get("cfg_scale", 4.0)),
            audio=bool(req.get("audio", False)),
            audio_mode=str(req.get("audio_mode", "auto")),
            tiling=str(req.get("tiling", "auto")),
            dtype=self.dtype,
            mesh=self.mesh,
            sequence_parallel=self.sequence_parallel,
            pipeline_parallel=self.pipeline_parallel,
            pipeline_tensor=self.pipeline_tensor,
            profile=True,
            **(
                dict(
                    low_memory=True, keep_transformer=True,
                    aux_int8_staging=True, aux_park_device=True,
                )
                if self.aux_park
                else {}
            ),
        )

    def _generate_one(self, req: dict, sink=None) -> dict:
        from mlx_video_tpu.pipelines.generate import generate_video
        from mlx_video_tpu.utils.profiling import add_event_sink, remove_event_sink

        seed = int(req.get("seed", 0))
        kwargs = self._kwargs_for(req)
        with self.lock:
            if sink is not None:
                add_event_sink(sink)
            try:
                return self._generate_locked(req, kwargs, seed)
            finally:
                if sink is not None:
                    remove_event_sink(sink)

    def _generate_locked(self, req: dict, kwargs: dict, seed: int) -> dict:
        from mlx_video_tpu.pipelines.generate import generate_video

        # Text encoding (a 12B-LM device forward when a text encoder is
        # loaded) must also be serialized: running it concurrently with
        # an in-flight generation contends for the same chips' HBM.
        t0 = time.time()
        text = self._text_for(req)
        # Unique output name: wall-clock ms can collide when requests
        # queue behind a long generation; the served counter cannot.
        out = self.output_dir / (
            f"gen_{int(time.time() * 1000)}_{self.requests_served}_{seed}.mp4"
        )
        bundle = self._models_for(req)
        result = generate_video(
            bundle, text, prompt=req.get("prompt", ""),
            output_path=out, **kwargs,
        )
        self._sync_aux_back(bundle)
        self._fence_between_requests()
        wall = time.time() - t0
        self.requests_served += 1
        resp = self._response(
            result.video_path or out, result, wall, batched=1,
            paths=[str(p) for p in result.video_paths] if result.video_paths else None,
        )
        if "_enhanced_prompt" in req:
            resp["enhanced_prompt"] = req["_enhanced_prompt"]
        return resp

    def _response(self, path, result, wall, batched, paths=None) -> dict:
        return {
            "path": str(path),
            "paths": paths,
            "wall_seconds": round(wall, 3),
            "phases": {k: round(v, 3) for k, v in result.phase_timer.phases.items()},
            "requests_served": self.requests_served,
            "batched": batched,
        }

    def health(self) -> dict:
        return {
            "status": "ok",
            "requests_served": self.requests_served,
            "batches_run": self.batches_run,
            "max_batch": self.max_batch,
            "uptime_seconds": round(time.time() - self.started, 1),
        }


def make_handler(service: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/healthz":
                self._send(200, service.health())
            else:
                self._send(404, {"error": "unknown path"})

        def _stream_generate(self, req: dict) -> None:
            """NDJSON event stream: one line per denoise_step/phase event,
            then a final {"kind": "result"|"error"} line. The 400-able
            validation runs BEFORE the 200 header goes out."""
            import queue

            service.validate_streaming(req)
            q: queue.Queue = queue.Queue()
            done = object()
            holder: dict = {}

            def run():
                try:
                    holder["result"] = service.generate_streamed(req, q.put)
                except Exception as e:  # noqa: BLE001 — forwarded as an event
                    holder["error"] = e
                finally:
                    q.put(done)

            threading.Thread(target=run, daemon=True).start()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Connection", "close")  # length = until close
            self.end_headers()
            gone = False
            while True:
                ev = q.get()
                if ev is done:
                    break
                if gone:
                    continue  # drain so the worker never blocks on a dead pipe
                try:
                    self.wfile.write((json.dumps(ev) + "\n").encode())
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    gone = True
            if "error" in holder:
                err = holder["error"]
                final = {"kind": "error", "error": f"{type(err).__name__}: {err}"}
            else:
                final = {"kind": "result", **holder["result"]}
            if not gone:
                try:
                    self.wfile.write((json.dumps(final) + "\n").encode())
                except (BrokenPipeError, ConnectionResetError):
                    pass

        def do_POST(self):  # noqa: N802
            if self.path not in ("/generate", "/enhance"):
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except ValueError as e:
                    raise RequestError(f"body is not valid JSON: {e}")
                if not isinstance(req, dict):
                    raise RequestError("body must be a JSON object")
                if self.path == "/enhance":
                    self._send(200, service.enhance(req))
                elif req.get("stream"):
                    self._stream_generate(req)
                else:
                    self._send(200, service.generate(req))
            except RequestError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                # Includes ValueError from generate_video internals: those
                # are server-side configuration faults, not client errors.
                import traceback

                traceback.print_exc()  # ops diagnosis: the client body only
                # carries type+message; the stack goes to the server log
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):
            print(f"[serve] {self.address_string()} {fmt % args}")

    return Handler


def serve(service: GenerationService, host: str = "127.0.0.1", port: int = 8787):
    """Build the HTTP server (returned so tests can drive it on port 0)."""
    return ThreadingHTTPServer((host, port), make_handler(service))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Resident LTX-2 generation server")
    p.add_argument("--model-repo", required=True, help="local snapshot path")
    p.add_argument("--text-encoder-path", default=None)
    p.add_argument("--embeddings", default=None,
                   help="precomputed text-embeddings safetensors used for every "
                        "request (skips the text encoder)")
    p.add_argument("--pipeline", choices=_PIPELINES, default="distilled",
                   help="pipeline whose weights to load")
    p.add_argument("--audio", action="store_true")
    p.add_argument("--w8a8", action="store_true")
    p.add_argument("--w4a8", action="store_true")
    p.add_argument("--mesh", default=None, help="data,fsdp,tensor or 'auto'")
    p.add_argument("--pipeline-parallel", type=int, default=0,
                   help="GPipe pipeline stages for every DiT forward "
                        "(parallel/pipeline.py); exclusive with --mesh.")
    p.add_argument("--pipeline-tensor", type=int, default=1)
    p.add_argument("--sequence-parallel", action="store_true",
                   help="With --mesh: ring-attention token sharding over fsdp")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--output-dir", default="/tmp/mlx_video_tpu_serve")
    p.add_argument("--max-batch", type=int, default=1,
                   help="Dynamic request batching: up to N queued requests "
                        "with identical shapes/schedules coalesce into one "
                        "batched denoise (per-request prompt + seed).")
    p.add_argument("--batch-window", type=float, default=0.05,
                   help="Seconds to wait for same-shape requests to join a "
                        "batch once one is pending.")
    p.add_argument("--lora-dir", default=None,
                   help="Directory of LoRA .safetensors the server may "
                        "attach per request (request fields: lora, "
                        "lora_strength). Adapters attach as runtime leaves "
                        "over the shared base weights - works over "
                        "quantized bases; each cached view costs only the "
                        "adapter factors in HBM.")
    p.add_argument("--lora-cache", type=int, default=4,
                   help="How many adapter-attached transformer views to "
                        "keep resident (LRU).")
    p.add_argument("--warmup", default=None,
                   help="WxHxF to precompile at startup, e.g. 512x512x33 "
                        "(first request then runs at steady-state latency)")
    p.add_argument("--lora-slot-rank", type=int, default=0,
                   help="attach zero-effect rank-N adapter slots to the base so "
                        "LoRA hot-swap reuses ONE compiled denoise program "
                        "(adapters of rank <= N swap as data; 0 = off)")
    p.add_argument("--aux-park", action="store_true",
                   help="single-chip memory plan: park decoder/upsampler/audio "
                        "trees as per-group int8 IN HBM between requests and "
                        "unpark around each decode (required to serve the 19B "
                        "with the full aux stack on one 16 GB chip)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.mesh and args.pipeline_parallel:
        # The conflict is fully known at parse time — reject before weight
        # loading / before the server boots "healthy" and every request 400s.
        raise SystemExit("serve: --mesh and --pipeline-parallel are mutually exclusive")

    import os

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "mlx_video_tpu", "jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax.numpy as jnp

    from mlx_video_tpu.cli.generate import load_embeddings
    from mlx_video_tpu.loading import load_model_bundle
    from mlx_video_tpu.pipelines.generate import PipelineType

    from mlx_video_tpu.loading import (
        bits_hint_for,
        mesh_from_flag,
        quantize_models,
        shard_models,
    )

    pipeline = PipelineType.DEV if args.pipeline == "dev" else PipelineType.DISTILLED
    model_path = Path(args.model_repo)
    models = load_model_bundle(
        model_path, pipeline=pipeline, audio=args.audio, dtype=jnp.bfloat16,
        bits_hint=bits_hint_for(args.model_repo),
    )
    # Same quantize-if-needed + stored-bits resolution as cli/generate.py:
    # a bare prepare_w4a8 here was a silent no-op on fresh bf16 snapshots
    # and mis-scaled 8-bit pre-quantized repos.
    try:
        quantize_models(
            models, model_path, w8a8=args.w8a8, w4a8=args.w4a8,
            repo_hint=str(args.model_repo),
        )
    except ValueError as e:
        raise SystemExit(f"serve: {e}")

    mesh = None
    if args.mesh:
        mesh = mesh_from_flag(args.mesh)
        shard_models(models, mesh)  # incl. stage-2 and audio transformers

    text_encoder = default_text = None
    if args.embeddings:
        default_text = load_embeddings(args.embeddings)
    else:
        from mlx_video_tpu.models.ltx.text_encoder import LTX2TextEncoder

        text_encoder = LTX2TextEncoder.load(
            args.model_repo, args.text_encoder_path or args.model_repo,
            dtype=jnp.bfloat16, w8a8=args.w8a8,
        )
        if mesh is not None:
            from mlx_video_tpu.parallel.sharding import shard_params

            text_encoder.params = shard_params(text_encoder.params, mesh)

    service = GenerationService(
        models, text_encoder=text_encoder, default_text=default_text,
        output_dir=Path(args.output_dir), mesh=mesh,
        sequence_parallel=args.sequence_parallel,
        pipeline_parallel=args.pipeline_parallel,
        pipeline_tensor=args.pipeline_tensor,
        loaded_pipeline=args.pipeline,
        max_batch=args.max_batch,
        batch_window=args.batch_window,
        lora_dir=Path(args.lora_dir) if args.lora_dir else None,
        lora_cache=args.lora_cache,
        aux_park=args.aux_park,
        lora_slot_rank=args.lora_slot_rank,
    )

    if args.warmup:
        w, h, f = (int(x) for x in args.warmup.lower().split("x"))
        print(f"[serve] warmup {w}x{h}x{f} (compiles cache in-process)...")
        t0 = time.time()
        service.generate({"prompt": "warmup", "width": w, "height": h, "num_frames": f})
        if service.max_batch == 1:
            # Streamed requests trace a DIFFERENT denoise scan (per-step
            # progress callbacks are compiled in); without this the first
            # stream=true client stalls minutes on a cold compile emitting
            # zero events — indistinguishable from a hang.
            req = {"prompt": "warmup", "width": w, "height": h, "num_frames": f}
            service.validate_streaming(req)
            service.generate_streamed(req, lambda ev: None)
        print(f"[serve] warmup done in {time.time() - t0:.1f}s")

    httpd = serve(service, args.host, args.port)
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(POST /generate, GET /healthz)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
