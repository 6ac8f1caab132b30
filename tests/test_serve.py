"""Generation server (cli/serve.py): resident models, HTTP surface,
request serialization, warm-request speedup from in-process compile reuse."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_video_tpu.cli.serve import GenerationService, serve
from mlx_video_tpu.config import LTXModelType, tiny_test_config
from mlx_video_tpu.models.ltx.model import init_ltx_params
from mlx_video_tpu.models.ltx.upsampler import init_latent_upsampler
from mlx_video_tpu.models.ltx.video_vae.decoder import DecoderConfig, init_video_decoder
from mlx_video_tpu.pipelines.generate import ModelBundle, TextConditioning


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    cfg = tiny_test_config(LTXModelType.VideoOnly)
    dec_cfg = DecoderConfig(
        in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
        num_upsamples=3, patch_size=4,
    )
    models = ModelBundle(
        transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
        transformer_config=cfg,
        vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
        vae_decoder_config=dec_cfg,
        upsampler_params=init_latent_upsampler(
            jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
        ),
    )
    rng = np.random.default_rng(0)
    text = TextConditioning(
        video_embeddings=jnp.asarray(
            rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
        )
    )
    return GenerationService(
        models, default_text=text,
        output_dir=tmp_path_factory.mktemp("serve_out"),
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def server_url(service):
    httpd = serve(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestServe:
    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 1, "stage2_steps": 1, "tiling": "none"}

    def test_healthz(self, server_url):
        with urllib.request.urlopen(server_url + "/healthz") as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["status"] == "ok"

    def test_generate_and_warm_reuse(self, server_url, service):
        import os
        import time

        t0 = time.time()
        code, out = _post(server_url, dict(self.REQ, seed=1))
        cold = time.time() - t0
        assert code == 200, out
        assert os.path.exists(out["path"]) and out["wall_seconds"] > 0
        assert "stage1_denoise" in out["phases"]

        t0 = time.time()
        code, out2 = _post(server_url, dict(self.REQ, seed=2))
        warm = time.time() - t0
        assert code == 200 and out2["path"] != out["path"]
        assert out2["requests_served"] == service.requests_served
        # same shapes -> compiled programs reused; warm must be faster. The
        # margin is kept loose (cold includes jit compiles, warm none) so
        # wall-clock noise from a loaded parallel test run can't flake it.
        assert warm < cold, (cold, warm)

    def test_bad_pipeline_is_400(self, server_url):
        code, out = _post(server_url, dict(self.REQ, pipeline="nope"))
        assert code == 400 and "pipeline" in out["error"]

    def test_pipeline_mismatch_is_400(self, server_url):
        """Requesting the dev schedule from a distilled-loaded server must
        400 — running the wrong schedule over these weights would 200 with
        silently-degraded output plus a cold compile of the wrong scan."""
        code, out = _post(server_url, dict(self.REQ, pipeline="dev"))
        assert code == 400 and "distilled" in out["error"]

    def test_non_object_body_is_400(self, server_url):
        import urllib.request

        req = urllib.request.Request(
            server_url + "/generate", data=b"[1, 2]",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                code, out = r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            code, out = e.code, json.loads(e.read())
        assert code == 400 and "JSON object" in out["error"]

    def test_internal_valueerror_is_500(self, server_url, service):
        """Server-side faults (generate_video internals raising ValueError)
        must NOT masquerade as client 400s."""
        def boom(*a, **k):
            raise ValueError("server-side fault")

        import mlx_video_tpu.pipelines.generate as G

        orig = G.generate_video
        G.generate_video = boom
        try:
            code, out = _post(server_url, dict(self.REQ))
            assert code == 500 and "server-side fault" in out["error"]
        finally:
            G.generate_video = orig

    def test_dial_conflicts_are_400(self, server_url):
        """denoise()'s dial-compatibility ValueErrors are client mistakes:
        they must pre-validate to 400, not surface as 500 server faults."""
        code, out = _post(
            server_url, dict(self.REQ, teacache_threshold=0.1, cfg_cache_interval=2)
        )
        assert code == 400 and "one caching dial" in out["error"]
        code, out = _post(
            server_url,
            dict(self.REQ, attn_broadcast_interval=2, cfg_cache_interval=2),
        )
        assert code == 400 and "cannot be combined" in out["error"]
        code, out = _post(
            server_url,
            dict(self.REQ, audio=True, audio_mode="joint", teacache_threshold=0.1),
        )
        assert code == 400 and "video-only" in out["error"]

    def test_malformed_numeric_field_is_400(self, server_url):
        code, out = _post(server_url, dict(self.REQ, num_frames={"oops": 1}))
        assert code == 400 and "bad request field" in out["error"]
        code, out = _post(server_url, dict(self.REQ, cfg_scale=[1, 2]))
        assert code == 400

    def test_unknown_path_404(self, server_url):
        try:
            urllib.request.urlopen(server_url + "/nope")
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404

    def test_missing_text_encoder_is_400(self, server_url, service):
        saved = service.default_text
        service.default_text = None
        try:
            code, out = _post(server_url, dict(self.REQ))
            assert code == 400 and "embeddings" in out["error"]
        finally:
            service.default_text = saved


class TestServeParser:
    def test_parser(self):
        from mlx_video_tpu.cli.serve import build_parser

        a = build_parser().parse_args(
            ["--model-repo", "/x", "--port", "9", "--warmup", "512x512x33", "--w4a8"]
        )
        assert a.port == 9 and a.warmup == "512x512x33" and a.w4a8


class TestDynamicBatching:
    """--max-batch N: queued same-shape requests coalesce into ONE batched
    denoise (generate_video num_videos/seeds); mismatched shapes run solo."""

    @pytest.fixture(scope="class")
    def batch_service(self, tmp_path_factory):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        rng = np.random.default_rng(0)
        text = TextConditioning(
            video_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            )
        )
        return GenerationService(
            models, default_text=text,
            output_dir=tmp_path_factory.mktemp("serve_batch_out"),
            dtype=jnp.float32, max_batch=3, batch_window=1.0,
        )

    @pytest.fixture(scope="class")
    def batch_url(self, batch_service):
        httpd = serve(batch_service, host="127.0.0.1", port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()

    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 1, "stage2_steps": 1, "tiling": "none"}

    def test_concurrent_same_shape_requests_coalesce(self, batch_url, batch_service):
        import os

        results = [None] * 3

        def post(i):
            results[i] = _post(batch_url, dict(self.REQ, seed=10 + i))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        paths = set()
        batched_counts = []
        for code, out in results:
            assert code == 200, out
            assert os.path.exists(out["path"])
            paths.add(out["path"])
            batched_counts.append(out.get("batched", 1))
        assert len(paths) == 3, "each request must get its own video"
        # at least two of the three must have shared a batch (the first can
        # start solo if it dequeued before the others arrived)
        assert max(batched_counts) >= 2, batched_counts
        assert batch_service.batches_run >= 1

    def test_mismatched_shape_runs_solo(self, batch_url):
        code, out = _post(batch_url, dict(self.REQ, num_frames=17, seed=1))
        assert code == 200, out
        assert out.get("batched", 1) == 1

    def test_request_error_still_400_in_batch_mode(self, batch_url):
        code, out = _post(batch_url, dict(self.REQ, pipeline="dev"))
        assert code == 400 and "distilled" in out["error"]

    def test_coalescing_fairness_fifo(self, batch_service):
        """A mismatched-shape request sandwiched between two coalescible ones
        must be served in FIFO order, not starved while same-key arrivals
        keep coalescing: the worker pops the HEAD each iteration, so after
        the [A, A'] group runs, B is the next head (serve.py
        _batch_worker_once)."""
        import threading as _t

        svc = batch_service
        a1 = {"req": dict(self.REQ, seed=101),
              "done": _t.Event(), "result": None, "error": None}
        b = {"req": dict(self.REQ, num_frames=17, seed=102),
             "done": _t.Event(), "result": None, "error": None}
        a2 = {"req": dict(self.REQ, seed=103),
              "done": _t.Event(), "result": None, "error": None}
        # Enqueue all three atomically so the worker sees [A, B, A'] at once.
        with svc._cv:
            svc._pending.extend([a1, b, a2])
            svc._cv.notify_all()
        for it in (a1, b, a2):
            assert it["done"].wait(timeout=600), "request starved"
            assert it["error"] is None, it["error"]
        # A and A' coalesced into one batch-of-2; B ran solo right after.
        assert a1["result"].get("batched") == 2, a1["result"]
        assert a2["result"].get("batched") == 2, a2["result"]
        assert b["result"].get("batched", 1) == 1, b["result"]


class TestServeLoRA:
    """Per-request LoRA hot-swap: adapters under --lora-dir attach as runtime
    leaves over the SHARED base weights (no base copy), LRU-cached, and the
    selection is part of the batching key."""

    @pytest.fixture()
    def lora_service(self, tmp_path):
        from mlx_video_tpu.io.safetensors import save_safetensors as save_st

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        rng = np.random.default_rng(0)
        text = TextConditioning(
            video_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            )
        )
        lora_dir = tmp_path / "adapters"
        lora_dir.mkdir()
        in_dim = cfg.inner_dim
        save_st(lora_dir / "style.safetensors", {
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(4, in_dim)).astype(np.float32) * 0.5,
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(in_dim, 4)).astype(np.float32) * 0.5,
        })
        return GenerationService(
            models, default_text=text, output_dir=tmp_path / "out",
            dtype=jnp.float32, lora_dir=lora_dir, lora_cache=2,
        )

    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 1, "stage2_steps": 1, "tiling": "none", "seed": 3}

    def test_lora_changes_output_and_caches(self, lora_service):
        base = lora_service.generate(dict(self.REQ))
        lora = lora_service.generate(dict(self.REQ, lora="style.safetensors"))
        with open(base["path"], "rb") as f:
            base_bytes = f.read()
        with open(lora["path"], "rb") as f:
            lora_bytes = f.read()
        assert base_bytes != lora_bytes, "adapter did not change the video"
        key = (("style.safetensors", 1.0),)
        assert key in lora_service._lora_cache
        cached = lora_service._lora_cache[key]
        again = lora_service._transformer_params_for(key)
        assert again is cached, "second request must hit the adapter cache"

    def test_base_leaves_shared_not_copied(self, lora_service):
        key = lora_service._lora_key({"lora": "style.safetensors"})
        attached = lora_service._transformer_params_for(key)
        base = lora_service.models.transformer_params
        # base weights are the SAME device buffers (structural copy only)
        assert attached["video"]["patchify_proj"]["weight"] is base["video"]["patchify_proj"]["weight"]
        assert attached["blocks"]["attn1"]["to_q"]["weight"] is base["blocks"]["attn1"]["to_q"]["weight"]
        assert "lora_A" in attached["blocks"]["attn1"]["to_q"]
        assert "lora_A" not in base["blocks"]["attn1"]["to_q"]

    def test_lru_eviction(self, lora_service):
        import shutil

        d = lora_service.lora_dir
        shutil.copy(d / "style.safetensors", d / "b.safetensors")
        shutil.copy(d / "style.safetensors", d / "c.safetensors")
        for name in ("style.safetensors", "b.safetensors", "c.safetensors"):
            lora_service._transformer_params_for(
                lora_service._lora_key({"lora": name})
            )
        assert len(lora_service._lora_cache) == 2  # lora_cache=2
        assert (("style.safetensors", 1.0),) not in lora_service._lora_cache

    def test_validation_errors(self, lora_service, tmp_path):
        from mlx_video_tpu.cli.serve import RequestError

        with pytest.raises(RequestError, match="not found"):
            lora_service.generate(dict(self.REQ, lora="missing.safetensors"))
        with pytest.raises(RequestError, match="escapes"):
            lora_service.generate(dict(self.REQ, lora="../evil.safetensors"))
        with pytest.raises(RequestError, match="must match"):
            lora_service.generate(
                dict(self.REQ, lora=["style.safetensors"], lora_strength=[1.0, 2.0])
            )
        # malformed-but-plausible types are client mistakes (400), not
        # TypeError/ValueError 500s
        with pytest.raises(RequestError, match="number"):
            lora_service.generate(
                dict(self.REQ, lora="style.safetensors", lora_strength="0.8")
            )
        with pytest.raises(RequestError, match="file name"):
            lora_service.generate(dict(self.REQ, lora={"name": "style"}))
        with pytest.raises(RequestError, match="file name"):
            lora_service.generate(dict(self.REQ, lora=[1, 2]))
        no_dir = GenerationService(
            lora_service.models, default_text=lora_service.default_text,
            output_dir=tmp_path / "out2", dtype=jnp.float32,
        )
        with pytest.raises(RequestError, match="--lora-dir"):
            no_dir.generate(dict(self.REQ, lora="style.safetensors"))

    def test_lora_in_batch_key(self, lora_service):
        plain = lora_service._batch_key(dict(self.REQ))
        withl = lora_service._batch_key(dict(self.REQ, lora="style.safetensors"))
        assert plain != withl
        strong = lora_service._batch_key(
            dict(self.REQ, lora="style.safetensors", lora_strength=2.0)
        )
        assert withl != strong


class TestServeStreaming:
    """POST /generate with stream=true: NDJSON per-event lines (denoise_step
    via the in-process ui_event sink, phase timings) then a final result."""

    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 2, "stage2_steps": 1, "tiling": "none", "seed": 5,
           "stream": True}

    def test_stream_events_then_result(self, server_url, service):
        import os

        req = urllib.request.Request(
            server_url + "/generate", json.dumps(self.REQ).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(l) for l in r.read().decode().splitlines()]
        kinds = [l.get("kind") for l in lines]
        assert kinds[-1] == "result", kinds
        assert "denoise_step" in kinds, kinds
        assert "phase" in kinds, kinds
        previews = [l for l in lines if l.get("kind") == "preview"]
        assert previews, kinds
        import base64

        jpeg = base64.b64decode(previews[-1]["jpeg_b64"])
        assert jpeg[:3] == b"\xff\xd8\xff"  # JPEG magic
        steps = [l for l in lines if l.get("kind") == "denoise_step"]
        assert steps[0]["step"] == 1 and steps[0]["total"] == 2
        assert os.path.exists(lines[-1]["path"])
        # the sink must be gone once the request finished
        from mlx_video_tpu.utils import profiling

        assert not profiling._SINKS

    def test_stream_rejected_in_batch_mode(self, service):
        from mlx_video_tpu.cli.serve import RequestError

        service.max_batch = 2
        try:
            with pytest.raises(RequestError, match="streaming requires"):
                service.validate_streaming(dict(self.REQ))
        finally:
            service.max_batch = 1

    def test_stream_error_arrives_as_event(self, server_url):
        bad = dict(self.REQ, stage1_steps=99)  # out of range -> pipeline ValueError
        req = urllib.request.Request(
            server_url + "/generate", json.dumps(bad).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200  # stream already committed
            lines = [json.loads(l) for l in r.read().decode().splitlines()]
        assert lines[-1]["kind"] == "error"
        assert "error" in lines[-1]


class _StubTextEncoder:
    """Text-encoder stand-in: deterministic embeddings + marker enhancement."""

    def __init__(self, caption_channels):
        self.caption_channels = caption_channels
        self.encoded = []

    def encode(self, prompt):
        self.encoded.append(prompt)
        rng = np.random.default_rng(abs(hash(prompt)) % (2**32))
        emb = jnp.asarray(rng.normal(size=(1, 8, self.caption_channels)).astype(np.float32))
        return emb, None

    def enhance_t2v(self, prompt, **kw):
        return f"{prompt}, cinematic lighting (t2v max={kw.get('max_new_tokens')})"

    def enhance_i2v(self, prompt, **kw):
        return f"{prompt} (i2v)"

    def enhance_negative(self, prompt, negative="", **kw):
        return f"{negative} blurry"


class TestServeEnhance:
    """POST /enhance + the enhance_prompt generate field (Gemma prompt
    enhancement surface over HTTP; stubbed LM)."""

    @pytest.fixture()
    def enhance_service(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        return GenerationService(
            models, text_encoder=_StubTextEncoder(cfg.caption_channels),
            output_dir=tmp_path / "out", dtype=jnp.float32,
        )

    def test_enhance_modes(self, enhance_service):
        out = enhance_service.enhance({"prompt": "a cat", "max_tokens": 99})
        assert out["enhanced"] == "a cat, cinematic lighting (t2v max=99)"
        assert out["mode"] == "t2v"
        out = enhance_service.enhance({"prompt": "a cat", "mode": "i2v"})
        assert out["enhanced"] == "a cat (i2v)"
        out = enhance_service.enhance(
            {"prompt": "a cat", "mode": "negative", "negative_prompt": "ugly"}
        )
        assert out["enhanced"] == "ugly blurry"

    def test_enhance_validation(self, enhance_service, service):
        from mlx_video_tpu.cli.serve import RequestError

        with pytest.raises(RequestError, match="prompt is required"):
            enhance_service.enhance({})
        with pytest.raises(RequestError, match="mode must be"):
            enhance_service.enhance({"prompt": "x", "mode": "bogus"})
        # `service` fixture has no text encoder
        with pytest.raises(RequestError, match="text encoder"):
            service.enhance({"prompt": "x"})
        with pytest.raises(RequestError, match="enhance_prompt needs"):
            service.generate({"prompt": "x", "enhance_prompt": True,
                              "height": 64, "width": 64, "num_frames": 9})

    def test_generate_with_enhance_prompt(self, enhance_service):
        req = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
               "stage1_steps": 1, "stage2_steps": 1, "tiling": "none",
               "seed": 2, "enhance_prompt": True}
        out = enhance_service.generate(req)
        assert out["enhanced_prompt"].startswith("a cat, cinematic")
        assert enhance_service.text_encoder.encoded[0] == out["enhanced_prompt"]

    def test_enhance_prompt_in_batched_response(self, tmp_path):
        """Regression: the batched path must return enhanced_prompt exactly
        like the unbatched one (API consistency between the two modes)."""
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        svc = GenerationService(
            models, text_encoder=_StubTextEncoder(cfg.caption_channels),
            output_dir=tmp_path / "out", dtype=jnp.float32,
            max_batch=2, batch_window=2.0,
        )
        base = {"height": 64, "width": 64, "num_frames": 9, "stage1_steps": 1,
                "stage2_steps": 1, "tiling": "none", "enhance_prompt": True}
        results = {}

        def run(name, prompt, seed):
            results[name] = svc.generate(dict(base, prompt=prompt, seed=seed))

        t1 = threading.Thread(target=run, args=("a", "a cat", 1))
        t2 = threading.Thread(target=run, args=("b", "a dog", 2))
        t1.start(); t2.start(); t1.join(600); t2.join(600)
        assert results["a"]["batched"] == 2, results
        assert results["a"]["enhanced_prompt"].startswith("a cat, cinematic")
        assert results["b"]["enhanced_prompt"].startswith("a dog, cinematic")

    def test_enhance_over_http(self, enhance_service):
        httpd = serve(enhance_service, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}/enhance"
            req = urllib.request.Request(
                url, json.dumps({"prompt": "a dog"}).encode(),
                {"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                assert r.status == 200
                body = json.loads(r.read())
            assert "cinematic" in body["enhanced"]
        finally:
            httpd.shutdown()


class TestAuxParkServing:
    """aux_park: the single-chip 19B serving memory plan (r5) — aux trees
    parked as per-group int8 between requests, transformer resident."""

    @pytest.fixture()
    def park_service(self, tmp_path):
        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        rng = np.random.default_rng(0)
        text = TextConditioning(
            video_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            )
        )
        return GenerationService(
            models, default_text=text, output_dir=tmp_path, dtype=jnp.float32,
            aux_park=True,
        )

    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 1, "stage2_steps": 1, "tiling": "none", "seed": 3}

    def test_requests_survive_and_transformer_stays(self, park_service):
        from mlx_video_tpu.io import staging

        import os

        r1 = park_service.generate(dict(self.REQ))
        assert os.path.getsize(r1["path"]) > 0
        # transformer must still be resident (the low_memory default would
        # have dropped it) and the aux trees parked between requests
        assert park_service.models.transformer_params is not None
        r2 = park_service.generate(dict(self.REQ, seed=4))
        assert os.path.getsize(r2["path"]) > 0
        assert park_service.models.transformer_params is not None

    def test_outputs_match_resident_service(self, park_service, tmp_path):
        """The park/unpark cycle is a transfer codec around the SAME decode;
        outputs must match an always-resident service to int8-park drift."""
        import cv2

        r1 = park_service.generate(dict(self.REQ))
        resident = GenerationService(
            park_service.models.__class__(
                transformer_params=park_service.models.transformer_params,
                transformer_config=park_service.models.transformer_config,
                vae_decoder_params=park_service.models.vae_decoder_params,
                vae_decoder_config=park_service.models.vae_decoder_config,
                upsampler_params=park_service.models.upsampler_params,
            ),
            default_text=park_service.default_text,
            output_dir=tmp_path / "resident", dtype=jnp.float32,
        )
        r2 = resident.generate(dict(self.REQ))
        a = cv2.VideoCapture(r1["path"]).read()[1]
        b = cv2.VideoCapture(r2["path"]).read()[1]
        err = float(np.mean(np.abs(a.astype(np.float32) - b.astype(np.float32))))
        assert err < 3.0, err  # int8 park drift bounded (uint8 frame scale)

    def test_aux_park_rejects_mesh(self):
        with pytest.raises(ValueError, match="aux_park"):
            GenerationService(models=None, mesh=object(), aux_park=True)


class TestLoraSlotServing:
    """lora_slot_rank: base and adapted requests share one compiled scan."""

    @pytest.fixture()
    def slot_service(self, tmp_path):
        from mlx_video_tpu.io.safetensors import save_safetensors

        cfg = tiny_test_config(LTXModelType.VideoOnly)
        dec_cfg = DecoderConfig(
            in_channels=cfg.in_channels, base_channels=32, num_layers_per_block=1,
            num_upsamples=3, patch_size=4,
        )
        models = ModelBundle(
            transformer_params=init_ltx_params(jax.random.key(0), cfg, dtype=jnp.float32),
            transformer_config=cfg,
            vae_decoder_params=init_video_decoder(jax.random.key(1), dec_cfg),
            vae_decoder_config=dec_cfg,
            upsampler_params=init_latent_upsampler(
                jax.random.key(2), in_channels=cfg.in_channels, mid_channels=32, num_blocks=1
            ),
        )
        rng = np.random.default_rng(0)
        lora_dir = tmp_path / "adapters"
        lora_dir.mkdir()
        save_safetensors(str(lora_dir / "style.safetensors"), {
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(2, cfg.inner_dim)).astype(np.float32) * 0.5,
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(cfg.inner_dim, 2)).astype(np.float32) * 0.5,
        })
        text = TextConditioning(
            video_embeddings=jnp.asarray(
                rng.normal(size=(1, 8, cfg.caption_channels)).astype(np.float32)
            )
        )
        return GenerationService(
            models, default_text=text, output_dir=tmp_path / "out",
            dtype=jnp.float32, lora_dir=lora_dir, lora_slot_rank=4,
        )

    REQ = {"prompt": "a cat", "height": 64, "width": 64, "num_frames": 9,
           "stage1_steps": 1, "stage2_steps": 1, "tiling": "none", "seed": 3}

    def test_base_and_lora_share_slot_structure(self, slot_service):
        import os

        r_base = slot_service.generate(dict(self.REQ))
        r_lora = slot_service.generate(dict(self.REQ, lora="style.safetensors"))
        assert os.path.getsize(r_base["path"]) > 0 and os.path.getsize(r_lora["path"]) > 0
        with open(r_base["path"], "rb") as f:
            base_bytes = f.read()
        with open(r_lora["path"], "rb") as f:
            lora_bytes = f.read()
        assert base_bytes != lora_bytes  # the adapter has an effect
        # the cached adapted view has the SAME avals as the slotted base
        base_p = slot_service.models.transformer_params
        adapted = next(iter(slot_service._lora_cache.values()))
        a = {jax.tree_util.keystr(p): (l.shape, str(l.dtype))
             for p, l in jax.tree_util.tree_flatten_with_path(base_p)[0]}
        b = {jax.tree_util.keystr(p): (l.shape, str(l.dtype))
             for p, l in jax.tree_util.tree_flatten_with_path(adapted)[0]}
        assert a == b
